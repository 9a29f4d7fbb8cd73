#!/usr/bin/env python3
"""Fold N same-code full-bench JSON lines into bench_stability.json.

Usage: python3 tools/stability.py run1.json run2.json [run3.json ...]

Output schema (machine-readable evidence for driver-bench noise
adjudication — see the q1_agg probe row in BASELINE.md):
  totals:        per-run full-suite totals, seconds
  n_queries:     inventory size of each run (must agree)
  per_query:     {name: {"median": s, "min": s, "max": s}}
  spread_pct:    (max-min)/min of the totals, percent
"""
import json
import statistics
import sys

runs = [json.load(open(p)) for p in sys.argv[1:]]
assert runs, "pass at least one bench json"
names = set(runs[0]["queries"])
for r in runs[1:]:
    assert set(r["queries"]) == names, "runs cover different inventories"
per = {
    n: {
        "median": round(statistics.median(r["queries"][n] for r in runs), 2),
        "min": round(min(r["queries"][n] for r in runs), 2),
        "max": round(max(r["queries"][n] for r in runs), 2),
    }
    for n in sorted(names)
}
totals = [r["value"] for r in runs]
out = {
    "totals": totals,
    "n_queries": len(names),
    "sf": runs[0]["sf"],
    "spread_pct": round(100.0 * (max(totals) - min(totals)) / min(totals), 1),
    "per_query": per,
}
json.dump(out, open("bench_stability.json", "w"), indent=1)
print("totals", totals, "spread", out["spread_pct"], "%")
slow = sorted(per.items(), key=lambda kv: -kv[1]["median"])[:12]
for n, v in slow:
    print(f"{n:28} median {v['median']:5} range [{v['min']}, {v['max']}]")
