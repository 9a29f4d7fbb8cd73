#!/usr/bin/env python3
"""Fold N same-code full-bench JSON lines into bench_stability.json.

Usage: python3 tools/stability.py run1.json run2.json [run3.json ...]

Output schema (machine-readable evidence for driver-bench noise
adjudication — see the q1_agg probe row in BASELINE.md):
  totals:        per-run full-suite totals, seconds
  n_queries:     inventory size of each run (must agree)
  per_query:     {name: {"median": s, "min": s, "max": s}}
  spread_pct:    (max-min)/min of the totals, percent
  probe_verdict: per-run probe-calibrated adjudication (r12 verdict
                 task 8): which PROBE_BANDS row applies and whether the
                 total lands inside it — so the judge never has to
                 cross-read BASELINE.md's table by hand.
"""
import json
import statistics
import sys

# The q1_agg probe ↔ expected-total calibration, mirrored from
# BASELINE.md's floors table (update BOTH on re-baseline). RECALIBRATED
# for the r14 container (recycled 2026-08-16 ~22:30 UTC): six local[32]
# runs on the r14 tree (216 queries) measured quiet-window totals
# 156.4/170.0 at probes 1.06-1.09, but 205.5-264.0 at probes 1.07-1.29
# during sustained co-tenant STEAL (measured 0-19.5% of all-CPU in 5 s
# windows; warm phase doubles when it bites) — the probe CANNOT detect
# steal that arrives after it ran, so on this box a total alone is
# uninformative between ~185 and ~270. The quiet band below therefore
# spans the full healthy-engine-under-steal range; adjudicate a
# suspected regression via the per-query mover floors / sum-of-minima
# (BASELINE.md; this fold emits sum_of_minima), never the total. The
# r13-container history (quiet [112,178] over six runs, 214 queries;
# per-query minima 1.23x faster than this box) is in BASELINE_HISTORY.md.
# The bursty row is carried from the r13 container, unverified here.
PROBE_BANDS = [
    {"band": "quiet", "probe": [0.0, 1.35], "total": [140.0, 270.0]},
    {"band": "bursty", "probe": [1.5, 3.5], "total": [178.0, 290.0]},
]
PROBE_QUERY = "q1_agg"

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


def verdict(run):
    probe = run["queries"].get(PROBE_QUERY)
    total = run["value"]
    if probe is None:
        return {"probe": None, "band": "no-probe", "within_band": None}
    for b in PROBE_BANDS:
        if b["probe"][0] <= probe < b["probe"][1]:
            return {
                "probe": probe,
                "band": b["band"],
                "expected_total": b["total"],
                "total": total,
                "within_band": b["total"][0] <= total <= b["total"][1],
            }
    return {"probe": probe, "band": "outside-calibration", "total": total,
            "within_band": None}


out = {
    "totals": totals,
    "n_queries": len(names),
    "sf": runs[0]["sf"],
    "spread_pct": round(100.0 * (max(totals) - min(totals)) / min(totals), 1),
    # noise-robust floor statistic: each query's best time across the
    # fold approximates its quiet-window cost even when every individual
    # run caught a steal burst somewhere — the regression comparator on
    # steal-prone containers (see PROBE_BANDS comment).
    "sum_of_minima": round(sum(v["min"] for v in per.values()), 1),
    "probe_verdict": [verdict(r) for r in runs],
    "per_query": per,
}
json.dump(out, open("bench_stability.json", "w"), indent=1)
print("totals", totals, "spread", out["spread_pct"], "%")
for v in out["probe_verdict"]:
    print("probe", v.get("probe"), "->", v["band"],
          "within_band" if v.get("within_band") else
          ("OUT-OF-BAND" if v.get("within_band") is False else ""))
slow = sorted(per.items(), key=lambda kv: -kv[1]["median"])[:12]
for n, v in slow:
    print(f"{n:28} median {v['median']:5} range [{v['min']}, {v['max']}]")
