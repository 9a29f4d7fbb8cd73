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
# BASELINE.md's floors table (update BOTH on re-baseline). Calibrated on
# the r13 container + r13 tree (214 queries), SIX same-tree runs:
# (probe, total) = (0.93,133.4) (1.0,151.4) (1.07,163.1) (1.12,140.2)
# (1.21,171.2) (1.3,170.4) — below probe ~1.35 the correlation is loose
# (±15% total at equal probe), so that whole region is ONE quiet band
# and only a sustained move outside it is a regression signal. The
# bursty band is anchored by the r12-judge points (187 at 1.2 and 246
# at 3.0 on the ~6 s-slower r12 tree) and r8-r11 history (1.8-2.0 →
# 195-226). Probes between 1.35 and 1.5 are uncalibrated on this tree.
PROBE_BANDS = [
    {"band": "quiet", "probe": [0.0, 1.35], "total": [112.0, 178.0]},
    {"band": "bursty", "probe": [1.5, 3.5], "total": [178.0, 255.0]},
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
