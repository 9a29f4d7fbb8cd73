#!/usr/bin/env python3
"""Merge the 100x (target/sf10) bench runs into BENCH_sf1.json as the
`sf10_extension` block — the fourth point of the scaling curve
sf0.1 -> sf1 (10x) -> sf3 (30x) -> sf10 (100x). Per-step linear = 3.33.

Inputs: the per-run bench_last.json mirrors copied after each run.
Run 1 is recorded but excluded from mins (it overlapped the sf1 DuckDB
oracle compare — contaminated by design of the timeline, see method).
Runs 3-4 carry the AQE initialPartitionNum=192 shuffle-sizing fix;
run 2 is the pre-fix control kept per query as `cfg4`.
"""
import json, sys

R1 = {"agg_approx_sketch": 38.01, "agg_sketch_merge": 50.35,
      "agg_stats": 58.47, "basket_pairs": 259.07,
      "dedup_ngram_jaccard": 221.50, "dedup_substring": 75.65,
      "ioc_classify": 76.37, "ioc_pastebin_enrich": 162.88,
      "ioc_tweet_etl": 147.42, "join_bloom_semi": 188.93,
      "q21_waiting": 38.16, "sim_recall": 7.34, "sim_recall_pq": 11.01,
      "text_rake": 34.26, "window_topk_agg": 13.24,
      "window_topk_heap": 31.87}


def main():
    bench = json.load(open("BENCH_sf1.json"))
    sf3 = bench["sf3_extension"]["queries"]
    r2 = json.load(open("/tmp/bench_sf10_run2.json"))
    r3 = json.load(open("/tmp/bench_sf10_run3.json"))
    r4 = json.load(open("/tmp/bench_sf10_run4.json"))

    queries = {}
    for q in sorted(r3["queries"]):
        runs = {"cfg4": r2["queries"][q], "cfg192": r3["queries"][q]}
        if q in r4["queries"]:
            runs["cfg192_b"] = r4["queries"][q]
        mn = min(runs.values())
        ratio = round(mn / sf3[q]["sf3_min"], 2)
        queries[q] = {
            "sf3_min": sf3[q]["sf3_min"],
            "sf10_runs": runs,
            "sf10_min": mn,
            "r_30_to_100x": ratio,
            "verdict": "<=linear" if ratio <= 3.45 else "above-linear",
        }

    warm = {}
    for src, tag in ((r2, "cfg4"), (r3, "cfg192")):
        for k, v in src.get("warm", {}).items():
            warm.setdefault(k, {})[tag] = v

    bench["sf10_extension"] = {
        "corpus": "target/sf10 = graft.Synth 100x replica of sf0.1 "
                  "(60M lineitem, 10M events, 500k documents, 200k "
                  "embeddings; entity names regenerated per replica — "
                  "name-key bijection preserved, see Synth.scala)",
        "method": "four-point curve: per-step ratio = sf10_min / sf3_min, "
                  "linear = 100/30 = 3.33. Three clean fresh-JVM runs on the "
                  "rebuilt corpus: run cfg4 = pre-fix control (AQE "
                  "initialPartitionNum = cores = 4), runs cfg192(_b) = the "
                  "shuffle-sizing fix (initialPartitionNum 192, AQE coalesce "
                  "by bytes). min is taken across ALL clean runs — the box "
                  "shows +-25% run-to-run drift at this scale. A 4th (first) "
                  "run overlapped the sf1 DuckDB oracle compare and is "
                  "discarded as contaminated (its totals: 1414.5 s vs "
                  "966/981 s clean). The two documented exact baselines "
                  "(window_topk, sim_cosine_topk) are excluded as at 30x.",
        "queries": queries,
        "warm_pairs_note": "incremental label maintenance priced at 100x "
                  "(cfg4/cfg192 warm ledger): campaign 42.6/49.1 s full vs "
                  "10.2/10.9 s incremental (4.2-4.5x), graph_cc 25.9/39.6 vs "
                  "12.3/20.5 (1.9-2.1x), phash 60.1/64.9 vs 25.9/32.4 "
                  "(2.0-2.3x) — the nightly relabel cost the incremental "
                  "path avoids grows with corpus, its own cost with the "
                  "delta.",
        "warm": warm,
        "findings": [
            "window_topk_heap 5.6x per step pre-fix -> 2.55x post-fix "
            "(32.9 s -> 14.5 s): the superlinearity was the cores-pinned "
            "shuffle (4 partitions x ~15M rows, spilling), not the heap "
            "operator — partition count must follow bytes (DEPLOYMENT.md).",
            "agg_stats 4.2x pre-fix -> 3.27x post-fix: same cause.",
            "basket_pairs 4.47x and dedup_ngram_jaccard 4.07x remain "
            "~20-35% above linear per step on mins: their LOGICAL work is "
            "measured exactly linear (pair volume 3.0000x per 3x at the "
            "30x point; per-order basket sizes replication-invariant, "
            "SynthSpec-pinned), no cartesian/self-join exists in either "
            "plan (PLANS.md sweep), and the overage matches the box's "
            "documented drift band on a 4-core/24g single node whose "
            "working set left page cache at 100x — a cluster sizes "
            "executors to the advisory partition size instead.",
            "dedup_substring prefers the narrow config (46.3 s cfg4 vs "
            "74.9 s cfg192): a join-free linear agg chain pays task/wave "
            "overhead for extra partitions it never needed — the advisory "
            "partition size, not a global initialPartitionNum, is the "
            "per-shuffle knob that serves both shapes at once.",
            "q21_waiting 3.7-3.8x: group cardinality itself grows 100x "
            "after the name-bijection fix (one group per supplier), so the "
            "top-100 sort input scales with corpus — within drift of "
            "linear.",
        ],
    }
    json.dump(bench, open("BENCH_sf1.json", "w"), indent=1)
    print("merged sf10_extension:", len(queries), "queries")


if __name__ == "__main__":
    sys.exit(main())
