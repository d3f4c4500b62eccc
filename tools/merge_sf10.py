#!/usr/bin/env python3
"""Merge the sf10 bench windows into BENCH_SF10_FULL.json.

The sf10 full-surface protocol (SCALING.md rounds 11/13) measures each
query at the shuffle-partition count its shuffle volume calls for —
spill-prone / super-linear-at-32 queries in a 320-partition window,
everything else at the reference 32. A global 320 is wrong (small-
shuffle queries run 2x slower on scheduling overhead: minhash_lsh in
the round-11 A/B), so one artifact of record is N windows merged here:
per query, the fastest successful measurement wins, stamped with the
partition count it was measured at.

If OUT.json already exists, the merged result is additionally diffed
against it: any query whose new warm time exceeds 2x its previously
committed value is listed under `regressions_vs_prev` (with both
values), so a real plan-cost change OR a noisy window is visible at
measure time instead of at judge time (round 14 shipped a 5.2 -> 30.4 s
pipeline_clean_corpus line that a same-code re-measure showed was
window noise; nothing in the artifact flagged it).

Usage: merge_sf10.py OUT.json WINDOW.json:PARTS [WINDOW.json:PARTS ...]
  e.g. merge_sf10.py BENCH_SF10_FULL.json /tmp/A.json:32 /tmp/B.json:320
"""
import json
import os
import sys

BASELINE44 = {
    "dedup_embedding_cosine", "dedup_exact", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_simhash", "dedup_survivors",
    "multimodal_decode", "q10_returned_revenue", "q17_small_quantity",
    "q1_pricing_summary", "q3_top_revenue", "q5_region_revenue",
    "q_agg_value_stats", "q_anti_join", "q_brand_stats",
    "q_count_aggregator", "q_distinct_counts", "q_filter_pushdown",
    "q_hopping_count", "q_json_extract", "q_lag_gap",
    "q_last_window_upsert", "q_rank_suppliers", "q_rollup",
    "q_salted_agg", "q_semi_join", "q_session_window", "q_set_ops",
    "q_sliding_over_1m", "q_sliding_over_30m", "q_sliding_over_chunked",
    "q_topk_orders", "q_ts_roundtrip", "q_tumbling_count",
    "q_tumbling_count_sql", "q_tumbling_offset", "sim_ann_ivf",
    "sim_ann_lsh", "sim_topk_bruteforce", "text_fingerprint",
    "text_lang_id", "text_stats", "text_token_count", "text_vocab",
}


def main(out_path, *window_specs):
    warm, cold, parts, failed = {}, {}, {}, {}
    meta = None
    for spec in window_specs:
        path, p = spec.rsplit(":", 1)
        w = json.load(open(path))
        if meta is None:
            meta = w
        elif w.get("sf") != meta.get("sf"):
            raise SystemExit(
                f"window {path} measures sf={w.get('sf')!r} but the first "
                f"window measured sf={meta.get('sf')!r} — refusing to merge "
                "mixed scale factors")
        for k, v in w["queries"].items():
            # a failed COLD measurement (-1 sentinel) must not fold
            # silently into the headline cold sum even when the warm
            # value succeeded — treat the window as failed for k
            if v < 0 or w["queries_cold"].get(k, -1) < 0:
                failed.setdefault(k, []).append(int(p))
                continue
            if k not in warm or v < warm[k]:
                warm[k] = v
                cold[k] = w["queries_cold"][k]
                parts[k] = int(p)
    still_failed = sorted(k for k in failed if k not in warm)
    if still_failed:
        print(f"WARNING: failed in every window: {still_failed}",
              file=sys.stderr)
    # per-query >2x diff vs the previously committed artifact: the
    # measure-time tripwire for family-cache regressions and noisy
    # windows alike — a listed query is either re-measured or shipped
    # with its regression visibly on the record
    regressions = {}
    if os.path.exists(out_path):
        try:
            prev = json.load(open(out_path)).get("queries", {})
            for k, v in warm.items():
                if k in prev and prev[k] > 0 and v > 2 * prev[k]:
                    regressions[k] = {"prev": prev[k], "now": v,
                                      "ratio": round(v / prev[k], 2)}
            # a query present in the previous artifact but absent from
            # every new window's successes (dropped from the suite, or
            # newly failing everywhere) is as much a regression as a 2x
            # slowdown — without this, the only trace is a generic
            # still_failed stderr line and the artifact silently shrinks
            for k, pv in prev.items():
                if k not in warm:
                    regressions[k] = {"prev": pv, "now": None,
                                      "reason": "failed in every window"
                                      if k in failed else
                                      "absent from all merged windows"}
        except (json.JSONDecodeError, OSError) as e:
            print(f"WARNING: could not diff against previous {out_path}: {e}",
                  file=sys.stderr)
    if regressions:
        print(f"WARNING: >2x vs previous artifact: {sorted(regressions)}",
              file=sys.stderr)
    b44 = [warm[k] for k in BASELINE44 if k in warm]
    out = {
        "metric": "total",
        "value": round(sum(cold.values()), 3),
        "unit": "sec",
        "queries": {k: warm[k] for k in sorted(warm)},
        "queries_cold": {k: cold[k] for k in sorted(cold)},
        "total_warm": round(sum(warm.values()), 3),
        "baseline44_warm": round(sum(b44), 3),
        "baseline44_n": len(b44),
        "n": len(warm),
        "sf": meta["sf"],
        "drift_gauge": meta.get("drift_gauge"),
        "regressions_vs_prev": regressions,
        "bench_variants": meta.get("bench_variants"),
        "run_policy": meta.get("run_policy"),
        "partitions": {
            "per_query_at_320": sorted(k for k, p in parts.items() if p == 320),
            "default": 32,
            "rule": "shuffle partitions follow each query's shuffle volume "
                    "(SCALING.md round 11): spill-prone and "
                    "super-linear-at-32 queries measured in a 320-partition "
                    "window, the rest at the reference 32; per query the "
                    "fastest successful window is the value of record — the "
                    "knob a real cluster would configure per job",
            "oom_at_32_recovered_at_320": sorted(
                k for k in failed if parts.get(k) == 320),
        },
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"merged {len(window_specs)} windows -> {len(warm)} queries, "
          f"total_warm={out['total_warm']}s cold={out['value']}s "
          f"b44={out['baseline44_warm']}s (n={len(b44)})")


if __name__ == "__main__":
    main(sys.argv[1], *sys.argv[2:])
