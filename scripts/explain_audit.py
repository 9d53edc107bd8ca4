"""Plan-shape audit: for each driver-facing query, check the physical plan
for the properties that matter at 100 TB — filter/column pushdown into the
parquet scan, broadcast joins for dim sides, map-side partial aggregation,
whole-stage codegen coverage, and absence of cartesian products.

Usage: python scripts/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_rust_spark.queries import QUERIES  # noqa: E402
from etl_rust_spark.session import get_spark  # noqa: E402

CHECKS = {
    # query -> (must_contain, must_not_contain); token text matches the
    # executedPlan().toString() rendering (DataFilters show what reached
    # the scan; the FileScan column list shows pruning; partial_* shows
    # map-side combine)
    "q1_pricing_summary": (["DataFilters: [isnotnull(l_shipdate", "partial_sum"], ["CartesianProduct"]),
    "filter_projection": (["DataFilters: [isnotnull(l_shipdate", "FileScan parquet [l_orderkey#"], ["Exchange"]),
    "q3_shipping_priority": (["BroadcastHashJoin", "TakeOrderedAndProject"], ["CartesianProduct"]),
    "q5_nation_revenue": (["BroadcastHashJoin"], ["CartesianProduct"]),
    "q10_returned_customers": (["TakeOrderedAndProject", " = R)"], []),
    "cdc_final_state": (["partial_max", "partial_count"], ["Window"]),
    "dedup_exact": (["partial_min"], []),
    "dedup_minhash_lsh": (["Generate explode"], ["CartesianProduct"]),
    "ann_cosine_topk": (["BroadcastNestedLoopJoin"], []),  # bounded: corpus x |queries|=5
    "ann_lsh_topk": ([], ["CartesianProduct"]),
    "topk_per_group": (["Window"], ["CartesianProduct"]),
    "q4_order_priority": (["LeftSemi", "partial_count"], ["CartesianProduct"]),
    "scd2_event_intervals": (["Window"], ["CartesianProduct", "Generate"]),
    "ann_ivf_topk": ([], ["CartesianProduct"]),
    "dedup_ngram_jaccard": ([], ["CartesianProduct"]),
    "transcript_export_renumbered": (["FlatMapGroupsIn"], ["CartesianProduct"]),
    "grouped_map_dense_rank": (["FlatMapGroupsInPandas"], ["CartesianProduct"]),
    "pivot_event_counts": (["partial_pivot", "Exchange hashpartitioning(user_id"], []),
    "token_stats": (["partial_sum"], []),
    # TPC-H sweep (round 3)
    "q6_forecast_revenue": (["DataFilters: [isnotnull(l_shipdate", "partial_sum"], ["Exchange hashpartitioning"]),
    "q7_nation_trade": (["BroadcastHashJoin"], ["CartesianProduct"]),
    "q8_market_share": (["BroadcastHashJoin"], ["CartesianProduct"]),
    "q9_product_profit": (["BroadcastHashJoin", "PushedFilters: [IsNotNull(p_name), StringContains(p_name,red)"], ["CartesianProduct"]),
    "q11_important_parts": (["partial_sum"], ["CartesianProduct"]),
    "q12_priority_shipping": (["DataFilters: [isnotnull(l_shipdate", "partial_sum"], ["CartesianProduct"]),
    "q13_customer_distribution": (["partial_count"], ["CartesianProduct"]),
    "q14_promo_revenue": (["BroadcastHashJoin", "DataFilters: [isnotnull(l_shipdate"], ["Exchange hashpartitioning"]),
    "q15_top_supplier": (["BroadcastHashJoin", "partial_sum"], ["CartesianProduct"]),
    "q16_supplier_part_counts": (["LeftAnti, BuildRight", "partial_count(distinct"], ["CartesianProduct"]),
    "q19_discounted_revenue": (["BroadcastHashJoin", "DataFilters: [isnotnull(l_quantity"], ["Exchange hashpartitioning"]),
    "q20_excess_shipments": (["BroadcastHashJoin"], ["CartesianProduct"]),
    "q21_blocking_supplier": (["LeftSemi", "LeftAnti", "TakeOrderedAndProject"], ["CartesianProduct"]),
    "q22_dormant_customers": (["LeftAnti", "partial_sum"], ["CartesianProduct"]),
    "q2_min_price_supplier": (["BroadcastHashJoin", "partial_min"], ["CartesianProduct"]),
    # round-5 closing additions
    # one co-partitioned full-outer SMJ + map-side partial agg; unchanged
    # keys filtered before the agg (the O(changed) snapshot-sync shape)
    "snapshot_diff": (["SortMergeJoin [c_custkey", "FullOuter",
                       "partial_sum"], ["CartesianProduct"]),
    "triangle_census": (["LeftSemi", "partial_sum"], ["CartesianProduct"]),
    "assoc_rules_lift": (["BroadcastHashJoin", "TakeOrderedAndProject"], ["CartesianProduct"]),
    "event_trigram_paths": (["Window", "TakeOrderedAndProject", "partial_count"], ["CartesianProduct"]),
    "acf_daily_events": (["BroadcastHashJoin", "partial_sum"], ["CartesianProduct"]),
    "funnel_time_to_convert": (["partial_min"], ["CartesianProduct", "Window"]),
    "kl_source_drift": (["BroadcastHashJoin", "partial_sum"], ["CartesianProduct"]),
    # t-test pair space is |types|^2 (bounded dim^2) — the BNLJ is the
    # disclosed small-side exception, same as ann_cosine_topk
    "welch_t_test_values": (["partial_sum", "BroadcastNestedLoopJoin"], ["CartesianProduct"]),
    "daily_activity_bitmask": (["partial_bit_or"], ["CartesianProduct", "Window"]),
    "engagement_quartiles_by_type": (["ntile", "Window", "partial_count"], ["CartesianProduct"]),
    # curation round 3b
    "line_dedup_stats": (["Generate explode", "partial_count(distinct"], ["CartesianProduct", "Window"]),
    # two-phase prefix sum (VERDICT r03 #3): the data-side window must be
    # partitioned by (source/shard, __chunk) — "__chunk" in the partition
    # spec proves no single-task-per-group global window — with the
    # offsets shipped back as a broadcast join
    "sequence_packing": (["Window", "Exchange hashpartitioning(source", "__chunk", "BroadcastHashJoin"], ["CartesianProduct"]),
    "stratified_sample": ([], ["Exchange", "BatchEvalPython"]),
    "funnel_unconverted": (["LeftOuter"], ["CartesianProduct"]),
    "udtf_passages": (["UDTF"], []),  # the deliberate Python-UDTF surface entry
    "training_shards": (["Window", "Exchange hashpartitioning(shard", "__chunk", "BroadcastHashJoin"], ["CartesianProduct"]),
    "dedup_canonical": (["Window"], ["CartesianProduct"]),
    "map_event_histogram": (["partial_count"], ["CartesianProduct", "BatchEvalPython"]),
    "gapfill_daily": (["Generate explode"], ["CartesianProduct", "BatchEvalPython"]),
    "price_quantity_corr": (["partial_sum"], ["CartesianProduct", "BatchEvalPython"]),
    # bounded 25x25 dim pair space: the nested-loop join is the disclosed design
    "name_edit_distances": (["BroadcastNestedLoopJoin"], ["BatchEvalPython"]),
    "tfidf_top_terms": (["Window", "partial_count"], ["CartesianProduct", "BatchEvalPython"]),
    "session_window_agg": (["session_window"], ["CartesianProduct", "BatchEvalPython"]),
    "date_arithmetic": (["DataFilters: [isnotnull(o_orderdate"], ["Exchange", "BatchEvalPython"]),
    "rank_distribution": (["Window", "ntile"], ["CartesianProduct", "BatchEvalPython"]),
    # round 4
    "retention_cohorts": (["Exchange hashpartitioning(user_id", "partial_min"], ["CartesianProduct", "Window", "BatchEvalPython"]),
    "consistent_sample_per_source": (["Window", "__chunk"], ["CartesianProduct", "BatchEvalPython"]),
    "unigram_rarity_profile": (["Generate explode", "partial_count"], ["CartesianProduct", "BatchEvalPython"]),
    "embedding_centroid_similarity": (["partial_sum", "BroadcastHashJoin"], ["CartesianProduct", "BatchEvalPython"]),
    "bpe_pair_counts": (["TakeOrderedAndProject", "partial_count"], ["CartesianProduct", "BatchEvalPython"]),
    "dataset_mixture_order": (["Window", "__chunk", "BroadcastHashJoin"], ["CartesianProduct", "BatchEvalPython"]),
    "leakage_safe_splits": ([], ["CartesianProduct"]),  # LSH pairs + components, never all-pairs
    "length_percentiles_by_source": (["partial_percentile"], ["CartesianProduct", "BatchEvalPython", "Window"]),
    "moving_avg_daily_events": (["Window", "partial_count"], ["CartesianProduct", "BatchEvalPython"]),
    "first_last_events_per_user": (["Window"], ["CartesianProduct", "BatchEvalPython"]),
    "cube_source_lang": (["Expand", "partial_count"], ["CartesianProduct", "BatchEvalPython", "Window"]),
    "dedup_rate_by_source": (["partial_count"], ["CartesianProduct", "BatchEvalPython", "Window"]),
    "curated_corpus": (["Window"], ["CartesianProduct"]),  # gates codegen; canonical via LSH components
    "ngram_repetition_stats": (["Generate explode", "partial_count"], ["CartesianProduct", "BatchEvalPython", "Window"]),
    "cross_source_overlap": (["Generate explode", "partial_count"], ["CartesianProduct", "BatchEvalPython", "Window"]),
    "event_transition_matrix": (["Window", "partial_count"], ["CartesianProduct", "BatchEvalPython"]),
    "event_value_histogram": (["partial_count", "partial_sum"], ["CartesianProduct", "BatchEvalPython", "Window"]),
    "weekday_hour_heatmap": (["partial_count"], ["CartesianProduct", "BatchEvalPython", "Window"]),
    "top_users_activity": (["TakeOrderedAndProject"], ["CartesianProduct", "BatchEvalPython", "Window"]),
    "funnel_conversion_rates": (["partial_min", "Generate"], ["CartesianProduct", "BatchEvalPython", "Window"]),
    "doc_length_outliers": (["partial_count", "BroadcastHashJoin"], ["CartesianProduct", "BatchEvalPython", "Window"]),
    "dedup_cluster_sizes": (["partial_count"], ["CartesianProduct", "BatchEvalPython", "Window"]),
    # rank over the fixed top-100 set is a broadcast non-equi self-join
    # (BroadcastNestedLoopJoin over 100x100), deliberately NOT a window
    "zipf_top_terms": (["TakeOrderedAndProject", "partial_count"], ["CartesianProduct", "BatchEvalPython", "Window"]),
    "source_entropy_by_lang": (["partial_count", "BroadcastHashJoin"], ["CartesianProduct", "BatchEvalPython", "Window"]),
    # round 5b
    "fk_integrity_audit": (["BroadcastHashJoin", "LeftOuter", "partial_count"], ["CartesianProduct", "BatchEvalPython", "Window"]),
    "cumulative_distinct_users": (["Window", "partial_min"], ["CartesianProduct", "BatchEvalPython"]),
    "time_weighted_value": (["Window", "Exchange hashpartitioning(user_id", "partial_sum"], ["CartesianProduct", "BatchEvalPython"]),
    "activity_streaks": (["Window", "Exchange hashpartitioning(user_id", "partial_count"], ["CartesianProduct", "BatchEvalPython"]),
    # banded self-join: explode to (bucket, bucket-1) slots, equi-join on
    # (user_id, bkt) — the whole point is that the inequality join never
    # degenerates to a cartesian
    "event_pair_proximity": (["Generate explode", "partial_count"], ["CartesianProduct", "BatchEvalPython", "Window"]),
    "distinct_sketch_lc": (["Expand", "partial_count"], ["CartesianProduct", "BatchEvalPython", "Window"]),
    "wow_growth_by_type": (["Window", "partial_count"], ["CartesianProduct", "BatchEvalPython"]),
    # argmax aggregate: the winner is picked INSIDE the keyed agg
    # (max(struct)) — no row_number window, no second shuffle
    "mode_event_type_per_user": (["partial_count", "partial_max"], ["CartesianProduct", "BatchEvalPython", "Window"]),
    "value_trend_slope": (["partial_sum"], ["CartesianProduct", "BatchEvalPython", "Window"]),
    # one agg pass per table (multi-distinct Expand), melted via stack —
    # never a scan per column
    "dq_completeness_profile": (["Expand", "partial_count"], ["CartesianProduct", "BatchEvalPython", "Window"]),
    "inter_arrival_stats": (["Window", "Exchange hashpartitioning(user_id", "partial_count"], ["CartesianProduct", "BatchEvalPython"]),
    # the 3-threshold boundary probe is a broadcast non-equi join over the
    # tiny count histogram — BNLJ is the disclosed design, never cartesian
    "heavy_hitter_concentration": (["Window", "BroadcastNestedLoopJoin", "partial_count"], ["CartesianProduct", "BatchEvalPython"]),
    # deletion-neighborhood blocking: candidates meet in an EQUI join on
    # the variant string (never a pairwise cross), then exact verify
    "fuzzy_name_matches": (["Generate explode", "levenshtein"], ["CartesianProduct", "BatchEvalPython", "Window"]),
    "co_engagement_jaccard": (["partial_count", "BroadcastHashJoin"], ["CartesianProduct", "BatchEvalPython", "Window"]),
    "mad_volume_outliers": (["partial_count", "BroadcastHashJoin"], ["CartesianProduct", "BatchEvalPython", "Window"]),
    # round 5c — window is PARTITIONED BY day over post-agg rows (width =
    # the event-type enum per day)
    "daily_type_share": (["Window", "Exchange hashpartitioning(day", "partial_sum"], ["CartesianProduct", "BatchEvalPython"]),
    "dau_mau_stickiness": (["partial_count", "BroadcastHashJoin"], ["CartesianProduct", "BatchEvalPython", "Window"]),
    # interval overlap meets in an EQUI join on custkey; the overlap
    # inequality is a residual filter, never a cartesian
    "order_span_overlaps": (["Join [custkey"], ["CartesianProduct", "BatchEvalPython", "Window"]),
    "benford_first_digit": (["partial_count", "BroadcastNestedLoopJoin"], ["CartesianProduct", "BatchEvalPython", "Window"]),
    # disc-quartile breakpoints cumulate the per-dimension count HISTOGRAM
    # (distinct metric values, histogram-bounded like
    # heavy_hitter_concentration) — the Window never sees customer rows
    "rfm_segments": (["Window", "partial_count", "BroadcastNestedLoopJoin"], ["CartesianProduct", "BatchEvalPython"]),
    # round 5d — iterative graph rank: one keyed join+agg shuffle per
    # unrolled iteration, integer fixed-point (no float, no window)
    "pagerank_supplier_part": (["partial_sum", "TakeOrderedAndProject"], ["CartesianProduct", "BatchEvalPython", "Window"]),
    # contingency cross product is margin-rows only (5 langs x 20 sources)
    "chi_square_lang_source": (["partial_count", "BroadcastNestedLoopJoin"], ["CartesianProduct", "BatchEvalPython", "Window"]),
    # pair generation is an equi self-join keyed on l_orderkey, s1<s2 residual
    "supplier_cooccurrence": (["partial_count", "TakeOrderedAndProject"], ["CartesianProduct", "BatchEvalPython", "Window"]),
    # frontier expansion = keyed equi joins + anti-join against the reached set
    "bfs_hop_distance": (["LeftAnti", "partial_min"], ["CartesianProduct", "BatchEvalPython", "Window"]),
    # dominance test runs over the per-supplier AGGREGATE (|suppliers|^2
    # bounded), broadcast — the fact table is collapsed first
    "supplier_skyline": (["partial_sum", "BroadcastNestedLoopJoin"], ["CartesianProduct", "BatchEvalPython", "Window"]),
    # 20-day lookback = type-keyed equi self-join over (type, day) agg rows
    "ewma_daily_events": (["partial_count", "partial_sum"], ["CartesianProduct", "BatchEvalPython", "Window"]),
    # sweep line: +1/-1 deltas collapse to day rows BEFORE the running sum
    "concurrent_order_spans": (["partial_count", "partial_sum", "Window"], ["CartesianProduct", "BatchEvalPython", "Generate"]),
    # node-keyed degree joins + one map-side-combined moment agg
    "degree_assortativity": (["partial_sum", "partial_count"], ["CartesianProduct", "BatchEvalPython", "Window"]),
    # spine explode + user-PARTITIONED neighbor windows (keyed, never global)
    "linear_interpolate_daily": (["Generate explode", "Window"], ["CartesianProduct", "BatchEvalPython"]),
    # cumulation over the per-flag quantity HISTOGRAM (partitioned + bounded)
    "weighted_median_quantity": (["partial_sum", "Window"], ["CartesianProduct", "BatchEvalPython"]),
    # min-plus relaxation rounds: keyed joins + map-side-combined MIN aggs
    "bellman_ford_distances": (["partial_min"], ["CartesianProduct", "BatchEvalPython", "Window"]),
    # journey windows are user-/(user,conv)-partitioned; report agg map-side
    "linear_attribution": (["Window", "partial_count"], ["CartesianProduct", "BatchEvalPython"]),
    # keyed line agg + keyed header join + TakeOrdered(20)
    "order_reconciliation": (["partial_sum", "TakeOrderedAndProject"], ["CartesianProduct", "BatchEvalPython", "Window"]),
}


# queries that eagerly materialize (cache-hygienic localCheckpoint): audit
# their LAZY plan twin instead — the checkpoint-scan plan the query returns
# says nothing about the shape of the work that ran
def _minhash_lazy(spark, sf_dir):
    from etl_rust_spark.operators.dedup import minhash_lsh_pairs_plan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return minhash_lsh_pairs_plan(
        docs, n_hashes=8, bands=4, shingle_n=3, jaccard_threshold=0.35
    )


def _incremental_lazy(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_rust_spark.operators.dedup import dedup_incremental

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup_incremental(
        docs.filter(F.col("doc_id") % 2 == 1),
        docs.filter(F.col("doc_id") % 2 == 0),
        n_hashes=8, bands=4, shingle_n=3, jaccard_threshold=0.35,
        checkpoint=False,
    )


PLAN_OVERRIDES = {
    "dedup_minhash_lsh": _minhash_lazy,
    "dedup_incremental": _incremental_lazy,
}


# The "no unpartitioned Window" invariant, mechanically checked: a global
# (partition-less) window funnels the whole input through ONE task — a
# scale-killer at 100 TB — so every plan is scanned for one and any hit
# outside this exemption dict fails the audit. Exemptions must argue
# BOUNDED input, not small-test-data luck.
GLOBAL_WINDOW_EXEMPT = {
    "moving_avg_daily_events": (
        "calendar-bounded: the window runs AFTER groupBy(day) collapses "
        "events to one row per day — 100 TB of events is still ≤ a few "
        "thousand day-rows (≈36k rows/century), so the single task holds "
        "kilobytes regardless of input scale"
    ),
    "dataset_mixture_order": (
        "metadata-bounded: the only global window is the chunk-offset "
        "prefix sum of the two-phase row_number — it runs over the "
        "per-(__chunk) SUBTOTALS, capped at 1024 rows by construction "
        "(queries.py two-phase pattern); the data-phase window below it "
        "is partitioned by __chunk"
    ),
    "heavy_hitter_concentration": (
        "histogram-bounded: the cumulative window runs over DISTINCT "
        "per-user activity-count values (one row per level, <= max "
        "per-user count — MBs at 10^10 events), never over users or "
        "events; the per-user counts beneath it are a keyed agg"
    ),
    "cumulative_distinct_users": (
        "calendar-bounded: the running total runs AFTER two keyed aggs "
        "collapse events to one row per day (daily active + daily "
        "new-user counts) — the global window's input is day-rows only, "
        "kilobytes at any corpus scale, same exemption argument as "
        "moving_avg_daily_events"
    ),
    "rfm_segments": (
        "histogram-bounded: the three cumulative windows run over the "
        "DISTINCT values of each per-customer metric (recency days / "
        "order counts / cent totals — one row per level), never over "
        "customers; the per-customer metrics beneath them are a keyed "
        "agg, same exemption argument as heavy_hitter_concentration"
    ),
    "cusum_volume_shift": (
        "calendar-bounded: both global windows (drift prefix sum and "
        "running min) run AFTER groupBy(day) collapses events to one "
        "row per day (~36k rows/century), same exemption argument as "
        "moving_avg_daily_events"
    ),
    "survival_reorder_km": (
        "duration-bounded: the cumulative risk-set and survival-product "
        "windows run AFTER a keyed agg collapses customers to one row "
        "per distinct reorder day-gap (<= calendar span, ~36k rows/"
        "century) — never over customers or orders; the per-customer "
        "first/second-order window above them is partitioned by custkey"
    ),
    "concurrent_order_spans": (
        "calendar-bounded: the sweep-line running sum runs AFTER the "
        "keyed groupBy(day) collapses span deltas to one row per "
        "boundary day (~36k rows/century at any corpus size), same "
        "exemption argument as moving_avg_daily_events"
    ),
}


def _unpartitioned_windows(plan: str) -> list[str]:
    """Window operator lines whose spec has NO partition columns.

    The executed plan prints ``Window [exprs], [partition], [order]`` —
    three top-level bracket groups when partitioned-and-ordered, two when
    either the order spec or the partition spec is absent. A two-group
    line is only GLOBAL when its second group is an ORDER spec (entries
    carry ``ASC``/``DESC``); a partition-only window (no ORDER BY, e.g. a
    ratio-to-report total per group) keys every row to its partition and
    is fine. Returns the offending lines.
    """
    out = []
    for line in plan.splitlines():
        idx = line.find("Window [")
        if idx < 0 or "WindowGroupLimit" in line:
            continue
        depth = 0
        groups: list[str] = []
        for ch in line[idx:]:
            if ch == "[":
                if depth == 0:
                    groups.append("")
                depth += 1
            elif ch == "]":
                depth -= 1
            if depth > 0 and groups:
                groups[-1] += ch
        if len(groups) >= 3:
            continue  # partitioned and ordered
        if len(groups) == 2 and not (
            " ASC" in groups[1] or " DESC" in groups[1]
        ):
            continue  # partition-only window (no order spec) — keyed, fine
        out.append(line.strip())
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("explain-audit")
    failures = 0
    for name, fn in QUERIES.items():
        fn = PLAN_OVERRIDES.get(name, fn)
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:
            print(f"ERROR {name}: {e}")
            failures += 1
            continue
        notes = []
        must, must_not = CHECKS.get(name, ([], ["CartesianProduct"]))
        for token in must:
            if token not in plan:
                notes.append(f"MISSING <{token}>")
        for token in must_not:
            if token in plan:
                notes.append(f"UNEXPECTED <{token}>")
        if name not in GLOBAL_WINDOW_EXEMPT:
            for line in _unpartitioned_windows(plan):
                notes.append(f"GLOBAL WINDOW <{line[:80]}>")
        exchanges = plan.count("Exchange")
        bhj = plan.count("BroadcastHashJoin")
        smj = plan.count("SortMergeJoin")
        status = "FAIL" if notes else "ok"
        if notes:
            failures += 1
        print(
            f"{status:4} {name:28} exchanges={exchanges:2} "
            f"bhj={bhj} smj={smj} {'; '.join(notes)}"
        )
    print(f"\n{'ALL PLANS OK' if not failures else f'{failures} PLAN ISSUES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
