"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``pyspark_bigdata_sars_cov_2_analysis_spark``
package; this module just re-exports the registry built by
``plans/*`` (one oracle-checked entry per operator in SURVEY.md §2 plus the
LLM-data surface).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pyspark_bigdata_sars_cov_2_analysis_spark import plans


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 family pricing summary) on sf0.001."""
    return plans.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


# The driver checks a static window of the FIRST 50 registered queries, so
# raw registration order left the whole TPC-H/join/text/udf surface without
# driver attestation for three rounds (ADVICE r3). Emit the dict in an
# explicit priority order instead, re-derived each round from the union of
# CORRECTNESS_r*.json: queries never green in ANY round first, then the
# stalest attestations, newest-attested last.
#
# Round-11 window (VERDICT r10 Next-round #1): the 19 queries
# registered DURING round 10 (never driver-attested — the standing
# never-attested-first principle) come first, in the order committed in
# VERDICT r9/r10; then the FIRST 31 of the 36-name r7-stale r11 head in
# its agreed order. 19 + 31 = 50 exactly; the 5 r7-stale names past the
# cut lead the committed round-12 head, followed by the stalest
# r8-attested names in their CORRECTNESS_r08 order (45 of 50 fit the
# r12 window; the last 5 spill to r13). `ml01_classifier_bench` (last
# attested r5) stays out of the rotation by design — it is the
# rows-only query, so a window slot buys no hash attestation. The cut
# point is COMPUTED in _ordered_names (pinned by
# tests/test_env_contract.py::test_attestation_window_arithmetic),
# never hand-counted in a comment.
_PRIORITY_FIRST = [
    # registered during round 10, never driver-attested — attestation
    # required; order as committed in VERDICT r10 #1
    "o11_budgeted_mixture",
    "j12_runtime_filter",
    "sql11_sql_body_udf",
    "d22_compacted_ingest",
    "o12_weighted_reservoir",
    "d23_contamination_report",
    "j13_asof_nearest",
    "d24_minhash_error",
    "f21_interval_arithmetic",
    "o13_snapshot_time_travel",
    "g01_pagerank_fixedpoint",
    "t17_langid_confusion",
    "a29_weighted_quantiles",
    "e15_snapshot_sink_stream",
    "d25_cluster_size_audit",
    "ml05_calibration_bins",
    "e16_scd2_stream_enrichment",
    "sql12_unpivot_clause",
    "sql13_named_parameters",
]

# Queries registered DURING round 11, after the window above was
# committed — per the standing overflow rule they queue BEHIND the
# window (local parity covers them until then) instead of displacing a
# committed stale name. They are never-attested, so the ROUND-12 window
# must lead with them (move them into _PRIORITY_FIRST when rotating),
# ahead of the 5 spilled r7 names and the r8-stale queue below.
_NEXT_WINDOW_FIRST: list[str] = [
    "o14_snapshot_lifecycle",
    "e17_statestore_keys",
]
_STALE_QUEUE = [
    # the committed r11 head: last attested round 7 (stalest in the
    # rotation), exact order agreed in VERDICT r9 #1 / r10 #1; the
    # first WINDOW − 19 = 31 fill the round-11 window, the remaining 5
    # past the cut lead the committed round-12 head
    "j08_full_outer", "u12_union_schema_evolution",
    "a22_countmin_heavy_hitters", "o08_quality_weighted_sample",
    "ml04_kfold_assignment", "p17_summary_stats", "a23_corr_covar",
    "f17_fuzzy_recode", "q1_pricing_summary", "q3_shipping_priority",
    "q5_local_supplier_volume", "q6_forecast_revenue",
    "q10_returned_items", "j01_left_join", "j02_semi_join",
    "j03_anti_join", "j05_salted_join_equiv", "q4_order_priority",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "q12_priority_shipping", "q13_customer_distribution",
    "q14_promo_revenue", "q15_top_supplier", "q17_small_quantity",
    "q18_large_volume", "q19_discounted_revenue",
    "q22_global_sales_opportunity", "q16_parts_supplier_relationship",
    "q20_potential_promotion",
    # ---- round-12 head starts here: the 5 r7-stale names past the
    # r11 cut, then the 50 r8-attested names in their CORRECTNESS_r08
    # order (45 fit the r12 window; the last 5 spill to r13) ----
    "q21_waiting_supplier",
    "q11_important_stock", "q2_min_cost_supplier", "u05_grouped_forecast",
    "u06_batch_inference",
    # last attested round 8, in their CORRECTNESS_r08 order
    "u13_grouped_arrow", "a24_zscore_anomaly", "e11_funnel_conversion",
    "e12_retention_cohorts", "p18_skew_profile",
    "o09_cluster_balanced_sample", "w08_scd2_intervals", "s05_ann_recall",
    "sql06_relational_division", "u14_pandas_udaf", "m06_resize_nn",
    "t14_langid_margin", "d16_containment_neardup", "m07_audio_decimate",
    "sql07_pivot_clause", "p19_snapshot_drift",
    "w09_running_distinct_users", "e13_session_conversion",
    "j09_temporal_scd2_join", "p20_join_cardinality_preflight",
    "sql08_registered_udf", "e14_view_purchase_full_outer",
    "a25_transpose", "f18_ansi_safe_functions", "f19_collated_grouping",
    "w10_forward_fill", "a26_deterministic_mode", "f20_parse_url",
    "t15_sentence_stats", "d18_curation_pipeline",
    "j10_range_lookup_broadcast", "e01_tumbling_window",
    "e03_dedup_latest_state", "e04_sliding_window", "e05_user_totals",
    "e07_segment_window", "e08_gapfill_daily", "a10_rollup", "a11_cube",
    "a12_grouping_sets", "a13_pivot", "a14_count_distinct",
    "w04_lag_lead_rank", "w05_moving_frame", "f06_posexplode_roundtrip",
    "sql01_subquery", "f13_null_handling", "o04_deterministic_sample",
    "a16_percentiles", "sql02_file_scan",
]

# the driver's attestation window
WINDOW = 50


def _ordered_names() -> list[str]:
    head = [
        n
        for n in _PRIORITY_FIRST + _STALE_QUEUE + _NEXT_WINDOW_FIRST
        if n in plans.QUERIES
    ]
    seen = set(head)
    return head + [n for n in plans.QUERIES if n not in seen]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: plans.QUERIES[n] for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {n: plans.ORACLES[n] for n in _ordered_names() if n in plans.ORACLES}
