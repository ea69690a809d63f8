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
# Round-10 window (VERDICT r9 Next-round #1): the 8 queries registered
# LATE in round 9 (never driver-attested — the standing
# never-attested-first principle) come first, then the committed
# 28-name r6-stale r10 head in its agreed order, then the stalest
# r7-attested names in their CORRECTNESS_r07 order. 8 + 28 + 14 = 50
# exactly; the remaining 36 r7 names past the cut are the committed
# round-11 head. `ml01_classifier_bench` (last attested r5) stays out
# of the rotation by design — it is the rows-only query, so a window
# slot buys no hash attestation (VERDICT r9 window plan). The cut point
# is COMPUTED in _ordered_names (pinned by
# tests/test_env_contract.py::test_attestation_window_arithmetic),
# never hand-counted in a comment.
_PRIORITY_FIRST = [
    # registered late in round 9, never driver-attested — attestation
    # required; order as committed in VERDICT r9 #1
    "a27_approx_top_k_mergeable", "u15_python_udtf",
    "j11_lateral_join_api", "a28_listagg_within_group",
    "sql09_sql_scripting", "sql10_pipe_syntax", "o10_token_budget_plan",
    "d21_curation_funnel",
]

# Queries registered DURING round 10, after the window above was
# committed — per the standing overflow rule they queue BEHIND the
# window (local parity covers them until then) instead of displacing a
# committed stale name. They are never-attested, so the ROUND-11 window
# must lead with them (move them into _PRIORITY_FIRST when rotating).
# Round-11 arithmetic with the 19 names below: 19 + the FIRST 31 of the
# 36-name r11 head marked in _STALE_QUEUE = 50 exactly; the remaining
# 5 r7-stale names falling past the cut in the committed order lead the
# r12 head, followed by the stalest r8-attested names in their
# CORRECTNESS_r08 order.
_NEXT_WINDOW_FIRST: list[str] = [
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
_STALE_QUEUE = [
    # the committed r10 head: last attested round 6 (stalest in the
    # rotation), exact order agreed in VERDICT r8 #1 / r9 #1
    "p16_null_profile",
    "a01_grouped_sum", "a03_count_share", "a04_max_avg",
    "a05_group_count", "a08_ordered_collect", "e02_sessionize",
    "e06_view_purchase_attribution", "j06_asof_join",
    "j07_range_join_binned", "o05_stratified_sample",
    "d08_leakage_free_split", "w03_topn_per_group", "o03_topk_resort",
    "u01_union", "u03_intersect", "u04_except", "f01_string_funcs",
    "f11_date_funcs", "f12_json_extract", "t01_token_count",
    "t02_quality_score", "t03_language_id", "t04_fingerprint",
    "t05_clean_wordcount", "t07_repetition_ratio", "t08_pii_scrub",
    "t06_top_bigrams",
    # last attested round 7, in their CORRECTNESS_r07 order; the first
    # WINDOW − 8 − 28 = 14 fill the round-10 window, the remaining 36
    # past the cut are the committed round-11 head
    "u08_arrow_batch_transform", "a20_kll_mergeable_quantiles",
    "a19_approx_percentile_rankcheck", "d14_chunk_dedup_keep_first",
    "a21_unpivot_melt", "ml03_regression_metrics", "u09_arrow_scalar_udf",
    "sql05_lateral_view_tokens", "e10_view_purchase_outer",
    "w07_time_range_frame", "f16_array_lambda", "u10_except_all",
    "u11_intersect_all", "o07_zorder_cells",
    # ---- round-11 head starts here (36 names) ----
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
    "q20_potential_promotion", "q21_waiting_supplier",
    "q11_important_stock", "q2_min_cost_supplier", "u05_grouped_forecast",
    "u06_batch_inference",
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
