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
# Round-14 window (VERDICT r13 Next-round #1): o15 leads — its r13
# attestation FAILED on an oracle typing bug (DuckDB HUGEINT → float64
# hash mismatch; the oracle is fixed this round) and a failed
# attestation outranks never-attested. Then the two round-13
# registrations (never driver-attested — the standing
# never-attested-first principle), then the 8 r9-stale names spilled
# past the r13 cut, then the FIRST 39 of the 50 r10-attested names in
# their CORRECTNESS_r10 order. 3 + 8 + 39 = 50 exactly; the committed
# round-15 head is the 11 r10 names past the cut, then the 50
# r11-attested names in their CORRECTNESS_r11 order (11 + 39 fill a
# clean r15 window; the last 11 r11 names spill to r16).
# `ml01_classifier_bench` (last attested r5) stays out of the rotation
# by design — it is the rows-only query, so a window slot buys no hash
# attestation. The cut point is COMPUTED in _ordered_names (pinned by
# tests/test_env_contract.py::test_attestation_window_arithmetic),
# never hand-counted in a comment.
_PRIORITY_FIRST = [
    # FAILED r13 attestation (oracle typing, fixed in this round) —
    # re-attestation required ahead of everything else
    "o15_schema_evolution",
    # registered during round 13, never driver-attested; order as
    # committed in _NEXT_WINDOW_FIRST last round / VERDICT r13 #1
    "o16_data_skipping",
    "e18_snapshot_stream_source",
]

# Queries registered DURING round 14, after the window above was
# committed — per the standing overflow rule they queue BEHIND the
# window (local parity covers them until then) instead of displacing a
# committed stale name. Round 14 holds new registrations to 0
# (VERDICT r13 #6), so this is empty by plan.
_NEXT_WINDOW_FIRST: list[str] = []
_STALE_QUEUE = [
    # the 8 r9-stale names spilled past the r13 cut (stalest in the
    # rotation), in their CORRECTNESS_r09 order — VERDICT r12 #1 / r13 #1
    "m04_real_bmp_roundtrip",
    "s03_ivf_topk", "s04_ivf_multiprobe", "p01_project_filter",
    "p05_derived_cast", "p09_recode", "p11_filter_isin",
    "p12_compound_predicate",
    # last attested round 10, in their CORRECTNESS_r10 order; the first
    # WINDOW − 3 − 8 = 39 fill the round-14 window (cut after
    # a19_approx_percentile_rankcheck), the remaining 11 lead the
    # committed round-15 head
    "a27_approx_top_k_mergeable", "u15_python_udtf",
    "j11_lateral_join_api", "a28_listagg_within_group",
    "sql09_sql_scripting", "sql10_pipe_syntax", "o10_token_budget_plan",
    "d21_curation_funnel", "p16_null_profile", "a01_grouped_sum",
    "a03_count_share", "a04_max_avg", "a05_group_count",
    "a08_ordered_collect", "e02_sessionize",
    "e06_view_purchase_attribution", "j06_asof_join",
    "j07_range_join_binned", "o05_stratified_sample",
    "d08_leakage_free_split", "w03_topn_per_group", "o03_topk_resort",
    "u01_union", "u03_intersect", "u04_except", "f01_string_funcs",
    "f11_date_funcs", "f12_json_extract", "t01_token_count",
    "t02_quality_score", "t03_language_id", "t04_fingerprint",
    "t05_clean_wordcount", "t07_repetition_ratio", "t08_pii_scrub",
    "t06_top_bigrams", "u08_arrow_batch_transform",
    "a20_kll_mergeable_quantiles", "a19_approx_percentile_rankcheck",
    # ---- round-15 head continues here: the 11 r10-stale names past
    # the r14 cut, then the 50 r11-attested names in their
    # CORRECTNESS_r11 order (11 + 39 = 50; the last 11 spill to
    # r16) ----
    "d14_chunk_dedup_keep_first", "a21_unpivot_melt",
    "ml03_regression_metrics", "u09_arrow_scalar_udf",
    "sql05_lateral_view_tokens", "e10_view_purchase_outer",
    "w07_time_range_frame", "f16_array_lambda", "u10_except_all",
    "u11_intersect_all", "o07_zorder_cells",
    # last attested round 11, in their CORRECTNESS_r11 order
    "o11_budgeted_mixture", "j12_runtime_filter", "sql11_sql_body_udf",
    "d22_compacted_ingest", "o12_weighted_reservoir",
    "d23_contamination_report", "j13_asof_nearest", "d24_minhash_error",
    "f21_interval_arithmetic", "o13_snapshot_time_travel",
    "g01_pagerank_fixedpoint", "t17_langid_confusion",
    "a29_weighted_quantiles", "e15_snapshot_sink_stream",
    "d25_cluster_size_audit", "ml05_calibration_bins",
    "e16_scd2_stream_enrichment", "sql12_unpivot_clause",
    "sql13_named_parameters", "j08_full_outer",
    "u12_union_schema_evolution", "a22_countmin_heavy_hitters",
    "o08_quality_weighted_sample", "ml04_kfold_assignment",
    "p17_summary_stats", "a23_corr_covar", "f17_fuzzy_recode",
    "q1_pricing_summary", "q3_shipping_priority",
    "q5_local_supplier_volume", "q6_forecast_revenue",
    "q10_returned_items", "j01_left_join", "j02_semi_join",
    "j03_anti_join", "j05_salted_join_equiv", "q4_order_priority",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "q12_priority_shipping", "q13_customer_distribution",
    "q14_promo_revenue", "q15_top_supplier", "q17_small_quantity",
    "q18_large_volume", "q19_discounted_revenue",
    "q22_global_sales_opportunity", "q16_parts_supplier_relationship",
    "q20_potential_promotion",
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
