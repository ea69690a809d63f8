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
# Round-6 window (head = exactly 13 + 15 + 22 = 50; the round-5 head
# miscounted by omitting its own 4 new queries — ADVICE r5): first the
# 13 queries that are new or semantically changed this round (d12/d13/
# o06/t13/sql03/sql04/a19/e09/u08/f15 are new; a15/a17/ml02 gained
# oracles and new output schemas, so their prior attestations no longer
# apply), then the 15 queries whose last green was round 3 (the stalest
# anywhere; m03/m04/s03/s04 were queued for round 5 but fell off the
# end of the miscounted window), then 22 of the 50 round-4-attested
# queries in CORRECTNESS_r04 order. The 28 remaining round-4 names are
# next in line for round 7; the round-5/6-attested group follows via
# the registration-order tail.
_PRIORITY_FIRST = [
    # new or changed in round 6 — (re-)attestation required
    "d12_decontaminated_split", "d13_fuzzy_dedup_resolve",
    "o06_temperature_mixture", "t13_token_surprisal",
    "sql03_recursive_calendar", "sql04_lateral_topn",
    "a19_approx_percentile_rankcheck", "e09_session_window_native",
    "u08_arrow_batch_transform", "f15_map_functions",
    "a15_approx_count_distinct",
    "a17_hll_mergeable_sketch", "ml02_confusion_matrix",
    # last attested round 3 — stalest group
    "m03_frame_sample", "m04_real_bmp_roundtrip", "s03_ivf_topk",
    "s04_ivf_multiprobe", "p01_project_filter", "p05_derived_cast",
    "p09_recode", "p11_filter_isin", "p12_compound_predicate",
    "p16_null_profile", "a01_grouped_sum", "a03_count_share",
    "a04_max_avg", "a05_group_count", "a08_ordered_collect",
]
_STALE_R4 = [
    # last attested round 4, in CORRECTNESS_r04 order. The first
    # WINDOW − len(_PRIORITY_FIRST) of these fill the window; the cut
    # point is COMPUTED in _ordered_names (and pinned by
    # tests/test_env_contract.py::test_attestation_window_arithmetic),
    # never hand-counted in a comment — the round-5 head rotted exactly
    # because a comment hard-coded the arithmetic. Names past the cut
    # are next in line for round 7.
    "e02_sessionize", "e06_view_purchase_attribution", "j06_asof_join",
    "j07_range_join_binned", "o05_stratified_sample",
    "d08_leakage_free_split", "w03_topn_per_group", "o03_topk_resort",
    "u01_union", "u03_intersect", "u04_except", "f01_string_funcs",
    "f11_date_funcs", "f12_json_extract", "t01_token_count",
    "t02_quality_score", "t03_language_id", "t04_fingerprint",
    "t05_clean_wordcount", "t07_repetition_ratio", "t08_pii_scrub",
    "t06_top_bigrams", "q1_pricing_summary", "q3_shipping_priority",
    "q5_local_supplier_volume", "q6_forecast_revenue", "q10_returned_items",
    "j01_left_join", "j02_semi_join", "j03_anti_join",
    "j05_salted_join_equiv",
    "q4_order_priority", "q7_volume_shipping", "q8_market_share",
    "q9_product_profit", "q12_priority_shipping",
    "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q17_small_quantity", "q18_large_volume", "q19_discounted_revenue",
    "q22_global_sales_opportunity", "q16_parts_supplier_relationship",
    "q20_potential_promotion", "q21_waiting_supplier",
    "q11_important_stock", "q2_min_cost_supplier", "u05_grouped_forecast",
    "u06_batch_inference",
]

# the driver's attestation window
WINDOW = 50


def _ordered_names() -> list[str]:
    head = [n for n in _PRIORITY_FIRST + _STALE_R4 if n in plans.QUERIES]
    seen = set(head)
    return head + [n for n in plans.QUERIES if n not in seen]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: plans.QUERIES[n] for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {n: plans.ORACLES[n] for n in _ordered_names() if n in plans.ORACLES}
