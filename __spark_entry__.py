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
# explicit priority order instead: queries never green in any
# CORRECTNESS_r*.json first (registration order within the group), then the
# round-3 regressions whose fix needs re-attestation, then the rest.
_PRIORITY_FIRST = [
    # round-3 TIMESTAMP_NTZ regressions — re-attest the fix
    "e02_sessionize",
    "e06_view_purchase_attribution",
    # new in round 4 — never attested by construction
    "j06_asof_join",
    "j07_range_join_binned",
    "o05_stratified_sample",
    "d08_leakage_free_split",
]
_NEVER_ATTESTED = [
    "w03_topn_per_group", "o03_topk_resort", "u01_union", "u03_intersect",
    "u04_except", "f01_string_funcs", "f11_date_funcs", "f12_json_extract",
    "t01_token_count", "t02_quality_score", "t03_language_id",
    "t04_fingerprint", "t05_clean_wordcount", "t07_repetition_ratio",
    "t08_pii_scrub", "t06_top_bigrams", "q1_pricing_summary",
    "q3_shipping_priority", "q5_local_supplier_volume", "q6_forecast_revenue",
    "q10_returned_items", "j01_left_join", "j02_semi_join", "j03_anti_join",
    "j05_salted_join_equiv", "q4_order_priority",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "q12_priority_shipping", "q13_customer_distribution", "q14_promo_revenue",
    "q15_top_supplier", "q17_small_quantity", "q18_large_volume",
    "q19_discounted_revenue", "q22_global_sales_opportunity",
    "q16_parts_supplier_relationship", "q20_potential_promotion",
    "q21_waiting_supplier", "q11_important_stock", "q2_min_cost_supplier",
    "u05_grouped_forecast", "u06_batch_inference",
    # deliberately last (the head exceeds the checker's 50-query window by
    # two): u07 is rows-only (weakest check) and j04 is the equivalence
    # twin of already-attested w01 — least is lost if these wait a round
    "u07_mlp_inference", "j04_latest_via_join_equiv",
]


def _ordered_names() -> list[str]:
    head = [n for n in _PRIORITY_FIRST + _NEVER_ATTESTED if n in plans.QUERIES]
    seen = set(head)
    return head + [n for n in plans.QUERIES if n not in seen]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: plans.QUERIES[n] for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {n: plans.ORACLES[n] for n in _ordered_names() if n in plans.ORACLES}
