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
# Round-7 window (VERDICT r6 #3): first the queries that are new or
# changed this round (u08's oracle gained the HUGEINT→BIGINT cast after
# its r6 hash-fail; a20 is new; a19's rank check was rewritten to the
# interval form per ADVICE r6, so its r6 attestation no longer applies),
# then the 28 queries whose last green is round 4 — the TPC-H block plus
# j01-j03/j05/u05/u06, exactly the `_STALE_R4` tail past the r6 cut —
# then the stalest round-5 names in their CORRECTNESS_r05 order. The
# cut point is COMPUTED in _ordered_names (pinned by
# tests/test_env_contract.py::test_attestation_window_arithmetic),
# never hand-counted in a comment.
_PRIORITY_FIRST = [
    # new or changed in round 7 — (re-)attestation required
    "u08_arrow_batch_transform",
    "a20_kll_mergeable_quantiles",
    "a19_approx_percentile_rankcheck",
    "d14_chunk_dedup_keep_first",
    "a21_unpivot_melt",
    "ml03_regression_metrics",
    "u09_arrow_scalar_udf",
    "sql05_lateral_view_tokens",
    "e10_view_purchase_outer",
    "w07_time_range_frame",
    "f16_array_lambda",
    "u10_except_all",
    "u11_intersect_all",
    "o07_zorder_cells",
    "j08_full_outer",
    "u12_union_schema_evolution",
    "a22_countmin_heavy_hitters",
    "o08_quality_weighted_sample",
    "ml04_kfold_assignment",
    "p17_summary_stats",
    "a23_corr_covar",
    "f17_fuzzy_recode",
]
_STALE_QUEUE = [
    # last attested round 4 (stalest anywhere), in CORRECTNESS_r04 order
    "q1_pricing_summary", "q3_shipping_priority",
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
    # new late in round 7 AFTER the window filled (head 22 + the 28
    # round-4-stale names = exactly 50): attested locally this round
    # (tests/test_oracle_parity.py), first in the driver window next round
    "u13_grouped_arrow", "a24_zscore_anomaly", "e11_funnel_conversion",
    "e12_retention_cohorts", "p18_skew_profile", "o09_cluster_balanced_sample",
    "w08_scd2_intervals", "s05_ann_recall", "sql06_relational_division", "u14_pandas_udaf", "m06_resize_nn", "t14_langid_margin", "d16_containment_neardup", "m07_audio_decimate", "sql07_pivot_clause", "p19_snapshot_drift",
    "w09_running_distinct_users", "e13_session_conversion",
    "j09_temporal_scd2_join", "p20_join_cardinality_preflight", "sql08_registered_udf",
    "e14_view_purchase_full_outer", "a25_transpose", "f18_ansi_safe_functions", "f19_collated_grouping", "w10_forward_fill", "a26_deterministic_mode", "f20_parse_url", "t15_sentence_stats", "d18_curation_pipeline", "j10_range_lookup_broadcast",
    # last attested round 5, in CORRECTNESS_r05 order; the first
    # WINDOW − 3 − 28 of these fill the window, the rest are next in
    # line for round 8
    "e01_tumbling_window", "e03_dedup_latest_state", "e04_sliding_window",
    "e05_user_totals", "e07_segment_window", "e08_gapfill_daily",
    "a10_rollup", "a11_cube", "a12_grouping_sets", "a13_pivot",
    "a14_count_distinct", "w04_lag_lead_rank", "w05_moving_frame",
    "f06_posexplode_roundtrip", "sql01_subquery", "f13_null_handling",
    "o04_deterministic_sample", "a16_percentiles", "sql02_file_scan",
    "w06_distribution_ranks", "a18_theta_sketch_setops",
    "t09_tfidf_top_terms", "t11_chunk_text", "t12_quality_gate",
    "d01_exact_dedup", "d02_minhash_lsh", "d07_dup_clusters",
    "d11_incremental_dedup", "d09_decontaminate", "d10_dedup_keep_best",
    "d03_ngram_jaccard", "d04_simhash", "d06_simhash_neardup",
    "s01_cosine_topk", "s02_bucketed_topk", "d05_embedding_neardup",
    "m01_binary_stats", "m02_image_decode_stats", "t10_sequence_packing",
    "m05_audio_frame_energy", "a09_distinct", "w01_latest_per_group",
    "w02_running_sum", "f14_variant_json", "j04_latest_via_join_equiv",
    "u07_mlp_inference",
]

# the driver's attestation window
WINDOW = 50


def _ordered_names() -> list[str]:
    head = [n for n in _PRIORITY_FIRST + _STALE_QUEUE if n in plans.QUERIES]
    seen = set(head)
    return head + [n for n in plans.QUERIES if n not in seen]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: plans.QUERIES[n] for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {n: plans.ORACLES[n] for n in _ordered_names() if n in plans.ORACLES}
