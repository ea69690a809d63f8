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
# Round-12 window (VERDICT r11 Next-round #1, serving the plan
# committed in VERDICT r10 #1): the 2 queries registered DURING round
# 11 (never driver-attested — the standing never-attested-first
# principle) come first; then the 5 r7-stale names spilled past the
# r11 cut; then the FIRST 43 of the 50 r8-attested names in their
# CORRECTNESS_r08 order. 2 + 5 + 43 = 50 exactly; the 7 r8 names past
# the cut lead the committed round-13 head, followed by the r9-stale
# names in their CORRECTNESS_r09 order (43 of 50 fit the r13 window;
# the last 7 spill to r14). `ml01_classifier_bench` (last attested r5)
# stays out of the rotation by design — it is the rows-only query, so
# a window slot buys no hash attestation. The cut point is COMPUTED in
# _ordered_names (pinned by
# tests/test_env_contract.py::test_attestation_window_arithmetic),
# never hand-counted in a comment.
_PRIORITY_FIRST = [
    # registered during round 11, never driver-attested — attestation
    # required; order as committed in VERDICT r11 #1
    "o14_snapshot_lifecycle",
    "e17_statestore_keys",
]

# Queries registered DURING round 12, after the window above was
# committed — per the standing overflow rule they queue BEHIND the
# window (local parity covers them until then) instead of displacing a
# committed stale name. They are never-attested, so the ROUND-13 window
# must lead with them (move them into _PRIORITY_FIRST when rotating),
# ahead of the r8/r9-stale queue below.
_NEXT_WINDOW_FIRST: list[str] = [
    "o15_schema_evolution",
]
_STALE_QUEUE = [
    # the 5 r7-stale names spilled past the r11 cut (stalest in the
    # rotation), exact order agreed in VERDICT r9 #1 / r10 #1 / r11 #1
    "q21_waiting_supplier",
    "q11_important_stock", "q2_min_cost_supplier", "u05_grouped_forecast",
    "u06_batch_inference",
    # last attested round 8, in their CORRECTNESS_r08 order; the first
    # WINDOW − 2 − 5 = 43 fill the round-12 window (cut after
    # w04_lag_lead_rank), the remaining 7 lead the committed round-13
    # head
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
    "w04_lag_lead_rank",
    # ---- round-13 head starts here: the 7 r8-stale names past the
    # r12 cut, then the 50 r9-attested names in their CORRECTNESS_r09
    # order (43 fit the r13 window; the last 7 spill to r14) ----
    "w05_moving_frame", "f06_posexplode_roundtrip",
    "sql01_subquery", "f13_null_handling", "o04_deterministic_sample",
    "a16_percentiles", "sql02_file_scan",
    # last attested round 9, in their CORRECTNESS_r09 order
    "t16_quality_audit_frame", "d19_chunk_ingest_incremental",
    "d20_band_ingest_incremental", "w06_distribution_ranks",
    "a18_theta_sketch_setops", "t09_tfidf_top_terms", "t11_chunk_text",
    "t12_quality_gate", "d01_exact_dedup", "d02_minhash_lsh",
    "d07_dup_clusters", "d11_incremental_dedup", "d09_decontaminate",
    "d10_dedup_keep_best", "d03_ngram_jaccard", "d04_simhash",
    "d06_simhash_neardup", "s01_cosine_topk", "s02_bucketed_topk",
    "d05_embedding_neardup", "m01_binary_stats", "m02_image_decode_stats",
    "t10_sequence_packing", "m05_audio_frame_energy", "a09_distinct",
    "w01_latest_per_group", "w02_running_sum", "f14_variant_json",
    "j04_latest_via_join_equiv", "u07_mlp_inference",
    "d12_decontaminated_split", "d13_fuzzy_dedup_resolve",
    "o06_temperature_mixture", "t13_token_surprisal",
    "sql03_recursive_calendar", "sql04_lateral_topn",
    "e09_session_window_native", "f15_map_functions",
    "a15_approx_count_distinct", "a17_hll_mergeable_sketch",
    "ml02_confusion_matrix", "m03_frame_sample", "m04_real_bmp_roundtrip",
    "s03_ivf_topk", "s04_ivf_multiprobe", "p01_project_filter",
    "p05_derived_cast", "p09_recode", "p11_filter_isin",
    "p12_compound_predicate",
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
