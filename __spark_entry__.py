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
# Round-8 window (VERDICT r7 Next-round #1 — consolidation): the 31
# queries added late in round 7 that have NEVER appeared in a driver
# window come first (local parity green since r7, but the driver has
# never hashed them), then the stalest round-5 names in their existing
# queue order. 31 + 19 = 50 exactly; the remaining 27 round-5 names are
# the committed round-9 head (VERDICT r7 #5) and stay in _STALE_QUEUE
# order after the cut. The cut point is COMPUTED in _ordered_names
# (pinned by tests/test_env_contract.py::test_attestation_window_arithmetic),
# never hand-counted in a comment.
_PRIORITY_FIRST = [
    # never driver-attested (added after the r7 window filled), in their
    # r7 registration order — attestation required
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
    "j10_range_lookup_broadcast",
]
_STALE_QUEUE = [
    # last attested round 5 (stalest anywhere), same relative order as the
    # round-7 queue; the first WINDOW − len(_PRIORITY_FIRST) = 19 fill the
    # round-8 window, the remaining 27 are the committed round-9 head
    "e01_tumbling_window", "e03_dedup_latest_state", "e04_sliding_window",
    "e05_user_totals", "e07_segment_window", "e08_gapfill_daily",
    "a10_rollup", "a11_cube", "a12_grouping_sets", "a13_pivot",
    "a14_count_distinct", "w04_lag_lead_rank", "w05_moving_frame",
    "f06_posexplode_roundtrip", "sql01_subquery", "f13_null_handling",
    "o04_deterministic_sample", "a16_percentiles", "sql02_file_scan",
    # ---- round-9 head starts here (27 names, 3-rounds-stale when r8
    # lands — accepted in VERDICT r7 #1; drain them first next round) ----
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
