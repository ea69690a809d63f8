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
# Round-5 window: CORRECTNESS_r04 was 50/50 green, so the r4 head moves to
# the back and the head becomes the 14 never-attested queries (10 with
# DuckDB oracles, 4 rows-only by design: a15/a17 sketches, ml01/ml02
# training bands), then the 3 queries last attested in round 1, then the
# first 33 of the round-3-attested group in registration order.
_PRIORITY_FIRST = [
    # new in round 5 — never attested by construction
    "d09_decontaminate", "d10_dedup_keep_best", "t12_quality_gate",
    "d11_incremental_dedup",
    # never attested in any earlier round's window — front-load all 14
    "t09_tfidf_top_terms", "t10_sequence_packing", "t11_chunk_text",
    "e07_segment_window", "e08_gapfill_daily", "f14_variant_json",
    "a18_theta_sketch_setops", "m05_audio_frame_energy",
    "j04_latest_via_join_equiv", "u07_mlp_inference",
    "a15_approx_count_distinct", "a17_hll_mergeable_sketch",
    "ml01_classifier_bench", "ml02_confusion_matrix",
    # last attested round 1
    "a09_distinct", "w01_latest_per_group", "w02_running_sum",
]
_STALE_R3 = [
    # last attested round 3; first 33 in registration order fill the window
    "e01_tumbling_window", "e03_dedup_latest_state", "e04_sliding_window",
    "e05_user_totals", "a10_rollup", "a11_cube", "a12_grouping_sets",
    "a13_pivot", "a14_count_distinct", "w04_lag_lead_rank",
    "w05_moving_frame", "f06_posexplode_roundtrip", "sql01_subquery",
    "f13_null_handling", "o04_deterministic_sample", "a16_percentiles",
    "sql02_file_scan", "w06_distribution_ranks", "d01_exact_dedup",
    "d02_minhash_lsh", "d07_dup_clusters", "d03_ngram_jaccard",
    "d04_simhash", "d06_simhash_neardup", "s01_cosine_topk",
    "s02_bucketed_topk", "d05_embedding_neardup", "m01_binary_stats",
    "m02_image_decode_stats", "m03_frame_sample", "m04_real_bmp_roundtrip",
    "s03_ivf_topk", "s04_ivf_multiprobe",
    # remaining r3 group (outside the 50-window this round; next in line)
    "p01_project_filter", "p05_derived_cast", "p09_recode",
    "p11_filter_isin", "p12_compound_predicate", "p16_null_profile",
    "a01_grouped_sum", "a03_count_share", "a04_max_avg", "a05_group_count",
    "a08_ordered_collect",
]


def _ordered_names() -> list[str]:
    head = [n for n in _PRIORITY_FIRST + _STALE_R3 if n in plans.QUERIES]
    seen = set(head)
    return head + [n for n in plans.QUERIES if n not in seen]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: plans.QUERIES[n] for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {n: plans.ORACLES[n] for n in _ordered_names() if n in plans.ORACLES}
