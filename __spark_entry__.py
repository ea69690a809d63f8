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
# Round-9 window (VERDICT r8 Next-round #1): the 3 queries registered
# THIS round (never driver-attested — the standing never-attested-first
# principle, which is why the head is 3 rather than VERDICT r8's
# pre-registration arithmetic of 27+23) come first, then the committed
# 27-name r5-stale head in its agreed order, then the stalest r6 names
# in their CORRECTNESS_r06 order. 3 + 27 + 20 = 50 exactly; the
# remaining 28 r6 names past the cut are the committed round-10 head.
# The cut point is COMPUTED in _ordered_names (pinned by
# tests/test_env_contract.py::test_attestation_window_arithmetic),
# never hand-counted in a comment.
_PRIORITY_FIRST = [
    # registered in round 9, never driver-attested — attestation required
    "t16_quality_audit_frame", "d19_chunk_ingest_incremental",
    "d20_band_ingest_incremental",
]

# Registered LATE in round 9, after the r9 window above was committed —
# per the standing overflow rule they queue BEHIND the window (local
# parity covers them until then) instead of displacing a committed stale
# name. They are never-attested, so the ROUND-10 window must lead with
# them (move them into _PRIORITY_FIRST when rotating), then the 28-name
# r10 head marked in _STALE_QUEUE below.
_NEXT_WINDOW_FIRST = [
    "a27_approx_top_k_mergeable", "u15_python_udtf",
    "j11_lateral_join_api", "a28_listagg_within_group",
    "sql09_sql_scripting", "sql10_pipe_syntax", "o10_token_budget_plan",
    "d21_curation_funnel",
]
_STALE_QUEUE = [
    # the committed r9 head: last attested round 5 (stalest anywhere),
    # exact order agreed in VERDICT r7 #5 / r8 #1
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
    # last attested round 6, in their CORRECTNESS_r06 order; the first
    # WINDOW − 3 − 27 = 20 fill the round-9 window, the remaining 28
    # past the cut are the committed round-10 head
    "d12_decontaminated_split", "d13_fuzzy_dedup_resolve",
    "o06_temperature_mixture", "t13_token_surprisal",
    "sql03_recursive_calendar", "sql04_lateral_topn",
    "e09_session_window_native", "f15_map_functions",
    "a15_approx_count_distinct", "a17_hll_mergeable_sketch",
    "ml02_confusion_matrix", "m03_frame_sample", "m04_real_bmp_roundtrip",
    "s03_ivf_topk", "s04_ivf_multiprobe", "p01_project_filter",
    "p05_derived_cast", "p09_recode", "p11_filter_isin",
    "p12_compound_predicate",
    # ---- round-10 head starts here (28 names) ----
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
