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
# Round-13 window (VERDICT r12 Next-round #1, serving the plan
# committed in VERDICT r11 #1): the 1 query registered DURING round 12
# (never driver-attested — the standing never-attested-first
# principle) comes first; then the 7 r8-stale names spilled past the
# r12 cut; then the FIRST 42 of the 50 r9-attested names in their
# CORRECTNESS_r09 order. 1 + 7 + 42 = 50 exactly; the committed
# round-14 head is the two round-13 registrations in _NEXT_WINDOW_FIRST
# (never-attested first — the standing overflow rule), then the 8 r9
# names past the cut, then the r10-stale names in their CORRECTNESS_r10
# order (2 + 8 + 40 = 50; the last 10 r10 names spill to r15).
# `ml01_classifier_bench` (last
# attested r5) stays out of the rotation by design — it is the
# rows-only query, so a window slot buys no hash attestation. The cut
# point is COMPUTED in _ordered_names (pinned by
# tests/test_env_contract.py::test_attestation_window_arithmetic),
# never hand-counted in a comment.
_PRIORITY_FIRST = [
    # registered during round 12, never driver-attested — attestation
    # required; order as committed in VERDICT r11 #7 / r12 #1
    "o15_schema_evolution",
]

# Queries registered DURING round 13, after the window above was
# committed — per the standing overflow rule they queue BEHIND the
# window (local parity covers them until then) instead of displacing a
# committed stale name. They are never-attested, so the ROUND-14 window
# must lead with them (move them into _PRIORITY_FIRST when rotating),
# ahead of the r9/r10-stale queue below.
_NEXT_WINDOW_FIRST: list[str] = [
    # r13 registrations (verified at sf0.1 like o15 was): data skipping
    # + clustered compaction + change data feed on the MVCC table, and
    # the snapshot-table STREAMING SOURCE (e15's read-side twin)
    "o16_data_skipping",
    "e18_snapshot_stream_source",
]
_STALE_QUEUE = [
    # the 7 r8-stale names spilled past the r12 cut (stalest in the
    # rotation), exact order agreed in VERDICT r11 #1 / r12 #1
    "w05_moving_frame", "f06_posexplode_roundtrip",
    "sql01_subquery", "f13_null_handling", "o04_deterministic_sample",
    "a16_percentiles", "sql02_file_scan",
    # last attested round 9, in their CORRECTNESS_r09 order; the first
    # WINDOW − 1 − 7 = 42 fill the round-13 window (cut after
    # m03_frame_sample), the remaining 8 lead the committed round-14
    # head
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
    "ml02_confusion_matrix", "m03_frame_sample",
    # ---- round-14 head continues here (after the two never-attested
    # r13 registrations in _NEXT_WINDOW_FIRST): the 8 r9-stale names
    # past the r13 cut, then the 50 r10-attested names in their
    # CORRECTNESS_r10 order (2 + 8 + 40 = 50; the last 10 spill to
    # r15) ----
    "m04_real_bmp_roundtrip",
    "s03_ivf_topk", "s04_ivf_multiprobe", "p01_project_filter",
    "p05_derived_cast", "p09_recode", "p11_filter_isin",
    "p12_compound_predicate",
    # last attested round 10, in their CORRECTNESS_r10 order
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
    "d14_chunk_dedup_keep_first", "a21_unpivot_melt",
    "ml03_regression_metrics", "u09_arrow_scalar_udf",
    "sql05_lateral_view_tokens", "e10_view_purchase_outer",
    "w07_time_range_frame", "f16_array_lambda", "u10_except_all",
    "u11_intersect_all", "o07_zorder_cells",
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
