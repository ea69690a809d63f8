"""Capture .explain("formatted") output for named registry queries.

Usage: python tools/capture_plans.py <suffix> [name ...]
Writes plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<suffix>.txt (default round
r16) for each query (default names: the bench HEADLINE list + the
expensive extras shelf). The driver cannot run Spark, so these committed
files are the auditable record of plan-shape claims in the round's
OPTIMIZATION log.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark_bigdata_sars_cov_2_analysis_spark import plans, start_session  # noqa: E402

DEFAULT_NAMES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q9_product_profit",
    "q10_returned_items",
    "q18_large_volume",
    "q21_waiting_supplier",
    "w01_latest_per_group",
    "e01_tumbling_window",
    "e02_sessionize",
    "j06_asof_join",
    "j07_range_join_binned",
    "d02_minhash_lsh",
    "d09_decontaminate",
    "d12_decontaminated_split",
    "d14_chunk_dedup_keep_first",
    "d16_containment_neardup",
    "o06_temperature_mixture",
    "t13_token_surprisal",
    "s01_cosine_topk",
    "t03_language_id",
    "u05_grouped_forecast",
    "t09_tfidf_top_terms",
    "t10_sequence_packing",
    "e08_gapfill_daily",
    "d18_curation_pipeline",
    "d03_ngram_jaccard",
    "d06_simhash_neardup",
    "t06_top_bigrams",
    "t16_quality_audit_frame",
    "t17_langid_confusion",
    "s03_ivf_topk",
    "s04_ivf_multiprobe",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT_NAMES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r16"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = start_session("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = plans.QUERIES[name]
        try:
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            txt = f"EXPLAIN FAILED: {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path}", file=sys.stderr)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
