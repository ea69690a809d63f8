"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}. Each query timing includes full
execution to a count/collect — not just plan construction.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark_bigdata_sars_cov_2_analysis_spark import plans, start_session  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "w01_latest_per_group",
    "e01_tumbling_window",
    "e02_sessionize",
    "d02_minhash_lsh",
    "s01_cosine_topk",
    "t03_language_id",
    "u05_grouped_forecast",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = start_session("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers + Python UDF workers once so timings
    # measure the queries, not process startup
    plans.QUERIES["q6_forecast_revenue"](spark, sf_dir).collect()
    spark.range(2).toPandas()
    spark.range(2).groupBy("id").applyInPandas(
        lambda pdf: pdf, schema="id long"
    ).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = plans.QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        assert n >= 0

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
