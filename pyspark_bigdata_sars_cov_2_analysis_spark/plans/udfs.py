"""Pandas-UDF surface plans (SURVEY.md §2.9 D6/D7), oracle-checked.

These prove the Arrow-batched Python paths compute exactly what the SQL
says — the grouped-map forecast matches SQL regr_slope/regr_intercept, the
scalar-iter "inference" matches a closed-form expression.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_bigdata_sars_cov_2_analysis_spark.plans.registry import (
    query,
    sql_round,
    table,
)
from pyspark_bigdata_sars_cov_2_analysis_spark.timeseries import (
    linear_forecast_by_group,
)
from pyspark_bigdata_sars_cov_2_analysis_spark.udf import batch_inference_udf
from pyspark_bigdata_sars_cov_2_analysis_spark.udf.pandas_udfs import (
    mlp_inference_udf,
)


@query(
    "u05_grouped_forecast",
    oracle=f"""
    WITH daily AS (
      SELECT event_type AS key,
             date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
             COUNT(*) AS y
      FROM events GROUP BY 1, 2
    ),
    fit AS (
      SELECT key, regr_slope(y, x) AS slope, regr_intercept(y, x) AS icept,
             MAX(x) AS x_max
      FROM daily GROUP BY key
    )
    SELECT key, CAST(step AS BIGINT) AS step,
           {sql_round("icept + slope * (x_max + step)", 3)} AS yhat
    FROM fit CROSS JOIN generate_series(1, 7) t(step)
    """,
)
def u05_grouped_forecast(spark, sf_dir):
    """D6/M8 — grouped-map forecasting: daily event counts per type, OLS
    line per group via applyInPandas, 7-step horizon (the reference's
    per-country Prophet shape, spark/jobs/cases_time_analysis.py:268-306)."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.col("event_type").alias("key"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("x"),
    ).agg(F.count(F.lit(1)).alias("y"))
    return linear_forecast_by_group(daily, "key", "x", "y", horizon=7)


@query(
    "u06_batch_inference",
    oracle=f"""
    SELECT vec_id,
           {sql_round('''1.0 / (1.0 + exp(-(list_aggregate(list_transform(embedding,
                 x -> CAST(x AS DOUBLE)), 'sum') / len(embedding))))''', 6)} AS score
    FROM embeddings
    """,
)
def u06_batch_inference(spark, sf_dir):
    """D7 — SCALAR_ITER batch inference with per-worker model load (the
    reference's Keras predict_batch_udf shape,
    spark/jobs/radiography_analysis.py:306-326); deterministic stand-in
    model = sigmoid(mean(embedding)) so the oracle stays SQL-expressible
    (u07 runs the real-tensor variant)."""
    e = table(spark, sf_dir, "embeddings")
    return e.select("vec_id", batch_inference_udf("embedding").alias("score"))


@query("u07_mlp_inference", oracle=None)  # rows-only: matmul isn't SQL
def u07_mlp_inference(spark, sf_dir):
    """D7/M9 — batch inference with REAL tensor compute: a deterministic
    seeded 2-layer MLP (matmul → tanh → matmul → sigmoid) applied per
    Arrow batch, weights built once per worker. The closest
    framework-free approximation of the reference's DenseNet path
    (spark/jobs/radiography_analysis.py:306-326); correctness is pinned
    by a driver-side numpy golden test instead of a DuckDB oracle
    (tests/test_io_and_ops.py::test_mlp_inference_matches_numpy)."""
    e = table(spark, sf_dir, "embeddings")
    return e.select("vec_id", mlp_inference_udf("embedding").alias("score"))
