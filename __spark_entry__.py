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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(plans.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(plans.ORACLES)
