"""Query plans: named, oracle-checked query definitions.

Each query is registered with :mod:`registry` and becomes an entry in the
driver contract (``__spark_entry__.queries()`` / ``oracle_sql()``). Import
every plan module here so registration runs on package import.
"""

from pyspark_bigdata_sars_cov_2_analysis_spark.plans import (  # noqa: F401
    events,
    extended,
    llmdata,
    ml,
    relational,
    text,
    tpch,
    tpch_ext,
    udfs,
)
from pyspark_bigdata_sars_cov_2_analysis_spark.plans.registry import (
    ORACLES,
    QUERIES,
    query,
)

__all__ = ["ORACLES", "QUERIES", "query"]
