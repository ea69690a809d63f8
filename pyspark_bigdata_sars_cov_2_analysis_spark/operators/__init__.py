from pyspark_bigdata_sars_cov_2_analysis_spark.operators import (
    aggregates,
    joins,
    relational,
    setops,
    sorts,
    windows,
)

__all__ = ["aggregates", "joins", "relational", "setops", "sorts", "windows"]
