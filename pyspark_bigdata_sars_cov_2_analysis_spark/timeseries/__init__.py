from pyspark_bigdata_sars_cov_2_analysis_spark.timeseries.forecast import (
    linear_forecast_by_group,
)

__all__ = ["linear_forecast_by_group"]
