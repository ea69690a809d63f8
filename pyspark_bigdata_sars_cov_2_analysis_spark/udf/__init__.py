from pyspark_bigdata_sars_cov_2_analysis_spark.udf.pandas_udfs import (
    batch_inference_udf,
    image_batch_inference_udf,
)

__all__ = ["batch_inference_udf", "image_batch_inference_udf"]
