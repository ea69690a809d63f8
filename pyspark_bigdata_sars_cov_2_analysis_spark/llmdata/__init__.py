from pyspark_bigdata_sars_cov_2_analysis_spark.llmdata import (
    dedup,
    multimodal,
    similarity,
)

__all__ = ["dedup", "multimodal", "similarity"]
