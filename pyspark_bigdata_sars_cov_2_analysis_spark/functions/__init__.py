from pyspark_bigdata_sars_cov_2_analysis_spark.functions import recode, text

__all__ = ["recode", "text"]
