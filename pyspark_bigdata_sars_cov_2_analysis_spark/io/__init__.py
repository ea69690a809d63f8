from pyspark_bigdata_sars_cov_2_analysis_spark.io.readers import (
    load_tables,
    read_csv,
    read_json,
    read_parquet,
)
from pyspark_bigdata_sars_cov_2_analysis_spark.io.writers import (
    write_json_single_file,
    write_parquet,
)

__all__ = [
    "load_tables",
    "read_csv",
    "read_json",
    "read_parquet",
    "write_json_single_file",
    "write_parquet",
]
