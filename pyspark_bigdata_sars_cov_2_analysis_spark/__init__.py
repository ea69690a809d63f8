"""PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference ETL application
(``dusandjovanovic/pyspark-bigdata-sars-cov-2-analysis``), plus the
LLM-data-pipeline operators (dedup, similarity search, multimodal columns,
text analysis) that a 100 TB training-data pipeline needs.

Design stance (see SURVEY.md §7):
- DataFrame/SQL only; Catalyst + AQE do the physical planning.
- Explicit schemas, Arrow enabled, broadcast hints on dimension joins.
- Python UDFs only where built-ins genuinely can't express the semantics,
  and then always Arrow-batched (pandas UDF / applyInPandas / mapInPandas).
"""

from pyspark_bigdata_sars_cov_2_analysis_spark.session import start_session

__all__ = ["start_session"]
__version__ = "0.1.0"
