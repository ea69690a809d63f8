"""Reference-equivalent ETL pipelines (SURVEY.md §7.2 step 9).

Each module recomposes one of the reference's four jobs from the engine's
operator library, preserving the *output contracts* (named results and
generated column names like ``sum(confirmed)`` that the reference's
visualizers depend on — SURVEY.md §1.4) while fixing the anti-patterns
(string dates, row UDF recodes, parquet round-trip barriers, uncached
fan-out roots).
"""

from pyspark_bigdata_sars_cov_2_analysis_spark.pipelines import (
    cases_time,
    clinical,
    radiography,
    research,
)

__all__ = ["cases_time", "clinical", "radiography", "research"]
