"""cases_time pipeline — engine recomposition of
``/root/reference/spark/jobs/cases_time_analysis.py``.

Same named outputs and generated-column contracts (``sum(confirmed)``,
``maxDate``, ``mortalityRate`` … per SURVEY.md §1.4); differences by design:
- one cached prep root feeds all outputs (the reference re-executed the
  shared plan per sink, §3.1 step 5);
- date stays an ISO string for contract parity (string order == date order
  for ISO), with a ``to_date`` helper for the typed path;
- forecasting is the engine's grouped-map OLS fitter (the reference used
  Prophet — same applyInPandas execution shape, §3.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_bigdata_sars_cov_2_analysis_spark.functions.compat import pround
from pyspark_bigdata_sars_cov_2_analysis_spark.io.readers import read_csv
from pyspark_bigdata_sars_cov_2_analysis_spark.operators.sorts import top_k_resorted
from pyspark_bigdata_sars_cov_2_analysis_spark.operators.windows import (
    latest_per_group,
)
from pyspark_bigdata_sars_cov_2_analysis_spark.timeseries import (
    linear_forecast_by_group,
)

EUROPE = [
    "Serbia", "Croatia", "Slovenia", "Montenegro", "Italy", "Norway",
    "Austria", "France", "Germany", "Spain",
]

RAW_RENAMES = {
    "ObservationDate": "date",
    "Province/State": "state",
    "Country/Region": "country",
    "Last Update": "last_updated",
    "Confirmed": "confirmed",
    "Deaths": "deaths",
    "Recovered": "recovered",
}


def extract(spark: SparkSession, path: str) -> DataFrame:
    """S1 — header CSV, all-string like the reference (…:86-89)."""
    return read_csv(spark, path, header=True)


def prepare(df: DataFrame) -> DataFrame:
    """rename → fillna('') → country normalize → casts → derive active
    (ref …:92-119). Cached: every output below reuses this root."""
    out = df.withColumnsRenamed(RAW_RENAMES)
    out = out.na.fill("", subset=["state"])
    out = out.withColumn(
        "country", F.regexp_replace("country", "Mainland China", "China")
    )
    for c in ("confirmed", "deaths", "recovered"):
        out = out.withColumn(c, F.col(c).cast("int"))
    out = out.withColumn(
        "active", F.col("confirmed") - F.col("deaths") - F.col("recovered")
    )
    return out.cache()


def confirmed_cases_and_deaths_globally(df: DataFrame) -> DataFrame:
    """groupBy(date).sum(confirmed, deaths) → orderBy(date); output columns
    ``date, sum(confirmed), sum(deaths)`` exactly (ref …:122-125)."""
    return (
        df.groupBy("date")
        .agg(
            F.sum("confirmed").alias("sum(confirmed)"),
            F.sum("deaths").alias("sum(deaths)"),
        )
        .orderBy("date")
    )


def latest_snapshot_by_country(df: DataFrame) -> DataFrame:
    """window max(date) per country + equality filter, then 4-measure sum
    (ref …:157-163, the maxDate idiom W1)."""
    latest = latest_per_group(df.drop("state"), ["country"], "date")
    return latest.groupBy("country").agg(
        F.sum("confirmed").alias("sum(confirmed)"),
        F.sum("deaths").alias("sum(deaths)"),
        F.sum("recovered").alias("sum(recovered)"),
        F.sum("active").alias("sum(active)"),
    )


def most_affected_countries(df: DataFrame, k: int = 10) -> DataFrame:
    """top-k mortality rate, re-sorted ascending for display (ref …:177-189):
    ``mortalityRate = round(deaths/confirmed*100, 2)``."""
    snap = latest_snapshot_by_country(df)
    rated = snap.withColumn(
        "mortalityRate",
        pround(F.col("sum(deaths)") / F.col("sum(confirmed)") * 100.0, 2),
    )
    return top_k_resorted(
        rated,
        k,
        [F.desc("mortalityRate"), F.asc("country")],
        [F.asc("mortalityRate"), F.asc("country")],
    )


def europe_confirmed_cases(df: DataFrame) -> DataFrame:
    """membership filter + per-date rollup over Europe (ref …:164-171)."""
    return (
        df.where(F.col("country").isin(EUROPE))
        .groupBy("date")
        .agg(F.sum("confirmed").alias("sum(confirmed)"))
        .orderBy("date")
    )


def forecast_per_country(
    df: DataFrame, countries: list[str], horizon: int = 90
) -> DataFrame:
    """(ds, y, country) contract + grouped-map fit per country
    (ref …:259-306, D6/M8). 90-day horizon like the reference."""
    daily = (
        df.where(F.col("country").isin(countries))
        .groupBy("country", "date")
        .agg(F.sum("confirmed").alias("y"))
        .select(
            "country",
            F.datediff(F.to_date("date"), F.lit("2020-01-01")).alias("x"),
            "y",
        )
    )
    return linear_forecast_by_group(daily, "country", "x", "y", horizon=horizon)
