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

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_bigdata_sars_cov_2_analysis_spark.functions.compat import (
    pround,
    pyround,
)
from pyspark_bigdata_sars_cov_2_analysis_spark.functions.recode import rate_percent
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


def _rate_ranking(df: DataFrame, num: str, rate_name: str, k: int) -> DataFrame:
    snap = latest_snapshot_by_country(df)
    rated = snap.withColumn(
        rate_name,
        rate_percent(F.col(num), F.col("sum(confirmed)")),
    )
    return top_k_resorted(
        rated,
        k,
        [F.desc(rate_name), F.asc("country")],
        [F.asc(rate_name), F.asc("country")],
    )


def most_affected_countries(df: DataFrame, k: int = 10) -> DataFrame:
    """top-k mortality rate, re-sorted ascending for display (ref …:177-189):
    ``mortalityRate = round(deaths/confirmed*100, 2)``."""
    return _rate_ranking(df, "sum(deaths)", "mortalityRate", k)


def best_recovery_countries(df: DataFrame, k: int = 10) -> DataFrame:
    """top-k recovery rate twin (ref …:194-207):
    ``recoveryRate = round(recovered/confirmed*100, 2)``."""
    return _rate_ranking(df, "sum(recovered)", "recoveryRate", k)


def time_series(df: DataFrame) -> DataFrame:
    """(ds, y) contract: per-date confirmed rollup renamed (ref …:212-217)."""
    return (
        df.groupBy("date")
        .agg(F.sum("confirmed").alias("y"))
        .orderBy("date")
        .withColumnRenamed("date", "ds")
    )


def time_series_by_countries(df: DataFrame) -> DataFrame:
    """(date, confirmed, country) distinct, date-ordered (ref …:220-226)."""
    return (
        df.where(F.col("country").isin(["Serbia", "Croatia", "Slovenia", "Montenegro"]))
        .select("date", "confirmed", "country")
        .dropDuplicates()
        .orderBy("date")
    )


def time_series_test_data(df: DataFrame, seed: int = 2020) -> DataFrame:
    """The held-out 20% of the (ds, y) series. The reference used an
    UNSEEDED numpy mask (…:228-236 — non-reproducible, SURVEY.md §7.3);
    the engine pins a seeded randomSplit."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.operators.sorts import seeded_split

    _, test = seeded_split(time_series(df), [0.8, 0.2], seed=seed)
    return test


def future_predictions(df: DataFrame, seed: int = 2020, fitter=None) -> DataFrame:
    """Driver-side global-series fit predicting the held-out dates with
    ``(ds, yhat, yhat_lower, yhat_upper)`` — the reference's Prophet
    driver path (…:239-256, §3.3) behind the same contract. ``fitter`` is
    the pluggable seam (``timeseries.forecast.Fitter``): default OLS +
    ±2·residual-σ band (deterministic, oracle-checked); pass
    ``forecast.prophet_fitter()`` where the library exists.

    The ``toPandas`` here is deliberate and BOUNDED: its input is the
    per-date aggregate (one row per day), mirroring the reference's
    driver-side fit — never point it at an unaggregated frame."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.operators.sorts import seeded_split
    from pyspark_bigdata_sars_cov_2_analysis_spark.timeseries.forecast import (
        ols_fitter,
    )

    fitter = fitter or ols_fitter
    ts = time_series(df)
    train, test = seeded_split(ts, [0.8, 0.2], seed=seed)
    tp = train.select(
        F.datediff(F.to_date("ds"), F.lit("2020-01-01")).alias("x"),
        F.col("y").cast("double"),
    ).toPandas()
    predict = fitter(tp["x"].astype("float64"), tp["y"])
    xp = test.select(
        "ds", F.datediff(F.to_date("ds"), F.lit("2020-01-01")).alias("x")
    ).toPandas()
    pred_train = predict(tp["x"].astype("float64"))
    # degenerate fit — empty or zero-variance train split — forecasts
    # all-NULL (review r9): ols_fitter's SQL-twin NULL contract
    # propagates here too; the old arithmetic raised on float(None)
    if len(tp) == 0 or pd.isna(pred_train).all():
        yh = lo = up = [None] * len(xp)
    else:
        resid = tp["y"] - pred_train
        band = 2.0 * float((resid * resid).mean() ** 0.5)
        yhat = predict(xp["x"].astype("float64"))
        yh = [pyround(float(v), 3) for v in yhat]
        lo = [pyround(float(v) - band, 3) for v in yhat]
        up = [pyround(float(v) + band, 3) for v in yhat]
    spark = df.sparkSession
    out = spark.createDataFrame(
        pd.DataFrame(
            {
                "ds": xp["ds"],
                "yhat": yh,
                "yhat_lower": lo,
                "yhat_upper": up,
            }
        ),
        "ds string, yhat double, yhat_lower double, yhat_upper double",
    )
    return out


def confirmed_cases_for_country(df: DataFrame, country: str) -> DataFrame:
    """Per-country daily rollup: filter → groupBy(date).sum(confirmed) →
    orderBy(date); column ``sum(confirmed)`` (ref …:128-154, the
    serbia/norway/italy/china quadruplet is this one transform
    parameterized)."""
    return (
        df.where(F.col("country") == country)
        .groupBy("date")
        .agg(F.sum("confirmed").alias("sum(confirmed)"))
        .orderBy("date")
    )


def europe_confirmed_cases(df: DataFrame) -> DataFrame:
    """Latest snapshot per country → sum(confirmed) → Europe members →
    ordered desc (ref …:156-168 — NOT a per-date series; the window-max
    idiom feeds a country ranking)."""
    latest = latest_per_group(df.drop("state"), ["country"], "date")
    grouped = latest.groupBy("country").agg(
        F.sum("confirmed").alias("sum(confirmed)")
    )
    return grouped.where(F.col("country").isin(EUROPE)).orderBy(
        F.desc("sum(confirmed)")
    )


def confirmed_cases_comparison(df: DataFrame) -> DataFrame:
    """Per-date recovered/deaths/active rollup (ref …:170-174)."""
    return (
        df.groupBy("date")
        .agg(
            F.sum("recovered").alias("sum(recovered)"),
            F.sum("deaths").alias("sum(deaths)"),
            F.sum("active").alias("sum(active)"),
        )
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


def outputs(df: DataFrame) -> dict[str, DataFrame]:
    """Every named output of the reference job (main(), …:27-78) from ONE
    cached prep root — the reference re-executed the shared upstream plan
    per sink (SURVEY.md §3.1 step 5)."""
    four = ["Serbia", "Croatia", "Slovenia", "Montenegro"]
    return {
        "confirmed_cases_and_deaths_globally": confirmed_cases_and_deaths_globally(df),
        "confirmed_cases_serbia": confirmed_cases_for_country(df, "Serbia"),
        "confirmed_cases_norway": confirmed_cases_for_country(df, "Norway"),
        "confirmed_cases_italy": confirmed_cases_for_country(df, "Italy"),
        "confirmed_cases_china": confirmed_cases_for_country(df, "China"),
        "confirmed_cases_europe": europe_confirmed_cases(df),
        "confirmed_cases_comparison": confirmed_cases_comparison(df),
        "confirmed_cases_mortality_rates": most_affected_countries(df),
        "confirmed_cases_recovery_rates": best_recovery_countries(df),
        "time_series": time_series(df),
        "time_series_by_countries": time_series_by_countries(df),
        "time_series_test_data": time_series_test_data(df),
        "future_predictions": future_predictions(df),
        "future_forecasting": forecast_per_country(df, four),
    }


def run_job(spark: SparkSession, csv_path: str, out_dir: str) -> list[str]:
    """extract → prepare → all named outputs → single-file JSON-lines dirs,
    the reference's exact ETL contract (…:309-314, S6)."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.io.writers import (
        write_json_single_file,
    )

    df = prepare(extract(spark, csv_path))
    written = []
    try:
        for name, frame in outputs(df).items():
            write_json_single_file(frame, f"{out_dir}/{name}")
            written.append(name)
    finally:
        # run_job is the terminal consumer of prepare()'s cached root —
        # release it here (review r15): the caller never receives the
        # handle, so "caller-owned release" would in practice mean a
        # blunt clearCache() or a cache pinned for the session
        df.unpersist()
    return written
