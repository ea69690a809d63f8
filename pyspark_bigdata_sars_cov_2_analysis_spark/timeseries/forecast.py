"""Per-group time-series forecasting via grouped-map pandas UDF (D6/M8).

The reference fits one Prophet model per country inside a GROUPED_MAP
pandas UDF (``distributed_model_prediction``,
spark/jobs/cases_time_analysis.py:268-306): shuffle by key → Arrow batch
per group → model fit in the Python worker → Arrow back. We keep exactly
that execution shape with the modern ``applyInPandas`` API, but the
default fitter is a closed-form OLS line (deterministic, dependency-free,
oracle-checkable via SQL ``regr_slope``/``regr_intercept``); a Prophet-like
fitter plugs in behind the same interface when the library exists.

Scale: one group = one Arrow batch = one model fit; thousands of groups
parallelize across executors with no driver involvement (the reference's
sibling code path collected to the driver, toPandas — SURVEY.md §3.3).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame

from pyspark_bigdata_sars_cov_2_analysis_spark.functions.compat import pyround

FORECAST_SCHEMA = "key string, step bigint, yhat double"


def _ols_line(x: pd.Series, y: pd.Series) -> tuple[float, float]:
    """Closed-form least squares (slope, intercept) — matches SQL
    regr_slope/regr_intercept to fp precision."""
    xm, ym = x.mean(), y.mean()
    dx = x - xm
    var = (dx * dx).sum()
    slope = ((dx * (y - ym)).sum() / var) if var != 0 else 0.0
    return float(slope), float(ym - slope * xm)


def linear_forecast_by_group(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
    horizon: int = 7,
    decimals: int = 3,
) -> DataFrame:
    """For each key: fit y ~ x, predict ``horizon`` steps past max(x).

    Output: (key, step ∈ 1..horizon, yhat rounded)."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[x_col].astype("float64")
        y = pdf[y_col].astype("float64")
        slope, intercept = _ols_line(x, y)
        x_max = x.max()
        steps = list(range(1, horizon + 1))
        return pd.DataFrame(
            {
                "key": pdf[key_col].iloc[0],
                "step": pd.Series(steps, dtype="int64"),
                "yhat": [
                    pyround(intercept + slope * (x_max + s), decimals)
                    for s in steps
                ],
            }
        )

    return df.groupBy(key_col).applyInPandas(fit, FORECAST_SCHEMA)
