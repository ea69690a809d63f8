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

from collections.abc import Callable

import pandas as pd

from pyspark.sql import DataFrame

from pyspark_bigdata_sars_cov_2_analysis_spark.functions.compat import pyround

FORECAST_SCHEMA = "key string, step bigint, yhat double"

# A fitter trains on numeric (x, y) and returns predict: x_new -> yhat.
# This is the pluggable seam the reference filled with Prophet; anything
# honoring it drops into the same applyInPandas execution shape.
Fitter = Callable[[pd.Series, pd.Series], Callable[[pd.Series], pd.Series]]


def _ols_line(x: pd.Series, y: pd.Series) -> tuple[float | None, float | None]:
    """Closed-form least squares (slope, intercept) — matches SQL
    regr_slope/regr_intercept to fp precision INCLUDING the degenerate
    case (review r9): a zero-variance group (all x identical) returns
    (None, None) exactly as regr_slope/regr_intercept return NULL — the
    old slope=0/intercept=mean fallback silently diverged from the u05
    oracle on single-day groups.

    Rows where x OR y is NULL/NaN are dropped as a PAIR first (review
    r14): SQL regr_* skips the whole NULL observation, while pandas
    mean/sum skip NaN element-wise — a NULL-x row's y still entered
    ``ym`` and silently bent the intercept away from the oracle.
    Precision of the claim (review r15): after the Arrow transfer a
    Spark NULL and a true NaN are the same float64 NaN, so the pandas
    path cannot honor regr_*'s one divergence between them (SQL skips
    NULL but PROPAGATES NaN — verified in DuckDB). Dropping non-finite
    pairs therefore matches the oracle exactly on NULL observations —
    the only kind the attested inputs contain — and true-NaN measures
    are out of the attested contract (clean them upstream)."""
    ok = x.notna() & y.notna()
    x, y = x[ok], y[ok]
    if len(x) == 0:
        return None, None
    xm, ym = x.mean(), y.mean()
    dx = x - xm
    var = (dx * dx).sum()
    if var == 0:
        return None, None
    slope = (dx * (y - ym)).sum() / var
    return float(slope), float(ym - slope * xm)


def ols_fitter(x: pd.Series, y: pd.Series) -> Callable[[pd.Series], pd.Series]:
    """Default fitter: deterministic closed-form OLS — dependency-free and
    oracle-checkable via SQL regr_slope/regr_intercept. A zero-variance
    group forecasts all-NULL (the SQL twin's NULL propagated through
    ``icept + slope * x``)."""
    slope, intercept = _ols_line(x, y)
    if slope is None:
        return lambda xn: pd.Series([None] * len(xn), dtype="object")
    return lambda xn: intercept + slope * xn.astype("float64")


def prophet_fitter(
    epoch: str = "2020-01-01",
) -> Fitter:
    """Prophet behind the same seam (reference
    spark/jobs/cases_time_analysis.py:268-306 fit one per group). Numeric
    x is interpreted as days since ``epoch`` to build Prophet's ``ds``
    column. Import is deferred to fit time so the engine loads without the
    library; callers gate on availability (see the skipped-if-absent smoke
    test)."""

    def fit(x: pd.Series, y: pd.Series) -> Callable[[pd.Series], pd.Series]:
        from prophet import Prophet  # gated optional dependency

        # honor the Fitter seam's degenerate-input contract exactly
        # like ols_fitter (review r15): NULL/NaN observations drop as
        # pairs, and a group left with <2 points (Prophet's hard
        # minimum) forecasts all-NULL instead of killing the job —
        # x.astype('int64') on a NaN raised ValueError in the executor
        # and one bad group aborted every group's forecast
        ok = x.notna() & y.notna()
        x, y = x[ok], y[ok]
        if len(x) < 2:
            return lambda xn: pd.Series([None] * len(xn), dtype="object")
        base = pd.Timestamp(epoch)
        m = Prophet()
        m.fit(
            pd.DataFrame(
                {"ds": base + pd.to_timedelta(x.astype("int64"), unit="D"), "y": y}
            )
        )

        def predict(xn: pd.Series) -> pd.Series:
            future = pd.DataFrame(
                {"ds": base + pd.to_timedelta(xn.astype("int64"), unit="D")}
            )
            return m.predict(future)["yhat"]

        return predict

    return fit


def linear_forecast_by_group(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
    horizon: int = 7,
    decimals: int = 3,
    fitter: Fitter = ols_fitter,
) -> DataFrame:
    """For each key: fit y ~ x with ``fitter``, predict ``horizon`` steps
    past max(x).

    Output: (key, step ∈ 1..horizon, yhat rounded)."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[x_col].astype("float64")
        y = pdf[y_col].astype("float64")
        predict = fitter(x, y)
        x_max = x.max()
        steps = pd.Series(range(1, horizon + 1), dtype="int64")
        yhat = predict(x_max + steps)
        return pd.DataFrame(
            {
                "key": pdf[key_col].iloc[0],
                "step": steps,
                # NULL (not NaN) for degenerate fits: the driver's value
                # hash distinguishes the two, and the SQL twin yields NULL
                "yhat": [
                    None if pd.isna(v) else pyround(float(v), decimals)
                    for v in yhat
                ],
            }
        )

    return df.groupBy(key_col).applyInPandas(fit, FORECAST_SCHEMA)
