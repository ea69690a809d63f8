"""Pluggable-model seams: deterministic defaults are the oracle-checked
gate; the reference's actual libraries (Prophet, TextBlob) plug in behind
the same interfaces and are smoke-tested only where installed
(skipped-if-absent — this container ships neither).
"""

from __future__ import annotations

import pytest

from pyspark_bigdata_sars_cov_2_analysis_spark.timeseries import forecast


def _series(spark):
    rows = [("a", float(i), 2.0 * i + 1.0 + (0.1 if i % 2 else -0.1)) for i in range(20)]
    rows += [("b", float(i), -1.0 * i + 5.0) for i in range(20)]
    return spark.createDataFrame(rows, "k string, x double, y double")


def test_fitter_seam_default_is_ols(spark):
    df = _series(spark)
    default = forecast.linear_forecast_by_group(df, "k", "x", "y", horizon=3)
    explicit = forecast.linear_forecast_by_group(
        df, "k", "x", "y", horizon=3, fitter=forecast.ols_fitter
    )
    assert sorted(map(tuple, default.collect())) == sorted(
        map(tuple, explicit.collect())
    )


def test_prophet_fitter_smoke(spark):
    """Exercise the reference's actual Prophet path (ref M8,
    spark/jobs/cases_time_analysis.py:268-306) through the same
    applyInPandas seam as the default OLS fitter. On a noiseless-ish
    linear series Prophet's trend must land in a tolerance band around
    the closed-form OLS extrapolation — a value check, not just
    non-null. Skips cleanly where prophet is absent; never fails."""
    pytest.importorskip("prophet")
    df = _series(spark)
    got = forecast.linear_forecast_by_group(
        df, "k", "x", "y", horizon=3, fitter=forecast.prophet_fitter()
    ).collect()
    assert len(got) == 6  # 2 keys x 3 steps
    ols = {
        (r["key"], r["step"]): r["yhat"]
        for r in forecast.linear_forecast_by_group(
            df, "k", "x", "y", horizon=3, fitter=forecast.ols_fitter
        ).collect()
    }
    for r in got:
        want = ols[(r["key"], r["step"])]
        tol = max(2.0, 0.15 * abs(want))
        assert abs(r["yhat"] - want) <= tol, (r, want)


def test_textblob_sentiment_parity(spark):
    textblob = pytest.importorskip("textblob")
    from pyspark_bigdata_sars_cov_2_analysis_spark.pipelines.research import (
        textblob_sentiment_column,
    )

    texts = ["this is a great effective result", "a severe fatal failure"]
    df = spark.createDataFrame([(t,) for t in texts], "cleaned string")
    got = [r[0] for r in df.select(textblob_sentiment_column("cleaned")).collect()]
    want = [round(textblob.TextBlob(t).sentiment.polarity, 2) for t in texts]
    assert got == want


def test_sentiment_scorer_seam(spark, tmp_path):
    """In this container auto must resolve to the lexicon gate, explicit
    scorers must be honored, and unknown scorers must fail loudly."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.pipelines import research

    from tests import fixtures

    df = research.extract(spark, [fixtures.write_cord19_json(str(tmp_path))])
    auto = research.cleaned_with_sentiment(df, scorer="auto")
    lex = research.cleaned_with_sentiment(df, scorer="lexicon")
    try:
        import textblob  # noqa: F401

        pytest.skip("textblob present; auto resolves to textblob here")
    except ImportError:
        pass
    assert sorted(map(tuple, auto.select("sentiment").collect())) == sorted(
        map(tuple, lex.select("sentiment").collect())
    )
    with pytest.raises(ValueError, match="unknown sentiment scorer"):
        research.cleaned_with_sentiment(df, scorer="vader")
