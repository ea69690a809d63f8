"""End-to-end pipeline tests on reference-shaped fixtures (SURVEY.md §5.2
item 3): output column contracts, golden-ish invariants, determinism."""

from __future__ import annotations

import pytest

from pyspark_bigdata_sars_cov_2_analysis_spark.pipelines import (
    cases_time,
    clinical,
    radiography,
    research,
)
from tests import fixtures


@pytest.fixture(scope="module")
def tmp_fixtures(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fixtures"))
    return {
        "cases_time": fixtures.write_cases_time_csv(d),
        "clinical": fixtures.write_clinical_csv(d),
        "cord19": fixtures.write_cord19_json(d),
        "radiography": fixtures.write_radiography_parquet(d, spark),
    }


class TestCasesTime:
    @pytest.fixture(scope="class")
    def prepped(self, spark, tmp_fixtures):
        return cases_time.prepare(
            cases_time.extract(spark, tmp_fixtures["cases_time"])
        )

    def test_global_rollup_contract(self, prepped):
        out = cases_time.confirmed_cases_and_deaths_globally(prepped)
        assert out.columns == ["date", "sum(confirmed)", "sum(deaths)"]
        rows = out.collect()
        assert len(rows) == 60  # one per date
        # cumulative counts: global confirmed must be non-decreasing
        vals = [r["sum(confirmed)"] for r in rows]
        assert vals == sorted(vals)

    def test_country_normalization(self, prepped):
        countries = {r["country"] for r in prepped.select("country").distinct().collect()}
        assert "China" in countries and "Mainland China" not in countries

    def test_latest_snapshot_contract(self, prepped):
        out = cases_time.latest_snapshot_by_country(prepped)
        assert out.columns == [
            "country", "sum(confirmed)", "sum(deaths)", "sum(recovered)",
            "sum(active)",
        ]
        # one row per country after window-max + agg
        assert out.count() == prepped.select("country").distinct().count()

    def test_mortality_topk_sorted_ascending(self, prepped):
        out = cases_time.most_affected_countries(prepped, k=5).collect()
        assert len(out) == 5
        rates = [r["mortalityRate"] for r in out]
        assert rates == sorted(rates)  # re-sorted ascending for display
        assert all(0 <= r <= 100 for r in rates)

    def test_window_equals_join_formulation(self, prepped):
        from pyspark.sql import functions as F

        from pyspark_bigdata_sars_cov_2_analysis_spark.operators import (
            joins,
            windows,
        )

        base = prepped.drop("state")
        a = windows.latest_per_group(base, ["country"], "date")
        b = joins.latest_per_group_via_join(base, ["country"], "date")
        sel = lambda df: sorted(
            map(tuple, df.select("country", "date", "confirmed").collect())
        )
        assert sel(a) == sel(b)

    def test_forecast_shape(self, prepped):
        out = cases_time.forecast_per_country(
            prepped, ["Serbia", "Italy"], horizon=10
        )
        rows = out.collect()
        assert len(rows) == 20  # 2 countries × 10 steps
        assert set(out.columns) == {"key", "step", "yhat"}

    def test_determinism(self, prepped):
        one = cases_time.most_affected_countries(prepped, k=5).collect()
        two = cases_time.most_affected_countries(prepped, k=5).collect()
        assert one == two


class TestClinical:
    @pytest.fixture(scope="class")
    def prepped(self, spark, tmp_fixtures):
        return clinical.prepare(clinical.extract(spark, tmp_fixtures["clinical"]))

    def test_sparse_columns_dropped(self, prepped):
        assert not set(clinical.DROP_SPARSE) & set(prepped.columns)

    def test_aggregate_age_result_contract(self, prepped):
        out = clinical.aggregate_age_result(prepped)
        assert out.columns == ["result", "max(age)", "avg(age)"]
        rows = {r["result"]: r for r in out.collect()}
        assert set(rows) == {"positive", "negative"}
        assert all(0 <= r["max(age)"] <= 19 for r in rows.values())

    def test_missing_profile_counts(self, prepped):
        row = clinical.missing_profile(prepped).collect()[0]
        n = prepped.count()
        # features are 50-90% null in the fixture
        for c in clinical.FEATURES:
            assert 0.3 * n < row[c] < 0.9 * n

    def test_classifier_bench_accuracies(self, prepped):
        out = clinical.classifier_bench(prepped)
        accs = {r["model"]: r["accuracy"] for r in out.collect()}
        assert set(accs) == {
            "random_forest", "decision_tree", "logistic_regression", "gbt"
        }
        # ~90% negative base rate: any sane model beats 0.5
        assert all(a > 0.5 for a in accs.values())


class TestResearch:
    @pytest.fixture(scope="class")
    def papers(self, spark, tmp_fixtures):
        return research.extract(spark, tmp_fixtures["cord19"] + "/*.json").cache()

    def test_schema_roundtrip(self, papers):
        assert papers.count() == 200
        assert papers.schema["metadata"].dataType.typeName() == "struct"

    def test_authors_with_email(self, papers):
        out = research.authors_with_email(papers)
        assert {"paper_id", "first", "last", "email"} <= set(out.columns)
        assert out.where("email = ''").count() == 0
        assert out.count() > 0

    def test_abstract_reassembly_order(self, papers, spark):
        from pyspark.sql import functions as F

        out = research.abstracts_reassembled(papers)
        # reassembled text must equal the positional join of the raw array
        raw = papers.select(
            "paper_id",
            F.array_join(
                F.transform("abstract", lambda s: s["text"]), " "
            ).alias("expect"),
        )
        j = out.join(raw, "paper_id")
        assert j.where(F.col("abstract_text") != F.col("expect")).count() == 0
        assert out.where(F.col("words") <= 0).count() == 0

    def test_sentiment_fallback_deterministic(self, papers):
        a = sorted(map(tuple, research.cleaned_with_sentiment(papers).collect()))
        b = sorted(map(tuple, research.cleaned_with_sentiment(papers).collect()))
        assert a == b

    def test_bibliography_map_access(self, papers):
        out = research.bibliography_years(papers)
        rows = out.collect()
        assert all(r["n_refs"] >= 1 for r in rows)
        assert all(r["min_year"] <= r["max_year"] for r in rows)


class TestRadiography:
    @pytest.fixture(scope="class")
    def images(self, spark, tmp_fixtures):
        return radiography.extract(spark, tmp_fixtures["radiography"]).cache()

    def test_valid_filter_drops_offsize(self, images):
        assert radiography.valid_images(images).count() == 80  # 4 bad dropped

    def test_class_distribution(self, images):
        out = radiography.class_distribution(radiography.valid_images(images))
        rows = {r["class_name"]: r for r in out.collect()}
        assert set(rows) == {"Normal", "COVID", "Lung_Opacity", "Viral_Pneumonia"}
        assert all(r["percentage"] == 25.0 for r in rows.values())

    def test_pixel_stats_separate_classes(self, images):
        from pyspark.sql import functions as F

        stats = radiography.pixel_stats(radiography.valid_images(images))
        per_class = (
            stats.groupBy("label")
            .agg(F.avg("mean_pixel").alias("m"))
            .orderBy("label")
            .collect()
        )
        means = [r["m"] for r in per_class]
        assert means == sorted(means)  # class means 60 < 110 < 160 < 210
        # origin scheme stripped natively
        assert stats.where(F.col("origin").startswith("hdfs://")).count() == 0

    def test_classifier_and_confusion(self, images):
        stats = radiography.pixel_stats(radiography.valid_images(images))
        acc_df, cm = radiography.classifier_with_confusion(stats)
        acc = acc_df.collect()[0]["accuracy"]
        assert acc > 0.5  # classes are well separated by construction
        assert "label" in cm.columns and len(cm.columns) >= 2


class TestCasesTimeJobParity:
    """The full reference job: all 14 named outputs from main()
    (spark/jobs/cases_time_analysis.py:27-78), written as single-file
    JSON-lines dirs a reference consumer could read unchanged."""

    REFERENCE_OUTPUTS = {
        "confirmed_cases_and_deaths_globally",
        "confirmed_cases_serbia",
        "confirmed_cases_norway",
        "confirmed_cases_italy",
        "confirmed_cases_china",
        "confirmed_cases_europe",
        "confirmed_cases_comparison",
        "confirmed_cases_mortality_rates",
        "confirmed_cases_recovery_rates",
        "time_series",
        "time_series_by_countries",
        "time_series_test_data",
        "future_predictions",
        "future_forecasting",
    }

    def test_run_job_writes_every_reference_output(
        self, spark, tmp_fixtures, tmp_path
    ):
        import glob
        import os

        out = str(tmp_path / "cases_time_out")
        cached_before = spark.sparkContext._jsc.getPersistentRDDs().size()
        written = cases_time.run_job(spark, tmp_fixtures["cases_time"], out)
        # run_job is the terminal consumer: its prepare() cache must be
        # released on return, not pinned for the session (review r15)
        assert (
            spark.sparkContext._jsc.getPersistentRDDs().size()
            <= cached_before
        )
        assert set(written) == self.REFERENCE_OUTPUTS
        for name in written:
            parts = glob.glob(os.path.join(out, name, "part-*"))
            assert len(parts) == 1, f"{name}: single-file contract"

    def test_output_column_contracts(self, spark, tmp_fixtures):
        df = cases_time.prepare(
            cases_time.extract(spark, tmp_fixtures["cases_time"])
        )
        outs = cases_time.outputs(df)
        assert outs["confirmed_cases_serbia"].columns == ["date", "sum(confirmed)"]
        assert outs["confirmed_cases_europe"].columns == ["country", "sum(confirmed)"]
        assert outs["confirmed_cases_comparison"].columns == [
            "date", "sum(recovered)", "sum(deaths)", "sum(active)",
        ]
        assert outs["confirmed_cases_recovery_rates"].columns[-1] == "recoveryRate"
        assert outs["time_series"].columns == ["ds", "y"]
        assert outs["future_predictions"].columns == [
            "ds", "yhat", "yhat_lower", "yhat_upper",
        ]


class TestClinicalJobParity:
    REFERENCE_OUTPUTS = {
        "hemoglobin_values",
        "red_blood_cells_values",
        "aggregate_age_result",
        "age_relations",
        "care_relations",
        "predictions_missing_values",
        "predictions_value_distribution",
        "predictions_test_result_distribution",
        "predictions",
    }

    def test_run_job_writes_every_reference_output(
        self, spark, tmp_fixtures, tmp_path
    ):
        import glob
        import os

        out = str(tmp_path / "clinical_out")
        written = clinical.run_job(spark, tmp_fixtures["clinical"], out)
        assert set(written) == self.REFERENCE_OUTPUTS
        for name in written:
            parts = glob.glob(os.path.join(out, name, "part-*"))
            assert len(parts) == 1, f"{name}: single-file contract"

    def test_age_relations_contract(self, spark, tmp_fixtures):
        df = clinical.prepare(clinical.extract(spark, tmp_fixtures["clinical"]))
        out = clinical.age_relations(df)
        assert out.columns == ["result", "age", "positive", "negative"]
        rows = out.collect()
        assert all(
            (r["positive"], r["negative"]) in {("1", "0"), ("0", "1"), ("0", "0")}
            for r in rows
        )


class TestResearchAndRadiographyJobParity:
    def test_research_outputs(self, spark, tmp_fixtures, tmp_path):
        import glob
        import os

        out = str(tmp_path / "research_out")
        written = research.run_job(
            spark, tmp_fixtures["cord19"] + "/*.json", out
        )
        assert set(written) == {"paper_authors", "paper_abstracts"}
        for name in written:
            assert glob.glob(os.path.join(out, name, "part-*")), name

    def test_radiography_outputs(self, spark, tmp_fixtures, tmp_path):
        import glob
        import os

        out = str(tmp_path / "radiography_out")
        cached_before = spark.sparkContext._jsc.getPersistentRDDs().size()
        written = radiography.run_job(spark, tmp_fixtures["radiography"], out)
        # both run_job caches (extract root + pixel-stats frame) must be
        # released on return (review r15)
        assert (
            spark.sparkContext._jsc.getPersistentRDDs().size()
            <= cached_before
        )
        assert set(written) == {
            "percentage_of_samples",
            "take_samples",
            "colour_distribution",
            "ml_classification",
            "dl_inference",
        }
        for name in written:
            assert glob.glob(os.path.join(out, name, "part-*")), name


def test_future_predictions_degenerate_train_split_yields_nulls(spark):
    """Review r9: a train split with zero or one distinct day makes the
    OLS fit degenerate — ols_fitter returns the all-NULL predictor (its
    SQL-twin contract) and future_predictions previously crashed on
    float(None) arithmetic. Every split outcome must now return cleanly:
    numeric forecasts from a healthy fit, all-NULL rows (yhat and both
    bands) from a degenerate one, never an exception."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.pipelines.cases_time import (
        future_predictions,
    )

    df = spark.createDataFrame(
        [("2020-03-01", 5), ("2020-03-01", 7), ("2020-03-02", 9)],
        "date string, confirmed long",
    )
    saw_degenerate = False
    for seed in range(12):
        rows = future_predictions(df, seed=seed).collect()
        for r in rows:
            vals = (r.yhat, r.yhat_lower, r.yhat_upper)
            if r.yhat is None:
                saw_degenerate = True
                assert vals == (None, None, None), (seed, r)
            else:
                assert all(v is not None for v in vals), (seed, r)
    # with 2 candidate days and 12 seeds, some split leaves <=1 distinct
    # train day — if this ever stops holding, add seeds rather than
    # weakening the assertion
    assert saw_degenerate
