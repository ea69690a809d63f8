"""ML plans (SURVEY.md §2.10). Model fits are not SQL-expressible, so these
are rows-only driver checks (no oracle entry) — flagged per the contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_bigdata_sars_cov_2_analysis_spark.ml import (
    confusion_matrix,
    evaluate_accuracy,
    train_classifiers,
)
from pyspark_bigdata_sars_cov_2_analysis_spark.ml.classify import features_from_array
from pyspark_bigdata_sars_cov_2_analysis_spark.operators.sorts import seeded_split
from pyspark_bigdata_sars_cov_2_analysis_spark.plans.registry import query, table


def _prepped(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    return features_from_array(e, "embedding", "label").cache()


@query("ml01_classifier_bench", oracle=None)
def ml01_classifier_bench(spark, sf_dir):
    """M1-M6 — the reference's classifier accuracy bench
    (spark/jobs/cases_clinical_spectrum_analysis.py:168-212), seeded."""
    data = _prepped(spark, sf_dir)
    train, test = seeded_split(data, [0.8, 0.2], seed=2020)
    models = train_classifiers(train)
    rows = [
        (name, round(evaluate_accuracy(m, test), 4)) for name, m in models.items()
    ]
    return spark.createDataFrame(rows, "model string, accuracy double")


@query("ml02_confusion_matrix", oracle=None)
def ml02_confusion_matrix(spark, sf_dir):
    """M7 — DataFrame-native confusion matrix for the seeded RF
    (replaces the reference's RDD MulticlassMetrics,
    spark/jobs/radiography_analysis.py:208-214)."""
    data = _prepped(spark, sf_dir)
    train, test = seeded_split(data, [0.8, 0.2], seed=2020)
    model = train_classifiers(train, which=["random_forest"])["random_forest"]
    preds = model.transform(test).select("label", "prediction")
    return confusion_matrix(preds)
