"""ML layer (SURVEY.md §2.10 M1-M7): assembler + classifiers + evaluation.

Mirrors the reference's clinical/radiography classifier benches
(spark/jobs/cases_clinical_spectrum_analysis.py:168-212;
spark/jobs/radiography_analysis.py:181-214) with three deliberate fixes:
- every randomSplit is seeded (the reference left one unseeded);
- the confusion matrix is DataFrame-native (groupBy label/prediction +
  pivot) instead of the RDD MulticlassMetrics API (M7);
- features come straight from array columns via array_to_vector — no
  per-row Python UDF.
"""

from __future__ import annotations

from pyspark.ml.classification import (
    DecisionTreeClassifier,
    GBTClassifier,
    LogisticRegression,
    RandomForestClassifier,
)
from pyspark.ml.evaluation import MulticlassClassificationEvaluator
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def features_from_array(df: DataFrame, array_col: str, label_col: str) -> DataFrame:
    """array<float> column → MLlib features vector (M1 without a UDF;
    the reference built DenseVectors in Python per row,
    spark/jobs/radiography_analysis.py:353-354)."""
    return df.select(
        array_to_vector(F.col(array_col).cast("array<double>")).alias("features"),
        F.col(label_col).cast("double").alias("label"),
    )


def train_classifiers(
    train: DataFrame, which: list[str] | None = None, seed: int = 2020
) -> dict[str, object]:
    """M2-M5: fit the reference's four classifier families."""
    zoo = {
        "random_forest": RandomForestClassifier(maxDepth=5, seed=seed),
        "decision_tree": DecisionTreeClassifier(maxDepth=3, seed=seed),
        "logistic_regression": LogisticRegression(maxIter=10),
        "gbt": GBTClassifier(seed=seed),  # binary-only, like the reference
    }
    names = which or ["random_forest", "decision_tree", "logistic_regression"]
    return {n: zoo[n].fit(train) for n in names}


def evaluate_accuracy(model, test: DataFrame) -> float:
    """M6."""
    ev = MulticlassClassificationEvaluator(metricName="accuracy")
    return float(ev.evaluate(model.transform(test)))


def confusion_matrix(
    predictions: DataFrame, values: list | None = None
) -> DataFrame:
    """M7, DataFrame-native: one groupBy, no RDD round-trip. Pass
    ``values`` (the known class set) to pin the pivot schema — without it
    Spark runs an extra distinct scan AND the output schema varies with
    which classes happen to appear (a stability bug for downstream
    consumers and hash-compares alike)."""
    grouped = predictions.groupBy(F.col("label").cast("bigint").alias("label"))
    # `is not None`, not truthiness: values=[] must go through the pinned
    # path (empty pivot schema) rather than silently falling back to the
    # schema-unstable distinct-scan pivot
    piv = (
        grouped.pivot("prediction", values)
        if values is not None
        else grouped.pivot("prediction")
    )
    return piv.count().na.fill(0)
