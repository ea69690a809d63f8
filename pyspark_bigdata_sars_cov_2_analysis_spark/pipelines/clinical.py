"""clinical pipeline — engine recomposition of
``/root/reference/spark/jobs/cases_clinical_spectrum_analysis.py``.

Contract parity with fixes (SURVEY.md §7.3):
- the recode row-UDFs (D4) are native when-chains;
- ``aggregate_age_result`` keeps its ``max(age)``/``avg(age)`` output names
  but runs as ONE Catalyst plan — no parquet-write + SQL-scan barrier
  (ref …:108-121, §3.2);
- the 9-col/1-col union bug (U2, ref …:164-166) is implemented as the
  intended column concat (select both column sets);
- every randomSplit is seeded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_bigdata_sars_cov_2_analysis_spark.functions.compat import pround
from pyspark_bigdata_sars_cov_2_analysis_spark.functions.localrel import (
    local_frame,
)
from pyspark_bigdata_sars_cov_2_analysis_spark.functions.recode import (
    binary_indicator,
)
from pyspark_bigdata_sars_cov_2_analysis_spark.io.readers import read_csv
from pyspark_bigdata_sars_cov_2_analysis_spark.operators.relational import (
    null_profile,
)

RESULT_COL = "SARS-Cov-2 exam result"
AGE_COL = "Patient age quantile"
FEATURES = [
    "Hemoglobin", "Hematocrit", "Platelets", "Eosinophils", "Red blood Cells",
    "Lymphocytes", "Leukocytes", "Basophils", "Monocytes",
]
DROP_SPARSE = [
    "Mycoplasma pneumoniae", "Urine - Sugar", "Prothrombin time (PT), Activity",
    "D-Dimer", "Fio2 (venous blood gas analysis)", "Urine - Nitrite", "Vitamin B12",
]
RECODE_MAP = {
    "not_detected": "0", "detected": "1", "absent": "0", "present": "1",
    "negative": "0", "positive": "1", "nan": "0",
}


def extract(spark: SparkSession, path: str) -> DataFrame:
    return read_csv(spark, path, header=True)


def prepare(df: DataFrame) -> DataFrame:
    """drop unusable sparse cols, recode categorical assays to 0/1, fill
    nulls, cast features to double (ref …:243-264) — all native."""
    out = df.drop(*DROP_SPARSE)
    for c, t in [(AGE_COL, "int")]:
        out = out.withColumn(c, F.col(c).cast(t))
    recode = F.col("Assay result")
    for k, v in RECODE_MAP.items():
        recode = F.when(F.col("Assay result") == k, v).otherwise(recode)
    if "Assay result" in out.columns:
        out = out.withColumn("Assay result", recode)
    for c in FEATURES:
        out = out.withColumn(
            c,
            pround(
                F.when(F.col(c) == "nan", None).otherwise(F.col(c)).cast("double"),
                2,
            ),
        )
    return out.cache()


def aggregate_age_result(df: DataFrame) -> DataFrame:
    """select/alias → groupBy(result).agg(max, avg) with the reference's
    generated names ``max(age)``/``avg(age)`` — ONE plan, no disk barrier
    (ref …:108-121)."""
    pairs = df.select(
        F.col(AGE_COL).alias("age"), F.col(RESULT_COL).alias("result")
    )
    return pairs.groupBy("result").agg(
        F.max("age").alias("max(age)"),
        pround(F.avg("age"), 2).alias("avg(age)"),
    )


def result_counts(df: DataFrame) -> DataFrame:
    """A5 (ref …:238)."""
    return (
        df.select(F.col(RESULT_COL).alias("result"))
        .groupBy("result")
        .count()
    )


def missing_profile(df: DataFrame) -> DataFrame:
    """A7 — per-column null/NaN counts (ref …:220-225)."""
    return null_profile(df, FEATURES)


def label_and_features(df: DataFrame) -> DataFrame:
    """native is_positive (D4 de-UDF-ed) + feature fill for the model bench
    (ref …:128-169)."""
    out = df.withColumn("label", binary_indicator(F.col(RESULT_COL), "positive"))
    out = out.na.fill(0.0, subset=FEATURES)
    return out


def classifier_bench(df: DataFrame, seed: int = 2020) -> DataFrame:
    """M1-M6 — assembler + RF/DT/LR/GBT accuracies, seeded 0.8/0.2 split
    (ref …:168-212)."""
    from pyspark.ml.feature import VectorAssembler

    from pyspark_bigdata_sars_cov_2_analysis_spark.ml import (
        evaluate_accuracy,
        train_classifiers,
    )

    data = label_and_features(df)
    assembled = (
        VectorAssembler(inputCols=FEATURES, outputCol="features")
        .transform(data)
        .select("features", F.col("label").cast("double"))
    )
    train, test = assembled.randomSplit([0.8, 0.2], seed=seed)
    models = train_classifiers(
        train,
        which=["random_forest", "decision_tree", "logistic_regression", "gbt"],
        seed=seed,
    )
    spark = df.sparkSession
    rows = [(n, float(evaluate_accuracy(m, test))) for n, m in models.items()]
    return local_frame(spark, rows, "model string, accuracy double")


def assay_values(df: DataFrame, column: str) -> DataFrame:
    """Single-assay value series rounded to 2dp with nulls as 0 — the
    reference's hemoglobin / red-blood-cells outputs are this one
    transform parameterized (ref …:84-104)."""
    return df.select(
        pround(F.coalesce(F.col(column).cast("double"), F.lit(0.0)), 2).alias(column)
    )


def age_relations(df: DataFrame) -> DataFrame:
    """(result, age, positive, negative) with the D4 indicator UDFs as
    native when-chains (ref …:124-138)."""
    pairs = df.select(
        F.col(RESULT_COL).alias("result"), F.col(AGE_COL).alias("age")
    )
    return pairs.withColumn(
        "positive", binary_indicator(F.col("result"), "positive").cast("string")
    ).withColumn(
        "negative", binary_indicator(F.col("result"), "negative").cast("string")
    )


def care_relations(df: DataFrame) -> DataFrame:
    """Positive-case slice with a numeric ``result`` column (ref …:141-150;
    ``negative_positive_to_numeric`` de-UDF-ed)."""
    out = df.withColumn("result", binary_indicator(F.col(RESULT_COL), "positive"))
    return out.where(F.col("result") == 1)


def value_distribution(df: DataFrame) -> DataFrame:
    """The recoded full frame (ref transform_predictions_value_distribution,
    …:230-233 — dismiss_missing_values output)."""
    return df


def outputs(df: DataFrame) -> dict[str, DataFrame]:
    """All named outputs of the reference job's main() (…:27-50)."""
    return {
        "hemoglobin_values": assay_values(df, "Hemoglobin"),
        "red_blood_cells_values": assay_values(df, "Red blood Cells"),
        "aggregate_age_result": aggregate_age_result(df),
        "age_relations": age_relations(df),
        "care_relations": care_relations(df),
        "predictions_missing_values": missing_profile(df),
        "predictions_value_distribution": value_distribution(df),
        "predictions_test_result_distribution": result_counts(df),
        "predictions": classifier_bench(df),
    }


def run_job(spark: SparkSession, csv_path: str, out_dir: str) -> list[str]:
    """extract → prepare → all named outputs → single-file JSON-lines dirs
    (the reference's load_data contract, …:295-300)."""
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
        # terminal consumer releases prepare()'s cached root (the
        # cases_time run_job rule, review r15)
        df.unpersist()
    return written
