"""radiography pipeline — engine recomposition of
``/root/reference/spark/jobs/radiography_analysis.py``.

Image rows = struct<origin,height,width,nChannels,mode,data:binary> + label.
Differences by design (SURVEY.md §4.3/§7.3):
- pixel stats (D1) run as ONE Arrow-batched mapInPandas over the binary
  column — the reference called four separate row UDFs per image;
- origin normalization and class names (D3) are native expressions;
- per-class sampling is deterministic (content-hash order, not bare limit);
- confusion matrix is DataFrame-native (M7).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_bigdata_sars_cov_2_analysis_spark.functions.localrel import (
    local_frame,
)
from pyspark_bigdata_sars_cov_2_analysis_spark.functions.recode import (
    label_from_code,
)
from pyspark_bigdata_sars_cov_2_analysis_spark.operators.aggregates import (
    count_with_share,
)
from pyspark_bigdata_sars_cov_2_analysis_spark.operators.windows import (
    top_n_per_group,
)

CLASS_NAMES = {0: "Normal", 1: "COVID", 2: "Lung_Opacity", 3: "Viral_Pneumonia"}

STATS_SCHEMA = (
    "origin string, label int, min_pixel double, max_pixel double, "
    "mean_pixel double, std_pixel double"
)


def extract(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def valid_images(df: DataFrame, height: int = 16, width: int = 16) -> DataFrame:
    """compound predicate over nested fields (P12, ref …:98-100)."""
    return df.where(
        (F.col("image.height") == height) & (F.col("image.width") == width)
    )


def class_distribution(df: DataFrame) -> DataFrame:
    """per-class count + percentage in one scan (A3, ref …:107-112) with
    native class names (D3 de-UDF-ed, ref …:357-378)."""
    named = df.withColumn(
        "class_name", label_from_code(F.col("label"), CLASS_NAMES)
    )
    return count_with_share(named, ["class_name"])


def pixel_stats(df: DataFrame) -> DataFrame:
    """D1 — min/max/mean/std over image bytes via mapInPandas (one Arrow
    batch per partition; the reference pickled every row 4× through
    separate Python UDFs, ref …:127-131,337-350)."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            arrs = pdf["data"].map(
                lambda b: np.frombuffer(b, dtype=np.uint8).astype("float64")
            )
            yield pd.DataFrame(
                {
                    "origin": pdf["origin"],
                    "label": pdf["label"],
                    "min_pixel": arrs.map(np.min),
                    "max_pixel": arrs.map(np.max),
                    "mean_pixel": arrs.map(np.mean),
                    "std_pixel": arrs.map(lambda a: float(np.std(a))),
                }
            )

    flat = df.select(
        # native origin normalization (D3): strip scheme prefix
        F.regexp_replace("image.origin", r"^[a-z]+:(//)?", "").alias("origin"),
        F.col("label").cast("int").alias("label"),
        F.col("image.data").alias("data"),
    )
    return flat.mapInPandas(stats, STATS_SCHEMA)


def sampled_per_class(df: DataFrame, n: int = 1000) -> DataFrame:
    """the reference's per-class limit(1000) sampling (O4, ref …:133-154)
    made deterministic: order by content hash inside each class."""
    return top_n_per_group(
        df,
        ["label"],
        [F.md5(F.col("image.origin")), F.asc("image.origin")],
        n=n,
    ).drop("rn")


def classifier_with_confusion(
    stats: DataFrame, seed: int = 2020
) -> tuple[DataFrame, DataFrame]:
    """M1/M2/M6/M7 — RF on [min,max,mean,std] features, seeded 0.9/0.1
    split, accuracy + DataFrame-native confusion matrix (ref …:181-214)."""
    from pyspark.ml.feature import VectorAssembler

    from pyspark_bigdata_sars_cov_2_analysis_spark.ml import (
        confusion_matrix,
        evaluate_accuracy,
        train_classifiers,
    )

    assembled = (
        VectorAssembler(
            inputCols=["min_pixel", "max_pixel", "mean_pixel", "std_pixel"],
            outputCol="features",
        )
        .transform(stats)
        .select("features", F.col("label").cast("double"))
    )
    train, test = assembled.randomSplit([0.9, 0.1], seed=seed)
    model = train_classifiers(train, which=["random_forest"], seed=seed)[
        "random_forest"
    ]
    acc = evaluate_accuracy(model, test)
    spark = stats.sparkSession
    acc_df = local_frame(
        spark, [("random_forest", float(acc))], "model string, accuracy double"
    )
    # pin the pivot to the known class set (review r14): without
    # values=, the pivot runs an EAGER distinct scan — a full RF
    # inference of the test split at plan-construction time — and the
    # output schema varies with which classes the model happened to
    # predict (a 10% split easily misses one)
    cm = confusion_matrix(
        model.transform(test).select("label", "prediction"),
        values=[float(c) for c in sorted(CLASS_NAMES)],
    )
    return acc_df, cm


def dl_inference(df: DataFrame, limit: int = 100) -> DataFrame:
    """SCALAR_ITER batch inference over image bytes (D7/M9, ref …:294-326):
    deterministic order → limit → per-worker-cached model UDF. The model
    itself is the engine's deterministic stub (no TF in this container);
    the Arrow batching, ordering pin, and per-partition model reuse are
    the real contract."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.udf.pandas_udfs import (
        image_batch_inference_udf,
    )

    sample = df.orderBy("image.origin").limit(limit)
    return sample.select(
        F.col("image.origin").alias("origin"),
        "label",
        image_batch_inference_udf(F.col("image.data")).alias("prediction"),
    )


def outputs(df: DataFrame) -> dict[str, DataFrame]:
    """All (non-commented) named outputs of the reference job's main()
    (…:27-66; the DL-training matrix/accuracy pair is commented out there
    at :55-59 and stays out here).

    ``stats`` is CACHED (review r14): it is the expensive
    mapInPandas byte-stats fan-out and feeds the RF fit, the accuracy
    eval, the confusion pivot AND the colour_distribution write — left
    uncached, every one of those actions re-decoded every sampled
    image's bytes through Arrow/Python (~4-5× the pipeline's dominant
    cost). The sampled frame is likewise built ONCE and reused by
    take_samples. Caller owns the release — ``colour_distribution`` IS
    the cached stats frame, so its handle is the release handle
    (``run_job`` unpersists it, and the extract root, after its last
    write; a resident caller calling outputs() directly does the
    same)."""
    valid = valid_images(df)
    sampled = sampled_per_class(valid, n=1000)
    stats = pixel_stats(sampled).cache()
    acc, _cm = classifier_with_confusion(stats)
    return {
        "percentage_of_samples": class_distribution(valid),
        "take_samples": sampled.select(
            "label", F.col("image.origin").alias("origin")
        ),
        "colour_distribution": stats,
        "ml_classification": acc,
        "dl_inference": dl_inference(valid),
    }


def run_job(spark: SparkSession, parquet_path: str, out_dir: str) -> list[str]:
    from pyspark_bigdata_sars_cov_2_analysis_spark.io.writers import (
        write_json_single_file,
    )

    df = extract(spark, parquet_path).cache()
    written = []
    out = outputs(df)
    try:
        for name, frame in out.items():
            write_json_single_file(frame, f"{out_dir}/{name}")
            written.append(name)
    finally:
        # terminal consumer releases BOTH caches (review r15): the
        # extract root, and the pixel-stats frame outputs() caches —
        # which is exactly the colour_distribution entry, so the
        # returned handle is the release handle
        out["colour_distribution"].unpersist()
        df.unpersist()
    return written
