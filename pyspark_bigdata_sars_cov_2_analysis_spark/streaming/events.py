"""Structured Streaming surface over the events table (SURVEY.md §2.12).

Green-field capability (the reference is batch-only; its README proposes
cron re-runs as the streaming substitute, README.md:40). Each transform here
is the streaming twin of an oracle-checked batch plan in
``plans/events.py`` — identical logical semantics, plus watermarks for
late-data bounds and state eviction.

Scale: watermark bounds state size; window aggs shuffle on (key, window);
``availableNow`` triggers give batch-backfill semantics with the same code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_bigdata_sars_cov_2_analysis_spark.functions.compat import pround

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over a directory of parquet event files."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def tumbling_counts(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window count+sum per event_type — streaming twin
    of plans/events.e01_tumbling_window."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            pround(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sessionized(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native session windows (gap-close semantics) — streaming twin of
    plans/events.e02_sessionize."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            (F.unix_micros("w.end") - F.unix_micros("w.start")).alias("window_us"),
            "n_events",
        )
    )


def latest_state_per_key(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming dedup-to-latest via dropDuplicatesWithinWatermark on the
    event id (exactly-once per id), keeping the stream append-only. The
    full latest-per-user compaction is the batch plan
    plans/events.e03_dedup_latest_state; in streaming it would be
    applyInPandasWithState keyed by user_id."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
