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
    """File-source stream over a directory of parquet event files.

    The explicit schema forces ``ts`` to TIMESTAMP even where Spark 4's
    parquet NTZ inference would otherwise yield TIMESTAMP_NTZ (the session
    tz is pinned UTC by the session factory, so the instants agree); the
    conf pin below covers any code path that re-infers.
    """
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def _ordered_rows_us(pdf):
    """Drop rows with NULL ordering keys and convert the ns timestamp to
    µs — the stateful updaters' shared ingest step (review r15: the
    identical filter+cast block was copy-pasted between
    latest_per_user_state and funnel_state, so the r14 NaT fix had to
    land twice). NULL ordering keys arrive as NaT/NaN in pandas;
    int(nan) raises in the Python worker and a NaT silently becomes
    INT64_MIN through the int64 cast — a row with no (ts, event_id) has
    no place in any ordering, skip it."""
    pdf = pdf[pdf["ts"].notna() & pdf["event_id"].notna()]
    ts_us = (pdf["ts"].astype("int64") // 1000).astype("int64")
    return pdf, ts_us


def tumbling_counts(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window count+sum per event_type — streaming twin
    of plans/events.e01_tumbling_window. A tumbling window IS the sliding
    window with slide == width (``F.window(ts, w)`` ≡ ``F.window(ts, w,
    w)``, and Catalyst's slide==width fast path skips the per-row window
    expansion either way), so the agg/select shape lives once in
    :func:`sliding_counts`."""
    return sliding_counts(events, width=width, slide=width, watermark=watermark)


def sessionized(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native session windows (gap-close semantics) — streaming twin of
    plans/events.e02_sessionize."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # twin-aligned duration (review r15): the session_window
            # SPAN runs to last-event + gap by definition, so a
            # single-event session's window_us is the whole gap — the
            # batch twin's duration_us is max(ts)-min(ts); emit BOTH,
            # explicitly named, so a consumer reconciling the surfaces
            # never eats a constant +gap skew unknowingly
            (
                F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))
            ).alias("duration_us"),
        )
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            (F.unix_micros("w.end") - F.unix_micros("w.start")).alias("window_us"),
            "duration_us",
            "n_events",
        )
    )


def latest_state_per_key(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming dedup-to-latest via dropDuplicatesWithinWatermark on the
    event id (exactly-once per id), keeping the stream append-only. The
    full latest-per-user compaction is ``latest_per_user_state`` below
    (applyInPandasWithState keyed by user_id); its batch twin is
    plans/events.e03_dedup_latest_state."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def latest_per_user_state(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming latest-per-user compaction: keyed state holds each user's
    max-ts event; every micro-batch emits the user's current latest row
    (update mode). The streaming twin of the batch window-max plan
    plans/events.e03_dedup_latest_state — after an availableNow backfill
    the last emission per user equals the batch answer (tested). State is
    one (ts_us, event_id, event_type, value) quadruple per user —
    event_id is load-bearing, not bookkeeping: the tiebreak matching the
    batch twin's (ts DESC, event_id DESC) is the max over the
    (ts_us, event_id) pair."""
    import pandas as pd  # local import: Arrow path only

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "user_id bigint, ts_us bigint, event_id bigint, "
        "event_type string, value double"
    )
    state_schema = "ts_us bigint, event_id bigint, event_type string, value double"

    def update(key, pdfs, state: GroupState):
        best = state.get if state.exists else None
        for pdf in pdfs:
            pdf, ts_us = _ordered_rows_us(pdf)
            for t, eid, etype, val in zip(
                ts_us, pdf["event_id"], pdf["event_type"], pdf["value"]
            ):
                # preserve NULL attributes (review r15): str(None) stored
                # the literal string 'None' and float(None-as-NaN) rode
                # NaN into the output, both diverging from the batch
                # twin e03's NULL — only the ORDERING keys must be
                # non-null, the carried attributes may be anything
                cand = (
                    int(t),
                    int(eid),
                    None if etype is None else str(etype),
                    None if pd.isna(val) else float(val),
                )
                if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                    best = cand
        if best is None:
            return  # only null-keyed rows ever seen: nothing to emit
        state.update(best)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "ts_us": [best[0]],
                "event_id": [best[1]],
                "event_type": [best[2]],
                # nullable Float64, not float64: a None value must reach
                # Spark as NULL like the batch twin, not as NaN
                "value": pd.array([best[3]], dtype="Float64"),
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def sliding_counts(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked sliding (hopping) window count+sum per event_type —
    streaming twin of plans/events.e04_sliding_window. Each event lands in
    width/slide windows; state per open window is bounded by the
    watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"), "event_type")
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


def running_user_totals(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Custom stateful operator: per-user running (count, sum) via
    applyInPandasWithState — the escape hatch for semantics the native
    windows can't express (SURVEY.md §2.12). Emits one updated row per
    user per micro-batch; keyed state is two scalars per user, eviction by
    GroupStateTimeout is the caller's policy knob.

    After an availableNow backfill the latest row per user equals the
    batch aggregate (plans/events.e05_user_totals) — covered by tests."""
    import pandas as pd  # local import: Arrow path only

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id bigint, n_events bigint, total_value double"
    state_schema = "n bigint, total double"

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def view_purchase_attribution(
    events: DataFrame,
    attribution_window: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to the same
    user's preceding views within the attribution window. Both sides carry
    watermarks and the join condition bounds event-time distance, so state
    on each side is evicted once the watermark passes the window — the
    canonical bounded-state stream-stream join.

    The inner variant IS the outer family at ``how='inner'`` minus the
    outer-only columns, so the side projections and the three-clause
    interval predicate live once in
    :func:`view_purchase_attribution_outer` — a change to the window
    bound or the user-key condition cannot diverge the inner join (and
    its oracle-checked batch twin e06) from e10/e14."""
    return view_purchase_attribution_outer(
        events, attribution_window, watermark, how="inner"
    ).drop("v_ts")


def segment_window_counts(
    events: DataFrame,
    customers: DataFrame,
    width: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-static enrichment: join the event stream to a static
    customer dimension, then watermarked tumbling counts per market
    segment — the canonical "enrich then aggregate" streaming shape.

    A stream-static equi-join is STATELESS: the static side is just
    re-planned into every micro-batch (broadcast hash join — the dim
    never shuffles the stream side), so unlike the stream-stream join
    there is no join state to watermark-evict; the watermark here bounds
    only the window-agg state. Batch twin: plans/events.e07_segment_window.
    """
    dim = F.broadcast(
        customers.select(
            F.col("c_custkey").alias("user_id"), "c_mktsegment"
        )
    )
    return (
        events.withWatermark("ts", watermark)
        .join(dim, on="user_id")
        .groupBy(F.window("ts", width).alias("w"), "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            pround(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            F.col("c_mktsegment").alias("segment"),
            "n",
            "total_value",
        )
    )


def running_user_totals_v2(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Per-user running (count, sum) on Spark 4's ``transformWithStateInPandas``
    StatefulProcessor API — the successor to ``applyInPandasWithState``
    (which ``running_user_totals`` keeps for comparison). The processor owns
    a typed ValueState handle; the runtime manages encoding, TTL hooks, and
    timers, so this path picks up state-store improvements (changelog
    checkpointing, RocksDB) without code changes. Emits one updated row per
    user per micro-batch, exactly like the v1 operator — after an
    availableNow backfill the final row per user equals the batch aggregate
    (plans/events.e05_user_totals); tested (skipped where the env lacks
    google.protobuf, which the TWS state-server protocol requires — v1
    remains the oracle-tested default there)."""
    import pandas as pd  # local import: Arrow path only

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    out_schema = "user_id bigint, n_events bigint, total_value double"

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n bigint, total double"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                self._state.get() if self._state.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotals(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    )


def view_purchase_attribution_outer(
    events: DataFrame,
    attribution_window: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "left_outer",
) -> DataFrame:
    """LEFT OUTER watermarked interval join — the other half of the
    stream-stream join family: every view is attributed to a following
    purchase within the window like the inner variant, and a view that
    NEVER converts is emitted with null purchase columns once the
    watermark passes the end of its join validity (v_ts + window) — the
    point where no future purchase can match it, so its state is evicted
    and the null-extended row finalizes. This emit-on-eviction semantics
    is why outer stream joins REQUIRE both watermarks and a bounded
    event-time condition: without them, "no match yet" is never
    distinguishable from "no match ever" and state grows forever.

    Caveat every consumer must know (tested): views whose validity end
    lies beyond the final watermark are still held in state when an
    availableNow run drains — their null rows are NOT emitted. A
    batch-vs-stream reconciliation must condition on the final watermark
    (see tests/test_streaming_outer.py).

    ``how="full_outer"`` completes the stream-stream join family:
    additionally, a purchase with NO view in its lookback window emits
    with null view columns once the watermark passes its own timestamp
    (a purchase's join validity ends at p_ts — views must precede it).
    The user_id column is then coalesced across sides, since either
    side can be the null one."""
    views = (
        events.where(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", watermark)
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    return views.join(
        purchases,
        on=(F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (
            F.col("p_ts")
            <= F.col("v_ts") + F.expr(f"INTERVAL {attribution_window}")
        ),
        how=how,
    ).select(
        F.coalesce(F.col("v_user"), F.col("p_user")).alias("user_id"),
        "view_id",
        "purchase_id",
        (F.unix_micros("p_ts") - F.unix_micros("v_ts")).alias("lag_us"),
        "v_ts",
    )


def funnel_state(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming strictly-ordered funnel (the stateful twin of
    plans/events.e11): per-user keyed state carries the three stage
    timestamps (first view, first LATER click, first LATER purchase);
    each micro-batch folds its events in (ts, event_id) order into the
    stage machine and emits the user's current stages (update mode).
    Stages only ever advance — micro-batch boundaries cannot un-convert
    a user.

    Semantics note (the honest streaming trade): a stage records the
    FIRST-ARRIVING eligible event. When events arrive in timestamp
    order across batches — an in-order source, or late data within the
    watermark buffered upstream — this equals e11's batch minimum
    (tested via an availableNow drain over ts-ordered files). An
    eligible event arriving AFTER a later eligible event already set
    the stage does not retract it: conversion COUNTS are unaffected
    (the user converted either way), only the recorded stage timestamp
    can differ from the batch answer under cross-batch disorder.
    State is three nullable int64s per user — bounded, tiny."""
    import pandas as pd  # local import: Arrow path only

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id bigint, v_ts_us bigint, c_ts_us bigint, p_ts_us bigint"
    state_schema = "v_ts_us bigint, c_ts_us bigint, p_ts_us bigint"

    def update(key, pdfs, state: GroupState):
        v, c, p = state.get if state.exists else (None, None, None)
        rows = []
        for pdf in pdfs:
            pdf, ts_us = _ordered_rows_us(pdf)
            rows.extend(
                zip(ts_us, pdf["event_id"], pdf["event_type"])
            )
        for t, eid, et in sorted(rows, key=lambda r: (r[0], r[1])):
            t = int(t)
            if et == "view" and v is None:
                v = t
            elif et == "click" and v is not None and c is None and t > v:
                c = t
            elif et == "purchase" and c is not None and p is None and t > c:
                p = t
        state.update((v, c, p))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "v_ts_us": [v],
                "c_ts_us": [c],
                "p_ts_us": [p],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
