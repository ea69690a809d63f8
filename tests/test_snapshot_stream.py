"""Streaming SOURCE over a snapshot table (r13, io/snapshot_source.py).

Pins: initial-content + per-version incremental batches, checkpointed
restarts re-emitting nothing (offsets are version numbers), compact
versions contributing nothing, rewrite versions refusing by name unless
ignore_changes skips them (and the same checkpoint then resumes),
evolution null-padding under the pinned schema, starting_version, and
the vacuumed-manifest refusal.
"""

from __future__ import annotations

import pytest

from pyspark_bigdata_sars_cov_2_analysis_spark.io import writers as W
from pyspark_bigdata_sars_cov_2_analysis_spark.io.snapshot_source import (
    register_snapshot_stream,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 2 AS v").coalesce(1)


def _drain(spark, tbl, out, ckpt, **opts):
    reader = spark.readStream.format("snapshot_stream")
    for k, val in opts.items():
        reader = reader.option(k, val)
    q = (
        reader.load(tbl)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream drain timed out"


def _out_ids(spark, out):
    return sorted(r.id for r in spark.read.parquet(out).collect())


def test_stream_initial_then_incremental(spark, tmp_path):
    register_snapshot_stream(spark)
    tbl, out, ckpt = (
        str(tmp_path / "tbl"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    W.write_parquet_snapshot(_df(spark, 0, 5), tbl)
    W.write_parquet_snapshot(_df(spark, 5, 8), tbl, mode="append")
    _drain(spark, tbl, out, ckpt)
    assert _out_ids(spark, out) == list(range(8))

    # the next drain over the SAME checkpoint re-emits nothing; a new
    # append and a content-identical compaction arrive as exactly the
    # append's rows
    W.write_parquet_snapshot(_df(spark, 8, 10), tbl, mode="append")
    W.compact_parquet_snapshot(spark, tbl, target_files=1)
    _drain(spark, tbl, out, ckpt)
    assert _out_ids(spark, out) == list(range(10))

    # appends AFTER a compaction diff against the compacted file set
    W.write_parquet_snapshot(_df(spark, 10, 12), tbl, mode="append")
    _drain(spark, tbl, out, ckpt)
    assert _out_ids(spark, out) == list(range(12))


def test_stream_reads_sink_created_table(spark, tmp_path):
    """Review r13 (critical): the streaming sink's FIRST batch publishes
    v1 with mode='append' — the source must treat any v1 as initial
    content instead of diffing against a nonexistent v0, or the
    advertised sink→source loop fails on every sink-created table."""
    register_snapshot_stream(spark)
    tbl, out, ckpt = (
        str(tmp_path / "tbl"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    assert W.snapshot_publish_batch(_df(spark, 0, 4), 0, tbl) is True
    assert W.snapshot_publish_batch(_df(spark, 4, 7), 1, tbl) is True
    assert W.list_parquet_snapshots(tbl)[0]["mode"] == "append"
    _drain(spark, tbl, out, ckpt)
    assert _out_ids(spark, out) == list(range(7))


def test_stream_refuses_rewrites_unless_ignored(spark, tmp_path):
    register_snapshot_stream(spark)
    tbl, out, ckpt = (
        str(tmp_path / "tbl"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    W.write_parquet_snapshot(_df(spark, 0, 5), tbl)
    _drain(spark, tbl, out, ckpt)
    W.delete_from_snapshot(spark, tbl, "id = 3")  # v2: a rewrite

    q = (
        spark.readStream.format("snapshot_stream")
        .load(tbl)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="delete rewrite"):
        q.awaitTermination(120)

    # the failed batch never committed: the SAME checkpoint resumes once
    # the consumer opts into skipping rewrites. Spark re-runs the batch
    # it had already PLANNED into the offset log (the rewrite version,
    # now skipped → empty) — and under availableNow's single-batch
    # fallback for Python stream sources that replayed batch is all one
    # start() processes, so the later append needs one more drain (the
    # MicroBatchExecution warning's documented caveat).
    W.write_parquet_snapshot(_df(spark, 20, 22), tbl, mode="append")
    _drain(spark, tbl, out, ckpt, ignore_changes="true")
    assert _out_ids(spark, out) == list(range(5))
    _drain(spark, tbl, out, ckpt)  # the append needs no ignore flag
    assert _out_ids(spark, out) == list(range(5)) + [20, 21]


def test_stream_pads_omitted_evolution_columns(spark, tmp_path):
    register_snapshot_stream(spark)
    tbl, out, ckpt = (
        str(tmp_path / "tbl"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    W.write_parquet_snapshot(_df(spark, 0, 3), tbl)
    only_id = spark.range(3, 6).select("id").coalesce(1)
    W.write_parquet_snapshot(
        only_id, tbl, mode="append", allow_schema_evolution=True
    )
    _drain(spark, tbl, out, ckpt)
    rows = {r.id: r.v for r in spark.read.parquet(out).collect()}
    assert rows == {0: 0, 1: 2, 2: 4, 3: None, 4: None, 5: None}


def test_stream_starting_version_and_vacuum_refusal(spark, tmp_path):
    register_snapshot_stream(spark)
    tbl = str(tmp_path / "tbl")
    W.write_parquet_snapshot(_df(spark, 0, 3), tbl)
    W.write_parquet_snapshot(_df(spark, 3, 6), tbl, mode="append")
    W.write_parquet_snapshot(_df(spark, 6, 9), tbl, mode="append")

    out2, ckpt2 = str(tmp_path / "out2"), str(tmp_path / "ckpt2")
    _drain(spark, tbl, out2, ckpt2, starting_version="2")
    assert _out_ids(spark, out2) == [6, 7, 8]  # only v3's rows

    W.vacuum_parquet_snapshots(tbl, keep=1, orphan_grace_sec=0)
    q = (
        spark.readStream.format("snapshot_stream")
        .load(tbl)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out3"))
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="vacuumed"):
        q.awaitTermination(120)


def test_stream_refuses_legacy_premode_manifest(spark, tmp_path):
    """ADVICE r13: a manifest without a 'mode' key (legacy pre-mode
    tables) is an unsupported-manifest condition, not "a None rewrite" —
    the refusal names the real case, and ignore_changes must NOT skip
    it (the version could be an append whose rows would then silently
    vanish from the stream)."""
    import json
    import os

    register_snapshot_stream(spark)
    tbl = str(tmp_path / "tbl")
    W.write_parquet_snapshot(_df(spark, 0, 3), tbl)
    W.write_parquet_snapshot(_df(spark, 3, 6), tbl, mode="append")
    mpath = os.path.join(tbl, "_snapshots", "v00000002.json")
    with open(mpath) as fh:
        legacy = json.load(fh)
    del legacy["mode"]
    with open(mpath, "w") as fh:
        json.dump(legacy, fh)
    for n, opts in enumerate(({}, {"ignore_changes": "true"})):
        reader = spark.readStream.format("snapshot_stream")
        for k, val in opts.items():
            reader = reader.option(k, val)
        q = (
            reader.load(tbl)
            .writeStream.format("parquet")
            .option("path", str(tmp_path / f"out{n}"))
            .option("checkpointLocation", str(tmp_path / f"ckpt{n}"))
            .trigger(availableNow=True)
            .start()
        )
        with pytest.raises(Exception, match="mode-stamped"):
            q.awaitTermination(120)


def test_stream_schema_resolved_once_across_evolution_race(spark, tmp_path):
    """Review r14: Spark calls schema() and streamReader() separately at
    stream definition; a schema-evolution publish landing between the
    two calls must not hand the reader more columns than the declared
    stream schema (misaligned Arrow batches on the first micro-batch).
    The manifest schema is resolved once and cached on the DataSource
    instance."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.io.snapshot_source import (
        SnapshotStreamDataSource,
    )

    tbl = str(tmp_path / "tbl")
    W.write_parquet_snapshot(_df(spark, 0, 3), tbl)
    src = SnapshotStreamDataSource({"path": tbl})
    declared = src.schema()
    # an evolution publish lands between schema() and streamReader()
    W.write_parquet_snapshot(
        spark.range(3, 5).selectExpr("id", "id * 2 AS v", "id AS extra"),
        tbl, mode="append", allow_schema_evolution=True,
    )
    reader = src.streamReader(None)
    assert reader.columns == ["id", "v"], (
        "streamReader resolved a fresher manifest than schema() declared"
    )
    assert "extra" not in declared
    # a FRESH definition (new DataSource instance) sees the widened table
    assert "extra" in SnapshotStreamDataSource({"path": tbl}).schema()
