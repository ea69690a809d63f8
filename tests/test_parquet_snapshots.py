"""Snapshot-versioned parquet tables (r10) — MVCC manifests closing the
documented concurrent-reader gap of the staged-swap maintenance ops.

Pins: version monotonicity, overwrite vs manifest-level append (appends
never rewrite existing bytes), time travel, reader isolation from a
concurrent publish, crashed-writer invisibility, version-claim races
failing safe, and vacuum (referenced files survive, orphans and dropped
versions go).
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import pytest

from pyspark_bigdata_sars_cov_2_analysis_spark.io import writers as W


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 2 AS v")


def test_snapshot_write_read_time_travel(spark, tmp_path):
    path = str(tmp_path / "tbl")
    v1 = W.write_parquet_snapshot(_df(spark, 0, 10), path)
    v2 = W.write_parquet_snapshot(_df(spark, 100, 105), path)  # overwrite
    assert (v1, v2) == (1, 2)
    latest = W.read_parquet_snapshot(spark, path)
    assert sorted(r.id for r in latest.collect()) == list(range(100, 105))
    old = W.read_parquet_snapshot(spark, path, version=1)
    assert sorted(r.id for r in old.collect()) == list(range(10))
    snaps = W.list_parquet_snapshots(path)
    assert [s["version"] for s in snaps] == [1, 2]
    assert snaps[0]["rows"] == 10 and snaps[1]["rows"] == 5
    with pytest.raises(ValueError, match="v7 not found"):
        W.read_parquet_snapshot(spark, path, version=7)


def test_snapshot_append_is_manifest_level(spark, tmp_path):
    path = str(tmp_path / "tbl")
    W.write_parquet_snapshot(_df(spark, 0, 10), path)
    files_v1 = set(W.list_parquet_snapshots(path)[-1]["files"])
    mtimes = {
        f: os.path.getmtime(f.removeprefix("file:")) for f in files_v1
    }
    v2 = W.write_parquet_snapshot(_df(spark, 10, 15), path, mode="append")
    assert v2 == 2
    snap2 = W.list_parquet_snapshots(path)[-1]
    # the append SHARES v1's files forward and rewrites none of them
    assert files_v1 < set(snap2["files"])
    for f, m in mtimes.items():
        assert os.path.getmtime(f.removeprefix("file:")) == m
    assert snap2["rows"] == 15
    got = sorted(
        r.id for r in W.read_parquet_snapshot(spark, path).collect()
    )
    assert got == list(range(15))
    # v1 unchanged under time travel
    assert sorted(
        r.id
        for r in W.read_parquet_snapshot(spark, path, version=1).collect()
    ) == list(range(10))


def test_snapshot_reader_isolated_from_concurrent_publish(spark, tmp_path):
    """A reader that resolved version N keeps scanning N's immutable
    files even while version N+1 publishes — the exact window the
    staged swap cannot protect."""
    path = str(tmp_path / "tbl")
    W.write_parquet_snapshot(_df(spark, 0, 10), path)
    reader = W.read_parquet_snapshot(spark, path)  # resolves v1's files
    W.write_parquet_snapshot(_df(spark, 500, 503), path)  # v2 overwrite
    assert sorted(r.id for r in reader.collect()) == list(range(10))


def test_snapshot_crashed_writer_invisible_and_vacuumed(spark, tmp_path):
    path = str(tmp_path / "tbl")
    W.write_parquet_snapshot(_df(spark, 0, 10), path)
    # simulate a writer that crashed after its data write, before its
    # manifest publish: a data dir no manifest references
    orphan = os.path.join(path, "data", "v00000099-deadbeef")
    _df(spark, 900, 905).write.parquet(orphan)
    assert sorted(
        r.id for r in W.read_parquet_snapshot(spark, path).collect()
    ) == list(range(10))
    # within the grace window the dir is treated as a possibly
    # IN-FLIGHT writer's data and left alone (review r10)
    safe = W.vacuum_parquet_snapshots(path, keep=1)
    assert "v00000099-deadbeef" not in safe["removed_orphan_dirs"]
    assert os.path.exists(orphan)
    stats = W.vacuum_parquet_snapshots(path, keep=1, orphan_grace_sec=0)
    assert "v00000099-deadbeef" in stats["removed_orphan_dirs"]
    assert not os.path.exists(orphan)
    assert sorted(
        r.id for r in W.read_parquet_snapshot(spark, path).collect()
    ) == list(range(10))


def test_snapshot_version_race_fails_safe(spark, tmp_path):
    """A concurrent writer claiming the next version first must push
    this writer to the following version — and an APPEND that lost the
    race re-reads the new latest, so the winner's rows are never
    dropped from the union."""
    path = str(tmp_path / "tbl")
    W.write_parquet_snapshot(_df(spark, 0, 10), path)
    # simulate the interleaved winner: plant a valid v2 manifest that
    # adds nothing (a copy of v1's) — exactly what list_parquet_snapshots
    # will see when our append goes to publish
    snapdir = os.path.join(path, W._SNAP_DIR)
    with open(os.path.join(snapdir, "v00000001.json")) as fh:
        v1 = json.load(fh)
    v2 = dict(v1, version=2)
    with open(os.path.join(snapdir, "v00000002.json"), "w") as fh:
        json.dump(v2, fh)
    got = W.write_parquet_snapshot(_df(spark, 10, 12), path, mode="append")
    assert got == 3
    snap3 = W.list_parquet_snapshots(path)[-1]
    assert set(v2["files"]) < set(snap3["files"])
    assert sorted(
        r.id for r in W.read_parquet_snapshot(spark, path).collect()
    ) == list(range(12))


def test_snapshot_vacuum_drops_old_unshared_keeps_shared(spark, tmp_path):
    path = str(tmp_path / "tbl")
    W.write_parquet_snapshot(_df(spark, 0, 10), path)          # v1
    W.write_parquet_snapshot(_df(spark, 10, 15), path, "append")  # v2
    W.write_parquet_snapshot(_df(spark, 700, 702), path)       # v3 overwrite
    stats = W.vacuum_parquet_snapshots(path, keep=1)
    assert stats["dropped_versions"] == [1, 2]
    # v1/v2's files are unreferenced by v3 -> physically gone
    assert stats["removed_files"] > 0
    assert [s["version"] for s in W.list_parquet_snapshots(path)] == [3]
    assert sorted(
        r.id for r in W.read_parquet_snapshot(spark, path).collect()
    ) == [700, 701]
    with pytest.raises(ValueError, match="not found"):
        W.read_parquet_snapshot(spark, path, version=1)
    # shared-forward case: append then vacuum keep=1 — the shared v-old
    # files must SURVIVE because the kept version references them
    path2 = str(tmp_path / "tbl2")
    W.write_parquet_snapshot(_df(spark, 0, 10), path2)
    W.write_parquet_snapshot(_df(spark, 10, 15), path2, "append")
    W.vacuum_parquet_snapshots(path2, keep=1)
    assert sorted(
        r.id for r in W.read_parquet_snapshot(spark, path2).collect()
    ) == list(range(15))


def test_streaming_snapshot_sink_exactly_once_publish(spark, tmp_path):
    """The streaming sink must publish ONE version per micro-batch
    (manifest stamped with the batch id), re-process nothing on a
    checkpointed restart, and treat a replayed (batch_df, batch_id) —
    the foreachBatch mid-batch-crash shape — as a no-op."""
    import time as _time

    src = str(tmp_path / "src")
    os.makedirs(src)
    _df(spark, 0, 5).coalesce(1).write.mode("append").parquet(src)
    _time.sleep(0.2)  # distinct modTimes -> deterministic file order
    _df(spark, 5, 8).coalesce(1).write.mode("append").parquet(src)

    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = W.streaming_snapshot_sink(
            spark.readStream.schema("id long, v long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            tbl,
            ckpt,
        ).start()
        q.awaitTermination(120)

    drain()
    snaps = W.list_parquet_snapshots(tbl)
    assert [s["version"] for s in snaps] == [1, 2]
    assert [s["src_batch"] for s in snaps] == [0, 1]
    got = sorted(r.id for r in W.read_parquet_snapshot(spark, tbl).collect())
    assert got == list(range(8))
    # time travel to the first batch's table state
    assert sorted(
        r.id for r in W.read_parquet_snapshot(spark, tbl, version=1).collect()
    ) == list(range(5))

    # restart over the same checkpoint: nothing re-processed
    drain()
    assert [s["version"] for s in W.list_parquet_snapshots(tbl)] == [1, 2]

    # a replayed batch (same id) is a publish no-op even without the
    # stream checkpoint's help
    assert W.snapshot_publish_batch(_df(spark, 0, 5), 0, tbl) is False
    assert [s["version"] for s in W.list_parquet_snapshots(tbl)] == [1, 2]
    # a genuinely new batch id still publishes
    assert W.snapshot_publish_batch(_df(spark, 8, 9), 7, tbl) is True
    assert sorted(
        r.id for r in W.read_parquet_snapshot(spark, tbl).collect()
    ) == list(range(9))


def test_snapshot_stale_manifest_tmp_is_invisible(spark, tmp_path):
    """Review r10: manifests publish via stage-then-link, so a crashed
    publisher leaves only a uniquely-named .tmp — which every reader
    and lister must ignore (the old O_EXCL-then-write path could leave
    an EMPTY v<N>.json that poisoned the whole table)."""
    path = str(tmp_path / "tbl")
    W.write_parquet_snapshot(_df(spark, 0, 5), path)
    snapdir = os.path.join(path, W._SNAP_DIR)
    with open(os.path.join(snapdir, "v00000002.json.123.dead.tmp"), "w"):
        pass  # a crashed publisher's torn stage (empty)
    assert [s["version"] for s in W.list_parquet_snapshots(path)] == [1]
    assert sorted(
        r.id for r in W.read_parquet_snapshot(spark, path).collect()
    ) == list(range(5))
    # and the next publish proceeds normally past the stale tmp
    assert W.write_parquet_snapshot(_df(spark, 5, 7), path, "append") == 2
