"""Python Data Source WRITE path (the sink half of the connector
surface): commit-protocol semantics of ``format("jsonl_dir")``."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from pyspark_bigdata_sars_cov_2_analysis_spark.io.jsonl_sink import (
    MANIFEST,
    STAGING,
    read_jsonl_manifest,
    register_jsonl_sink,
)


def test_jsonl_sink_commit_publishes_manifest(spark, tmp_path):
    """Happy path: every task's part is staged, the driver commit moves
    them out and publishes the manifest, and the manifest reader returns
    exactly the written rows."""
    register_jsonl_sink(spark)
    out = str(tmp_path / "sink")
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") * 3).alias("tripled")
    ).repartition(4)
    df.write.format("jsonl_dir").mode("append").save(out)

    back, manifest = read_jsonl_manifest(spark, out)
    assert manifest["rows"] == 1000
    assert len(manifest["parts"]) == 4
    assert back.count() == 1000
    got = sorted((r.id, r.tripled) for r in back.collect())
    assert got == [(i, 3 * i) for i in range(1000)]
    # staging is drained — nothing invisible left behind
    assert os.listdir(os.path.join(out, STAGING)) == []


def test_jsonl_sink_manifest_reader_ignores_orphans(spark, tmp_path):
    """An orphan staging file (crashed or speculative task) must be
    invisible to the manifest reader — the exactly-once property the
    commit protocol exists for."""
    register_jsonl_sink(spark)
    out = str(tmp_path / "sink")
    spark.range(10).write.format("jsonl_dir").mode("append").save(out)
    # plant an orphan: a task that wrote but never reached the commit
    with open(os.path.join(out, STAGING, "part-orphan.jsonl"), "w") as f:
        f.write(json.dumps({"id": 999999}) + "\n")
    back, manifest = read_jsonl_manifest(spark, out)
    assert manifest["rows"] == 10 and back.count() == 10
    assert 999999 not in {r.id for r in back.collect()}


def test_jsonl_sink_failed_job_publishes_nothing(spark, tmp_path):
    """A job that fails mid-write must publish NO manifest — readers see
    an absent output, never a partial one."""
    register_jsonl_sink(spark)
    out = str(tmp_path / "sink")

    @F.udf("bigint")
    def boom(x):
        if x == 7:
            raise ValueError("planted task failure")
        return x

    df = spark.range(16).select(boom(F.col("id")).alias("id")).repartition(4)
    with pytest.raises(Exception):
        df.write.format("jsonl_dir").mode("append").save(out)
    assert not os.path.exists(os.path.join(out, MANIFEST))
    with pytest.raises(FileNotFoundError):
        read_jsonl_manifest(spark, out)


def test_snapshot_versions_time_travel(spark, tmp_path):
    """Every committed job appends an immutable snapshot manifest and
    re-points _SUCCESS: the latest read sees only the newest job's
    parts, any past version stays readable (time travel), and the two
    snapshots never share parts."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.io.jsonl_sink import (
        read_jsonl_manifest,
        register_jsonl_sink,
    )

    register_jsonl_sink(spark)
    out = str(tmp_path / "versioned")
    spark.range(0, 5).selectExpr("id", "'gen1' AS tag").write.format(
        "jsonl_dir"
    ).option("path", out).mode("append").save()
    spark.range(100, 103).selectExpr("id", "'gen2' AS tag").write.format(
        "jsonl_dir"
    ).option("path", out).mode("append").save()

    latest, m_latest = read_jsonl_manifest(spark, out)
    assert m_latest["version"] == 2 and m_latest["rows"] == 3
    assert sorted(r.id for r in latest.collect()) == [100, 101, 102]

    v1, m1 = read_jsonl_manifest(spark, out, version=1)
    assert m1["version"] == 1 and m1["rows"] == 5
    assert sorted(r.id for r in v1.collect()) == [0, 1, 2, 3, 4]
    assert not set(m1["parts"]) & set(m_latest["parts"])


def test_snapshot_versions_ignore_stray_manifest_names(spark, tmp_path):
    """ADVICE r12 (writers.py stray-manifest class, applied here too): a
    stray file sharing the snapshot prefix must not brick the sink's
    version computation — only _manifest-NNNNN.json names count."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.io.jsonl_sink import (
        read_jsonl_manifest,
        register_jsonl_sink,
    )

    register_jsonl_sink(spark)
    out = str(tmp_path / "versioned")
    spark.range(0, 3).selectExpr("id").write.format("jsonl_dir").option(
        "path", out
    ).mode("append").save()
    for stray in ("_manifest-notes.json", "_manifest-00001.json.bak"):
        with open(os.path.join(out, stray), "w") as fh:
            fh.write("not a manifest")
    spark.range(3, 5).selectExpr("id").write.format("jsonl_dir").option(
        "path", out
    ).mode("append").save()
    latest, m = read_jsonl_manifest(spark, out)
    assert m["version"] == 2 and m["rows"] == 2
    assert sorted(r.id for r in latest.collect()) == [3, 4]


def test_abort_skips_failed_task_none_messages(tmp_path):
    """Review r14: per the DataSourceWriter contract a FAILED task's
    commit message arrives as None — abort must skip it (it has no
    staged part) and still clean the successful tasks' staging files,
    instead of raising AttributeError and masking the real failure."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.io.jsonl_sink import (
        STAGING,
        JsonLinesWriter,
        PartCommit,
    )

    out = str(tmp_path / "sink")
    staging = os.path.join(out, STAGING)
    os.makedirs(staging)
    part = "part-deadbeef.jsonl"
    with open(os.path.join(staging, part), "w") as fh:
        fh.write('{"id": 1}\n')
    w = JsonLinesWriter({"path": out}, overwrite=False)
    w.abort([None, PartCommit(part=part, rows=1), None])
    assert not os.path.exists(os.path.join(staging, part)), (
        "successful task's staged part survived abort"
    )


def test_overwrite_mode_refused_as_versioned_append(spark, tmp_path):
    """Review r14: mode('overwrite') silently behaved as append — prior
    jobs' parts stayed mixed into the directory for any non-manifest
    reader. The sink is versioned-append by design; overwrite refuses
    by name."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.io.jsonl_sink import (
        register_jsonl_sink,
    )

    register_jsonl_sink(spark)
    out = str(tmp_path / "ow")
    with pytest.raises(Exception, match="versioned-append"):
        spark.range(3).write.format("jsonl_dir").option("path", out).mode(
            "overwrite"
        ).save()
