"""Custom SINK via Spark 4's Python Data Source write API.

The read side (``io/pysource.py``) covered the connector surface's scan
half; this is the other half: ``format("jsonl_dir")`` writes JSON-lines
through the full task→driver COMMIT PROTOCOL — each task writes its part
to a staging area and returns a commit message; only the DRIVER's
``commit()`` publishes the parts into a ``_SUCCESS`` manifest. Readers
that honor the manifest (``read_jsonl_manifest``) therefore see
exactly-once output: a crashed or speculative task's orphan staging file
is never listed, and an aborted job publishes nothing. That
commit-protocol shape — not the JSON encoding — is what a 100 TB sink
must get right (it is the same contract FileFormatWriter/commit
coordinators implement for parquet); the local-filesystem staging here
stands in for the shared object store a cluster deployment would use.

Reference parity note: the reference persists results as JSON-lines
directories (spark/jobs/cases_time_analysis.py:309-314) but relies on
Spark's built-in sink; this connector demonstrates the engine can expose
the same contract through the pluggable DataSource API, with the commit
semantics made explicit and testable (tests/test_io_and_ops.py).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)

MANIFEST = "_SUCCESS"
STAGING = "_staging"
SNAPSHOT_PREFIX = "_manifest-"


def _next_version(path: str) -> int:
    """Next snapshot number — exactly the ``_manifest-NNNNN.json`` names
    this module publishes; stray files sharing the prefix (a hand-dropped
    ``_manifest-notes.json``) are ignored instead of raising ValueError
    and bricking every commit (the writers.py stray-manifest fix, ADVICE
    r12, applied to this sink's version listing too)."""
    import glob as _glob
    import re as _re

    versions = [
        int(m.group(1))
        for f in _glob.glob(os.path.join(path, f"{SNAPSHOT_PREFIX}*.json"))
        if (m := _re.fullmatch(
            _re.escape(SNAPSHOT_PREFIX) + r"(\d{5,})\.json",
            os.path.basename(f),
        ))
    ]
    return (max(versions) + 1) if versions else 1


def _write_snapshot(path: str, parts: list, total: int) -> dict:
    """Publish an immutable versioned snapshot manifest, FAILING SAFE on
    a version race (ADVICE r7): the file opens with O_EXCL, so a second
    writer that computed the same number gets FileExistsError and
    retries with the next — both snapshots survive; nothing in the
    time-travel history is ever overwritten. Returns the payload
    written (with the version it finally landed on). Unit-tested
    directly against a planted collision, since the commit hook runs in
    a separate Python worker where monkeypatching can't reach."""
    version = _next_version(path)
    while True:
        snap = os.path.join(path, f"{SNAPSHOT_PREFIX}{version:05d}.json")
        payload = {"version": version, "parts": sorted(parts), "rows": total}
        try:
            with open(snap, "x") as f:
                json.dump(payload, f)
            return payload
        except FileExistsError:
            version += 1


@dataclass
class PartCommit(WriterCommitMessage):
    part: str
    rows: int


class JsonLinesWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool) -> None:
        self.path = options["path"]
        if overwrite:
            # the sink is versioned-APPEND by design: every committed job
            # adds an immutable _manifest-NNNNN.json and re-points
            # _SUCCESS; silently treating overwrite as append left prior
            # jobs' parts mixed into the directory for any non-manifest
            # reader (review r14) — refuse instead of lying
            raise ValueError(
                "jsonl_dir is a versioned-append sink (every job appends "
                "an immutable manifest version; read_jsonl_manifest "
                "follows the latest) — use mode('append'); to start "
                "fresh, write to a new directory"
            )

    def write(self, iterator) -> PartCommit:
        """Executor-side: stream rows to a uniquely named staging file.
        The file is INVISIBLE to manifest readers until the driver
        commits — a re-run of this task (speculation, retry) just leaves
        another orphan no reader will ever list."""
        staging = os.path.join(self.path, STAGING)
        os.makedirs(staging, exist_ok=True)
        part = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(staging, part), "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return PartCommit(part=part, rows=n)

    def commit(self, messages) -> None:
        """Driver-side, runs once after EVERY task succeeded: move the
        committed parts out of staging and publish the manifest — the
        single atomic-ish rename point that makes the output visible."""
        parts, total = [], 0
        for m in messages:
            os.replace(
                os.path.join(self.path, STAGING, m.part),
                os.path.join(self.path, m.part),
            )
            parts.append(m.part)
            total += m.rows
        # snapshot-versioned manifests: every committed job appends an
        # immutable _manifest-NNNNN.json (its own part list only) and
        # re-points _SUCCESS at it — so any PAST job's output remains
        # readable by version (time travel) while manifest-honoring
        # readers default to the latest. Still a single-writer design,
        # but a version-counter race FAILS SAFE via _write_snapshot's
        # O_EXCL retry; only _SUCCESS (last writer wins) is contended,
        # never the time-travel history.
        payload = _write_snapshot(self.path, parts, total)
        with open(os.path.join(self.path, MANIFEST), "w") as f:
            json.dump(payload, f)

    def abort(self, messages) -> None:
        """Driver-side on job failure: best-effort staging cleanup; the
        manifest is never written, so nothing was published. Failed
        tasks contribute ``None`` commit messages (the DataSourceWriter
        contract) — skip them or the abort itself raises and masks the
        original failure (review r14)."""
        staging = os.path.join(self.path, STAGING)
        for m in messages:
            if m is None:
                continue  # a FAILED task has no staged part to clean
            try:
                os.remove(os.path.join(staging, m.part))
            except OSError:
                pass


class JsonLinesDirDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_dir"

    def writer(self, schema, overwrite: bool) -> JsonLinesWriter:
        return JsonLinesWriter(self.options, overwrite)


def register_jsonl_sink(spark) -> None:
    spark.dataSource.register(JsonLinesDirDataSource)


def read_jsonl_manifest(spark, path: str, version: int | None = None):
    """Manifest-honoring reader: load ONLY the parts a driver committed.
    Orphan staging files (crashed/speculative tasks, aborted jobs) are
    invisible — this pairing is what makes the sink exactly-once at the
    job level. ``version=N`` reads the N-th committed job's snapshot
    (time travel over the immutable ``_manifest-NNNNN.json`` files);
    the default follows ``_SUCCESS``, the latest-snapshot pointer."""
    name = (
        MANIFEST if version is None else f"{SNAPSHOT_PREFIX}{version:05d}.json"
    )
    with open(os.path.join(path, name)) as f:
        manifest = json.load(f)
    files = [os.path.join(path, p) for p in manifest["parts"]]
    return spark.read.json(files), manifest
