"""Custom connector via Spark 4's Python Data Source API.

A deterministic synthetic-documents source (``format("synthetic_docs")``)
mirroring the ``documents`` table schema. Rows are generated per
partition, lazily, from a seeded PRNG keyed on (seed, doc_id) — so the
corpus at any size is reproducible row-for-row without ever materializing
it, across any partition count (the id→partition assignment never affects
a row's content). That makes it the scale-dial for dedup/similarity
benchmarks: ``spark.read.format("synthetic_docs").option("n", 10**9)``
is a billion-doc corpus with a known duplicate structure and zero bytes
at rest.

``dup_every=k`` (k >= 2) plants exact duplicates with known ground truth:
every doc_id divisible by k copies the text of doc_id+1, so downstream
exact-dedup must find exactly ``len(range(0, n - 1, k))`` two-copy
duplicate groups (one per multiple of k whose neighbor exists; the copy
of an out-of-range neighbor is just a unique text) — end-to-end
validation of a dedup pipeline against a corpus whose true duplicate
count is known by construction, which no sampled real corpus gives you.
``k == 1`` is rejected: every doc copying its neighbor degenerates into a
chain of all-distinct texts.

``hot_every=h`` (h >= 1) plants a SKEWED shingle: every doc whose BASE
id (the id whose text it carries — so planted duplicate pairs stay
byte-identical under any knob combination) is divisible by h gets the
fixed phrase "the of and" prepended (words outside the vocabulary, so
exactly one fully-hot 3-shingle), giving that shingle a document
frequency of ~n/h — the hot-key regime where naive
inverted-index candidate generation expands ~(n/h)²/2 pairs and a
prefix-filtered variant must win. This is the ground-truth corpus for
the jaccard auto-dispatch skew probe (README scale-probe table).

The STREAMING side (``simpleStreamReader``) turns the same deterministic
generator into a micro-batch source: offsets are plain doc_id cursors,
``read`` advances ``batch_size`` ids per trigger, and replay
(``readBetweenOffsets``) regenerates the identical rows from the seed —
a custom source whose exactly-once story is by CONSTRUCTION (the
re-read of any offset range is bit-identical), tested by comparing a
streamed availableNow drain against the batch read of the same corpus.
"""

from __future__ import annotations

import random

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SYNTH_DOCS_SCHEMA = "doc_id bigint, text string, lang string, n_chars bigint"

_LANGS = ["en", "de", "fr", "es", "zh"]
_VOCAB = [
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "merge", "batch", "spark", "line", "sort", "window", "join",
    "shuffle", "plan", "filter", "broadcast", "skew", "bucket", "codec",
    "stream", "state", "token", "corpus", "vector", "index", "probe", "cell",
]


def _doc_text(seed: int, base_id: int, doc_len: int) -> str:
    rng = random.Random(f"{seed}:{base_id}")
    return " ".join(rng.choice(_VOCAB) for _ in range(doc_len))


def _validate_dup_every(dup_every: int) -> int:
    """Shared by the batch AND streaming readers (review r14: the
    stream accepted the degenerate corpus the batch reader refuses, so
    a streamed-vs-batch comparison of "the same corpus" diverged —
    batch raised, stream yielded zero planted duplicates)."""
    if dup_every == 1:
        raise ValueError(
            "dup_every=1 makes every doc copy its neighbor — a chain of "
            "all-distinct texts, no duplicates; use dup_every >= 2"
        )
    return dup_every


def _doc_row(
    seed: int, doc_id: int, doc_len: int, dup_every: int, hot_every: int
) -> tuple:
    """One deterministic row — shared by the batch and streaming readers
    so the two surfaces emit byte-identical corpora. The hot prefix is
    keyed on the BASE id (review r14): keying it on doc_id broke the
    dup_every ground truth whenever both knobs were set — a planted
    pair where exactly one id was divisible by hot_every got the prefix
    on one side only, so the copies were no longer exact duplicates and
    the documented two-copy-group count undercounted."""
    base = doc_id
    if dup_every and doc_id % dup_every == 0:
        base = doc_id + 1  # planted exact duplicate of a neighbor
    text = _doc_text(seed, base, doc_len)
    if hot_every and base % hot_every == 0:
        text = "the of and " + text
    lang = _LANGS[random.Random(f"{seed}:lang:{doc_id}").randrange(len(_LANGS))]
    return (doc_id, text, lang, len(text))


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 8))
        self.doc_len = int(options.get("doc_len", 30))
        self.dup_every = _validate_dup_every(int(options.get("dup_every", 0)))
        self.hot_every = int(options.get("hot_every", 0))
        self.seed = int(options.get("seed", 7))
        # id range after filter pushdown; [0, n) until pushFilters narrows
        self.lo = 0
        self.hi = self.n

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition: InputPartition):
        # round-robin id assignment: content depends only on doc_id, so
        # changing `parts` re-slices the same corpus and a narrowed
        # [lo, hi) bound re-slices a contiguous window of it
        p = partition.value
        if self.lo >= self.hi:
            return
        start = self.lo + ((p - self.lo) % self.parts)
        for doc_id in range(start, self.hi, self.parts):
            yield _doc_row(
                self.seed, doc_id, self.doc_len, self.dup_every, self.hot_every
            )


class SyntheticDocsPushdownReader(SyntheticDocsReader):
    """The pushdown-capable variant, selected by ``option("pushdown",
    "true")``. Separate class because Spark REFUSES any reader that
    merely DEFINES pushFilters while
    ``spark.sql.python.filterPushdown.enabled`` is false (the session
    default) — folding this into the base reader would break every
    vanilla-session consumer. Callers opting in must set that conf AND
    the option (tests pin the coupling)."""

    def pushFilters(self, filters):
        """Spark 4.1 Python DSv2 filter pushdown: range predicates on
        ``doc_id`` narrow the GENERATION range — the connector-side twin
        of parquet row-group pruning. A handled filter is NOT re-applied
        by Spark, so handling must be exact: only conjunctive int-valued
        range/equality comparisons on the top-level doc_id column are
        claimed; everything else is yielded back for Spark to apply.
        Content depends only on doc_id (module invariant), so narrowing
        the range preserves every surviving row bit-identically —
        ``WHERE doc_id >= 10**9 - 1000`` on a billion-doc corpus
        generates 1000 rows instead of 10**9."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            attr = getattr(f, "attribute", None)
            value = getattr(f, "value", None)
            if (
                attr != ("doc_id",)
                or not isinstance(value, int)
                # bool is an int subclass: EqualTo(('doc_id',), True)
                # must be yielded back, not narrowed to [1, 2) (ADVICE
                # r9 — claiming it as handled would silently drop rows)
                or isinstance(value, bool)
            ):
                yield f
            elif isinstance(f, EqualTo):
                self.lo = max(self.lo, value)
                self.hi = min(self.hi, value + 1)
            elif isinstance(f, GreaterThan):
                self.lo = max(self.lo, value + 1)
            elif isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, value)
            elif isinstance(f, LessThan):
                self.hi = min(self.hi, value)
            elif isinstance(f, LessThanOrEqual):
                self.hi = min(self.hi, value + 1)
            else:
                yield f


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader over the same deterministic corpus: the offset
    is a doc_id cursor, each trigger advances ``batch_size`` ids, and
    any offset range replays bit-identically from the seed — the
    exactly-once property most sources need a write-ahead log for, here
    free by determinism. ``n`` bounds the stream (an availableNow drain
    terminates); omit thinking of it as a file list — there are no
    bytes at rest at any scale."""

    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", 1000))
        self.doc_len = int(options.get("doc_len", 30))
        self.dup_every = _validate_dup_every(int(options.get("dup_every", 0)))
        self.hot_every = int(options.get("hot_every", 0))
        self.seed = int(options.get("seed", 7))
        self.batch_size = int(options.get("batch_size", 100))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + self.batch_size, self.n)
        return (self._rows(lo, hi), {"next": hi})

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["next"], end["next"])

    def _rows(self, lo: int, hi: int):
        return iter(
            [
                _doc_row(
                    self.seed, i, self.doc_len, self.dup_every, self.hot_every
                )
                for i in range(lo, hi)
            ]
        )


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return SYNTH_DOCS_SCHEMA

    def reader(self, schema) -> SyntheticDocsReader:
        if str(self.options.get("pushdown", "")).lower() == "true":
            return SyntheticDocsPushdownReader(self.options)
        return SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema) -> SyntheticDocsStreamReader:
        return SyntheticDocsStreamReader(self.options)


def register_synthetic_docs(spark) -> None:
    """Idempotent format registration: after this,
    ``spark.read.format("synthetic_docs")`` works session-wide."""
    spark.dataSource.register(SyntheticDocsDataSource)
