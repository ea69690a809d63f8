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

``hot_every=h`` (h >= 1) plants a SKEWED shingle: every doc_id divisible
by h gets the fixed phrase "the of and" prepended (words outside the
vocabulary, so exactly one fully-hot 3-shingle), giving that shingle a
document frequency of ~n/h — the hot-key regime where naive
inverted-index candidate generation expands ~(n/h)²/2 pairs and a
prefix-filtered variant must win. This is the ground-truth corpus for
the jaccard auto-dispatch skew probe (README scale-probe table).

Batch-only (DataSourceReader); the events stream already covers the
streaming-source surface.
"""

from __future__ import annotations

import random

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 8))
        self.doc_len = int(options.get("doc_len", 30))
        self.dup_every = int(options.get("dup_every", 0))
        if self.dup_every == 1:
            raise ValueError(
                "dup_every=1 makes every doc copy its neighbor — a chain of "
                "all-distinct texts, no duplicates; use dup_every >= 2"
            )
        self.hot_every = int(options.get("hot_every", 0))
        self.seed = int(options.get("seed", 7))

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition: InputPartition):
        # round-robin id assignment: content depends only on doc_id, so
        # changing `parts` re-slices the same corpus
        for doc_id in range(partition.value, self.n, self.parts):
            base = doc_id
            if self.dup_every and doc_id % self.dup_every == 0:
                base = doc_id + 1  # planted exact duplicate of a neighbor
            text = _doc_text(self.seed, base, self.doc_len)
            if self.hot_every and doc_id % self.hot_every == 0:
                text = "the of and " + text
            lang = _LANGS[
                random.Random(f"{self.seed}:lang:{doc_id}").randrange(len(_LANGS))
            ]
            yield (doc_id, text, lang, len(text))


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return SYNTH_DOCS_SCHEMA

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)


def register_synthetic_docs(spark) -> None:
    """Idempotent format registration: after this,
    ``spark.read.format("synthetic_docs")`` works session-wide."""
    spark.dataSource.register(SyntheticDocsDataSource)
