"""Multimodal (binary) column plumbing (LLM-data surface).

Design: image/audio/video payloads are opaque ``binary`` columns carried
next to typed metadata columns. Decode / feature-extract run as
Arrow-batched ``mapInPandas`` — the only part of the engine where Python
touches row data, and it does so a batch at a time, never per row.

The actual media decoders (PIL/ffmpeg/etc.) are NOT in this container, so
``decode_image`` is a clearly-marked stub (NotImplementedError); the
Spark-side plumbing — schema declaration, batch iteration, column
passthrough — is real and tested via ``binary_stats`` which computes
deterministic byte-level features through the exact same path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BINARY_STATS_SCHEMA = "doc_id bigint, n_bytes bigint, first_byte bigint, byte_sum_mod bigint"


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Turn a text column into an opaque binary payload column — the test
    stand-in for real image/audio bytes (container has no media libs)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def binary_stats(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Deterministic byte-level feature extraction via mapInPandas — the
    real Arrow-batched plumbing a decoder would use. Features: byte length,
    first byte, sum(bytes) mod 997."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int64"),
                    "byte_sum_mod": payloads.map(
                        lambda b: sum(b) % 997
                    ).astype("int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(extract, BINARY_STATS_SCHEMA)


IMAGE_FEATURES_SCHEMA = (
    "doc_id bigint, height int, width int, mean_pixel double, std_pixel double"
)


def decode_image(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Image decode + stats — the reference computed these with per-row
    Python UDFs over image.data (spark/jobs/radiography_analysis.py:127-131).
    STUB: no imaging library in this container. The plumbing (schema, batch
    shape) matches ``binary_stats``; swap ``_decode`` for PIL/turbojpeg in a
    real deployment.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def _decode(_: bytes):
            raise NotImplementedError(
                "image decoding requires PIL/libjpeg — not available in this "
                "container; use binary_stats for the tested byte-level path"
            )

        for pdf in batches:
            _decode(b"")
            yield pd.DataFrame()  # pragma: no cover

    return df.select(id_col, payload_col).mapInPandas(extract, IMAGE_FEATURES_SCHEMA)
