"""Multimodal (binary) column plumbing (LLM-data surface).

Design: image/audio/video payloads are opaque ``binary`` columns carried
next to typed metadata columns. Decode / feature-extract run as
Arrow-batched ``mapInPandas`` — the only part of the engine where Python
touches row data, and it does so a batch at a time, never per row.

Decoders: uncompressed BMP decodes for real through the dependency-free
numpy codec in ``llmdata/imaging.py`` (so ``decode_image`` is exercised
end-to-end on true pixel data in this PIL-less container); compressed
formats (JPEG/PNG/video) remain gated behind an import-try of PIL with a
clear NotImplementedError otherwise. ``binary_stats`` / ``sample_frames``
keep the deterministic byte-level contract used by the DuckDB oracles.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as _np
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
            # a NULL payload has no bytes to describe — NULL features,
            # the decode_image_stats degenerate-input rule (review r14:
            # an unguarded len(None) killed the whole stage over one
            # bad row with no row-identifying message)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(
                        lambda b: None if b is None else len(b)
                    ).astype("Int64"),
                    "first_byte": payloads.map(
                        lambda b: None
                        if b is None
                        else (b[0] if len(b) else -1)
                    ).astype("Int64"),
                    # numpy, not a per-byte Python loop (review r15):
                    # identical exact integer arithmetic, vectorized
                    "byte_sum_mod": payloads.map(
                        lambda b: None
                        if b is None
                        else int(
                            _np.frombuffer(bytes(b), _np.uint8)
                            .sum(dtype=_np.int64)
                        ) % 997
                    ).astype("Int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(extract, BINARY_STATS_SCHEMA)


IMAGE_FEATURES_SCHEMA = (
    "doc_id bigint, height int, width int, mean_pixel double, std_pixel double"
)


def decode_image(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """REAL image decode + stats over a binary payload column — the
    reference computed these with per-row Python UDFs over image.data
    (spark/jobs/radiography_analysis.py:127-131); here it's one
    Arrow-batched mapInPandas.

    Decoder resolution per payload: uncompressed 24/32-bit BMPs decode via
    the dependency-free numpy codec (``llmdata/imaging.py`` — real pixel
    geometry, padding, channel handling); other formats (JPEG/PNG/…) fall
    through to PIL when importable, else raise with a clear message. So in
    this container the BMP path is fully real and tested; only the
    compressed-format path needs an imaging library."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pyspark_bigdata_sars_cov_2_analysis_spark.llmdata.imaging import (
            decode_bmp,
        )

        try:
            from PIL import Image  # type: ignore

            import io as _io

            def _pil_decode(b: bytes) -> np.ndarray:
                return np.asarray(Image.open(_io.BytesIO(b)).convert("RGB"))

        except ImportError:
            def _pil_decode(b: bytes) -> np.ndarray:
                raise NotImplementedError(
                    "non-BMP image decoding requires PIL — not available in "
                    "this container; encode test images as uncompressed BMP "
                    "(llmdata.imaging.encode_bmp) or install pillow"
                )

        def _decode(b) -> np.ndarray | None:
            if b is None:
                return None  # NULL payload -> NULL features (review r14)
            if b[:2] == b"BM":
                return decode_bmp(b)
            return _pil_decode(b)

        def _features(b):
            # ONE pass per row, scalars out (review r15): the old form
            # held every decoded image in the batch as float64 — 8x the
            # pixel bytes x 10k-row Arrow batches — before computing
            # anything; per-row reduce keeps exactly one image resident
            # and the arithmetic identical (same float64 mean/std)
            a = _decode(b)
            if a is None:
                return (None, None, None, None)
            f = a.astype(np.float64)
            return (
                a.shape[0], a.shape[1], float(f.mean()), float(f.std())
            )

        for pdf in batches:
            feats = [_features(b) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "height": pd.Series(
                        [t[0] for t in feats], dtype="Int32"
                    ),
                    "width": pd.Series(
                        [t[1] for t in feats], dtype="Int32"
                    ),
                    "mean_pixel": pd.Series(
                        [t[2] for t in feats], dtype="float64"
                    ),
                    "std_pixel": pd.Series(
                        [t[3] for t in feats], dtype="float64"
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(extract, IMAGE_FEATURES_SCHEMA)


def decode_image_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    width: int = 32,
) -> DataFrame:
    """Deterministic fake image decode: payload bytes are 8-bit grayscale
    pixels in row-major order at fixed ``width``. Exercises the REAL
    decode plumbing (Arrow batch in, typed feature frame out, multi-column
    passthrough) with a decoder every engine can replicate; swap the body
    for PIL in a real deployment (decode_image stays the lib-gated stub).

    Variance uses the integer-sum formula (sum_sq - sum*sum/n)/n so both
    engines perform the identical float ops on exact integer inputs."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        from pyspark_bigdata_sars_cov_2_analysis_spark.functions.compat import pyround

        for pdf in batches:
            payloads = pdf[payload_col]
            # NULL payload -> NaN through the float arithmetic below ->
            # the same NULL-stats branch as the zero-length case
            # (review r14); float64 so None rides as NaN instead of
            # raising in the object-series arithmetic
            ns = payloads.map(
                lambda b: len(b) if b is not None else None
            ).astype("float64")
            # numpy int64 sums, not per-byte Python loops (review
            # r15): bit-identical exact integer arithmetic (uint8
            # values, far from int64 overflow at any payload size this
            # schema admits), orders of magnitude faster at scale
            def _sums(b):
                if b is None:
                    return (None, None)
                a = _np.frombuffer(bytes(b), _np.uint8).astype(_np.int64)
                return (int(a.sum()), int((a * a).sum()))

            pair = payloads.map(_sums)
            sums = pair.map(lambda t: t[0]).astype("float64")
            sqs = pair.map(lambda t: t[1]).astype("float64")
            # a zero-length payload has no pixels: 0/0 -> NaN here, and
            # unguarded pyround would raise (math.floor(NaN)) and kill
            # the whole stage — emit NULL stats instead, the same
            # degenerate-input rule as binary_stats (review r9)
            mean = sums / ns
            var = (sqs - sums * sums / ns) / ns
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "height": ((ns + width - 1) // width).astype("Int32"),
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "mean_pixel": mean.map(
                        lambda v: None if pd.isna(v) else pyround(v, 4)
                    ),
                    "std_pixel": var.map(
                        lambda v: None if pd.isna(v) else pyround(
                            math.sqrt(v) if v > 0 else 0.0, 4
                        )
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        extract, IMAGE_FEATURES_SCHEMA
    )


def encode_text_as_bmp(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 16,
) -> DataFrame:
    """(id, payload): deterministic REAL images — each document's UTF-8
    bytes, truncated to a multiple of ``width``, become a (h, ``width``)
    grayscale image encoded as a true 24-bit BMP. Gives the real
    encode→decode pixel path an engine-replicable corpus (the decoded
    pixel population is exactly the truncated byte sequence, each byte
    appearing in all 3 channels). Docs shorter than ``width`` bytes are
    dropped (zero-height images don't exist)."""
    import numpy as np

    from pyspark_bigdata_sars_cov_2_analysis_spark.llmdata.imaging import (
        encode_bmp,
    )

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # a NULL text encodes nothing — dropped with the too-short
            # docs instead of crashing the stage (review r14)
            raw = pdf[text_col].map(
                lambda t: b"" if t is None else t.encode("utf-8")
            )
            keep = raw.map(len) >= width
            payloads = raw[keep].map(
                lambda b: encode_bmp(
                    np.frombuffer(b[: (len(b) // width) * width], dtype=np.uint8)
                    .reshape(-1, width)
                )
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col][keep].astype("int64"),
                    "payload": payloads,
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        enc, "doc_id bigint, payload binary"
    )


FRAME_SAMPLE_SCHEMA = "doc_id bigint, frame_idx bigint, frame_sum bigint"


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_bytes: int = 16,
    every: int = 4,
) -> DataFrame:
    """Deterministic fake video frame sampling: payload is a byte stream of
    fixed-size frames; emit every ``every``-th frame's index and byte sum
    (the stand-in for a decoded keyframe). One input row fans out to many
    output rows through the same mapInPandas plumbing a real ffmpeg
    sampler would use."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue  # NULL payload: no frames (review r14)
                n = len(payload)
                for i in range(0, (n + frame_bytes - 1) // frame_bytes, every):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    sums.append(sum(payload[i * frame_bytes : (i + 1) * frame_bytes]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        extract, FRAME_SAMPLE_SCHEMA
    )


RESIZE_SCHEMA = "doc_id bigint, out_h int, out_w int, pix_sum bigint"


def resize_image_nn(
    df: DataFrame,
    out_h: int = 4,
    out_w: int = 4,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Nearest-neighbor image RESIZE over real encoded bytes — the
    thumbnail/downsample step of a multimodal ingest (the prompt-side
    'resize' in decode → feature-extract → resize → frame-sample): each
    BMP payload decodes, samples pixel (⌊r·h/out_h⌋, ⌊c·w/out_w⌋) for
    every target cell (pure integer index math — the one resize kernel
    whose output is exactly engine-replicable, unlike interpolating
    kernels whose fp weights differ per library), and emits the resized
    grid's checksum. Arrow-batched mapInPandas with vectorized numpy
    fancy-indexing per image; binary payloads never leave the executor.
    At 100 TB this is the shape real thumbnailing runs in — swap the
    NN kernel for a library call and nothing else moves."""
    import numpy as np

    from pyspark_bigdata_sars_cov_2_analysis_spark.llmdata.imaging import (
        decode_bmp,
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sums = [], []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue  # NULL payload: no thumbnail (review r14)
                try:
                    arr = decode_bmp(bytes(payload))  # (h, w, 3) uint8
                except ValueError:
                    # empty/non-BMP payload: no thumbnail, same rule as
                    # NULL (review r15: one corrupt row used to kill
                    # the whole stage with no row-identifying message)
                    continue
                h, w = arr.shape[0], arr.shape[1]
                ri = (np.arange(out_h) * h) // out_h
                ci = (np.arange(out_w) * w) // out_w
                resized = arr[np.ix_(ri, ci)][:, :, 0]  # channels identical
                ids.append(int(did))
                sums.append(int(resized.astype(np.int64).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "out_h": out_h,
                    "out_w": out_w,
                    "pix_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(extract, RESIZE_SCHEMA)
