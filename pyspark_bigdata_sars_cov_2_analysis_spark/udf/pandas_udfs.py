"""Arrow-batched pandas-UDF surface (SURVEY.md §2.9 D7).

``batch_inference_udf`` mirrors the reference's SCALAR_ITER Keras
inference UDF (``predict_batch_udf``,
spark/jobs/radiography_analysis.py:306-326): the model is loaded ONCE per
Python worker (outside the batch loop), then applied per Arrow batch. Here
the "model" is a deterministic stand-in (sigmoid of the embedding mean) —
the container has no DL frameworks — but the loading/batching shape is the
real one; swap ``_load_model`` for a Keras/torch call in deployment.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def _load_model():
    """Stand-in for an expensive model load (per-worker, once)."""

    def predict(batch: np.ndarray) -> np.ndarray:
        # sigmoid over the feature mean — deterministic fake inference
        m = batch.mean(axis=1)
        return 1.0 / (1.0 + np.exp(-m))

    return predict


@pandas_udf(DoubleType())
def batch_inference_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    model = _load_model()  # once per worker, NOT per batch
    for series in it:
        batch = np.stack(series.map(lambda v: np.asarray(v, dtype="float64")))
        # portable rounding (see functions.compat) — np.round is half-even
        yield pd.Series(np.floor(model(batch) * 1e6 + 0.5) / 1e6)


def _load_mlp(hidden: int = 16, seed: int = 2020):
    """A REAL (if tiny) model: 2-layer MLP forward pass with deterministic
    seeded weights, weight matrices cached per input dim per worker. This
    is actual tensor compute per Arrow batch — matmul → tanh → matmul →
    sigmoid — i.e. the execution shape of the reference's DenseNet
    inference (spark/jobs/radiography_analysis.py:306-326) without the
    framework. Not SQL-expressible; checked against a driver-side numpy
    golden instead of a DuckDB oracle."""
    cache: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray, float]] = {}

    def weights(d: int):
        if d not in cache:
            rng = np.random.default_rng(seed + d)
            w1 = rng.standard_normal((d, hidden)) / np.sqrt(d)
            b1 = rng.standard_normal(hidden) * 0.1
            w2 = rng.standard_normal((hidden, 1)) / np.sqrt(hidden)
            b2 = float(rng.standard_normal())
            cache[d] = (w1, b1, w2, b2)
        return cache[d]

    def predict(batch: np.ndarray) -> np.ndarray:
        w1, b1, w2, b2 = weights(batch.shape[1])
        h = np.tanh(batch @ w1 + b1)
        z = (h @ w2).ravel() + b2
        return 1.0 / (1.0 + np.exp(-z))

    return predict


@pandas_udf(DoubleType())
def mlp_inference_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """SCALAR_ITER batch inference with the real-MLP stand-in: model built
    once per worker, matmul per Arrow batch."""
    model = _load_mlp()
    for series in it:
        batch = np.stack(series.map(lambda v: np.asarray(v, dtype="float64")))
        yield pd.Series(np.floor(model(batch) * 1e6 + 0.5) / 1e6)


@pandas_udf(DoubleType())
def image_batch_inference_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """D7 for raw image bytes: same per-worker model load, with the
    byte-buffer → float-tensor decode the reference's Keras UDF did via
    tf.io (spark/jobs/radiography_analysis.py:313-326). Requires
    same-sized images per batch (valid_images guarantees it)."""
    model = _load_model()
    for series in it:
        batch = np.stack(
            series.map(
                lambda b: np.frombuffer(b, dtype=np.uint8).astype("float64") / 255.0
            )
        )
        yield pd.Series(np.floor(model(batch) * 1e6 + 0.5) / 1e6)
