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


def _load_mlp(hidden: int = 8):
    """A REAL (if tiny) model: 2-layer MLP forward pass, weight matrices
    cached per input dim per worker. This is actual tensor compute per
    Arrow batch — int64 matmul → tanh → weighted sum → sigmoid — i.e. the
    execution shape of the reference's DenseNet inference
    (spark/jobs/radiography_analysis.py:306-326) without the framework.

    The weights are small integers from a closed formula
    (``w1[i][j] = (i*7 + j*13) % 5 - 2``) and the input is quantized to
    the 1/32768 grid with the repo's half-up floor convention
    (functions/compat.py), so the first-layer sums are EXACT int64 in any
    summation order and DuckDB can recompute the whole forward pass
    symbolically — the m05 integer-symbolic-oracle trick applied to
    tensor compute. tanh is expanded as ``1 - 2/(exp(2x)+1)`` because
    DuckDB 1.0 has no tanh; the UDF uses the identical expression so the
    only cross-engine divergence is exp() ulps, absorbed by the final
    6-decimal rounding. The hidden-layer sum accumulates sequentially in
    j-order to mirror the oracle's ordered list_aggregate."""
    cache: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}

    def weights(d: int):
        if d not in cache:
            i = np.arange(d)[:, None]
            j = np.arange(hidden)[None, :]
            w1 = ((i * 7 + j * 13) % 5 - 2).astype(np.int64)
            b1 = 0.1 * ((np.arange(hidden) % 3) - 1)
            w2 = ((np.arange(hidden) * 11) % 5 - 2).astype(np.float64)
            cache[d] = (w1, b1, w2)
        return cache[d]

    def predict(batch: np.ndarray) -> np.ndarray:
        d = batch.shape[1]
        w1, b1, w2 = weights(d)
        q = np.floor(batch * 32768.0 + 0.5).astype(np.int64)
        s = q @ w1  # exact: int64 products of quantized grid × small ints
        x = s / (32768.0 * np.sqrt(d)) + b1
        h = 1.0 - 2.0 / (np.exp(2.0 * x) + 1.0)  # tanh, DuckDB-portable form
        acc = np.zeros(len(batch))
        for jj in range(hidden):  # sequential j-order == list_aggregate
            acc = acc + w2[jj] * h[:, jj]
        z = acc / hidden + 0.25
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


def quantized_sum_arrow(batches):
    """``mapInArrow`` worker (D7 family's last uncovered entry point —
    RecordBatch-level Arrow access, no pandas materialization): per row,
    the exact int64 sum of the 1/32768-quantized embedding. Integer math
    end to end, so the DuckDB oracle recomputes it symbolically (u07's
    exactness argument, minus even the float tail).

    Genuinely vectorized: the list column's flat values buffer quantizes
    in ONE numpy pass and per-row sums come from a cumsum diff over the
    offsets — no per-row ``as_py()`` round-trip through Python objects.
    NULL embedding rows yield NULL qsum, and a null ELEMENT inside a
    list nulls that row's qsum too (F.aggregate-style null propagation —
    previously ``np.asarray`` turned element nulls into NaN whose int64
    cast is garbage). Yields one output RecordBatch per input batch —
    streaming, bounded memory."""
    import pyarrow as pa

    for batch in batches:
        vec_id = batch.column("vec_id")
        emb = batch.column("embedding")
        off = np.asarray(emb.offsets)
        elem_null = (
            emb.values.is_null().to_numpy(zero_copy_only=False)
            if emb.values.null_count
            else None
        )
        vals = emb.values.to_numpy(zero_copy_only=False).astype("float64")
        if elem_null is not None:
            vals = np.where(elem_null, 0.0, vals)
        q = np.floor(vals * 32768.0 + 0.5).astype(np.int64)
        cum = np.concatenate(([0], np.cumsum(q)))
        sums = cum[off[1:]] - cum[off[:-1]]
        mask = (
            emb.is_null().to_numpy(zero_copy_only=False)
            if emb.null_count
            else None
        )
        if elem_null is not None:
            cumn = np.concatenate(([0], np.cumsum(elem_null)))
            row_has_null = (cumn[off[1:]] - cumn[off[:-1]]) > 0
            mask = row_has_null if mask is None else (mask | row_has_null)
        yield pa.RecordBatch.from_arrays(
            [vec_id, pa.array(sums, type=pa.int64(), mask=mask)],
            ["vec_id", "qsum"],
        )


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


def grouped_quantized_stats_arrow(table):
    """``applyInArrow`` grouped-map worker (the GROUPED twin of u08's
    mapInArrow): one group's rows arrive as a ``pa.Table``, leave as a
    1-row aggregate (label, n, qsum_total) — per-group custom Python
    aggregation WITHOUT pandas materialization, the entry point for
    group-shaped native-memory work (per-entity tensor stats, per-key
    codec batches) that ``applyInPandas`` would pay a conversion tax on.
    Same 1/32768 integer quantization as u08, so the whole aggregate is
    exact int64 math and the DuckDB oracle recomputes it symbolically.
    Vectorized over the group's flat values buffer; no per-row as_py.

    Null semantics mirror the u13 oracle (review r9 — the same masking
    u08's mapInArrow worker already had): DuckDB's SUM and
    list_aggregate('sum') SKIP nulls, so a NULL element and a NULL
    embedding row both contribute nothing, and a group whose rows are
    all NULL sums to NULL — where the unmasked ``astype(int64)`` of the
    NaN that nulls decay into produced int64 garbage."""
    import pyarrow as pa

    label = table.column("label")[0].as_py()
    emb = table.column("embedding").combine_chunks()
    off = np.asarray(emb.offsets)
    vals = emb.values.to_numpy(zero_copy_only=False).astype("float64")
    if emb.values.null_count:
        vals = np.where(
            emb.values.is_null().to_numpy(zero_copy_only=False), 0.0, vals
        )
    q = np.floor(vals * 32768.0 + 0.5).astype(np.int64)
    cum = np.concatenate(([0], np.cumsum(q)))
    row_sums = cum[off[1:]] - cum[off[:-1]]
    if emb.null_count:
        valid = ~emb.is_null().to_numpy(zero_copy_only=False)
        total = int(row_sums[valid].sum()) if valid.any() else None
    else:
        total = int(row_sums.sum())
    return pa.table(
        {
            "label": pa.array([label], pa.int32()),
            "n": pa.array([table.num_rows], pa.int64()),
            "qsum_total": pa.array([total], pa.int64()),
        }
    )


def grouped_count_udaf():
    """Companion GROUPED_AGG count (see :func:`quantized_sum_udaf`'s
    placement restriction — native count() cannot share its agg)."""

    @pandas_udf("long")
    def gcount(emb: pd.Series) -> int:
        return int(len(emb))

    return gcount


def quantized_sum_udaf():
    """Grouped-AGGREGATE pandas UDF (the UDAF surface — SURVEY §2.9 D8
    lists it n/a in the reference; the engine provides it anyway): a
    ``pandas_udf`` whose function maps a group's Series to ONE scalar,
    usable directly inside ``groupBy().agg()`` — the lightest-weight
    custom-aggregation entry point
    (u13's applyInArrow owns the whole group table; this slots one
    column's reduction into a normal aggregate). Same 1/32768 integer
    quantization as u08/u13, so the result is exact int64 math with a
    symbolic SQL oracle. Partial aggregation caveat (the honest cost):
    Spark executes GROUPED_AGG over the full shuffled group — no
    map-side combine like native sums — so prefer native aggregates for
    hot keys and reserve this for genuinely custom reductions.
    Placement restriction (enforced by Spark, pinned by u14): a
    GROUPED_AGG pandas UDF cannot share one ``agg()`` with NATIVE
    aggregate functions (``INVALID_PANDAS_UDF_PLACEMENT``) — mix only
    with other pandas UDAFs, or join native aggregates back on the
    group key.

    Null semantics mirror the u14 oracle (review r9): NULL rows are
    skipped, null elements contribute nothing, and an all-NULL group
    returns NULL — where the unguarded ``np.concatenate`` previously
    crashed on a None row and the NaN a null element decays into cast
    to int64 garbage. Caveat of the pandas transport: a null element
    and a genuine NaN value are both delivered as NaN, so both are
    skipped (the fixtures contain neither)."""

    # the `-> int` hint is what tells pandas_udf this is a GROUPED_AGG
    # (Series -> scalar) UDF; returning None for an all-NULL group is
    # still valid at runtime (the hint drives eval-type inference only)
    @pandas_udf("long")
    def qsum(emb: pd.Series) -> int:
        arrs = [np.asarray(v, dtype="float64") for v in emb if v is not None]
        if not arrs:
            return None
        flat = np.concatenate(arrs)
        flat = np.where(np.isnan(flat), 0.0, flat)
        return int(np.floor(flat * 32768.0 + 0.5).astype(np.int64).sum())

    return qsum
