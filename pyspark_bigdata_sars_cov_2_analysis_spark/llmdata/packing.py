"""Sequence packing: concat-and-chunk token layout for training pipelines.

Pretraining data loaders concatenate documents in a fixed order and slice
the token stream into fixed-length sequences; a document's placement is
its GLOBAL token offset — a prefix sum over the corpus. The naive Spark
formulation (``sum() over (ORDER BY ...)`` with no PARTITION BY) collapses
to a single partition and dies at scale, so this module implements the
two-level scan: per-chunk local prefix sums in parallel, a tiny prefix sum
over the per-chunk totals (one row per chunk), and a broadcast join back.
Cost: one narrow shuffle per level; the only single-partition work is over
``n_chunks`` rows.

Offsets are identical to the naive formulation by associativity of
addition (asserted in tests), and deterministic because the order key is
the stable ``doc_id``, not arrival order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_token_offsets(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    n_chunks: int = 64,
) -> DataFrame:
    """Input + ``offset`` = total tokens in all docs ordered before this
    one by ``id_col``. Two-level distributed prefix sum (see module doc);
    ``n_chunks`` bounds the second level's single-partition frame and
    should be ~the cluster's core count at real scale."""
    # contiguous ranges of the order key -> chunk ids that preserve order
    # BETWEEN chunks (chunk k's ids all precede chunk k+1's)
    lo_hi = df.agg(
        F.min(id_col).alias("lo"), F.max(id_col).alias("hi")
    ).collect()[0]
    if lo_hi["lo"] is None:  # empty input: offset column, no rows
        return df.withColumn("offset", F.lit(None).cast("bigint"))
    span = max(int(lo_hi["hi"]) - int(lo_hi["lo"]) + 1, 1)
    width = -(-span // n_chunks)  # ceil
    # a NULL order key has no position in the packed layout — and worse,
    # it would yield __chunk NULL, silently vanish through the inner
    # join below, and the packed output would simply be missing the doc
    # (review r14). Refuse row-locally with raise_error in the __rel
    # expression's null branch — no extra job, a clear message at
    # execution instead of lost data. (An assert_true rider does NOT
    # work here: it returns NullType, so the optimizer folds its cast
    # to a plain NULL and the side effect vanishes.)
    rel = F.when(
        F.col(id_col).isNotNull(), F.col(id_col) - F.lit(int(lo_hi["lo"]))
    ).otherwise(
        F.raise_error(
            F.lit(
                f"{id_col} is NULL: a null order key has no position in "
                "the packed layout — drop or key such rows first"
            )
        ).cast("bigint")
    )
    with_chunk = df.withColumn("__rel", rel).withColumn(
        "__chunk", F.expr(f"__rel DIV {width}")
    ).drop("__rel")
    w_local = (
        Window.partitionBy("__chunk")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = with_chunk.withColumn(
        "__local_cum", F.sum(tokens_col).over(w_local)
    )
    totals = local.groupBy("__chunk").agg(F.max("__local_cum").alias("__total"))
    w_chunks = (
        Window.orderBy("__chunk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefix = totals.select(
        "__chunk",
        (F.sum("__total").over(w_chunks) - F.col("__total")).alias("__before"),
    )
    return (
        local.join(F.broadcast(prefix), on="__chunk")
        .withColumn(
            "offset",
            (F.col("__before") + F.col("__local_cum") - F.col(tokens_col)).cast(
                "bigint"
            ),
        )
        .drop("__chunk", "__local_cum", "__before")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    seq_len: int,
    n_chunks: int = 64,
) -> DataFrame:
    """Concat-and-chunk packing: assign each doc its global token offset,
    the fixed-length sequence its first token lands in, and whether it
    straddles a sequence boundary (real packing semantics — pretraining
    chunkers split straddling docs across sequences rather than padding).

    Output: (id, n_tokens, offset, seq_id, straddles)."""
    out = global_token_offsets(df, id_col, tokens_col, n_chunks).withColumn(
        "__end", F.col("offset") + F.col(tokens_col) - 1
    )
    # true integer DIV (same idiom as registry's `ts DIV 1000`): double
    # division — even of an exact multiple — rounds the NUMERATOR first
    # and drifts once offsets pass 2^53 (~9e15 tokens)
    first = F.expr(f"offset DIV {seq_len}")
    last = F.expr(f"__end DIV {seq_len}")
    return out.select(
        F.col(id_col),
        F.col(tokens_col),
        "offset",
        first.alias("seq_id"),
        (last > first).alias("straddles"),
    )
