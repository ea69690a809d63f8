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

Chunk boundaries are ORDER-KEY QUANTILES (review r15): the earlier
``(id - min) / width`` value-range grid degenerated under skewed ids —
one snowflake/timestamp outlier id stretched the span so every real row
landed in chunk 0, recreating the single-partition collapse the module
exists to avoid. ``percentile_approx`` boundaries stay balanced under
any id distribution; the boundary probe rides the same one-row sidecar
aggregate the min/max grid already paid for (the documented
param-sidecar collect class — a scalar per call, never per row).

Offsets are identical to the naive formulation by associativity of
addition (asserted in tests) — and invariant to WHERE the chunk
boundaries fall, so the approximate quantiles need no accuracy bound
for correctness, only for balance. Deterministic because the order key
is the stable numeric ``doc_id``, not arrival order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark_bigdata_sars_cov_2_analysis_spark.operators.joins import (
    _assert_no_reserved,
)

_OFFSET_RESERVED = ("__chunk", "__local_cum", "__total", "__before", "offset")

# Scale-adaptive chunk grid (optimization r16, guide §2): n_chunks is the
# CEILING of second-level parallelism, not a fixed split count — splitting
# a small corpus 64 ways buys nothing and bills the per-row chunk
# expression (a boundary filter linear in the boundary count) 64 boundary
# comparisons per row in BOTH consuming branches. The effective chunk
# count floors at one chunk per this many rows (offsets are invariant to
# WHERE boundaries fall — module doc — so thinning the quantile grid can
# never change a value, only task balance; measured at sf0.1: 63 -> 1-7
# boundaries is ~0.82-0.92x the tail). At real scale n >> n_chunks*4096,
# so the full n_chunks grid is always in effect where it matters.
_MIN_CHUNK_ROWS = 4096


def global_token_offsets(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    n_chunks: int = 64,
) -> DataFrame:
    """Input + ``offset`` = total tokens in all docs ordered before this
    one by ``id_col`` (numeric). Two-level distributed prefix sum (see
    module doc); ``n_chunks`` bounds the second level's single-partition
    frame and should be ~the cluster's core count at real scale.

    CACHE CONTRACT (ADVICE r15): the input frame is materialized in the
    registry-tracked plan cache for the duration of the call's plan —
    three consumers (probe, cumsum window, chunk totals) read one
    materialization instead of re-running the caller's upstream (for
    t10 that upstream is a full corpus tokenize). The cache holds ALL
    input columns: pass a PROJECTED frame — ``df.select(id, tokens,
    …carried columns…)`` — not a wide text-bearing corpus row, or the
    whole corpus is pinned in executor storage until
    ``release_plan_caches()``/``clearCache()``. (Every in-repo caller
    passes a two-numeric-column projection.)

    Contract guards (review r15): an all-NULL order key refuses eagerly
    (the partial-NULL case already refused row-locally); a NULL or
    negative token count refuses row-locally (a silent NULL offset — or
    a max-based chunk total drifting under negatives — corrupts every
    later chunk's placement); input columns may not collide with the
    working names."""
    if n_chunks < 1:
        raise ValueError(f"n_chunks must be >= 1, got {n_chunks}")
    _assert_no_reserved("global_token_offsets", _OFFSET_RESERVED, df=df)
    # THREE consumers scan the input — the boundary/count probe below,
    # the local-cumsum window branch, and the chunk-totals aggregate
    # branch — and Catalyst cannot share them (column pruning + the
    # join's inferred isnotnull filter make the subtrees canonically
    # different, so neither ReuseExchange nor AQE's stage cache ever
    # matches; verified on the planned trees). When the caller derives
    # the token count from document text (t10), each extra pass re-reads
    # and re-tokenizes the whole corpus. Route the input through the
    # registry-tracked plan cache (the d16/d06 narrow-frame rule;
    # released between runs by release_plan_caches/clearCache, never a
    # cross-run result cache): the packing input is id + token count —
    # two numeric columns, text-free — so the one materialization is
    # cheap and every pass after the probe is an in-memory read
    # (optimization r15, guide §2.4/§5).
    from pyspark_bigdata_sars_cov_2_analysis_spark.plans.registry import (
        tracked_cache,
    )

    df = tracked_cache(df)
    # one-row sidecar: row count (empty/all-NULL discrimination — min()
    # alone conflated the two, review r15) + order-balanced boundaries
    qs = [i / n_chunks for i in range(1, n_chunks)]
    probe = [
        F.count(F.lit(1)).alias("n"),
        F.count(id_col).alias("n_keyed"),
    ]
    if qs:
        # accuracy=100 (default 10000): offsets are invariant to WHERE
        # the boundaries fall (module doc — associativity), so quantile
        # accuracy buys only balance, and ±1% of rank is ample for a
        # work-splitting grid; the default's larger sketch costs 2-3×
        # the probe time and driver memory for nothing (optimization
        # r15, guide §1.2)
        probe.append(
            F.percentile_approx(id_col, qs, 100).alias("bounds")
        )
    stats = df.agg(*probe).collect()[0]
    if stats["n"] == 0:  # empty input: offset column, no rows
        return df.withColumn("offset", F.lit(None).cast("bigint"))
    if stats["n_keyed"] == 0:
        raise ValueError(
            f"{id_col} is NULL for every row: a null order key has no "
            "position in the packed layout — drop or key such rows first"
        )
    # dedupe (heavy id duplication repeats quantiles) and keep sorted so
    # chunk k's ids all precede chunk k+1's — offsets are invariant to
    # the boundary positions themselves (associativity), so approximate
    # quantiles affect balance only, never values
    bounds = sorted(set(stats["bounds"] or [])) if qs else []
    # thin the grid to the EFFECTIVE chunk count for this input size
    # (see _MIN_CHUNK_ROWS): evenly spaced quantile subset, so balance
    # is preserved and small inputs skip the 63-comparison-per-row bill
    eff = min(n_chunks, max(1, -(-int(stats["n"]) // _MIN_CHUNK_ROWS)))
    if bounds and eff <= len(bounds):
        bounds = [
            bounds[round((i + 1) * len(bounds) / eff) - 1]
            for i in range(eff - 1)
        ]
    # a NULL order key has no position in the packed layout — and worse,
    # it would yield __chunk NULL, silently vanish through the inner
    # join below, and the packed output would simply be missing the doc
    # (review r14). Refuse row-locally with raise_error in the chunk
    # expression's null branch — no extra job, a clear message at
    # execution instead of lost data. (An assert_true rider does NOT
    # work here: it returns NullType, so the optimizer folds its cast
    # to a plain NULL and the side effect vanishes.)
    chunk_val = (
        F.size(F.filter(F.array(*[F.lit(b) for b in bounds]),
                        lambda b: F.col(id_col) >= b))
        if bounds
        else F.lit(0)
    )
    chunk = F.when(F.col(id_col).isNotNull(), chunk_val).otherwise(
        F.raise_error(
            F.lit(
                f"{id_col} is NULL: a null order key has no position in "
                "the packed layout — drop or key such rows first"
            )
        ).cast("int")
    )
    # NULL/negative token counts corrupt placement silently (a NULL
    # offset for the doc itself, a wrong __total for every later chunk)
    # — refuse row-locally, same pattern as the order-key guard; the
    # guarded expression feeds BOTH the local cumsum and the chunk
    # totals so column pruning can never optimize the check away on
    # one branch (review r15)
    tok_type = dict(df.dtypes)[tokens_col]
    tok = F.when(
        F.col(tokens_col).isNotNull() & (F.col(tokens_col) >= 0),
        F.col(tokens_col),
    ).otherwise(
        F.raise_error(
            F.lit(
                f"{tokens_col} is NULL or negative: token counts must be "
                "non-negative for a packed layout — clean them first"
            )
        ).cast(tok_type)
    )
    with_chunk = df.withColumn("__chunk", chunk)
    w_local = (
        Window.partitionBy("__chunk")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = with_chunk.withColumn("__local_cum", F.sum(tok).over(w_local))
    # sum of the guarded tokens, not max(__local_cum): equal once the
    # guard holds, and sum stays correct by definition rather than by
    # the no-negatives argument (review r15)
    totals = with_chunk.groupBy("__chunk").agg(F.sum(tok).alias("__total"))
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
    if seq_len < 1:
        # 'offset DIV 0' is NULL in non-ANSI Spark — every seq_id and
        # straddles would be silently NULL (review r15)
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    _assert_no_reserved(
        "pack_sequences", ("__end", "seq_id", "straddles"), df=df
    )
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
