"""Aggregation surface (SURVEY.md §2.4 A1-A10).

All hash aggregates with map-side partials; group keys are the shuffle keys.
Aliases are always explicit — the reference leaned on Spark's generated
``sum(confirmed)`` names as an output contract
(`visualization/scripts/cases_time_visualization.py:53`); we expose a compat
helper for that but default to clean names.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grouped_sum(
    df: DataFrame, keys: list[str], measures: list[str], spark_names: bool = False
) -> DataFrame:
    """A1/A2 — ``groupBy(keys).sum(measures)``
    (`spark/jobs/cases_time_analysis.py:123,163`).

    ``spark_names=True`` reproduces the reference's generated-name contract
    (``sum(confirmed)``)."""
    aggs = [
        F.sum(m).alias(f"sum({m})" if spark_names else f"sum_{m}") for m in measures
    ]
    return df.groupBy(*keys).agg(*aggs)


def grouped_agg(df: DataFrame, keys: list[str], *aggs: Column) -> DataFrame:
    """A3/A4 — arbitrary agg list with aliases."""
    return df.groupBy(*keys).agg(*aggs)


def group_count(df: DataFrame, keys: list[str], alias: str = "count") -> DataFrame:
    """A5 — `groupBy('result').count()`
    (`spark/jobs/cases_clinical_spectrum_analysis.py:238`)."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(alias))


def count_with_share(df: DataFrame, keys: list[str]) -> DataFrame:
    """A3 — group count + percentage of total
    (`spark/jobs/radiography_analysis.py:107-112`).

    The reference ran a *separate* ``df.count()`` job for the denominator;
    we get the total from a single extra reduce over the (tiny) aggregated
    result via an unpartitioned window — one scan instead of two.
    """
    from pyspark.sql.window import Window

    from pyspark_bigdata_sars_cov_2_analysis_spark.functions.compat import pround

    counted = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("count"))
    total = F.sum("count").over(Window.partitionBy())
    # multiply BEFORE dividing: (c*100.0)/t and (c/t)*100.0 round
    # differently on boundary ratios under the compat floor-round
    # (c=23, t=160 -> 14.375 vs 14.374999999999998 -> 14.38 vs 14.37),
    # and the a03 oracle computes COUNT(*) * 100.0 / total
    return counted.withColumn(
        "percentage", pround(F.col("count") * 100.0 / total, 2)
    )


def ordered_collect(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
    alias: str = "ordered_values",
    joiner: str | None = None,
) -> DataFrame:
    """A8 — order-preserving list agg.

    The reference reassembled abstract sentences with a running window
    ``collect_list().over(partitionBy.orderBy)`` then ``max`` of arrays
    (`spark/jobs/research_challenge_analysis.py:94-98`) — that materializes
    O(n²) intermediate arrays per group. The idiomatic single-shuffle form is
    ``sort_array(collect_list(struct(order, value)))``.

    NULL values (review r15, deliberate): the two output modes follow
    their engine-native semantics, which DIFFER — the list form keeps a
    NULL element in position (Spark struct-collect keeps it), while the
    joined-string form drops it (``array_join`` without a
    nullReplacement, matching DuckDB/Spark ``array_to_string``/string
    aggregation and therefore the SQL oracles). Callers who need NULLs
    visible in the string form should coalesce the value column to a
    marker upstream.
    """
    pairs = F.collect_list(F.struct(F.col(order_col), F.col(value_col)))
    ordered = F.transform(F.array_sort(pairs), lambda s: s[value_col])
    if joiner is None:
        out = ordered
    else:
        out = F.array_join(F.transform(ordered, lambda v: v.cast("string")), joiner)
    return df.groupBy(*keys).agg(out.alias(alias))


def distinct_rows(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """A9 — full-row distinct, or any-one-row-per-key.

    ``dropDuplicates(subset)`` keeps an arbitrary row per key
    (`spark/jobs/radiography_analysis.py:119`) — nondeterministic under
    parallelism. For testable pipelines prefer ``latest_per_group`` in
    :mod:`windows` with an explicit ordering.
    """
    return df.dropDuplicates(subset) if subset else df.distinct()


def weighted_quantiles(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    weight_col: str,
    quantiles: list[tuple[int, int, str]],
    tiebreaks: list[str] | None = None,
    n_range_parts: int = 64,
    cache_registrar=None,
) -> DataFrame:
    """EXACT weighted quantiles per key group, at scale (r10).

    The weighted q-quantile is the smallest ``value`` whose cumulative
    weight (in value order) reaches ``q`` of the group's total — the
    distribution summary a19/a20's SKETCHES approximate, computed
    exactly. ``quantiles`` is ``[(num, den, alias), ...]`` (e.g.
    ``(1, 2, "wp50")``): thresholds compare as pure INTEGER arithmetic
    (``den·cumw ≥ num·totw`` with bigint weights), so the selection is
    bit-exact across engines — no float boundary can flip a pick.

    Scale shape — the naive form windows the whole group onto one
    partition (dead at 100 TB); this is the two-phase distributed
    prefix sum on RANGE partitions: ``repartitionByRange`` over
    (keys, value, tiebreaks) gives pid order == value order, so
    per-(key, pid) subtotals (a tiny frame) yield running offsets that
    broadcast back, and the wide cumsum window runs per (key, pid) —
    ``n_range_parts``-way parallel. Range boundaries are SAMPLED and
    vary run to run; correctness never depends on where they fall, BUT
    it does depend on the subtotal side and the cumsum side seeing the
    SAME boundaries — ``__pid`` is only meaningful relative to one
    materialized exchange, so ``parts`` is CACHED (review r10: without
    the cache, any plan where ReuseExchange fails to fire — e.g.
    ``spark.sql.exchange.reuse=false`` — evaluates the range exchange
    twice with independently sampled boundaries and silently misaligns
    the offset join; measured wrong medians). The cache pins one
    partitioner instance, which also survives executor-loss recompute
    (boundaries live in the shuffle dependency, not the sample). The
    group totals reuse the per-(key, pid) subtotal frame — never a
    second pass over the input. One range exchange, two tiny aggs; the
    quantile pick is a conditional ``min`` (min value whose cum
    crosses), never a second scan.

    Weights must be non-negative integers (cast upstream); zero-weight
    rows can never be picked (their cum equals their predecessor's, and
    min-crossing selects the first row that REACHES the threshold), and
    a group whose TOTAL weight is zero yields NULL quantiles (review
    r15: the threshold test used to degenerate to 0 >= 0 and fabricate
    the group's min value as a "median" of a zero-mass distribution).
    The internal cache is correctness-load-bearing mid-plan; pass
    ``cache_registrar`` (e.g. ``plans.registry.tracked_cache``) to give
    it a caller-releasable lifetime in long-lived sessions (review r15:
    the bare .cache() had NO release path — only clearCache() could
    free it); the cached frame is projected to exactly
    [keys, value, tiebreaks, weight] first, so unused input width never
    rides the range exchange or the cache.
    """
    from pyspark.sql.window import Window

    from pyspark_bigdata_sars_cov_2_analysis_spark.operators.joins import (
        _assert_no_reserved,
    )

    tiebreaks = tiebreaks or []
    order_cols = [value_col, *tiebreaks]
    _assert_no_reserved(
        "weighted_quantiles",
        (
            "__pid", "__btot", "__off", "__tot", "__cum", "__wq_pid",
            # the per-key join aliases generated below (review r15: an
            # input literally named __wq_k0 defeated the guard and died
            # with the ambiguous-column error it exists to pre-empt)
            *[f"__wq_k{i}" for i in range(len(keys))],
        ),
        df=df,
    )
    # project BEFORE the range exchange: only [keys, order, weight]
    # ride the shuffle and the cache (dict.fromkeys dedupes a column
    # that serves two roles while preserving order)
    needed = list(dict.fromkeys([*keys, *order_cols, weight_col]))
    raw = (
        df.select(*needed)
        .repartitionByRange(
            n_range_parts, *[F.col(c) for c in [*keys, *order_cols]]
        )
        .withColumn("__pid", F.spark_partition_id())
    )
    parts = cache_registrar(raw) if cache_registrar is not None else raw.cache()
    sub = parts.groupBy(*keys, "__pid").agg(
        F.sum(weight_col).alias("__btot")
    )
    w_off = (
        Window.partitionBy(*keys)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # offsets AND group totals from the one tiny subtotal frame
    w_tot = Window.partitionBy(*keys)
    off = sub.select(
        *keys,
        "__pid",
        F.coalesce(F.sum("__btot").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__btot").over(w_tot).alias("__tot"),
    )
    w_loc = (
        Window.partitionBy(*keys, "__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # eqNullSafe on the key columns (review r14, joins.py's r9 rule): a
    # plain `on=[*keys, "__pid"]` drops NULL-key rows on the offsets
    # join, silently erasing the NULL group from the output — groupBy
    # keeps NULL groups and so must this. __pid is never null; key
    # columns on the offsets side are renamed so the condition join
    # doesn't collide names.
    off_r = off.select(
        *[F.col(k).alias(f"__wq_k{i}") for i, k in enumerate(keys)],
        F.col("__pid").alias("__wq_pid"),
        "__off",
        "__tot",
    )
    cond = F.col("__pid") == F.col("__wq_pid")
    for i, k in enumerate(keys):
        cond = cond & F.col(k).eqNullSafe(F.col(f"__wq_k{i}"))
    cum = (
        parts.join(F.broadcast(off_r), cond)
        .drop("__wq_pid", *[f"__wq_k{i}" for i in range(len(keys))])
        .withColumn("__cum", F.col("__off") + F.sum(weight_col).over(w_loc))
    )
    picks = [
        F.min(
            F.when(
                (F.col("__tot") > 0)
                & (F.col("__cum") * F.lit(den) >= F.col("__tot") * F.lit(num)),
                F.col(value_col),
            )
        ).alias(alias)
        for num, den, alias in quantiles
    ]
    return cum.groupBy(*keys).agg(*picks)
