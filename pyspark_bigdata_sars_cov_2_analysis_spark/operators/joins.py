"""Join surface (SURVEY.md §2.3).

The reference implements NO joins (verified across all four jobs); this is
green-field capability required by the star-schema test corpus. Strategy
rules encoded here, sized for 100 TB:

- dimension tables (region/nation/supplier/part at TPC-H ratios) are always
  broadcast — ``F.broadcast`` hint, no shuffle of the fact side;
- fact-fact joins (orders⋈lineitem) are shuffle joins on the key; AQE
  handles skew-splitting at runtime;
- semi/anti joins are expressed as real LEFT SEMI / LEFT ANTI (not
  distinct+inner), so Catalyst can push them into the scan side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def join_dim(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """Fact ⋈ broadcast(dimension)."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def join_fact(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """Fact ⋈ fact — shuffle join on the key, AQE skew handling on."""
    return left.join(right, on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    return left.join(right, on=on, how="left_anti")


def latest_per_group_via_join(
    df: DataFrame, keys: list[str], order_col: str
) -> DataFrame:
    """Greatest-row-per-group, join formulation — the semantic twin of
    ``windows.latest_per_group`` (reference idiom W1/P14,
    `spark/jobs/cases_time_analysis.py:158-161`). Kept so tests can verify
    the two formulations agree; the window form avoids re-scanning."""
    maxes = df.groupBy(*keys).agg(F.max(order_col).alias("__max"))
    cond = [df[k] == maxes[k] for k in keys] + [df[order_col] == maxes["__max"]]
    return df.join(F.broadcast(maxes), on=cond, how="inner").select(df["*"])


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigating equi-join: the (large, skewed) left side picks a
    deterministic salt in [0, n_salts); the (smaller) right side is
    replicated once per salt value; the join key becomes (key, salt), so a
    hot key's rows spread over ``n_salts`` reducers instead of one.

    AQE's skew-join splitting handles most cases at runtime; this is the
    explicit operator for when the skew is known at authoring time (e.g. a
    null-heavy or celebrity key). Semantics are exactly ``left.join(right,
    left_key == right_key, how)`` — verified by equivalence tests — but
    ONLY for join types where the right side's replication cannot leak:
    inner/left/left_semi. right/full/left_anti would emit each unmatched
    replicated right row ``n_salts`` times (or wrongly suppress left rows),
    so they are rejected. The salt must be deterministic (xxhash64 of the
    whole left row), never rand(): retried tasks must re-derive the same
    salt or the join duplicates/drops rows."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "semi"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports how in {sorted(allowed)}; got {how!r}. "
            "Right/full-outer and anti joins would replicate unmatched "
            "right rows once per salt — use a plain join with AQE skew "
            "handling instead."
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    lhs = left.withColumn("__salt", salt.cast("int"))
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salts - 1))
    ).alias("__salt")
    rhs = right.select("*", salts)
    out = lhs.join(
        rhs,
        on=(lhs[left_key] == rhs[right_key])
        & (lhs["__salt"] == rhs["__salt"]),
        how=how,
    )
    return out.drop("__salt")
