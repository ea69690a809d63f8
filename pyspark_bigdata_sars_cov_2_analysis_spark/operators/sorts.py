"""Sort / limit / top-k surface (SURVEY.md §2.6 O1-O5).

``orderBy().limit(k)`` plans as TakeOrderedAndProject — per-partition heap
top-k + single driver merge, no global sort. That is the only global
ordering pattern that survives 100 TB; plain ``orderBy`` on a huge frame is
reserved for final small results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def sort_rows(df: DataFrame, *order_by: Column | str) -> DataFrame:
    """O1/O2 — global sort; use only on already-aggregated small frames."""
    return df.orderBy(*order_by)


def top_k(df: DataFrame, k: int, *order_by: Column | str) -> DataFrame:
    """O3 — top-k (TakeOrderedAndProject). Callers must include a unique
    tiebreaker for determinism (the reference's bare ``limit`` O4 is
    nondeterministic — SURVEY.md §7.3)."""
    return df.orderBy(*order_by).limit(k)


def top_k_resorted(
    df: DataFrame, k: int, order_by: list[Column], display_order: list[Column]
) -> DataFrame:
    """O3 exactly as the reference composes it: top-10 by rate descending,
    re-sorted ascending for display
    (`spark/jobs/cases_time_analysis.py:183-189`)."""
    return df.orderBy(*order_by).limit(k).orderBy(*display_order)


def seeded_split(df: DataFrame, weights: list[float], seed: int = 2020):
    """O5 — ``randomSplit`` pinned to a seed; the reference left one unseeded
    (`spark/jobs/radiography_analysis.py:192`) which is untestable."""
    return df.randomSplit(weights, seed=seed)
