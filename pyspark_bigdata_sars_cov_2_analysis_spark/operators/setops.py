"""Set operations (SURVEY.md §2.7 U1-U3).

Default is ``unionByName`` — the reference's positional ``union`` across
four per-class frames (`spark/jobs/radiography_analysis.py:93-96`) only
works because schemas are identical by construction, and its 9-col vs 1-col
union (`spark/jobs/cases_clinical_spectrum_analysis.py:164-166`) is a latent
bug we deliberately do NOT reproduce (SURVEY.md §7.3 — the intent was column
concat, i.e. a plain select of both column sets).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_all(
    frames: list[DataFrame],
    by_name: bool = True,
    allow_missing_columns: bool = False,
) -> DataFrame:
    """U1/U12 — n-way union. One pass; Spark flattens chained unions.
    ``allow_missing_columns`` is the schema-evolution form (each side's
    missing columns null-pad — requires ``by_name``); an empty list
    refuses loudly (review r15: reduce() raised an opaque TypeError)."""
    if not frames:
        raise ValueError("union_all needs at least one frame")
    if allow_missing_columns and not by_name:
        raise ValueError("allow_missing_columns requires by_name=True")
    if by_name:
        return reduce(
            lambda a, b: a.unionByName(
                b, allowMissingColumns=allow_missing_columns
            ),
            frames,
        )
    return reduce(lambda a, b: a.union(b), frames)


def intersect_rows(a: DataFrame, b: DataFrame, keep_duplicates: bool = False) -> DataFrame:
    """U3."""
    return a.intersectAll(b) if keep_duplicates else a.intersect(b)


def except_rows(a: DataFrame, b: DataFrame, keep_duplicates: bool = False) -> DataFrame:
    """U3."""
    return a.exceptAll(b) if keep_duplicates else a.subtract(b)
