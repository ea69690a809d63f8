"""Native rewrites of the reference's row-UDF recodes (SURVEY.md §2.9 D3/D4).

The reference round-tripped every row through a Python worker for trivial
conditionals (``is_positive``/``is_negative``/``transform_result``,
spark/jobs/cases_clinical_spectrum_analysis.py:267-292; ``classify``,
spark/jobs/radiography_analysis.py:357-378). Each becomes a when-chain —
codegen'd, pushdown-safe, zero serialization.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F


def binary_indicator(col: Column, positive_value: str) -> Column:
    """str → 1/0 (ref ``is_positive``/``is_negative``)."""
    return F.when(col == positive_value, F.lit(1)).otherwise(F.lit(0)).cast("bigint")


def label_from_code(col: Column, mapping: Mapping[int | str, str], default: str = "unknown") -> Column:
    """code → class name (ref ``classify``/``transform_result``)."""
    expr: Column | None = None
    for k, v in mapping.items():
        expr = F.when(col == k, v) if expr is None else expr.when(col == k, v)
    assert expr is not None
    return expr.otherwise(F.lit(default))


def rate_percent(numer: Column, denom: Column, decimals: int = 2) -> Column:
    """round(numer/denom*100, d) — the mortality/recovery-rate expression
    (ref: spark/jobs/cases_time_analysis.py:183-189)."""
    return F.round(numer / denom * 100.0, decimals)
