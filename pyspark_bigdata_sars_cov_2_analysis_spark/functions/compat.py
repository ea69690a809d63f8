"""Cross-engine numeric compatibility helpers.

Spark's ``round`` re-parses the double's shortest decimal representation
(Java BigDecimal half-up), DuckDB rounds the binary value, and Python's
``round`` is banker's rounding — three different answers on half-boundary
values like 37704.575. ``floor(x*10^d + 0.5)/10^d`` is pure IEEE arithmetic
(multiply, add, floor, divide), so every engine produces bit-identical
results given the same input. All engine code and every DuckDB oracle use
these three twins.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def pround(col: Column, d: int = 2) -> Column:
    m = 10**d
    return F.floor(col * m + F.lit(0.5)) / m


def sql_round(expr: str, d: int = 2) -> str:
    m = 10**d
    return f"floor(({expr}) * {m} + 0.5) / {m}"


def pyround(x: float, d: int = 2) -> float:
    m = 10**d
    return math.floor(x * m + 0.5) / m
