"""t2 dress rehearsal: every oracle-bearing query must hash-match DuckDB
on the small scale factor. This is the same gate the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from pyspark_bigdata_sars_cov_2_analysis_spark import plans
from tests.conftest import SF_TEST
from tests.oracle_harness import compare, duck_connection

CASES = sorted(plans.ORACLES)


@pytest.mark.parametrize("name", CASES)
def test_oracle_parity(spark, name):
    compare(spark, name, plans.QUERIES[name], plans.ORACLES[name], SF_TEST)


def test_all_queries_have_callables():
    assert set(plans.ORACLES) <= set(plans.QUERIES)


def test_registry_fully_oracled():
    # since r15 (ml01's hashed-contract upgrade) EVERY registered query
    # carries an oracle — pin it so a rows-only entry can only appear
    # as a deliberate, reviewed decision (which would also have to
    # resurrect the rows-only smoke loop this pin replaced)
    rows_only = set(plans.QUERIES) - set(plans.ORACLES)
    assert rows_only == set(), sorted(rows_only)


def test_no_oracle_hugeint_columns():
    """Registry-wide oracle type-hygiene gate (VERDICT r13 #3).

    DuckDB types SUM(BIGINT) as HUGEINT; a UNION ALL then silently
    promotes the whole column, and the driver's pandas/arrow fetch
    materializes HUGEINT as float64 — a value-hash mismatch that the
    rows/schema compare (and this file's fetchall-based local parity,
    which gets Python ints either way) cannot see. That exact widening
    was the sole r13 driver red (o15). Resolve every oracle's output
    types driver-side (lazy relation — no execution) and refuse
    HUGEINT/UHUGEINT anywhere in the result schema; uncast SUMs must be
    wrapped in CAST(... AS BIGINT) at the source.
    """
    con = duck_connection(SF_TEST)
    offenders = {}
    for name in CASES:
        rel = con.sql(plans.ORACLES[name])
        bad = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if str(t).upper() in ("HUGEINT", "UHUGEINT")
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"oracles with HUGEINT-typed result columns (hash as float64 in "
        f"the driver's pandas fetch — CAST them to BIGINT): {offenders}"
    )
