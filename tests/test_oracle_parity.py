"""t2 dress rehearsal: every oracle-bearing query must hash-match DuckDB
on the small scale factor. This is the same gate the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from pyspark_bigdata_sars_cov_2_analysis_spark import plans
from tests.conftest import SF_TEST
from tests.oracle_harness import compare

CASES = sorted(plans.ORACLES)


@pytest.mark.parametrize("name", CASES)
def test_oracle_parity(spark, name):
    compare(spark, name, plans.QUERIES[name], plans.ORACLES[name], SF_TEST)


def test_all_queries_have_callables():
    assert set(plans.ORACLES) <= set(plans.QUERIES)


def test_rows_only_queries_run(spark):
    rows_only = set(plans.QUERIES) - set(plans.ORACLES)
    for name in sorted(rows_only):
        df = plans.QUERIES[name](spark, SF_TEST)
        assert df.count() >= 0, name
