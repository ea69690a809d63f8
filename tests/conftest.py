from __future__ import annotations

import pytest

from pyspark_bigdata_sars_cov_2_analysis_spark import start_session

SF_TEST = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = start_session(
        "engine-tests",
        master="local[4]",
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    yield s
    s.stop()
