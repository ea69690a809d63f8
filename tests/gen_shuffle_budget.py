"""Regenerate tests/shuffle_budget.json (see test_shuffle_budget.py).

Run from the repo root: ``python tests/gen_shuffle_budget.py``.
Commit the diff — it is the reviewable record of which queries' plans
pay more (or fewer) data-moving exchanges than before.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    from pyspark_bigdata_sars_cov_2_analysis_spark.plans import QUERIES
    from tests.test_shuffle_budget import BUDGET_PATH, EXCLUDE, measure

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.catalog.clearCache()  # mirror the test's normalization
    budget = {}
    for name, fn in sorted(QUERIES.items()):
        if name in EXCLUDE:
            continue
        budget[name] = measure(fn(spark, "/root/testdata/sf0.001"))
        print(f"{name}: {budget[name]}")
    with open(BUDGET_PATH, "w") as f:
        json.dump(budget, f, indent=1, sort_keys=True)
    print(f"wrote {BUDGET_PATH} ({len(budget)} queries)")


if __name__ == "__main__":
    main()
