"""Registry-wide shuffle-count regression gate.

The hand-written plan-shape tests guard specific queries; this gate
generalizes the most important scale invariant — DON'T ADD SHUFFLES — to
EVERY registered query: ``shuffle_budget.json`` records each query's
data-moving exchange count (hash/range/single-partition; broadcasts and
reuses excluded — those are the good outcomes), and any query whose plan
grows past its recorded budget fails here. Regenerate deliberately with
``python tests/gen_shuffle_budget.py`` when a query's shape legitimately
changes — the diff then shows the reviewer exactly which queries pay
more exchanges and by how much.

``ml01_classifier_bench`` is excluded (plan construction trains real
MLlib models); everything else builds its plan at sf0.001.
"""

from __future__ import annotations

import json
import os
import re

import pytest

from pyspark_bigdata_sars_cov_2_analysis_spark.plans import QUERIES
from tests.conftest import SF_TEST

BUDGET_PATH = os.path.join(os.path.dirname(__file__), "shuffle_budget.json")
EXCLUDE = {"ml01_classifier_bench"}  # plan construction trains models

_NODE = re.compile(r"^\((\d+)\) Exchange\b")
_KIND = re.compile(r"hashpartitioning|rangepartitioning|SinglePartition")


def count_shuffles(df) -> int:
    """Count DISTINCT data-moving Exchange nodes from formatted-mode
    details. Line-counting the tree is print-sensitive: once a cached
    frame MATERIALIZES, the plan printer repeats the InMemoryRelation's
    defining subtree under every consumer, multiplying the same exchange
    across the text (t09/t13/a22 flipped their counts between a fresh
    session and one where the parity suite had materialized the caches).
    Formatted mode lists every node once by id in the details section —
    count ids, immune to caching state and subtree re-printing."""
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    lines = plan.splitlines()
    ids = set()
    for i, ln in enumerate(lines):
        m = _NODE.match(ln.strip())
        if not m:
            continue
        detail = " ".join(lines[i : i + 3])
        if _KIND.search(detail):
            ids.add(m.group(1))
    return len(ids)


def test_no_query_gained_shuffles(spark):
    # cached frames (t09/t13/a22) print one extra exchange once their
    # cache has MATERIALIZED (e.g. after the parity suite ran them), so
    # normalize to the fresh-session state the generator measures from:
    # drop all cache entries; each query re-registers its own,
    # unmaterialized, while its plan is built
    spark.catalog.clearCache()
    with open(BUDGET_PATH) as f:
        budget = json.load(f)
    over, missing = {}, []
    for name, fn in QUERIES.items():
        if name in EXCLUDE:
            continue
        if name not in budget:
            missing.append(name)
            continue
        n = count_shuffles(fn(spark, SF_TEST))
        if n > budget[name]:
            over[name] = (n, budget[name])
    assert not over, (
        f"queries gained shuffles vs tests/shuffle_budget.json: {over} — "
        "if intentional, regenerate with python tests/gen_shuffle_budget.py "
        "and justify the new counts in the commit"
    )
    assert not missing, (
        f"new queries without a shuffle budget: {missing} — run "
        "python tests/gen_shuffle_budget.py"
    )
