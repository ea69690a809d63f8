"""Registry-wide shuffle- and scan-count regression gate.

The hand-written plan-shape tests guard specific queries; this gate
generalizes the two most important scale invariants to EVERY registered
query:

- DON'T ADD SHUFFLES — ``shuffle_budget.json`` records each query's
  data-moving exchange count (hash/range/single-partition; broadcasts and
  reuses excluded — those are the good outcomes);
- DON'T ADD SCANS — the same file records each query's DISTINCT parquet
  scan-node count. Plans that reference a subtree from several consumers
  (crossJoin branches, self-joins, un-reused exchanges) silently multiply
  source scans; at 100 TB each extra unfiltered scan is a full pass over
  the corpus. Multi-table joins (TPC-H), deliberately recomputed exploded
  shingle frames (d03/d16), and pushdown-pruned slivers (IVF codebook /
  probe scans) legitimately count several scan nodes — the budget records
  today's count per query, so only GROWTH fails.

Any query whose plan grows past either recorded budget fails here.
Regenerate deliberately with ``python tests/gen_shuffle_budget.py`` when a
query's shape legitimately changes — the diff then shows the reviewer
exactly which queries pay more exchanges/scans and by how much.

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
_SCAN = re.compile(r"^\((\d+)\) Scan parquet\b")
# roundrobinpartitioning added r15: the deliberate spread_compute
# repartitions were round-robin (uncounted — a historical blind spot);
# the keyed-spread optimization turned them into hashpartitioning and
# they appeared as phantom "gained shuffles". Count EVERY data-moving
# exchange flavor so the budget is flavor-independent, and regenerate.
_KIND = re.compile(
    r"hashpartitioning|rangepartitioning|SinglePartition"
    r"|roundrobinpartitioning"
)


def _formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def count_shuffles(df, plan: str | None = None) -> int:
    """Count DISTINCT data-moving Exchange nodes from formatted-mode
    details. Line-counting the tree is print-sensitive: once a cached
    frame MATERIALIZES, the plan printer repeats the InMemoryRelation's
    defining subtree under every consumer, multiplying the same exchange
    across the text (t09/t13/a22 flipped their counts between a fresh
    session and one where the parity suite had materialized the caches).
    Formatted mode lists every node once by id in the details section —
    count ids, immune to caching state and subtree re-printing."""
    plan = plan if plan is not None else _formatted_plan(df)
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


def count_scans(df, plan: str | None = None) -> int:
    """Count DISTINCT parquet scan nodes (same distinct-node-id rule as
    count_shuffles, for the same cache-printing reason)."""
    plan = plan if plan is not None else _formatted_plan(df)
    return len({
        m.group(1)
        for ln in plan.splitlines()
        if (m := _SCAN.match(ln.strip()))
    })


def measure(df) -> dict:
    """One plan build → both budget figures."""
    plan = _formatted_plan(df)
    return {
        "shuffles": count_shuffles(df, plan),
        "scans": count_scans(df, plan),
    }


def _entry(budget_value) -> dict:
    # pre-r9 files recorded a bare shuffle int; tolerate both shapes so a
    # stale checkout fails on real growth, not on schema
    if isinstance(budget_value, dict):
        return budget_value
    return {"shuffles": budget_value, "scans": None}


def test_no_query_gained_shuffles_or_scans(spark):
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
        got = measure(fn(spark, SF_TEST))
        want = _entry(budget[name])
        bad = {
            k: (got[k], want[k])
            for k in ("shuffles", "scans")
            if want.get(k) is not None and got[k] > want[k]
        }
        if bad:
            over[name] = bad
    assert not over, (
        f"queries gained shuffles/scans vs tests/shuffle_budget.json: {over}"
        " — if intentional, regenerate with python tests/gen_shuffle_budget.py"
        " and justify the new counts in the commit"
    )
    assert not missing, (
        f"new queries without a shuffle budget: {missing} — run "
        "python tests/gen_shuffle_budget.py"
    )
