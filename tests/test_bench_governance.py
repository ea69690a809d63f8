"""Pure-python tests of bench.py's frozen-baseline governance — the
audit-trail invariants a measurement harness must not corrupt (review
r9): a duplicated name in --rebase-extras must not destroy the true
frozen value in the extension record, and an empty name list must not
"succeed" into a junk extension write. No Spark involved."""

from __future__ import annotations

import json

import bench


def _plant_baseline(tmp_path, monkeypatch):
    base = {
        "sf": 0.1,
        "value": 1.0,
        "queries": {"q1": 1.0},
        "extras": {"x": 2.0, "y": 3.0},
        "extensions": [],
    }
    p = tmp_path / "BASELINE_BENCH.json"
    p.write_text(json.dumps(base))
    monkeypatch.setattr(bench, "BASELINE_PATH", str(p))
    return p


def test_rebase_extras_dedupes_names(tmp_path, monkeypatch):
    p = _plant_baseline(tmp_path, monkeypatch)
    monkeypatch.setenv("SPARK_GRAFT_REBASE_REASON", "unit test")
    out = {"sf": 0.1, "queries": {}, "extras": {"x": 9.0}}
    bench._rebase_extras(out, ["x", "x"])
    base = json.loads(p.read_text())
    assert base["extras"]["x"] == 9.0
    rec = base["extensions"][-1]["rebased_extras"]
    # the TRUE frozen value survives in the audit record — a second pass
    # over the duplicated name must not overwrite old with new
    assert rec == {"x": {"old": 2.0, "new": 9.0}}


def test_rebase_extras_refuses_empty_names(tmp_path, monkeypatch):
    p = _plant_baseline(tmp_path, monkeypatch)
    monkeypatch.setenv("SPARK_GRAFT_REBASE_REASON", "unit test")
    before = p.read_text()
    bench._rebase_extras({"sf": 0.1, "queries": {}, "extras": {}}, [])
    assert p.read_text() == before, (
        "empty name list must leave the baseline file untouched"
    )


def test_rebase_extras_still_refuses_headline_and_unfrozen(
    tmp_path, monkeypatch
):
    p = _plant_baseline(tmp_path, monkeypatch)
    monkeypatch.setenv("SPARK_GRAFT_REBASE_REASON", "unit test")
    before = p.read_text()
    # unfrozen name
    bench._rebase_extras({"sf": 0.1, "queries": {}, "extras": {"z": 1.0}},
                         ["z"])
    assert p.read_text() == before
    # headline entries are never extras-rebaseable
    planted = json.loads(before)
    planted["extras"]["q1"] = 1.5
    p.write_text(json.dumps(planted))
    bench._rebase_extras(
        {"sf": 0.1, "queries": {"q1": 0.9}, "extras": {"q1": 0.9}}, ["q1"]
    )
    assert json.loads(p.read_text()) == planted


def test_compact_summary_is_tail_safe():
    """VERDICT r14 #3: the driver records only the LAST 2,000 chars of
    bench stdout, so the final compact line must (a) carry the
    verdict-critical fields, (b) omit the per-query ratio maps that
    would outgrow the tail, and (c) stay well under 2,000 chars for a
    realistic headline set so the line survives truncation whole."""
    headline = {f"q{i}_some_longish_headline_name": 1.234 for i in range(30)}
    out = {
        "metric": "headline_queries_total_time",
        "value": 27.004,
        "unit": "sec",
        "queries": headline,
        "sf": 0.1,
        "runs_per_query": 2,
        "agg": "min",
        "host_canary": {"sec": 0.433, "vs_frozen": 0.92},
        "vs_baseline": {n: 1.0 for n in headline},
        "vs_baseline_drift_normalized": {n: 1.0 for n in headline},
        "extras": {f"x{i}": 1.0 for i in range(160)},
        "extras_vs_baseline": {f"x{i}": 1.0 for i in range(160)},
        "extras_vs_baseline_drift_normalized": {
            f"x{i}": 1.0 for i in range(160)
        },
        "extras_regressions": ["d06_simhash_neardup"],
        "regressions": [],
        "regressions_raw": ["q1_pricing_summary"],
    }
    summary = bench._compact_summary(out)
    # verdict-critical fields present
    assert summary["value"] == 27.004
    assert summary["host_canary"] == {"sec": 0.433, "vs_frozen": 0.92}
    assert summary["regressions"] == []
    assert summary["regressions_raw"] == ["q1_pricing_summary"]
    assert summary["extras_regressions"] == ["d06_simhash_neardup"]
    assert summary["queries"] == headline
    # the bulky maps must NOT ride along
    for k in (
        "vs_baseline",
        "vs_baseline_drift_normalized",
        "extras",
        "extras_vs_baseline",
        "extras_vs_baseline_drift_normalized",
    ):
        assert k not in summary
    # and the rendered line fits the tail with margin
    line = json.dumps(summary)
    assert len(line) < 1900, len(line)
    # errors propagate when present (a truncated tail must still show
    # an errored run as errored)
    out["errors"] = {"q5": "boom"}
    assert bench._compact_summary(out)["errors"] == {"q5": "boom"}
