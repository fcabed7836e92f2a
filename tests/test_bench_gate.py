"""Bench harness trustworthiness (VERDICT r5 perf task #1): round 5
proved 27% same-code headline variance on single-shot timings, so the
bench now reports median-of-N with spread and gates regressions on a
dual (absolute AND relative) threshold. These tests pin the gate logic
and prove an injected slowdown actually fires it — no Spark needed."""

from __future__ import annotations

import bench


def test_gate_fires_on_real_regression():
    # 1.0s -> 2.0s: +1.0s absolute (>0.75) and +100% relative (>30%)
    assert bench.regression_gate({"q": 2.0}, {"q": 1.0}) == {"q": 1.0}


def test_gate_dual_threshold_suppresses_noise():
    # big relative, small absolute: a 0.1s query jittering to 0.5s
    assert bench.regression_gate({"q": 0.5}, {"q": 0.1}) == {}
    # big absolute, small relative: a 10s query drifting to 10.8s (8%)
    assert bench.regression_gate({"q": 10.8}, {"q": 10.0}) == {}
    # under the absolute floor even at +200%
    assert bench.regression_gate({"q": 0.9}, {"q": 0.3}) == {}
    # improvements and new queries never flag
    assert bench.regression_gate({"q": 0.5, "new": 9.9}, {"q": 2.0}) == {}


def test_gate_thresholds_are_parameterizable():
    flagged = bench.regression_gate(
        {"q": 0.2}, {"q": 0.1}, abs_floor=0.05, rel=0.3
    )
    assert flagged == {"q": 0.1}


def test_injected_slowdown_reaches_the_median_and_fires_the_gate():
    """End-to-end through the timing path: the injection lands inside
    the timed region of EVERY rep, so the median (not just the max)
    carries it, and the gate flags the query vs its previous value."""
    med, spread = bench.time_query(
        "victim", lambda: None, reps=3, inject={"victim": 0.05}
    )
    assert med >= 0.05
    baseline = {"victim": 0.001}
    flagged = bench.regression_gate(
        {"victim": med}, baseline, abs_floor=0.02, rel=0.3
    )
    assert "victim" in flagged


def test_inject_map_parses_env(monkeypatch):
    monkeypatch.setenv(
        "SPARK_GRAFT_BENCH_INJECT", "tpch_q3_shipping_priority:1.5, junk, x:0.2"
    )
    assert bench._inject_map() == {
        "tpch_q3_shipping_priority": 1.5,
        "x": 0.2,
    }


def test_prev_bench_reports_basis():
    """r1-r5 files predate the basis marker: the loader must return
    basis=None for them so the gate stays disarmed against min-of-2
    numbers (medians sit systematically above mins)."""
    queries, basis = bench._prev_bench()
    assert isinstance(queries, dict)
    if queries:  # repo carries r1-r5 capture files (no basis marker yet)
        assert basis is None or basis == bench.BENCH_BASIS
