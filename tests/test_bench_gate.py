"""Unit tests for bench.py's Harness budget gate (no TPU, no timing).

The gate is the driver-facing safety property (VERDICT r4 item 1 /
round-5 cost-aware fix): a section whose measured-cost estimate would
overrun BENCH_BUDGET_S must be SKIPPED — not started and then killed
mid-flight by the driver — while cheaper sections after it still run.
Everything here monkeypatches module globals; nothing sleeps.
"""

import json
import time

import pytest

bench = pytest.importorskip("bench")


@pytest.fixture
def harness(monkeypatch, tmp_path):
    """A Harness writing to a throwaway detail file, with a fresh clock."""
    monkeypatch.setattr(bench, "T0", time.monotonic())
    monkeypatch.setattr(bench, "BUDGET_S", 100.0)
    monkeypatch.setattr(bench.Harness, "DETAIL_PATH",
                        str(tmp_path / "detail.json"))
    return bench.Harness()


def test_est_gate_skips_expensive_runs_cheap(harness):
    ran = []
    harness.section("cheap", lambda: ran.append("cheap"), est_s=5)
    # est alone overruns the budget -> skipped BEFORE starting
    harness.section("expensive", lambda: ran.append("expensive"), est_s=500)
    harness.section("cheap2", lambda: ran.append("cheap2"), est_s=5)
    assert ran == ["cheap", "cheap2"]
    assert harness.results["skipped"] == ["expensive"]
    assert harness.results["sections_run"] == ["cheap", "cheap2"]


def test_elapsed_past_budget_skips_even_free_sections(harness, monkeypatch):
    monkeypatch.setattr(bench, "T0", time.monotonic() - 101.0)
    ran = []
    harness.section("anything", lambda: ran.append("x"), est_s=0)
    assert ran == []
    assert harness.results["skipped"] == ["anything"]


def test_section_exception_is_isolated(harness):
    def boom():
        raise RuntimeError("flaky compile")

    harness.section("flaky", boom, est_s=1)
    ran = []
    harness.section("after", lambda: ran.append("after"), est_s=1)
    assert ran == ["after"]
    assert "flaky" in harness.results["errors"]
    # an errored section still counts as run (its partial rows flushed)
    assert harness.results["sections_run"] == ["flaky", "after"]


def test_serve_load_record_clears_inherited_marker(tmp_path):
    """serve_load --record writes a FRESH row: the bench merge-flush's
    inherited marker for it must be cleared (other markers untouched)."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "serve_load", os.path.join(root, "benchmarks", "serve_load.py"))
    sl = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sl)

    path = tmp_path / "detail.json"
    path.write_text(json.dumps({
        "configs": {"2_1080p_full": {"ms": 0.32}},
        "inherited_keys": ["serve_load", "temporal_8k"],
        "serve_load": {"req_per_s": 1.0},
    }))
    sl.record_result({"req_per_s": 2.0, "errors": []}, str(path))
    merged = json.loads(path.read_text())
    assert merged["serve_load"]["req_per_s"] == 2.0
    assert merged["inherited_keys"] == ["temporal_8k"]
    assert merged["configs"]["2_1080p_full"]["ms"] == 0.32  # untouched

    # tolerant of a missing record: creates one with just the row
    path2 = tmp_path / "fresh.json"
    sl.record_result({"req_per_s": 3.0}, str(path2))
    assert json.loads(path2.read_text())["serve_load"]["req_per_s"] == 3.0


def test_flush_merges_never_clobbers(harness, tmp_path):
    """A partial run must keep rows a prior complete record produced
    (VERDICT r4 item 1c)."""
    path = tmp_path / "detail.json"
    prior = {"configs": {"4_4k_full": {"ms": 1.4}},
             "temporal_1080p": {"ms_frame_plus_resolve_static": 0.4},
             "complete": True, "skipped": [], "errors": {},
             "sections_run": ["config 4"], "section_s": {"config 4": 20.0}}
    path.write_text(json.dumps(prior))

    harness.results["configs"]["2_1080p_full"] = {"ms": 0.32}
    harness.section("config 2", lambda: None, est_s=1)  # triggers flush

    merged = json.loads(path.read_text())
    # this run's row landed ...
    assert merged["configs"]["2_1080p_full"]["ms"] == 0.32
    # ... prior measurement rows survived and are marked inherited ...
    assert merged["configs"]["4_4k_full"]["ms"] == 1.4
    assert merged["temporal_1080p"]["ms_frame_plus_resolve_static"] == 0.4
    assert "temporal_1080p" in merged["inherited_keys"]
    # ... but run-descriptive keys describe THIS run, not the prior one
    assert merged["sections_run"] == ["config 2"]
    assert merged["complete"] is False
