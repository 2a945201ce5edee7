"""The hardware-evidence perf-regression tripwire (VERDICT r3 item 5):
pure-host logic, testable without the chip."""
import importlib.util
import os
import sys

import pytest

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture()
def evidence_mod():
    spec = importlib.util.spec_from_file_location(
        "hardware_evidence", os.path.join(ROOT, "tools",
                                          "hardware_evidence.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _prev(values):
    return {"head": "abc123",
            "bench": {k: {"value": v} for k, v in values.items()}}


def test_flags_over_5pct_drop(evidence_mod):
    prev = _prev({"2048_fast": 2.0e9})
    now = {"2048_fast": {"value": 1.8e9}}
    regs = evidence_mod.check_regressions(now, prev)
    assert len(regs) == 1
    assert regs[0]["bench"] == "2048_fast"
    assert regs[0]["prev_head"] == "abc123"
    assert regs[0]["ratio"] == 0.9


def test_tolerates_variance_band(evidence_mod):
    prev = _prev({"2048_fast": 2.0e9, "512_fast": 2.3e9})
    now = {"2048_fast": {"value": 1.91e9},      # -4.5%: inside the band
           "512_fast": {"value": 2.5e9}}        # improvement
    assert evidence_mod.check_regressions(now, prev) == []


def test_new_and_missing_metrics_pass(evidence_mod):
    prev = _prev({"2048_fast": 2.0e9})
    now = {"8192_fast": {"value": 1.5e9},       # new metric: no baseline
           "2048_fast": {"rc": 1}}              # failed run: rc gate catches
    assert evidence_mod.check_regressions(now, prev) == []
    assert evidence_mod.check_regressions(now, {}) == []


def test_env_skip(evidence_mod, monkeypatch):
    monkeypatch.setenv("CFD_EVIDENCE_BASELINE", "skip")
    prev = _prev({"2048_fast": 2.0e9})
    now = {"2048_fast": {"value": 1.0e9}}
    assert evidence_mod.check_regressions(now, prev) == []


def test_baseline_sticks_after_flag(evidence_mod):
    """ADVICE r4: a flagged regression must NOT become the accepted
    baseline -- the comparison stays pinned to the last clean pass
    (prev['baseline_bench'] wins over prev['bench'])."""
    prev = {"head": "abc123",
            "bench": {"2048_fast": {"value": 1.7e9}},        # flagged run
            "baseline_bench": {"2048_fast": {"value": 2.0e9}}}  # clean bar
    # Recovered to 4% under the CLEAN bar: still flagged (vs the 1.7e9
    # last-run value it would pass).
    now = {"2048_fast": {"value": 1.8e9}}
    regs = evidence_mod.check_regressions(now, prev)
    assert len(regs) == 1 and regs[0]["prev"] == 2.0e9
    # Fully recovered: clean.
    assert evidence_mod.check_regressions(
        {"2048_fast": {"value": 1.96e9}}, prev) == []


@pytest.fixture()
def head_mod():
    spec = importlib.util.spec_from_file_location(
        "check_evidence_head", os.path.join(ROOT, "tools",
                                            "check_evidence_head.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_docs_only_classifier(head_mod):
    """The round-close gate's stale-evidence classifier: docs and round
    artifacts do not invalidate a run; code/tests/bench do."""
    for p in ("STATUS.md", "docs/PERF.md", "docs/sub/deep.md",
              "BENCH_r05.json", "MULTICHIP_r05.json", "PROGRESS.jsonl",
              "COPYCHECK.json", "out/plot.png"):
        assert head_mod.is_docs_only(p), p
    for p in ("cfd_demo_tpu/ops/poisson.py", "tests/test_shmap.py",
              "bench.py", "tools/hardware_evidence.py", "native/geom.cpp",
              "__graft_entry__.py", "pyproject.toml"):
        assert not head_mod.is_docs_only(p), p
