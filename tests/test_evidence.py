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
