"""bench.py tunnel-acquisition logic (VERDICT r04 #1).

The scoreboard consumer reads bench.py's one JSON line, so the retry
ladder and the degraded marker are contract surface: probe in fresh
subprocesses with escalating waits, and any CPU fallback row must carry
``degraded: true``.  These tests exercise the scheduling logic with the
probe mocked — the real tunnel path is exercised by the driver.
"""

import importlib.util
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def benchmod():
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(REPO, "bench.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_probe_schedule_outlasts_documented_outages(benchmod):
    """CLAUDE.md documents 20+ min tunnel-down phases; the total probe
    budget (timeouts + sleeps) must exceed that."""
    total = sum(t + s for t, s in benchmod.PROBE_SCHEDULE)
    assert total >= 20 * 60, total


def test_probe_subprocess_false_on_timeout(benchmod, monkeypatch):
    def fake_run(*a, **k):
        raise subprocess.TimeoutExpired(cmd="x", timeout=k.get("timeout"))

    monkeypatch.setattr(benchmod.subprocess, "run", fake_run)
    assert benchmod._probe_tunnel_subprocess(1.0) is False


def test_probe_subprocess_true_on_success(benchmod, monkeypatch):
    class R:
        returncode = 0

    monkeypatch.setattr(benchmod.subprocess, "run", lambda *a, **k: R())
    assert benchmod._probe_tunnel_subprocess(1.0) is True


def test_acquire_device_degraded_fallback(benchmod, monkeypatch):
    """All probes fail -> re-exec carries the DEGRADED markers."""
    monkeypatch.setattr(benchmod, "PROBE_SCHEDULE", [(0.1, 0), (0.1, 0)])
    monkeypatch.setattr(
        benchmod, "_probe_tunnel_subprocess", lambda t: False
    )
    captured = {}

    def fake_reexec(extra_env, keep_axon):
        captured.update(extra_env)
        captured["keep_axon"] = keep_axon
        raise SystemExit(0)  # stand-in for execve never returning

    monkeypatch.setattr(benchmod, "_reexec", fake_reexec)
    monkeypatch.delenv("VW_BENCH_CPU_FALLBACK", raising=False)
    with pytest.raises(SystemExit):
        benchmod._acquire_device()
    assert captured["VW_BENCH_DEGRADED"] == "1"
    assert captured["VW_BENCH_CPU_FALLBACK"] == "1"
    assert captured["keep_axon"] is False
