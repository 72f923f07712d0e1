"""Bench fallback/probe logic: a CPU fallback row must be retried first
and unmistakably marked, so a transient tunnel outage can never be
recorded as the round's TPU headline (round-3 verdict weak #1)."""

import json
import sys

import numpy as np
import pytest

sys.path.insert(0, ".")  # bench.py lives at the repo root
import bench  # noqa: E402


def test_probe_retries_with_backoff_before_demoting():
    calls = []
    sleeps = []

    def probe(timeout_s):
        calls.append(timeout_s)
        return False

    alive = bench._default_backend_alive(
        timeout_s=5, attempts=3, backoff_s=7, probe=probe,
        sleep=sleeps.append)
    assert alive is False
    assert calls == [5, 5, 5]        # every attempt ran
    assert sleeps == [7, 7]          # backoff between attempts, not after


def test_probe_recovers_mid_retry():
    state = {"n": 0}

    def probe(timeout_s):
        state["n"] += 1
        return state["n"] >= 2  # tunnel comes back on the second attempt

    sleeps = []
    alive = bench._default_backend_alive(
        timeout_s=5, attempts=3, backoff_s=7, probe=probe,
        sleep=sleeps.append)
    assert alive is True
    assert state["n"] == 2 and sleeps == [7]


def test_fallback_flag_plumbing(monkeypatch, capsys):
    """Probe exhausted -> degraded=true + backend=cpu in the JSON (heavy
    stages stubbed; the slow-tier test below runs the real fallback)."""
    monkeypatch.setattr(bench, "_default_backend_alive",
                        lambda *a, **k: False)
    monkeypatch.setattr(bench, "bench_tpu", lambda *a, **k: 1e5)
    monkeypatch.setattr(bench, "parity_check",
                        lambda *a, **k: {"ok": True})
    monkeypatch.setattr(bench, "bench_torch_reference",
                        lambda *a, **k: (1e4, [1.0, 1.0, 1.0]))
    bench.main([])
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["backend"] == "cpu" and row["degraded"] is True


@pytest.mark.slow
def test_fallback_row_is_marked_degraded(monkeypatch, capsys):
    """Probe exhausted -> the REAL CPU-fallback bench (Pallas interpret
    rows + torch oracle baseline, ~40 s) produces a well-formed degraded
    record."""
    monkeypatch.setattr(bench, "_default_backend_alive",
                        lambda *a, **k: False)
    bench.main([])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    row = json.loads(out)
    assert row["backend"] == "cpu"
    assert row["degraded"] is True
    assert row["metric"] == "batch_eval_pts_per_sec"
    assert len(row["baseline_reps_s"]) >= 3
    assert row["parity"]["ok"] is True
    assert row["value"] > 0


def test_healthy_row_not_degraded(monkeypatch, capsys):
    """--no_probe (healthy chip) -> degraded=false. The heavy stages are
    stubbed: this pins only the flag plumbing (the degraded test above
    runs the real CPU fallback path end-to-end)."""
    monkeypatch.setattr(bench, "bench_tpu", lambda *a, **k: 1e6)
    monkeypatch.setattr(bench, "parity_check",
                        lambda *a, **k: {"ok": True})
    monkeypatch.setattr(bench, "bench_torch_reference",
                        lambda *a, **k: (1e5, [1.0, 1.0, 1.0]))
    bench.main(["--no_probe"])
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["degraded"] is False
    assert row["vs_baseline"] == 10.0
