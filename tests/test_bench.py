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


def test_dinov2_flops_scan_trip_scaled():
    """The standalone dinov2 row and the pipeline split share ONE FLOP
    accounting (bench.dinov2_extract_flops), which must apply the
    lax.scan trip-count correction — round-4 verdict weak #2: the
    standalone row printed the raw (body-counted-once) number, a ~24x
    undercount vs the pipeline split for the same executable."""
    import jax
    import jax.numpy as jnp

    from d3fields_tpu.models import dinov2 as dv2
    from d3fields_tpu.utils.profiling import xla_flops

    cfg = dv2.Dinov2Config.tiny_test()
    params = dv2.init_params(jax.random.PRNGKey(0), cfg)
    bb = dv2.Dinov2Backbone(params, cfg, compute_dtype="float32")
    H, W = 40, 40
    imgs = (np.random.RandomState(0).rand(1, H, W, 3) * 255).astype(np.uint8)
    fl = bench.dinov2_extract_flops(bb, imgs, H, W)
    if fl is None:
        pytest.skip("backend exposes no cost analysis")
    ph, pw = H // 10, W // 10
    P = cfg.patch_size
    raw = xla_flops(dv2._extract_patch_features, params, jnp.asarray(imgs),
                    bb.interpolated_pos_embed(ph, pw), (ph * P, pw * P),
                    cfg.num_heads, "float32")
    assert fl == raw * cfg.num_layers
    assert fl > raw  # the correction actually fires (num_layers > 1)


def test_rows_artifact_roundtrip(tmp_path):
    """write_rows_artifact produces the diffable all-rows record
    (round-4 verdict next #3): headline + per-stage rows, parseable."""
    path = str(tmp_path / "rows.json")
    headline = {"metric": "batch_eval_pts_per_sec", "value": 1.0,
                "unit": "pts/s", "vs_baseline": 2.0, "degraded": False}
    rows = {"xmem_step_f32_ms": 66.4, "first_frame_ms": 2502.0}
    bench.write_rows_artifact(headline, rows, path)
    rec = json.load(open(path))
    assert rec["headline"]["metric"] == "batch_eval_pts_per_sec"
    assert rec["rows"]["first_frame_ms"] == 2502.0
    assert rec["rows"]["xmem_step_f32_ms"] == 66.4


def test_bench_stage_functions_return_rows():
    """Every --all stage contributes machine-readable rows; pin the cheap
    ones end-to-end on tiny shapes (pipeline/grounded-sam are exercised on
    the chip; their return schema is pinned by the same dict contract)."""
    import jax

    from d3fields_tpu.config import XMemConfig
    from d3fields_tpu.models import dinov2 as dv2

    xrow = bench.bench_xmem(
        num_views=1, H=64, W=64, num_obj=1, frames=1,
        base_cfg=XMemConfig(key_dim=8, value_dim=16, hidden_dim=8,
                            top_k=16, size=-1))
    assert xrow["xmem_step_f32_ms"] > 0
    assert xrow["xmem_step_bf16_ms"] > 0
    drow = bench.bench_dinov2(num_views=1, H=40, W=40,
                              cfg=dv2.Dinov2Config.tiny_test())
    assert drow["dinov2_extract_ms"] > 0
    trow = bench.bench_train(batch=1, T=3, num_obj=1, H=32, W=32, steps=1)
    assert trow["xmem_train_step_ms"] > 0
