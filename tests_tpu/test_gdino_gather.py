"""On-chip gate for the corner-table deformable-attention gather.

The CPU tier pins the corner-table layout against the per-corner masked
reference sampler (tests/test_groundingdino.py); THIS gate runs the same
core on the real chip and compares against the CPU result — TPU lowering
(vector-lane gathers, f32 floor/clip on the index path) is where a
hand-rolled gather layout could silently diverge, exactly like the field
kernels' Pallas parity gate (tests_tpu/test_pallas_parity.py).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def _inputs(seed=0):
    import jax.numpy as jnp

    rs = np.random.RandomState(seed)
    B, nh, hd, P = 2, 4, 8, 4
    shapes = ((13, 17), (7, 9), (4, 5))
    S = sum(h * w for h, w in shapes)
    Q = S
    value = rs.randn(B, S, nh, hd).astype(np.float32)
    # locations spanning in-bounds, borders, and out-of-bounds
    loc = rs.uniform(-0.2, 1.2, (B, Q, nh, len(shapes), P, 2)).astype(
        np.float32)
    wgt = rs.rand(B, Q, nh, len(shapes), P).astype(np.float32)
    wgt /= wgt.sum(axis=(-2, -1), keepdims=True)
    return (jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(wgt))


def test_corner_table_gather_tpu_matches_cpu(tpu_backend):
    import jax.numpy as jnp

    from d3fields_tpu.models.groundingdino.model import (
        deformable_attention_core,
    )

    value, shapes, loc, wgt = _inputs()

    def run(backend, query_chunk):
        # placement follows the inputs (jit's device= param is deprecated)
        dev = jax.devices(backend)[0]
        f = jax.jit(
            lambda v, l, w: deformable_attention_core(
                v, shapes, l, w, query_chunk))
        return np.asarray(f(jax.device_put(value, dev),
                            jax.device_put(loc, dev),
                            jax.device_put(wgt, dev)))

    cpu = run("cpu", None)
    for qc in (None, 64):
        tpu = run("tpu", qc)
        np.testing.assert_allclose(
            tpu, cpu, rtol=1e-5, atol=1e-5,
            err_msg=f"TPU corner-table gather diverged (query_chunk={qc})")


def test_pallas_gather_tpu_matches_xla(tpu_backend):
    """The Mosaic deformable-gather kernel on the REAL chip == the XLA
    corner-table path, at shapes exercising multiple query tiles, the
    padded tail, and out-of-bounds samples — at the PRODUCTION head width
    (4*hd = 128 = one vector row; the kernel's hard requirement — the
    backend compiler crashes on sub-128-lane rows, so off-width heads
    fall back to XLA in deformable_attention_core). (The full 800-scale
    parity ran as a round-5 probe: max|d| = 0 vs the same-executable XLA
    gather at R=18,265, T=256, f32.)"""
    import jax.numpy as jnp

    from d3fields_tpu.models.groundingdino.gather_pallas import (
        concat_corner_tables, deformable_gather_pallas)
    from d3fields_tpu.models.groundingdino.model import (
        deformable_attention_core,
    )

    rs = np.random.RandomState(3)
    B, nh, hd, P = 2, 2, 32, 4
    shapes = ((13, 17), (7, 9), (4, 5))
    S = sum(h * w for h, w in shapes)
    Q = 300  # pads to 512 at T=256: tail tile exercised
    value = rs.randn(B, S, nh, hd).astype(np.float32)
    loc = rs.uniform(-0.2, 1.2, (B, Q, nh, len(shapes), P, 2)).astype(
        np.float32)
    wgt = rs.rand(B, Q, nh, len(shapes), P).astype(np.float32)
    wgt /= wgt.sum(axis=(-2, -1), keepdims=True)
    value, loc, wgt = map(jnp.asarray, (value, loc, wgt))
    xla = np.asarray(jax.jit(
        lambda v, l, w: deformable_attention_core(v, list(shapes), l, w))(
            value, loc, wgt))
    tables = concat_corner_tables(value, shapes)
    got = np.asarray(deformable_gather_pallas(tables, shapes, loc, wgt))
    np.testing.assert_allclose(got, xla, rtol=1e-5, atol=1e-5)


def test_forward_gather_impl_pallas_tpu(tpu_backend):
    """gather_impl="pallas" through the real forward on chip: the encoder
    gather runs the Mosaic kernel inside the one-executable transformer —
    this is the integration the detector's "auto" mode enables on TPU."""
    import jax.numpy as jnp

    pytest.importorskip("torch")
    pytest.importorskip("transformers")
    from d3fields_tpu.models.groundingdino.model import (
        GroundingDinoConfig, build_random_hf, convert_hf_state_dict,
        groundingdino_forward,
    )

    cfg = GroundingDinoConfig.tiny_test()
    hf = build_random_hf(cfg, seed=0)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_hf_state_dict(sd, cfg)
    rs = np.random.RandomState(0)
    px = jnp.asarray(rs.randn(1, 64, 64, 3).astype(np.float32))
    ids = np.array([[101, 10, 11, 1012, 12, 13, 1012, 102]], np.int64)
    l0, b0 = groundingdino_forward(params, cfg, px, ids)
    l1, b1 = groundingdino_forward(params, cfg, px, ids, "float32", None,
                                   "pallas")
    fin = np.isfinite(np.asarray(l0))
    assert (np.isfinite(np.asarray(l1)) == fin).all()
    np.testing.assert_allclose(np.asarray(l1)[fin], np.asarray(l0)[fin],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b0),
                               rtol=1e-4, atol=1e-4)
