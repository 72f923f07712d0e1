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
