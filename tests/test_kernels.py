"""Pallas fused-eval kernel parity (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from d3fields_tpu.fields import fusion as ffusion
from d3fields_tpu.fields import geometry, kernels
from d3fields_tpu.fields.state import state_from_obs


def _state(scene):
    return state_from_obs(scene, dino_feats=scene["dino_feats"], mask=scene["mask"], mu=0.02)


@pytest.fixture(scope="module")
def qpts():
    rs = np.random.RandomState(3)
    sphere = rs.randn(300, 3)
    sphere /= np.linalg.norm(sphere, axis=1, keepdims=True)
    near = np.array([0, 0, 0.06]) + sphere * (0.12 + rs.uniform(-0.03, 0.03, (300, 1)))
    return np.concatenate([near, rs.uniform(-1, 1, (84, 3))]).astype(np.float32)


def test_fused_weighted_interp_matches_gather(rng):
    V, h, w, C = 3, 6, 8, 130
    N = 77
    feats = rng.standard_normal((V, h, w, C)).astype(np.float32)
    xy = rng.uniform(-5, 70, size=(V, N, 2)).astype(np.float32)
    vw = rng.uniform(0, 1, size=(V, N)).astype(np.float32)
    H, W = 48, 64

    idx, tw = jax.vmap(lambda p: geometry.bilinear_taps(jnp.asarray(p), (H, W), (h, w)))(
        jnp.asarray(xy)
    )
    tw = tw * jnp.asarray(vw)[..., None]
    out = kernels.fused_weighted_interp(
        jnp.asarray(feats).reshape(V, h * w, C), idx, tw,
        point_tile=32, interpret=True, matmul_dtype="float32",
    )

    ref = 0
    for v in range(V):
        tap = geometry.sample_map_bilinear(jnp.asarray(feats[v]), jnp.asarray(xy[v]), (H, W))
        ref = ref + np.asarray(tap) * vw[v][:, None]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_eval_field_fused_matches_reference_impl(scene, qpts):
    st = _state(scene)
    names = ("dino_feats", "mask")
    base = ffusion.eval_field(st, jnp.asarray(qpts), names)
    fused = kernels.eval_field_fused(st, jnp.asarray(qpts), names)
    np.testing.assert_array_equal(np.asarray(fused["valid_mask"]), np.asarray(base["valid_mask"]))
    np.testing.assert_allclose(np.asarray(fused["dist"]), np.asarray(base["dist"]), rtol=1e-5, atol=1e-6)
    for k in names:
        np.testing.assert_allclose(np.asarray(fused[k]), np.asarray(base[k]), rtol=1e-4, atol=1e-5)
    # precomputed packed-corner table (the form batch_eval hoists out of the
    # tile loop) must be identical to the inline path
    packed = kernels.pack_corner_table(st, names)
    pre = kernels.eval_field_fused(st, jnp.asarray(qpts), names, packed_table=packed)
    for k in ("dist",) + names:
        np.testing.assert_array_equal(np.asarray(pre[k]), np.asarray(fused[k]))


@pytest.mark.slow
def test_bf16_descriptor_drift_within_budget(rng):
    """The TPU-default bf16 interpolation matmul must stay inside the
    <1e-3 descriptor cosine-error budget (BASELINE.json north star; the
    reference's fp16-vs-fp32 drift harness, ``fusion.py:1729-1744``)."""
    V, h, w, C = 4, 24, 32, 1024
    H, W = 240, 320
    N = 513
    feats = rng.standard_normal((V, h * w, C)).astype(np.float32)
    xy = rng.uniform(0, 300, size=(V, N, 2)).astype(np.float32)
    vw = rng.uniform(0, 1, size=(V, N)).astype(np.float32)
    idx, tw = jax.vmap(lambda p: geometry.bilinear_taps(jnp.asarray(p), (H, W), (h, w)))(
        jnp.asarray(xy)
    )
    tw = tw * jnp.asarray(vw)[..., None]
    f = jnp.asarray(feats)
    hi = np.asarray(kernels.fused_weighted_interp(
        f, idx, tw, interpret=True, matmul_dtype="float32"))
    lo = np.asarray(kernels.fused_weighted_interp(
        f, idx, tw, interpret=True, matmul_dtype="bfloat16"))
    keep = np.linalg.norm(hi, axis=-1) > 1e-3
    cos = np.sum(hi * lo, -1) / (
        np.linalg.norm(hi, axis=-1) * np.linalg.norm(lo, axis=-1) + 1e-12
    )
    assert (1.0 - cos[keep]).max() < 1e-3


def test_batch_eval_pallas_path_matches(scene, qpts):
    st = _state(scene)
    names = ("dino_feats", "mask")
    base = ffusion.batch_eval(st, qpts, names, tile=128, use_pallas=False)
    fused = ffusion.batch_eval(st, qpts, names, tile=128, use_pallas=True)
    np.testing.assert_allclose(np.asarray(fused["dist"]), np.asarray(base["dist"]), rtol=1e-5, atol=1e-6)
    for k in names:
        np.testing.assert_allclose(np.asarray(fused[k]), np.asarray(base[k]), rtol=1e-4, atol=1e-5)


def test_packed_taps_adversarial_coords(rng):
    """Packed 2x2-corner readout vs the oracle samplers on adversarial
    image-space points: exact pixel centers, half-pixel boundaries, the
    image border, just-outside, and far-outside points."""
    H, W = 48, 64
    V = 1
    C = 3
    img = rng.standard_normal((H, W, C)).astype(np.float32)
    depth = rng.uniform(0.5, 1.0, (H, W)).astype(np.float32) + 1.0

    xs = np.array([0.0, 1.0, 0.5, 31.5, 62.999, 63.0, -0.4, -0.6, 63.4,
                   63.6, -50.0, 200.0, 17.25, 17.75], np.float32)
    ys = np.array([0.0, 2.0, 0.5, 23.5, 46.999, 47.0, -0.4, -0.6, 47.4,
                   47.6, -9.0, 100.0, 31.25, 0.0], np.float32)
    xy = jnp.asarray(np.stack(np.meshgrid(xs, ys), -1).reshape(-1, 2))

    # oracle: the grid_sample-parity samplers (torch-verified elsewhere)
    ref_bil = np.asarray(geometry.sample_map_bilinear(jnp.asarray(img), xy, (H, W)))
    ref_nn = np.asarray(
        geometry.sample_map_nearest(jnp.asarray(depth[..., None]), xy, (H, W))
    )[:, 0]

    # packed path
    from d3fields_tpu.fields.state import FieldState

    st = FieldState(
        depth=jnp.asarray(depth[None]),
        pose=jnp.asarray(np.eye(3, 4, dtype=np.float32)[None]),
        K=jnp.asarray(np.eye(3, dtype=np.float32)[None]),
        mask=jnp.asarray(img[None]),
    )
    packed = kernels.pack_corner_table(st, ("mask",))
    base, bw, sel, ninb = kernels._fullres_taps_packed(xy, (H, W))
    rows = jnp.take(packed[0], base, axis=0).reshape(xy.shape[0], 4, 1 + C)
    got_nn = np.asarray((rows[..., 0] * sel).sum(-1) * ninb)
    got_bil = np.asarray((rows[..., 1:] * bw[..., None]).sum(axis=1))

    np.testing.assert_allclose(got_nn, ref_nn, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(got_bil, ref_bil, rtol=1e-5, atol=1e-6)
