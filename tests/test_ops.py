"""Tests for ops: FPS, SO(3), PCA."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from d3fields_tpu.ops import fps as fps_mod
from d3fields_tpu.ops import pca as pca_mod
from d3fields_tpu.ops import so3


def test_fps_device_matches_host(rng):
    pts = rng.standard_normal((500, 3)).astype(np.float32)
    s_np, idx_np, max_np = fps_mod.fps_np(pts, 32, init_idx=7)
    s_j, idx_j, max_j = fps_mod.fps(jnp.asarray(pts), 32, init_idx=7)
    np.testing.assert_array_equal(np.asarray(idx_j), np.asarray(idx_np))
    np.testing.assert_allclose(np.asarray(s_j), s_np, rtol=1e-5, atol=1e-6)
    assert abs(float(max_j) - max_np) < 1e-5


def test_fps_covers_space(rng):
    pts = rng.uniform(size=(2000, 3)).astype(np.float32)
    _, idx, max_resid = fps_mod.fps(jnp.asarray(pts), 64, init_idx=0)
    assert len(set(np.asarray(idx).tolist())) == 64
    # residual shrinks vs a random subset's coverage radius
    assert float(max_resid) < 0.35


def test_fps_valid_mask(rng):
    pts = rng.standard_normal((100, 3)).astype(np.float32)
    pts[50:] += 100.0  # far cluster that must be excluded
    valid = np.zeros(100, bool)
    valid[:50] = True
    _, idx, _ = fps_mod.fps(jnp.asarray(pts), 10, init_idx=0, valid=jnp.asarray(valid))
    assert np.asarray(idx).max() < 50


def test_so3_exp_matches_scipy(rng):
    w = rng.standard_normal((16, 3)).astype(np.float32)
    w[0] = 0.0  # identity
    w[1] = 1e-5  # near-identity stability
    R = np.asarray(so3.so3_exp(jnp.asarray(w)))
    R_ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, rtol=1e-4, atol=1e-5)


def test_rigid_transform_row_convention(rng):
    pts = rng.standard_normal((2, 50, 3)).astype(np.float32)
    w = rng.standard_normal((2, 3)).astype(np.float32) * 0.3
    t = rng.standard_normal((2, 3)).astype(np.float32)
    out = np.asarray(so3.rigid_transform_points(jnp.asarray(pts), jnp.asarray(w), jnp.asarray(t)))
    R = Rotation.from_rotvec(w).as_matrix()
    ref = np.einsum("ipk,ikj->ipj", pts, R) + t[:, None]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_pca_matches_sklearn(rng):
    from sklearn.decomposition import PCA

    X = rng.standard_normal((200, 64)).astype(np.float64)
    sk = PCA(n_components=3).fit(X)
    ours = pca_mod.PCAParams.fit(X, 3)
    np.testing.assert_allclose(np.abs(ours.components), np.abs(sk.components_), atol=1e-8)
    ref = sk.transform(X)
    out = np.asarray(pca_mod.pca_transform(jnp.asarray(X, jnp.float32), ours))
    np.testing.assert_allclose(out, ref.astype(np.float32), rtol=1e-3, atol=1e-3)

    adopted = pca_mod.PCAParams.from_sklearn(sk)
    out2 = np.asarray(pca_mod.pca_transform(jnp.asarray(X, jnp.float32), adopted))
    np.testing.assert_allclose(out2, ref.astype(np.float32), rtol=1e-3, atol=1e-3)


def test_pca_save_load(tmp_path, rng):
    X = rng.standard_normal((50, 16))
    p = pca_mod.PCAParams.fit(X, 3)
    path = str(tmp_path / "pca.pkl")
    p.save(path)
    q = pca_mod.PCAParams.load(path)
    np.testing.assert_array_equal(p.components, q.components)


def test_fps_rad_np_coverage_property():
    """Radius-terminated FPS (reference fps_rad, my_utils.py:465-476):
    every input point ends within `radius` of some sample, and samples are
    mutually farther apart than radius (except possibly the first pair)."""
    from d3fields_tpu.ops.fps import fps_rad_np

    rs = np.random.RandomState(0)
    np.random.seed(1)
    pcd = rs.rand(400, 3).astype(np.float32)
    r = 0.25
    out = fps_rad_np(pcd, r)
    d = np.linalg.norm(pcd[:, None] - out[None], axis=-1)
    assert d.min(axis=1).max() <= r + 1e-6          # coverage
    if out.shape[0] > 2:
        dd = np.linalg.norm(out[:, None] - out[None], axis=-1)
        dd[np.eye(out.shape[0], dtype=bool)] = np.inf
        # all but the final (radius-terminating) sample are > r apart
        assert np.sort(dd.min(axis=1))[1:-1].min() > r - 1e-6
