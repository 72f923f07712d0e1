"""Rigid tracking + keypoint selection tests.

A sphere carries analytic world-anchored descriptors; frame 2 moves the
sphere and regenerates descriptors anchored to the moved sphere. The tracker
must recover the translation through gradients of the field query.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import synthetic_scene

from d3fields_tpu.config import Boundaries, TrackingConfig
from d3fields_tpu.fields.state import state_from_obs
from d3fields_tpu.track import keypoints as kp
from d3fields_tpu.track import rigid

BOUNDS = Boundaries(-0.4, 0.4, -0.4, 0.4, -0.1, 0.4)
FDIM = 16


def descriptor_maps(scene, anchor, fdim=FDIM, seed=5):
    """Per-view patch descriptors = smooth function of (world - anchor)."""
    rs = np.random.RandomState(seed)
    Wmap = rs.randn(3, fdim) * 25.0
    V, H, W = scene["depth"].shape
    ph, pw = H // 10, W // 10
    feats = np.zeros((V, ph, pw, fdim), np.float32)
    for v in range(V):
        K = scene["K"][v]
        pose = scene["pose"][v]
        R, t = pose[:, :3], pose[:, 3]
        ys = np.rint(np.arange(ph) * (H - 1) / (ph - 1)).astype(int)
        xs = np.rint(np.arange(pw) * (W - 1) / (pw - 1)).astype(int)
        d = scene["depth"][v][np.ix_(ys, xs)]
        xg, yg = np.meshgrid(xs, ys)
        Xc = (xg - K[0, 2]) * d / K[0, 0]
        Yc = (yg - K[1, 2]) * d / K[1, 1]
        pts_cam = np.stack([Xc, Yc, d], axis=-1)
        world = (pts_cam - t) @ R  # R^T (p - t): cam -> world
        rel = world - anchor
        f = np.sin(rel @ Wmap)
        f[d <= 0] = 0.0
        feats[v] = f
    return feats


def make_frame(center0, delta):
    center = np.asarray(center0) + np.asarray(delta)
    scene = synthetic_scene(
        num_views=4, H=128, W=160, spheres=[(center, 0.09)], ground=True, focal=240.0
    )
    scene["dino_feats"] = descriptor_maps(scene, anchor=center)
    return scene, center


@pytest.fixture(scope="module")
def frames():
    c0 = np.array([-0.05, 0.0, 0.06])
    f0, _ = make_frame(c0, [0, 0, 0])
    f1, c1 = make_frame(c0, [0.008, -0.006, 0.0])
    return f0, f1, np.array([0.008, -0.006, 0.0])


def _state(scene):
    return state_from_obs(scene, dino_feats=scene["dino_feats"], mask=scene["mask"], mu=0.02)


def test_rigid_tracking_recovers_translation(frames):
    f0, f1, true_delta = frames
    st0, st1 = _state(f0), _state(f1)

    # keypoints on the frame-0 sphere surface
    sphere = f0["sphere_masks"][:, 0]
    import d3fields_tpu.fields.geometry as G

    V = 4
    pad = np.tile(np.array([[[0, 0, 0, 1.0]]], np.float32), (V, 1, 1))
    poses44 = np.concatenate([f0["pose"], pad], axis=1)
    pts = G.aggregate_masked_points_np(f0["depth"], f0["K"], poses44, masks=sphere)
    from d3fields_tpu.ops.fps import fps_np

    samples, _, _ = fps_np(pts, 64, init_idx=0)
    import d3fields_tpu.fields.fusion as ff

    src_feats = np.asarray(
        ff.eval_field_jit(st0, jnp.asarray(samples, jnp.float32), ("dino_feats",))["dino_feats"]
    )

    out = rigid.rigid_tracking(
        st1,
        {"sphere": {"src_feats": src_feats}},
        [samples],
        BOUNDS,
        rand_ptcl_num=64,
        cfg=TrackingConfig(lr=0.01, iters=100),
    )
    est_t = out["t"][0]
    # row convention: points move by ~R*delta + t; R ~= I here
    np.testing.assert_allclose(est_t, true_delta, atol=4e-3)

    moved = out["match_pts_list"][0]
    err = np.linalg.norm(moved - (samples + true_delta), axis=1)
    assert np.median(err) < 5e-3

    # total loss decreased
    hist = out["loss_history"].sum(axis=1)
    assert hist[-1] < hist[0] * 0.8


def test_select_keypoints(frames):
    f0, _, _ = frames
    st = _state(f0)
    # consensus: background + sphere via the real pipeline-lite path
    onehot = np.zeros(f0["depth"].shape + (2,), np.float32)
    onehot[..., 1] = f0["sphere_masks"][:, 0]
    onehot[..., 0] = 1.0 - onehot[..., 1]
    st = st.replace(mask=jnp.asarray(onehot))

    feats, pts, ids = kp.select_keypoints(
        st, ["background", "ball"], Boundaries(-0.2, 0.1, -0.12, 0.12, -0.02, 0.16),
        32, res=0.004, init_idx=0,
    )
    assert ids == [1]
    assert pts[0].shape == (32, 3) and feats[0].shape == (32, FDIM)
    # keypoints on the sphere surface
    r = np.linalg.norm(pts[0] - np.array([-0.05, 0.0, 0.06]), axis=1)
    assert np.abs(r - 0.09).max() < 0.015


def test_project_to_view(frames):
    f0, _, _ = frames
    pts = np.array([[-0.05, 0.0, 0.15]])
    uv = kp.project_to_view(pts, f0["pose"][0], f0["K"][0])
    H, W = f0["depth"].shape[1:]
    assert 0 <= uv[0, 0] < W and 0 <= uv[0, 1] < H


def test_select_keypoints_from_depth_fixed_size(frames):
    """Every instance must yield exactly V * num_per_cam points even when a
    view's eroded mask is tiny or empty (the per-instance sets are stacked
    by rigid_tracking)."""
    f0, _, _ = frames
    st = _state(f0)
    V, H, W = f0["depth"].shape
    onehot = np.zeros((V, H, W, 3), np.float32)
    onehot[..., 1] = f0["sphere_masks"][:, 0]
    # instance 2: visible in view 0 only, and only a few pixels (forces both
    # the duplication-padding and the empty-view padding paths)
    onehot[0, 2:6, 2:40, 2] = 1.0
    onehot[..., 0] = 1.0 - onehot[..., 1:].sum(-1).clip(0, 1)
    st = st.replace(mask=jnp.asarray(onehot))

    feats, pts, ids = kp.select_keypoints_from_depth(
        st, ["background", "ball", "cube"], 8, erode_px=1,
    )
    assert ids == [1, 2]
    for p, f in zip(pts, feats):
        assert p.shape == (V * 8, 3)
        assert f.shape == (V * 8, FDIM)


def test_select_src_feats_at_pixels_matches_torch_interpolate():
    """Headless keypoint-picker parity: two-tap sampling at pixels equals
    F.interpolate(align_corners=False) upsample + integer indexing (the
    reference picker's feature readout, my_utils.py:824-856)."""
    import torch
    import torch.nn.functional as F

    rs = np.random.RandomState(0)
    ph, pw, D = 6, 8, 5
    H, W = 60, 80
    fm = rs.randn(ph, pw, D).astype(np.float32)
    up = F.interpolate(
        torch.from_numpy(fm).permute(2, 0, 1)[None], size=(H, W),
        mode="bilinear", align_corners=False,
    )[0].permute(1, 2, 0).numpy()
    pixels = np.stack([rs.randint(0, W, 40), rs.randint(0, H, 40)], axis=1)
    got = kp.select_src_feats_at_pixels(fm, pixels, (H, W))
    ref = up[pixels[:, 1], pixels[:, 0]]
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
