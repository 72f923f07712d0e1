"""Golden tests for L0 geometry vs a torch-CPU oracle.

The oracle re-derives the reference math (projection via K@[R|t] homogeneous
matmul, interpolation via F.grid_sample with the reference's (W-1)/(H-1)
normalization and align_corners=True) so our JAX kernels are pinned to the
exact semantics of reference fusion.py:32-77 without importing reference code.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from d3fields_tpu.fields import geometry
from d3fields_tpu.config import Boundaries


def torch_project(pts, Rt, K):
    pts = torch.as_tensor(pts)
    Rt = torch.as_tensor(Rt)
    K = torch.as_tensor(K)
    pn = pts.shape[0]
    hpts = torch.cat([pts, torch.ones(pn, 1, dtype=pts.dtype)], 1)
    KRt = K @ Rt
    last = torch.zeros(Rt.shape[0], 1, 4, dtype=pts.dtype)
    last[:, :, 3] = 1.0
    H = torch.cat([KRt, last], 1)
    cam = (H[:, None] @ hpts[None, :, :, None])[:, :, :3, 0]
    depth = cam[:, :, 2:]
    invalid = torch.abs(depth) < 1e-4
    depth = depth.clone()
    depth[invalid] = 1e-3
    xy = cam[:, :, :2] / depth
    return xy, ~invalid[..., 0], depth[..., 0]


def torch_grid_sample(maps, xy, image_hw, mode):
    """maps (V,h,w,C), xy (V,N,2) in image pixel space of (H,W)."""
    H, W = image_hw
    t = torch.as_tensor(maps).permute(0, 3, 1, 2)
    p = torch.as_tensor(xy)
    xn = p[..., 0] / (W - 1) * 2 - 1
    yn = p[..., 1] / (H - 1) * 2 - 1
    grid = torch.stack([xn, yn], -1).unsqueeze(1)
    out = F.grid_sample(t, grid, mode=mode, padding_mode="zeros", align_corners=True)
    return out.squeeze(2).permute(0, 2, 1).numpy()


@pytest.fixture
def proj_data(rng):
    pts = rng.standard_normal((200, 3)).astype(np.float32)
    # include points that project near/behind cameras
    pts[:20] *= 10.0
    Rt = rng.standard_normal((4, 3, 4)).astype(np.float32) * 0.5
    K = np.tile(np.array([[80.0, 0, 32], [0, 80, 24], [0, 0, 1]], np.float32), (4, 1, 1))
    return pts, Rt, K


def test_project_points_matches_torch(proj_data):
    pts, Rt, K = proj_data
    xy, valid, depth = geometry.project_points(jnp.asarray(pts), jnp.asarray(Rt), jnp.asarray(K))
    txy, tvalid, tdepth = torch_project(pts, Rt, K)
    np.testing.assert_allclose(np.asarray(xy), txy.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(valid), tvalid.numpy())
    np.testing.assert_allclose(np.asarray(depth), tdepth.numpy(), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("map_hw", [(48, 64), (4, 6)])
def test_interpolate_matches_grid_sample(rng, mode, map_hw):
    H, W = 48, 64
    h, w = map_hw
    V, N, C = 3, 500, 7
    maps = rng.standard_normal((V, h, w, C)).astype(np.float32)
    # points spanning in-bounds, edges, and far out-of-bounds
    xy = rng.uniform(-30, max(H, W) + 30, size=(V, N, 2)).astype(np.float32)
    xy[:, :50] = rng.uniform(0, min(H, W) - 1, size=(V, 50, 2)).astype(np.float32)

    ours = np.asarray(geometry.interpolate_maps(jnp.asarray(maps), jnp.asarray(xy), (H, W), mode=mode))
    ref = torch_grid_sample(maps, xy, (H, W), mode)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_create_grid_matches_torch_arange():
    b = Boundaries(-0.4, 0.4, -0.35, 0.35, -0.02, 0.2)
    step = 0.03
    coords, shape = geometry.create_grid(b, step)

    xs = torch.arange(b.x_lower, b.x_upper, step, dtype=torch.float32) + step / 2
    ys = torch.arange(b.y_lower, b.y_upper, step, dtype=torch.float32) + step / 2
    zs = torch.arange(b.z_lower, b.z_upper, step, dtype=torch.float32) + step / 2
    xx, yy, zz = torch.meshgrid(xs, ys, zs, indexing="ij")
    ref = torch.stack([xx, yy, zz], -1).reshape(-1, 3).numpy()
    assert shape == tuple(xx.shape)
    np.testing.assert_allclose(coords, ref, atol=1e-6)


def test_onehot_roundtrip(rng):
    inst = rng.integers(0, 5, size=(4, 16, 16)).astype(np.uint8)
    oh = geometry.instance_to_onehot(inst, 5)
    assert oh.shape == (4, 16, 16, 5) and oh.dtype == bool
    back = geometry.onehot_to_instance(oh.astype(np.float32))
    np.testing.assert_array_equal(back, inst)

    joh = geometry.instance_to_onehot(jnp.asarray(inst), 5)
    np.testing.assert_array_equal(np.asarray(joh), oh)


def test_voxel_hash_roundtrip(rng):
    b = Boundaries()
    vh = geometry.VoxelHash.from_boundaries(b, 0.03)
    pts = rng.uniform(low=[-0.39, -0.39, -0.19], high=[0.39, 0.29, 0.01], size=(300, 3))
    idx = vh.pcd_to_index(pts)
    assert idx.min() >= 0
    vox = vh.index_to_voxel(idx)
    np.testing.assert_array_equal(vh.voxel_to_index(vox), idx)
    centers = vh.index_to_pcd(idx)
    # voxel origin is within one voxel of the original point
    assert np.all(np.abs(centers - pts) <= 0.03 + 1e-9)


def test_backproject_depth_matches_host(rng, scene):
    depth = scene["depth"][0]
    K = scene["K"][0]
    full = np.asarray(geometry.backproject_depth(jnp.asarray(depth), jnp.asarray(K)))
    mask = depth > 0
    pts = geometry.depth_to_points_np(depth, np.ones_like(depth, bool), (K[0, 0], K[1, 1], K[0, 2], K[1, 2]))
    np.testing.assert_allclose(full[mask], pts, rtol=1e-5, atol=1e-6)


def test_aggregate_masked_points_in_bounds(scene):
    V = scene["depth"].shape[0]
    poses44 = np.concatenate(
        [scene["pose"], np.tile(np.array([[[0, 0, 0, 1.0]]], np.float32), (V, 1, 1))], axis=1
    )
    b = Boundaries(-0.2, 0.2, -0.2, 0.2, -0.1, 0.3)
    pts = geometry.aggregate_masked_points_np(
        scene["depth"], scene["K"], poses44, masks=scene["depth"] > 0, boundaries=b
    )
    assert pts.shape[0] > 100
    assert pts[:, 0].min() > b.x_lower and pts[:, 0].max() < b.x_upper
    # sphere surface points should be close to radius 0.12 around (0,0,0.06)
    r = np.linalg.norm(pts - np.array([0, 0, 0.06]), axis=1)
    assert np.abs(r - 0.12).mean() < 0.01


def test_voxel_downsample(rng):
    pts = rng.uniform(size=(1000, 3))
    down = geometry.voxel_downsample_np(pts, 0.25)
    assert down.shape[0] < pts.shape[0]
    assert down.shape[0] <= 4**3 + 30
