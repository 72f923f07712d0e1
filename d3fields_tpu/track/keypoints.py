"""Keypoint selection on the fused field.

Rebuild of ``select_features_rand`` / ``select_features_from_pcd``
(``fusion.py:1418-1606``): evaluate the field over a fine grid (or a given
cloud), keep near-surface points (|dist| < 5 mm) with instance probability
> 0.6, farthest-point-sample N keypoints per instance, and re-evaluate their
descriptors. The dense grid eval and FPS run on device; the per-instance
bookkeeping stays host-side.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from d3fields_tpu.fields import fusion as ffusion
from d3fields_tpu.fields.geometry import create_grid
from d3fields_tpu.fields.state import FieldState
from d3fields_tpu.ops.pointcloud_native import fps_native

DIST_THRESHOLD = 0.005
PROB_THRESHOLD = 0.6


def select_keypoints(
    state: FieldState,
    consensus_labels: Sequence[str],
    boundaries,
    num_per_instance: int,
    *,
    res: float = 0.001,
    per_instance: bool = True,
    init_idx: int = -1,
    pcd: Optional[np.ndarray] = None,
    tile: int = 32768,
) -> Tuple[List[np.ndarray], List[np.ndarray], List[int]]:
    """Returns (src_feats_list, src_pts_list, instance_ids).

    ``pcd`` switches from grid sampling (``select_features_rand``) to cloud
    sampling (``select_features_from_pcd``). ``init_idx=-1`` keeps the
    reference's random FPS seed; pass a fixed index for determinism.
    """
    if pcd is None:
        grid, _ = create_grid(boundaries, res)
        cand = grid.astype(np.float32)
    else:
        cand = np.asarray(pcd, np.float32)

    out = ffusion.batch_eval(state, cand, ("mask",), tile=tile)
    dist = np.asarray(out["dist"])
    valid = np.asarray(out["valid_mask"])
    mask = np.asarray(out["mask"])
    mask = mask / (mask.sum(axis=1, keepdims=True) + 1e-7)
    near_surface = np.abs(dist) < DIST_THRESHOLD

    src_feats_list: List[np.ndarray] = []
    src_pts_list: List[np.ndarray] = []
    instance_ids: List[int] = []
    last_label = consensus_labels[0]
    for i in range(1, len(consensus_labels)):
        if consensus_labels[i] == last_label and not per_instance:
            continue
        sel = (mask[:, i] > PROB_THRESHOLD) & near_surface & valid
        pts = cand[sel]
        if pts.shape[0] == 0:
            continue
        sample_pts, _ = fps_native(pts, num_per_instance, init_idx=init_idx)
        feats = ffusion.eval_field_jit(
            state, jnp.asarray(sample_pts, jnp.float32), ("dino_feats",)
        )["dino_feats"]
        src_feats_list.append(np.asarray(feats))
        src_pts_list.append(sample_pts)
        instance_ids.append(i)
        last_label = consensus_labels[i]
    return src_feats_list, src_pts_list, instance_ids


def project_to_view(
    pts: np.ndarray, pose34: np.ndarray, K: np.ndarray
) -> np.ndarray:
    """World points -> integer pixel coords in one view (visualization path,
    ``fusion.py:1459-1470``)."""
    h = np.concatenate([pts, np.ones((pts.shape[0], 1))], axis=-1)
    cam = (pose34 @ h.T)[:3].T
    uv = cam[:, :2] / cam[:, 2:]
    uv[:, 0] = uv[:, 0] * K[0, 0] + K[0, 2]
    uv[:, 1] = uv[:, 1] * K[1, 1] + K[1, 2]
    return uv.astype(np.int32)


def select_keypoints_from_depth(
    state: FieldState,
    consensus_labels: Sequence[str],
    num_per_cam: int,
    *,
    per_instance: bool = True,
    max_depth: float = 1.5,
    erode_px: int = 15,
    init_idx: int = 0,
) -> Tuple[List[np.ndarray], List[np.ndarray], List[int]]:
    """Depth-backprojection keypoint variant (``select_features_rand_v2``,
    ``fusion.py:1543-1606``): per camera, FPS over the eroded instance-mask
    PIXELS, backproject through the depth map to world, concatenate across
    cameras, and read descriptors from the field at those points.
    """
    import cv2

    depth = np.asarray(state.depth)
    Ks = np.asarray(state.K)
    poses = np.asarray(state.pose)
    mask = np.asarray(state.mask)
    V = depth.shape[0]

    src_feats_list: List[np.ndarray] = []
    src_pts_list: List[np.ndarray] = []
    instance_ids: List[int] = []
    last_label = consensus_labels[0]
    for i in range(1, len(consensus_labels)):
        if consensus_labels[i] == last_label and not per_instance:
            continue
        pts_all = []
        for v in range(V):
            m = mask[v, :, :, i].astype(bool)
            m &= (depth[v] > 0.0) & (depth[v] < max_depth)
            m = cv2.erode(
                (m * 255).astype(np.uint8),
                np.ones((erode_px, erode_px), np.uint8), iterations=1,
            ) > 0
            pix = np.argwhere(m).astype(np.float32)  # (n, 2) = (y, x)
            if pix.shape[0] == 0:
                continue
            # always request num_per_cam: fps_native pads small sets by
            # duplication (like the reference fps_np while-loop), so every
            # contributing view yields a FIXED-size point set and the
            # per-instance arrays stack in rigid_tracking
            sel, _ = fps_native(
                np.concatenate([pix, np.zeros_like(pix[:, :1])], 1),
                num_per_cam, init_idx=init_idx,
            )
            ys, xs = sel[:, 0].astype(int), sel[:, 1].astype(int)
            z = depth[v][ys, xs]
            K = Ks[v]
            cam = np.stack(
                [(xs - K[0, 2]) * z / K[0, 0], (ys - K[1, 2]) * z / K[1, 1], z],
                axis=1,
            )
            R, t = poses[v][:, :3], poses[v][:, 3]
            pts_all.append((cam - t) @ R)  # camera -> world
        if not pts_all:
            continue
        sample_pts = np.concatenate(pts_all, axis=0).astype(np.float32)
        # views with an empty eroded mask contribute nothing (the reference
        # asserts/crashes there); pad by duplication so every instance has
        # exactly V * num_per_cam points and the sets stack downstream
        want = V * num_per_cam
        if sample_pts.shape[0] < want:
            reps = np.resize(
                np.arange(sample_pts.shape[0]), want - sample_pts.shape[0]
            )
            sample_pts = np.concatenate([sample_pts, sample_pts[reps]], axis=0)
        feats = ffusion.eval_field_jit(
            state, jnp.asarray(sample_pts), ("dino_feats",)
        )["dino_feats"]
        src_feats_list.append(np.asarray(feats))
        src_pts_list.append(sample_pts)
        instance_ids.append(i)
        last_label = consensus_labels[i]
    return src_feats_list, src_pts_list, instance_ids


def select_src_feats_at_pixels(
    feat_map: np.ndarray, pixels: np.ndarray, image_hw: Tuple[int, int]
) -> np.ndarray:
    """Descriptors at image pixels — the reference's interactive DINOv2
    keypoint picker, headless (``select_src_feats_from_online``,
    ``utils/my_utils.py:781-860``): there the (ph, pw) patch map is
    bilinearly upsampled to image resolution (``F.interpolate``,
    align_corners=False) and read at clicked integer pixels. Here the same
    two-tap interpolation is evaluated only at the given (x, y) pixels —
    exact parity at O(N) instead of materializing the (H, W, 1024) map.
    """
    from d3fields_tpu.models.resize import _linear_weights_1d

    ph, pw = feat_map.shape[:2]
    H, W = image_hw
    ty, wy = _linear_weights_1d(ph, H)   # (H, 2) taps/weights
    tx, wx = _linear_weights_1d(pw, W)
    px = np.asarray(pixels, np.int64)
    xs, ys = px[:, 0], px[:, 1]
    out = 0.0
    for a in range(2):
        for b_ in range(2):
            w = (wy[ys, a] * wx[xs, b_])[:, None]
            out = out + w * feat_map[ty[ys, a], tx[xs, b_]]
    return np.asarray(out, feat_map.dtype)
