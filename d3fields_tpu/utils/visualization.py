"""Headless visualization: keypoint reprojection, mask blending, point-cloud
aggregation, and tracking videos.

Rebuilds the reference's vis layer (``utils/draw_utils.py``,
``utils/track_vis.py``, ``Fusion.vis_curr_mask``) without Open3D windows or
cv2.imshow: everything renders to numpy images / mp4 files so it runs on a
headless TPU host.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from d3fields_tpu.track.keypoints import project_to_view


# ---------------------------------------------------------------------------
# colormaps (matplotlib-free jet/viridis for the hot paths)
# ---------------------------------------------------------------------------

def jet_colors(values: np.ndarray) -> np.ndarray:
    """values in [0,1] -> (N, 3) RGB in [0,1] (matplotlib 'jet')."""
    v = np.clip(np.asarray(values, np.float64), 0, 1)
    r = np.clip(1.5 - np.abs(4 * v - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * v - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * v - 1), 0, 1)
    return np.stack([r, g, b], -1)


def instance_palette(n: int) -> np.ndarray:
    """(n, 3) uint8 distinct colors (jet-spread, reference
    ``vis_curr_mask`` / ``create_instance_mask_mesh`` convention)."""
    if n <= 1:
        return np.zeros((max(n, 1), 3), np.uint8)
    vals = np.arange(n) / max(n - 1, 1)
    return (jet_colors(vals) * 255).astype(np.uint8)


def blend_instance_mask(color_bgr: np.ndarray, index_mask: np.ndarray,
                        alpha: float = 0.5) -> np.ndarray:
    """Jet-colored instance overlay (``Fusion.vis_curr_mask``,
    ``fusion.py:1687-1697``). color (H, W, 3) BGR uint8; index_mask (H, W)."""
    n = int(index_mask.max()) + 1
    palette = instance_palette(n)
    overlay = palette[index_mask.astype(np.int64)][..., ::-1]  # BGR
    out = (1 - alpha) * color_bgr.astype(np.float32) + alpha * overlay
    return out.astype(np.uint8)


def draw_keypoints(img_bgr: np.ndarray, uv: np.ndarray,
                   colors: Optional[np.ndarray] = None,
                   radius: int = 4) -> np.ndarray:
    """Circles at integer pixel coords (``utils/draw_utils.py:97``)."""
    import cv2

    out = np.ascontiguousarray(img_bgr.copy())
    H, W = out.shape[:2]
    n = uv.shape[0]
    if colors is None:
        colors = (jet_colors(np.arange(n) / max(n - 1, 1)) * 255).astype(np.uint8)
    for i, (u, v) in enumerate(np.asarray(uv, np.int64)):
        if 0 <= u < W and 0 <= v < H:
            c = tuple(int(x) for x in colors[i][::-1])
            cv2.circle(out, (int(u), int(v)), radius, c, -1)
    return out


# ---------------------------------------------------------------------------
# multi-view colored point cloud (aggr_point_cloud_from_data equivalent)
# ---------------------------------------------------------------------------

def aggregate_colored_pcd(
    colors_rgb: np.ndarray, depths: np.ndarray, Ks: np.ndarray,
    poses44: np.ndarray, boundaries=None, downsample_voxel: float = 0.0,
    masks: Optional[np.ndarray] = None, max_depth: float = 1.5,
) -> Tuple[np.ndarray, np.ndarray]:
    """Backproject all views -> (points (N, 3), colors (N, 3) float [0,1]).

    Mirrors ``aggr_point_cloud_from_data`` (``utils/draw_utils.py:325-413``)
    without the Open3D dependency. Reference order per view: backproject ->
    boundary filter -> o3d ``voxel_down_sample`` (per-voxel CENTROID of
    points and colors) -> concatenate across views.
    """
    pts_all, col_all = [], []
    V, H, W = depths.shape
    b = None
    if boundaries is not None:
        b = boundaries.as_dict() if hasattr(boundaries, "as_dict") else boundaries
    for v in range(V):
        d = depths[v]
        sel = (d > 0) & (d < max_depth)
        if masks is not None:
            sel &= masks[v].astype(bool)
        ys, xs = np.nonzero(sel)
        z = d[ys, xs]
        K = Ks[v]
        x = (xs - K[0, 2]) / K[0, 0] * z
        y = (ys - K[1, 2]) / K[1, 1] * z
        cam = np.stack([x, y, z], -1)
        c2w = np.linalg.inv(poses44[v])
        world = cam @ c2w[:3, :3].T + c2w[:3, 3]
        cols_v = colors_rgb[v][ys, xs].astype(np.float32) / 255.0
        if b is not None:
            keep = (
                (world[:, 0] > b["x_lower"]) & (world[:, 0] < b["x_upper"])
                & (world[:, 1] > b["y_lower"]) & (world[:, 1] < b["y_upper"])
                & (world[:, 2] > b["z_lower"]) & (world[:, 2] < b["z_upper"])
            )
            world, cols_v = world[keep], cols_v[keep]
        if downsample_voxel > 0 and world.shape[0]:
            world, cols_v = _voxel_mean(world, cols_v, downsample_voxel)
        pts_all.append(world)
        col_all.append(cols_v)
    return np.concatenate(pts_all, 0), np.concatenate(col_all, 0)


def _voxel_mean(pts: np.ndarray, cols: np.ndarray, voxel: float):
    """Per-voxel centroid of points AND colors — o3d ``voxel_down_sample``
    semantics (the first-point-per-voxel form keeps raw scan-order points,
    which differ from the reference's averaged output)."""
    vox = np.floor(pts / voxel).astype(np.int64)
    key = vox - vox.min(axis=0)
    dims = key.max(axis=0) + 1
    flat = (key[:, 0] * dims[1] + key[:, 1]) * dims[2] + key[:, 2]
    uniq, inv = np.unique(flat, return_inverse=True)
    counts = np.bincount(inv, minlength=uniq.shape[0]).astype(np.float64)
    out_p = np.zeros((uniq.shape[0], 3))
    out_c = np.zeros((uniq.shape[0], cols.shape[1]))
    np.add.at(out_p, inv, pts)
    np.add.at(out_c, inv, cols)
    return (out_p / counts[:, None]).astype(pts.dtype), (
        out_c / counts[:, None]
    ).astype(cols.dtype)


def remove_statistical_outliers(pts: np.ndarray, nb_neighbors: int = 5,
                                std_ratio: float = 0.2) -> np.ndarray:
    """Index filter matching o3d ``remove_statistical_outlier``
    (``vis_repr.py:79``): drop points whose mean k-NN distance exceeds
    mean + std_ratio * std. Grid-hashed kNN in native C++
    (``native/pointcloud.cpp``), numpy brute-force fallback."""
    if pts.shape[0] <= nb_neighbors:
        return np.arange(pts.shape[0])
    from d3fields_tpu.ops.pointcloud_native import _load, statistical_outlier_mask

    if _load() is None:
        n = pts.shape[0]
        means = np.empty(n, np.float64)
        chunk = 2048
        for s in range(0, n, chunk):
            d = np.linalg.norm(pts[s : s + chunk, None] - pts[None], axis=-1)
            # k+1 smallest include the self 0-distance in ARBITRARY order;
            # summing and dividing by k averages {0, k-1 true neighbors}
            # like Open3D's KNN (which returns the query itself first)
            part = np.partition(d, nb_neighbors, axis=1)[:, : nb_neighbors + 1]
            means[s : s + chunk] = part.sum(axis=1) / nb_neighbors
        thresh = means.mean() + std_ratio * means.std()
        return np.nonzero(means <= thresh)[0]
    return np.nonzero(statistical_outlier_mask(pts, nb_neighbors, std_ratio))[0]


# ---------------------------------------------------------------------------
# tracking video (TrackVis equivalent, headless)
# ---------------------------------------------------------------------------

class TrackVis:
    """Per-frame keypoint-reprojection mosaic -> mp4 (+ optional per-frame
    PNGs). Mirrors ``utils/track_vis.py:42-139`` minus the Open3D window."""

    def __init__(self, poses34: np.ndarray, Ks: np.ndarray, output_dir: str,
                 fps: int = 10, imshow_ratio: float = 0.7,
                 save_frames: bool = False):
        self.poses = np.asarray(poses34)
        self.Ks = np.asarray(Ks)
        self.output_dir = output_dir
        self.fps = fps
        self.ratio = imshow_ratio
        self.save_frames = save_frames
        self.t = 0
        self.vid = None
        os.makedirs(output_dir, exist_ok=True)

    def visualize_match_pts(self, match_pts_list: List[np.ndarray],
                            colors_bgr: np.ndarray,
                            track_info: Dict[str, dict]) -> np.ndarray:
        import cv2

        V, H, W = colors_bgr.shape[:3]
        rh, rw = int(H * self.ratio), int(W * self.ratio)
        rows = (V + 1) // 2
        mosaic = np.zeros((rh * rows, rw * 2, 3), np.uint8)
        pt_colors = np.concatenate(
            [np.asarray(track_info[k]["src_pts_color"]) for k in track_info],
            axis=0,
        )
        all_pts = np.concatenate(match_pts_list, axis=0)
        for v in range(V):
            uv = project_to_view(all_pts, self.poses[v], self.Ks[v])
            img = draw_keypoints(colors_bgr[v], uv, pt_colors)
            img = cv2.resize(img, (rw, rh), interpolation=cv2.INTER_AREA)
            mosaic[(v // 2) * rh : (v // 2 + 1) * rh,
                   (v % 2) * rw : (v % 2 + 1) * rw] = img
        if self.vid is None:
            self.vid = cv2.VideoWriter(
                os.path.join(self.output_dir, "tracking.mp4"),
                cv2.VideoWriter_fourcc(*"mp4v"), self.fps,
                (mosaic.shape[1], mosaic.shape[0]),
            )
        self.vid.write(mosaic)
        if self.save_frames:
            cv2.imwrite(
                os.path.join(self.output_dir, f"{self.t:06d}.png"), mosaic
            )
        self.t += 1
        return mosaic

    def close(self):
        if self.vid is not None:
            self.vid.release()
            self.vid = None


def davis_palette(n: int = 256) -> np.ndarray:
    """The DAVIS/PASCAL-VOC label colormap ((n, 3) uint8 RGB).

    Generated by the standard VOC bit-shuffle (labels' bits distributed
    over color MSBs) — byte-identical to the reference's hardcoded table
    (``XMem/util/palette.py``). Used to save index masks as paletted PNGs.
    """
    cmap = np.zeros((n, 3), np.uint8)
    for i in range(n):
        r = g = b = 0
        c = i
        for j in range(8):
            r |= ((c >> 0) & 1) << (7 - j)
            g |= ((c >> 1) & 1) << (7 - j)
            b |= ((c >> 2) & 1) << (7 - j)
            c >>= 3
        cmap[i] = (r, g, b)
    return cmap


def save_index_mask_png(path: str, index_mask: np.ndarray) -> None:
    """Save an index mask as a paletted PNG with the DAVIS palette (what
    the reference eval writes for davis2017-evaluation)."""
    from PIL import Image

    img = Image.fromarray(index_mask.astype(np.uint8), mode="P")
    img.putpalette(davis_palette().reshape(-1).tolist())
    img.save(path)
