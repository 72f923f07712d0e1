"""L0 geometry primitives, pure JAX.

TPU-first rewrite of the reference's point-cloud math:

- ``project_points``          <- reference ``fusion.py:32-55`` (project_points_coords)
- ``interpolate_maps``        <- reference ``fusion.py:57-77`` (interpolate_feats), with
  exact PyTorch ``F.grid_sample`` semantics (zeros padding, align_corners=True,
  bilinear + nearest) reimplemented as masked gathers
- ``create_grid``             <- reference ``fusion.py:79-88`` (create_init_grid)
- ``instance_to_onehot`` / ``onehot_to_instance`` <- reference ``fusion.py:90-116``
- ``VoxelHash``               <- reference ``fusion.py:118-180`` (_init_low_level_memory)
- ``depth_to_points`` / ``backproject_depth`` <- reference ``utils/my_utils.py:522-537``
  (depth2fgpcd) and ``utils/draw_utils.py:325-413`` (aggr_point_cloud_from_data)

All device functions keep static shapes (masks instead of compaction) so they
compose under ``jit`` / ``vmap`` / ``shard_map``. Host-side variants that
compact to ragged numpy arrays live at the bottom; they feed the (branchy,
tiny) instance-association layer which intentionally stays on CPU.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ---------------------------------------------------------------------------
# Projection
# ---------------------------------------------------------------------------

def project_points(
    pts: Array,
    pose: Array,
    K: Array,
    *,
    eps: float = 1e-4,
    depth_fill: float = 1e-3,
) -> Tuple[Array, Array, Array]:
    """Project world points into every calibrated view.

    Args:
      pts: (N, 3) world-frame points.
      pose: (V, 3, 4) world->camera extrinsics ``[R|t]``.
      K: (V, 3, 3) intrinsics.

    Returns:
      xy: (V, N, 2) pixel coordinates.
      valid: (V, N) bool, False where ``|z| < eps`` (behind/at the camera plane).
      depth: (V, N) z-depth with invalid entries replaced by ``depth_fill``
        (mirrors reference ``fusion.py:52-53`` which overwrites tiny depths
        with 1e-3 regardless of sign).
    """
    KRt = jnp.einsum("vij,vjk->vik", K, pose)  # (V, 3, 4)
    ones = jnp.ones_like(pts[:, :1])
    pts_h = jnp.concatenate([pts, ones], axis=-1)  # (N, 4)
    cam = jnp.einsum("vik,nk->vni", KRt, pts_h)  # (V, N, 3)
    z = cam[..., 2]
    invalid = jnp.abs(z) < eps
    depth = jnp.where(invalid, jnp.asarray(depth_fill, z.dtype), z)
    xy = cam[..., :2] / depth[..., None]
    return xy, jnp.logical_not(invalid), depth


# ---------------------------------------------------------------------------
# grid_sample-parity interpolation
# ---------------------------------------------------------------------------

def _gather_hw(img: Array, iy: Array, ix: Array) -> Array:
    """Gather ``img[(iy, ix)]`` for flat integer index arrays. img: (h, w, C)."""
    h, w = img.shape[0], img.shape[1]
    flat = img.reshape(h * w, -1)
    idx = iy * w + ix
    return jnp.take(flat, idx, axis=0)  # (N, C)


def _unnormalize(coord: Array, in_size: int, out_size: int, align_corners: bool) -> Array:
    """Map image-space pixel coord (0..in_size-1) to map-space continuous index.

    Composition of the reference's normalization (``fusion.py:73-74``:
    ``x/(W-1)*2-1``) with grid_sample's unnormalization over a (possibly
    different-resolution) map of ``out_size`` pixels.
    """
    gn = coord / (in_size - 1) * 2.0 - 1.0  # [-1, 1] at pixel extremes
    if align_corners:
        return (gn + 1.0) * 0.5 * (out_size - 1)
    return ((gn + 1.0) * out_size - 1.0) * 0.5


def sample_map_bilinear(
    img: Array,
    xy: Array,
    image_hw: Tuple[int, int],
    *,
    align_corners: bool = True,
) -> Array:
    """Bilinear sample of one map at image-space points, zeros padding.

    Matches ``F.grid_sample(mode='bilinear', padding_mode='zeros')`` fed with
    the reference's (W-1)/(H-1) normalization: weights are computed from the
    unclipped continuous index and out-of-bounds corner taps contribute zero.

    Args:
      img: (h, w, C) feature map.
      xy: (N, 2) points in image pixel space of an (H, W) image.
      image_hw: (H, W) of the image space the points live in.

    Returns: (N, C)
    """
    H, W = image_hw
    h, w = img.shape[0], img.shape[1]
    ix = _unnormalize(xy[:, 0], W, w, align_corners)
    iy = _unnormalize(xy[:, 1], H, h, align_corners)

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    tx = ix - x0
    ty = iy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    out = None
    for dy, dx, wgt in (
        (0, 0, (1 - tx) * (1 - ty)),
        (0, 1, tx * (1 - ty)),
        (1, 0, (1 - tx) * ty),
        (1, 1, tx * ty),
    ):
        xi = x0i + dx
        yi = y0i + dy
        inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        yc = jnp.clip(yi, 0, h - 1)
        tap = _gather_hw(img, yc, xc)
        contrib = tap * (wgt * inb.astype(img.dtype))[:, None]
        out = contrib if out is None else out + contrib
    return out


def sample_map_nearest(
    img: Array,
    xy: Array,
    image_hw: Tuple[int, int],
    *,
    align_corners: bool = True,
) -> Array:
    """Nearest-neighbor sample, zeros padding, grid_sample parity.

    PyTorch rounds the source index with ``std::nearbyint`` (half-to-even),
    which ``jnp.round`` matches.
    """
    H, W = image_hw
    h, w = img.shape[0], img.shape[1]
    ix = jnp.round(_unnormalize(xy[:, 0], W, w, align_corners)).astype(jnp.int32)
    iy = jnp.round(_unnormalize(xy[:, 1], H, h, align_corners)).astype(jnp.int32)
    inb = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
    xc = jnp.clip(ix, 0, w - 1)
    yc = jnp.clip(iy, 0, h - 1)
    tap = _gather_hw(img, yc, xc)
    return tap * inb.astype(img.dtype)[:, None]


def bilinear_taps(
    xy: Array,
    image_hw: Tuple[int, int],
    map_hw: Tuple[int, int],
    *,
    align_corners: bool = True,
) -> Tuple[Array, Array]:
    """Decompose bilinear sampling into 4 flat tap indices + weights.

    Returns (idx, w): idx (N, 4) int32 flat indices into a (h*w,) map (taps
    clamped in-bounds), w (N, 4) weights with out-of-bounds taps zeroed —
    exactly the zeros-padding grid_sample contribution. This is the form the
    Pallas fused-fusion kernel consumes (interpolation-matrix matmul on the
    MXU instead of a vector gather).
    """
    h, w = map_hw
    x0i, y0i, wgts = bilinear_corner_weights(xy, image_hw, map_hw,
                                             align_corners=align_corners)
    idxs = []
    for tap, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        xc = jnp.clip(x0i + dx, 0, w - 1)
        yc = jnp.clip(y0i + dy, 0, h - 1)
        idxs.append(yc * w + xc)
    return jnp.stack(idxs, axis=-1), wgts


def bilinear_corner_weights(
    xy: Array,
    image_hw: Tuple[int, int],
    map_hw: Tuple[int, int],
    *,
    align_corners: bool = True,
) -> Tuple[Array, Array, Array]:
    """The shared zeros-padding grid_sample corner decomposition.

    Returns (x0i (N,), y0i (N,) int32 floor corner, w (N, 4) bilinear
    weights in tap order (0,0),(0,1),(1,0),(1,1) with out-of-bounds taps
    zeroed). Single source of the parity-critical weight/boundary rules for
    both :func:`bilinear_taps` and the kernels' packed corner tables.
    """
    H, W = image_hw
    h, w = map_hw
    ix = _unnormalize(xy[:, 0], W, w, align_corners)
    iy = _unnormalize(xy[:, 1], H, h, align_corners)
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    tx = ix - x0
    ty = iy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    wgts = []
    for dy, dx, wgt in (
        (0, 0, (1 - tx) * (1 - ty)),
        (0, 1, tx * (1 - ty)),
        (1, 0, (1 - tx) * ty),
        (1, 1, tx * ty),
    ):
        inb = (
            (x0i + dx >= 0) & (x0i + dx <= w - 1)
            & (y0i + dy >= 0) & (y0i + dy <= h - 1)
        )
        wgts.append(wgt * inb.astype(wgt.dtype))
    return x0i, y0i, jnp.stack(wgts, axis=-1)


def interpolate_maps(
    maps: Array,
    xy: Array,
    image_hw: Tuple[int, int],
    *,
    mode: str = "bilinear",
    align_corners: bool = True,
) -> Array:
    """Per-view interpolation: maps (V, h, w, C), xy (V, N, 2) -> (V, N, C).

    Reference: ``interpolate_feats`` (``fusion.py:57-77``), called with
    ``align_corners=True`` at every eval site (``fusion.py:327-333,372-379``).
    """
    fn = sample_map_bilinear if mode == "bilinear" else sample_map_nearest
    return jax.vmap(lambda m, p: fn(m, p, image_hw, align_corners=align_corners))(maps, xy)


# ---------------------------------------------------------------------------
# Grid factory
# ---------------------------------------------------------------------------

def create_grid(boundaries, step_size: float) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """Regular voxel-center grid (host-side, static shapes).

    Reference: ``create_init_grid`` (``fusion.py:79-88``) — half-step offset,
    'ij' meshgrid ordering, flattened to (N, 3).

    ``boundaries`` is either a :class:`d3fields_tpu.config.Boundaries` or a
    dict with x/y/z_lower/upper keys.
    """
    if hasattr(boundaries, "as_dict"):
        boundaries = boundaries.as_dict()
    axes = []
    for a in ("x", "y", "z"):
        lo, hi = boundaries[f"{a}_lower"], boundaries[f"{a}_upper"]
        axes.append(np.arange(lo, hi, step_size, dtype=np.float32) + step_size / 2)
    xx, yy, zz = np.meshgrid(*axes, indexing="ij")
    coords = np.stack([xx, yy, zz], axis=-1).reshape(-1, 3)
    return coords, xx.shape


# ---------------------------------------------------------------------------
# Label codecs
# ---------------------------------------------------------------------------

def instance_to_onehot(instance, num_instances: Optional[int] = None):
    """Index mask -> one-hot. Works on numpy or jax arrays.

    Reference: ``instance2onehot`` (``fusion.py:90-107``).
    """
    if num_instances is None:
        num_instances = int(instance.max()) + 1
    if isinstance(instance, np.ndarray):
        return np.eye(num_instances, dtype=bool)[instance.astype(np.int64)]
    return jax.nn.one_hot(instance.astype(jnp.int32), num_instances, dtype=jnp.bool_)


def onehot_to_instance(onehot):
    """One-hot / probabilistic mask -> index mask (argmax over last axis).

    Reference: ``onehot2instance`` (``fusion.py:109-116``).
    """
    if isinstance(onehot, np.ndarray):
        return np.argmax(onehot, axis=-1).astype(np.uint8)
    return jnp.argmax(onehot, axis=-1).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Voxel hashing
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class VoxelHash:
    """Bounded-workspace voxel <-> flat-index codec.

    Reference: ``_init_low_level_memory`` closures (``fusion.py:118-180``),
    rebuilt as a frozen dataclass usable from host numpy code and inside jit.
    """

    lower: Tuple[float, float, float]
    voxel_size: float
    dims: Tuple[int, int, int]

    @staticmethod
    def from_boundaries(boundaries, voxel_size: float) -> "VoxelHash":
        if hasattr(boundaries, "as_dict"):
            boundaries = boundaries.as_dict()
        lower = np.array([boundaries["x_lower"], boundaries["y_lower"], boundaries["z_lower"]])
        upper = np.array([boundaries["x_upper"], boundaries["y_upper"], boundaries["z_upper"]])
        dims = ((upper - lower) / voxel_size).astype(np.int32)
        return VoxelHash(tuple(lower.tolist()), float(voxel_size), tuple(int(d) for d in dims))

    def pcd_to_voxel(self, pts):
        xp = jnp if isinstance(pts, jax.Array) else np
        lower = xp.asarray(self.lower, dtype=pts.dtype)
        return xp.floor((pts - lower) / self.voxel_size).astype(xp.int32)

    def voxel_to_pcd(self, vox):
        xp = jnp if isinstance(vox, jax.Array) else np
        lower = xp.asarray(self.lower)
        return vox * self.voxel_size + lower

    def voxel_to_index(self, vox):
        d1, d2 = self.dims[1], self.dims[2]
        return vox[..., 0] * (d1 * d2) + vox[..., 1] * d2 + vox[..., 2]

    def index_to_voxel(self, idx):
        xp = jnp if isinstance(idx, jax.Array) else np
        d1, d2 = self.dims[1], self.dims[2]
        z = idx % d2
        rem = idx // d2
        y = rem % d1
        x = rem // d1
        return xp.stack([x, y, z], axis=-1).astype(xp.int32)

    def pcd_to_index(self, pts):
        return self.voxel_to_index(self.pcd_to_voxel(pts))

    def index_to_pcd(self, idx):
        return self.voxel_to_pcd(self.index_to_voxel(idx))


# ---------------------------------------------------------------------------
# Depth back-projection
# ---------------------------------------------------------------------------

def backproject_depth(depth: Array, K: Array) -> Array:
    """Backproject a full depth map to camera-frame points (static shape).

    Returns (H, W, 3); callers mask/compact as needed. Device analogue of
    ``depth2fgpcd`` (``utils/my_utils.py:522-537``).
    """
    H, W = depth.shape
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    xs = jnp.arange(W, dtype=depth.dtype)[None, :]
    ys = jnp.arange(H, dtype=depth.dtype)[:, None]
    X = (xs - cx) * depth / fx
    Y = (ys - cy) * depth / fy
    return jnp.stack([X, Y, depth], axis=-1)


def depth_to_points_np(depth: np.ndarray, mask: np.ndarray, cam_params) -> np.ndarray:
    """Host-side compacting backprojection (exact ``depth2fgpcd`` semantics:
    masks out non-positive depth, returns (N, 3) camera-frame points)."""
    fx, fy, cx, cy = cam_params
    mask = np.logical_and(mask, depth > 0)
    ys, xs = np.nonzero(mask)
    z = depth[ys, xs]
    out = np.stack([(xs - cx) * z / fx, (ys - cy) * z / fy, z], axis=-1)
    return out


def camera_to_world_np(pts_cam: np.ndarray, pose_w2c: np.ndarray) -> np.ndarray:
    """Transform camera-frame points to world frame given a 4x4 world->cam pose."""
    c2w = np.linalg.inv(pose_w2c)
    pts_h = np.concatenate([pts_cam, np.ones((pts_cam.shape[0], 1))], axis=-1)
    return (c2w @ pts_h.T)[:3].T


def aggregate_masked_points_np(
    depths: np.ndarray,
    Ks: np.ndarray,
    poses: np.ndarray,
    masks: Optional[np.ndarray] = None,
    boundaries=None,
    max_depth: float = 1.5,
) -> np.ndarray:
    """Aggregate per-view masked backprojections into one world-frame cloud.

    Host-side rewrite of ``aggr_point_cloud_from_data``
    (``utils/draw_utils.py:325-413``) minus Open3D: when ``masks`` is None the
    reference's default validity ``(depth>0) & (depth<1.5)`` applies, otherwise
    ``mask & (depth>0)``; points outside ``boundaries`` are dropped.

    ``poses`` are (V, 4, 4) world->camera (the reference passes w2c and inverts).
    """
    clouds = []
    V = depths.shape[0]
    for i in range(V):
        K = Ks[i]
        cam_params = (K[0, 0], K[1, 1], K[0, 2], K[1, 2])
        if masks is None:
            m = (depths[i] > 0) & (depths[i] < max_depth)
        else:
            m = masks[i] & (depths[i] > 0)
        pts_cam = depth_to_points_np(depths[i], m, cam_params)
        pts_w = camera_to_world_np(pts_cam, poses[i])
        if boundaries is not None:
            b = boundaries.as_dict() if hasattr(boundaries, "as_dict") else boundaries
            keep = (
                (pts_w[:, 0] > b["x_lower"]) & (pts_w[:, 0] < b["x_upper"]) &
                (pts_w[:, 1] > b["y_lower"]) & (pts_w[:, 1] < b["y_upper"]) &
                (pts_w[:, 2] > b["z_lower"]) & (pts_w[:, 2] < b["z_upper"])
            )
            pts_w = pts_w[keep]
        clouds.append(pts_w)
    if not clouds:
        return np.zeros((0, 3))
    return np.concatenate(clouds, axis=0)


def voxel_downsample_np(pts: np.ndarray, voxel_size: float) -> np.ndarray:
    """Voxel-grid downsample: mean of points per occupied voxel.

    Replaces the reference's Open3D ``voxel_down_sample`` dependency
    (``fusion.py:716-722``) with a numpy segment-mean.
    """
    if pts.shape[0] == 0:
        return pts
    vox = np.floor(pts / voxel_size).astype(np.int64)
    # Hash voxel triples into a single int key for unique().
    key = (vox - vox.min(axis=0)).astype(np.int64)
    dims = key.max(axis=0) + 1
    flat = (key[:, 0] * dims[1] + key[:, 1]) * dims[2] + key[:, 2]
    uniq, inv = np.unique(flat, return_inverse=True)
    sums = np.zeros((uniq.shape[0], 3))
    np.add.at(sums, inv, pts)
    counts = np.bincount(inv, minlength=uniq.shape[0]).astype(np.float64)
    return sums / counts[:, None]
