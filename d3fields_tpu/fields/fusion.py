"""The field core: pure jittable multi-view fusion queries.

TPU-first rebuild of the reference's hottest path (``Fusion.eval`` /
``Fusion.eval_dist`` / ``Fusion.batch_eval``, ``fusion.py:305-545``):

- ``eval_field(state, pts, return_names)`` fuses projection, visibility,
  depth-based truncated distance, and weighted multi-view feature
  interpolation in one jitted function. Per-view contributions are
  accumulated (an unrolled static loop over the small view axis) so the
  (V, N, 1024) intermediate that forces the reference's 60k-point chunking
  never materializes.
- ``batch_eval`` streams arbitrarily many points through fixed-size tiles
  with ``lax.map`` (static shapes; padded tail) — constant memory at any N.
- gradients flow through everything (used by rigid tracking,
  reference ``fusion.py:1608-1685``).

The weighting scheme matches the reference exactly (``fusion.py:343-388``):
validity ``(inter_depth>0) & in_front & (dist>-mu)``, weight
``exp(clamp(mu-|dist|,max=0)/mu)`` from the *unclamped* distance, distance
clamped to ±mu and valid-mean-fused with invalid points set to 1e3, features
fused as ``sum(f * valid * w) / (sum(valid) + 1e-6)``.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from d3fields_tpu.config import D3FieldsConfig, FusionConfig
from d3fields_tpu.fields import geometry
from d3fields_tpu.fields.state import FieldState, state_from_obs

Array = jax.Array

INVALID_DIST = 1e3
_EPS = 1e-6


# ---------------------------------------------------------------------------
# Core eval
# ---------------------------------------------------------------------------

def _distance_terms(state: FieldState, pts: Array):
    """Shared projection + depth-visibility computation.

    Returns (xy, dist_raw, in_front, inter_depth, pts_depth).
    """
    xy, in_front, pts_depth = geometry.project_points(pts, state.pose, state.K)
    H, W = state.image_hw
    inter_depth = geometry.interpolate_maps(
        state.depth[..., None], xy, (H, W), mode="nearest"
    )[..., 0]  # (V, N)
    dist_raw = inter_depth - pts_depth
    return xy, dist_raw, in_front, inter_depth, pts_depth


def eval_field(
    state: FieldState,
    pts: Array,
    return_names: Tuple[str, ...] = ("dino_feats", "mask"),
) -> Dict[str, Array]:
    """Query the fused field at world points.

    Args:
      state: observation state.
      pts: (N, 3) world points.
      return_names: subset of {'dino_feats', 'mask', 'color_tensor'}.

    Returns dict with 'dist' (N,), 'valid_mask' (N,) bool, and one (N, C)
    array per requested name. Semantics mirror ``Fusion.eval``
    (``fusion.py:305-394``).
    """
    mu = jnp.asarray(state.mu, pts.dtype)
    xy, dist_raw, in_front, inter_depth, _ = _distance_terms(state, pts)

    dist_valid = (inter_depth > 0.0) & in_front & (dist_raw > -mu)  # (V, N)
    weight = jnp.exp(jnp.clip(mu - jnp.abs(dist_raw), max=0.0) / mu)  # (V, N)
    dist = jnp.clip(dist_raw, -mu, mu)

    vf = dist_valid.astype(pts.dtype)
    denom = vf.sum(axis=0)  # (N,)
    dist_fused = (dist * vf).sum(axis=0) / (denom + _EPS)
    all_invalid = denom == 0
    dist_fused = jnp.where(all_invalid, jnp.asarray(INVALID_DIST, pts.dtype), dist_fused)

    outputs: Dict[str, Array] = {
        "dist": dist_fused,
        "valid_mask": jnp.logical_not(all_invalid),
    }

    if return_names:
        maps = state.feature_maps(tuple(return_names))
        H, W = state.image_hw
        vw = vf * weight  # (V, N)
        num_views = state.num_views
        for name in return_names:
            m = maps[name]
            acc = None
            # Static unrolled loop over the (small) view axis: keeps the peak
            # live tensor at (N, C) instead of (V, N, C).
            for v in range(num_views):
                tap = geometry.sample_map_bilinear(m[v], xy[v], (H, W))
                contrib = tap * vw[v][:, None]
                acc = contrib if acc is None else acc + contrib
            val = acc / (denom[:, None] + _EPS)
            val = jnp.where(all_invalid[:, None], 0.0, val)
            outputs[name] = val
    return outputs


def eval_dist(state: FieldState, pts: Array) -> Dict[str, Array]:
    """Unclamped distance query for grasp planners.

    Mirrors ``Fusion.eval_dist`` (``fusion.py:396-436``): no ±mu clamp, no
    1e3 sentinel, validity is just ``(inter_depth>0) & in_front``.
    """
    _, dist_raw, in_front, inter_depth, _ = _distance_terms(state, pts)
    dist_valid = (inter_depth > 0.0) & in_front
    vf = dist_valid.astype(pts.dtype)
    denom = vf.sum(axis=0)
    dist_fused = (dist_raw * vf).sum(axis=0) / (denom + _EPS)
    return {"dist": dist_fused, "valid_mask": denom > 0}


# jitted entry points (return_names static; FieldState.mu is a static field)
eval_field_jit = jax.jit(eval_field, static_argnames=("return_names",))
eval_dist_jit = jax.jit(eval_dist)


# ---------------------------------------------------------------------------
# Streaming batch eval
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("return_names", "tile", "use_pallas"))
def _batch_eval_padded(
    state: FieldState,
    pts_padded: Array,
    return_names: Tuple[str, ...],
    tile: int,
    use_pallas: bool,
) -> Dict[str, Array]:
    num_tiles = pts_padded.shape[0] // tile
    tiles = pts_padded.reshape(num_tiles, tile, 3)

    if use_pallas:
        from d3fields_tpu.fields import kernels

        # Pack the 2x2-corner gather table (depth + full-res maps) ONCE
        # (loop-invariant operand of the lax.map scan) instead of per tile.
        # Only needed when a full-res map is queried; the dist-only nearest
        # tap uses lane-aligned row gathers instead.
        H, W = state.image_hw
        maps = state.feature_maps(return_names) if return_names else {}
        has_fullres = any(maps[n].shape[1:3] == (H, W) for n in return_names)
        packed = kernels.pack_corner_table(state, return_names) if has_fullres else None

        def one(p):
            return kernels.eval_field_fused(
                state, p, return_names, packed_table=packed
            )
    else:
        def one(p):
            return eval_field(state, p, return_names)

    out = jax.lax.map(one, tiles)
    return {k: v.reshape((num_tiles * tile,) + v.shape[2:]) for k, v in out.items()}


def batch_eval(
    state: FieldState,
    pts,
    return_names: Tuple[str, ...] = ("dino_feats", "mask"),
    *,
    tile: int = 32768,
    use_pallas: bool = False,
) -> Dict[str, Array]:
    """Evaluate the field over any number of points at constant memory.

    Replaces the reference's 60k-chunk host loop (``Fusion.batch_eval``,
    ``fusion.py:526-545``) with a ``lax.map`` over fixed-size tiles inside a
    single compiled program; the ragged tail is padded and sliced off.
    """
    pts = jnp.asarray(pts)
    n = pts.shape[0]
    return_names = tuple(return_names)
    padded_n = max(tile, ((n + tile - 1) // tile) * tile)
    if padded_n != n:
        pad = jnp.zeros((padded_n - n, 3), pts.dtype)
        pts_padded = jnp.concatenate([pts, pad], axis=0)
    else:
        pts_padded = pts
    out = _batch_eval_padded(state, pts_padded, return_names, tile, use_pallas)
    return {k: v[:n] for k, v in out.items()}


# ---------------------------------------------------------------------------
# Host orchestration facade
# ---------------------------------------------------------------------------

class Fusion:
    """Convenience facade mirroring the reference ``Fusion`` class API.

    Unlike the reference (a god-object owning every model,
    ``fusion.py:202-303``), this holds only configuration, an optional
    feature backend, and the current immutable :class:`FieldState`; all math
    is delegated to the pure functions above. Segmentation / tracking layers
    attach via the modules in ``d3fields_tpu.seg`` and ``d3fields_tpu.track``.
    """

    def __init__(
        self,
        num_cam: Optional[int] = None,
        config: Optional[D3FieldsConfig] = None,
        feature_backend=None,
        mask_backend=None,
        video_tracker=None,
        video_tracker_factory=None,
    ):
        """``video_tracker_factory(num_views, num_objects, image_hw)`` is
        called lazily on the first tracked frame (object count is only known
        after consensus) — the ergonomic way to attach XMem propagation."""
        self.config = config or D3FieldsConfig()
        if self.config.seed is not None:
            from d3fields_tpu.utils.seeding import set_seed

            set_seed(self.config.seed)
        self.num_cam = num_cam
        self.feature_backend = feature_backend
        self.mask_backend = mask_backend
        self.video_tracker = video_tracker
        self.video_tracker_factory = video_tracker_factory
        self.state: Optional[FieldState] = None
        self.curr_obs: dict = {}
        self.consensus_mask_label: list = []
        self.semantic_label: list = []
        self.view_masks: list = []
        self.instances_info: list = []

    # -- ingestion ---------------------------------------------------------
    def update(self, obs: dict) -> FieldState:
        """Ingest a reference-style obs dict and (optionally) extract features.

        Mirrors ``Fusion.update`` (``fusion.py:686-714``): stores color /
        depth / pose / K and populates per-view DINOv2 patch descriptors via
        the configured backend; patch grid defaults to (H//10, W//10)
        (``fusion.py:694-697``).
        """
        self.num_cam = obs["color"].shape[0]
        dino_feats = obs.get("dino_feats")
        if dino_feats is None and self.feature_backend is not None:
            H, W = obs["color"].shape[1:3]
            dino_feats = self.feature_backend(
                obs["color"], patch_hw=(H // 10, W // 10)
            )
        mask = obs.get("mask")
        if mask is None and self.state is not None:
            mask = self.state.mask  # carry tracked masks across frames
        self.state = state_from_obs(
            obs, dino_feats=dino_feats, mask=mask, mu=self.config.fusion.mu
        )
        self.curr_obs = dict(obs)
        return self.state

    def set_mask(self, mask) -> FieldState:
        """Attach (V, H, W, NI) instance-mask probabilities to the state."""
        self.state = self.state.replace(mask=jnp.asarray(mask, self.state.depth.dtype))
        return self.state

    # -- queries -----------------------------------------------------------
    def _require_state(self):
        if self.state is None:
            raise RuntimeError("call update() before querying the field")

    def eval(self, pts, return_names=("dino_feats", "mask")):
        self._require_state()
        return eval_field_jit(self.state, jnp.asarray(pts), tuple(return_names))

    def eval_dist(self, pts):
        self._require_state()
        return eval_dist_jit(self.state, jnp.asarray(pts))

    def batch_eval(self, pts, return_names=("dino_feats", "mask")):
        self._require_state()
        return batch_eval(
            self.state,
            pts,
            tuple(return_names),
            tile=self.config.fusion.query_tile,
            use_pallas=self.config.fusion.use_pallas and _on_tpu(),
        )

    def batch_eval_np(self, pts, return_names=("dino_feats", "mask")):
        out = self.batch_eval(pts, return_names)
        return {k: np.asarray(v) for k, v in out.items()}

    # -- open-text instance masks -----------------------------------------
    def _poses44(self) -> np.ndarray:
        pose = np.asarray(self.state.pose)
        pad = np.tile(np.array([[[0.0, 0.0, 0.0, 1.0]]], pose.dtype), (pose.shape[0], 1, 1))
        return np.concatenate([pose, pad], axis=1)

    def _boundaries(self, boundaries):
        from d3fields_tpu.config import Boundaries

        if boundaries is None:
            return self.config.boundaries
        if isinstance(boundaries, Boundaries):
            return boundaries
        return Boundaries.from_dict(boundaries)

    def text_queries_for_inst_mask_no_track(
        self,
        queries,
        thresholds,
        boundaries=None,
        expected_labels=None,
        robot_pcd=None,
    ):
        """Open-text per-view masks + cross-view consensus, single frame.

        Mirrors ``Fusion.text_queries_for_inst_mask_no_track``
        (``fusion.py:1112-1171``): per-view mask backend -> optional robot
        filter -> voxel-IoU consensus -> one-hot 'mask' in the state.
        """
        from d3fields_tpu.seg import backends as segb
        from d3fields_tpu.seg import instances as segi

        self._require_state()
        if self.mask_backend is None:
            raise RuntimeError("no mask backend configured")
        boundaries = self._boundaries(boundaries)
        color = self.curr_obs["color"]
        depth = np.asarray(self.state.depth)
        Ks = np.asarray(self.state.K)
        poses44 = self._poses44()

        # backends consume RGB; obs color is BGR (reference cv2 convention,
        # conversion the reference does inside its model wrappers)
        rgb = np.ascontiguousarray(color[..., ::-1])
        if hasattr(self.mask_backend, "segment_views"):
            # batched backend: one detector pass over all views
            views = self.mask_backend.segment_views(rgb, queries, thresholds)
        else:
            views = [
                self.mask_backend.segment(rgb[i], queries, thresholds)
                for i in range(self.num_cam)
            ]
        if robot_pcd is not None:
            views = [
                segb.filter_masks_by_robot_pcd(
                    vm, depth[i], Ks[i], poses44[i], robot_pcd
                )
                for i, vm in enumerate(views)
            ]
        self.view_masks = views
        _, idx = np.unique(views[0].labels, return_index=True)
        self.semantic_label = list(np.array(views[0].labels)[np.sort(idx)])

        index_masks, labels, insts = segi.align_instance_masks(
            views, depth, Ks, poses44, queries, boundaries,
            self.config.instances, expected_labels,
        )
        self.consensus_mask_label = labels
        self.instances_info = insts
        from d3fields_tpu.fields.geometry import instance_to_onehot

        onehot = instance_to_onehot(index_masks, len(labels)).astype(np.float32)
        self.set_mask(onehot)
        return index_masks, labels

    def text_queries_for_inst_mask(
        self,
        queries,
        thresholds,
        boundaries=None,
        expected_labels=None,
        robot_pcd=None,
    ):
        """Tracked open-text masks: consensus on the first frame, video
        propagation afterwards (``Fusion.text_queries_for_inst_mask``,
        ``fusion.py:1173-1256``).

        Propagation uses the configured ``video_tracker``
        (:class:`d3fields_tpu.seg.video_tracker.VideoMaskTracker`, built
        lazily from ``video_tracker_factory`` once the object count is
        known); without one, the mask backend re-runs per frame and the new
        channels are relabeled by max pixel overlap with the previous
        frame's masks (the reference's ``align_with_prev_mask``,
        ``fusion.py:1100-1110``) so instance identities stay stable — a
        per-frame re-detection fallback the reference does not offer (its
        use_sam branch raises).
        """
        first = not self.consensus_mask_label
        if first:
            index_masks, labels = self.text_queries_for_inst_mask_no_track(
                queries, thresholds, boundaries, expected_labels, robot_pcd
            )
            if (self.video_tracker is None
                    and self.video_tracker_factory is not None
                    and len(labels) > 1):  # nothing to track on bg-only
                self.video_tracker = self.video_tracker_factory(
                    num_views=self.num_cam,
                    num_objects=len(labels) - 1,
                    image_hw=self.curr_obs["color"].shape[1:3],
                )
            if self.video_tracker is not None:
                rgb = self.curr_obs["color"][..., ::-1]  # BGR -> RGB
                onehot = self.video_tracker.process(
                    rgb, index_masks.astype(np.uint8)
                )
                self.set_mask(onehot)
            return index_masks, labels
        if self.video_tracker is not None:
            rgb = self.curr_obs["color"][..., ::-1]
            onehot = self.video_tracker.process(rgb, None)
            self.set_mask(onehot)
            from d3fields_tpu.fields.geometry import onehot_to_instance

            return onehot_to_instance(onehot), self.consensus_mask_label
        # re-detection fallback: keep the previous frame's instance
        # numbering by overlap relabeling (align_with_prev_mask semantics)
        from d3fields_tpu.fields.geometry import onehot_to_instance
        from d3fields_tpu.seg.instances import align_with_prev_mask

        prev_labels = list(self.consensus_mask_label)
        prev_mask = np.asarray(self.state.mask) if self.state.mask is not None else None
        index_masks, labels = self.text_queries_for_inst_mask_no_track(
            queries, thresholds, boundaries,
            expected_labels or prev_labels, robot_pcd
        )
        if prev_mask is not None and len(labels) == len(prev_labels):
            new_mask = np.asarray(self.state.mask)
            if new_mask.shape == prev_mask.shape:
                aligned = align_with_prev_mask(new_mask, prev_mask)
                self.set_mask(aligned)
                self.consensus_mask_label = prev_labels
                index_masks = np.asarray(onehot_to_instance(aligned))
                return index_masks, prev_labels
        return index_masks, labels

    def clear_xmem_memory(self):
        """Reset video tracking (``Fusion.clear_xmem_memory``,
        ``fusion.py:1699-1702``)."""
        self.consensus_mask_label = []
        if self.video_tracker is not None:
            self.video_tracker.clear_memory()

    def get_inst_num(self) -> int:
        """Number of consensus instances including background
        (``fusion.py:1258-1260``)."""
        return len(self.consensus_mask_label)

    def extract_masked_pcd(self, inst_idx_ls, boundaries=None) -> np.ndarray:
        """World points under selected instances' (eroded) consensus masks,
        aggregated over views (``fusion.py:1262-1280``)."""
        from d3fields_tpu.seg.instances import erode_mask

        self._require_state()
        boundaries = self._boundaries(boundaries)
        mask = np.asarray(self.state.mask)
        sel = np.zeros(mask.shape[:3], bool)
        for idx in inst_idx_ls:
            sel |= mask[..., idx].astype(bool)
        sel = np.stack([erode_mask(sel[i]) for i in range(sel.shape[0])])
        return geometry.aggregate_masked_points_np(
            np.asarray(self.state.depth), np.asarray(self.state.K), self._poses44(),
            masks=sel, boundaries=boundaries,
        )

    def get_query_obj_pcd(self, boundaries=None) -> np.ndarray:
        """All non-background instance points (``fusion.py:1297-1311``)."""
        return self.extract_masked_pcd(
            list(range(1, self.get_inst_num())), boundaries
        )


    # -- reference-API conveniences -----------------------------------------
    def extract_mesh(self, init_grid, out, grid_shape):
        """(vertices, triangles) from a grid eval result
        (``Fusion.extract_mesh``, ``fusion.py:1313-1330``)."""
        from d3fields_tpu.mesh.extract import extract_mesh as _extract

        return _extract(
            np.asarray(init_grid), np.asarray(out["dist"]), grid_shape,
            smooth=self.config.mesh.smooth, iso=self.config.mesh.iso,
        )

    def create_instance_mask_mesh(self, vertices, triangles, out):
        from d3fields_tpu.mesh.extract import create_instance_mask_mesh

        return [create_instance_mask_mesh(vertices, triangles, out["mask"])]

    def create_descriptor_mesh(self, vertices, triangles, out, pca_info,
                               mask_out_bg=True):
        from d3fields_tpu.mesh.extract import create_descriptor_mesh
        from d3fields_tpu.ops.pca import PCAParams

        pca = pca_info["pca"] if isinstance(pca_info, dict) else pca_info
        if not isinstance(pca, PCAParams):
            pca = PCAParams.from_sklearn(pca)
        return create_descriptor_mesh(
            vertices, triangles, out["dino_feats"], out.get("mask"), pca,
            mask_out_bg=mask_out_bg,
        )

    def create_color_mesh(self, vertices, triangles, out):
        from d3fields_tpu.mesh.extract import create_color_mesh

        return create_color_mesh(vertices, triangles, out["color_tensor"])

    def select_features_rand(self, boundaries, N, per_instance=False,
                             res=0.001, init_idx=-1):
        """Reference keypoint-selection API (``fusion.py:1418-1481``):
        returns {instance_name: {'src_feats', 'src_pts'}} keyed by consensus
        label with duplicate suffixes."""
        from d3fields_tpu.track.keypoints import select_keypoints

        self._require_state()
        feats, pts, ids = select_keypoints(
            self.state, self.consensus_mask_label, self._boundaries(boundaries),
            N, res=res, per_instance=per_instance, init_idx=init_idx,
        )
        out = {}
        for f, p, i in zip(feats, pts, ids):
            name = f"{self.consensus_mask_label[i]}_{i}"
            out[name] = {"src_feats": f, "src_pts": p}
        return out

    def select_features_from_pcd(self, pcd, N, per_instance=False,
                                 init_idx=-1):
        """Cloud-sampled variant (``fusion.py:1483-1540``)."""
        from d3fields_tpu.track.keypoints import select_keypoints

        self._require_state()
        feats, pts, ids = select_keypoints(
            self.state, self.consensus_mask_label, self.config.boundaries,
            N, per_instance=per_instance, init_idx=init_idx, pcd=pcd,
        )
        out = {}
        for f, p, i in zip(feats, pts, ids):
            out[f"{self.consensus_mask_label[i]}_{i}"] = {
                "src_feats": f, "src_pts": p,
            }
        return out

    def select_features_rand_v2(self, boundaries, N, per_instance=False,
                                num_per_cam=None):
        """Depth-backprojection keypoint variant
        (``select_features_rand_v2``, ``fusion.py:1543-1606``)."""
        from d3fields_tpu.track.keypoints import select_keypoints_from_depth

        self._require_state()
        per_cam = num_per_cam or max(1, N // max(self.num_cam, 1))
        feats, pts, ids = select_keypoints_from_depth(
            self.state, self.consensus_mask_label, per_cam,
            per_instance=per_instance,
        )
        return {
            f"{self.consensus_mask_label[i]}_{i}": {"src_feats": f, "src_pts": p}
            for f, p, i in zip(feats, pts, ids)
        }

    def close(self):
        """Release model/backend references (``Fusion.close``,
        ``fusion.py:1704-1712``); the facade holds no GPU allocations, so
        this just drops the backends and state."""
        self.feature_backend = None
        self.mask_backend = None
        self.video_tracker = None
        self.state = None
        self.curr_obs = {}

    def rigid_tracking(self, src_feat_info, last_match_pts_list, boundaries,
                       rand_ptcl_num):
        """Reference signature (``fusion.py:1608-1685``)."""
        from d3fields_tpu.track.rigid import rigid_tracking as _track

        self._require_state()
        return _track(
            self.state, src_feat_info, last_match_pts_list,
            self._boundaries(boundaries), rand_ptcl_num,
            self.config.tracking,
        )

    def vis_curr_mask(self) -> np.ndarray:
        """Jet-blended per-view instance overlay (``fusion.py:1687-1697``),
        returned as (V, H, W, 3) uint8 instead of shown in a window."""
        from d3fields_tpu.fields.geometry import onehot_to_instance
        from d3fields_tpu.utils.visualization import blend_instance_mask

        self._require_state()
        idx = np.asarray(onehot_to_instance(np.asarray(self.state.mask)))
        color = self.curr_obs["color"]
        return np.stack(
            [blend_instance_mask(color[v], idx[v]) for v in range(self.num_cam)]
        )

    # -- pipeline-state checkpoint ------------------------------------------
    def save_state(self, path: str) -> None:
        """Snapshot the full runtime state (observation field, consensus
        labels, video-tracker memory) — the resume substrate the reference
        lacks (its only persistence is ad-hoc pickles,
        ``vis_tracking.py:97-101,138``)."""
        import pickle

        blob = {
            "state": None if self.state is None else {
                k: np.asarray(v)
                for k, v in (
                    ("depth", self.state.depth), ("pose", self.state.pose),
                    ("K", self.state.K),
                    ("dino_feats", self.state.dino_feats),
                    ("color", self.state.color), ("mask", self.state.mask),
                )
                if v is not None
            },
            "mu": None if self.state is None else self.state.mu,
            "consensus_mask_label": self.consensus_mask_label,
            "semantic_label": self.semantic_label,
            "num_cam": self.num_cam,
            "curr_obs_color": self.curr_obs.get("color"),
        }
        if self.video_tracker is not None:
            core = self.video_tracker.core
            blob["tracker"] = {
                "mem": jax.tree.map(np.asarray, core.mem),
                "curr_ti": core.curr_ti,
                "last_mem_ti": core.last_mem_ti,
                "last_deep_update_ti": getattr(core, "last_deep_update_ti",
                                               None),
                "first_mask_loaded": self.video_tracker.first_mask_loaded,
                # construction spec so load_state can rebuild the tracker
                # through video_tracker_factory when none is attached yet
                "spec": {
                    "num_views": self.num_cam,
                    "num_objects": self.video_tracker.num_objects,
                    "image_hw": tuple(self.video_tracker.image_hw),
                    "multi_group": core.multi_group,
                },
            }
        import os

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(blob, f)

    def load_state(self, path: str) -> None:
        import pickle

        with open(path, "rb") as f:
            blob = pickle.load(f)
        if blob["state"] is not None:
            d = blob["state"]
            self.state = FieldState(
                depth=jnp.asarray(d["depth"]), pose=jnp.asarray(d["pose"]),
                K=jnp.asarray(d["K"]),
                dino_feats=jnp.asarray(d["dino_feats"]) if "dino_feats" in d else None,
                color=jnp.asarray(d["color"]) if "color" in d else None,
                mask=jnp.asarray(d["mask"]) if "mask" in d else None,
                mu=blob["mu"],
            )
        self.consensus_mask_label = blob["consensus_mask_label"]
        self.semantic_label = blob["semantic_label"]
        self.num_cam = blob.get("num_cam") or (
            None if self.state is None else self.state.num_views
        )
        if blob.get("curr_obs_color") is not None:
            self.curr_obs["color"] = blob["curr_obs_color"]
        if "tracker" in blob:
            t = blob["tracker"]
            if self.video_tracker is None:
                spec = t.get("spec")
                if self.video_tracker_factory is not None and spec is not None:
                    # rebuild the tracker from the saved spec so the session
                    # truly resumes instead of silently re-seeding
                    self.video_tracker = self.video_tracker_factory(
                        spec["num_views"], spec["num_objects"],
                        tuple(spec["image_hw"]),
                    )
                if self.video_tracker is None:
                    import warnings

                    warnings.warn(
                        "load_state: checkpoint contains video-tracker memory "
                        "but no tracker is attached and no "
                        "video_tracker_factory is configured — tracking will "
                        "re-seed instead of resuming. Construct the Fusion "
                        "with video_tracker(_factory)= to resume tracking.",
                        stacklevel=2,
                    )
            if self.video_tracker is not None:
                core = self.video_tracker.core
                spec = t.get("spec") or {}
                if spec.get("multi_group", False) != core.multi_group:
                    import warnings

                    warnings.warn(
                        "load_state: checkpoint tracker was built with "
                        f"multi_group={spec.get('multi_group')} but the "
                        f"attached tracker has multi_group="
                        f"{core.multi_group}; mid-video object entry will "
                        "not behave as in the saved session",
                        stacklevel=2,
                    )
                core.mem = jax.tree.map(jnp.asarray, t["mem"])
                core.curr_ti = t["curr_ti"]
                core.last_mem_ti = t["last_mem_ti"]
                if t.get("last_deep_update_ti") is not None:
                    core.last_deep_update_ti = t["last_deep_update_ti"]
                self.video_tracker.first_mask_loaded = t["first_mask_loaded"]


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"
