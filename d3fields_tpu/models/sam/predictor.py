"""SAM predictor: preprocessing + box prediction + mask postprocessing.

Mirrors the original SamPredictor contract used by the reference
(``utils/grounded_sam.py:392-431``): longest-side resize to the model size,
ImageNet-range normalization, bottom-right padding; per-box multimask
prediction; mask upscale -> unpad -> resize to original -> threshold at 0.
Unlike the reference's per-box python loop, all boxes are decoded in one
batched call.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from d3fields_tpu.models.resize import bilinear_resize, bilinear_resize_exact
from d3fields_tpu.models.sam.model import (
    SamConfig, sam_decode_boxes, sam_decode_boxes_views, sam_decode_points,
    sam_encode_image, sam_encode_images,
)

PIXEL_MEAN = (123.675, 116.28, 103.53)
PIXEL_STD = (58.395, 57.12, 57.375)


def _prep_one(rgb, resized_hw, model_size):
    """uint8 (H, W, 3) -> normalized padded (S, S, 3)."""
    rh, rw = resized_hw
    img = bilinear_resize(rgb.astype(jnp.float32), (rh, rw))
    img = (img - jnp.asarray(PIXEL_MEAN)) / jnp.asarray(PIXEL_STD)
    return jnp.pad(img, ((0, model_size - rh), (0, model_size - rw), (0, 0)))


@functools.partial(jax.jit, static_argnames=("resized_hw", "model_size"))
def _prep_jit(rgb, resized_hw, model_size):
    """uint8 (H, W, 3) -> normalized padded (1, S, S, 3), one executable
    (the eager version pays per-op dispatch through the TPU tunnel)."""
    return _prep_one(rgb, resized_hw, model_size)[None]


@functools.partial(jax.jit, static_argnames=("resized_hw", "model_size"))
def _prep_views_jit(rgbs, resized_hw, model_size):
    """uint8 (V, H, W, 3) -> normalized padded (V, S, S, 3)."""
    return jax.vmap(lambda im: _prep_one(im, resized_hw, model_size))(rgbs)


@functools.partial(jax.jit,
                   static_argnames=("model_size", "resized_hw", "orig_hw"))
def _postprocess_jit(low_res, model_size, resized_hw, orig_hw):
    """(N, M, s, s) logits -> (N, M, H, W): upscale to model size, strip the
    bottom-right padding, resize to the original image. Exact F.interpolate
    semantics (no antialias) like the original SAM postprocess —
    thresholded logits are sensitive to the kernel."""
    S = model_size
    rh, rw = resized_hw
    H, W = orig_hw
    N, M = low_res.shape[:2]
    x = low_res.reshape(N * M, *low_res.shape[2:])[..., None]
    x = bilinear_resize_exact(x, (S, S))[:, :rh, :rw]
    x = bilinear_resize_exact(x, (H, W))[..., 0]
    return x.reshape(N, M, H, W)


@functools.partial(jax.jit,
                   static_argnames=("model_size", "resized_hw", "orig_hw"))
def _postprocess_packed_jit(low_res, model_size, resized_hw, orig_hw):
    """Like :func:`_postprocess_jit` but thresholds at 0 ON DEVICE and
    bit-packs the boolean masks (np.packbits layout, flattened H*W per
    mask). The full-res f32 masks are the dominant host-fetch payload of a
    decode call on a remote-tunnel TPU (measured: 14.7 MB ≈ 0.5 s at the
    tunnel's ~27 MB/s for a 4-view rig vs ~60 ms of decoder compute);
    packing moves 32x fewer bytes. Unpack with :func:`_unpack_masks`."""
    m = _postprocess_jit(low_res, model_size, resized_hw, orig_hw)
    N, M, H, W = m.shape
    bits = (m > 0.0).reshape(N, M, -1)
    pad = (-bits.shape[-1]) % 8
    if pad:
        bits = jnp.pad(bits, ((0, 0), (0, 0), (0, pad)))
    bits = bits.reshape(N, M, -1, 8).astype(jnp.uint8)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    return (bits * weights).sum(-1).astype(jnp.uint8)


def _unpack_masks(packed: np.ndarray, hw) -> np.ndarray:
    """(N, M, ceil(H*W/8)) uint8 -> (N, M, H, W) bool."""
    H, W = hw
    n, m = packed.shape[:2]
    flat = np.unpackbits(packed.reshape(n * m, -1), axis=-1)[:, : H * W]
    return flat.reshape(n, m, H, W).astype(bool)


class SamPredictor:
    """Box-prompted segmentation over one image.

    Contract of the original predictor: ``set_image(rgb_uint8)`` then
    ``predict_boxes(boxes_xyxy)`` -> (masks (N, M, H, W) bool, iou (N, M)).
    """

    def __init__(self, params, cfg: Optional[SamConfig] = None,
                 compute_dtype: str = "float32"):
        """``compute_dtype="bfloat16"`` runs the ViT-H trunk on the MXU in
        bf16 (~4x encode on TPU) AND drops the decoder's f32 matmul-
        precision pin to default MXU precision (~9x decode on TPU; decoder
        values stay f32 — see ``sam_decode_boxes``). f32 keeps exact
        torch-parity numerics end to end."""
        # Commit the weights to device ONCE. Host-numpy leaves would be
        # re-transferred on EVERY jitted encode (jax converts non-Array
        # args per call) — at ViT-H's ~2.5 GB through the remote TPU
        # tunnel that turns a sub-second encode into minutes per view.
        self.params = jax.device_put(params)
        self.cfg = cfg or SamConfig.vit_huge()
        self.compute_dtype = compute_dtype
        self._pixels = None
        self._image_emb = None
        self._image_embs = None  # multi-view cache (set_images)
        self._orig_hw: Tuple[int, int] = (0, 0)
        self._resized_hw: Tuple[int, int] = (0, 0)
        self._view_mesh = None

    def shard_views(self, mesh, axis: str = "dp") -> "SamPredictor":
        """Scale the rig across chips: params replicated, the view axis of
        ``set_images``/``predict_boxes_views`` sharded over mesh ``axis``
        (the contract of ``Dinov2Backbone.shard_views``). Each chip
        encodes and decodes its own V/axis views with zero collectives
        (per-view segmentation is independent — the reference loops views
        on one GPU, ``fusion.py:1116-1120``). Forces the batched encoder
        layout; the single-chip ``view_chunk`` HBM workaround does not
        apply when each chip holds only its shard."""
        from d3fields_tpu.parallel.mesh import replicate

        self.params = replicate(mesh, self.params)
        self._view_mesh = (mesh, axis)
        return self

    def _shard(self, arr):
        if self._view_mesh is None:
            return arr
        from d3fields_tpu.parallel.mesh import shard_leading_checked

        mesh, axis = self._view_mesh
        return shard_leading_checked(mesh, arr, axis)

    def _target_hw(self, H: int, W: int) -> Tuple[int, int]:
        s = self.cfg.image_size / max(H, W)
        return int(H * s + 0.5), int(W * s + 0.5)

    def set_image(self, rgb: np.ndarray):
        """Encodes the image ONCE (the encoder jit is split from the box
        decoder, so repeated predict calls reuse the embedding — the
        original SamPredictor's embedding cache)."""
        H, W = rgb.shape[:2]
        self._orig_hw = (H, W)
        rh, rw = self._target_hw(H, W)
        self._resized_hw = (rh, rw)
        self._pixels = _prep_jit(jnp.asarray(rgb), (rh, rw),
                                 self.cfg.image_size)
        self._image_emb = sam_encode_image(self.params, self._pixels,
                                           self.cfg, self.compute_dtype)
        self._image_embs = None  # a stale rig cache must not outlive this
        return self

    def set_images(self, rgbs: np.ndarray, view_chunk: int = 1):
        """Encode a whole camera rig (V, H, W, 3) in ONE dispatch
        (``sam_encode_images``; the per-view ``set_image`` loop pays a
        tunnel round trip per view). All views must share (H, W) — true
        for the d3fields rigs (``fusion.py:1116-1120``). ``view_chunk``
        bounds encoder HBM (model.py docstring)."""
        V, H, W = rgbs.shape[:3]
        self._orig_hw = (H, W)
        rh, rw = self._target_hw(H, W)
        self._resized_hw = (rh, rw)
        pixels = _prep_views_jit(self._shard(jnp.asarray(rgbs)), (rh, rw),
                                 self.cfg.image_size)
        self._pixels = pixels
        if self._view_mesh is not None:
            view_chunk = V  # batched layout: XLA partitions the view axis
        self._image_embs = sam_encode_images(
            self.params, pixels, self.cfg, self.compute_dtype, view_chunk)
        self._image_emb = None  # a stale single-image cache must not
        return self             # outlive this rig encode

    def predict_boxes_views(self, boxes_per_view, multimask_output=True):
        """Decode every view's boxes in ONE dispatch after
        :meth:`set_images`. ``boxes_per_view``: list of V (N_v, 4) xyxy
        arrays in original-image pixels (N_v may differ per view; all are
        padded to one shared bucket so varying counts reuse one
        executable). Returns a list of V (masks bool (N_v, M, H, W),
        iou (N_v, M)) pairs — the per-view contract of
        :meth:`predict_boxes`."""
        if self._image_embs is None:
            raise RuntimeError("call set_images first")
        V = self._image_embs.shape[0]
        if len(boxes_per_view) != V:
            raise ValueError(
                f"{len(boxes_per_view)} box lists for {V} encoded views")
        H, W = self._orig_hw
        rh, rw = self._resized_hw
        counts = [np.asarray(b).reshape(-1, 4).shape[0]
                  for b in boxes_per_view]
        nb = self._bucket(max(max(counts), 1))
        batch = np.zeros((V, nb, 4), np.float32)
        for v, b in enumerate(boxes_per_view):
            b = np.asarray(b, np.float32).reshape(-1, 4).copy()
            b[:, [0, 2]] *= rw / W
            b[:, [1, 3]] *= rh / H
            if b.shape[0]:
                batch[v] = self._pad_rows(b, nb)
        low_res, iou = sam_decode_boxes_views(
            self.params, self._image_embs, self._shard(jnp.asarray(batch)),
            self.cfg, multimask_output, self.compute_dtype,
        )
        M = low_res.shape[2]
        masks = self._postprocess_bool(
            low_res.reshape((V * nb, M) + low_res.shape[3:]))
        masks = masks.reshape(V, nb, M, H, W)
        iou = np.asarray(iou)
        return [(masks[v, :n], iou[v, :n]) for v, n in enumerate(counts)]

    @staticmethod
    def _bucket(n: int) -> int:
        """Pad the box count to a small set of sizes so varying per-view
        detection counts don't each trigger a decoder recompile."""
        b = 4
        while b < n:
            b *= 2
        return b

    @staticmethod
    def _pad_rows(arr: np.ndarray, nb: int) -> np.ndarray:
        """Tile the last row along axis 0 up to the bucket size."""
        n = arr.shape[0]
        if nb == n:
            return arr
        reps = (nb - n,) + (1,) * (arr.ndim - 1)
        return np.concatenate([arr, np.tile(arr[-1:], reps)])

    def predict_boxes(self, boxes_xyxy: np.ndarray, multimask_output=True):
        """boxes in original-image pixels -> (masks bool (N, M, H, W),
        iou (N, M))."""
        if self._image_emb is None:
            raise RuntimeError("call set_image first")
        H, W = self._orig_hw
        rh, rw = self._resized_hw
        boxes = np.asarray(boxes_xyxy, np.float32).reshape(-1, 4).copy()
        n = boxes.shape[0]
        boxes[:, [0, 2]] *= rw / W
        boxes[:, [1, 3]] *= rh / H
        boxes = self._pad_rows(boxes, self._bucket(n))
        low_res, iou = sam_decode_boxes(
            self.params, self._image_emb, jnp.asarray(boxes), self.cfg,
            multimask_output, self.compute_dtype,
        )
        masks = self._postprocess_bool(low_res[:n])
        return masks, np.asarray(iou)[:n]

    def predict_points(self, points_xy: np.ndarray, labels: np.ndarray,
                       multimask_output=True, mask_input=None):
        """Click-prompted segmentation: points (N, P, 2) xy in
        original-image pixels, labels (N, P) in {1 foreground click,
        0 background click, -1 pad} -> (masks bool (N, M, H, W),
        iou (N, M), low_res (N, M, s, s) logits). The headless equivalent
        of the reference GUI's fbrs/S2M click segmentation
        (``XMem/inference/interact/``) and of upstream
        ``predict(point_coords=..., point_labels=...)``.

        ``mask_input`` (N, s, s): one low-res logit map per prompt from a
        previous call's third return — add clicks and feed it back to
        refine iteratively."""
        if self._image_emb is None:
            raise RuntimeError("call set_image first")
        H, W = self._orig_hw
        rh, rw = self._resized_hw
        pts = np.asarray(points_xy, np.float32).copy()
        if pts.ndim == 2:
            pts = pts[None]
        lbl = np.asarray(labels, np.int32).reshape(pts.shape[:2])
        n, P = pts.shape[:2]
        pts[..., 0] *= rw / W
        pts[..., 1] *= rh / H
        # bucket the click count too: the iterative loop adds one point
        # per call, and each new P would otherwise recompile the decoder.
        # Pad entries are label -1, which embed_points maps to not_a_point.
        Pb = self._bucket(P)
        if Pb != P:
            pts = np.concatenate(
                [pts, np.zeros((n, Pb - P, 2), np.float32)], axis=1)
            lbl = np.concatenate(
                [lbl, -np.ones((n, Pb - P), np.int32)], axis=1)
        nb = self._bucket(n)
        pts = self._pad_rows(pts, nb)
        lbl = self._pad_rows(lbl, nb)
        mi = None
        if mask_input is not None:
            mi = np.asarray(mask_input, np.float32)
            if mi.ndim == 2:
                mi = mi[None]
            if mi.shape[0] != n:
                raise ValueError(
                    f"mask_input has {mi.shape[0]} rows for {n} prompts — "
                    "pass exactly one low-res logit map per prompt"
                )
            mi = jnp.asarray(self._pad_rows(mi, nb))
        low_res, iou = sam_decode_points(
            self.params, self._image_emb, jnp.asarray(pts),
            jnp.asarray(lbl), self.cfg, multimask_output, mask_input=mi,
            compute_dtype=self.compute_dtype,
        )
        masks = self._postprocess_bool(low_res[:n])
        return (masks, np.asarray(iou)[:n], np.asarray(low_res)[:n])

    def _postprocess_bool(self, low_res) -> np.ndarray:
        """(n, M, s, s) logits -> host (n, M, H, W) bool via the packed
        device fetch (32x fewer tunnel bytes than f32 masks)."""
        packed = _postprocess_packed_jit(low_res, self.cfg.image_size,
                                         self._resized_hw, self._orig_hw)
        return _unpack_masks(np.asarray(packed), self._orig_hw)
