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
    SamConfig, sam_decode_boxes, sam_decode_points, sam_encode_image,
)

PIXEL_MEAN = (123.675, 116.28, 103.53)
PIXEL_STD = (58.395, 57.12, 57.375)


@functools.partial(jax.jit, static_argnames=("resized_hw", "model_size"))
def _prep_jit(rgb, resized_hw, model_size):
    """uint8 (H, W, 3) -> normalized padded (1, S, S, 3), one executable
    (the eager version pays per-op dispatch through the TPU tunnel)."""
    rh, rw = resized_hw
    img = bilinear_resize(rgb.astype(jnp.float32), (rh, rw))
    img = (img - jnp.asarray(PIXEL_MEAN)) / jnp.asarray(PIXEL_STD)
    img = jnp.pad(img, ((0, model_size - rh), (0, model_size - rw), (0, 0)))
    return img[None]


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


class SamPredictor:
    """Box-prompted segmentation over one image.

    Contract of the original predictor: ``set_image(rgb_uint8)`` then
    ``predict_boxes(boxes_xyxy)`` -> (masks (N, M, H, W) bool, iou (N, M)).
    """

    def __init__(self, params, cfg: Optional[SamConfig] = None,
                 compute_dtype: str = "float32"):
        """``compute_dtype="bfloat16"`` runs the ViT-H trunk on the MXU in
        bf16 (~4x encode on TPU; prompt encoder/decoder stay f32 — see
        ``vision_encoder``)."""
        # Commit the weights to device ONCE. Host-numpy leaves would be
        # re-transferred on EVERY jitted encode (jax converts non-Array
        # args per call) — at ViT-H's ~2.5 GB through the remote TPU
        # tunnel that turns a sub-second encode into minutes per view.
        self.params = jax.device_put(params)
        self.cfg = cfg or SamConfig.vit_huge()
        self.compute_dtype = compute_dtype
        self._pixels = None
        self._image_emb = None
        self._orig_hw: Tuple[int, int] = (0, 0)
        self._resized_hw: Tuple[int, int] = (0, 0)

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
        return self

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
        if self._pixels is None:
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
            multimask_output,
        )
        masks = self._postprocess(low_res[:n])
        return np.asarray(masks) > 0.0, np.asarray(iou)[:n]

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
        if self._pixels is None:
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
        )
        masks = self._postprocess(low_res[:n])
        return (np.asarray(masks) > 0.0, np.asarray(iou)[:n],
                np.asarray(low_res)[:n])

    def _postprocess(self, low_res):
        return _postprocess_jit(low_res, self.cfg.image_size,
                                self._resized_hw, self._orig_hw)
