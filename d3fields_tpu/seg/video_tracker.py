"""Video mask propagation: the d3fields <-> XMem bridge.

Rebuild of ``Fusion.xmem_process`` (``fusion.py:631-684``) around the JAX
XMem core: per-view images are ImageNet-normalized, min-side-resized to
``size`` (bilinear; nearest for masks), padded to /16, stepped through the
vmapped tracker, and the per-object probabilities are bilinearly upsampled
back to full resolution before the argmax + one-hot.

The label remapping of the reference's MaskMapper (``mask_mapper.py:7-64``)
collapses to the identity here: d3fields always seeds with exhaustive
consensus masks whose labels are contiguous 0..N (``fusion.py:1096``), which
is MaskMapper's 'coherent' fast path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from d3fields_tpu.config import XMemConfig
from d3fields_tpu.models.common import IMAGENET_MEAN, IMAGENET_STD
from d3fields_tpu.models.resize import bilinear_resize, bilinear_resize_exact
from d3fields_tpu.models.xmem.blocks import pad_divide_by, unpad
from d3fields_tpu.models.xmem.core import XMemCore


def _resize_min_side(hw: Tuple[int, int], size: int) -> Tuple[int, int]:
    """torchvision min-side Resize shape rule (reference ``fusion.py:276``):
    short side = size, long side = int(size * long / short) — truncation,
    not rounding."""
    H, W = hw
    if size < 0:
        return H, W
    if H <= W:
        return size, int(size * W / H)
    return int(size * H / W), size


def prep_frames(images, resized_hw: Tuple[int, int], pad_spec) -> jnp.ndarray:
    """(V, H, W, 3) RGB frames (host or device) -> ImageNet-normalized,
    min-side-resized, /16-padded. Traceable: the ONE implementation of the
    XMem input pipeline, shared by :class:`VideoMaskTracker` and the fused
    serving step (``serving._fused_frame_body``) so the two can never
    drift.

    Dtype contract: integer frames are 0..255 (divided by 255); FLOAT
    frames must already be in [0, 1] — a float array in 0..255 would feed
    ImageNet normalization values ~255x too large and produce garbage
    masks with no error.

    torchvision 0.16 tensor Resize is NON-antialiased bilinear
    (F.interpolate antialias=False); jax.image.resize would antialias
    downscales and blur the encoder inputs relative to the reference."""
    arr = jnp.asarray(images)
    imgs = arr.astype(jnp.float32)
    if jnp.issubdtype(arr.dtype, jnp.integer):  # uint8 frames -> [0, 1]
        imgs = imgs / 255.0
    imgs = (imgs - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    if imgs.shape[1:3] != tuple(resized_hw):
        imgs = bilinear_resize_exact(imgs, tuple(resized_hw))
    if any(pad_spec):
        lh, uh, lw, uw = pad_spec
        imgs = jnp.pad(imgs, ((0, 0), (lh, uh), (lw, uw), (0, 0)))
    return imgs


def upsample_probs(prob, pad_spec, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """(V, O+1, ph, pw) padded-grid probabilities -> (V, O+1, H, W) at the
    original resolution (unpad + bilinear upsample). Traceable; shared by
    :meth:`VideoMaskTracker.process` and the fused serving step."""
    prob_u = unpad(prob, pad_spec, hw_axes=(2, 3))
    V, O1 = prob_u.shape[:2]
    if prob_u.shape[2:] == tuple(out_hw):
        return prob_u
    flat = prob_u.reshape((V * O1,) + prob_u.shape[2:])[..., None]
    return bilinear_resize(flat, tuple(out_hw))[..., 0].reshape(
        (V, O1) + tuple(out_hw))


class VideoMaskTracker:
    """Propagates instance masks through a multi-camera video.

    API mirrors the reference bridge: ``process(rgb, mask)`` takes
    (V, H, W, 3) uint8 RGB and, on the first call, (V, H, W) uint8 index
    masks (0 = background); returns (V, H, W, NI) float one-hot masks.
    """

    def __init__(self, params, cfg: XMemConfig, num_views: int,
                 num_objects: int, image_hw: Tuple[int, int],
                 size: int = 480, multi_group: bool = False):
        """``multi_group=True`` preallocates ``num_objects`` slots and
        allows masks on later frames to seed objects entering mid-video
        (composes with long-term memory via per-object prototype
        visibility, ``models/xmem/memory.py``; the d3fields pipeline seeds
        everything on frame 0 and keeps the default)."""
        self.cfg = cfg
        self.image_hw = image_hw
        self.num_objects = num_objects  # excludes background
        rh, rw = _resize_min_side(image_hw, size)
        self.resized_hw = (rh, rw)
        ph = (rh + 15) // 16 * 16
        pw = (rw + 15) // 16 * 16
        lh, lw = (ph - rh) // 2, (pw - rw) // 2
        self.pad_spec = (lh, ph - rh - lh, lw, pw - rw - lw)
        self.core = XMemCore(
            params, cfg, num_views=num_views, num_objects=num_objects,
            image_hw=(ph, pw), multi_group=multi_group,
        )
        self.first_mask_loaded = False
        self.last_prob = None  # (V, O+1, H, W) soft probs of the last step

    def clear_memory(self):
        self.core.clear_memory()
        self.first_mask_loaded = False
        self.last_prob = None

    def _prep_images(self, rgb: np.ndarray) -> jnp.ndarray:
        return prep_frames(np.asarray(rgb), self.resized_hw, self.pad_spec)

    def _prep_masks(self, mask: np.ndarray) -> jnp.ndarray:
        """(V, H, W) index mask -> (V, O, rh, rw) one-hot at the resized/
        padded grid (nearest resize, reference ``fusion.py:279-280``)."""
        V, H, W = mask.shape
        rh, rw = self.resized_hw
        # torchvision NEAREST lowers to F.interpolate(mode='nearest'):
        # src = floor(dst * in/out) — an asymmetric lattice, not half-pixel
        yi = np.clip((np.arange(rh) * H // rh).astype(int), 0, H - 1)
        xi = np.clip((np.arange(rw) * W // rw).astype(int), 0, W - 1)
        small = mask[:, yi[:, None], xi[None, :]]  # (V, rh, rw)
        onehot = np.stack(
            [(small == i + 1) for i in range(self.num_objects)], axis=1
        ).astype(np.float32)
        out = jnp.asarray(onehot)
        out, _ = pad_divide_by(out, 16, hw_axes=(2, 3))
        return out

    def process(self, rgb: np.ndarray, mask: Optional[np.ndarray] = None,
                return_index: bool = False) -> np.ndarray:
        """One video step for all views; returns (V, H, W, NI) one-hot
        (channel 0 = background), reference contract ``fusion.py:631-684``.

        ``return_index=True`` returns the (V, H, W) uint8 argmax index
        mask instead — what the eval harness writes; skips materializing
        the full-resolution one-hot on the host."""
        imgs = self._prep_images(np.asarray(rgb))
        if mask is not None and not self.first_mask_loaded:
            masks = self._prep_masks(np.asarray(mask))
            prob = self.core.step(imgs, masks)
            self.first_mask_loaded = True
        elif mask is None:
            if not self.first_mask_loaded:
                raise ValueError("No mask provided for the first frame")
            prob = self.core.step(imgs)
        elif self.core.multi_group:
            # mid-video entry: nonzero channels of the new mask seed objects
            masks = self._prep_masks(np.asarray(mask))
            prob = self.core.step(imgs, masks)
        else:
            raise NotImplementedError(
                "re-seeding with new masks mid-video needs "
                "multi_group=True (the d3fields pipeline seeds on frame 0 "
                "only; reference fusion.py:1240-1241 raises too)"
            )
        # unpad, upsample probs to full res, argmax -> one-hot
        O1 = prob.shape[1]
        up = upsample_probs(prob, self.pad_spec, self.image_hw)
        # soft per-object probabilities at full resolution, kept on-device
        # (the reference InferenceCore.step return; consumed by
        # eval_xmem --save_scores)
        self.last_prob = up
        idx = np.asarray(jnp.argmax(up, axis=1).astype(jnp.uint8))
        if return_index:
            return idx
        onehot = np.stack([idx == i for i in range(O1)], axis=-1)
        return onehot.astype(np.float32)
