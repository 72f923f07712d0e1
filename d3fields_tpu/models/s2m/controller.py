"""Scribble-to-Mask controller: the reference GUI's scribble interaction.

Rebuild of ``S2MController`` (``XMem/inference/interact/s2m_controller.py``):
given the image, the previous index mask, and a scribble map (object ids,
0 = background scribble, 255 = untouched), produce per-object mask
probabilities. The reference loops objects in python with one forward
each; here all objects go through ONE batched forward (the per-object
inputs differ only in their mask/scribble channels, so the conv batch
dimension absorbs the loop — same numbers, one executable).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from d3fields_tpu.models.s2m import model as sm
from d3fields_tpu.models.xmem.blocks import pad_divide_by, unpad

Array = jax.Array


class S2MController:
    def __init__(self, params, num_objects: int, ignore_class: int = 255,
                 cfg: Optional[sm.S2mConfig] = None):
        self.params = jax.device_put(params)
        self.cfg = cfg or sm.S2mConfig()
        self.num_objects = num_objects
        self.ignore_class = ignore_class
        self._fwd = jax.jit(
            lambda p, x: jax.nn.sigmoid(sm.forward(p, self.cfg, x))
        )

    def interact(self, image: np.ndarray, prev_mask: np.ndarray,
                 scr_mask: np.ndarray) -> np.ndarray:
        """image (H, W, 3) float; prev_mask (H, W) index; scr_mask (H, W)
        with object ids / 0 background / ignore_class untouched ->
        (K, H, W) per-object probabilities (``s2m_controller.py:22-38``)."""
        H, W = scr_mask.shape
        K = self.num_objects
        ks = np.arange(1, K + 1)[:, None, None]
        p_srb = (scr_mask[None] == ks).astype(np.float32)
        n_srb = ((scr_mask[None] != ks)
                 & (scr_mask[None] != self.ignore_class)).astype(np.float32)
        pm = (prev_mask[None] == ks).astype(np.float32)
        x = np.concatenate(
            [np.broadcast_to(image.transpose(2, 0, 1)[None], (K, 3, H, W)),
             pm[:, None], p_srb[:, None], n_srb[:, None]], axis=1,
        ).transpose(0, 2, 3, 1)                                    # (K,H,W,6)
        xj, pads = pad_divide_by(jnp.asarray(x), 16)
        prob = self._fwd(self.params, xj)
        prob = unpad(prob, pads)
        return np.asarray(prob)[..., 0]
