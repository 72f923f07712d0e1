"""XMem inference stepper: one compiled step per frame, vmapped over views.

Rebuild of ``XMem/inference/inference_core.py:8-107`` for the d3fields usage
pattern (``fusion.py:631-684``): every object is seeded with a mask on frame
0 and propagated afterwards, with ``deep_update_every = -1`` (deep updates
synchronized to memory frames). The reference keeps one InferenceCore per
camera and loops in python; here the whole multi-camera step is ONE jitted,
vmapped call over stacked per-camera memory pytrees.

Frame schedule (host-side counters, mirrors ``inference_core.py:50-56``):
  is_mem_frame = (ti - last_mem_ti >= mem_every) or mask_given
  is_deep_update = is_mem_frame                  (deep_update_sync)
  is_normal_update = not is_mem_frame            (decoder GRU hidden update)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from d3fields_tpu.config import XMemConfig
from d3fields_tpu.models.xmem import blocks as B
from d3fields_tpu.models.xmem import memory as M
from d3fields_tpu.models.xmem import network as N

Array = jax.Array


def _flatten_key(key: Array, shrinkage: Optional[Array],
                 selection: Optional[Array]):
    """(h, w, C) maps -> memory layout (C, h*w) / (h*w,)."""
    h, w, ck = key.shape
    k = key.reshape(h * w, ck).T
    s = shrinkage.reshape(h * w) if shrinkage is not None else None
    e = selection.reshape(h * w, ck).T if selection is not None else None
    return k, s, e


def seed_step(params, mem: M.XMemMemory, image: Array, mask_prob: Array):
    """Frame-0 step: seed memory from given per-object masks.

    image (H, W, 3) normalized, H/W multiples of 16; mask_prob (O, H, W)
    in [0, 1] (no background channel). Returns (prob_with_bg (O+1, H, W),
    updated memory). Mirrors ``inference_core.py:75-105`` with mask given.
    """
    key, shrinkage, selection, f16, f8, f4 = N.encode_key(
        params, image[None], need_sk=True, need_ek=True
    )
    prob_with_bg = B.soft_aggregate(mask_prob, axis=0)

    value, hidden = N.encode_value(
        params, image, f16[0], mem.hidden, prob_with_bg[1:], is_deep_update=True
    )
    k, s, e = _flatten_key(key[0], shrinkage[0], selection[0])
    O, h, w, cv = value.shape
    v = value.reshape(O, h * w, cv).transpose(0, 2, 1)
    mem = mem.replace(hidden=hidden)
    mem = M.add_memory(mem, k, s, v, e)
    return prob_with_bg, mem


@jax.jit
def _propagate(params, mem: M.XMemMemory, image: Array, is_mem_frame: Array):
    """One compiled step covers BOTH frame kinds: ``is_mem_frame`` is a
    traced bool selecting the memory-write branch with ``lax.cond`` (a
    static flag would compile two full executables, each a multi-minute
    remote compile on the tunnel)."""
    key, shrinkage, selection, f16, f8, f4 = N.encode_key(
        params, image[None], need_sk=True, need_ek=True
    )
    qk, _, qe = _flatten_key(key[0], None, selection[0])
    readout, mem = M.match_memory(mem, qk, qe)  # (O, CV, hw)
    O, cv, hw = readout.shape
    h, w = key.shape[1], key.shape[2]
    readout = readout.transpose(0, 2, 1).reshape(O, h, w, cv)

    # the decoder GRU hidden is only used on non-mem frames but is cheap;
    # computing it unconditionally keeps the cond branches same-shaped
    dec_hidden, logits, prob_with_bg = N.segment(
        params, f16[0], f8[0], f4[0], mem.hidden, readout, h_out=True,
    )

    def mem_branch(mem):
        value, hidden = N.encode_value(
            params, image, f16[0], mem.hidden, prob_with_bg[1:],
            is_deep_update=True,
        )
        k, s, e = _flatten_key(key[0], shrinkage[0], selection[0])
        v = value.reshape(O, h * w, cv).transpose(0, 2, 1)
        return M.add_memory(mem.replace(hidden=hidden), k, s, v, e)

    def normal_branch(mem):
        return mem.replace(hidden=dec_hidden)

    mem = jax.lax.cond(is_mem_frame, mem_branch, normal_branch, mem)
    return prob_with_bg, mem


seed_step_jit = jax.jit(seed_step)
# vmapped multi-camera variants (params shared, memory/images stacked)
seed_step_views = jax.jit(jax.vmap(seed_step, in_axes=(None, 0, 0, 0)))


@jax.jit
def propagate_step_views(params, mem, images, is_mem_frame: Array):
    return jax.vmap(
        lambda m, im: _propagate(params, m, im, is_mem_frame)
    )(mem, images)


class XMemCore:
    """Host wrapper: frame counters + per-view memory, reference-core API.

    One instance tracks ALL cameras (the reference keeps a python list of
    per-camera cores, ``fusion.py:282-302``).
    """

    def __init__(self, params, cfg: XMemConfig, num_views: int,
                 num_objects: int, image_hw: Tuple[int, int]):
        H, W = image_hw
        if H % 16 or W % 16:
            raise ValueError("image must be pre-padded to multiples of 16")
        if cfg.deep_update_every != -1:
            raise NotImplementedError(
                "only deep_update_every=-1 (deep updates synchronized to "
                "memory frames) is implemented — the d3fields configuration "
                "(fusion.py:272); unsynchronized schedules need a separate "
                "counter and encode_value variant"
            )
        self.params = params
        self.cfg = cfg
        self.num_views = num_views
        self.num_objects = num_objects
        self.image_hw = image_hw
        self.clear_memory()

    def clear_memory(self):
        """Reset tracking state (reference ``clear_memory``,
        ``inference_core.py:22-27``; used by ``Fusion.clear_xmem_memory``)."""
        H, W = self.image_hw
        single = M.init_memory(
            self.cfg, self.num_objects, (H // 16, W // 16)
        )
        self.mem = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (self.num_views,) + x.shape),
            single,
        )
        self.curr_ti = -1
        self.last_mem_ti = 0

    def step(self, images: Array, mask_prob: Optional[Array] = None) -> Array:
        """images (V, H, W, 3) normalized; mask_prob (V, O, H, W) on the
        seeding frame, None afterwards. Returns prob_with_bg (V, O+1, H, W).
        """
        self.curr_ti += 1
        if mask_prob is not None:
            prob, self.mem = seed_step_views(
                self.params, self.mem, images, mask_prob
            )
            self.last_mem_ti = self.curr_ti
            return prob
        if self.curr_ti == 0:
            raise ValueError("first frame must provide masks")
        is_mem_frame = (self.curr_ti - self.last_mem_ti) >= self.cfg.mem_every
        prob, self.mem = propagate_step_views(
            self.params, self.mem, images, jnp.asarray(is_mem_frame)
        )
        if is_mem_frame:
            self.last_mem_ti = self.curr_ti
        return prob
