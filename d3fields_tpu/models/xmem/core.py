"""XMem inference stepper: one compiled step per frame, vmapped over views.

Rebuild of ``XMem/inference/inference_core.py:8-107`` for the d3fields usage
pattern (``fusion.py:631-684``): every object is seeded with a mask on frame
0 and propagated afterwards. The reference keeps one InferenceCore per
camera and loops in python; here the whole multi-camera step is ONE jitted,
vmapped call over stacked per-camera memory pytrees.

Frame schedule (host-side counters, mirrors ``inference_core.py:50-56``).
Synchronized deep updates (``deep_update_every = -1``, the d3fields
configuration, fusion.py:272):
  is_mem_frame = (ti - last_mem_ti >= mem_every) or mask_given
  is_deep_update = is_mem_frame
  is_normal_update = not is_mem_frame            (decoder GRU hidden update)
Unsynchronized (``deep_update_every > 0``): the decoder hidden updates
every frame, and a memory frame also adopts the value-encoder's reinforced
hidden once ti - last_deep_update_ti >= deep_update_every.
"""

from __future__ import annotations

import functools
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


def _cast_floats(tree, dt):
    if dt == jnp.float32:
        return tree
    return jax.tree.map(
        lambda x: x.astype(dt)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
        tree,
    )


def seed_step(params, mem: M.XMemMemory, image: Array, mask_prob: Array,
              compute_dtype: str = "float32"):
    """Frame-0 step: seed memory from given per-object masks.

    image (H, W, 3) normalized, H/W multiples of 16; mask_prob (O, H, W)
    in [0, 1] (no background channel). Returns (prob_with_bg (O+1, H, W),
    updated memory). Mirrors ``inference_core.py:75-105`` with mask given.
    ``compute_dtype`` is the CNN dtype (memory buffers keep f32 —
    ``add_memory`` casts on store).
    """
    dt = jnp.dtype(compute_dtype)
    paramsc = _cast_floats(params, dt)
    key, shrinkage, selection, f16, f8, f4 = N.encode_key(
        paramsc, image.astype(dt)[None], need_sk=True, need_ek=True
    )
    prob_with_bg = B.soft_aggregate(mask_prob, axis=0)

    value, hidden = N.encode_value(
        paramsc, image.astype(dt), f16[0], mem.hidden.astype(dt),
        prob_with_bg[1:].astype(dt), is_deep_update=True,
    )
    k, s, e = _flatten_key(key[0], shrinkage[0], selection[0])
    O, h, w, cv = value.shape
    v = value.reshape(O, h * w, cv).transpose(0, 2, 1)
    mem = mem.replace(hidden=hidden.astype(mem.hidden.dtype))
    mem = M.add_memory(mem, k, s, v, e)
    return prob_with_bg.astype(jnp.float32), mem


@functools.partial(jax.jit, static_argnames=("compute_dtype", "sync"))
def _propagate(params, mem: M.XMemMemory, image: Array, is_mem_frame: Array,
               compute_dtype: str = "float32", sync: bool = True,
               is_deep_update: Optional[Array] = None):
    """One compiled step covers BOTH frame kinds: ``is_mem_frame`` is a
    traced bool selecting the memory-write branch with ``lax.cond`` (a
    static flag would compile two full executables, each a multi-minute
    remote compile on the tunnel).

    ``sync`` is the compile-time deep-update schedule
    (``inference_core.py:16-17,51-56``): True = ``deep_update_every=-1``
    (deep updates ride memory frames, the d3fields configuration); False =
    an explicit period — the decoder GRU hidden updates EVERY frame
    (``is_normal_update`` is always true in no-sync mode) and the traced
    ``is_deep_update`` selects whether a memory frame also adopts the
    value-encoder's reinforced hidden.

    ``compute_dtype`` sets the CNN (encode_key / segment / encode_value)
    dtype; the memory attention always runs f32 (keys/values are cast on
    store/load), so bf16 halves conv time without touching the affinity
    math.
    """
    dt = jnp.dtype(compute_dtype)
    paramsc = _cast_floats(params, dt)
    image = image.astype(dt)
    key, shrinkage, selection, f16, f8, f4 = N.encode_key(
        paramsc, image[None], need_sk=True, need_ek=True
    )
    qk, _, qe = _flatten_key(key[0], None, selection[0])
    f32 = mem.wk.dtype
    readout, mem = M.match_memory(mem, qk.astype(f32), qe.astype(f32))
    O, cv, hw = readout.shape
    h, w = key.shape[1], key.shape[2]
    readout = readout.transpose(0, 2, 1).reshape(O, h, w, cv)

    # the decoder GRU hidden is only used on non-mem frames but is cheap;
    # computing it unconditionally keeps the cond branches same-shaped
    dec_hidden, logits, prob_with_bg = N.segment(
        paramsc, f16[0], f8[0], f4[0], mem.hidden.astype(dt),
        readout.astype(dt), h_out=True,
        obj_active=mem.active if mem.multi_group else None,
    )

    if not sync:
        # no-sync: the decoder hidden is adopted every frame BEFORE the
        # value encoder runs (inference_core.py:70-71,97-99)
        mem = mem.replace(hidden=dec_hidden.astype(mem.hidden.dtype))

    def mem_branch(mem):
        value, hidden = N.encode_value(
            paramsc, image, f16[0], mem.hidden.astype(dt),
            prob_with_bg[1:].astype(dt), is_deep_update=True,
        )
        k, s, e = _flatten_key(key[0], shrinkage[0], selection[0])
        v = value.reshape(O, h * w, cv).transpose(0, 2, 1)
        if sync:
            new_hidden = hidden.astype(mem.hidden.dtype)
        else:
            # deep updates only take effect on memory frames; the schedule
            # bool decides whether the reinforced hidden replaces the GRU's
            new_hidden = jnp.where(
                is_deep_update, hidden.astype(mem.hidden.dtype), mem.hidden
            )
        return M.add_memory(
            mem.replace(hidden=new_hidden), k, s, v, e
        )

    def normal_branch(mem):
        if sync:
            return mem.replace(hidden=dec_hidden.astype(mem.hidden.dtype))
        return mem  # hidden already updated above

    mem = jax.lax.cond(is_mem_frame, mem_branch, normal_branch, mem)
    return prob_with_bg.astype(jnp.float32), mem


def reseed_step(params, mem: M.XMemMemory, image: Array, mask_prob: Array,
                provided: Array, compute_dtype: str = "float32",
                adopt_deep: Optional[Array] = None, sync: bool = True):
    """Mask-given step in multi-group mode: frame-0 seeding AND mid-video
    object entry through one function (``inference_core.py:75-105`` with
    mask given).

    mask_prob (O, H, W): channels flagged by ``provided`` (O,) bool hold
    the given masks; other ACTIVE objects keep their predicted
    probabilities (zeroed inside provided-mask regions, the reference's
    ``pred_prob_no_bg[:, mask_regions] = 0``), inactive objects read 0.
    Newly provided objects enter the memory from this frame: their hidden
    state starts at zero (``create_hidden_state`` pads with zeros) and
    their affinity is restricted to keys written from now on.

    ``adopt_deep`` (traced bool, default True): whether the value
    encoder's reinforced hidden replaces the current hidden — False on an
    unsynchronized schedule that has not elapsed (the reference computes
    ``is_deep_update`` from the schedule even on mask-given frames,
    ``inference_core.py:51-55``).
    """
    dt = jnp.dtype(compute_dtype)
    paramsc = _cast_floats(params, dt)
    image = image.astype(dt)
    key, shrinkage, selection, f16, f8, f4 = N.encode_key(
        paramsc, image[None], need_sk=True, need_ek=True
    )
    qk, _, qe = _flatten_key(key[0], None, selection[0])
    f32 = mem.wk.dtype
    readout, _ = M.match_memory(mem, qk.astype(f32), qe.astype(f32))
    O, cv, hw = readout.shape
    h, w = key.shape[1], key.shape[2]
    readout_hw = readout.transpose(0, 2, 1).reshape(O, h, w, cv)
    # no-sync: a mask-given frame that segments is ALSO a normal update
    # (is_normal_update is always true without deep_update_sync,
    # inference_core.py:56,70-71) — the decoder hidden is adopted for the
    # already-active objects before the value encoder runs; sync mode
    # skips it (is_normal_update = not is_deep_update = False there)
    dec_hidden, _, prob_pred = N.segment(
        paramsc, f16[0], f8[0], f4[0], mem.hidden.astype(dt),
        readout_hw.astype(dt), h_out=not sync, obj_active=mem.active,
    )
    pred_no_bg = prob_pred[1:].astype(jnp.float32)
    # at frame 0 nothing is active yet -> pred is fully masked out and the
    # merge below reduces to the plain seed (reference skips segmentation
    # entirely there; running-and-discarding is trace-uniform)
    pred_no_bg = jnp.where(mem.active[:, None, None], pred_no_bg, 0.0)
    mask_regions = (
        jnp.sum(jnp.where(provided[:, None, None], mask_prob, 0.0), axis=0)
        > 0.5
    )
    pred_no_bg = jnp.where(mask_regions[None], 0.0, pred_no_bg)
    merged = jnp.where(provided[:, None, None], mask_prob.astype(jnp.float32),
                       pred_no_bg)
    prob_with_bg = B.soft_aggregate(merged, axis=0)

    entering = provided & ~mem.active
    if sync:
        base_hidden = mem.hidden
    else:
        # the reference only segments (and thus only adopts the decoder
        # hidden) when some active object is NOT provided
        # (need_segment, inference_core.py:49)
        need_seg = jnp.any(mem.active & ~provided)
        base_hidden = jnp.where(
            need_seg, dec_hidden.astype(mem.hidden.dtype), mem.hidden
        )
    hidden0 = jnp.where(
        (entering | ~mem.active)[:, None, None, None], 0.0, base_hidden
    )
    mem = M.activate_objects(mem, provided)
    value, hidden = N.encode_value(
        paramsc, image, f16[0], hidden0.astype(dt),
        prob_with_bg[1:].astype(dt), is_deep_update=True,
    )
    hidden = hidden.astype(mem.hidden.dtype)
    if adopt_deep is not None:
        hidden = jnp.where(adopt_deep, hidden, hidden0)
    k, s, e = _flatten_key(key[0], shrinkage[0], selection[0])
    v = value.reshape(O, h * w, cv).transpose(0, 2, 1)
    mem = M.add_memory(mem.replace(hidden=hidden), k, s, v, e)
    return prob_with_bg.astype(jnp.float32), mem


seed_step_jit = jax.jit(seed_step, static_argnames=("compute_dtype",))
# vmapped multi-camera variants (params shared, memory/images stacked)


# mem is donated: the caller (XMemCore.step) always replaces self.mem
# with the returned pytree, so XLA may alias the large memory slabs
# in-place instead of double-buffering them every frame
@functools.partial(jax.jit, static_argnames=("compute_dtype", "sync"),
                   donate_argnames=("mem",))
def reseed_step_views(params, mem, images, mask_prob, provided,
                      compute_dtype: str = "float32",
                      adopt_deep: Optional[Array] = None, sync: bool = True):
    return jax.vmap(
        lambda m, im, mp: reseed_step(params, m, im, mp, provided,
                                      compute_dtype, adopt_deep, sync)
    )(mem, images, mask_prob)


@functools.partial(jax.jit, static_argnames=("compute_dtype",),
                   donate_argnames=("mem",))
def seed_step_views(params, mem, images, mask_prob,
                    compute_dtype: str = "float32"):
    return jax.vmap(
        lambda m, im, mp: seed_step(params, m, im, mp, compute_dtype)
    )(mem, images, mask_prob)


@functools.partial(jax.jit, static_argnames=("compute_dtype", "sync"),
                   donate_argnames=("mem",))
def propagate_step_views(params, mem, images, is_mem_frame: Array,
                         compute_dtype: str = "float32", sync: bool = True,
                         is_deep_update: Optional[Array] = None):
    return jax.vmap(
        lambda m, im: _propagate(params, m, im, is_mem_frame, compute_dtype,
                                 sync, is_deep_update)
    )(mem, images)


class XMemCore:
    """Host wrapper: frame counters + per-view memory, reference-core API.

    One instance tracks ALL cameras (the reference keeps a python list of
    per-camera cores, ``fusion.py:282-302``).
    """

    def __init__(self, params, cfg: XMemConfig, num_views: int,
                 num_objects: int, image_hw: Tuple[int, int],
                 multi_group: bool = False):
        """``multi_group=True`` preallocates ``num_objects`` slots of which
        any subset may be seeded per mask-given step — objects may enter
        mid-video (the reference's object groups; composes with long-term
        memory via per-object prototype visibility — see
        ``memory.py``'s module docstring)."""
        H, W = image_hw
        if H % 16 or W % 16:
            raise ValueError("image must be pre-padded to multiples of 16")
        # deep_update_every < 0: deep updates ride memory frames (the
        # d3fields configuration, fusion.py:272); >= 0: explicit schedule
        # (inference_core.py:16-17)
        self.deep_update_sync = cfg.deep_update_every < 0
        self.multi_group = multi_group
        # Commit weights to device once: host-numpy leaves (npz-loaded
        # checkpoints) passed to a jitted step are re-transferred per call
        # — a full ResNet-50+decoder tree per frame through the TPU tunnel.
        # Pre-cast to the compute dtype HERE, once: with bf16 compute the
        # in-step ``_cast_floats`` used to re-read the full f32 master tree
        # and write a bf16 copy EVERY frame (counted in the 2x-floor gap of
        # PARITY.md "XMem: why 28% MFU"); casting at init makes the in-step
        # cast an identity astype XLA elides, and the rounding is the same
        # cast either way so step numerics are bit-identical.
        self.params = jax.device_put(
            _cast_floats(params, jnp.dtype(cfg.compute_dtype)))
        self.cfg = cfg
        self.num_views = num_views
        self.num_objects = num_objects
        self.image_hw = image_hw
        self.clear_memory()

    def shard_views(self, mesh, axis: str = "dp"):
        """Distribute the per-view state over a mesh axis: multi-camera
        rigs scale across chips (each camera's CNN + memory attention runs
        on its owning chip; there is no cross-view communication in the
        XMem bridge, ``fusion.py:631-684``, so XLA partitions the vmapped
        step with zero collectives). The mesh axis size must divide
        ``num_views`` evenly. Params are replicated; step inputs are
        sharded per call."""
        from d3fields_tpu.parallel.mesh import replicate

        if self.num_views % mesh.shape[axis]:
            raise ValueError(
                f"num_views={self.num_views} not divisible by mesh axis "
                f"'{axis}' of size {mesh.shape[axis]}"
            )
        self.params = replicate(mesh, self.params)
        self._view_mesh = (mesh, axis)
        self.mem = self._place_mem(self.mem)
        return self

    def _place_mem(self, tree):
        """Apply the view sharding (if configured) to a pytree — the memory
        state or a bare per-view input array (a bare ndarray is a leaf)."""
        mesh_axis = getattr(self, "_view_mesh", None)
        if mesh_axis is None:
            return tree
        from d3fields_tpu.parallel.mesh import shard_leading

        return jax.tree.map(
            lambda x: shard_leading(mesh_axis[0], x, mesh_axis[1]), tree
        )

    def clear_memory(self):
        """Reset tracking state (reference ``clear_memory``,
        ``inference_core.py:22-27``; used by ``Fusion.clear_xmem_memory``)."""
        H, W = self.image_hw
        single = M.init_memory(
            self.cfg, self.num_objects, (H // 16, W // 16),
            multi_group=self.multi_group,
        )
        self.mem = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (self.num_views,) + x.shape),
            single,
        )
        self.mem = self._place_mem(self.mem)
        self.curr_ti = -1
        self.last_mem_ti = 0
        if not self.deep_update_sync:
            self.last_deep_update_ti = -self.cfg.deep_update_every

    def step(self, images: Array, mask_prob: Optional[Array] = None,
             provided: Optional[Array] = None) -> Array:
        """images (V, H, W, 3) normalized; mask_prob (V, O, H, W) on
        mask-given frames, None otherwise. Returns prob_with_bg
        (V, O+1, H, W).

        In multi_group mode a mask may arrive on ANY frame; ``provided``
        (O,) bool flags which channels it seeds (default: channels with a
        nonzero mask in any view — the VOS convention where a mid-video
        annotation frame carries only the entering objects).
        """
        self.curr_ti += 1
        if mask_prob is not None and self.multi_group and provided is None:
            # derive from the HOST input before sharding: np.asarray on a
            # sharded array gathers (and fails on non-addressable devices)
            provided = np.asarray(mask_prob).max(axis=(0, 2, 3)) > 0
        images = self._place_mem(images)
        if mask_prob is not None:
            mask_prob = self._place_mem(mask_prob)
            # a mask-given frame is a memory frame; on an unsynchronized
            # schedule the deep update still only fires when it has elapsed
            # (inference_core.py:51-55) — always true at t=0 since
            # last_deep_update_ti starts at -deep_every
            deep_fires = self.deep_update_sync or (
                self.curr_ti - self.last_deep_update_ti
                >= self.cfg.deep_update_every
            )
            if self.multi_group:
                prob, self.mem = reseed_step_views(
                    self.params, self.mem, images, mask_prob,
                    jnp.asarray(provided), self.cfg.compute_dtype,
                    None if self.deep_update_sync
                    else jnp.asarray(deep_fires),
                    self.deep_update_sync,
                )
            else:
                prob, self.mem = seed_step_views(
                    self.params, self.mem, images, mask_prob,
                    self.cfg.compute_dtype,
                )
            self.last_mem_ti = self.curr_ti
            if not self.deep_update_sync and deep_fires:
                self.last_deep_update_ti = self.curr_ti
            return prob
        if self.curr_ti == 0:
            raise ValueError("first frame must provide masks")
        is_mem_frame = (self.curr_ti - self.last_mem_ti) >= self.cfg.mem_every
        if self.deep_update_sync:
            is_deep_update = None
        else:
            # a scheduled deep update only takes effect on a memory frame
            # (inference_core.py:96-105 consumes it inside is_mem_frame)
            is_deep_update = (
                self.curr_ti - self.last_deep_update_ti
                >= self.cfg.deep_update_every
            )
        prob, self.mem = propagate_step_views(
            self.params, self.mem, images, jnp.asarray(is_mem_frame),
            self.cfg.compute_dtype, self.deep_update_sync,
            None if is_deep_update is None else jnp.asarray(is_deep_update),
        )
        if is_mem_frame:
            self.last_mem_ti = self.curr_ti
            if not self.deep_update_sync and is_deep_update:
                self.last_deep_update_ti = self.curr_ti
        return prob
