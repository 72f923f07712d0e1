"""Software-pipelined serving loop: overlap device compute with host I/O.

The reference's per-frame loops are fully synchronous: every frame runs
``update -> text_queries -> rigid_tracking`` and then blocks on the GPU
result before touching the next frame (``vis_tracking.py:70-138``;
XMem's eval harness likewise syncs per frame via CUDA events,
``XMem/eval.py:146-250``). On TPU — especially through a remote-tunnel
runtime where every host fetch pays a network round trip — that sync is
pure dead time: JAX dispatch is asynchronous, so the device could already
be executing frame ``t+1`` while the host encodes video / writes pickles
for frame ``t``.

This module provides the two halves of that overlap:

- :class:`AsyncFrameLoop` — submit per-frame *device* outputs and a host
  consumer; fetches are deferred by ``depth`` frames so the device-side
  chain of frame ``t+1`` is enqueued before frame ``t``'s results cross
  the host boundary. ``depth=0`` degenerates to the reference's
  synchronous behavior.
- :func:`prefetch_to_device` — stage upcoming host frames onto the
  device (``jax.device_put``) ahead of consumption, hiding H2D transfer
  behind compute (the standard input-pipeline double buffer).

Results are bit-identical to the synchronous loop — only *when* the host
copy happens changes, never what is computed (tested:
``tests/test_serving.py``).
"""

from __future__ import annotations

import collections
import functools
import queue
import threading
from typing import Any, Callable, Iterable, Iterator, Optional, Tuple

import jax
import numpy as np

__all__ = ["AsyncFrameLoop", "FusedFrameStep", "host_prefetch",
           "prefetch_to_device"]


def _fetch(tree: Any) -> Any:
    """Device pytree -> host numpy pytree (one blocking copy per leaf)."""
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, tree
    )


class AsyncFrameLoop:
    """Deferred-fetch frame pipeline.

    ``submit(frame_id, outputs)`` enqueues a frame's *device* outputs
    (any pytree; non-array leaves pass through). Once more than ``depth``
    frames are in flight, the oldest is fetched to host numpy and handed
    to ``consumer(frame_id, host_outputs)``. ``flush()`` drains the
    queue; the loop is also a context manager that flushes on exit.

    The producer must NOT host-sync inside its own frame step for the
    overlap to materialize — keep the per-frame chain on device (e.g.
    ``rigid_tracking_jit`` instead of the numpy-returning wrapper) and
    let this loop do the only fetch.

    ``depth`` is the host-visible latency in frames. Device memory holds
    ``depth + 1`` frames of outputs; keep outputs small (match points,
    masks) rather than full feature volumes when deep pipelines are used.
    """

    def __init__(self, consumer: Callable[[Any, Any], None], depth: int = 1):
        if depth < 0:
            raise ValueError(f"depth must be >= 0, got {depth}")
        self._consumer = consumer
        self._depth = depth
        self._q: collections.deque = collections.deque()
        self.frames_consumed = 0

    @property
    def depth(self) -> int:
        return self._depth

    @property
    def in_flight(self) -> int:
        return len(self._q)

    def submit(self, frame_id: Any, outputs: Any) -> None:
        self._q.append((frame_id, outputs))
        while len(self._q) > self._depth:
            self._drain_one()

    def _drain_one(self) -> None:
        # pop only AFTER the consumer returns: a transient consumer error
        # (e.g. ENOSPC mid-pickle) leaves the frame queued, so a caller
        # that handles the error can flush() again without losing it
        frame_id, outputs = self._q[0]
        self._consumer(frame_id, _fetch(outputs))
        self._q.popleft()
        self.frames_consumed += 1

    def flush(self) -> None:
        while self._q:
            self._drain_one()

    def __enter__(self) -> "AsyncFrameLoop":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        # don't mask an in-flight exception with consumer work on partial
        # results; drain only on clean exit
        if exc_type is None:
            self.flush()


def host_prefetch(items: Iterable[Any], size: int = 2) -> Iterator[Any]:
    """Produce ``items`` in a background thread through a bounded queue.

    Overlaps host-side production (image decode, disk reads, augmentation)
    with whatever the consumer does per item — the producer runs while the
    consumer computes, up to ``size`` items ahead. Order is preserved; a
    producer exception re-raises at the consumer's next pull; closing the
    iterator early (``.close()`` / ``break`` + GC) stops the producer
    thread promptly instead of leaking it against a full queue.
    """
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    # validate + start the producer THREAD eagerly (this is a plain
    # function returning an inner generator): prefetch begins at call
    # time, not at the consumer's first pull, and a bad `size` raises at
    # the call site
    q: queue.Queue = queue.Queue(maxsize=size)
    stop = threading.Event()
    end = object()
    err: list = []

    def worker():
        try:
            for item in items:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # re-raised on the consumer side
            err.append(e)
        finally:
            while not stop.is_set():
                try:
                    q.put(end, timeout=0.1)
                    break
                except queue.Full:
                    continue

    th = threading.Thread(target=worker, daemon=True, name="host_prefetch")
    th.start()
    return _PrefetchIter(q, stop, end, err)


class _PrefetchIter:
    """Consumer side of :func:`host_prefetch`. A real iterator object (not
    a generator) so the producer thread is stopped on EVERY abandonment
    path — explicit ``close()``, ``break`` + GC, or never iterating at
    all (a never-started generator's ``finally`` would not run)."""

    def __init__(self, q, stop, end, err):
        self._q, self._stop, self._end, self._err = q, stop, end, err

    def __iter__(self):
        return self

    def __next__(self):
        if self._stop.is_set():
            raise StopIteration
        item = self._q.get()
        if item is self._end:
            self._stop.set()
            if self._err:
                raise self._err[0]
            raise StopIteration
        return item

    def close(self):
        self._stop.set()

    def __del__(self):
        self._stop.set()


def prefetch_to_device(
    frames: Iterable[Any],
    size: int = 2,
    device: Optional[jax.Device] = None,
    transform: Optional[Callable[[Any], Any]] = None,
) -> Iterator[Any]:
    """Yield frames with up to ``size`` staged on device ahead of use.

    ``transform`` (host-side, e.g. decode/normalize) runs before the
    ``jax.device_put``; numpy leaves become device arrays, everything
    else passes through. With ``size >= 1`` the H2D copy of frame
    ``t+size`` is issued while frame ``t`` computes (device_put is
    asynchronous), hiding transfer latency behind compute.
    """
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")

    def stage(f: Any) -> Any:
        if transform is not None:
            f = transform(f)
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, device)
            if isinstance(x, (np.ndarray, jax.Array)) else x,
            f,
        )

    it = iter(frames)
    buf: collections.deque = collections.deque()
    try:
        for _ in range(size):
            buf.append(stage(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(stage(next(it)))
        except StopIteration:
            pass
        yield out


# ---------------------------------------------------------------------------
# fused per-frame serving step
# ---------------------------------------------------------------------------

def _fused_frame_body(dv2_params, pos_embed, xparams, mem, images_u8, depth,
                      pose, K, src_feats, last_pts, lo, hi, is_mem_frame,
                      dv2_resize_hw, dv2_heads, dv2_dtype, x_dtype, x_sync,
                      x_resized_hw, x_pad, x_flip, out_hw, tcfg, mu):
    """The whole per-frame tracking stack as one traceable body: DINOv2
    extraction + XMem propagation (with the VideoMaskTracker pre/post
    resize-pad pipeline) + field assembly + the full rigid-tracking Adam
    scan. Jitted once per frame by :func:`_fused_frame`, or scanned over a
    whole frame segment by :func:`_fused_segment`. Matches the reference
    per-frame stack ``fusion.py:686-714`` (update) + ``631-684``
    (xmem_process) + ``1608-1685`` (rigid_tracking), which the reference
    runs as dozens of separate CUDA launches with host round-trips between
    stages.

    Calls the ``__wrapped__`` (unjitted) bodies of the three stage
    functions so the fused trace carries no nested-jit donation noise and
    XLA schedules the stages as one module.
    """
    import jax.numpy as jnp

    from d3fields_tpu.fields.state import FieldState
    from d3fields_tpu.models.dinov2 import _extract_patch_features
    from d3fields_tpu.models.xmem.core import propagate_step_views
    from d3fields_tpu.seg.video_tracker import prep_frames, upsample_probs
    from d3fields_tpu.track.rigid import _tracking_scan

    feats = _extract_patch_features.__wrapped__(
        dv2_params, images_u8, pos_embed, dv2_resize_hw, dv2_heads,
        dv2_dtype)

    # the SAME pre/post pipeline VideoMaskTracker runs (shared helpers:
    # the two code paths cannot drift). x_flip reverses the channel order
    # for the XMem branch only: the app's obs color is BGR (reference cv2
    # convention) and feeds DINOv2 as-is, but the tracker was seeded with
    # RGB (Fusion flips before video_tracker.process, fusion.py:411) — the
    # propagation queries must match the memory's channel order.
    imf = prep_frames(images_u8[..., ::-1] if x_flip else images_u8,
                      x_resized_hw, x_pad)
    prob, mem = propagate_step_views.__wrapped__(
        xparams, mem, imf, is_mem_frame, x_dtype, x_sync, None)
    up = upsample_probs(prob, x_pad, out_hw)
    mask = jnp.transpose(up[:, 1:], (0, 2, 3, 1))  # (V, H, W, O)

    st = FieldState(depth=depth, pose=pose, K=K,
                    dino_feats=feats.astype(jnp.float32), mask=mask, mu=mu)
    # unroll by the backend tracing this fused executable (its inputs are
    # uncommitted, so it runs on the default backend by construction)
    tr = _tracking_scan(st, src_feats, last_pts, lo, hi, tcfg,
                        unroll=4 if jax.default_backend() == "tpu" else 1)
    out = {"match_pts": tr["match_pts"], "t": tr["t"],
           "log_r": tr["log_r"], "loss_history": tr["loss_history"],
           "mask": mask}
    return out, mem


@functools.partial(
    jax.jit,
    static_argnames=("dv2_resize_hw", "dv2_heads", "dv2_dtype", "x_dtype",
                     "x_sync", "x_resized_hw", "x_pad", "x_flip", "out_hw",
                     "tcfg", "mu"),
    donate_argnames=("mem",),
)
def _fused_frame(dv2_params, pos_embed, xparams, mem, images_u8, depth,
                 pose, K, src_feats, last_pts, lo, hi, is_mem_frame, *,
                 dv2_resize_hw, dv2_heads, dv2_dtype, x_dtype, x_sync,
                 x_resized_hw, x_pad, x_flip, out_hw, tcfg, mu):
    """One frame as ONE dispatched executable (see
    :func:`_fused_frame_body`). The unfused loop dispatches three
    executables plus a host sync per frame — each paying a tunnel round
    trip on remote TPU (measured round 3: 217.7 ms/frame at ~10 ms of
    actual compute)."""
    return _fused_frame_body(
        dv2_params, pos_embed, xparams, mem, images_u8, depth, pose, K,
        src_feats, last_pts, lo, hi, is_mem_frame, dv2_resize_hw,
        dv2_heads, dv2_dtype, x_dtype, x_sync, x_resized_hw, x_pad,
        x_flip, out_hw, tcfg, mu)


@functools.partial(
    jax.jit,
    static_argnames=("dv2_resize_hw", "dv2_heads", "dv2_dtype", "x_dtype",
                     "x_sync", "x_resized_hw", "x_pad", "x_flip", "out_hw",
                     "tcfg", "mu"),
    donate_argnames=("mem",),
)
def _fused_segment(dv2_params, pos_embed, xparams, mem, frames_u8, depths,
                   pose, K, src_feats, last_pts, lo, hi, is_mem_frames, *,
                   dv2_resize_hw, dv2_heads, dv2_dtype, x_dtype, x_sync,
                   x_resized_hw, x_pad, x_flip, out_hw, tcfg, mu):
    """A whole SEGMENT of T frames as ONE dispatched executable:
    ``lax.scan`` of :func:`_fused_frame_body` over the time axis, carrying
    the XMem memory and the tracked points (frame t's ``match_pts`` seed
    frame t+1, exactly like the host loop in ``vis_tracking.py:130-138``).
    frames_u8 (T, V, H, W, 3); depths (T, V, H, W) per-frame RGB-D maps;
    is_mem_frames (T,) bool — the XMem memory schedule, precomputed on the
    host. Returns (stacked per-frame outputs, final memory).

    This amortizes the per-dispatch tunnel round trip (~30 ms) over T
    frames — the offline/recorded-video mode the reference's per-frame
    python loop cannot express; measured in ``bench_pipeline``."""
    import jax

    def body(carry, inp):
        mem, last = carry
        images_u8, depth, is_mem = inp
        out, mem = _fused_frame_body(
            dv2_params, pos_embed, xparams, mem, images_u8, depth, pose,
            K, src_feats, last, lo, hi, is_mem, dv2_resize_hw, dv2_heads,
            dv2_dtype, x_dtype, x_sync, x_resized_hw, x_pad, x_flip,
            out_hw, tcfg, mu)
        return (mem, out["match_pts"]), out

    (mem, _), outs = jax.lax.scan(body, (mem, last_pts),
                                  (frames_u8, depths, is_mem_frames))
    return outs, mem


class FusedFrameStep:
    """Single-dispatch per-frame serving step for the tracking pipeline.

    Wraps a :class:`~d3fields_tpu.models.dinov2.Dinov2Backbone`, a
    :class:`~d3fields_tpu.seg.video_tracker.VideoMaskTracker` (whose
    ``core`` holds the XMem memory and frame counters), fixed camera
    geometry, and a :class:`~d3fields_tpu.config.TrackingConfig`.
    ``step(images_u8)`` returns DEVICE arrays (match_pts, t, log_r,
    loss_history, mask) — pair with :class:`AsyncFrameLoop` so the only
    host fetch happens ``depth`` frames later and ≥2 frames stay in
    flight through the tunnel.

    The tracker must already be seeded (first frame through
    ``tracker.process(rgb, mask)``); this step covers the propagate-only
    frames that dominate serving. Equivalence with the unfused stage
    calls is pinned in tests/test_serving.py.
    """

    def __init__(self, backbone, tracker, depth, pose, K, bounds_lo,
                 bounds_hi, tracking_cfg, patch_hw=None,
                 xmem_bgr_to_rgb=False, mu=0.02):
        """``pose``/``K`` are the fixed calibrated rig (the d3fields
        setup, reference ``fusion.py:240-260``); ``pose`` accepts (V,4,4)
        or (V,3,4) and is normalized to (V,3,4) exactly like
        ``state_from_obs``. ``depth`` is the DEFAULT depth map — RGB-D
        serving passes each frame's depth to
        :meth:`step`/:meth:`step_segment` instead. ``mu`` is the field
        truncation band (reference ``fusion.py:208``); pass the same
        ``FusionConfig.mu`` the staged loop uses or the fused frames
        silently diverge from it.

        ``xmem_bgr_to_rgb=True`` when frames arrive BGR (the reference cv2
        obs convention) while the tracker was seeded with RGB (Fusion
        flips before ``video_tracker.process``, ``fusion.py:411``): the
        XMem branch then flips channels inside the executable; DINOv2
        always gets the frames as-is, matching ``Fusion.update``."""
        import jax.numpy as jnp

        # The fused executable resizes DINOv2 inputs on device; a backbone
        # configured for the bit-exact host PIL resampler would silently
        # produce different features here than in the unfused stack.
        if getattr(backbone, "resize_mode", "device") != "device":
            raise ValueError(
                "FusedFrameStep needs Dinov2Backbone(resize_mode='device') "
                "— the whole frame runs inside one jit, so the host PIL "
                "resampler ('pil', the torch-bit-exact default) cannot "
                "run; the device resampler is within the documented 1e-3 "
                "descriptor-cosine budget (models/dinov2.py)"
            )
        if not tracker.core.deep_update_sync:
            raise NotImplementedError(
                "FusedFrameStep supports the synchronized deep-update "
                "schedule only (XMemConfig.deep_update_every < 0, the "
                "d3fields configuration, reference fusion.py:272); use "
                "the unfused VideoMaskTracker loop for explicit schedules"
            )
        self.bb = backbone
        self.tracker = tracker
        self.depth = jnp.asarray(depth)
        pose = jnp.asarray(pose)
        if pose.shape[-2:] == (4, 4):  # state_from_obs pose normalization
            pose = pose[:, :3, :]
        self.pose = pose
        self.K = jnp.asarray(K)
        self.mu = float(mu)
        self.lo = jnp.asarray(bounds_lo)
        self.hi = jnp.asarray(bounds_hi)
        self.tcfg = tracking_cfg
        self.patch_hw = patch_hw
        self.xmem_bgr_to_rgb = bool(xmem_bgr_to_rgb)

    def step(self, images_u8, src_feats, last_pts, depth=None):
        """images_u8 (V, H, W, 3); src_feats (I*P, D); last_pts (I, P, 3);
        ``depth`` (V, H, W) — THIS frame's depth maps (RGB-D serving;
        defaults to the init-time depth for static-scene benches).
        Returns the fused output dict (device arrays, no host sync).

        Retry caveat: the counters advance only after the dispatch call
        returns, so a TRACE-time raise (bad shapes, compile failure)
        leaves the schedule intact and the call retryable. The XMem
        memory buffers are donated into the executable, so a failure
        DURING execution (e.g. a runtime OOM mid-run) can leave
        ``core.mem`` invalid even though the counters say the step never
        happened — after an execution-time error, re-seed the tracker
        (``tracker.process`` with a mask) before continuing."""
        import jax.numpy as jnp

        core = self.tracker.core
        if not self.tracker.first_mask_loaded:
            raise RuntimeError("seed the tracker first (process with mask)")
        # counters advance only AFTER the dispatch call returns: a raise
        # (bad shapes, first-compile OOM) must leave the schedule intact
        # so the caller can retry (core.step semantics)
        next_ti = core.curr_ti + 1
        is_mem = (next_ti - core.last_mem_ti) >= core.cfg.mem_every
        V, H, W = images_u8.shape[:3]
        ph, pw = self.patch_hw or (H // 10, W // 10)
        P = self.bb.cfg.patch_size
        out, core.mem = _fused_frame(
            self.bb.params, self.bb.interpolated_pos_embed(ph, pw),
            core.params, core.mem, jnp.asarray(images_u8),
            self.depth if depth is None else jnp.asarray(depth),
            self.pose, self.K, src_feats, last_pts, self.lo, self.hi,
            jnp.asarray(is_mem),
            dv2_resize_hw=(ph * P, pw * P), dv2_heads=self.bb.cfg.num_heads,
            dv2_dtype=self.bb.compute_dtype,
            x_dtype=core.cfg.compute_dtype, x_sync=core.deep_update_sync,
            x_resized_hw=self.tracker.resized_hw,
            x_pad=self.tracker.pad_spec, x_flip=self.xmem_bgr_to_rgb,
            out_hw=(H, W), tcfg=self.tcfg, mu=self.mu,
        )
        core.curr_ti = next_ti
        if is_mem:
            core.last_mem_ti = core.curr_ti
        return out

    def step_segment(self, frames_u8, src_feats, last_pts, depths=None):
        """A whole SEGMENT of T frames in ONE dispatched executable
        (``lax.scan`` over the time axis; frame t's tracked points seed
        frame t+1, exactly like chaining :meth:`step` by hand).
        frames_u8 (T, V, H, W, 3); ``depths`` (T, V, H, W) per-frame RGB-D
        maps (defaults to the init-time static depth broadcast over T).
        Returns the per-frame outputs stacked on a leading T axis (device
        arrays, no host sync). Amortizes the per-dispatch tunnel round
        trip over T frames — the offline / recorded-video mode
        (``apps/vis_tracking.py`` equivalents over a prefetched clip).
        Same donation retry caveat as :meth:`step`: trace-time raises are
        retryable, execution-time failures invalidate the donated
        ``core.mem`` (re-seed the tracker)."""
        import jax.numpy as jnp

        core = self.tracker.core
        if not self.tracker.first_mask_loaded:
            raise RuntimeError("seed the tracker first (process with mask)")
        T, V, H, W = frames_u8.shape[:4]
        # precompute the XMem memory-frame schedule (deterministic on
        # propagate-only frames, core.step semantics) WITHOUT mutating the
        # counters — they commit only after the dispatch call returns, so
        # a raise leaves the tracker retryable
        flags = []
        ti, last_mem = core.curr_ti, core.last_mem_ti
        for _ in range(T):
            ti += 1
            is_mem = (ti - last_mem) >= core.cfg.mem_every
            flags.append(is_mem)
            if is_mem:
                last_mem = ti
        ph, pw = self.patch_hw or (H // 10, W // 10)
        P = self.bb.cfg.patch_size
        if depths is None:
            depths = jnp.broadcast_to(self.depth, (T,) + self.depth.shape)
        outs, core.mem = _fused_segment(
            self.bb.params, self.bb.interpolated_pos_embed(ph, pw),
            core.params, core.mem, jnp.asarray(frames_u8),
            jnp.asarray(depths),
            self.pose, self.K, src_feats, last_pts, self.lo, self.hi,
            jnp.asarray(np.asarray(flags)),
            dv2_resize_hw=(ph * P, pw * P), dv2_heads=self.bb.cfg.num_heads,
            dv2_dtype=self.bb.compute_dtype,
            x_dtype=core.cfg.compute_dtype, x_sync=core.deep_update_sync,
            x_resized_hw=self.tracker.resized_hw,
            x_pad=self.tracker.pad_spec, x_flip=self.xmem_bgr_to_rgb,
            out_hw=(H, W), tcfg=self.tcfg, mu=self.mu,
        )
        core.curr_ti, core.last_mem_ti = ti, last_mem
        return outs
