"""Open-text detection wrapper: the ``predict_with_classes`` contract.

Mirrors the reference detector call (``utils/grounded_sam.py:418-424``):
classes are joined into one caption ("a. b. c."), the image is resized
(shortest side 800, cap 1333) and ImageNet-normalized, and detections are
thresholded on the max sigmoid token logit. Class assignment uses the
caption's token spans directly (each class owns the span between '.'
separators) instead of the reference's phrase-substring matching — same
outcome, no string round-trip.

Tokenization is pluggable: pass any callable str -> list[int] (a BERT
wordpiece tokenizer when the vocab is available); tests use a toy hash
tokenizer. Special separator ids follow BERT ([CLS]=101, [SEP]=102,
'.'=1012).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from d3fields_tpu.models.groundingdino.model import (
    GroundingDinoConfig, groundingdino_forward,
)
from d3fields_tpu.models.resize import bilinear_resize

from d3fields_tpu.models.common import IMAGENET_MEAN, IMAGENET_STD
CLS_ID, SEP_ID, DOT_ID = 101, 102, 1012


@functools.partial(jax.jit, static_argnames=("out_hw",))
def _prep_jit(rgb, out_hw):
    """uint8 (H, W, 3) -> normalized (1, rh, rw, 3) in one executable."""
    img = rgb.astype(jnp.float32) / 255.0
    img = bilinear_resize(img, out_hw)
    img = (img - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    return img[None]


@functools.partial(jax.jit, static_argnames=("out_hw",))
def _prep_batch_jit(rgbs, out_hw):
    """uint8 (V, H, W, 3) -> normalized (V, rh, rw, 3): the whole view
    chunk uploads and preps in ONE dispatch (identical math to
    :func:`_prep_jit` — bilinear_resize batches over leading dims; the
    per-view path paid an upload + dispatch per camera)."""
    imgs = rgbs.astype(jnp.float32) / 255.0
    imgs = bilinear_resize(imgs, out_hw)
    return (imgs - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)


@dataclasses.dataclass
class Detections:
    """Reference-compatible detection container (supervision.Detections
    subset used at ``utils/grounded_sam.py:433-442``)."""

    xyxy: np.ndarray          # (N, 4) absolute pixel coords
    confidence: np.ndarray    # (N,)
    class_id: np.ndarray      # (N,) indices into the query class list
    mask: Optional[np.ndarray] = None


def tokenize_classes(
    classes: Sequence[str], tokenize: Callable[[str], List[int]]
) -> Tuple[np.ndarray, List[Tuple[int, int]]]:
    """Build '[CLS] c1 . c2 . ... [SEP]' ids + per-class token spans."""
    ids = [CLS_ID]
    spans = []
    for c in classes:
        toks = tokenize(c)
        spans.append((len(ids), len(ids) + len(toks)))
        ids.extend(toks)
        ids.append(DOT_ID)
    ids.append(SEP_ID)
    return np.asarray([ids], np.int64), spans


class GroundingDinoDetector:
    def __init__(self, params, cfg: Optional[GroundingDinoConfig] = None,
                 tokenize: Optional[Callable[[str], List[int]]] = None,
                 short_side: int = 800, max_side: int = 1333,
                 view_chunk: Optional[int] = None,
                 compute_dtype: str = "float32",
                 query_chunk: Optional[int] = 4096,
                 gather_impl: Optional[str] = "auto"):
        # Commit the weights to device ONCE. Host-numpy leaves would be
        # re-transferred on EVERY jitted forward (jax converts non-Array
        # args per call) — through the remote TPU tunnel that is tens of
        # seconds per detection for the ~0.7 GB swin-t+BERT tree.
        self.params = jax.device_put(params)
        self.cfg = cfg or GroundingDinoConfig()
        self.tokenize = tokenize
        self.short_side = short_side
        self.max_side = max_side
        # Max views per forward in predict_with_classes_batch. None = all
        # views in one batch — the multi-chip layout (views shard over the
        # dp mesh axis, __graft_entry__.dryrun_multichip stage 5). With the
        # default query_chunk the 4-view 800-scale batch fits one 16 GB
        # chip (the round-3 HBM overflow came from un-tiled deformable
        # gather temporaries). Chunking changes scheduling only, never
        # numerics (per-view math is independent; chunked==unchunked pinned
        # in tests).
        self.view_chunk = view_chunk
        # ``compute_dtype="bfloat16"``: the gated MXU trunk (Swin + encoder
        # run bf16, selection/decoder/heads stay f32 — model.py docstring);
        # ``query_chunk`` tiles the encoder's deformable gather so the
        # temporaries scale with the tile, not (views x queries x levels x
        # points).
        self.compute_dtype = compute_dtype
        self.query_chunk = query_chunk
        # ``gather_impl``: how the encoder's deformable-attention gather
        # runs. "auto" resolves to the Mosaic kernel on a TPU backend
        # (gather_pallas.deformable_gather_pallas — tables VMEM-resident;
        # measured in-context: 11.9 vs 29.5 ms per encoder layer per view,
        # 4-view detection 1558 -> 1353 ms bf16 on the switch alone, exact
        # f32 parity) and the XLA corner-table path elsewhere. Explicit
        # "pallas" / "pallas_interpret" / "xla" / None override; batches
        # >1 view and sharded forwards resolve back to XLA (_gather_for).
        # The decoder's Q=900 cross-attention gather always stays on the
        # XLA path (tiny; confines VMEM pressure to the encoder).
        if gather_impl == "auto":
            gather_impl = "pallas" if jax.default_backend() == "tpu" else None
        self.gather_impl = gather_impl
        self._view_mesh = None

    def shard_views(self, mesh, axis: str = "dp") -> "GroundingDinoDetector":
        """Scale multi-camera detection across chips: params replicated,
        the view axis of each batched forward sharded over mesh ``axis``
        (same contract as ``Dinov2Backbone.shard_views`` /
        ``XMemCore.shard_views``). Per-view detection is independent
        (reference ``utils/grounded_sam.py:404-442`` loops views on one
        GPU), so XLA partitions the batch with zero collectives. Forces
        the all-views-one-batch layout (``view_chunk`` is ignored: the
        single-chip HBM bound it works around does not apply when each
        chip holds V/axis views)."""
        from d3fields_tpu.parallel.mesh import replicate

        self.params = replicate(mesh, self.params)
        self._view_mesh = (mesh, axis)
        return self

    def _gather_for(self, views_per_forward: int) -> Optional[str]:
        """Resolve the gather lowering for a forward whose (per-device)
        view batch is ``views_per_forward``. The Mosaic kernel is
        validated for the single-view batch (BN = 8 head-slices): larger
        view batches crash the backend compiler (BN=32 probed, round 5),
        so multi-view batches take the XLA gather. The sharded path
        passes its PER-SHARD view count — under ``shard_map`` each shard
        traces a local B = V/n forward, so one view per chip keeps the
        kernel (plain GSPMD jit cannot partition a pallas_call; vc=1 is
        also the measured single-chip optimum, bench_grounded_sam)."""
        if self.gather_impl and self.gather_impl.startswith("pallas") and (
                views_per_forward > 1):
            return None
        return self.gather_impl

    def _forward_view_sharded(self, pixels, ids_np: np.ndarray):
        """All-views detection forward under ``shard_map``: per-view
        detection is collective-free, so each mesh shard runs the same
        forward on its V/n local views. This is how the sharded path
        keeps the Mosaic gather kernel — a ``pallas_call`` has no GSPMD
        partitioning spec (plain jit would replicate or fail), but inside
        ``shard_map`` the kernel traces at the LOCAL batch, which at one
        view per chip is exactly the validated BN=8 shape. Composition is
        pinned on the virtual CPU mesh with the interpret-mode kernel
        (tests/test_parallel_train.py)."""
        from jax.sharding import PartitionSpec as P

        try:
            from jax import shard_map as _shard_map  # jax >= 0.6 style

            def shmap(f, mesh, in_specs, out_specs):
                return _shard_map(f, mesh=mesh, in_specs=in_specs,
                                  out_specs=out_specs, check_vma=False)
        except ImportError:
            from jax.experimental.shard_map import shard_map as _shard_map

            def shmap(f, mesh, in_specs, out_specs):
                return _shard_map(f, mesh=mesh, in_specs=in_specs,
                                  out_specs=out_specs, check_rep=False)

        from d3fields_tpu.models.groundingdino import model as gd

        mesh, axis = self._view_mesh
        n = mesh.shape[axis]
        if pixels.shape[0] % n:
            raise ValueError(
                f"views count {pixels.shape[0]} not divisible by mesh "
                f"axis {axis!r} of size {n}")
        gather = self._gather_for(pixels.shape[0] // n)
        text_self_mask_np, pos_ids_np = gd.generate_text_masks(ids_np)
        token_mask_np = np.ones_like(ids_np, bool)

        def body(params, px, ids, tsm, pid, tkm):
            return gd._groundingdino_forward_impl(
                params, self.cfg, px, ids, tsm, pid, tkm,
                self.compute_dtype, self.query_chunk, gather)

        fwd = shmap(
            body, mesh,
            (P(), P(axis), P(axis), P(axis), P(axis), P(axis)),
            (P(axis), P(axis)))
        prec = "float32" if self.compute_dtype == "float32" else "default"
        with jax.default_matmul_precision(prec):
            return fwd(self.params, pixels, jnp.asarray(ids_np),
                       jnp.asarray(text_self_mask_np),
                       jnp.asarray(pos_ids_np), jnp.asarray(token_mask_np))

    def _prep(self, rgb: np.ndarray):
        H, W = rgb.shape[:2]
        scale = self.short_side / min(H, W)
        if max(H, W) * scale > self.max_side:
            scale = self.max_side / max(H, W)
        return _prep_jit(jnp.asarray(rgb),
                         (round(H * scale), round(W * scale)))

    def predict_with_classes(
        self, image: np.ndarray, classes: Sequence[str],
        box_threshold: float, text_threshold: float = 0.25,
        input_ids: Optional[np.ndarray] = None,
        spans: Optional[List[Tuple[int, int]]] = None,
    ) -> Detections:
        """image: (H, W, 3) RGB uint8. Either a tokenizer was configured or
        (input_ids, spans) are given precomputed."""
        if input_ids is None:
            if self.tokenize is None:
                raise ValueError("no tokenizer configured; pass input_ids")
            input_ids, spans = tokenize_classes(classes, self.tokenize)

        H, W = image.shape[:2]
        pixels = self._prep(image)
        logits, boxes = groundingdino_forward(
            self.params, self.cfg, pixels, input_ids,
            self.compute_dtype, self.query_chunk, self._gather_for(1),
        )
        # reduce on device into ONE packed buffer: ~32 KB and ONE round
        # trip instead of the ~1 MB sigmoid map / four serialized fetches
        red = _reduce_detection_outputs(
            logits, boxes, jnp.asarray(_span_mask(spans, logits.shape[-1])),
            jnp.float32(text_threshold))
        sc, st, sf, bx = _unpack_reduced(np.asarray(red[0]), len(spans))
        return _postprocess_view_reduced(sc, st, sf, bx, box_threshold,
                                         (H, W))

    def predict_with_classes_batch(
        self, images: np.ndarray, classes: Sequence[str],
        box_threshold: float, text_threshold: float = 0.25,
        input_ids: Optional[np.ndarray] = None,
        spans: Optional[List[Tuple[int, int]]] = None,
    ) -> List[Detections]:
        """All V views in ONE forward (the reference detects per view in a
        python loop, ``fusion.py:1116-1120``). images (V, H, W, 3)."""
        if input_ids is None:
            if self.tokenize is None:
                raise ValueError("no tokenizer configured; pass input_ids")
            input_ids, spans = tokenize_classes(classes, self.tokenize)
        V, H, W = images.shape[:3]
        chunk = V if self._view_mesh is not None else (self.view_chunk or V)
        # phase 1: DISPATCH every chunk (prep -> forward -> packed device
        # reduction) without a single host sync — the dispatches queue on
        # the device back-to-back; phase 2 fetches. Fetching inside the
        # loop serialized a ~27 ms round trip per chunk behind each
        # forward (measured round 5); deferring the fetches overlaps them
        # with the later chunks' compute.
        mask = jnp.asarray(_span_mask(spans, self.cfg.max_text_len))
        thr = jnp.float32(text_threshold)
        scale = self.short_side / min(H, W)
        if max(H, W) * scale > self.max_side:
            scale = self.max_side / max(H, W)
        out_hw = (round(H * scale), round(W * scale))
        pending = []
        for s in range(0, V, chunk):
            n_chunk = min(chunk, V - s)
            # pad a short tail chunk to the full chunk size so every
            # iteration reuses ONE compiled executable
            pad = chunk - n_chunk if s else 0
            sel = list(range(s, s + n_chunk)) + [s + n_chunk - 1] * pad
            pixels = _prep_batch_jit(jnp.asarray(images[sel]), out_hw)
            ids = np.repeat(np.asarray(input_ids), n_chunk + pad, axis=0)
            if self._view_mesh is not None:
                from d3fields_tpu.parallel.mesh import shard_leading_checked

                mesh, axis = self._view_mesh
                pixels = shard_leading_checked(mesh, pixels, axis)
                logits, boxes = self._forward_view_sharded(pixels, ids)
            else:
                logits, boxes = groundingdino_forward(
                    self.params, self.cfg, pixels, ids,
                    self.compute_dtype, self.query_chunk,
                    self._gather_for(pixels.shape[0]),
                )
            pending.append(
                (_reduce_detection_outputs(logits, boxes, mask, thr),
                 n_chunk))
        red_all = np.concatenate(
            [np.asarray(red)[:n] for red, n in pending], axis=0)
        sc, st, sf, bx = _unpack_reduced(red_all, len(spans))

        out = []
        for v in range(V):
            out.append(_postprocess_view_reduced(
                sc[v], st[v], sf[v], bx[v], box_threshold, (H, W),
            ))
        return out


def _span_mask(spans, L: int) -> np.ndarray:
    """(C, L) bool membership mask for the class token spans. A class whose
    tokenization is empty (span width 0) gets an all-false row — it can
    never be assigned (matches the old zero-size-reduction guard)."""
    m = np.zeros((len(spans), L), bool)
    for c, (s, e) in enumerate(spans):
        m[c, s:e] = True
    return m


@jax.jit
def _reduce_detection_outputs(logits, boxes, span_mask, text_threshold):
    """Reduce raw head outputs ON DEVICE to what post-processing needs,
    packed into ONE buffer: per-query max score, boxes, per-(query,
    class-span) thresholded and raw maxima. logits (V, Q, L); span_mask
    (C, L) bool. Returns (V, Q, 1+4+2C) f32: [score, box4, thr_C, fb_C].

    Two tunnel economics in one (phase-measured, round 5): the packed
    (Q, 2C+5) slab is ~32 KB vs the ~1 MB full sigmoid map, and ONE
    buffer means ONE device->host round trip — fetching four separate
    arrays cost 4 x ~27 ms serialized round trips (~110 ms/view, more
    than the whole transformer). Same math as the host reductions it
    replaces (max is exact; 0-fill identities hold since probs >= 0),
    pinned by test_postprocess_device_reduction_parity."""
    probs = jax.nn.sigmoid(logits)                       # (V, Q, L)
    scores = probs.max(axis=-1)                          # (V, Q)
    p = probs[:, :, None, :]                             # (V, Q, 1, L)
    m = span_mask[None, None]                            # (1, 1, C, L)
    span_fb = jnp.where(m, p, 0.0).max(-1)               # (V, Q, C)
    thr = jnp.where(p > text_threshold, p, 0.0)
    span_thr = jnp.where(m, thr, 0.0).max(-1)            # (V, Q, C)
    return jnp.concatenate(
        [scores[..., None], boxes.astype(jnp.float32), span_thr, span_fb],
        axis=-1)


def _unpack_reduced(red: np.ndarray, C: int):
    """(..., 1+4+2C) packed slab -> (scores, span_thr, span_fb, boxes)."""
    return (red[..., 0], red[..., 5:5 + C], red[..., 5 + C:5 + 2 * C],
            red[..., 1:5])


def _postprocess_view_reduced(scores, span_thr, span_fb, boxes,
                              box_threshold, hw):
    """Host tail of the detection post-processing, from the device-reduced
    arrays: threshold on the max sigmoid token logit, assign the class by
    the strongest span among tokens above ``text_threshold`` (the
    reference's phrase extraction, ``utils/grounded_sam.py:414``), convert
    to absolute xyxy, drop near-duplicates."""
    H, W = hw
    keep = scores > box_threshold
    if not keep.any():
        return Detections(
            xyxy=np.zeros((0, 4), np.float32),
            confidence=np.zeros((0,), np.float32),
            class_id=np.zeros((0,), np.int64),
        )
    kb = boxes[keep]
    span_scores = span_thr[keep]
    # boxes whose every span token fell below text_threshold fall back to
    # the unthresholded response (reference would emit an empty phrase)
    span_scores = np.where(
        span_scores.max(axis=1, keepdims=True) > 0, span_scores,
        span_fb[keep],
    )
    cx, cy, bw, bh = kb.T
    xyxy = np.stack(
        [(cx - bw / 2) * W, (cy - bh / 2) * H,
         (cx + bw / 2) * W, (cy + bh / 2) * H], axis=1
    ).astype(np.float32)
    return dedup_boxes(Detections(
        xyxy=xyxy, confidence=scores[keep].astype(np.float32),
        class_id=span_scores.argmax(axis=1).astype(np.int64),
    ))


def _postprocess_view(probs, boxes, spans, box_threshold, text_threshold, hw):
    """Detection post-processing for one view from FULL sigmoid maps
    (numpy). The device path reduces on device and goes straight to
    :func:`_postprocess_view_reduced`; this wrapper computes the identical
    reductions in numpy — kept as the reference implementation and the
    parity anchor for the device reduction."""
    m = _span_mask(spans, probs.shape[1])
    scores = probs.max(axis=1)
    p = probs[:, None, :]                                 # (Q, 1, L)
    span_fb = np.where(m[None], p, 0.0).max(-1)           # (Q, C)
    thr = np.where(p > text_threshold, p, 0.0)
    span_thr = np.where(m[None], thr, 0.0).max(-1)
    return _postprocess_view_reduced(scores, span_thr, span_fb, boxes,
                                     box_threshold, hw)


def box_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N, 4) x (M, 4) xyxy -> (N, M) IoU."""
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = np.clip(rb - lt, 0, None).prod(-1)
    area_a = np.clip(a[:, 2:] - a[:, :2], 0, None).prod(-1)
    area_b = np.clip(b[:, 2:] - b[:, :2], 0, None).prod(-1)
    return inter / (area_a[:, None] + area_b[None] - inter + 1e-9)


def dedup_boxes(det: Detections, iou_threshold: float = 0.9) -> Detections:
    """Drop near-duplicate detections, keeping the higher confidence
    (reference duplicate-box removal, ``utils/grounded_sam.py:500-517``)."""
    n = det.xyxy.shape[0]
    if n <= 1:
        return det
    order = np.argsort(-det.confidence)
    iou = box_iou(det.xyxy, det.xyxy)
    keep = np.ones(n, bool)
    for rank, i in enumerate(order):
        if not keep[i]:
            continue
        for j in order[rank + 1:]:
            if keep[j] and iou[i, j] > iou_threshold:
                keep[j] = False
    return Detections(
        xyxy=det.xyxy[keep], confidence=det.confidence[keep],
        class_id=det.class_id[keep],
        mask=None if det.mask is None else det.mask[keep],
    )
