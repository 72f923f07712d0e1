"""Pallas TPU kernels + gather layouts for the fused field-query hot path.

The reference's bottleneck is the (V, N, 1024) bilinear feature gather +
weighted fuse (``fusion.py:372-388``), which forces 60k-point chunking on
GPU. The TPU design:

- **Patch-grid descriptor maps** (DINOv2, small h*w): interpolation becomes
  an *interpolation-matrix matmul* — per point-tile and view a 4-sparse
  (T, P) matrix (bilinear tap weights pre-multiplied by the view's
  visibility*distance weight, built in-register from a broadcasted-iota
  compare) hits the MXU against the (P, C) map. All views' maps sit
  resident in VMEM (constant BlockSpec index map — DMA'd once per grid);
  an f32 accumulator carries the cross-view sum so nothing of size
  (V, N, C) ever exists. bf16 on TPU, HIGHEST-precision f32 for parity.
- **Full-resolution maps** (masks/colors) + the nearest-depth visibility
  tap share ONE packed row gather per (view, point): the four bilinear
  corner pixels are pre-packed into a single table row
  (:func:`pack_corner_table`, one HBM pass per state, hoisted out of the
  tile loop), the nearest pixel is always one of those corners, and depth
  rides as channel 0 of each corner, read out through a round-half-even
  one-hot. 4x fewer gathers than per-corner taps (measured 4.3x faster).
- **Dist-only queries** use lane-aligned row gathers (512-byte transfers +
  one-hot lane select) instead of width-1 element gathers.

Measured on 1M points / 4 views (v5e): dist-only 40ms, +1024-d descriptors
~110ms, +full-res masks ~122ms (8.6M pts/s end-to-end). Hard-won lowering
facts are documented inline (scatters serialize; small lax.gather slices
lower to scalar loops; vmapped batched gathers are ~2x slower than per-view
unrolled takes; a 4-wide packed depth gather loses to 128-lane rows until a
full-res map shares the row).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from d3fields_tpu.fields import geometry

Array = jax.Array

_EPS = 1e-6
INVALID_DIST = 1e3

# Feature maps with h*w above this use the XLA gather path instead (the
# interpolation matrix would not fit VMEM); below it, MXU matmul wins.
MAX_ONEHOT_PIXELS = 8192
_POINT_TILE = 256


def _fused_gather_kernel(idx_ref, w_ref, feats_ref, out_ref):
    """One point-tile step: out = sum_v onehot_v(idx, w) @ feats[v].

    ``feats`` holds every view's flattened map ((V, P, C), resident in VMEM
    across the whole grid -- its index map is constant so it is DMA'd exactly
    once). Per view a 4-sparse (T, P) interpolation matrix is built
    in-register from a broadcasted-iota compare and fed to the MXU; an f32
    accumulator carries the cross-view sum, so nothing of size (V, T, C)
    ever exists.
    """
    idx = idx_ref[:]  # (T, 4V) int32: columns [4v:4v+4] are view v's taps
    wgt = w_ref[:]    # (T, 4V): tap weights, zeros for invalid/oob taps
    T = idx.shape[0]
    V, P, C = feats_ref.shape
    dt = feats_ref.dtype
    precision = (
        jax.lax.Precision.HIGHEST if dt == jnp.float32 else jax.lax.Precision.DEFAULT
    )

    iota_p = jax.lax.broadcasted_iota(jnp.int32, (T, P), 1)
    acc = jnp.zeros((T, C), dtype=jnp.float32)
    for v in range(V):
        interp = jnp.zeros((T, P), dtype=dt)
        for tap in range(4):
            col = 4 * v + tap
            hit = (iota_p == jnp.broadcast_to(idx[:, col][:, None], (T, P))).astype(dt)
            interp = interp + hit * jnp.broadcast_to(
                wgt[:, col][:, None], (T, P)
            ).astype(dt)
        acc = acc + jnp.dot(
            interp,
            feats_ref[v],
            preferred_element_type=jnp.float32,
            precision=precision,
        )
    out_ref[:] = acc


@functools.partial(
    jax.jit, static_argnames=("point_tile", "interpret", "matmul_dtype")
)
def fused_weighted_interp(
    feats: Array,
    idx: Array,
    w: Array,
    *,
    point_tile: int = _POINT_TILE,
    interpret: bool = False,
    matmul_dtype: str = "bfloat16",
) -> Array:
    """Multi-view weighted bilinear interpolation as one MXU matmul per tile.

    Args:
      feats: (V, P, C) flattened per-view feature maps.
      idx: (V, N, 4) int32 flat tap indices (from ``geometry.bilinear_taps``).
      w: (V, N, 4) tap weights, already multiplied by the per-(view, point)
        fusion weight; zero rows simply contribute nothing.
      matmul_dtype: dtype of the interpolation matmul. bf16 keeps descriptor
        error far inside the <1e-3 cosine budget (weights are exact in bf16
        only up to rounding; products accumulate in f32 on the MXU).

    Returns: (N, C) float32 — ``sum_v sum_tap w * feats[v, idx]``.
    """
    V, P, C = feats.shape
    N = idx.shape[1]
    if jnp.dtype(matmul_dtype) == jnp.float32:
        point_tile = min(point_tile, 128)  # f32 interp temporaries are 2x
    pad = (-N) % point_tile
    if pad:
        idx = jnp.pad(idx, ((0, 0), (0, pad), (0, 0)))
        w = jnp.pad(w, ((0, 0), (0, pad), (0, 0)))
    n_padded = N + pad
    num_tiles = n_padded // point_tile

    # Interleave views along the tap axis: the kernel sees one (V, P, C)
    # table (resident in VMEM, DMA'd once) and one (N, 4V) tap set whose
    # columns [4v:4v+4] are view v's taps -> V small matmuls per tile.
    idx_flat = jnp.transpose(idx, (1, 0, 2)).reshape(n_padded, 4 * V)
    w_flat = jnp.transpose(w, (1, 0, 2)).reshape(n_padded, 4 * V)
    dt = jnp.dtype(matmul_dtype)
    feats_t = feats.astype(dt)
    w_flat = w_flat.astype(dt)

    max_c = max(128, (6_500_000 // (V * P * dt.itemsize)) // 128 * 128)
    chunks = []
    for c0 in range(0, C, max_c):
        c1 = min(C, c0 + max_c)
        cw = c1 - c0
        chunk = pl.pallas_call(
            _fused_gather_kernel,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((point_tile, 4 * V), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((point_tile, 4 * V), lambda i: (i, 0), memory_space=pltpu.VMEM),
                # Constant index map: the feature table is DMA'd once and
                # stays resident in VMEM for the whole grid.
                pl.BlockSpec((V, P, cw), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((point_tile, cw), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_padded, cw), jnp.float32),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * n_padded * V * P * cw,
                bytes_accessed=V * P * cw * dt.itemsize + n_padded * cw * 4,
                transcendentals=0,
            ),
        )(idx_flat, w_flat, feats_t[..., c0:c1])
        chunks.append(chunk)
    out = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=-1)
    return out[:N]


def _nearest_via_rows(depth: Array, xy: Array, hw: Tuple[int, int],
                      lane: int = 128) -> Array:
    """Nearest-neighbor depth sampling via lane-aligned row gathers.

    Exact ``sample_map_nearest`` semantics (round-half-even, zeros padding):
    the flat pixel index is split into (row of ``lane``, lane), full rows are
    gathered (one 512-byte transfer instead of a 4-byte element gather), and
    the lane is selected with a one-hot dot.
    """
    H, W = hw
    ix = jnp.round(geometry._unnormalize(xy[:, 0], W, W, True)).astype(jnp.int32)
    iy = jnp.round(geometry._unnormalize(xy[:, 1], H, H, True)).astype(jnp.int32)
    inb = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
    flat_idx = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
    total = H * W
    pad = (-total) % lane
    flat = depth.reshape(-1)
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), depth.dtype)])
    table = flat.reshape(-1, lane)
    rows = jnp.take(table, flat_idx // lane, axis=0)        # (N, lane)
    sel = jax.nn.one_hot(flat_idx % lane, lane, dtype=depth.dtype)
    return (rows * sel).sum(-1) * inb.astype(depth.dtype)


def _fullres_taps_packed(xy: Array, hw: Tuple[int, int]):
    """Shared full-resolution tap set for one view, packed-table form.

    Returns (base (N,) int32 row index into the packed 2x2-corner table,
    bw (N, 4) bilinear zeros-padded weights, nearest_sel (N, 4) one-hot of
    the round-half-to-even nearest corner, nearest_inb (N,)). The nearest
    pixel is always one of the four bilinear corners, so depth (nearest)
    and mask/color (bilinear) share ONE row gather — exact grid_sample
    parity for both modes.
    """
    H, W = hw
    # shared parity-critical corner/weight rules (zeros padding,
    # align_corners unnormalize) live in geometry.bilinear_corner_weights
    x0i, y0i, bw = geometry.bilinear_corner_weights(xy, (H, W), (H, W))
    # Packed rows are indexed by top-left corner over the 1-px-padded grid
    # (y0 in [-1, H-1], x0 in [-1, W-1]); points farther out clamp onto a
    # valid row whose contribution is killed by the zero weights above.
    base = (jnp.clip(y0i, -1, H - 1) + 1) * (W + 1) + (jnp.clip(x0i, -1, W - 1) + 1)
    # nearest corner: round-half-even relative to the bilinear base corner
    ix = geometry._unnormalize(xy[:, 0], W, W, True)
    iy = geometry._unnormalize(xy[:, 1], H, H, True)
    rx = jnp.round(ix).astype(jnp.int32)
    ry = jnp.round(iy).astype(jnp.int32)
    nearest_inb = (rx >= 0) & (rx <= W - 1) & (ry >= 0) & (ry <= H - 1)
    sel = jax.nn.one_hot(
        (ry - y0i) * 2 + (rx - x0i), 4, dtype=xy.dtype
    )
    return base, bw, sel, nearest_inb.astype(xy.dtype)


def pack_corner_table(state, return_names: Tuple[str, ...]) -> Array:
    """Precompute the packed 2x2-corner gather table for the full-res maps.

    Row ``(y0+1)*(W+1) + (x0+1)`` of the result holds the four bilinear
    corner pixels ``[(y0,x0), (y0,x0+1), (y0+1,x0), (y0+1,x0+1)]`` of the
    concatenated [depth | full-res maps] stack, with out-of-image pixels
    zero (zeros-padding grid_sample baked into the table). One row gather
    per (view, point) then serves the nearest-depth visibility tap AND
    every full-res bilinear map — 4x fewer gathers than per-corner taps
    (measured 4.3x faster on v5e). Cost: one pass over HBM (~25 MB for
    4 views at 240x320x5), hoisted out of the ``lax.map`` tile loop by
    ``batch_eval``.

    Returns (V, (H+1)*(W+1), 4*Ctot) with Ctot = 1 + sum of map channels,
    tap-major layout: ``row.reshape(4, Ctot)[tap]`` is corner ``tap``.
    """
    H, W = state.image_hw
    maps = state.feature_maps(tuple(return_names)) if return_names else {}
    full = [state.depth[..., None]] + [
        maps[n] for n in return_names if maps[n].shape[1:3] == (H, W)
    ]
    stack = jnp.concatenate(full, axis=-1)  # (V, H, W, Ctot)
    V = stack.shape[0]
    tp = jnp.pad(stack, ((0, 0), (1, 1), (1, 1), (0, 0)))
    packed = jnp.concatenate(
        [
            tp[:, : H + 1, : W + 1],
            tp[:, : H + 1, 1 : W + 2],
            tp[:, 1 : H + 2, : W + 1],
            tp[:, 1 : H + 2, 1 : W + 2],
        ],
        axis=-1,
    )  # (V, H+1, W+1, 4*Ctot), tap-major: [tap0 chans | tap1 | tap2 | tap3]
    return packed.reshape(V, (H + 1) * (W + 1), 4 * stack.shape[-1])


def eval_field_fused(
    state,
    pts: Array,
    return_names: Tuple[str, ...] = ("dino_feats", "mask"),
    packed_table: Array | None = None,
) -> Dict[str, Array]:
    """Drop-in fused replacement for ``fusion.eval_field`` on TPU.

    ONE packed row-gather per (view, point) serves every full-resolution map
    AND the nearest-depth visibility tap: the four bilinear corner pixels are
    pre-packed into one table row (:func:`pack_corner_table`, pass it as
    ``packed_table`` to hoist the packing out of a tile loop), with depth as
    channel 0 of each corner read out through the nearest-corner one-hot.
    Patch-grid descriptor maps go through the Pallas interpolation-matrix
    MXU kernel (:func:`fused_weighted_interp`).
    """
    mu = jnp.asarray(state.mu, pts.dtype)
    xy, in_front, pts_depth = geometry.project_points(pts, state.pose, state.K)
    H, W = state.image_hw
    V = state.num_views
    N = pts.shape[0]

    names = tuple(return_names)
    maps = state.feature_maps(names) if names else {}
    full_names = [n for n in names if maps[n].shape[1:3] == (H, W)]
    patch_names = [n for n in names if maps[n].shape[1:3] != (H, W)]

    if full_names:
        # ---- combined packed full-res gather: depth + every full-res map.
        # (per-corner jnp.take taps were 4.3x slower; a contiguous
        # 2-pixel-slice lax.gather variant is ~40x slower: TPU lowers small
        # unaligned gather slices to scalar loops. One whole-row take from
        # the pre-packed 2x2-corner table is the fast form.)
        if packed_table is None:
            packed_table = pack_corner_table(state, names)
        ctot = packed_table.shape[-1] // 4
        base, bw4, sel4, ninb = jax.vmap(
            lambda p: _fullres_taps_packed(p, (H, W))
        )(xy)  # (V, N[, .])
        rows = jnp.stack(
            [jnp.take(packed_table[v], base[v], axis=0) for v in range(V)]
        ).reshape(V, N, 4, ctot)  # (V, N, 4, Ctot)
        inter_depth = (rows[..., 0] * sel4).sum(-1) * ninb  # (V, N)
    else:
        # dist-only query: single nearest tap per view. Width-1 element
        # gathers are latency-bound on TPU; fetching 128-wide rows and
        # selecting the lane with a one-hot dot is ~20% faster (and beats a
        # 4-wide packed-corner gather, which only wins once >=1 full-res map
        # shares the row).
        inter_depth = jnp.stack(
            [_nearest_via_rows(state.depth[v], xy[v], (H, W)) for v in range(V)]
        )

    dist_raw = inter_depth - pts_depth
    dist_valid = (inter_depth > 0.0) & in_front & (dist_raw > -mu)
    weight = jnp.exp(jnp.clip(mu - jnp.abs(dist_raw), max=0.0) / mu)
    dist = jnp.clip(dist_raw, -mu, mu)

    vf = dist_valid.astype(pts.dtype)
    denom = vf.sum(axis=0)
    dist_fused = (dist * vf).sum(axis=0) / (denom + _EPS)
    all_invalid = denom == 0
    dist_fused = jnp.where(all_invalid, jnp.asarray(INVALID_DIST, pts.dtype), dist_fused)

    outputs: Dict[str, Array] = {
        "dist": dist_fused,
        "valid_mask": jnp.logical_not(all_invalid),
    }
    if not names:
        return outputs

    vw = vf * weight  # (V, N)
    on_tpu = jax.default_backend() == "tpu"
    # f32 (HIGHEST-precision matmul) off-TPU for exact parity testing; bf16
    # on TPU where it doubles MXU throughput inside the cosine budget.
    matmul_dtype = "bfloat16" if on_tpu else "float32"

    def finish(acc, name):
        val = acc / (denom[:, None] + _EPS)
        val = jnp.where(all_invalid[:, None], 0.0, val)
        outputs[name] = val.astype(pts.dtype)

    # full-res maps: interpolate from the already-gathered rows
    c0 = 1
    for name in full_names:
        C = maps[name].shape[-1]
        tap = rows[..., c0 : c0 + C]                     # (V, N, 4, C)
        interp = (tap * bw4[..., None]).sum(axis=2)      # (V, N, C)
        finish((interp * vw[..., None]).sum(axis=0), name)
        c0 += C

    # patch-grid maps: Pallas interpolation-matrix matmul
    for name in patch_names:
        m = maps[name]
        _, h, w_, C = m.shape
        if h * w_ <= MAX_ONEHOT_PIXELS:
            idx, tw = jax.vmap(
                lambda p: geometry.bilinear_taps(p, (H, W), (h, w_))
            )(xy)
            acc = fused_weighted_interp(
                m.reshape(V, h * w_, C), idx, tw * vw[..., None],
                interpret=not on_tpu, matmul_dtype=matmul_dtype,
            )
        else:
            acc = None
            for v in range(V):
                tap = geometry.sample_map_bilinear(m[v], xy[v], (H, W))
                contrib = tap * vw[v][:, None]
                acc = contrib if acc is None else acc + contrib
        finish(acc, name)
    return outputs
