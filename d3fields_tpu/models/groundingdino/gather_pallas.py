"""Pallas TPU kernel for the deformable-attention gather.

The reference detector rides a CUDA ``MultiScaleDeformableAttention``
extension (``env.yaml:33``, reached via ``utils/grounded_sam.py:418-424``).
The pure-XLA rebuild (`model.deformable_attention_core`) is
equivalence-pinned but measured 5-10x above its own HBM-gather roofline —
XLA lowers ``jnp.take`` of (1, 128) rows to an index-serial loop with no
pipelining (round-4 verdict, PARITY.md "GroundingDINO: gather-bound").

TPU-first design (NOT a translation of the CUDA op, which parallelizes
over CUDA threads per (query, head) and bilinearly samples four scattered
``hd``-wide taps per point):

- The per-level **corner tables** (``model._corner_table``: one zero-padded
  row holds all four bilinear taps, 4*hd = 128 channels = one full f32
  vector row) are concatenated over levels and ride a normal VMEM
  ``BlockSpec`` whose index map is CONSTANT over the query-tile grid axis —
  the Pallas pipeline elides re-fetch when consecutive block indices match,
  so each (batch*head) slice is DMA'd from HBM exactly once and stays
  VMEM-resident for every query tile of that slice. (A manual
  ``pltpu.ANY`` + ``make_async_copy`` delivery of the same slice was
  bisected to crash the v5e TPU worker — /tmp lore, round 5 — so the
  pipelined input is the load-bearing choice.) The table input is
  ``pl.Buffered(buffer_count=1)``: double-buffering a constant-index block
  is pure waste, and at the 800 scale the f32 table slice is 9.35 MB/bn —
  two copies would not fit VMEM (probed on chip: single-buffered full-R
  f32 compiles and runs; double-buffered cannot allocate). The gather then
  never touches HBM: HBM sees one sequential pass over tables + indices +
  outputs per view-layer instead of 2.28M random 512 B reads.
- The table is **always f32 in VMEM** (bf16 inputs are cast before the
  call): Mosaic cannot compile single-sublane dynamic-offset accesses of
  bf16 rows — bf16 packs two 128-lane rows per sublane, and every bf16
  variant probed (direct (1,128) loads, (16,128) aligned loads + dynamic
  ``pltpu.roll``) died in the backend compiler (INTERNAL). f32 rows are
  one full sublane, the exact granularity the dynamic loads support. An
  aligned-(8,128)-load + dynamic-roll f32 variant compiles but is ~1.7x
  SLOWER than Mosaic's own dynamic-sublane load lowering (24.7 vs 14.4
  ns/row on chip), so the straightforward load is the keeper.
- Sample **row indices and folded weights** (bilinear corner weights x
  attention weight x zeros-padding validity) are precomputed as dense
  vector math in XLA (:func:`_sample_indices_weights` — the exact
  ``model._table_bilinear`` index/weight rules, shared constants and all),
  so the kernel's scalar core does nothing but address arithmetic.
- In-kernel, the indices are DMA'd to SMEM (scalar-addressable) and a
  ``fori_loop`` over the tile's queries copies LP = L*P table rows per
  query from the VMEM-resident table into a (T, LP*128) scratch — each
  row lands in a static 128-aligned LANE slice, so the layout never needs
  a Mosaic-unsupported lane-splitting reshape. A static epilogue of
  LP x 4 lane-slice multiply-adds applies the packed weights and reduces
  to (T, hd) in f32.

Numerics: identical index/weight math to the XLA path; taps are gathered
in the table's dtype and the weighted reduction accumulates in f32 (the
XLA path's ``_table_bilinear`` multiplies in tap dtype and sums in tap
dtype — for f32 tables the two agree to reassociation noise; for bf16
tables the kernel is slightly MORE precise). Equivalence is pinned in
interpret mode (tests/test_groundingdino.py) and on-chip
(tests_tpu/test_gdino_gather.py).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_QUERY_TILE = 256  # queries per grid step; LP*T gather rows per step


def level_row_offsets(spatial_shapes: Sequence[Tuple[int, int]]):
    """Row offset of each level's corner table in the level-concatenated
    table, plus the total row count (RAW sum of (h+1)*(w+1) — NOT padded
    to a sublane multiple; the kernel takes R from tables.shape and
    Mosaic handles non-multiple block rows)."""
    offs, start = [], 0
    for h, w in spatial_shapes:
        offs.append(start)
        start += (h + 1) * (w + 1)
    total = start
    return offs, total


def _sample_indices_weights(
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: Array,
    attention_weights: Array,
) -> Tuple[Array, Array]:
    """Fold every per-sample scalar the gather needs into dense arrays.

    sampling_locations (B, Q, nh, L, P, 2) in [0, 1]; attention_weights
    (B, Q, nh, L, P). Returns (idx (BN, Q, L*P) int32 rows into the
    level-concatenated corner table, w4 (BN, Q, L*P, 4) f32 = bilinear
    corner weights x validity x attention weight). Index/weight rules are
    EXACTLY ``model._table_bilinear``'s (grid_sample align_corners=False,
    zeros padding): base corners outside [-1, size-1] clamp onto a real
    border row whose contribution the zeroed weights kill.
    """
    B, Q, nh, L, P, _ = sampling_locations.shape
    offs, _ = level_row_offsets(spatial_shapes)
    grids = (2.0 * sampling_locations - 1.0).astype(jnp.float32)
    # (B, nh, Q, L, P, .) so the flattened leading axis is BN = B*nh
    grids = grids.transpose(0, 2, 1, 3, 4, 5)
    wgt = attention_weights.astype(jnp.float32).transpose(0, 2, 1, 3, 4)
    idx_l, w4_l = [], []
    for li, (h, w) in enumerate(spatial_shapes):
        gx, gy = grids[:, :, :, li, :, 0], grids[:, :, :, li, :, 1]
        ix = ((gx + 1.0) * w - 1.0) * 0.5
        iy = ((gy + 1.0) * h - 1.0) * 0.5
        x0 = jnp.floor(ix)
        y0 = jnp.floor(iy)
        tx, ty = ix - x0, iy - y0
        x0c = jnp.clip(x0, -1.0, w - 1.0)
        y0c = jnp.clip(y0, -1.0, h - 1.0)
        valid = (x0 == x0c) & (y0 == y0c)
        idx = ((y0c + 1.0) * (w + 1) + (x0c + 1.0)).astype(jnp.int32) + offs[li]
        w4 = jnp.stack(
            [(1 - tx) * (1 - ty), tx * (1 - ty), (1 - tx) * ty, tx * ty],
            axis=-1,
        ) * (valid.astype(jnp.float32) * wgt[:, :, :, li])[..., None]
        idx_l.append(idx)
        w4_l.append(w4)
    idx = jnp.stack(idx_l, axis=3).reshape(B * nh, Q, L * P)
    w4 = jnp.stack(w4_l, axis=3).reshape(B * nh, Q, L * P, 4)
    return idx, w4


def _make_gather_kernel(T: int, LP: int, hd: int):
    """Kernel body for one (bn, query-tile) grid step.

    idx_ref (1, T, LP) int32 VMEM; w_ref (1, T, LP*4) f32 VMEM (lane-packed
    s*4+k); table_ref (1, R, 4*hd) VMEM — constant block index over the
    tile axis, so the pipeline fetches each bn slice once; out_ref
    (1, T, hd) f32. Scratch: rows (T, LP*4*hd) gathered rows, one static
    128-lane slice per (q, s); stage (8, LP*4*hd); idx_smem (1, T, LP)
    int32; sem DMA semaphore.
    """

    def kernel(idx_ref, w_ref, table_ref, out_ref, rows, stage, idx_smem,
               sem):
        table_vmem = table_ref.at[0]

        # indices to SMEM: the gather loop needs them as scalars for VMEM
        # addressing (vector memory cannot feed the scalar address stream)
        cp = pltpu.make_async_copy(idx_ref, idx_smem, sem)
        cp.start()
        cp.wait()

        four_hd = 4 * hd

        # Mosaic rejects dynamic stores at unaligned sublanes (probe-
        # verified): gather each query GROUP of 8 into a small staging
        # scratch with fully STATIC stores (static sublane j, static
        # 128-aligned lane slice s), then land the group with ONE aligned
        # (G, LP*128) block store. The table row loads stay dynamic —
        # dynamic unaligned LOADS are supported.
        G = 8

        def body(g, _):
            base = pl.multiple_of(g * G, G)
            for j in range(G):  # static unroll: G*LP independent row loads
                for s in range(LP):
                    r = idx_smem[0, g * G + j, s]
                    stage[j:j + 1, s * four_hd:(s + 1) * four_hd] = (
                        table_vmem[pl.ds(r, 1), :])
            rows[pl.ds(base, G), :] = stage[:, :]
            return 0

        jax.lax.fori_loop(0, T // G, body, 0, unroll=False)

        # static epilogue: LP x 4 lane-slice multiply-adds, f32 accumulate
        acc = jnp.zeros((T, hd), jnp.float32)
        for s in range(LP):
            tap = rows[:, s * four_hd:(s + 1) * four_hd].astype(jnp.float32)
            for k in range(4):
                wk = w_ref[0, :, s * 4 + k:s * 4 + k + 1]  # (T, 1)
                acc += tap[:, k * hd:(k + 1) * hd] * wk
        out_ref[0] = acc

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("spatial_shapes", "query_tile", "interpret"),
)
def deformable_gather_pallas(
    tables: Array,
    spatial_shapes: Tuple[Tuple[int, int], ...],
    sampling_locations: Array,
    attention_weights: Array,
    *,
    query_tile: int = _QUERY_TILE,
    interpret: bool = False,
) -> Array:
    """Deformable-attention gather with the corner tables VMEM-resident.

    tables: (BN, R, 4*hd) level-concatenated corner tables
      (:func:`concat_corner_tables`); sampling_locations
      (B, Q, nh, L, P, 2) in [0, 1]; attention_weights (B, Q, nh, L, P).
    Returns (B, Q, nh*hd) f32 — same contract as
    ``model.deformable_attention_core``.
    """
    B, Q, nh, L, P, _ = sampling_locations.shape
    BN, R, four_hd = tables.shape
    assert BN == B * nh, (BN, B, nh)
    hd = four_hd // 4
    LP = L * P
    if query_tile % 8 != 0:
        # the gather loop walks whole 8-query groups (fori_loop over
        # T//8); a ragged tail would read uninitialized rows-scratch in
        # the epilogue — garbage, not an error, so reject it here
        raise ValueError(f"query_tile must be a multiple of 8, got "
                         f"{query_tile}")
    # f32 rows only: see module docstring (bf16 row granularity is
    # un-compilable in-kernel; the cast is one sequential HBM pass)
    tables = tables.astype(jnp.float32)

    idx, w4 = _sample_indices_weights(
        spatial_shapes, sampling_locations, attention_weights)
    # lane-pack the weights (s, k) -> s*4+k so the kernel epilogue reads
    # them as static (T, 1) lane slices — no in-kernel reshape needed
    w_packed = w4.reshape(BN, Q, LP * 4)

    pad = (-Q) % query_tile
    if pad:
        idx = jnp.pad(idx, ((0, 0), (0, pad), (0, 0)))
        w_packed = jnp.pad(w_packed, ((0, 0), (0, pad), (0, 0)))
    qp = Q + pad
    nt = qp // query_tile
    T = query_tile

    out = pl.pallas_call(
        _make_gather_kernel(T, LP, hd),
        grid=(BN, nt),
        in_specs=[
            pl.BlockSpec((1, T, LP), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, LP * 4), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            # constant tile index: the (R, 4*hd) slice is fetched once per
            # bn by the pipeline (re-fetch elided while the index repeats)
            # and stays VMEM-resident across that bn's query tiles;
            # single-buffered — the full-scale f32 slice (9.35 MB) does
            # not fit twice, and a constant block never needs a prefetch
            # overlap (8 x 9.35 MB ~ 91 us of HBM traffic per call total)
            pl.BlockSpec((1, R, four_hd), lambda b, t: (b, 0, 0),
                         pl.Buffered(buffer_count=1),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, hd), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BN, qp, hd), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((T, LP * four_hd), tables.dtype),
            pltpu.VMEM((8, LP * four_hd), tables.dtype),
            pltpu.SMEM((1, T, LP), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * BN * qp * LP * 4 * hd,
            bytes_accessed=(BN * R * four_hd * tables.dtype.itemsize
                            + BN * qp * LP * (4 + 16)
                            + BN * qp * hd * 4),
            transcendentals=0,
        ),
    )(idx, w_packed, tables)
    # (BN, Q, hd) -> (B, Q, nh*hd)
    out = out[:, :Q].reshape(B, nh, Q, hd).transpose(0, 2, 1, 3)
    return out.reshape(B, Q, nh * hd)


def concat_corner_tables(value: Array,
                         spatial_shapes: Sequence[Tuple[int, int]]) -> Array:
    """(B, S, nh, hd) values -> (B*nh, R_total, 4*hd) level-concatenated
    corner tables (``model._corner_table`` per level, stacked on the row
    axis in level order — matching :func:`level_row_offsets`)."""
    from d3fields_tpu.models.groundingdino.model import _corner_table

    B, S, nh, hd = value.shape
    tables: List[Array] = []
    start = 0
    for h, w in spatial_shapes:
        v = value[:, start: start + h * w]
        v = v.transpose(0, 2, 1, 3).reshape(B * nh, h, w, hd)
        tables.append(_corner_table(v))
        start += h * w
    return jnp.concatenate(tables, axis=1)
