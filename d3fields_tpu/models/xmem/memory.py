"""XMem's three-tier memory as a static-shape, fully jittable pytree.

The reference grows tensors with ``torch.cat`` per memory frame and slices
them dynamically (``XMem/inference/kv_memory_store.py:36-156``,
``XMem/inference/memory_manager.py:57-284``) — shapes change every 5 frames,
which would force an XLA recompile per step. Here both stores are
preallocated to their hard capacities with validity derived from a size
scalar, so one compiled step serves the whole video:

- working memory: capacity ``max_mid_term_frames * HW`` exactly, because
  elements arrive in HW-sized frames and consolidation fires the moment size
  reaches capacity (reference trigger ``memory_manager.py:182-189``), after
  which exactly ``min_mid_term_frames * HW`` remain (the sieve keeps frame 0
  plus the ``min_mt-1`` newest frames, ``memory_manager.py:152-170``);
- long-term memory: capacity ``max_long_term_elements``; consolidation
  appends exactly ``num_prototypes`` usage-top elements, eviction keeps the
  ``max_long - num_prototypes`` most used (``kv_memory_store.py:135-156``);
- every structural event (consolidate / evict) is a ``lax.cond`` between
  same-shape branches, and all slice offsets/lengths are static.

Object groups: all objects entering at frame 0 is the d3fields usage
(``fusion.py:1173-1256`` seeds every instance on the first frame) and the
default compile path. Mid-video entry (the reference's multi-group memory,
``kv_memory_store.py:10-16``) is supported with ``multi_group=True``:
per-object entry offsets restrict each object's affinity to the key slots
written since it entered — exactly the reference's per-group softmax over
the trailing key subset (``memory_manager.py:120-135``).

Multi-group WITH long-term memory goes BEYOND the reference: its own path
is broken there (the sieve keeps each group's own first HW of values
against group-0's first HW of keys — misaligned — and its eviction raises
NotImplementedError, ``kv_memory_store.py:146-151``). The sound semantics
implemented here extend the per-group principle through both structural
events:

- consolidation potentiates each object's prototype values over ONLY its
  visible candidate slots (a per-object masked softmax; an object whose
  entry postdates the whole candidate block contributes nothing);
- each long-term slot carries a per-object visibility bit (``l_vis``):
  object o may attend prototype j iff o's values actually informed j —
  the long-term generalization of the working-memory entry offset;
- entry offsets are remapped across the consolidation compaction, and
  eviction gathers visibility alongside the surviving slots;
- usage is accounted once per GROUP (objects sharing an entry frame
  compute identical affinities, so each group's attention counts once —
  matching the reference's one-softmax-per-group accounting,
  ``memory_manager.py:136-145``).

When every object enters at frame 0 this reduces exactly to the
single-group path (pinned by tests/test_xmem.py).

Attention math is the reference's anisotropic L2 similarity with shrinkage
and selection (``XMem/model/memory_util.py:7-40``) and top-k sparse softmax
(``memory_util.py:42-66``), laid out (L, HW) so both the similarity and the
value readout are MXU matmuls.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from d3fields_tpu.config import XMemConfig

Array = jax.Array

_NEG_INF = -1e30


@flax.struct.dataclass
class XMemMemory:
    """Working + long-term stores and the per-object hidden state.

    Shapes (CK key dim, CV value dim, O objects, Wc/Lc capacities):
      wk (CK, Wc), ws (Wc,), we (CK, Wc), wv (O, CV, Wc),
      w_use/w_life (Wc,), w_size ();
      lk (CK, Lc), ls (Lc,), lv (O, CV, Lc), l_use/l_life (Lc,), l_size ();
      hidden (O, h, w, CH).
    """

    wk: Array
    ws: Array
    we: Array
    wv: Array
    w_use: Array
    w_life: Array
    w_size: Array
    lk: Array
    ls: Array
    lv: Array
    l_use: Array
    l_life: Array
    l_size: Array
    hidden: Array
    # multi-group bookkeeping (only meaningful when multi_group=True):
    # w_entry[o] = first working slot whose keys object o may attend;
    # active[o] = object o has been seeded (inactive objects read zeros);
    # l_vis[o, j] = object o's values informed long-term prototype j
    # (the long-term continuation of the entry offset)
    w_entry: Array = None
    active: Array = None
    l_vis: Array = None
    # static memory-plan fields
    hw: int = flax.struct.field(pytree_node=False, default=0)
    top_k: int = flax.struct.field(pytree_node=False, default=30)
    min_elements: int = flax.struct.field(pytree_node=False, default=0)
    num_prototypes: int = flax.struct.field(pytree_node=False, default=128)
    long_term: bool = flax.struct.field(pytree_node=False, default=True)
    multi_group: bool = flax.struct.field(pytree_node=False, default=False)

    @property
    def work_capacity(self) -> int:
        return self.wk.shape[1]

    @property
    def long_capacity(self) -> int:
        return self.lk.shape[1]


def init_memory(
    cfg: XMemConfig,
    num_objects: int,
    key_hw: Tuple[int, int],
    *,
    dtype=jnp.float32,
    multi_group: bool = False,
) -> XMemMemory:
    """Preallocate stores for a (h, w) key grid (1/16 of the padded input).

    ``cfg.enable_long_term=False`` mirrors the reference's
    ``--disable_long_term`` eval mode (``XMem/eval.py:51,70``): frames
    accumulate in working memory with no consolidation, usage accounting
    inert, long-term buffers empty. The reference's working memory is then
    unbounded (``memory_manager.py:175-189`` skips all cleanup); here the
    static capacity is still ``max_mid_term_frames * hw`` — size it to the
    video (``ceil(num_frames / mem_every) + 1`` memory frames) for exact
    reference semantics; past capacity the oldest non-first frame is
    FIFO-dropped (documented deviation, unreachable when sized right).
    """
    if not cfg.enable_long_term and cfg.max_mid_term_frames < 2:
        raise ValueError(
            "enable_long_term=False needs max_mid_term_frames >= 2: the "
            "bounded working memory keeps the permanent first frame plus "
            "at least the newest frame (and lax.cond traces the FIFO-drop "
            "branch even before capacity is reached)"
        )
    h, w = key_hw
    hw = h * w
    wc = cfg.max_mid_term_frames * hw
    lc = cfg.max_long_term_elements if cfg.enable_long_term else 1
    ck, cv, ch = cfg.key_dim, cfg.value_dim, cfg.hidden_dim
    z = functools.partial(jnp.zeros, dtype=dtype)
    return XMemMemory(
        wk=z((ck, wc)), ws=z((wc,)), we=z((ck, wc)),
        wv=z((num_objects, cv, wc)),
        w_use=z((wc,)), w_life=jnp.full((wc,), 1e-7, dtype),
        w_size=jnp.zeros((), jnp.int32),
        lk=z((ck, lc)), ls=z((lc,)), lv=z((num_objects, cv, lc)),
        l_use=z((lc,)), l_life=jnp.full((lc,), 1e-7, dtype),
        l_size=jnp.zeros((), jnp.int32),
        hidden=z((num_objects, h, w, ch)),
        hw=hw, top_k=cfg.top_k,
        min_elements=cfg.min_mid_term_frames * hw,
        # consolidation picks prototypes from the candidate block of
        # wc - min_elements entries; clamp for tiny key grids (the
        # reference always has hw >= 1200 so never hits this)
        num_prototypes=min(
            cfg.num_prototypes, wc - cfg.min_mid_term_frames * hw
        ),
        long_term=cfg.enable_long_term,
        multi_group=multi_group,
        # until an object is activated it may attend nothing; activation
        # (seed or mid-video entry) sets w_entry to the slot its first
        # frame lands in
        w_entry=jnp.full((num_objects,), wc, jnp.int32),
        active=jnp.zeros((num_objects,), bool),
        l_vis=jnp.zeros((num_objects, lc), bool),
    )


def activate_objects(mem: XMemMemory, new_objects: Array) -> XMemMemory:
    """Mark ``new_objects`` (O,) bool as entering NOW: their memory
    visibility starts at the next written slot (the reference opens a new
    object group whose values cover only keys appended from this frame on,
    ``kv_memory_store.py:58-79``)."""
    entering = new_objects & ~mem.active
    return mem.replace(
        w_entry=jnp.where(entering, mem.w_size.astype(jnp.int32), mem.w_entry),
        active=mem.active | new_objects,
    )


# ---------------------------------------------------------------------------
# similarity / affinity (reference memory_util.py)
# ---------------------------------------------------------------------------

def similarity(
    mk: Array, ms: Optional[Array], qk: Array, qe: Optional[Array]
) -> Array:
    """Anisotropic L2 similarity (``memory_util.py:7-40``), MXU form.

    mk (CK, L), ms (L,) or None, qk (CK, N), qe (CK, N) or None -> (L, N).
    """
    ck = mk.shape[0]
    if qe is not None:
        # -mk².qe + 2mk.(qk*qe) as ONE (L, 2CK)@(2CK, N) matmul: K=2*64=128
        # fills the MXU's systolic depth exactly (two K=64 matmuls run at
        # half utilization).
        m2 = jnp.concatenate([-jnp.square(mk), 2.0 * mk], axis=0)  # (2CK, L)
        q2 = jnp.concatenate([qe, qk * qe], axis=0)                # (2CK, N)
        b_sq = jnp.sum(qe * jnp.square(qk), axis=0)  # (N,)
        sim = m2.T @ q2 - b_sq[None, :]
    else:
        a_sq = jnp.sum(jnp.square(mk), axis=0)      # (L,)
        two_ab = 2.0 * (mk.T @ qk)
        sim = -a_sq[:, None] + two_ab
    if ms is not None:
        sim = sim * ms[:, None]
    return sim / np.sqrt(ck)


def topk_softmax(sim: Array, top_k: int, *, return_usage: bool = False,
                 span: float = 60.0, iters: int = 30):
    """Top-k sparse softmax over the memory axis (``memory_util.py:42-66``).

    sim (L, N) -> dense affinity (L, N) with only the top-k entries per
    query nonzero. Usage = affinity row-sums (L,).

    ``lax.top_k`` over a 22k memory axis is a per-row sort on TPU and costs
    ~10x the rest of the attention. Instead the k-th-largest value per query
    is found by VALUE BISECTION over ``[max - span, max]`` (count >= mid per
    step) and the affinity is a masked softmax above that threshold — the
    dense affinity falls out directly, so no scatter/densification pass
    either (measured: 140ms -> ~50ms for 4 views at L=22000, N=1200).

    Exactness: after ``iters`` halvings the threshold is within
    ``span * 2**-iters`` (~5e-8) of the true k-th value. Entries below
    ``max - span`` can only be picked up when the true k-th value is lower
    still, and carry softmax weights < exp(-span) ~ 9e-27 — numerically
    invisible. Exact ties at the threshold keep all tied entries where the
    reference keeps an arbitrary k of them (``torch.topk`` index order).
    """
    L, N = sim.shape
    mx = jnp.max(sim, axis=0)                       # (N,)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum((sim >= mid[None, :]).astype(jnp.int32), axis=0)
        geq = cnt >= top_k
        return jnp.where(geq, mid, lo), jnp.where(geq, hi, mid)

    lo, _ = jax.lax.fori_loop(
        0, iters, body, (mx - jnp.asarray(span, sim.dtype), mx)
    )
    e = jnp.where(sim >= lo[None, :], jnp.exp(sim - mx[None, :]), 0.0)
    affinity = e / jnp.sum(e, axis=0, keepdims=True)
    if return_usage:
        return affinity, affinity.sum(axis=1)
    return affinity


def topk_softmax_exact(sim: Array, top_k: int, *, return_usage: bool = False):
    """Reference-exact ``lax.top_k`` form of :func:`topk_softmax` (slow on
    TPU; kept as the oracle the bisection form is tested against)."""
    L, N = sim.shape
    vals, idxs = jax.lax.top_k(sim.T, top_k)        # (N, k)
    vals = jnp.exp(vals - vals[:, :1])              # max is first (sorted)
    vals = vals / vals.sum(axis=1, keepdims=True)
    # Densify without scatter (XLA scatters serialize on TPU): accumulate
    # per-tap iota-compare one-hots -- pure VPU work that XLA fuses.
    iota = jax.lax.broadcasted_iota(jnp.int32, (N, L), 1)
    aff_t = jnp.zeros((N, L), sim.dtype)
    for t in range(top_k):
        hit = (iota == idxs[:, t][:, None]).astype(sim.dtype)
        aff_t = aff_t + hit * vals[:, t][:, None]
    affinity = aff_t.T
    if return_usage:
        return affinity, affinity.sum(axis=1)
    return affinity


def softmax_full(sim: Array) -> Array:
    """Plain softmax over the memory axis (consolidation potentiation)."""
    return jax.nn.softmax(sim, axis=0)


# ---------------------------------------------------------------------------
# match / readout
# ---------------------------------------------------------------------------

def match_memory(mem: XMemMemory, qk: Array, qe: Optional[Array]):
    """Attention over [long-term, working] memory with usage accounting.

    qk/qe: (CK, N) query key/selection. Returns (readout (O, CV, N),
    updated memory). Mirrors ``MemoryManager.match_memory``
    (``memory_manager.py:57-150``) for the single-group case; empty slots
    are masked to -inf instead of sliced away.
    """
    lc, wc = mem.long_capacity, mem.work_capacity
    keys = jnp.concatenate([mem.lk, mem.wk], axis=1)        # (CK, Lc+Wc)
    shr = jnp.concatenate([mem.ls, mem.ws], axis=0)
    valid = jnp.concatenate(
        [
            jnp.arange(lc) < mem.l_size,
            jnp.arange(wc) < mem.w_size,
        ]
    )
    sim = similarity(keys, shr, qk, qe)
    sim = jnp.where(valid[:, None], sim, _NEG_INF)
    if mem.multi_group:
        return _match_memory_multi_group(mem, sim, valid)
    affinity, usage = topk_softmax(sim, mem.top_k, return_usage=True)
    # materialize the dense affinity: without the barrier XLA fuses the
    # 30-tap densification into the readout matmul's operand and re-executes
    # it for every output tile (~5x the whole match cost)
    affinity = jax.lax.optimization_barrier(affinity)

    values = jnp.concatenate([mem.lv, mem.wv], axis=2)      # (O, CV, Lc+Wc)
    readout = jnp.einsum("ocl,ln->ocn", values, affinity)

    # usage accounting (kv_memory_store.update_usage): +usage, life +1,
    # valid slots only.
    l_valid = jnp.arange(lc) < mem.l_size
    w_valid = jnp.arange(wc) < mem.w_size
    mem = mem.replace(
        l_use=mem.l_use + jnp.where(l_valid, usage[:lc], 0.0),
        l_life=mem.l_life + l_valid.astype(mem.l_life.dtype),
        w_use=mem.w_use + jnp.where(w_valid, usage[lc:], 0.0),
        w_life=mem.w_life + w_valid.astype(mem.w_life.dtype),
    )
    return readout, mem


def _match_memory_multi_group(mem: XMemMemory, sim: Array, valid: Array):
    """Per-object affinity over each object's visible key subset.

    The reference computes one softmax per object GROUP over the trailing
    keys appended since that group entered (``memory_manager.py:120-135``);
    here each object carries its entry offset, so objects sharing an entry
    frame compute identical affinities (same masked softmax — group
    semantics without materializing groups). With long-term memory enabled
    each object additionally attends the long-term slots its values
    informed (``l_vis``; see the module docstring — the reference's own
    multi-group long-term path is broken, ``kv_memory_store.py:146-151``).

    Usage accounting follows the single-group rule but counts each GROUP's
    affinity once (the reference runs one softmax per group and adds its
    row sums once, ``memory_manager.py:136-145``): objects sharing an
    entry split their contribution by group size. Without long-term memory
    usage is inert (the reference constructs its store with
    count_usage=False then, ``memory_manager.py:32``), so none is
    recorded.
    """
    lc, wc = mem.long_capacity, mem.work_capacity
    slot = jnp.arange(wc)

    def per_object(entry, lvis_o, vals):
        # vals: (CV, Lc+Wc) — this object's value slab
        vis = jnp.concatenate([lvis_o, slot >= entry]) & valid
        sim_o = jnp.where(vis[:, None], sim, _NEG_INF)
        # an object with no visible slot yet (inactive) would softmax over
        # all -inf -> NaN; feed it the global sim instead and zero the
        # readout after (callers also mask its probabilities)
        any_vis = jnp.any(vis)
        sim_o = jnp.where(any_vis, sim_o, sim)
        aff = topk_softmax(sim_o, mem.top_k)
        aff = jax.lax.optimization_barrier(aff)
        out = vals @ aff                               # (CV, N)
        return jnp.where(any_vis, out, 0.0), jnp.where(any_vis, aff.sum(1), 0.0)

    values = jnp.concatenate([mem.lv, mem.wv], axis=2)  # (O, CV, Lc+Wc)
    readout, aff_sums = jax.vmap(per_object)(mem.w_entry, mem.l_vis, values)

    if not mem.long_term:
        return readout, mem
    # group-deduped usage: objects with the same entry form one group
    # whose (identical) affinity counts once
    same = mem.w_entry[:, None] == mem.w_entry[None, :]      # (O, O)
    group_size = jnp.sum(same & mem.active[None, :], axis=1)
    weight = jnp.where(mem.active, 1.0 / jnp.maximum(group_size, 1), 0.0)
    usage = jnp.einsum("o,ol->l", weight.astype(aff_sums.dtype), aff_sums)
    l_valid = jnp.arange(lc) < mem.l_size
    w_valid = jnp.arange(wc) < mem.w_size
    mem = mem.replace(
        l_use=mem.l_use + jnp.where(l_valid, usage[:lc], 0.0),
        l_life=mem.l_life + l_valid.astype(mem.l_life.dtype),
        w_use=mem.w_use + jnp.where(w_valid, usage[lc:], 0.0),
        w_life=mem.w_life + w_valid.astype(mem.w_life.dtype),
    )
    return readout, mem


# ---------------------------------------------------------------------------
# add + consolidation + eviction
# ---------------------------------------------------------------------------

def _consolidate(mem: XMemMemory) -> XMemMemory:
    """Working -> long-term compression. Runs when w_size == work_capacity.

    Reference ``compress_features``/``consolidation``
    (``memory_manager.py:211-284``): candidates are everything between
    frame 0 and the newest ``min_mt - 1`` frames; the ``num_prototypes``
    most-used become long-term entries via affinity-weighted (potentiated)
    readout; the candidate block is removed from working memory.
    """
    hw, wc = mem.hw, mem.work_capacity
    minw = mem.min_elements
    P = mem.num_prototypes
    cand_lo, cand_hi = hw, wc - minw + hw  # static bounds
    n_cand = cand_hi - cand_lo

    ck = mem.wk.shape[0]
    cand_k = jax.lax.dynamic_slice(mem.wk, (0, cand_lo), (ck, n_cand))
    cand_s = jax.lax.dynamic_slice(mem.ws, (cand_lo,), (n_cand,))
    cand_e = jax.lax.dynamic_slice(mem.we, (0, cand_lo), (ck, n_cand))
    cand_v = jax.lax.dynamic_slice(
        mem.wv, (0, 0, cand_lo), mem.wv.shape[:2] + (n_cand,)
    )
    cand_usage = jax.lax.dynamic_slice(
        mem.w_use / mem.w_life, (cand_lo,), (n_cand,)
    )

    _, proto_idx = jax.lax.top_k(cand_usage, P)
    proto_k = cand_k[:, proto_idx]
    proto_e = cand_e[:, proto_idx]

    # potentiation: full softmax over candidates, readout values + shrinkage
    sim = similarity(cand_k, cand_s, proto_k, proto_e)   # (n_cand, P)
    aff = softmax_full(sim)
    proto_s = cand_s @ aff                               # (P,)
    if mem.multi_group:
        # sound multi-group potentiation (the reference's sieve misaligns
        # values against keys here, memory_manager.py:211-284 +
        # kv_memory_store.py:58-79; see module docstring): each object's
        # prototype values read ONLY its visible candidate slots. Keys /
        # shrinkage are global (key-side, object-independent).
        abs_slot = cand_lo + jnp.arange(n_cand)

        def per_object(entry, vals):                    # vals (CV, n_cand)
            vis = abs_slot >= entry
            any_vis = jnp.any(vis)
            sim_o = jnp.where(any_vis, jnp.where(vis[:, None], sim, _NEG_INF), sim)
            return jnp.where(any_vis, vals @ softmax_full(sim_o), 0.0)

        proto_v = jax.vmap(per_object)(mem.w_entry, cand_v)
        # object o may attend these prototypes iff its values informed them
        vis_new = mem.active & (mem.w_entry < cand_hi)  # (O,)
    else:
        proto_v = jnp.einsum("ocl,lp->ocp", cand_v, aff)

    # remove candidate block from working memory: keep [0, hw) + tail
    tail = minw - hw  # static

    def shift(a, axis):
        t = jax.lax.dynamic_slice_in_dim(a, cand_hi, tail, axis=axis)
        return jax.lax.dynamic_update_slice_in_dim(a, t, hw, axis=axis)

    new_w_size = jnp.asarray(minw, jnp.int32)
    mem = mem.replace(
        wk=shift(mem.wk, 1), ws=shift(mem.ws, 0), we=shift(mem.we, 1),
        wv=shift(mem.wv, 2),
        w_use=shift(mem.w_use, 0), w_life=shift(mem.w_life, 0),
        w_size=new_w_size,
    )
    if mem.multi_group:
        # remap entry offsets across the compaction: entries past the
        # candidate block slide left with the tail; entries INSIDE the
        # removed block clamp to the tail start (those keys are gone —
        # the object keeps access to their compressed form via l_vis).
        # Inactive objects keep the see-nothing sentinel (wc): remapping
        # it would hand a not-yet-entered object visibility of slots
        # appended BEFORE its entry.
        mem = mem.replace(
            w_entry=jnp.where(
                mem.active,
                jnp.where(
                    mem.w_entry >= cand_hi, mem.w_entry - n_cand,
                    jnp.where(mem.w_entry >= cand_lo, hw, mem.w_entry),
                ),
                mem.w_entry,
            ),
        )

    # append prototypes to long-term memory (capacity guaranteed by the
    # eviction that runs before consolidation)
    def put(buf, vals, axis):
        return jax.lax.dynamic_update_slice_in_dim(
            buf, vals.astype(buf.dtype), mem.l_size, axis=axis
        )

    mem = mem.replace(
        lk=put(mem.lk, proto_k, 1),
        ls=put(mem.ls, proto_s, 0),
        lv=put(mem.lv, proto_v, 2),
        l_use=put(mem.l_use, jnp.zeros((P,)), 0),
        l_life=put(mem.l_life, jnp.full((P,), 1e-7), 0),
        l_size=mem.l_size + P,
    )
    if mem.multi_group:
        O = mem.l_vis.shape[0]
        mem = mem.replace(
            l_vis=jax.lax.dynamic_update_slice(
                mem.l_vis,
                jnp.broadcast_to(vis_new[:, None], (O, P)),
                (0, mem.l_size - P),
            ),
        )
    return mem


def _evict_long_term(mem: XMemMemory) -> XMemMemory:
    """Keep the ``long_capacity - num_prototypes`` most-used LT elements.

    Reference ``remove_obsolete_features`` (``kv_memory_store.py:135-156``)
    keeps usage strictly above the cutoff; with a full static buffer we keep
    exactly ``max_size`` by top-k (ties broken by index), then compact.
    """
    lc = mem.long_capacity
    keep = lc - mem.num_prototypes
    valid = jnp.arange(lc) < mem.l_size
    usage = jnp.where(valid, mem.l_use / mem.l_life, -jnp.inf)
    _, keep_idx = jax.lax.top_k(usage, keep)
    keep_idx = jnp.sort(keep_idx)  # preserve temporal order

    def take(a, axis):
        taken = jnp.take(a, keep_idx, axis=axis)
        pad_shape = list(a.shape)
        pad_shape[axis] = lc - keep
        fill = jnp.full(pad_shape, 1e-7 if a is mem.l_life else 0.0, a.dtype)
        return jnp.concatenate([taken, fill], axis=axis)

    mem = mem.replace(
        lk=take(mem.lk, 1), ls=take(mem.ls, 0), lv=take(mem.lv, 2),
        l_use=take(mem.l_use, 0), l_life=take(mem.l_life, 0),
        l_size=jnp.minimum(mem.l_size, keep),
    )
    if mem.multi_group:
        # visibility follows the surviving slots (bool: pad fills False)
        mem = mem.replace(l_vis=take(mem.l_vis, 1))
    return mem


def add_memory(
    mem: XMemMemory,
    key: Array,
    shrinkage: Array,
    value: Array,
    selection: Optional[Array],
) -> XMemMemory:
    """Append one frame's HW elements; consolidate when full.

    key (CK, HW), shrinkage (HW,), value (O, CV, HW), selection (CK, HW).
    Mirrors ``MemoryManager.add_memory`` (``memory_manager.py:152-189``):
    eviction precedes consolidation so the prototype append always fits.
    """
    hw = mem.hw

    if not mem.long_term:
        # --disable_long_term mode: no consolidation ever; when the static
        # capacity would overflow, FIFO-drop the oldest non-first frame
        # BEFORE appending (the newest frame must always survive; see
        # init_memory)
        mem = jax.lax.cond(
            mem.w_size >= mem.work_capacity, _fifo_drop_second_frame,
            lambda m: m, mem,
        )

    def put(buf, vals, axis):
        return jax.lax.dynamic_update_slice_in_dim(
            buf, vals.astype(buf.dtype), mem.w_size, axis=axis
        )

    mem = mem.replace(
        wk=put(mem.wk, key, 1),
        ws=put(mem.ws, shrinkage, 0),
        we=put(mem.we, selection if selection is not None else jnp.zeros_like(key), 1),
        wv=put(mem.wv, value, 2),
        w_use=put(mem.w_use, jnp.zeros((hw,)), 0),
        w_life=put(mem.w_life, jnp.full((hw,), 1e-7), 0),
        w_size=mem.w_size + hw,
    )

    if not mem.long_term:
        return mem
    full = mem.w_size >= mem.work_capacity
    lt_full = mem.l_size >= (mem.long_capacity - mem.num_prototypes)
    mem = jax.lax.cond(
        full & lt_full, _evict_long_term, lambda m: m, mem
    )
    mem = jax.lax.cond(full, _consolidate, lambda m: m, mem)
    return mem


def _fifo_drop_second_frame(mem: XMemMemory) -> XMemMemory:
    """Drop the oldest non-first frame: keep [0, hw) (the permanent first
    frame, as the consolidation sieve also does) and shift [2hw, wc) left
    by one frame."""
    hw, wc = mem.hw, mem.work_capacity
    tail = wc - 2 * hw

    def shift(a, axis):
        t = jax.lax.dynamic_slice_in_dim(a, 2 * hw, tail, axis=axis)
        return jax.lax.dynamic_update_slice_in_dim(a, t, hw, axis=axis)

    # active objects' entry offsets slide with the dropped frame (an entry
    # inside the dropped block clamps to hw: its entry frame is gone);
    # inactive objects keep their sentinel
    new_entry = jnp.where(
        mem.active & (mem.w_entry > hw),
        jnp.maximum(mem.w_entry - hw, hw), mem.w_entry,
    )
    return mem.replace(
        wk=shift(mem.wk, 1), ws=shift(mem.ws, 0), we=shift(mem.we, 1),
        wv=shift(mem.wv, 2),
        w_use=shift(mem.w_use, 0), w_life=shift(mem.w_life, 0),
        w_size=mem.w_size - hw,
        w_entry=new_entry,
    )
