"""XMem port tests.

Two layers of validation:
1. *Torch-oracle parity*: the reference implementation at /root/reference is
   imported (read-only, random weights — checkpoints are unavailable
   offline) and run side-by-side with the JAX port through weight
   conversion. Skipped when the reference tree is absent.
2. *Memory-semantics oracle*: a tiny numpy re-statement of the reference's
   dynamically-growing memory (cat/top-k/softmax, consolidation, eviction)
   checked against the static-buffer implementation.
"""

import dataclasses
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from d3fields_tpu.config import XMemConfig
from d3fields_tpu.models.xmem import blocks as B
from d3fields_tpu.models.xmem import core as C
from d3fields_tpu.models.xmem import memory as M
from d3fields_tpu.models.xmem import network as N

REF = "/root/reference"
HAS_REF = os.path.isdir(os.path.join(REF, "XMem"))


# ---------------------------------------------------------------------------
# block-level numerics vs torch
# ---------------------------------------------------------------------------

def test_upsample_2x_matches_torch():
    import torch
    import torch.nn.functional as F

    rs = np.random.RandomState(0)
    x = rs.randn(2, 5, 7, 3).astype(np.float32)
    ours = np.asarray(B.upsample_2x(jnp.asarray(x)))
    theirs = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2,
            mode="bilinear", align_corners=False,
        ).permute(0, 2, 3, 1).numpy()
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_avg_pool_matches_torch_area():
    import torch
    import torch.nn.functional as F

    rs = np.random.RandomState(1)
    x = rs.randn(2, 8, 12, 4).astype(np.float32)
    for k in (2, 4):
        ours = np.asarray(B.avg_pool(jnp.asarray(x), k))
        theirs = (
            F.interpolate(
                torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=1 / k,
                mode="area",
            ).permute(0, 2, 3, 1).numpy()
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_soft_aggregate_matches_torch():
    sys.path.insert(0, REF) if HAS_REF and REF not in sys.path else None
    if not HAS_REF:
        pytest.skip("reference tree unavailable")
    import torch
    from XMem.model.aggregate import aggregate

    rs = np.random.RandomState(2)
    prob = rs.rand(3, 8, 8).astype(np.float32)
    ours = np.asarray(B.soft_aggregate(jnp.asarray(prob), axis=0))
    theirs = aggregate(torch.from_numpy(prob), dim=0).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# full-network torch-oracle parity through weight conversion
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def torch_xmem():
    if not HAS_REF:
        pytest.skip("reference tree unavailable")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import torch
    from XMem.model import resnet as ref_resnet

    # checkpoints can't be downloaded offline: construct trunks unpretrained
    orig18, orig50 = ref_resnet.resnet18, ref_resnet.resnet50
    ref_resnet.resnet18 = lambda pretrained=True, extra_dim=0: ref_resnet.ResNet(
        ref_resnet.BasicBlock, [2, 2, 2, 2], extra_dim
    )
    ref_resnet.resnet50 = lambda pretrained=True, extra_dim=0: ref_resnet.ResNet(
        ref_resnet.Bottleneck, [3, 4, 6, 3], extra_dim
    )
    try:
        from XMem.model.network import XMem as RefXMem

        torch.manual_seed(0)
        cfg = {"key_dim": 64, "value_dim": 512, "hidden_dim": 64}
        net = RefXMem(cfg).eval()
    finally:
        ref_resnet.resnet18, ref_resnet.resnet50 = orig18, orig50
    return net


@pytest.fixture(scope="module")
def jax_params(torch_xmem):
    sd = {k: v.detach().numpy() for k, v in torch_xmem.state_dict().items()}
    return N.convert_torch_state_dict(sd, XMemConfig())


def test_encode_key_parity(torch_xmem, jax_params):
    import torch

    rs = np.random.RandomState(3)
    img = rs.randn(1, 48, 64, 3).astype(np.float32)
    with torch.no_grad():
        tk, ts, te, tf16, tf8, tf4 = torch_xmem.encode_key(
            torch.from_numpy(img).permute(0, 3, 1, 2)
        )
    k, s, e, f16, f8, f4 = N.encode_key(jax_params, jnp.asarray(img))
    np.testing.assert_allclose(
        np.asarray(k), tk.permute(0, 2, 3, 1).numpy(), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(s)[..., 0], ts[:, 0].numpy(), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(e), te.permute(0, 2, 3, 1).numpy(), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(f16), tf16.permute(0, 2, 3, 1).numpy(), rtol=2e-4, atol=2e-4
    )


def test_encode_value_parity(torch_xmem, jax_params):
    import torch

    rs = np.random.RandomState(4)
    O, H, W = 2, 48, 64
    img = rs.randn(H, W, 3).astype(np.float32)
    masks = rs.rand(O, H, W).astype(np.float32)
    hidden = rs.randn(O, H // 16, W // 16, 64).astype(np.float32) * 0.1

    with torch.no_grad():
        timg = torch.from_numpy(img).permute(2, 0, 1).unsqueeze(0)
        tf16 = torch_xmem.encode_key(timg)[3]
        th = torch.from_numpy(hidden).permute(0, 3, 1, 2).unsqueeze(0)
        tv, th2 = torch_xmem.encode_value(
            timg, tf16, th, torch.from_numpy(masks).unsqueeze(0)
        )
    f16 = N.encode_key(jax_params, jnp.asarray(img)[None])[3][0]
    v, h2 = N.encode_value(
        jax_params, jnp.asarray(img), f16, jnp.asarray(hidden),
        jnp.asarray(masks), is_deep_update=True,
    )
    np.testing.assert_allclose(
        np.asarray(v), tv[0].permute(0, 2, 3, 1).numpy(), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(h2), th2[0].permute(0, 2, 3, 1).numpy(), rtol=2e-3, atol=2e-3
    )


def test_segment_parity(torch_xmem, jax_params):
    import torch

    rs = np.random.RandomState(5)
    O, H, W = 2, 48, 64
    h, w = H // 16, W // 16
    img = rs.randn(1, H, W, 3).astype(np.float32)
    readout = rs.randn(O, h, w, 512).astype(np.float32) * 0.1
    hidden = rs.randn(O, h, w, 64).astype(np.float32) * 0.1

    with torch.no_grad():
        _, _, _, tf16, tf8, tf4 = torch_xmem.encode_key(
            torch.from_numpy(img).permute(0, 3, 1, 2)
        )
        th, tlogits, tprob = torch_xmem.segment(
            (tf16, tf8, tf4),
            torch.from_numpy(readout).permute(0, 3, 1, 2).unsqueeze(0),
            torch.from_numpy(hidden).permute(0, 3, 1, 2).unsqueeze(0),
            h_out=True, strip_bg=False,
        )
    _, _, _, f16, f8, f4 = N.encode_key(jax_params, jnp.asarray(img))
    h2, logits, prob = N.segment(
        jax_params, f16[0], f8[0], f4[0], jnp.asarray(hidden),
        jnp.asarray(readout), h_out=True,
    )
    np.testing.assert_allclose(
        np.asarray(prob), tprob[0].numpy(), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(h2), th[0].permute(0, 2, 3, 1).numpy(), rtol=2e-3, atol=2e-3
    )


def test_topk_softmax_bisection_matches_exact():
    """The bisection top-k (TPU fast path) against the lax.top_k oracle,
    including -1e30-masked invalid slots and a valid-count < k column."""
    rs = np.random.RandomState(7)
    L, N, k = 500, 37, 30
    sim = (5.0 * rs.randn(L, N)).astype(np.float32)
    sim[200:, :] = -1e30          # invalid tail (empty memory slots)
    sim[25:200, -1] = -1e30       # one column with fewer than k valid entries
    aff, usage = M.topk_softmax(jnp.asarray(sim), k, return_usage=True)
    ref, ref_usage = M.topk_softmax_exact(jnp.asarray(sim), k, return_usage=True)
    np.testing.assert_allclose(np.asarray(aff), np.asarray(ref), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(usage), np.asarray(ref_usage), rtol=1e-5, atol=1e-6)
    # sparsity: exactly k materially-nonzero entries where >= k valid
    # entries exist (entries below max - span carry weights < 1e-26 in
    # either form and are not material)
    nnz = (np.asarray(aff) > 1e-20).sum(axis=0)
    assert (nnz[:-1] == k).all()
    assert nnz[-1] == 25  # all valid entries of the short column


def test_attention_matches_reference_math():
    if not HAS_REF:
        pytest.skip("reference tree unavailable")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import torch
    from XMem.model.memory_util import get_similarity, do_softmax

    rs = np.random.RandomState(6)
    CK, L, NQ = 8, 40, 12
    mk = rs.randn(CK, L).astype(np.float32)
    ms = (rs.rand(L).astype(np.float32) + 1.0)
    qk = rs.randn(CK, NQ).astype(np.float32)
    qe = rs.rand(CK, NQ).astype(np.float32)

    sim = np.asarray(M.similarity(jnp.asarray(mk), jnp.asarray(ms),
                                  jnp.asarray(qk), jnp.asarray(qe)))
    tsim = get_similarity(
        torch.from_numpy(mk)[None], torch.from_numpy(ms)[None, None],
        torch.from_numpy(qk)[None], torch.from_numpy(qe)[None],
    )[0].numpy()
    np.testing.assert_allclose(sim, tsim, rtol=1e-4, atol=1e-4)

    aff, usage = M.topk_softmax(jnp.asarray(sim), 5, return_usage=True)
    taff, tusage = do_softmax(
        torch.from_numpy(tsim)[None], top_k=5, return_usage=True
    )
    np.testing.assert_allclose(np.asarray(aff), taff[0].numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(usage), tusage[0].numpy(), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# static memory vs dynamic numpy oracle
# ---------------------------------------------------------------------------

class DynamicOracle:
    """The reference's growing-tensor memory semantics in numpy
    (``kv_memory_store.py`` + ``memory_manager.py``, single group)."""

    def __init__(self, cfg: XMemConfig, hw: int, num_obj: int):
        self.cfg, self.hw, self.num_obj = cfg, hw, num_obj
        self.wk = None  # (CK, n)
        self.ws = None
        self.we = None
        self.wv = None  # (O, CV, n)
        self.wu = None
        self.wl = None
        self.lk = self.ls = self.lv = self.lu = self.ll = None

    def match(self, qk, qe):
        lt_n = 0 if self.lk is None else self.lk.shape[1]
        keys = self.wk if lt_n == 0 else np.concatenate([self.lk, self.wk], 1)
        shr = self.ws if lt_n == 0 else np.concatenate([self.ls, self.ws], 0)
        vals = self.wv if lt_n == 0 else np.concatenate([self.lv, self.wv], 2)
        ck = keys.shape[0]
        a_sq = (keys**2).T @ qe
        two_ab = 2 * keys.T @ (qk * qe)
        b_sq = (qe * qk**2).sum(0)
        sim = (-a_sq + two_ab - b_sq) * shr[:, None] / np.sqrt(ck)
        k = self.cfg.top_k
        aff = np.zeros_like(sim)
        for j in range(sim.shape[1]):
            idx = np.argsort(sim[:, j])[-k:]
            e = np.exp(sim[idx, j] - sim[idx, j].max())
            aff[idx, j] = e / e.sum()
        usage = aff.sum(1)
        self.wu += usage[lt_n:]
        self.wl += 1
        if lt_n:
            self.lu += usage[:lt_n]
            self.ll += 1
        return np.einsum("ocl,ln->ocn", vals, aff)

    def add(self, k, s, v, e):
        def cat(a, b, ax):
            return b if a is None else np.concatenate([a, b], ax)

        self.wk = cat(self.wk, k, 1)
        self.ws = cat(self.ws, s, 0)
        self.we = cat(self.we, e, 1)
        self.wv = cat(self.wv, v, 2)
        self.wu = cat(self.wu, np.zeros(self.hw, np.float32), 0)
        self.wl = cat(self.wl, np.full(self.hw, 1e-7, np.float32), 0)
        maxw = self.cfg.max_mid_term_frames * self.hw
        if self.wk.shape[1] >= maxw:
            # LT eviction precedes consolidation when the prototype append
            # would not fit (memory_manager.py:182-189,
            # kv_memory_store.remove_obsolete_features)
            maxl = self.cfg.max_long_term_elements
            keep = maxl - self.cfg.num_prototypes
            if self.lk is not None and self.lk.shape[1] >= keep:
                usage = self.lu / self.ll
                idx = np.sort(np.lexsort((np.arange(usage.shape[0]),
                                          -usage))[:keep])
                self.lk = self.lk[:, idx]
                self.ls = self.ls[idx]
                self.lv = self.lv[:, :, idx]
                self.lu, self.ll = self.lu[idx], self.ll[idx]
            self._consolidate()

    def _consolidate(self):
        hw, minw = self.hw, self.cfg.min_mid_term_frames * self.hw
        P = self.cfg.num_prototypes
        lo, hi = hw, self.wk.shape[1] - minw + hw
        ck = self.wk[:, lo:hi]
        cs = self.ws[lo:hi]
        ce = self.we[:, lo:hi]
        cv = self.wv[:, :, lo:hi]
        cu = (self.wu / self.wl)[lo:hi]
        # torch.topk / lax.top_k break ties by SMALLEST index; plain
        # argsort breaks them the other way (bites when several
        # candidates have exactly zero usage)
        pidx = np.lexsort((np.arange(cu.shape[0]), -cu))[:P]
        pk, pe = ck[:, pidx], ce[:, pidx]
        nck = ck.shape[0]
        a_sq = (ck**2).T @ pe
        two_ab = 2 * ck.T @ (pk * pe)
        b_sq = (pe * pk**2).sum(0)
        sim = (-a_sq + two_ab - b_sq) * cs[:, None] / np.sqrt(nck)
        sim = sim - sim.max(0, keepdims=True)
        aff = np.exp(sim) / np.exp(sim).sum(0, keepdims=True)
        pv = np.einsum("ocl,lp->ocp", cv, aff)
        ps = cs @ aff

        def sieve(a, ax):
            return np.concatenate(
                [np.take(a, range(0, lo), ax), np.take(a, range(hi, a.shape[ax]), ax)], ax
            )

        self.wk, self.ws, self.we = sieve(self.wk, 1), sieve(self.ws, 0), sieve(self.we, 1)
        self.wv = sieve(self.wv, 2)
        self.wu, self.wl = sieve(self.wu, 0), sieve(self.wl, 0)

        def cat(a, b, ax):
            return b if a is None else np.concatenate([a, b], ax)

        self.lk = cat(self.lk, pk, 1)
        self.ls = cat(self.ls, ps, 0)
        self.lv = cat(self.lv, pv, 2)
        self.lu = cat(self.lu, np.zeros(P, np.float32), 0)
        self.ll = cat(self.ll, np.full(P, 1e-7, np.float32), 0)


@pytest.mark.parametrize("steps,max_lt", [(9, 64), (26, 24)])
@pytest.mark.slow
def test_static_memory_matches_dynamic_oracle(steps, max_lt):
    """steps=9 crosses consolidation events; steps=26 with a small
    long-term capacity additionally fires LT EVICTION several times
    (kv_memory_store.remove_obsolete_features / _evict_long_term)."""
    cfg = XMemConfig(
        max_mid_term_frames=3, min_mid_term_frames=1, num_prototypes=4,
        max_long_term_elements=max_lt, top_k=3,
    )
    hw, ck, cv, O = 6, 8, 10, 2
    mem = M.XMemMemory(
        wk=jnp.zeros((ck, 3 * hw)), ws=jnp.zeros((3 * hw,)),
        we=jnp.zeros((ck, 3 * hw)), wv=jnp.zeros((O, cv, 3 * hw)),
        w_use=jnp.zeros((3 * hw,)), w_life=jnp.full((3 * hw,), 1e-7),
        w_size=jnp.zeros((), jnp.int32),
        lk=jnp.zeros((ck, max_lt)), ls=jnp.zeros((max_lt,)),
        lv=jnp.zeros((O, cv, max_lt)),
        l_use=jnp.zeros((max_lt,)), l_life=jnp.full((max_lt,), 1e-7),
        l_size=jnp.zeros((), jnp.int32),
        hidden=jnp.zeros((O, 1, 1, 4)),
        hw=hw, top_k=cfg.top_k, min_elements=1 * hw, num_prototypes=4,
    )
    oracle = DynamicOracle(cfg, hw, O)
    rs = np.random.RandomState(7)

    for t in range(steps):
        k = rs.randn(ck, hw).astype(np.float32)
        s = (rs.rand(hw) + 1).astype(np.float32)
        v = rs.randn(O, cv, hw).astype(np.float32)
        e = rs.rand(ck, hw).astype(np.float32)
        mem = M.add_memory(mem, jnp.asarray(k), jnp.asarray(s),
                           jnp.asarray(v), jnp.asarray(e))
        oracle.add(k, s, v, e)

        qk = rs.randn(ck, hw).astype(np.float32)
        qe = rs.rand(ck, hw).astype(np.float32)
        readout, mem = M.match_memory(mem, jnp.asarray(qk), jnp.asarray(qe))
        ref = oracle.match(qk, qe)
        assert int(mem.w_size) == oracle.wk.shape[1]
        lt_n = 0 if oracle.lk is None else oracle.lk.shape[1]
        assert int(mem.l_size) == lt_n
        np.testing.assert_allclose(
            np.asarray(readout), ref, rtol=1e-4, atol=1e-4,
            err_msg=f"readout mismatch at t={t}",
        )
        # usage bookkeeping
        ws = int(mem.w_size)
        np.testing.assert_allclose(
            np.asarray(mem.w_use)[:ws], oracle.wu, rtol=1e-4, atol=1e-5
        )


@pytest.mark.slow
def test_core_schedule_and_consolidation():
    cfg = XMemConfig(max_mid_term_frames=4, min_mid_term_frames=2,
                     num_prototypes=8, max_long_term_elements=64,
                     top_k=5, mem_every=2)
    params = N.init_params(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(0)
    V, O, H, W = 2, 2, 48, 48
    core = C.XMemCore(params, cfg, num_views=V, num_objects=O, image_hw=(H, W))
    hw = (H // 16) * (W // 16)

    imgs = jnp.asarray(rs.rand(V, H, W, 3).astype(np.float32))
    mask = jnp.asarray((rs.rand(V, O, H, W) > 0.5).astype(np.float32))
    prob = core.step(imgs, mask)
    assert prob.shape == (V, O + 1, H, W)
    np.testing.assert_allclose(np.asarray(prob).sum(1), 1.0, rtol=1e-5)

    sizes = []
    for t in range(1, 9):
        prob = core.step(jnp.asarray(rs.rand(V, H, W, 3).astype(np.float32)))
        np.testing.assert_allclose(np.asarray(prob).sum(1), 1.0, rtol=1e-4)
        sizes.append(int(np.asarray(core.mem.w_size)[0]))
    # mem frames at t=2,4,6,8 -> sizes (in units of hw): 1,2,2,3,3,4->2,2,3
    assert sizes == [hw, 2 * hw, 2 * hw, 3 * hw, 3 * hw, 2 * hw, 2 * hw, 3 * hw]
    assert int(np.asarray(core.mem.l_size)[0]) == cfg.num_prototypes


@pytest.mark.slow
def test_core_bf16_compute_close_to_f32():
    """compute_dtype='bfloat16' (CNNs in bf16, memory attention f32) must
    track the f32 step closely: same argmax masks on nearly all pixels."""
    cfg32 = XMemConfig(max_mid_term_frames=4, min_mid_term_frames=2,
                       num_prototypes=8, max_long_term_elements=64,
                       top_k=5, mem_every=2)
    cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
    params = N.init_params(jax.random.PRNGKey(2), cfg32)
    rs = np.random.RandomState(3)
    V, O, H, W = 1, 2, 48, 48
    a = C.XMemCore(params, cfg32, num_views=V, num_objects=O, image_hw=(H, W))
    b = C.XMemCore(params, cfg16, num_views=V, num_objects=O, image_hw=(H, W))
    imgs = jnp.asarray(rs.rand(V, H, W, 3).astype(np.float32))
    mask = jnp.asarray((rs.rand(V, O, H, W) > 0.5).astype(np.float32))
    pa = np.asarray(a.step(imgs, mask))
    pb = np.asarray(b.step(imgs, mask))
    assert pb.dtype == np.float32
    np.testing.assert_allclose(pa, pb, rtol=0, atol=1e-6)  # seed uses given mask
    for t in range(1, 4):
        frame = jnp.asarray(rs.rand(V, H, W, 3).astype(np.float32))
        pa = np.asarray(a.step(frame))
        pb = np.asarray(b.step(frame))
        agree = (pa.argmax(1) == pb.argmax(1)).mean()
        # random-init weights on noise give near-uniform probs, where any
        # drift flips the argmax; trained weights sit far from the decision
        # boundary. Bound the drift itself tightly and the flips loosely.
        assert agree > 0.9, f"frame {t}: argmax agreement {agree}"
        drift = np.abs(pa - pb)
        assert np.quantile(drift, 0.99) < 0.1, f"frame {t}: p99 drift"
        assert np.isfinite(pb).all()


# ---------------------------------------------------------------------------
# video tracker bridge
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_video_tracker_end_to_end():
    from d3fields_tpu.seg.video_tracker import VideoMaskTracker

    cfg = XMemConfig(max_mid_term_frames=3, min_mid_term_frames=1,
                     num_prototypes=4, max_long_term_elements=64,
                     top_k=5, mem_every=2)
    params = N.init_params(jax.random.PRNGKey(1), cfg)
    rs = np.random.RandomState(1)
    V, O, H, W = 2, 2, 60, 80
    tracker = VideoMaskTracker(
        params, cfg, num_views=V, num_objects=O, image_hw=(H, W), size=48,
    )
    rgb = rs.randint(0, 255, (V, H, W, 3), dtype=np.uint8)
    mask = rs.randint(0, O + 1, (V, H, W)).astype(np.uint8)
    out = tracker.process(rgb, mask)
    assert out.shape == (V, H, W, O + 1)
    np.testing.assert_allclose(out.sum(-1), 1.0)
    for t in range(3):
        out = tracker.process(
            rs.randint(0, 255, (V, H, W, 3), dtype=np.uint8)
        )
        assert out.shape == (V, H, W, O + 1)
        np.testing.assert_allclose(out.sum(-1), 1.0)
    # reset path (Fusion.clear_xmem_memory, fusion.py:1699-1702)
    tracker.clear_memory()
    out = tracker.process(rgb, mask)
    assert out.shape == (V, H, W, O + 1)


@pytest.mark.slow
def test_full_video_parity_vs_reference_core(torch_xmem):
    """Strongest guarantee: the reference InferenceCore and the static-shape
    JAX port produce the same per-frame probabilities over a video that
    crosses two consolidation events (working->long-term compression).

    min_mid_term_frames must be >= 2: the reference's candidate-value slice
    ``gv[:, :, HW:-min_work+HW]`` hits the negative-zero bug and crashes the
    consolidation for min_mt == 1 (``memory_manager.py:211-234``).
    """
    import torch
    from XMem.inference.inference_core import InferenceCore

    refcfg = {
        "key_dim": 64, "value_dim": 512, "hidden_dim": 64, "top_k": 5,
        "mem_every": 2, "deep_update_every": -1, "enable_long_term": True,
        "enable_long_term_count_usage": True, "max_mid_term_frames": 3,
        "min_mid_term_frames": 2, "num_prototypes": 4,
        "max_long_term_elements": 64,
    }
    core_t = InferenceCore(torch_xmem, refcfg)
    core_t.set_all_labels([1, 2])

    cfg = XMemConfig(
        top_k=5, mem_every=2, max_mid_term_frames=3, min_mid_term_frames=2,
        num_prototypes=4, max_long_term_elements=64,
    )
    sd = {k: v.detach().numpy() for k, v in torch_xmem.state_dict().items()}
    params = N.convert_torch_state_dict(sd, cfg)
    core_j = C.XMemCore(params, cfg, num_views=1, num_objects=2,
                        image_hw=(48, 64))

    rs = np.random.RandomState(9)
    video = rs.rand(7, 48, 64, 3).astype(np.float32)
    m0 = (rs.rand(2, 48, 64) > 0.6).astype(np.float32)

    with torch.no_grad():
        pt = core_t.step(torch.from_numpy(video[0]).permute(2, 0, 1),
                         torch.from_numpy(m0))
    pj = core_j.step(jnp.asarray(video[0])[None], jnp.asarray(m0)[None])
    np.testing.assert_allclose(np.asarray(pj)[0], pt.numpy(), atol=1e-5)
    for t in range(1, 7):
        with torch.no_grad():
            pt = core_t.step(torch.from_numpy(video[t]).permute(2, 0, 1))
        pj = core_j.step(jnp.asarray(video[t])[None])
        np.testing.assert_allclose(
            np.asarray(pj)[0], pt.numpy(), atol=1e-4,
            err_msg=f"prob mismatch at frame {t}",
        )


@pytest.mark.slow
def test_full_video_parity_long_term_disabled(torch_xmem):
    """--disable_long_term protocol (``XMem/eval.py:51,70``): frames
    accumulate in working memory, no consolidation. Within the static
    capacity the semantics are EXACTLY the reference's unbounded store, so
    per-frame probabilities must match the reference InferenceCore running
    with enable_long_term=False."""
    import torch
    from XMem.inference.inference_core import InferenceCore

    refcfg = {
        "key_dim": 64, "value_dim": 512, "hidden_dim": 64, "top_k": 5,
        "mem_every": 2, "deep_update_every": -1, "enable_long_term": False,
        "enable_long_term_count_usage": False,
    }
    core_t = InferenceCore(torch_xmem, refcfg)
    core_t.set_all_labels([1, 2])

    # 7 frames @ mem_every=2 -> 4 memory frames; capacity 8 -> never drops
    cfg = XMemConfig(top_k=5, mem_every=2, enable_long_term=False,
                     max_mid_term_frames=8)
    sd = {k: v.detach().numpy() for k, v in torch_xmem.state_dict().items()}
    params = N.convert_torch_state_dict(sd, cfg)
    core_j = C.XMemCore(params, cfg, num_views=1, num_objects=2,
                        image_hw=(48, 64))

    rs = np.random.RandomState(11)
    video = rs.rand(7, 48, 64, 3).astype(np.float32)
    m0 = (rs.rand(2, 48, 64) > 0.6).astype(np.float32)

    with torch.no_grad():
        pt = core_t.step(torch.from_numpy(video[0]).permute(2, 0, 1),
                         torch.from_numpy(m0))
    pj = core_j.step(jnp.asarray(video[0])[None], jnp.asarray(m0)[None])
    np.testing.assert_allclose(np.asarray(pj)[0], pt.numpy(), atol=1e-5)
    for t in range(1, 7):
        with torch.no_grad():
            pt = core_t.step(torch.from_numpy(video[t]).permute(2, 0, 1))
        pj = core_j.step(jnp.asarray(video[t])[None])
        np.testing.assert_allclose(
            np.asarray(pj)[0], pt.numpy(), atol=1e-4,
            err_msg=f"prob mismatch at frame {t} (long-term disabled)",
        )


def test_disabled_long_term_fifo_past_capacity():
    """Past static capacity the oldest non-first frame is dropped: size
    stays bounded, frame 0 (the permanent reference frame) survives."""
    from d3fields_tpu.models.xmem import memory as M

    cfg = XMemConfig(key_dim=4, value_dim=8, hidden_dim=4, top_k=2,
                     enable_long_term=False, max_mid_term_frames=2)
    mem = M.init_memory(cfg, num_objects=1, key_hw=(2, 3))
    hw = 6
    rs = np.random.RandomState(0)
    frames = [
        (rs.randn(4, hw).astype(np.float32),
         rs.rand(hw).astype(np.float32),
         rs.randn(1, 8, hw).astype(np.float32),
         rs.randn(4, hw).astype(np.float32))
        for _ in range(4)
    ]
    for t, (k, s, v, e) in enumerate(frames):
        mem = M.add_memory(mem, jnp.asarray(k), jnp.asarray(s),
                           jnp.asarray(v), jnp.asarray(e))
        assert int(mem.w_size) <= mem.work_capacity
        assert int(mem.l_size) == 0  # long-term never engaged
        # frame 0 is permanent
        np.testing.assert_array_equal(np.asarray(mem.wk[:, :hw]), frames[0][0])
    # after 4 adds at capacity 2: frame 0 + the newest frame remain
    assert int(mem.w_size) == 2 * hw
    np.testing.assert_array_equal(np.asarray(mem.wk[:, hw:2 * hw]),
                                  frames[3][0])


@pytest.mark.slow
def test_full_video_parity_unsync_deep_update(torch_xmem):
    """deep_update_every > 0 (unsynchronized schedule,
    ``inference_core.py:16-17,51-56``): the decoder GRU hidden updates
    every frame and the value-encoder's reinforced hidden is adopted on
    the first memory frame past the schedule. Per-frame parity vs the
    reference InferenceCore."""
    import torch
    from XMem.inference.inference_core import InferenceCore

    refcfg = {
        "key_dim": 64, "value_dim": 512, "hidden_dim": 64, "top_k": 5,
        "mem_every": 2, "deep_update_every": 3, "enable_long_term": True,
        "enable_long_term_count_usage": True, "max_mid_term_frames": 3,
        "min_mid_term_frames": 2, "num_prototypes": 4,
        "max_long_term_elements": 64,
    }
    core_t = InferenceCore(torch_xmem, refcfg)
    core_t.set_all_labels([1, 2])

    cfg = XMemConfig(top_k=5, mem_every=2, deep_update_every=3,
                     max_mid_term_frames=3, min_mid_term_frames=2,
                     num_prototypes=4, max_long_term_elements=64)
    sd = {k: v.detach().numpy() for k, v in torch_xmem.state_dict().items()}
    params = N.convert_torch_state_dict(sd, cfg)
    core_j = C.XMemCore(params, cfg, num_views=1, num_objects=2,
                        image_hw=(48, 64))

    rs = np.random.RandomState(13)
    video = rs.rand(8, 48, 64, 3).astype(np.float32)
    m0 = (rs.rand(2, 48, 64) > 0.6).astype(np.float32)

    with torch.no_grad():
        pt = core_t.step(torch.from_numpy(video[0]).permute(2, 0, 1),
                         torch.from_numpy(m0))
    pj = core_j.step(jnp.asarray(video[0])[None], jnp.asarray(m0)[None])
    np.testing.assert_allclose(np.asarray(pj)[0], pt.numpy(), atol=1e-5)
    for t in range(1, 8):
        with torch.no_grad():
            pt = core_t.step(torch.from_numpy(video[t]).permute(2, 0, 1))
        pj = core_j.step(jnp.asarray(video[t])[None])
        np.testing.assert_allclose(
            np.asarray(pj)[0], pt.numpy(), atol=1e-4,
            err_msg=f"prob mismatch at frame {t} (deep_update_every=3)",
        )


@pytest.mark.slow
def test_full_video_parity_object_enters_midvideo(torch_xmem):
    """Multi-group memory (mid-video object entry, the reference's object
    groups in ``kv_memory_store.py:10-16``): object 3 enters at frame 3
    with a GT mask while objects 1-2 keep their predicted probabilities.
    Per-frame parity vs the reference InferenceCore (long-term disabled —
    the only regime where the reference's own multi-group path is sound).
    Our core preallocates 3 object slots and activates the third on entry;
    inactive slots are masked to prob 0 (equivalent to absent channels up
    to the 1e-7 aggregation clip)."""
    import torch
    from XMem.inference.inference_core import InferenceCore

    refcfg = {
        "key_dim": 64, "value_dim": 512, "hidden_dim": 64, "top_k": 5,
        "mem_every": 2, "deep_update_every": -1, "enable_long_term": False,
        "enable_long_term_count_usage": False,
    }
    core_t = InferenceCore(torch_xmem, refcfg)
    core_t.set_all_labels([1, 2])

    cfg = XMemConfig(top_k=5, mem_every=2, enable_long_term=False,
                     max_mid_term_frames=8)
    sd = {k: v.detach().numpy() for k, v in torch_xmem.state_dict().items()}
    params = N.convert_torch_state_dict(sd, cfg)
    core_j = C.XMemCore(params, cfg, num_views=1, num_objects=3,
                        image_hw=(48, 64), multi_group=True)

    rs = np.random.RandomState(17)
    video = rs.rand(7, 48, 64, 3).astype(np.float32)
    m0_2ch = (rs.rand(2, 48, 64) > 0.6).astype(np.float32)
    m3 = (rs.rand(48, 64) > 0.7).astype(np.float32)

    # frame 0: objects 1, 2
    with torch.no_grad():
        pt = core_t.step(torch.from_numpy(video[0]).permute(2, 0, 1),
                         torch.from_numpy(m0_2ch))
    m0_3ch = np.concatenate([m0_2ch, np.zeros((1, 48, 64), np.float32)])
    pj = core_j.step(jnp.asarray(video[0])[None], jnp.asarray(m0_3ch)[None],
                     provided=np.array([True, True, False]))
    # reference probs have 3 channels (bg + 2 objs); ours 4 (slot 3 inactive)
    np.testing.assert_allclose(np.asarray(pj)[0, :3], pt.numpy(), atol=1e-4)
    assert np.asarray(pj)[0, 3].max() < 1e-3  # inactive slot silent

    for t in range(1, 7):
        if t == 3:  # object 3 enters with a GT mask
            core_t.set_all_labels([1, 2, 3])
            mask_t = np.concatenate(
                [np.zeros((2, 48, 64), np.float32), m3[None]])
            with torch.no_grad():
                pt = core_t.step(torch.from_numpy(video[t]).permute(2, 0, 1),
                                 torch.from_numpy(mask_t),
                                 valid_labels=[3])
            pj = core_j.step(jnp.asarray(video[t])[None],
                             jnp.asarray(mask_t)[None],
                             provided=np.array([False, False, True]))
        else:
            with torch.no_grad():
                pt = core_t.step(torch.from_numpy(video[t]).permute(2, 0, 1))
            pj = core_j.step(jnp.asarray(video[t])[None])
        ref = pt.numpy()
        ours = np.asarray(pj)[0, : ref.shape[0]]
        np.testing.assert_allclose(
            ours, ref, atol=2e-4,
            err_msg=f"prob mismatch at frame {t} (multi-group)",
        )
        if t < 3:
            assert np.asarray(pj)[0, 3].max() < 1e-3


def test_video_tracker_midvideo_entry():
    """Tracker-level multi-group flow: object 1 seeds frame 0, object 2
    enters at frame 2 via a new index mask; both propagate afterwards."""
    from d3fields_tpu.seg.video_tracker import VideoMaskTracker

    cfg = XMemConfig(key_dim=8, value_dim=16, hidden_dim=8, top_k=5,
                     mem_every=2, enable_long_term=False,
                     max_mid_term_frames=6, size=-1)
    params = N.init_params(jax.random.PRNGKey(0), cfg)
    tracker = VideoMaskTracker(params, cfg, num_views=2, num_objects=2,
                               image_hw=(48, 64), size=-1,
                               multi_group=True)
    rs = np.random.RandomState(3)
    rgb = (rs.rand(2, 48, 64, 3) * 255).astype(np.uint8)

    m0 = np.zeros((2, 48, 64), np.uint8)
    m0[:, 8:20, 10:26] = 1
    out0 = tracker.process(rgb.astype(np.float32) / 255.0, m0)
    assert out0.shape == (2, 48, 64, 3)

    out1 = tracker.process(rgb.astype(np.float32) / 255.0)
    assert np.isfinite(out1).all()

    m2 = np.zeros((2, 48, 64), np.uint8)
    m2[:, 30:44, 40:60] = 2  # object 2 enters
    out2 = tracker.process(rgb.astype(np.float32) / 255.0, m2)
    assert out2.shape == (2, 48, 64, 3)
    # the provided region is assigned to object 2
    assert out2[0, 34, 50, 2] > 0.5

    out3 = tracker.process(rgb.astype(np.float32) / 255.0)
    assert np.isfinite(out3).all() and out3.shape == (2, 48, 64, 3)


@pytest.mark.slow
def test_midvideo_entry_respects_unsync_deep_schedule(torch_xmem):
    """A mask-given frame on an unelapsed unsynchronized schedule must NOT
    deep-update (``inference_core.py:51-55`` computes is_deep_update from
    the schedule even when a mask is given): object 3 enters at frame 1
    with deep_update_every=3 — the reference keeps the GRU hidden there
    and deep-updates at frame 3; per-frame parity catches any shift."""
    import torch
    from XMem.inference.inference_core import InferenceCore

    refcfg = {
        "key_dim": 64, "value_dim": 512, "hidden_dim": 64, "top_k": 5,
        "mem_every": 2, "deep_update_every": 3, "enable_long_term": False,
        "enable_long_term_count_usage": False,
    }
    core_t = InferenceCore(torch_xmem, refcfg)
    core_t.set_all_labels([1, 2])

    cfg = XMemConfig(top_k=5, mem_every=2, deep_update_every=3,
                     enable_long_term=False, max_mid_term_frames=8)
    sd = {k: v.detach().numpy() for k, v in torch_xmem.state_dict().items()}
    params = N.convert_torch_state_dict(sd, cfg)
    core_j = C.XMemCore(params, cfg, num_views=1, num_objects=3,
                        image_hw=(48, 64), multi_group=True)

    rs = np.random.RandomState(23)
    video = rs.rand(6, 48, 64, 3).astype(np.float32)
    m0_2ch = (rs.rand(2, 48, 64) > 0.6).astype(np.float32)
    m3 = (rs.rand(48, 64) > 0.7).astype(np.float32)

    with torch.no_grad():
        pt = core_t.step(torch.from_numpy(video[0]).permute(2, 0, 1),
                         torch.from_numpy(m0_2ch))
    m0_3ch = np.concatenate([m0_2ch, np.zeros((1, 48, 64), np.float32)])
    pj = core_j.step(jnp.asarray(video[0])[None], jnp.asarray(m0_3ch)[None],
                     provided=np.array([True, True, False]))
    np.testing.assert_allclose(np.asarray(pj)[0, :3], pt.numpy(), atol=1e-4)

    for t in range(1, 6):
        if t == 1:  # entry on an UNELAPSED deep schedule (last deep: t=0)
            core_t.set_all_labels([1, 2, 3])
            mask_t = np.concatenate(
                [np.zeros((2, 48, 64), np.float32), m3[None]])
            with torch.no_grad():
                pt = core_t.step(torch.from_numpy(video[t]).permute(2, 0, 1),
                                 torch.from_numpy(mask_t), valid_labels=[3])
            pj = core_j.step(jnp.asarray(video[t])[None],
                             jnp.asarray(mask_t)[None],
                             provided=np.array([False, False, True]))
        else:
            with torch.no_grad():
                pt = core_t.step(torch.from_numpy(video[t]).permute(2, 0, 1))
            pj = core_j.step(jnp.asarray(video[t])[None])
        ref = pt.numpy()
        np.testing.assert_allclose(
            np.asarray(pj)[0, : ref.shape[0]], ref, atol=2e-4,
            err_msg=f"prob mismatch at frame {t} (unsync entry)",
        )


# ---------------------------------------------------------------------------
# multi-group x long-term memory (beyond the reference: its own path raises,
# kv_memory_store.py:146-151; sound semantics in memory.py module docstring)
# ---------------------------------------------------------------------------

def _mg_cfg(max_lt=24):
    return XMemConfig(key_dim=8, value_dim=10, hidden_dim=4,
                      max_mid_term_frames=3, min_mid_term_frames=1,
                      num_prototypes=4, max_long_term_elements=max_lt,
                      top_k=3)


def _rand_frame(rs, ck, cv, O, hw):
    k = rs.randn(ck, hw).astype(np.float32)
    s = (rs.rand(hw) + 1).astype(np.float32)
    v = rs.randn(O, cv, hw).astype(np.float32)
    e = rs.rand(ck, hw).astype(np.float32)
    return k, s, v, e


def test_multigroup_longterm_reduces_to_single_group():
    """With every object entering at frame 0, the multi-group long-term
    path must be numerically identical to the single-group path — through
    consolidation AND long-term eviction (26 steps at max_lt=24 fires
    both repeatedly): full-visibility masked softmaxes equal the global
    ones, and group-deduped usage (2 objects sharing entry, 1/2 weight
    each) equals the reference's one-softmax accounting."""
    cfg = _mg_cfg()
    ck, cv, O, hw = cfg.key_dim, cfg.value_dim, 2, 6
    mem_s = M.init_memory(cfg, O, (2, 3))
    mem_m = M.init_memory(cfg, O, (2, 3), multi_group=True)
    mem_m = M.activate_objects(mem_m, jnp.ones((O,), bool))
    rs = np.random.RandomState(11)
    for t in range(26):
        k, s, v, e = _rand_frame(rs, ck, cv, O, hw)
        mem_s = M.add_memory(mem_s, jnp.asarray(k), jnp.asarray(s),
                             jnp.asarray(v), jnp.asarray(e))
        mem_m = M.add_memory(mem_m, jnp.asarray(k), jnp.asarray(s),
                             jnp.asarray(v), jnp.asarray(e))
        qk = rs.randn(ck, hw).astype(np.float32)
        qe = rs.rand(ck, hw).astype(np.float32)
        ro_s, mem_s = M.match_memory(mem_s, jnp.asarray(qk), jnp.asarray(qe))
        ro_m, mem_m = M.match_memory(mem_m, jnp.asarray(qk), jnp.asarray(qe))
        np.testing.assert_allclose(
            np.asarray(ro_m), np.asarray(ro_s), rtol=1e-4, atol=1e-4,
            err_msg=f"multi-group readout diverged at t={t}",
        )
        assert int(mem_m.w_size) == int(mem_s.w_size)
        assert int(mem_m.l_size) == int(mem_s.l_size)
        np.testing.assert_allclose(
            np.asarray(mem_m.w_use), np.asarray(mem_s.w_use),
            rtol=1e-4, atol=1e-5, err_msg=f"usage diverged at t={t}",
        )
        np.testing.assert_allclose(
            np.asarray(mem_m.l_use), np.asarray(mem_s.l_use),
            rtol=1e-4, atol=1e-5,
        )
        ls = int(mem_m.l_size)
        assert bool(np.asarray(mem_m.l_vis)[:, :ls].all()), (
            "frame-0 objects must see every prototype"
        )
    assert int(mem_m.l_size) > 0  # the loop really crossed consolidation


def test_multigroup_longterm_late_entry_sound():
    """The property the reference's broken path cannot provide: a late
    object's output NEVER depends on memory content from before its entry.
    Two runs differ ONLY in the late object's pre-entry value slabs
    (garbage vs zeros); every readout, usage row, and visibility bit must
    be identical — through consolidation (which must potentiate the late
    object over only its visible candidates) and long-term eviction."""
    cfg = _mg_cfg(max_lt=16)
    ck, cv, O, hw = cfg.key_dim, cfg.value_dim, 2, 6
    entry_t = 4
    mems = [M.init_memory(cfg, O, (2, 3), multi_group=True)
            for _ in range(2)]
    mems = [M.activate_objects(m, jnp.asarray([True, False]))
            for m in mems]
    rs = np.random.RandomState(13)
    rs_garbage = np.random.RandomState(99)
    entered = False
    saw_mixed_vis = False
    for t in range(22):
        k, s, v, e = _rand_frame(rs, ck, cv, O, hw)
        if t == entry_t:
            mems = [M.activate_objects(m, jnp.asarray([True, True]))
                    for m in mems]
            entered = True
        variants = []
        for i, m in enumerate(mems):
            vi = v.copy()
            if not entered:
                # pre-entry slab: garbage in run 0, zeros in run 1
                vi[1] = (100.0 * rs_garbage.randn(cv, hw).astype(np.float32)
                         if i == 0 else 0.0)
            variants.append(
                M.add_memory(m, jnp.asarray(k), jnp.asarray(s),
                             jnp.asarray(vi), jnp.asarray(e)))
        mems = variants
        qk = rs.randn(ck, hw).astype(np.float32)
        qe = rs.rand(ck, hw).astype(np.float32)
        ro = []
        nxt = []
        for m in mems:
            r, m2 = M.match_memory(m, jnp.asarray(qk), jnp.asarray(qe))
            ro.append(np.asarray(r))
            nxt.append(m2)
        mems = nxt
        np.testing.assert_allclose(
            ro[0], ro[1], rtol=1e-5, atol=1e-5,
            err_msg=f"pre-entry values leaked into a readout at t={t}",
        )
        np.testing.assert_array_equal(np.asarray(mems[0].l_vis),
                                      np.asarray(mems[1].l_vis))
        np.testing.assert_allclose(np.asarray(mems[0].w_use),
                                   np.asarray(mems[1].w_use),
                                   rtol=1e-4, atol=1e-5)
        ls = int(mems[0].l_size)
        lv = np.asarray(mems[0].l_vis)
        if ls:
            # object 0 (entry 0) sees every prototype
            assert lv[0, :ls].all()
            if entered and not lv[1, :ls].all() and lv[1, :ls].any():
                saw_mixed_vis = True
    assert saw_mixed_vis, (
        "scenario never produced partially-visible long-term memory — "
        "the masking paths were not exercised"
    )
    assert int(mems[0].l_size) > 0


def test_core_multigroup_longterm_video():
    """Core-level: mid-video entry composes with long-term memory (the
    reference must disable long-term for such videos). Object 2 enters at
    frame 3; the video is long enough to consolidate with the small
    working capacity. Pre-entry the extra slot stays silent; the whole
    run is finite and the entering object's mask region is adopted."""
    cfg = XMemConfig(key_dim=8, value_dim=16, hidden_dim=8, top_k=5,
                     mem_every=1, max_mid_term_frames=3,
                     min_mid_term_frames=1, num_prototypes=4,
                     max_long_term_elements=32)
    params = N.init_params(jax.random.PRNGKey(0), cfg)
    core = C.XMemCore(params, cfg, num_views=1, num_objects=2,
                      image_hw=(48, 64), multi_group=True)
    rs = np.random.RandomState(5)
    video = rs.rand(9, 48, 64, 3).astype(np.float32)
    m0 = np.zeros((2, 48, 64), np.float32)
    m0[0, 8:24, 8:32] = 1.0
    p = core.step(jnp.asarray(video[0])[None], jnp.asarray(m0)[None],
                  provided=np.array([True, False]))
    assert np.asarray(p)[0, 2].max() < 1e-3  # inactive slot silent
    for t in range(1, 9):
        if t == 3:
            m3 = np.zeros((2, 48, 64), np.float32)
            m3[1, 28:44, 36:60] = 1.0
            p = core.step(jnp.asarray(video[t])[None],
                          jnp.asarray(m3)[None],
                          provided=np.array([False, True]))
            assert np.asarray(p)[0, 2, 34, 48] > 0.5
        else:
            p = core.step(jnp.asarray(video[t])[None])
        assert np.isfinite(np.asarray(p)).all()
        if t < 3:
            assert np.asarray(p)[0, 2].max() < 1e-3
    assert int(core.mem.l_size[0]) > 0  # long-term memory really engaged


def test_memory_config_guards():
    """Misconfigurations fail at construction with actionable messages."""
    from d3fields_tpu.models.xmem import memory as M

    with pytest.raises(ValueError, match="max_mid_term_frames >= 2"):
        M.init_memory(
            XMemConfig(enable_long_term=False, max_mid_term_frames=1),
            1, (2, 2),
        )


def test_gdino_trunk_sniff_guards():
    """Unknown trunk widths / missing sniff key raise actionably instead of
    failing deep inside conversion."""
    from d3fields_tpu.utils.convert import convert_family

    pe = ("model.backbone.conv_encoder.model.embeddings."
          "patch_embeddings.projection.weight")
    with pytest.raises(ValueError, match="unsupported GroundingDINO trunk"):
        convert_family("gdino", {pe: np.zeros((192, 3, 4, 4), np.float32)})
    with pytest.raises(ValueError, match="cannot sniff"):
        convert_family("gdino", {"other.key": np.zeros(3, np.float32)})


def test_sam_variant_sniff_guards():
    """Same for the SAM encoder variant, and the width->preset mapping."""
    from d3fields_tpu.models.sam.model import config_for_encoder_width
    from d3fields_tpu.utils.convert import convert_family

    pe = "vision_encoder.patch_embed.projection.weight"
    with pytest.raises(ValueError, match="unsupported SAM encoder"):
        convert_family("sam", {pe: np.zeros((999, 3, 16, 16), np.float32)})
    with pytest.raises(ValueError, match="cannot sniff"):
        convert_family("sam", {"other.key": np.zeros(3, np.float32)})
    for hidden, layers in [(768, 12), (1024, 24), (1280, 32)]:
        cfg = config_for_encoder_width(hidden)
        assert (cfg.hidden_size, cfg.num_layers) == (hidden, layers)
        assert cfg.global_attn_indexes[-1] == layers - 1


def test_conv3x3_matmul_lowering_parity():
    """The 9-shifted-matmul lowering for 3x3/s1 convs (the deep-stage
    scheduling experiment, blocks.set_conv3x3_matmul) == the
    conv_general_dilated path to f32 reassociation noise, and ineligible
    convs (stride 2, dilation 2, pad 0, 1x1) are untouched by the flag."""
    import jax.numpy as jnp

    from d3fields_tpu.models.xmem import blocks as B

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 30, 40, 64).astype(np.float32))
    w = jnp.asarray(rs.randn(3, 3, 64, 96).astype(np.float32) * 0.05)
    b = jnp.asarray(rs.randn(96).astype(np.float32))
    ref = np.asarray(B.conv2d(x, w, b, stride=1, padding=1))
    refs_other = [
        np.asarray(B.conv2d(x, w, b, stride=2, padding=1)),
        np.asarray(B.conv2d(x, w, b, stride=1, padding=1, dilation=2)),
        np.asarray(B.conv2d(x, w, b, stride=1, padding=0)),
    ]
    B.set_conv3x3_matmul(True)
    try:
        got = np.asarray(B.conv2d(x, w, b, stride=1, padding=1))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)
        got_other = [
            np.asarray(B.conv2d(x, w, b, stride=2, padding=1)),
            np.asarray(B.conv2d(x, w, b, stride=1, padding=1, dilation=2)),
            np.asarray(B.conv2d(x, w, b, stride=1, padding=0)),
        ]
        for g, r in zip(got_other, refs_other):
            np.testing.assert_array_equal(g, r)
    finally:
        B.set_conv3x3_matmul(False)
