"""Multi-chip sharding + XMem training tests (8 virtual CPU devices)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from conftest import synthetic_scene

from d3fields_tpu.config import XMemConfig
from d3fields_tpu.fields import fusion as F
from d3fields_tpu.fields.state import state_from_obs
from d3fields_tpu.models.xmem import network as N
from d3fields_tpu.models.xmem import trainer as TR
from d3fields_tpu.parallel.mesh import make_mesh, replicate, shard_leading
from d3fields_tpu.parallel.ops import sync_batch_norm
from d3fields_tpu.parallel.sharded import sharded_batch_eval


def test_sharded_batch_eval_matches_single_device(scene):
    st = state_from_obs(scene, dino_feats=scene["dino_feats"],
                        mask=scene["mask"], mu=0.02)
    rs = np.random.RandomState(0)
    pts = rs.uniform(-0.4, 0.4, (3000, 3)).astype(np.float32)
    mesh = make_mesh(dp=8, tp=1)
    out_sharded = sharded_batch_eval(mesh, st, pts, ("dino_feats",), tile=128)
    out_single = F.batch_eval(st, pts, ("dino_feats",), tile=512)
    np.testing.assert_allclose(
        np.asarray(out_sharded["dist"]), np.asarray(out_single["dist"]),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out_sharded["dino_feats"]),
        np.asarray(out_single["dino_feats"]), rtol=1e-4, atol=1e-5,
    )


def test_sync_batch_norm_matches_global_bn():
    from jax import shard_map

    mesh = make_mesh(dp=4, tp=1)
    rs = np.random.RandomState(1)
    x = rs.randn(8, 6, 6, 16).astype(np.float32)
    scale = rs.rand(16).astype(np.float32) + 0.5
    bias = rs.randn(16).astype(np.float32)

    fn = shard_map(
        lambda xs: sync_batch_norm(xs, scale, bias, "dp")[0],
        mesh=mesh, in_specs=P("dp"), out_specs=P("dp"),
    )
    got = np.asarray(fn(jnp.asarray(x)))
    mean = x.mean(axis=(0, 1, 2))
    var = x.var(axis=(0, 1, 2))
    ref = (x - mean) / np.sqrt(var + 1e-5) * scale + bias
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@pytest.fixture(scope="module")
def tiny_train_setup():
    cfg = XMemConfig(key_dim=16, value_dim=32, hidden_dim=8)
    params = N.init_params(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(0)
    Bv, T, O, H, W = 2, 3, 2, 32, 32
    batch = {
        "frames": jnp.asarray(rs.rand(Bv, T, H, W, 3).astype(np.float32)),
        "first_gt": jnp.asarray(
            (rs.rand(Bv, O, H, W) > 0.5).astype(np.float32)
        ),
        "cls_gt": jnp.asarray(rs.randint(0, O + 1, (Bv, T, H, W))),
        "selector": jnp.ones((Bv, O), jnp.float32),
    }
    return cfg, params, batch


def test_losses_match_torch_reference(tiny_train_setup):
    import torch
    import torch.nn.functional as TF

    rs = np.random.RandomState(2)
    Bv, O, H, W = 2, 3, 8, 8
    masks = rs.rand(Bv, O, H, W).astype(np.float32)
    cls_gt = rs.randint(0, O + 1, (Bv, H, W))

    got = float(TR.dice_loss(jnp.asarray(masks), jnp.asarray(cls_gt)))
    # reference dice_loss (losses.py:8-19)
    tm = torch.from_numpy(masks)
    tg = torch.from_numpy(cls_gt)
    losses = []
    for i in range(O):
        m = tm[:, i].flatten(start_dim=1)
        g = (tg == (i + 1)).float().flatten(start_dim=1)
        num = 2 * (m * g).sum(-1)
        den = m.sum(-1) + g.sum(-1)
        losses.append(1 - (num + 1) / (den + 1))
    ref = torch.cat(losses).mean()
    np.testing.assert_allclose(got, float(ref), rtol=1e-5)

    logits = rs.randn(Bv, O + 1, H, W).astype(np.float32)
    # warm phase (it < start_warm): plain CE
    got = float(TR.bootstrapped_ce(
        jnp.asarray(logits), jnp.asarray(cls_gt), jnp.asarray(0), 10, 20
    ))
    ref = TF.cross_entropy(torch.from_numpy(logits), torch.from_numpy(cls_gt))
    np.testing.assert_allclose(got, float(ref), rtol=1e-5)
    # hard-mining phase (it > end_warm): top 15% pixels
    got = float(TR.bootstrapped_ce(
        jnp.asarray(logits), jnp.asarray(cls_gt), jnp.asarray(100), 10, 20
    ))
    raw = TF.cross_entropy(torch.from_numpy(logits), torch.from_numpy(cls_gt),
                           reduction="none").view(-1)
    k = int(raw.numel() * 0.15)
    ref = torch.topk(raw, k)[0].mean()
    np.testing.assert_allclose(got, float(ref), rtol=1e-4)


def test_select_ref_frames_matches_reference_sampling():
    """Frame 0 always; the rest distinct, drawn from [1, ti); static
    length num_ref (reference trainer.py:87-96)."""
    for ti, num_ref in [(4, 3), (7, 3), (5, 2), (9, 4)]:
        for s in range(8):
            sel = np.asarray(TR.select_ref_frames(
                ti, num_ref, jax.random.PRNGKey(s)))
            assert sel.shape == (num_ref,)
            assert sel[0] == 0
            assert len(set(sel.tolist())) == num_ref
            assert (sel[1:] >= 1).all() and (sel < ti).all()
    # across seeds the non-zero picks cover the whole range (randperm)
    picks = {
        int(v) for s in range(64)
        for v in np.asarray(
            TR.select_ref_frames(6, 3, jax.random.PRNGKey(s)))[1:]
    }
    assert picks == {1, 2, 3, 4, 5}


def test_sequence_loss_ref_cap_not_binding_is_exact(tiny_train_setup):
    """With T - 1 <= num_ref_frames the capped path never triggers: the
    loss is bit-identical to the keep-everything default (T=3 here, the
    s0 curriculum's shape with num_ref=2)."""
    cfg, params, batch = tiny_train_setup
    one = {k: v[0] for k, v in batch.items()}
    it = jnp.asarray(0)
    full, _ = TR.sequence_loss(params, one, it, cfg, None)
    capped, _ = TR.sequence_loss(params, one, it, cfg, None,
                                 num_ref_frames=2)
    assert float(full) == float(capped)


def test_sequence_loss_ref_cap_binding(tiny_train_setup):
    """T=5 with num_ref_frames=2 exercises the random-subset gather
    (ti = 3, 4 exceed the cap): loss finite, differs from the full-memory
    rollout, and grads flow."""
    cfg, params, batch = tiny_train_setup
    rs = np.random.RandomState(3)
    T, H, W = 5, 32, 32
    one = {
        "frames": jnp.asarray(rs.rand(T, H, W, 3).astype(np.float32)),
        "first_gt": jnp.asarray((rs.rand(2, H, W) > 0.5).astype(np.float32)),
        "cls_gt": jnp.asarray(rs.randint(0, 3, (T, H, W))),
        "selector": jnp.ones((2,), jnp.float32),
    }
    it = jnp.asarray(0)
    rng = jax.random.PRNGKey(0)

    def loss_fn(p, nrf):
        return TR.sequence_loss(p, one, it, cfg, rng, num_ref_frames=nrf)[0]

    capped, grads = jax.value_and_grad(lambda p: loss_fn(p, 2))(params)
    full = loss_fn(params, 0)
    assert np.isfinite(float(capped)) and np.isfinite(float(full))
    assert float(capped) != float(full)
    gnorm = float(optax_global_norm(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def optax_global_norm(tree):
    return jnp.sqrt(sum(jnp.sum(g * g) for g in jax.tree.leaves(tree)))


@pytest.mark.slow
def test_donated_train_step_matches_plain(tiny_train_setup):
    """train_step_donated (the loop variant, in-place state aliasing)
    must be numerically identical to train_step — donation only changes
    buffer reuse, never math. Copies the shared fixture params so the
    donated chain cannot invalidate them for other tests."""
    cfg, params, batch = tiny_train_setup
    opt = TR.make_optimizer(lr=3e-4)
    s_a = TR.init_train_state(jax.tree.map(jnp.copy, params), opt)
    s_b = TR.init_train_state(jax.tree.map(jnp.copy, params), opt)
    for _ in range(2):
        s_a, out_a = TR.train_step(s_a, batch, cfg, opt)
        s_b, out_b = TR.train_step_donated(s_b, batch, cfg, opt)
    assert float(out_a["loss"]) == float(out_b["loss"])
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        s_a.params, s_b.params,
    )


@pytest.mark.slow
def test_train_step_decreases_loss(tiny_train_setup):
    cfg, params, batch = tiny_train_setup
    opt = TR.make_optimizer(lr=3e-4)
    state = TR.init_train_state(params, opt)
    losses = []
    for _ in range(4):
        state, out = TR.train_step(state, batch, cfg, opt)
        losses.append(float(out["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(state.it) == 4


@pytest.mark.slow
def test_train_step_dp_sharded_matches_replicated(tiny_train_setup):
    """The DDP equivalent: batch over the dp axis gives the same update."""
    cfg, params, batch = tiny_train_setup
    mesh = make_mesh(dp=2, tp=1)
    opt = TR.make_optimizer(lr=3e-4)

    s_rep = TR.init_train_state(params, opt)
    s_rep, out_rep = TR.train_step(s_rep, batch, cfg, opt)

    params_sh = replicate(mesh, params)
    batch_sh = {k: shard_leading(mesh, v) for k, v in batch.items()}
    s_dp = TR.init_train_state(params_sh, opt)
    s_dp, out_dp = TR.train_step(s_dp, batch_sh, cfg, opt)

    np.testing.assert_allclose(
        float(out_dp["loss"]), float(out_rep["loss"]), rtol=1e-5
    )
    a = jax.tree.leaves(s_rep.params)[0]
    b = jax.tree.leaves(s_dp.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                               atol=1e-5)


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path, tiny_train_setup):
    cfg, params, batch = tiny_train_setup
    opt = TR.make_optimizer()
    state = TR.init_train_state(params, opt)
    state, _ = TR.train_step(state, batch, cfg, opt)
    path = str(tmp_path / "ckpt.pkl")
    TR.save_checkpoint(path, state)
    restored = TR.load_checkpoint(path, opt)
    assert int(restored.it) == 1
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_video_clip_loader_feeds_trainer():
    from d3fields_tpu.models.xmem.data import (
        SyntheticVideoSource, VideoClipLoader, sample_frame_indices,
    )

    rs = np.random.RandomState(0)
    # sampling semantics: indices within max_jump chains, sorted or reversed
    for _ in range(20):
        idxs = sample_frame_indices(30, 4, 5, rs)
        assert len(set(idxs)) == 4
        s = sorted(idxs)
        assert idxs == s or idxs == s[::-1]
        assert all(s[i + 1] - s[i] <= 10 for i in range(3))

    loader = VideoClipLoader(
        SyntheticVideoSource(num_videos=2, length=8, hw=(64, 64)),
        num_frames=3, max_jump=3, max_num_obj=2, out_hw=(64, 64),
    )
    batch = loader.batch(2)
    assert batch["frames"].shape == (2, 3, 64, 64, 3)
    assert batch["first_gt"].shape == (2, 2, 64, 64)
    assert batch["cls_gt"].shape == (2, 3, 64, 64)
    assert set(np.unique(batch["cls_gt"])) <= {0, 1, 2}
    assert (batch["first_gt"].sum(axis=(2, 3)) > 0).any()

    # the batch drives a real training step
    cfg = XMemConfig(key_dim=16, value_dim=32, hidden_dim=8)
    params = N.init_params(jax.random.PRNGKey(0), cfg)
    opt = TR.make_optimizer(lr=1e-4)
    state = TR.init_train_state(params, opt)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    state, out = TR.train_step(state, jbatch, cfg, opt)
    assert np.isfinite(float(out["loss"]))


def test_initialize_distributed_single_process_noop(monkeypatch):
    """Without coordinator args or cluster env the init is a no-op False
    (the local single-process path needs no branch in callers)."""
    from d3fields_tpu.parallel.mesh import initialize_distributed

    for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
              "SLURM_JOB_ID", "SLURM_STEP_NODELIST", "SLURM_NTASKS",
              "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(k, raising=False)
    assert initialize_distributed() is False
    # a bare sbatch/salloc shell (SLURM_JOB_ID, single task) must also no-op
    monkeypatch.setenv("SLURM_JOB_ID", "12345")
    assert initialize_distributed() is False
    monkeypatch.setenv("SLURM_STEP_NODELIST", "node01")
    monkeypatch.setenv("SLURM_NTASKS", "1")
    assert initialize_distributed() is False
    # single-hostname TPU_WORKER_HOSTNAMES (single-chip tunnel runtimes
    # set it to "localhost") is NOT a multi-host signal
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert initialize_distributed() is False


def test_video_clip_loader_filters_short_videos():
    """Videos shorter than the clip length are skipped like the reference
    VOSDataset, not crashed on."""
    import numpy as np
    from d3fields_tpu.models.xmem.data import VideoClipLoader

    class FakeSource:
        videos = ["short", "long"]

        def length(self, v):
            return 2 if v == "short" else 6

        def load(self, v, idxs):
            T = len(idxs)
            rs = np.random.RandomState(0)
            frames = (rs.rand(T, 32, 32, 3) * 255).astype(np.uint8)
            masks = np.zeros((T, 32, 32), np.uint8)
            masks[:, 8:20, 8:20] = 1
            return frames, masks

    loader = VideoClipLoader(FakeSource(), num_frames=3, out_hw=(32, 32))
    assert loader.eligible == ["long"]
    s = loader.sample()
    assert s["frames"].shape[0] == 3

    class AllShort:
        videos = ["a"]

        def length(self, v):
            return 1

        def load(self, v, idxs):
            raise AssertionError("should not load")

    import pytest
    with pytest.raises(ValueError, match="no video has"):
        VideoClipLoader(AllShort(), num_frames=3)


def test_sharded_batch_eval_pallas_path(scene):
    """The fused-kernel path must also work under the dp-sharded eval."""
    import numpy as np
    from d3fields_tpu.fields.fusion import batch_eval
    from d3fields_tpu.fields.state import state_from_obs
    from d3fields_tpu.parallel.mesh import make_mesh
    from d3fields_tpu.parallel.sharded import sharded_batch_eval

    st = state_from_obs(scene, dino_feats=scene["dino_feats"],
                        mask=scene["mask"], mu=0.02)
    mesh = make_mesh(dp=8, tp=1)
    pts = np.random.RandomState(0).uniform(-0.5, 0.5, (1000, 3)).astype(np.float32)
    ref = batch_eval(st, pts, ("dino_feats", "mask"), tile=128)
    out = sharded_batch_eval(mesh, st, pts, ("dino_feats", "mask"),
                             tile=128, use_pallas=True)
    for k in ("dist", "dino_feats", "mask"):
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(ref[k]), rtol=1e-4, atol=1e-5
        )


def test_sharded_batch_eval_pack_fetch(scene):
    """pack_fetch shrinks outputs ON DEVICE (bf16 floats, bit-packed bools)
    while staying sharded over dp; unpack_outputs recovers the plain dict
    within bf16 tolerance and the bools exactly."""
    from d3fields_tpu.fields.fusion import batch_eval
    from d3fields_tpu.fields.state import state_from_obs
    from d3fields_tpu.parallel.mesh import make_mesh
    from d3fields_tpu.parallel.sharded import (sharded_batch_eval,
                                               unpack_outputs)

    st = state_from_obs(scene, dino_feats=scene["dino_feats"],
                        mask=scene["mask"], mu=0.02)
    mesh = make_mesh(dp=8, tp=1)
    pts = np.random.RandomState(0).uniform(-0.5, 0.5, (1000, 3)).astype(
        np.float32)
    ref = batch_eval(st, pts, ("dino_feats",), tile=128)
    packed, n = sharded_batch_eval(mesh, st, pts, ("dino_feats",), tile=128,
                                   pack_fetch=True)
    assert n == 1000
    # placement: every packed leaf is still sharded over dp, not gathered
    for k, v in packed.items():
        assert isinstance(v.sharding, NamedSharding), k
        assert v.sharding.spec[0] == "dp", (k, v.sharding.spec)
    # dtypes: floats shrank to bf16, the validity mask bit-packed 8x
    assert packed["dist"].dtype == jnp.bfloat16
    assert packed["dino_feats"].dtype == jnp.bfloat16
    assert packed["valid_mask"].dtype == jnp.uint8
    assert packed["valid_mask"].shape[0] * 8 == packed["dist"].shape[0]
    out = unpack_outputs(packed, n)
    assert out["valid_mask"].dtype == bool
    # the documented bf16 -> f32 inverse really fires (numpy's issubdtype
    # does not recognize ml_dtypes.bfloat16 as floating — round-5 bug)
    assert out["dist"].dtype == np.float32
    assert out["dino_feats"].dtype == np.float32
    np.testing.assert_array_equal(out["valid_mask"],
                                  np.asarray(ref["valid_mask"]))
    # bf16 keeps ~3 significant digits; dist is bounded by mu=0.02
    np.testing.assert_allclose(out["dist"], np.asarray(ref["dist"]),
                               atol=2e-4)
    np.testing.assert_allclose(out["dino_feats"],
                               np.asarray(ref["dino_feats"]),
                               rtol=2e-2, atol=2e-2)


def test_static_image_source_pseudo_video():
    """Static-image pretraining (reference StaticTransformDataset + TPS):
    one image+mask yields warped pseudo-video clips the trainer consumes."""
    import numpy as np
    from d3fields_tpu.models.xmem.data import (
        StaticImageSource, VideoClipLoader, random_tps_warp,
    )

    rs = np.random.RandomState(0)
    img = (rs.rand(64, 80, 3) * 255).astype(np.uint8)
    mask = np.zeros((64, 80), np.uint8)
    mask[20:45, 25:60] = 1

    # TPS warp: mask stays binary, object roughly in place at small scale
    wi, wm = random_tps_warp(img, mask, scale=0.01, rs=rs)
    assert wi.shape == img.shape and set(np.unique(wm)) <= {0, 1}
    inter = ((wm > 0) & (mask > 0)).sum()
    assert inter / max((mask > 0).sum(), 1) > 0.7

    src = StaticImageSource(pairs=[(img, mask)], seed=1)
    loader = VideoClipLoader(src, num_frames=3, out_hw=(64, 80), seed=1)
    batch = loader.batch(2)
    assert batch["frames"].shape == (2, 3, 64, 80, 3)
    assert batch["cls_gt"].shape == (2, 3, 64, 80)
    # frames are genuinely different warps of the same image
    assert np.abs(batch["frames"][0, 0] - batch["frames"][0, 1]).max() > 0.01


def test_xmem_views_sharded_matches_single_device():
    """Fourth scale-out path: multi-camera XMem inference with the view
    axis sharded over dp (each camera on its owning chip, zero
    collectives — the XMem bridge has no cross-view communication,
    fusion.py:631-684). Sharded step == unsharded step."""
    import jax

    from d3fields_tpu.config import XMemConfig
    from d3fields_tpu.models.xmem import core as C
    from d3fields_tpu.models.xmem import network as N
    from d3fields_tpu.parallel.mesh import make_mesh

    cfg = XMemConfig(key_dim=8, value_dim=16, hidden_dim=8, top_k=5,
                     mem_every=2, max_mid_term_frames=3,
                     min_mid_term_frames=1, num_prototypes=4,
                     max_long_term_elements=64, size=-1)
    params = N.init_params(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(5)
    V, H, W = 4, 32, 32
    video = rs.rand(4, V, H, W, 3).astype(np.float32)
    m0 = (rs.rand(V, 2, H, W) > 0.6).astype(np.float32)

    ref_core = C.XMemCore(params, cfg, num_views=V, num_objects=2,
                          image_hw=(H, W))
    ref = [np.asarray(ref_core.step(jnp.asarray(video[0]), jnp.asarray(m0)))]
    for t in range(1, 4):
        ref.append(np.asarray(ref_core.step(jnp.asarray(video[t]))))

    mesh = make_mesh(dp=4, tp=1)
    sh_core = C.XMemCore(params, cfg, num_views=V, num_objects=2,
                         image_hw=(H, W)).shard_views(mesh)
    got = [np.asarray(sh_core.step(jnp.asarray(video[0]), jnp.asarray(m0)))]
    for t in range(1, 4):
        got.append(np.asarray(sh_core.step(jnp.asarray(video[t]))))

    for t, (a, b) in enumerate(zip(ref, got)):
        # partitioning changes XLA's tiling/fusion and hence f32 rounding;
        # probabilities agree to ~1e-3 and labels are identical
        np.testing.assert_allclose(b, a, atol=2e-3, err_msg=f"frame {t}")
        agree = (b.argmax(1) == a.argmax(1)).mean()
        assert agree > 0.995, f"frame {t}: label agreement {agree}"

    # clear_memory keeps the sharding
    sh_core.clear_memory()
    wk = sh_core.mem.wk
    assert len(wk.sharding.device_set) == 4


def test_dinov2_views_sharded_matches_single_device():
    """Fifth scale-out path: multi-camera DINOv2 extraction with views over
    dp (no collectives — per-view ViT forwards are independent,
    fusion.py:593-629). Sharded == unsharded, and non-divisible view
    counts raise."""
    from d3fields_tpu.models import dinov2 as d2
    from d3fields_tpu.parallel.mesh import make_mesh

    cfg = d2.Dinov2Config.tiny_test()
    params = d2.init_params(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(0)
    V, H, W = 8, 48, 64
    imgs = rs.randint(0, 255, (V, H, W, 3), dtype=np.uint8)

    ref = np.asarray(d2.Dinov2Backbone(params, cfg)(imgs, patch_hw=(4, 6)))

    mesh = make_mesh(dp=4, tp=1)
    sharded = d2.Dinov2Backbone(params, cfg).shard_views(mesh)
    out = sharded(imgs, patch_hw=(4, 6))
    assert len(out.sharding.device_set) == 4
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)

    with pytest.raises(ValueError, match="not divisible"):
        sharded(imgs[:3], patch_hw=(4, 6))


def test_fusion_perception_step_sharded(scene):
    """The full serving step — Fusion.update with multi-view DINOv2
    extraction sharded over dp, then the field query sharded over dp —
    matches the single-device pipeline end-to-end."""
    from d3fields_tpu.fields.fusion import Fusion
    from d3fields_tpu.models import dinov2 as d2
    from d3fields_tpu.parallel.mesh import make_mesh

    obs = {k: scene[k] for k in ("color", "depth", "pose", "K")}
    cfg = d2.Dinov2Config.tiny_test()
    params = d2.init_params(jax.random.PRNGKey(1), cfg)
    rs = np.random.RandomState(2)
    pts = rs.uniform(-0.4, 0.4, (2000, 3)).astype(np.float32)

    ref_f = Fusion(feature_backend=d2.Dinov2Backbone(params, cfg))
    ref_f.update(obs)
    ref = ref_f.batch_eval_np(pts, ("dino_feats",))

    mesh = make_mesh(dp=4, tp=1)
    sh_f = Fusion(
        feature_backend=d2.Dinov2Backbone(params, cfg).shard_views(mesh)
    )
    st = sh_f.update(obs)
    assert len(st.dino_feats.sharding.device_set) == 4
    got = sharded_batch_eval(mesh, st, pts, ("dino_feats",), tile=256)
    np.testing.assert_allclose(
        np.asarray(got["dist"]), ref["dist"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got["dino_feats"]), ref["dino_feats"],
        rtol=1e-4, atol=1e-5)


def test_gdino_shard_views_shard_map_matches_unsharded():
    """Sharded multi-view detection runs under shard_map (per-view
    independence, zero collectives) and matches the unsharded batch
    detector exactly — INCLUDING the Mosaic gather kernel path, which
    plain GSPMD jit cannot partition: each shard traces the local
    single-view batch where the kernel is valid. Validated here with the
    interpret-mode kernel on the virtual 8-device mesh."""
    from d3fields_tpu.models.groundingdino import model as gd
    from d3fields_tpu.models.groundingdino.detector import (
        GroundingDinoDetector)
    from d3fields_tpu.parallel.mesh import make_mesh

    gcfg = gd.GroundingDinoConfig.tiny_test()
    params = gd.random_params(gcfg)
    tok = lambda s: [200 + (hash(w) % 1000) for w in s.split()]
    rs = np.random.RandomState(6)
    imgs = rs.randint(0, 255, (8, 40, 48, 3), dtype=np.uint8)

    base = GroundingDinoDetector(params, gcfg, tokenize=tok, short_side=32,
                                 max_side=48, view_chunk=None,
                                 gather_impl="pallas_interpret")
    ref = base.predict_with_classes_batch(imgs, ["mug", "pen"], 0.1)

    mesh = make_mesh(dp=8, tp=1)
    det = GroundingDinoDetector(params, gcfg, tokenize=tok, short_side=32,
                                max_side=48,
                                gather_impl="pallas_interpret")
    with mesh:
        det = det.shard_views(mesh)
        got = det.predict_with_classes_batch(imgs, ["mug", "pen"], 0.1)
    assert len(got) == len(ref) == 8
    for g, r in zip(got, ref):
        np.testing.assert_allclose(g.xyxy, r.xyxy, rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(g.confidence, r.confidence,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(g.class_id, r.class_id)
