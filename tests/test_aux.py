"""Auxiliary subsystem tests: profiling, metrics, correspondence ops,
image ops, pipeline-state checkpointing."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import synthetic_scene


def test_stage_timer_and_throughput():
    from d3fields_tpu.utils.profiling import StageTimer, Throughput

    st = StageTimer()
    x = jnp.arange(1024.0)
    for _ in range(3):
        with st.stage("square") as h:
            h["out"] = x * x
    rep = st.report()
    assert "square" in rep and len(st.times["square"]) == 3

    tp = Throughput()
    tp.start()
    y = x + 1
    tp.stop(units=1024, result_tree=y)
    assert tp.per_second > 0


def test_metrics_and_jsonl(tmp_path):
    from d3fields_tpu.utils.metrics import (
        AverageMeter, Integrator, JsonlLogger, Tee,
    )

    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0

    path = str(tmp_path / "log.jsonl")
    logger = JsonlLogger(path, "test")
    integ = Integrator(logger)
    integ.add_dict({"loss": 2.0})
    integ.add_dict({"loss": 4.0})
    out = integ.finalize("train", 10)
    assert out["loss"] == 3.0
    logger.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["event"] == "start"
    assert lines[1]["loss"] == 3.0

    tee_path = str(tmp_path / "tee.txt")
    with Tee(tee_path):
        print("hello-tee")
    assert "hello-tee" in open(tee_path).read()


def test_similarity_softmax_matches_direct():
    from d3fields_tpu.ops.corr import best_matches, similarity_softmax

    rs = np.random.RandomState(0)
    src = rs.randn(7, 16).astype(np.float32)
    tgt = rs.randn(333, 16).astype(np.float32)
    got = np.asarray(similarity_softmax(jnp.asarray(src), jnp.asarray(tgt),
                                        scale=0.5, tile=64))
    d = np.linalg.norm(src[:, None] - tgt[None], axis=-1)
    e = np.exp(-0.5 * d - (-0.5 * d).max(axis=1, keepdims=True))
    ref = e / e.sum(axis=1, keepdims=True)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)

    pts = rs.randn(333, 3).astype(np.float32)
    match, dist = best_matches(jnp.asarray(src), jnp.asarray(tgt),
                               jnp.asarray(pts), tile=64)
    idx = d.argmin(axis=1)
    np.testing.assert_allclose(np.asarray(match), pts[idx], rtol=1e-5)


def test_seed_distance_maps():
    from d3fields_tpu.ops.image import seed_distance_maps

    seeds = jnp.asarray([[2.0, 3.0], [10.0, 12.0], [0.0, 0.0]])
    valid = jnp.asarray([True, True, False])
    out = np.asarray(seed_distance_maps(seeds, valid, (16, 20)))
    ys, xs = np.meshgrid(np.arange(16), np.arange(20), indexing="ij")
    ref = np.minimum(
        np.hypot(ys - 2.0, xs - 3.0), np.hypot(ys - 10.0, xs - 12.0)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    assert out[2, 3] == 0.0


def test_depth_to_normal_plane():
    from d3fields_tpu.ops.image import depth_to_normal

    K = jnp.asarray([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    depth = jnp.full((48, 64), 2.0)  # fronto-parallel plane
    n = np.asarray(depth_to_normal(depth, K))
    np.testing.assert_allclose(n[5:-5, 5:-5, 2], -1.0, atol=1e-5)


def test_fusion_state_checkpoint_roundtrip(tmp_path, scene):
    from d3fields_tpu.fields.fusion import Fusion

    f = Fusion()
    f.update({**{k: scene[k] for k in ("color", "depth", "pose", "K")},
              "dino_feats": scene["dino_feats"], "mask": scene["mask"]})
    f.consensus_mask_label = ["background", "thing"]
    path = str(tmp_path / "pipeline.pkl")
    f.save_state(path)

    g = Fusion()
    g.load_state(path)
    assert g.consensus_mask_label == ["background", "thing"]
    rs = np.random.RandomState(1)
    pts = rs.uniform(-0.3, 0.3, (200, 3)).astype(np.float32)
    a = f.eval(pts)
    b = g.eval(pts)
    np.testing.assert_array_equal(np.asarray(a["dist"]), np.asarray(b["dist"]))
    np.testing.assert_array_equal(
        np.asarray(a["dino_feats"]), np.asarray(b["dino_feats"])
    )


def test_native_pointcloud_ops():
    from d3fields_tpu.ops import pointcloud_native as pcn
    from d3fields_tpu.ops.fps import fps_np

    rs = np.random.RandomState(0)
    pts = rs.uniform(-1, 1, (4000, 3)).astype(np.float32)

    idx = pcn.voxel_downsample_indices(pts, 0.2)
    vox = np.floor(pts[idx] / 0.2).astype(np.int64)
    assert np.unique(vox, axis=0).shape[0] == idx.shape[0]  # one per voxel
    all_vox = np.unique(np.floor(pts / 0.2).astype(np.int64), axis=0)
    assert idx.shape[0] == all_vox.shape[0]  # covers every occupied voxel

    # plant far outliers; they must be dropped, inliers mostly kept
    outliers = np.array([[50.0, 50, 50], [-60, 0, 0]], np.float32)
    mixed = np.concatenate([pts[:500], outliers])
    mask = pcn.statistical_outlier_mask(mixed, nb_neighbors=5, std_ratio=1.0)
    assert not mask[-1] and not mask[-2]
    assert mask[:500].mean() > 0.9

    sampled, idx = pcn.fps_native(pts[:800], 32, init_idx=0)
    ref_sampled, _, _ = fps_np(pts[:800], 32, init_idx=0)
    # exact index parity is not guaranteed (float ULP near-ties flip the
    # argmax between the C++ and numpy accumulation orders); check the FPS
    # contract instead: start point, uniqueness, and equal dispersion
    assert idx[0] == 0 and np.unique(idx).shape[0] == 32

    def coverage(s):  # max over points of distance to nearest sample
        d = np.linalg.norm(pts[:800, None] - s[None], axis=-1).min(axis=1)
        return d.max()

    assert abs(coverage(sampled) - coverage(ref_sampled)) < 0.05


def test_config_roundtrip(tmp_path):
    from d3fields_tpu.config import (
        Boundaries, D3FieldsConfig, FusionConfig, load_config, save_config,
    )

    cfg = D3FieldsConfig(
        fusion=FusionConfig(mu=0.05, query_tile=1024),
        boundaries=Boundaries(-1, 1, -2, 2, 0, 3),
    )
    path = str(tmp_path / "cfg.json")
    save_config(cfg, path)
    back = load_config(path)
    assert back.fusion.mu == 0.05 and back.fusion.query_tile == 1024
    assert back.boundaries.x_lower == -1 and back == cfg


def test_box_dedup():
    from d3fields_tpu.models.groundingdino.detector import (
        Detections, dedup_boxes,
    )

    det = Detections(
        xyxy=np.array([[0, 0, 10, 10], [0.2, 0.1, 10, 10], [20, 20, 30, 30]],
                      np.float32),
        confidence=np.array([0.5, 0.9, 0.7], np.float32),
        class_id=np.array([0, 0, 1]),
    )
    out = dedup_boxes(det, 0.9)
    assert out.xyxy.shape[0] == 2
    assert 0.9 in out.confidence and 0.7 in out.confidence  # higher conf kept


def test_fusion_resume_supports_reference_api(tmp_path, scene):
    """After load_state, view-count/color-dependent methods work
    (num_cam and obs color are part of the snapshot)."""
    from d3fields_tpu.fields.fusion import Fusion

    f = Fusion()
    f.update({**{k: scene[k] for k in ("color", "depth", "pose", "K")},
              "dino_feats": scene["dino_feats"], "mask": scene["mask"]})
    f.consensus_mask_label = ["background", "a", "b"]
    path = str(tmp_path / "resume.pkl")
    f.save_state(path)

    g = Fusion()
    g.load_state(path)
    assert g.num_cam == scene["color"].shape[0]
    overlay = g.vis_curr_mask()
    assert overlay.shape == scene["color"].shape


def test_davis_jf_metric():
    from d3fields_tpu.utils.metrics import davis_jf

    gt = np.zeros((64, 64), np.uint8)
    gt[10:30, 10:30] = 1
    gt[40:55, 40:60] = 2
    # perfect prediction
    m = davis_jf(gt, gt)
    assert m["J"] == 1.0 and m["F"] == 1.0 and m["JF"] == 1.0
    # object 1 shifted by 1px: J < 1 but F stays ~1 (the boundary-match
    # tolerance is ~1px at this 64x64 resolution: 0.008 * diagonal)
    pred = np.zeros_like(gt)
    pred[11:31, 10:30] = 1
    pred[40:55, 40:60] = 2
    m = davis_jf(pred, gt)
    assert 0.8 < m["J"] < 1.0
    assert m["F"] > 0.95
    # missing object 2 entirely: J and F drop hard
    pred2 = np.zeros_like(gt)
    pred2[10:30, 10:30] = 1
    m2 = davis_jf(pred2, gt)
    assert m2["J"] == pytest.approx(0.5, abs=0.01)
    assert m2["F"] == pytest.approx(0.5, abs=0.01)
    # objects= restricts scoring (partial YTVOS first-appearance gt):
    # scoring only object 1 ignores the missing object 2
    m3 = davis_jf(pred2, gt, objects=[1])
    assert m3["J"] == 1.0 and m3["F"] == 1.0


def _official_f_boundary(fg, gt, bound_th=0.008):
    """Literal transcription of davis2017-evaluation's
    ``db_eval_boundary`` + ``seg2bmap`` (equal input/output size), the
    scorer the reference's written masks are fed to."""
    from scipy.ndimage import binary_dilation

    def seg2bmap(seg):
        seg = seg.astype(bool)
        e = np.zeros_like(seg)
        s = np.zeros_like(seg)
        se = np.zeros_like(seg)
        e[:, :-1] = seg[:, 1:]
        s[:-1, :] = seg[1:, :]
        se[:-1, :-1] = seg[1:, 1:]
        b = (seg ^ e) | (seg ^ s) | (seg ^ se)
        b[-1, :] = seg[-1, :] ^ e[-1, :]
        b[:, -1] = seg[:, -1] ^ s[:, -1]
        b[-1, -1] = 0
        return b

    bound_pix = np.ceil(bound_th * np.linalg.norm(fg.shape))
    r = int(bound_pix)
    yy, xx = np.mgrid[-r:r + 1, -r:r + 1]
    disk = (yy * yy + xx * xx) <= bound_pix * bound_pix
    fg_b, gt_b = seg2bmap(fg), seg2bmap(gt)
    fg_dil = binary_dilation(fg_b, disk)
    gt_dil = binary_dilation(gt_b, disk)
    gt_match = gt_b & fg_dil
    fg_match = fg_b & gt_dil
    n_fg, n_gt = fg_b.sum(), gt_b.sum()
    if n_fg == 0 and n_gt > 0:
        precision, recall = 1.0, 0.0
    elif n_fg > 0 and n_gt == 0:
        precision, recall = 0.0, 1.0
    elif n_fg == 0 and n_gt == 0:
        precision, recall = 1.0, 1.0
    else:
        precision = fg_match.sum() / float(n_fg)
        recall = gt_match.sum() / float(n_gt)
    if precision + recall == 0:
        return 0.0
    return 2 * precision * recall / (precision + recall)


def test_davis_f_matches_official_scorer():
    """The built-in boundary F equals the official davis2017-evaluation
    F-measure (seg2bmap boundaries, ceil'd radius, Euclidean disk
    dilation) on random blobby masks — the scorer the reference defers
    to externally."""
    from d3fields_tpu.utils.metrics import davis_jf

    rs = np.random.RandomState(7)
    for trial in range(6):
        H, W = rs.randint(40, 90), rs.randint(40, 90)
        gt = np.zeros((H, W), np.uint8)
        pred = np.zeros((H, W), np.uint8)
        for m in (gt, pred):
            for _ in range(rs.randint(1, 4)):
                cy, cx = rs.randint(H), rs.randint(W)
                r = rs.randint(4, 14)
                yy, xx = np.mgrid[:H, :W]
                m[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 1
        got = davis_jf(pred, gt, num_objects=1)["F"]
        want = _official_f_boundary(pred.astype(bool), gt.astype(bool))
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-12,
                                   err_msg=f"trial {trial} ({H}x{W})")


def test_davis_palette_matches_reference_table():
    """The generated VOC colormap must equal the reference's hardcoded
    palette bytes (spot values from XMem/util/palette.py)."""
    from d3fields_tpu.utils.visualization import davis_palette

    p = davis_palette()
    np.testing.assert_array_equal(p[0], [0, 0, 0])
    np.testing.assert_array_equal(p[1], [128, 0, 0])
    np.testing.assert_array_equal(p[2], [0, 128, 0])
    np.testing.assert_array_equal(p[3], [128, 128, 0])
    np.testing.assert_array_equal(p[4], [0, 0, 128])
    np.testing.assert_array_equal(p[8], [64, 0, 0])
    np.testing.assert_array_equal(p[16], [0, 64, 0])


def test_save_index_mask_png_roundtrip(tmp_path):
    from PIL import Image

    from d3fields_tpu.utils.visualization import save_index_mask_png

    m = np.zeros((20, 30), np.uint8)
    m[5:15, 10:20] = 2
    p = str(tmp_path / "m.png")
    save_index_mask_png(p, m)
    back = np.array(Image.open(p))
    np.testing.assert_array_equal(back, m)  # indices survive the palette


def test_load_state_tracker_resume_and_warning(tmp_path):
    """A checkpoint holding tracker memory must either rebuild the tracker
    (factory configured: true resume) or warn loudly (no factory: the
    session would silently re-seed otherwise)."""
    import jax as _jax
    import pytest as _pytest

    from d3fields_tpu.config import XMemConfig
    from d3fields_tpu.fields.fusion import Fusion
    from d3fields_tpu.models.xmem import network as xnet
    from d3fields_tpu.seg.video_tracker import VideoMaskTracker
    from d3fields_tpu.utils.synthetic import render_sphere_scene

    sc = render_sphere_scene(num_views=2, H=48, W=64, feat_dim=8)
    xcfg = XMemConfig(key_dim=8, value_dim=16, hidden_dim=8, top_k=5,
                      mem_every=2, max_mid_term_frames=3,
                      min_mid_term_frames=1, num_prototypes=4,
                      max_long_term_elements=64, size=-1)
    xparams = xnet.init_params(_jax.random.PRNGKey(0), xcfg)

    def factory(num_views, num_objects, image_hw):
        return VideoMaskTracker(xparams, xcfg, num_views=num_views,
                                num_objects=num_objects, image_hw=image_hw,
                                size=-1)

    f = Fusion(video_tracker=factory(2, 1, (48, 64)))
    f.update({k: sc[k] for k in ("color", "depth", "pose", "K")}
             | {"dino_feats": sc["dino_feats"]})
    seed = (sc["color"][..., 0] > 100).astype(np.uint8)  # (V, H, W) index mask
    f.video_tracker.process(sc["color"].astype(np.float32) / 255.0, seed)
    path = str(tmp_path / "track.pkl")
    f.save_state(path)

    # no tracker, no factory -> loud warning, state otherwise restored
    g = Fusion()
    with _pytest.warns(UserWarning, match="video-tracker memory"):
        g.load_state(path)
    assert g.video_tracker is None

    # factory configured -> tracker rebuilt from the saved spec, memory equal
    h = Fusion(video_tracker_factory=factory)
    h.load_state(path)
    assert h.video_tracker is not None
    assert h.video_tracker.first_mask_loaded
    ref_mem = f.video_tracker.core.mem
    got_mem = h.video_tracker.core.mem
    _jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        ref_mem, got_mem,
    )


def test_compile_cache_dir_is_host_scoped(tmp_path, monkeypatch):
    """The persistent executable cache must never hand one machine's CPU
    AOT executables to a different machine (XLA's cache key does not
    cover host CPU features; a mismatch risks SIGILL). The default dir is
    namespaced by a host fingerprint; the explicit env override wins
    verbatim; D3F_COMPILE_CACHE=0 disables."""
    from d3fields_tpu.utils import compile_cache as cc

    prev = jax.config.jax_compilation_cache_dir
    prev_t = jax.config.jax_persistent_cache_min_compile_time_secs
    prev_b = jax.config.jax_persistent_cache_min_entry_size_bytes

    try:
        sig = cc._host_signature()
        assert sig == cc._host_signature() and len(sig) == 12  # deterministic

        # the namespace must roll on a CPUID identity change, not just a
        # flag-set change: LLVM's tuning-feature choices (+prefer-no-gather
        # et al.) key on vendor/family/model/stepping, and two driver hosts
        # with IDENTICAL flags produced mutually-warning AOT executables
        a = tmp_path / "cpu_a.txt"
        b = tmp_path / "cpu_b.txt"
        a.write_text("vendor_id : GenuineIntel\nmodel : 207\n"
                     "stepping : 2\nflags : sse sse2 avx\n")
        b.write_text("vendor_id : GenuineIntel\nmodel : 143\n"
                     "stepping : 2\nflags : sse sse2 avx\n")
        ia, ib = cc._cpu_identity(str(a)), cc._cpu_identity(str(b))
        assert ia["flags"] == ib["flags"] and ia["model"] != ib["model"]
        assert ia != ib  # -> different sha1 namespace

        monkeypatch.delenv("D3F_COMPILE_CACHE_DIR", raising=False)
        monkeypatch.setenv("HOME", str(tmp_path))
        d = cc.enable_compilation_cache()
        assert d is not None and os.path.basename(d) == sig and os.path.isdir(d)

        monkeypatch.setenv("D3F_COMPILE_CACHE_DIR", str(tmp_path / "explicit"))
        assert cc.enable_compilation_cache() == str(tmp_path / "explicit")

        monkeypatch.setenv("D3F_COMPILE_CACHE", "0")
        assert cc.enable_compilation_cache() is None
    finally:
        # restore global jax config (the suite runs cache-disabled) even on
        # a mid-test assertion failure — a leaked tmp_path cache dir would
        # poison every later test in the process
        jax.config.update("jax_compilation_cache_dir", prev)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_t)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", prev_b)


def test_model_wrappers_commit_params_to_device():
    """Constructors device_put host-numpy weight trees ONCE. Numpy leaves
    passed straight to a jitted forward are re-converted/re-transferred on
    EVERY call — on the remote-tunnel TPU that is the full weight tree per
    frame (2.5 GB/view at SAM ViT-H scale). Pin that every inference
    wrapper stores jax.Array leaves even when fed npz-style numpy."""
    from d3fields_tpu.models import dinov2 as d2
    from d3fields_tpu.models.groundingdino import model as gd
    from d3fields_tpu.models.groundingdino.detector import GroundingDinoDetector
    from d3fields_tpu.models.sam import model as sm
    from d3fields_tpu.models.sam.predictor import SamPredictor

    to_np = lambda tree: jax.tree.map(np.asarray, tree)
    all_committed = lambda tree: all(
        isinstance(leaf, jax.Array) for leaf in jax.tree.leaves(tree))

    scfg = sm.SamConfig.tiny_test()
    sam = SamPredictor(to_np(sm.random_params(scfg)), scfg)
    assert all_committed(sam.params)

    gcfg = gd.GroundingDinoConfig.tiny_test()
    det = GroundingDinoDetector(to_np(gd.random_params(gcfg)), gcfg)
    assert all_committed(det.params)

    dcfg = d2.Dinov2Config(hidden_size=64, num_layers=2, num_heads=4,
                           patch_size=14, image_size=56)
    dparams = to_np(d2.init_params(jax.random.PRNGKey(0), dcfg))
    bb = d2.Dinov2Backbone(dparams, dcfg)
    assert all_committed(bb.params)
