"""Pipelined serving loop: deferred fetch must not change results.

The reference frame loops are synchronous (``vis_tracking.py:70-138``);
``d3fields_tpu.serving`` overlaps device compute with host consumption.
These tests pin the contract: bit-identical outputs, in-order delivery,
and the degenerate depth=0 == synchronous case.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3fields_tpu.serving import (
    AsyncFrameLoop, host_prefetch, prefetch_to_device,
)


@jax.jit
def _step(carry, x):
    carry = carry * 0.9 + x
    return carry, {"out": carry * 2.0, "tag": jnp.sum(carry)}


def _run_sync(frames):
    carry = jnp.zeros(4)
    got = []
    for t, x in enumerate(frames):
        carry, out = _step(carry, x)
        got.append((t, jax.tree_util.tree_map(np.asarray, out)))
    return got


@pytest.mark.parametrize("depth", [0, 1, 3])
def test_async_loop_matches_sync(depth):
    frames = [jnp.asarray(np.random.RandomState(t).randn(4).astype(np.float32))
              for t in range(6)]
    expect = _run_sync(frames)

    got = []
    loop = AsyncFrameLoop(lambda fid, out: got.append((fid, out)), depth=depth)
    carry = jnp.zeros(4)
    for t, x in enumerate(frames):
        carry, out = _step(carry, x)
        loop.submit(t, out)
        # the loop may hold at most `depth` frames in flight
        assert loop.in_flight <= depth
        # frames drain strictly in submit order with `depth` frames of lag
        assert len(got) == max(0, t + 1 - depth)
    loop.flush()
    assert loop.in_flight == 0
    assert loop.frames_consumed == len(frames)
    assert [fid for fid, _ in got] == [fid for fid, _ in expect]
    for (_, a), (_, b) in zip(got, expect):
        np.testing.assert_array_equal(a["out"], b["out"])
        np.testing.assert_array_equal(a["tag"], b["tag"])
        assert isinstance(a["out"], np.ndarray)  # fetched, not a device leaf


def test_depth_zero_is_synchronous():
    seen = []
    loop = AsyncFrameLoop(lambda fid, out: seen.append(fid), depth=0)
    loop.submit("a", jnp.ones(2))
    assert seen == ["a"]  # consumed inside submit, no lag


def test_non_array_leaves_pass_through():
    got = {}
    loop = AsyncFrameLoop(lambda fid, out: got.update(out), depth=0)
    loop.submit(0, {"x": jnp.arange(3), "label": "mug", "n": 7})
    assert got["label"] == "mug" and got["n"] == 7
    assert isinstance(got["x"], np.ndarray)


def test_context_manager_flushes_on_clean_exit_only():
    seen = []
    with AsyncFrameLoop(lambda fid, out: seen.append(fid), depth=8) as loop:
        for t in range(3):
            loop.submit(t, jnp.zeros(1))
        assert seen == []  # all in flight
    assert seen == [0, 1, 2]

    seen2 = []
    with pytest.raises(RuntimeError):
        with AsyncFrameLoop(lambda fid, out: seen2.append(fid), depth=8) as lp:
            lp.submit(0, jnp.zeros(1))
            raise RuntimeError("boom")
    assert seen2 == []  # no consumer work on the error path


def test_consumer_error_keeps_frame_queued_for_retry():
    """A transient consumer failure (e.g. ENOSPC mid-write) must not drop
    the frame: flush() after recovery delivers it."""
    fail = {"on": True}
    seen = []

    def consumer(fid, out):
        if fail["on"]:
            raise OSError("disk full")
        seen.append(fid)

    loop = AsyncFrameLoop(consumer, depth=1)
    loop.submit(0, jnp.zeros(1))
    with pytest.raises(OSError):
        loop.submit(1, jnp.zeros(1))  # forces a drain of frame 0 -> fails
    assert loop.in_flight == 2  # nothing lost
    fail["on"] = False
    loop.flush()
    assert seen == [0, 1]


def test_invalid_depth_rejected():
    with pytest.raises(ValueError):
        AsyncFrameLoop(lambda *a: None, depth=-1)


def test_prefetch_to_device_order_and_types():
    frames = [{"img": np.full((2, 2), t, np.float32), "t": t} for t in range(5)]
    out = list(prefetch_to_device(iter(frames), size=2))
    assert [f["t"] for f in out] == [0, 1, 2, 3, 4]
    for t, f in enumerate(out):
        assert isinstance(f["img"], jax.Array)
        np.testing.assert_array_equal(np.asarray(f["img"]), t)


def test_host_prefetch_order_and_overlap():
    import threading

    produced = []

    def gen():
        for i in range(20):
            produced.append(i)
            yield i

    out = list(host_prefetch(gen(), size=3))
    assert out == list(range(20)) and produced == out
    # no stray producer threads left behind
    assert not [t for t in threading.enumerate()
                if t.name == "host_prefetch" and t.is_alive()]


def test_host_prefetch_propagates_producer_error():
    def gen():
        yield 1
        raise ValueError("decode failed")

    it = host_prefetch(gen(), size=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="decode failed"):
        list(it)


def test_host_prefetch_early_close_stops_producer():
    import threading
    import time

    state = {"produced": 0}

    def gen():
        while True:
            state["produced"] += 1
            yield state["produced"]

    it = host_prefetch(gen(), size=2)
    assert next(it) == 1
    it.close()  # consumer abandons the stream
    time.sleep(0.5)
    # producer stopped near the queue bound instead of running away
    assert state["produced"] <= 8
    assert not [t for t in threading.enumerate()
                if t.name == "host_prefetch" and t.is_alive()]
    with pytest.raises(ValueError):
        list(host_prefetch([], size=0))


def test_prefetch_transform_and_short_streams():
    # size larger than the stream: still yields everything once
    out = list(prefetch_to_device([np.ones(1)], size=4,
                                  transform=lambda x: x * 3))
    assert len(out) == 1
    np.testing.assert_array_equal(np.asarray(out[0]), 3)
    assert list(prefetch_to_device([], size=2)) == []
    with pytest.raises(ValueError):
        list(prefetch_to_device([], size=0))


def _tiny_pipeline(num_views=2, H=40, W=60, num_obj=2, seed=0):
    """Tiny DINOv2 + XMem + camera rig for the fused-step tests."""
    from d3fields_tpu.config import TrackingConfig, XMemConfig
    from d3fields_tpu.models import dinov2 as dv2
    from d3fields_tpu.models.xmem import network as xnet
    from d3fields_tpu.seg.video_tracker import VideoMaskTracker

    rs = np.random.RandomState(seed)
    dcfg = dv2.Dinov2Config.tiny_test()
    dparams = dv2.init_params(jax.random.PRNGKey(0), dcfg)
    bb = dv2.Dinov2Backbone(dparams, dcfg, resize_mode="device")
    # top_k=64 >= every memory size this test reaches: the fused jit
    # may reassociate float reductions, and a discrete top-k-of-12
    # affinity selection would amplify 1e-6 noise into mask flips —
    # total selection keeps fused-vs-unfused at float-noise level
    xcfg = XMemConfig(key_dim=8, value_dim=16, hidden_dim=8, top_k=64,
                      mem_every=2, max_mid_term_frames=3,
                      min_mid_term_frames=1, num_prototypes=4,
                      max_long_term_elements=64, size=-1)
    xparams = xnet.init_params(jax.random.PRNGKey(1), xcfg)

    def make_tracker():
        return VideoMaskTracker(xparams, xcfg, num_views=num_views,
                                num_objects=num_obj, image_hw=(H, W),
                                size=-1)

    depth = (0.6 + 0.2 * rs.rand(num_views, H, W)).astype(np.float32)
    K = np.tile(np.array([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]],
                         np.float32), (num_views, 1, 1))
    pose = np.stack([np.concatenate(
        [np.eye(3, dtype=np.float32),
         np.array([[0.01 * v], [0.0], [0.7]], np.float32)], 1)
        for v in range(num_views)])
    frames = rs.randint(0, 255, (3, num_views, H, W, 3), np.uint8)
    mask0 = np.zeros((num_views, H, W), np.uint8)
    mask0[:, 5:20, 10:30] = 1
    mask0[:, 25:38, 35:55] = 2
    tcfg = TrackingConfig(iters=5)
    kp = rs.uniform(-0.1, 0.1, (1, 16, 3)).astype(np.float32)
    lo = np.array([-0.5, -0.5, -0.5], np.float32)
    hi = np.array([0.5, 0.5, 0.5], np.float32)
    return dict(bb=bb, make_tracker=make_tracker, depth=depth, pose=pose,
                K=K, frames=frames, mask0=mask0, tcfg=tcfg, kp=kp,
                lo=lo, hi=hi)


def test_fused_frame_step_matches_unfused():
    """FusedFrameStep (one executable) == the separate backbone / tracker /
    field / rigid-tracking calls, across several frames incl. a memory
    frame (mem_every=2) — fusing the dispatch chain must not change what
    is computed."""
    from d3fields_tpu.fields.state import FieldState
    from d3fields_tpu.serving import FusedFrameStep
    from d3fields_tpu.track.rigid import rigid_tracking_jit

    p = _tiny_pipeline()
    bb, frames = p["bb"], p["frames"]
    depth_j = jnp.asarray(p["depth"])
    pose_j, K_j = jnp.asarray(p["pose"]), jnp.asarray(p["K"])
    kp = jnp.asarray(p["kp"])
    lo, hi = jnp.asarray(p["lo"]), jnp.asarray(p["hi"])
    src = jnp.asarray(
        np.random.RandomState(7).randn(16, 64).astype(np.float32))

    # unfused reference: tracker.process + backbone + field + tracking
    tr_ref = p["make_tracker"]()
    tr_ref.process(frames[0], p["mask0"])
    ref = []
    for t in (1, 2):
        tr_ref.process(frames[t])
        up = tr_ref.last_prob  # (V, O+1, H, W) soft, device
        mask = jnp.transpose(up[:, 1:], (0, 2, 3, 1))
        feats = bb(frames[t])
        st = FieldState(depth=depth_j, pose=pose_j, K=K_j,
                        dino_feats=feats.astype(jnp.float32), mask=mask)
        out = rigid_tracking_jit(st, src, kp, lo, hi, p["tcfg"])
        ref.append((np.asarray(mask), np.asarray(out["match_pts"]),
                    np.asarray(out["t"]), np.asarray(out["log_r"])))

    # fused: identical seeding, then one dispatch per frame
    tr = p["make_tracker"]()
    tr.process(frames[0], p["mask0"])
    fused = FusedFrameStep(bb, tr, p["depth"], p["pose"], p["K"],
                           p["lo"], p["hi"], p["tcfg"])
    # Tolerances: the fused executable reassociates float reductions
    # (XLA fuses across the stage boundaries — that is the point), and the
    # random-weight tiny XMem amplifies ~1e-6 reassociation noise to ~1e-2
    # on near-tie probabilities (measured 0.033 max). A plumbing bug
    # (wrong branch, missing normalization, stale memory) produces O(0.5)
    # mask errors and centimeters of keypoint drift — far outside these.
    for i, t in enumerate((1, 2)):
        out = fused.step(frames[t], src, kp)
        rm, rmp, rt, rr = ref[i]
        m = np.asarray(out["mask"])
        np.testing.assert_allclose(m, rm, atol=0.05)
        # discrete object assignment agrees on ~every pixel
        agree = (m.argmax(-1) == rm.argmax(-1)).mean()
        assert agree > 0.995, agree
        np.testing.assert_allclose(np.asarray(out["match_pts"]), rmp,
                                   atol=5e-3)
        np.testing.assert_allclose(np.asarray(out["t"]), rt, atol=5e-3)
        np.testing.assert_allclose(np.asarray(out["log_r"]), rr, atol=5e-3)
    # frame counters advanced like the unfused core
    assert tr.core.curr_ti == tr_ref.core.curr_ti
    assert tr.core.last_mem_ti == tr_ref.core.last_mem_ti


def test_fused_frame_step_requires_seeded_tracker():
    from d3fields_tpu.serving import FusedFrameStep

    p = _tiny_pipeline()
    fused = FusedFrameStep(p["bb"], p["make_tracker"](), p["depth"],
                           p["pose"], p["K"], p["lo"], p["hi"], p["tcfg"])
    with pytest.raises(RuntimeError, match="seed"):
        fused.step(p["frames"][0],
                   jnp.zeros((16, 64)), jnp.asarray(p["kp"]))


def test_fused_step_honors_mu_and_4x4_pose():
    """A non-default fusion ``mu`` and reference-style (V,4,4) poses must
    reach the fused executable's FieldState exactly like the staged path's
    ``state_from_obs(mu=config.fusion.mu, pose[:, :3])`` — round-4 advisor
    finding: the fused body silently used the default mu / raw pose."""
    from d3fields_tpu.fields.state import FieldState
    from d3fields_tpu.serving import FusedFrameStep
    from d3fields_tpu.track.rigid import rigid_tracking_jit

    p = _tiny_pipeline()
    bb, frames = p["bb"], p["frames"]
    mu = 0.06  # far from the 0.02 default: a mu mix-up moves keypoints
    pose44 = np.concatenate(
        [p["pose"], np.tile(np.array([[[0, 0, 0, 1]]], np.float32),
                            (p["pose"].shape[0], 1, 1))], axis=1)
    src = jnp.asarray(
        np.random.RandomState(7).randn(16, 64).astype(np.float32))
    kp = jnp.asarray(p["kp"])
    lo, hi = jnp.asarray(p["lo"]), jnp.asarray(p["hi"])

    # staged reference with the configured mu + normalized pose
    tr_ref = p["make_tracker"]()
    tr_ref.process(frames[0], p["mask0"])
    tr_ref.process(frames[1])
    up = tr_ref.last_prob
    mask = jnp.transpose(up[:, 1:], (0, 2, 3, 1))
    st = FieldState(depth=jnp.asarray(p["depth"]), pose=jnp.asarray(p["pose"]),
                    K=jnp.asarray(p["K"]),
                    dino_feats=bb(frames[1]).astype(jnp.float32),
                    mask=mask, mu=mu)
    ref = rigid_tracking_jit(st, src, kp, lo, hi, p["tcfg"])

    tr = p["make_tracker"]()
    tr.process(frames[0], p["mask0"])
    fused = FusedFrameStep(bb, tr, p["depth"], pose44, p["K"],
                           p["lo"], p["hi"], p["tcfg"], mu=mu)
    assert fused.pose.shape == p["pose"].shape  # (V,4,4) -> (V,3,4)
    out = fused.step(frames[1], src, kp)
    np.testing.assert_allclose(np.asarray(out["match_pts"]),
                               np.asarray(ref["match_pts"]), atol=5e-3)
    np.testing.assert_allclose(np.asarray(out["t"]),
                               np.asarray(ref["t"]), atol=5e-3)


def test_fused_segment_matches_per_frame_steps():
    """_fused_segment (lax.scan over T frames in ONE executable, carrying
    the XMem memory and the tracked points) == T calls of fused.step with
    the host feeding match_pts forward — the offline/recorded-video mode.
    Same float-reassociation tolerances as the per-frame fused test."""
    import jax.numpy as jnp

    from d3fields_tpu.serving import FusedFrameStep

    p = _tiny_pipeline()
    bb, frames = p["bb"], p["frames"]
    src = jnp.asarray(
        np.random.RandomState(7).randn(16, 64).astype(np.float32))
    kp = jnp.asarray(p["kp"])

    # per-frame reference: fused.step chained by the host loop
    tr_ref = p["make_tracker"]()
    tr_ref.process(frames[0], p["mask0"])
    f_ref = FusedFrameStep(bb, tr_ref, p["depth"], p["pose"], p["K"],
                           p["lo"], p["hi"], p["tcfg"])
    ref, last = [], kp
    for t in (1, 2):
        out = f_ref.step(frames[t], src, last)
        last = out["match_pts"]
        ref.append(jax.tree_util.tree_map(np.asarray, out))

    tr = p["make_tracker"]()
    tr.process(frames[0], p["mask0"])
    fused = FusedFrameStep(bb, tr, p["depth"], p["pose"], p["K"],
                           p["lo"], p["hi"], p["tcfg"])
    outs = fused.step_segment(frames[1:3], src, kp)
    assert tr.core.curr_ti == tr_ref.core.curr_ti
    assert tr.core.last_mem_ti == tr_ref.core.last_mem_ti
    for i in range(2):
        for key, tol in (("match_pts", 5e-3), ("t", 5e-3),
                         ("log_r", 5e-3), ("mask", 0.05)):
            np.testing.assert_allclose(
                np.asarray(outs[key][i]), ref[i][key], atol=tol,
                err_msg=f"frame {i} {key}")


def test_fused_step_per_frame_depth_plumbs_through():
    """RGB-D serving passes each frame's depth into the fused executable;
    a different depth map must change the field (and hence the tracked
    points) while the XMem mask path is unaffected."""
    import jax.numpy as jnp

    from d3fields_tpu.serving import FusedFrameStep

    p = _tiny_pipeline()
    src = jnp.asarray(
        np.random.RandomState(7).randn(16, 64).astype(np.float32))
    kp = jnp.asarray(p["kp"])

    outs = []
    for depth_override in (None, p["depth"] * 0.8):
        tr = p["make_tracker"]()
        tr.process(p["frames"][0], p["mask0"])
        fused = FusedFrameStep(p["bb"], tr, p["depth"], p["pose"], p["K"],
                               p["lo"], p["hi"], p["tcfg"])
        outs.append(fused.step(p["frames"][1], src, kp,
                               depth=depth_override))
    # depth feeds only the field: masks identical, tracking moved
    np.testing.assert_allclose(np.asarray(outs[0]["mask"]),
                               np.asarray(outs[1]["mask"]), atol=1e-6)
    assert np.abs(np.asarray(outs[0]["match_pts"])
                  - np.asarray(outs[1]["match_pts"])).max() > 1e-4


def test_fused_step_xmem_bgr_flip():
    """xmem_bgr_to_rgb=True flips ONLY the XMem branch: its masks equal a
    no-flip run fed pre-flipped frames, while DINOv2 (and hence the field/
    tracking) sees the frames as-is — the app's BGR-obs convention
    (Fusion flips before video_tracker.process, fusion.py:411, but feeds
    DINOv2 the raw obs color, fusion.py:252-258)."""
    import jax.numpy as jnp

    from d3fields_tpu.serving import FusedFrameStep

    p = _tiny_pipeline()
    frames = p["frames"]
    flipped = frames[..., ::-1].copy()
    src = jnp.asarray(
        np.random.RandomState(7).randn(16, 64).astype(np.float32))
    kp = jnp.asarray(p["kp"])

    # reference: no flip, tracker sees RGB frames end to end
    tr_a = p["make_tracker"]()
    tr_a.process(flipped[0], p["mask0"])
    f_a = FusedFrameStep(p["bb"], tr_a, p["depth"], p["pose"], p["K"],
                         p["lo"], p["hi"], p["tcfg"])
    out_a = f_a.step(flipped[1], src, kp)

    # BGR frames + in-executable flip on the XMem branch
    tr_b = p["make_tracker"]()
    tr_b.process(flipped[0], p["mask0"])  # seeded with RGB, like Fusion
    f_b = FusedFrameStep(p["bb"], tr_b, p["depth"], p["pose"], p["K"],
                         p["lo"], p["hi"], p["tcfg"], xmem_bgr_to_rgb=True)
    out_b = f_b.step(frames[1], src, kp)

    np.testing.assert_allclose(np.asarray(out_b["mask"]),
                               np.asarray(out_a["mask"]), atol=1e-6)
    # DINOv2 saw different channel orders -> the field differs
    assert np.abs(np.asarray(out_b["match_pts"])
                  - np.asarray(out_a["match_pts"])).max() > 1e-5
