"""Headless interactive-session tests.

Parity of the interaction algebra against the reference's
``XMem/inference/interact/interaction.py`` (soft aggregation, stroke
rasterization, per-mode predict semantics), plus the session state
machine (gesture -> adopt -> propagate) the Qt GUI drives
(``gui.py:544-794``).
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/XMem"
HAS_REF = os.path.isdir(REF)


@pytest.fixture(scope="module")
def ref_interaction():
    if not HAS_REF:
        pytest.skip("reference tree unavailable")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # the interact tree pulls torchvision (absent offline) only for
    # im_normalization; a minimal Normalize stub keeps the import working
    if "torchvision" not in sys.modules:
        import types

        import torch

        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")

        class _Normalize:
            def __init__(self, mean, std):
                self.mean = torch.tensor(mean).view(-1, 1, 1)
                self.std = torch.tensor(std).view(-1, 1, 1)

            def __call__(self, x):
                return (x - self.mean) / self.std

        tvt.Normalize = _Normalize
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
    from inference.interact import interaction

    return interaction


# ---------------------------------------------------------------------------
# aggregation + interaction algebra parity
# ---------------------------------------------------------------------------

def test_aggregate_wbg_parity(ref_interaction):
    """Soft-aggregation with derived background and the x1000 hard
    temperature matches ``interaction.py:35-50`` bit-for-float."""
    import torch

    from d3fields_tpu.interact import aggregate_wbg

    rs = np.random.RandomState(0)
    prob = rs.rand(3, 20, 24).astype(np.float32)
    for keep_bg in (False, True):
        for hard in (False, True):
            ref = ref_interaction.aggregate_wbg(
                torch.from_numpy(prob), keep_bg=keep_bg, hard=hard).numpy()
            got = aggregate_wbg(prob, keep_bg=keep_bg, hard=hard)
            # hard mode multiplies logits by 1000, so a 1e-8 float32
            # difference in log(p/(1-p)) legitimately moves the softmax
            # by ~1e-5
            np.testing.assert_allclose(got, ref, rtol=1e-5,
                                       atol=1e-4 if hard else 1e-6)


class _StubFbrs:
    """Records clicks, returns a deterministic bool mask (stands in for
    the f-BRS controller, whose own numerics are covered in
    test_interactive.py)."""

    def __init__(self, hw):
        self.hw = hw
        self.clicks = []
        self.unanchored = 0

    def interact(self, image, x, y, positive):
        self.clicks.append((float(x), float(y), bool(positive)))
        yy, xx = np.mgrid[:self.hw[0], :self.hw[1]]
        return (np.hypot(yy - y, xx - x) < 6).astype(bool)

    def unanchor(self):
        self.unanchored += 1


def test_click_interaction_parity(ref_interaction):
    """ClickInteraction's predict — 0.9 clamp of the previous
    probabilities, target-channel overwrite, hard aggregation — matches
    ``interaction.py:199-252`` with the same stub controller."""
    import torch

    from d3fields_tpu.interact import ClickInteraction

    rs = np.random.RandomState(1)
    H, W, K = 24, 32, 2
    prev = rs.rand(K + 1, H, W).astype(np.float32)
    prev /= prev.sum(0)

    class TorchStub:
        def interact(self, image, x, y, positive):
            yy, xx = np.mgrid[:H, :W]
            return torch.from_numpy(
                (np.hypot(yy - y, xx - x) < 6).astype(np.float32))

    img_t = torch.zeros(3, H, W)
    ref = ref_interaction.ClickInteraction(
        img_t, torch.from_numpy(prev), (H, W), TorchStub(), tar_obj=1)
    ref.push_point(10.0, 8.0, False)  # neg=False: a positive click
    ref_out = ref.predict().numpy()

    ours = ClickInteraction(np.zeros((H, W, 3), np.float32), prev,
                            _StubFbrs((H, W)), tar_obj=1)
    ours.push_click(10.0, 8.0, positive=True)
    got = ours.predict()
    np.testing.assert_allclose(got, ref_out, rtol=1e-5, atol=1e-6)


def test_scribble_interaction_parity(ref_interaction):
    """Stroke rasterization (cv2 polylines on the 255-initialized
    scribble map) and the hard aggregation match
    ``interaction.py:134-196`` given identical controller outputs."""
    import torch

    from d3fields_tpu.interact import ScribbleInteraction

    rs = np.random.RandomState(2)
    H, W, K = 30, 40, 2
    prev = (rs.rand(H, W) * (K + 1)).astype(np.uint8)
    fixed = rs.rand(K, H, W).astype(np.float32)

    captured = {}

    class TorchStub:
        def interact(self, image, prev_mask, scr_mask):
            captured["ref_map"] = scr_mask.copy()
            return torch.from_numpy(fixed)

    class NpStub:
        def interact(self, image, prev_mask, scr_mask):
            captured["our_map"] = scr_mask.copy()
            return fixed

    img_t = torch.zeros(3, H, W)
    ref = ref_interaction.ScribbleInteraction(
        img_t, torch.from_numpy(prev.astype(np.float32)), (H, W),
        TorchStub(), num_objects=K)
    path = [(3.0, 4.0), (20.0, 10.0), (35.0, 25.0)]
    for x, y in path:
        ref.push_point(x, y, 1)
    ref.end_path()
    for x, y in [(5.0, 25.0), (30.0, 5.0)]:
        ref.push_point(x, y, 0)  # background correction stroke
    ref_out = ref.predict().numpy()

    ours = ScribbleInteraction(np.zeros((H, W, 3), np.float32), prev,
                               NpStub(), num_objects=K)
    ours.push_path(path, obj=1)
    ours.push_path([(5.0, 25.0), (30.0, 5.0)], obj=0)
    got = ours.predict()

    np.testing.assert_array_equal(captured["our_map"], captured["ref_map"])
    np.testing.assert_allclose(got, ref_out, rtol=1e-5, atol=1e-4)


def test_free_interaction_parity(ref_interaction):
    """Free painting writes indices with the brush thickness and
    one-hot-encodes — ``interaction.py:69-132``."""
    from d3fields_tpu.interact import FreeInteraction

    rs = np.random.RandomState(3)
    H, W, K = 26, 34, 2
    prev = (rs.rand(H, W) * (K + 1)).astype(np.uint8)

    ref = ref_interaction.FreeInteraction(None, prev, (H, W), K)
    ref.set_size(3)
    for x, y in [(4.0, 4.0), (20.0, 18.0), (30.0, 6.0)]:
        ref.push_point(x, y, 2)
    ref.end_path()
    # ref.predict() calls .cuda() (interaction.py:128) — unavailable
    # offline; its one-hot encoding is interactive_utils.py:22-24
    from inference.interact.interactive_utils import (
        index_numpy_to_one_hot_torch,
    )

    ref_out = index_numpy_to_one_hot_torch(ref.drawn_map, K + 1).numpy()

    ours = FreeInteraction(prev, K, size=3)
    ours.push_path([(4.0, 4.0), (20.0, 18.0), (30.0, 6.0)], obj=2)
    np.testing.assert_array_equal(ours.drawn_map, ref.drawn_map)
    np.testing.assert_allclose(ours.predict(), ref_out)


# ---------------------------------------------------------------------------
# session state machine
# ---------------------------------------------------------------------------

def _frames(T=4, H=48, W=64):
    rs = np.random.RandomState(7)
    base = (rs.rand(H, W, 3) * 255).astype(np.uint8)
    return np.stack([np.roll(base, 2 * t, axis=1) for t in range(T)])


def test_session_gestures_and_store():
    """Gestures adopt state immediately (gui.py:758-770), commit
    completes the interaction, navigation reloads the stored mask, and
    save_masks writes DAVIS-paletted PNGs."""
    from PIL import Image

    from d3fields_tpu.interact import InteractiveSession

    frames = _frames()
    s = InteractiveSession(frames, num_objects=2,
                           fbrs_controller=_StubFbrs(frames.shape[1:3]))
    m = s.free_draw([(10, 10), (20, 20)], obj=1)
    assert (m == 1).any() and s.masks[0].max() == 1  # adopted immediately
    s.commit()

    # a click on object 2 starts a new interaction against current state
    s.set_object(2)
    m = s.click(40, 30, positive=True)
    assert (m == 2).any() and (m == 1).any()
    s.commit()

    s.goto(1)
    assert s.current_mask.max() == 0  # frame 1 untouched
    s.goto(0)
    assert (s.current_mask == 2).any()  # stored mask reloaded

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        paths = s.save_masks(d)
        assert len(paths) == 1
        img = Image.open(paths[0])
        assert img.mode == "P"
        np.testing.assert_array_equal(np.array(img), s.masks[0])


def test_session_object_switch_unanchors():
    """Switching the click target object unanchors f-BRS and starts a
    fresh interaction (gui.py:670-680,728-736)."""
    from d3fields_tpu.interact import InteractiveSession

    frames = _frames()
    stub = _StubFbrs(frames.shape[1:3])
    s = InteractiveSession(frames, num_objects=2, fbrs_controller=stub)
    s.click(10, 10)
    first = s.interaction
    before = stub.unanchored
    s.set_object(2)
    s.click(40, 30)
    assert stub.unanchored > before
    assert s.interaction is not first


@pytest.mark.slow
def test_session_propagation_roundtrip():
    """Free-draw a box on a middle frame, propagate forward to the end
    and backward to frame 0 — every frame gets a mask, the seeded object
    survives propagation, and clear_memory resets XMem
    (gui.py:544-610,862-866)."""
    import jax

    from d3fields_tpu.config import XMemConfig
    from d3fields_tpu.interact import InteractiveSession
    from d3fields_tpu.models.xmem import network as N

    cfg = XMemConfig(max_mid_term_frames=4, min_mid_term_frames=2,
                     num_prototypes=8, max_long_term_elements=64,
                     top_k=5, mem_every=2)
    params = N.init_params(jax.random.PRNGKey(0), cfg)
    frames = _frames(T=5)
    s = InteractiveSession(frames, num_objects=1, xmem_params=params,
                           xmem_cfg=cfg)
    s.goto(2)
    s.free_draw([(20, 15), (40, 35)], obj=1)
    s.commit()

    fwd = s.propagate(forward=True)
    assert fwd == [3, 4] and s.cursur == 4
    s.goto(2)
    bwd = s.propagate(forward=False)
    assert bwd == [1, 0] and s.cursur == 0
    assert s._mask_known.all()
    for t in range(5):
        assert s.masks[t].shape == frames.shape[1:3]

    # pause (max_frames) stops early
    s.goto(2)
    part = s.propagate(forward=True, max_frames=1)
    assert part == [3]
    s.clear_memory()
    assert s.xmem.curr_ti == -1


# ---------------------------------------------------------------------------
# overlay visualization parity (interactive_utils.py:26-175)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_iutils(ref_interaction):
    from inference.interact import interactive_utils

    return interactive_utils


def test_overlay_hard_parity(ref_iutils):
    """All five hard-mask viewer modes match get_visualization
    (interactive_utils.py:40-57,76-112) pixel-exact on uint8."""
    from d3fields_tpu.interact import get_visualization

    rs = np.random.RandomState(0)
    H, W = 20, 28
    img = (rs.rand(H, W, 3) * 255).astype(np.uint8)
    mask = (rs.rand(H, W) * 3).astype(np.uint8)
    layer = (rs.rand(H, W, 4) * 255).astype(np.uint8)
    for mode in ("davis", "fade", "light", "popup", "layered"):
        ref = ref_iutils.get_visualization(mode, img, mask, layer, [1, 2])
        got = get_visualization(mode, img, mask, layer, [1, 2])
        # float32 rounding at the uint8 cast can differ by 1 LSB
        assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1, mode
    # layered with no layer falls back to davis
    np.testing.assert_array_equal(
        get_visualization("layered", img, mask, None, [1]),
        get_visualization("davis", img, mask, None, [1]))


def test_overlay_soft_parity(ref_iutils):
    """The soft-probability path matches the reference's *_torch
    composition (interactive_utils.py:58-74,115-175) — the reference
    only runs it on GPU, so the oracle here is its math transcribed to
    CPU torch."""
    import torch

    from d3fields_tpu.interact import get_visualization_soft

    rs = np.random.RandomState(1)
    H, W, K = 16, 22, 2
    img01 = rs.rand(H, W, 3).astype(np.float32)
    prob = rs.rand(K + 1, H, W).astype(np.float32)
    prob /= prob.sum(0)
    layer01 = rs.rand(H, W, 4).astype(np.float32)
    cm = torch.from_numpy(
        (np.frombuffer(__import__("util.palette",
                                  fromlist=["davis_palette"]).davis_palette,
                       dtype=np.uint8).reshape(-1, 3).astype(np.float32)
         * 1.5).clip(0, 255)) / 255
    gw = torch.tensor([[[0.3, 0.59, 0.11]]])

    timg = torch.from_numpy(img01)
    tprob = torch.from_numpy(prob)

    # davis/fade/light (overlay_davis_torch)
    for mode, alpha, fade in (("davis", 0.5, False), ("fade", 0.5, True),
                              ("light", 0.9, False)):
        m = torch.argmax(tprob, dim=0)
        ref = timg.clone()
        fg = timg * alpha + (1 - alpha) * cm[m]
        binary = m > 0
        ref[binary] = fg[binary]
        if fade:
            ref[~binary] = ref[~binary] * 0.6
        ref = (ref * 255).numpy().astype(np.uint8)
        got = get_visualization_soft(mode, img01, prob, None, [1, 2])
        assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1, mode

    # popup (overlay_popup_torch)
    obj = tprob[np.array([1, 2], np.int32)].sum(0).unsqueeze(2)
    gray = (timg * gw).sum(-1, keepdim=True)
    ref = ((obj * timg + (1 - obj) * gray) * 255).numpy().astype(np.uint8)
    got = get_visualization_soft("popup", img01, prob, None, [1, 2])
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1

    # layered (overlay_layer_torch)
    tl = torch.from_numpy(layer01)
    objm = tprob[np.array([1], np.int32)].sum(0)
    bga = torch.maximum(objm, tl[..., 3]).unsqueeze(2)
    objm = objm.unsqueeze(2)
    ref = ((timg * (1 - bga) + tl[..., :3] * (1 - objm) + timg * objm)
           .clip(0, 1) * 255).numpy().astype(np.uint8)
    got = get_visualization_soft("layered", img01, prob, layer01, [1])
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1

    # empty target set
    got = get_visualization_soft("popup", img01, prob, None, [])
    assert got.shape == (H, W, 3)
