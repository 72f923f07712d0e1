"""Interactive click/scribble segmentation stack tests.

Torch-oracle parity against the reference fbrs / S2M model trees at
``/root/reference/XMem/inference/interact/`` (random weights, eval mode),
plus behavior tests for the predictor/controller layers the Qt GUI drives.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference/XMem"
HAS_REF = os.path.isdir(REF)


@pytest.fixture(scope="module")
def ref_interact():
    """Import the reference interact tree (stubbing its cython dist-maps
    module, absent offline; the tensor-mode branch needs no cython)."""
    if not HAS_REF:
        pytest.skip("reference tree unavailable")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    name = "inference.interact.fbrs.utils.cython"
    if name not in sys.modules:
        fake = types.ModuleType(name)
        fake.get_dist_maps = None
        sys.modules[name] = fake
    import inference.interact  # noqa: F401
    return "inference.interact"


# ---------------------------------------------------------------------------
# fbrs HRNet-OCR
# ---------------------------------------------------------------------------

def _torch_hrnet(width=6, ocr_width=8, small=True, seed=0):
    import torch

    from inference.interact.fbrs.model.modeling.hrnet_ocr import (
        HighResolutionNet,
    )

    torch.manual_seed(seed)
    net = HighResolutionNet(width=width, ocr_width=ocr_width, small=small,
                            num_classes=1)
    net.eval()
    # randomize BN running stats too — folded-BN parity is only proven if
    # the stats are non-trivial
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)
    return net


@pytest.mark.parametrize("small", [True, False])
def test_hrnet_ocr_forward_parity(ref_interact, small):
    """Full HRNet-OCR forward (stem, 3 fused stages, OCR attention, cls +
    aux heads) matches the reference net on random weights/input —
    hrnet_ocr.py:158-383 + ocr.py:7-141."""
    import torch

    from d3fields_tpu.models.fbrs import hrnet

    net = _torch_hrnet(small=small)
    cfg = hrnet.HrnetConfig(width=6, ocr_width=8, small=small)
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = hrnet.convert_torch_state_dict(sd, cfg)

    rs = np.random.RandomState(1)
    x = rs.randn(2, 48, 64, 3).astype(np.float32)
    with torch.no_grad():
        out_t, aux_t = net(torch.from_numpy(x).permute(0, 3, 1, 2))
    out_j, aux_j = hrnet.forward(params, cfg, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out_j)[..., 0], out_t.numpy()[:, 0], atol=2e-4,
        err_msg="OCR cls logits diverge from the reference net",
    )
    np.testing.assert_allclose(
        np.asarray(aux_j)[..., 0], aux_t.numpy()[:, 0], atol=2e-4,
    )


def test_resize_bilinear_ac_matches_torch(ref_interact):
    import torch
    import torch.nn.functional as F

    from d3fields_tpu.models.fbrs.hrnet import resize_bilinear_ac

    rs = np.random.RandomState(0)
    for (h, w), (H, W) in [((6, 8), (24, 32)), ((5, 7), (13, 29)),
                           ((12, 16), (5, 9))]:
        x = rs.randn(2, h, w, 3).astype(np.float32)
        ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                            size=(H, W), mode="bilinear", align_corners=True)
        got = resize_bilinear_ac(jnp.asarray(x), (H, W))
        np.testing.assert_allclose(np.asarray(got),
                                   ref.permute(0, 2, 3, 1).numpy(), atol=1e-5)


# ---------------------------------------------------------------------------
# fbrs predictor / controller
# ---------------------------------------------------------------------------

def _small_fbrs(seed=11):
    """Torch fbrs model + converted JAX params (width 6, norm_radius 20)."""
    import torch

    from inference.interact.fbrs.model.is_hrnet_model import get_hrnet_model
    from d3fields_tpu.models.fbrs import model as fmod

    torch.manual_seed(seed)
    net = get_hrnet_model(width=6, ocr_width=8, small=True,
                          with_aux_output=False, cpu_dist_maps=False,
                          norm_radius=20)
    net.eval()
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, cfg = fmod.convert_torch_state_dict(sd)
    return net, params, fmod.FbrsConfig(backbone=cfg.backbone,
                                        norm_radius=20.0)


@pytest.mark.slow
def test_nobrs_click_pipeline_parity(ref_interact):
    """The deterministic (no-optimization) click pipeline — click tensor
    layout, horizontal-flip TTA with logit averaging, zoom-in crop with
    click remapping and paste-back — matches the reference BasePredictor
    click-for-click over a 4-click sequence (predictors/base.py,
    transforms/zoom_in.py, transforms/flip.py). This pins every
    transform's geometry; the BRS optimizer on top is covered by
    behavior tests (its L-BFGS trajectory is floating-point-path
    specific)."""
    import torch

    from inference.interact.fbrs.inference import clicker as ref_clicker
    from inference.interact.fbrs.inference.predictors import get_predictor
    from d3fields_tpu.models.fbrs.predictor import (
        Click, Clicker, FbrsPredictor, ZoomIn,
    )

    net, params, cfg = _small_fbrs()
    ref_pred = get_predictor(
        net, "NoBRS", device="cpu", with_flip=True,
        zoom_in_params={"skip_clicks": 1, "target_size": 48,
                        "expansion_ratio": 1.4, "min_crop_size": 20},
        predictor_params={"max_size": 800},
    )
    pred = FbrsPredictor(
        params, cfg, brs=False, with_flip=True,
        zoom_in=ZoomIn(target_size=48, skip_clicks=1, expansion_ratio=1.4,
                       min_crop_size=20),
    )

    rs = np.random.RandomState(8)
    img = rs.rand(64, 80, 3).astype(np.float32)
    ref_pred.set_input_image(torch.from_numpy(img.transpose(2, 0, 1)))
    pred.set_input_image(img)

    rc = ref_clicker.Clicker()
    jc = Clicker()
    seq = [(True, (20.0, 30.0)), (True, (28.0, 44.0)),
           (False, (50.0, 70.0)), (True, (24.0, 36.0))]
    for i, (is_pos, (y, x)) in enumerate(seq):
        rc.add_click(ref_clicker.Click(is_positive=is_pos, coords=(y, x)))
        jc.add_click(Click(is_pos, (y, x)))
        with torch.no_grad():
            # BasePredictor.get_prediction already applies SigmoidForPred
            ref = ref_pred.get_prediction(rc)
        got = pred.get_prediction(jc)
        np.testing.assert_allclose(
            got, ref.numpy()[0, 0], atol=5e-4,
            err_msg=f"click pipeline diverged at click {i}",
        )


def test_fbrs_controller_brs_behavior(ref_interact):
    """The f-BRS-B optimization must do its job regardless of weights:
    relative to the unoptimized (NoBRS) prediction with the same clicks,
    the scale/bias refinement pushes the clicked pixels toward their
    click labels (brs_losses.py:11-20), and undo restores the exact
    previous state (controller.py:29-55)."""
    from d3fields_tpu.models.fbrs.predictor import (
        Click, Clicker, FBRSController, FbrsPredictor,
    )

    _, params, cfg = _small_fbrs(seed=13)
    ctl = FBRSController(params, cfg, target_size=48)
    rs = np.random.RandomState(9)
    img = rs.rand(64, 80, 3).astype(np.float32)

    m1 = ctl.interact(img, x=30, y=20, is_positive=True)
    assert m1.shape == (64, 80)
    m2 = ctl.interact(img, x=60, y=45, is_positive=False)
    p2 = ctl.probs_history[-1]
    assert p2[20, 30] > 0.5, "positive click not honored after BRS"

    # unoptimized baseline: same clicks, no BRS, no zoom (full-frame probs
    # so both clicked pixels are comparable)
    plain = FbrsPredictor(params, cfg, brs=False, with_flip=True,
                          zoom_in=None)
    plain.set_input_image(img)
    jc = Clicker()
    jc.add_click(Click(True, (20.0, 30.0)))
    jc.add_click(Click(False, (45.0, 60.0)))
    p_plain = plain.get_prediction(jc)
    assert p2[45, 60] < p_plain[45, 60], (
        "BRS did not move the negative click toward background "
        f"({p2[45, 60]:.3f} vs unoptimized {p_plain[45, 60]:.3f})"
    )

    m_undo = ctl.undo()
    np.testing.assert_array_equal(m_undo, m1)
    m2_again = ctl.interact(img, x=60, y=45, is_positive=False)
    np.testing.assert_array_equal(m2_again, m2)


# ---------------------------------------------------------------------------
# S2M (scribble-to-mask)
# ---------------------------------------------------------------------------

def _torch_s2m(seed=5):
    import torch

    from inference.interact.s2m.s2m_network import deeplabv3plus_resnet50

    torch.manual_seed(seed)
    net = deeplabv3plus_resnet50(num_classes=1, output_stride=16,
                                 pretrained_backbone=False)
    net.eval()
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)
    return net


@pytest.mark.slow
def test_s2m_forward_parity(ref_interact):
    """DeepLabV3+ over the 6-channel ResNet-50 (dilated layer4, ASPP with
    global-pool branch, low-level projection) matches the reference net —
    s2m_network.py:7-56, _deeplab.py:30-62, s2m_resnet.py:70-170."""
    import torch

    from d3fields_tpu.models.s2m import model as s2

    net = _torch_s2m()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = s2.convert_torch_state_dict(sd)

    rs = np.random.RandomState(4)
    x = rs.randn(1, 64, 96, 6).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x).permute(0, 3, 1, 2))
    got = s2.forward(params, s2.S2mConfig(), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got)[..., 0], ref.numpy()[:, 0],
                               atol=3e-4)


@pytest.mark.slow
def test_s2m_controller_parity(ref_interact):
    """Full scribble interaction (per-object channel encoding, pad/unpad,
    sigmoid) vs the reference S2MController — s2m_controller.py:8-38. The
    reference loops objects; ours batches them in one forward."""
    import torch

    from inference.interact.s2m_controller import S2MController as RefCtl
    from d3fields_tpu.models.s2m import S2MController, convert_torch_state_dict

    net = _torch_s2m(seed=7)
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    ctl = S2MController(convert_torch_state_dict(sd), num_objects=2)

    rs = np.random.RandomState(6)
    img = rs.rand(56, 72, 3).astype(np.float32)
    prev = np.zeros((56, 72), np.uint8)
    prev[10:30, 20:40] = 1
    scr = np.full((56, 72), 255, np.uint8)
    scr[12:18, 22:30] = 1   # positive scribble for object 1
    scr[40:46, 50:60] = 2   # object 2 enters by scribble
    scr[5:8, 5:10] = 0      # background correction

    ref_ctl = RefCtl(net, num_objects=2, ignore_class=255, device="cpu")
    with torch.no_grad():
        ref = ref_ctl.interact(
            torch.from_numpy(img.transpose(2, 0, 1)).unsqueeze(0),
            torch.from_numpy(prev.astype(np.float32)), scr,
        )
    got = ctl.interact(img, prev, scr)
    np.testing.assert_allclose(got, ref.numpy(), atol=3e-4)


def test_fbrs_model_forward_parity(ref_interact):
    """Full DistMapsHRNetModel (click dist-maps + rgb_conv + backbone +
    align-corners upsample) vs the reference — is_hrnet_model.py:24-67,
    ops.py:39-85."""
    import torch

    from inference.interact.fbrs.model.is_hrnet_model import get_hrnet_model
    from d3fields_tpu.models.fbrs import model as fm

    torch.manual_seed(3)
    net = get_hrnet_model(width=6, ocr_width=8, small=True,
                          with_aux_output=False, cpu_dist_maps=False,
                          norm_radius=20)
    net.eval()
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)

    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, cfg = fm.convert_torch_state_dict(sd)
    assert cfg.backbone.width == 6 and cfg.backbone.ocr_width == 8
    assert cfg.backbone.small
    cfg = fm.FbrsConfig(backbone=cfg.backbone, norm_radius=20.0)

    rs = np.random.RandomState(2)
    img = rs.randn(1, 48, 64, 3).astype(np.float32)
    pts = np.array([[[10.0, 20.0], [30.0, 50.0], [-1.0, -1.0],
                     [25.0, 12.0], [-1.0, -1.0], [-1.0, -1.0]]], np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(img).permute(0, 3, 1, 2),
                  torch.from_numpy(pts))["instances"]
    got = fm.forward(params, cfg, jnp.asarray(img), jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(got)[..., 0], ref.numpy()[:, 0],
                               atol=2e-4)


@pytest.mark.slow
def test_convert_family_s2m_fbrs_audited(ref_interact):
    """The audited conversion registry covers the interactive models:
    convert_family consumes every checkpoint tensor (BN step counters
    allow-listed) and returns a working (params, cfg) pair."""
    from d3fields_tpu.utils.convert import convert_family

    net, _, _ = _small_fbrs(seed=21)
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, cfg = convert_family("fbrs", sd)
    assert cfg.backbone.width == 6 and cfg.backbone.ocr_width == 8

    s2m_net = _torch_s2m(seed=22)
    sd = {k: v.detach().numpy() for k, v in s2m_net.state_dict().items()}
    params, cfg = convert_family("s2m", sd)
    assert cfg.num_classes == 1
