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
