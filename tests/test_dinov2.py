"""DINOv2 JAX port parity vs a random-weight huggingface torch Dinov2Model.

No checkpoints needed: the torch model is instantiated with random weights,
its state dict converted, and outputs compared (the same procedure used to
adopt real pretrained weights).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from d3fields_tpu.models import dinov2 as d2
from d3fields_tpu.models.resize import cubic_resize_np


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import Dinov2Config as HFConfig, Dinov2Model

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=256,
        patch_size=14,
        image_size=56,
        layerscale_value=0.5,
    )
    model = Dinov2Model(hf_cfg).eval()
    cfg = d2.Dinov2Config(
        hidden_size=64, num_layers=3, num_heads=4, patch_size=14, image_size=56,
        layerscale_init=0.5,
    )
    params = d2.convert_hf_state_dict(model.state_dict(), cfg)
    return model, params, cfg


def test_cubic_resize_matches_torch(rng):
    x = rng.standard_normal((7, 9, 5)).astype(np.float32)
    out = cubic_resize_np(x, (13, 4))
    ref = (
        torch.nn.functional.interpolate(
            torch.as_tensor(x).permute(2, 0, 1).unsqueeze(0),
            size=(13, 4),
            mode="bicubic",
            align_corners=False,
        )[0]
        .permute(1, 2, 0)
        .numpy()
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_forward_matches_hf_native_res(hf_pair, rng):
    model, params, cfg = hf_pair
    B, H, W = 2, 56, 56
    pixels = rng.standard_normal((B, H, W, 3)).astype(np.float32)

    with torch.no_grad():
        ref = model(torch.as_tensor(pixels).permute(0, 3, 1, 2)).last_hidden_state.numpy()

    pos = jnp.asarray(np.asarray(params["pos_embed"]))
    out = np.asarray(d2.forward_tokens(params, jnp.asarray(pixels), pos, cfg.num_heads))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-4)


def test_forward_matches_hf_interpolated_res(hf_pair, rng):
    model, params, cfg = hf_pair
    B, H, W = 1, 42, 70  # 3x5 patches -> forces pos-embed interpolation
    pixels = rng.standard_normal((B, H, W, 3)).astype(np.float32)

    with torch.no_grad():
        ref = model(torch.as_tensor(pixels).permute(0, 3, 1, 2)).last_hidden_state.numpy()

    backbone = d2.Dinov2Backbone(params, cfg, pos_interpolate="hf")
    pos = backbone.interpolated_pos_embed(H // 14, W // 14)
    out = np.asarray(d2.forward_tokens(params, jnp.asarray(pixels), pos, cfg.num_heads))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=3e-4)

    # cosine error budget on patch tokens (BASELINE.json: < 1e-3)
    a, b = out[:, 1:].reshape(-1, 64), ref[:, 1:].reshape(-1, 64)
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    assert (1 - cos).max() < 1e-3


def test_backbone_end_to_end(hf_pair, rng):
    _, params, cfg = hf_pair
    imgs = rng.integers(0, 255, size=(3, 40, 60, 3), dtype=np.uint8)
    backbone = d2.Dinov2Backbone(params, cfg)
    feats = backbone(imgs)  # patch_hw defaults to (4, 6)
    assert np.asarray(feats).shape == (3, 4, 6, 64)
    assert np.all(np.isfinite(np.asarray(feats)))


def test_bf16_cosine_budget(hf_pair, rng):
    _, params, cfg = hf_pair
    pixels = rng.standard_normal((1, 56, 56, 3)).astype(np.float32)
    pos = jnp.asarray(np.asarray(params["pos_embed"]))
    f32 = np.asarray(d2.forward_tokens(params, jnp.asarray(pixels), pos, cfg.num_heads))
    bf16 = np.asarray(
        d2.forward_tokens(params, jnp.asarray(pixels), pos, cfg.num_heads, "bfloat16")
    )
    a, b = f32[:, 1:].reshape(-1, 64), bf16[:, 1:].reshape(-1, 64)
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-12)
    assert (1 - cos).max() < 1e-3


def test_hub_state_dict_conversion(hf_pair, rng):
    """Hub-layout conversion must agree with HF-layout conversion when fed
    the same underlying tensors."""
    model, params, cfg = hf_pair
    sd = model.state_dict()
    hub_sd = {
        "cls_token": sd["embeddings.cls_token"],
        "pos_embed": sd["embeddings.position_embeddings"],
        "patch_embed.proj.weight": sd["embeddings.patch_embeddings.projection.weight"],
        "patch_embed.proj.bias": sd["embeddings.patch_embeddings.projection.bias"],
        "norm.weight": sd["layernorm.weight"],
        "norm.bias": sd["layernorm.bias"],
    }
    for i in range(cfg.num_layers):
        pre = f"encoder.layer.{i}"
        hub_sd[f"blocks.{i}.norm1.weight"] = sd[f"{pre}.norm1.weight"]
        hub_sd[f"blocks.{i}.norm1.bias"] = sd[f"{pre}.norm1.bias"]
        hub_sd[f"blocks.{i}.attn.qkv.weight"] = torch.cat(
            [sd[f"{pre}.attention.attention.{n}.weight"] for n in ("query", "key", "value")], 0
        )
        hub_sd[f"blocks.{i}.attn.qkv.bias"] = torch.cat(
            [sd[f"{pre}.attention.attention.{n}.bias"] for n in ("query", "key", "value")], 0
        )
        hub_sd[f"blocks.{i}.attn.proj.weight"] = sd[f"{pre}.attention.output.dense.weight"]
        hub_sd[f"blocks.{i}.attn.proj.bias"] = sd[f"{pre}.attention.output.dense.bias"]
        hub_sd[f"blocks.{i}.ls1.gamma"] = sd[f"{pre}.layer_scale1.lambda1"]
        hub_sd[f"blocks.{i}.ls2.gamma"] = sd[f"{pre}.layer_scale2.lambda1"]
        hub_sd[f"blocks.{i}.norm2.weight"] = sd[f"{pre}.norm2.weight"]
        hub_sd[f"blocks.{i}.norm2.bias"] = sd[f"{pre}.norm2.bias"]
        hub_sd[f"blocks.{i}.mlp.fc1.weight"] = sd[f"{pre}.mlp.fc1.weight"]
        hub_sd[f"blocks.{i}.mlp.fc1.bias"] = sd[f"{pre}.mlp.fc1.bias"]
        hub_sd[f"blocks.{i}.mlp.fc2.weight"] = sd[f"{pre}.mlp.fc2.weight"]
        hub_sd[f"blocks.{i}.mlp.fc2.bias"] = sd[f"{pre}.mlp.fc2.bias"]

    params_hub = d2.convert_hub_state_dict(hub_sd, cfg)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(params[k]), np.asarray(params_hub[k]), atol=1e-6, err_msg=k
        )


def test_pil_resize_bit_exact_vs_pillow(rng):
    """Our host resampler is BIT-identical to Pillow's 8bpc bilinear — the
    resampler behind the reference's ``T.Resize`` on a PIL image
    (``fusion.py:603-607``): down, up, identity, odd ratios."""
    from PIL import Image

    from d3fields_tpu.models.resize import _pil_bilinear_resize_u8_np

    for (H, W), (h, w) in [((480, 640), (112, 140)), ((48, 64), (112, 140)),
                           ((100, 100), (100, 100)), ((37, 53), (14, 28)),
                           ((240, 320), (238, 322))]:
        img = rng.integers(0, 256, size=(H, W, 3), dtype=np.uint8)
        ref = np.asarray(Image.fromarray(img).resize((w, h), Image.BILINEAR))
        ours = _pil_bilinear_resize_u8_np(img, (h, w))
        np.testing.assert_array_equal(ours, ref, err_msg=f"{(H, W)}->{(h, w)}")


def test_preprocess_parity_vs_torchvision_composition(hf_pair, rng):
    """End-to-end preprocessing parity: identical uint8 images through the
    reference's exact composition (T.Resize(PIL) + CenterCrop + ToTensor +
    Normalize + model, ``fusion.py:603-611``) and through our backbone in
    the default 'pil' resize mode must agree within the descriptor budget;
    the 'device' resize mode is also quantified against the same oracle."""
    from PIL import Image

    model, params, cfg = hf_pair
    ph, pw = 4, 6
    imgs = rng.integers(0, 256, size=(2, 120, 164, 3), dtype=np.uint8)

    # the reference composition, spelled out (torchvision isn't in this
    # image): T.Resize((h,w)) on PIL == Image.resize((w,h), BILINEAR);
    # CenterCrop at the same size is the identity; ToTensor is /255 CHW;
    # then ImageNet Normalize.
    def transform(im):
        r = np.asarray(Image.fromarray(im).resize((pw * 14, ph * 14),
                                                  Image.BILINEAR))
        t = torch.from_numpy(r.astype(np.float32) / 255.0).permute(2, 0, 1)
        mean = torch.tensor([0.485, 0.456, 0.406]).view(3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(3, 1, 1)
        return (t - mean) / std

    batch = torch.stack([transform(im) for im in imgs])
    with torch.no_grad():
        ref = model(batch).last_hidden_state.numpy()[:, 1:]
    ref = ref.reshape(2, ph, pw, -1)

    def worst_cos(a, b):
        a, b = a.reshape(-1, a.shape[-1]), b.reshape(-1, b.shape[-1])
        cos = (a * b).sum(-1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-12)
        return (1 - cos).max()

    pil_backbone = d2.Dinov2Backbone(params, cfg, pos_interpolate="hf",
                                     resize_mode="pil")
    ours_pil = np.asarray(pil_backbone(imgs, (ph, pw)))
    # resize now bit-identical -> only model-parity noise remains
    assert worst_cos(ours_pil, ref) < 1e-5

    dev_backbone = d2.Dinov2Backbone(params, cfg, pos_interpolate="hf",
                                     resize_mode="device")
    ours_dev = np.asarray(dev_backbone(imgs, (ph, pw)))
    # float triangle filter vs PIL fixed point: measured deviation must
    # still clear the <1e-3 descriptor-cosine budget (BASELINE.json)
    assert worst_cos(ours_dev, ref) < 1e-3
