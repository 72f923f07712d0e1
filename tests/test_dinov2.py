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
