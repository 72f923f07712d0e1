"""Checkpoint-conversion audit: key coverage, on-disk pytrees, hub format.

The reference consumes torch checkpoints at runtime
(``fusion.py:223,235-262``; ``XMem/model/network.py:134-198``); our
conversion layer must provably consume every checkpoint tensor (or
explicitly allow-list it) so a typo'd key pattern cannot silently drop
weights. These tests run ungated at tiny configs; the real-checkpoint
counterparts live in ``test_real_ckpts.py``.
"""

import numpy as np
import pytest
import torch

import jax

from d3fields_tpu.utils.convert import (
    ALLOWED_UNUSED, TrackedStateDict, audit_conversion, convert_family,
    load_params, save_params,
)


# ---------------------------------------------------------------------------
# audit machinery
# ---------------------------------------------------------------------------

def test_audit_flags_dropped_tensor():
    sd = {"a.weight": np.ones(3), "a.bias": np.zeros(3), "b.weight": np.ones(2)}

    def bad_convert(s):
        return {"a": {"w": s["a.weight"], "b": s["a.bias"]}}  # drops b.weight

    with pytest.raises(ValueError, match="b.weight"):
        audit_conversion(bad_convert, sd)


def test_audit_allowlist_and_missing_key():
    sd = {"a.weight": np.ones(3), "num_batches_tracked": np.asarray(7)}

    def convert(s):
        return {"w": s["a.weight"]}

    params, allowed = audit_conversion(
        convert, sd, allowed_unused=[r"num_batches_tracked"]
    )
    assert allowed == {"num_batches_tracked"}

    with pytest.raises(KeyError):
        audit_conversion(lambda s: {"w": s["missing.key"]}, sd)


def test_tracked_contains_does_not_consume():
    sd = TrackedStateDict({"k": np.ones(1)})
    assert "k" in sd
    assert sd.unconsumed() == {"k"}
    _ = sd["k"]
    assert sd.unconsumed() == set()


def test_save_load_roundtrip(tmp_path):
    tree = {
        "enc": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "layers": [
            {"a": np.ones((2, 2), np.float32)},
            {"a": np.zeros((2, 2), np.float32)},
        ],
        "scale": np.asarray(2.5, np.float32),
    }
    path = str(tmp_path / "p.npz")
    save_params(path, tree, meta={"family": "test"})
    loaded, meta = load_params(path)
    assert meta == {"family": "test"}
    jax.tree.map(np.testing.assert_array_equal, tree, loaded)


# ---------------------------------------------------------------------------
# every converter consumes every oracle-model tensor (tiny configs)
# ---------------------------------------------------------------------------

def _tiny_dinov2_hf():
    from transformers import Dinov2Config as HFConfig, Dinov2Model

    from d3fields_tpu.models import dinov2 as d2

    torch.manual_seed(0)
    model = Dinov2Model(
        HFConfig(hidden_size=64, num_hidden_layers=3, num_attention_heads=4,
                 intermediate_size=256, patch_size=14, image_size=56,
                 layerscale_value=0.5)
    ).eval()
    cfg = d2.Dinov2Config(hidden_size=64, num_layers=3, num_heads=4,
                          patch_size=14, image_size=56, layerscale_init=0.5)
    return "dinov2_hf", model.state_dict(), cfg


def _tiny_sam():
    from transformers import (
        SamConfig, SamMaskDecoderConfig, SamModel, SamPromptEncoderConfig,
        SamVisionConfig,
    )

    from d3fields_tpu.models.sam import model as S

    torch.manual_seed(0)
    hf = SamModel(SamConfig(
        vision_config=SamVisionConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            image_size=64, patch_size=8, output_channels=16, window_size=14,
            global_attn_indexes=[1], num_pos_feats=8, mlp_ratio=4),
        prompt_encoder_config=SamPromptEncoderConfig(
            hidden_size=16, image_embedding_size=8, image_size=64, patch_size=8),
        mask_decoder_config=SamMaskDecoderConfig(
            hidden_size=16, num_attention_heads=2, mlp_dim=64,
            iou_head_hidden_dim=16),
    )).eval()
    cfg = S.SamConfig(hidden_size=32, num_layers=2, num_heads=2, mlp_dim=128,
                      patch_size=8, image_size=64, window_size=14,
                      global_attn_indexes=(1,), output_channels=16,
                      prompt_hidden=16, decoder_heads=2, decoder_mlp_dim=64,
                      iou_head_hidden=16)
    return "sam", hf.state_dict(), cfg


def _tiny_gdino():
    from transformers import (
        BertConfig as HFBert, GroundingDinoConfig as HFGDC,
        GroundingDinoForObjectDetection, SwinConfig as HFSwin,
    )

    from d3fields_tpu.models.groundingdino import model as G

    torch.manual_seed(0)
    hf = GroundingDinoForObjectDetection(HFGDC(
        backbone_config=HFSwin(embed_dim=8, depths=[1, 1], num_heads=[2, 4],
                               window_size=4, image_size=64, patch_size=4,
                               out_features=["stage1", "stage2"]),
        text_config=HFBert(vocab_size=2000, hidden_size=24,
                           num_hidden_layers=2, num_attention_heads=2,
                           intermediate_size=48, max_position_embeddings=64),
        d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, num_queries=16,
        max_text_len=32, num_feature_levels=3,
    )).eval()
    return "gdino", hf.state_dict(), G.GroundingDinoConfig.tiny_test()


@pytest.mark.parametrize("make", [_tiny_dinov2_hf, _tiny_sam, _tiny_gdino],
                         ids=["dinov2_hf", "sam", "gdino"])
@pytest.mark.slow
def test_converter_consumes_all_oracle_keys(make):
    family, sd, cfg = make()
    sd = {k: v.detach().numpy() for k, v in sd.items()}
    params, _ = convert_family(family, sd, cfg)
    assert params  # conversion produced a tree; audit raised on any gap


def test_xmem_converter_consumes_all_oracle_keys():
    import os
    import sys

    if not os.path.isdir("/root/reference"):
        pytest.skip("reference tree unavailable")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from XMem.model import resnet as ref_resnet

    orig18, orig50 = ref_resnet.resnet18, ref_resnet.resnet50
    ref_resnet.resnet18 = lambda pretrained=True, extra_dim=0: ref_resnet.ResNet(
        ref_resnet.BasicBlock, [2, 2, 2, 2], extra_dim)
    ref_resnet.resnet50 = lambda pretrained=True, extra_dim=0: ref_resnet.ResNet(
        ref_resnet.Bottleneck, [3, 4, 6, 3], extra_dim)
    try:
        from XMem.model.network import XMem as RefXMem

        torch.manual_seed(0)
        net = RefXMem({"key_dim": 64, "value_dim": 512, "hidden_dim": 64}).eval()
    finally:
        ref_resnet.resnet18, ref_resnet.resnet50 = orig18, orig50

    from d3fields_tpu.config import XMemConfig

    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, _ = convert_family(
        "xmem", sd, XMemConfig(key_dim=64, value_dim=512, hidden_dim=64)
    )
    assert params


# ---------------------------------------------------------------------------
# hub-format conversion: validated against the HF torch oracle through the
# hub->HF re-keying (no torch-hub network access needed)
# ---------------------------------------------------------------------------

def _random_hub_sd(cfg, seed=0):
    """A random state dict in torch-hub DINOv2 key layout."""
    rs = np.random.RandomState(seed)
    D, L, M, P, G = (cfg.hidden_size, cfg.num_layers,
                     cfg.mlp_ratio * cfg.hidden_size, cfg.patch_size,
                     cfg.pos_grid)
    r = lambda *s: rs.randn(*s).astype(np.float32) * 0.05
    sd = {
        "cls_token": r(1, 1, D),
        "mask_token": r(1, D),
        "pos_embed": r(1, 1 + G * G, D),
        "patch_embed.proj.weight": r(D, 3, P, P),
        "patch_embed.proj.bias": r(D),
        "norm.weight": 1 + r(D),
        "norm.bias": r(D),
    }
    for i in range(L):
        sd.update({
            f"blocks.{i}.norm1.weight": 1 + r(D),
            f"blocks.{i}.norm1.bias": r(D),
            f"blocks.{i}.attn.qkv.weight": r(3 * D, D),
            f"blocks.{i}.attn.qkv.bias": r(3 * D),
            f"blocks.{i}.attn.proj.weight": r(D, D),
            f"blocks.{i}.attn.proj.bias": r(D),
            f"blocks.{i}.ls1.gamma": 0.5 + r(D),
            f"blocks.{i}.norm2.weight": 1 + r(D),
            f"blocks.{i}.norm2.bias": r(D),
            f"blocks.{i}.mlp.fc1.weight": r(M, D),
            f"blocks.{i}.mlp.fc1.bias": r(M),
            f"blocks.{i}.mlp.fc2.weight": r(D, M),
            f"blocks.{i}.mlp.fc2.bias": r(D),
            f"blocks.{i}.ls2.gamma": 0.5 + r(D),
        })
    return sd


def test_hub_conversion_matches_hf_torch_oracle():
    """convert_hub_state_dict == (hub->HF re-key) -> convert_hf_state_dict,
    and the resulting params match a torch Dinov2Model loaded with the
    re-keyed weights — full hub-path parity without torch hub."""
    from transformers import Dinov2Config as HFConfig, Dinov2Model

    import jax.numpy as jnp

    from d3fields_tpu.models import dinov2 as d2

    cfg = d2.Dinov2Config(hidden_size=64, num_layers=2, num_heads=4,
                          patch_size=14, image_size=56, layerscale_init=0.5)
    hub_sd = _random_hub_sd(cfg)
    params_hub, _ = convert_family("dinov2_hub", hub_sd, cfg)
    hf_sd = d2.hub_sd_to_hf_sd(hub_sd, cfg)
    params_hf, _ = convert_family("dinov2_hf", hf_sd, cfg)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params_hub, params_hf,
    )

    model = Dinov2Model(HFConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=256, patch_size=14, image_size=56,
        layerscale_value=0.5)).eval()
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in hf_sd.items()},
        strict=False,
    )
    assert not unexpected, unexpected
    assert all("pooler" in k for k in missing), missing

    rs = np.random.RandomState(1)
    img = rs.rand(1, 56, 56, 3).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(img).permute(0, 3, 1, 2)
                    ).last_hidden_state.numpy()
    pos = d2.Dinov2Backbone(params_hub, cfg,
                            pos_interpolate="hf").interpolated_pos_embed(4, 4)
    ours = np.asarray(d2.forward_tokens(params_hub, jnp.asarray(img), pos,
                                        cfg.num_heads))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_allowed_unused_registry_has_reasons():
    # every family present; patterns compile
    import re

    assert set(ALLOWED_UNUSED) == {"dinov2_hub", "dinov2_hf", "sam", "gdino",
                                   "xmem", "s2m", "fbrs"}
    for pats in ALLOWED_UNUSED.values():
        for p in pats:
            re.compile(p)


def test_gdino_npz_selects_trunk(tmp_path):
    """The backend loader sniffs a gdino .npz's trunk from the params
    pytree itself (patch-embed width), so swin-b checkpoints — and plain
    ``save_params`` files without the convert_ckpts meta — work without
    manual configuration; unsniffable pytrees raise actionably."""
    import pytest

    from d3fields_tpu.apps._backends import _load_family_params

    for trunk, embed in [("swin_b", 128), ("swin_t", 96)]:
        path = str(tmp_path / f"gdino_{trunk}.npz")
        tree = {"swin": {"patch_w": np.ones((48, embed), np.float32)}}
        save_params(path, tree, meta={"family": "gdino"})
        params, cfg = _load_family_params(path, "gdino", None)
        assert cfg.swin.embed_dim == embed
        assert params["swin"]["patch_w"].shape == (48, embed)

    bad = str(tmp_path / "gdino_bad.npz")
    save_params(bad, {"stub": np.ones(2, np.float32)}, meta={})
    with pytest.raises(ValueError, match="cannot sniff"):
        _load_family_params(bad, "gdino", None)

    wide = str(tmp_path / "gdino_wide.npz")
    save_params(wide, {"swin": {"patch_w": np.ones((48, 192), np.float32)}},
                meta={})
    with pytest.raises(ValueError, match="unsupported GroundingDINO trunk"):
        _load_family_params(wide, "gdino", None)


def test_sam_npz_selects_variant(tmp_path):
    """The backend loader sniffs a SAM .npz's encoder variant (vit-b/l/h)
    from the patch-embed width in the params pytree."""
    import pytest

    from d3fields_tpu.apps._backends import _load_family_params

    for hidden in (768, 1024, 1280):
        path = str(tmp_path / f"sam_{hidden}.npz")
        save_params(
            path,
            {"vision": {"patch_w": np.ones((768, hidden), np.float32)}},
            meta={"family": "sam"})
        _, cfg = _load_family_params(path, "sam", None)
        assert cfg.hidden_size == hidden

    bad = str(tmp_path / "sam_bad.npz")
    save_params(bad, {"stub": np.ones(2, np.float32)}, meta={})
    with pytest.raises(ValueError, match="cannot sniff"):
        _load_family_params(bad, "sam", None)
