"""Swin Transformer backbone in pure JAX (GroundingDINO's vision trunk).

Weight format follows the huggingface ``SwinBackbone`` inside
``GroundingDinoModel`` (``model.backbone.conv_encoder.model.*``). Semantics
mirror HF Swin with ``always_partition=True`` (the backbone mode): windows
are padded, shifted windows use the precomputed region mask, and the
per-out-stage feature maps are layer-normed before return.

TPU notes: window partitioning is pure reshapes; the relative-position bias
gather indices are numpy constants; all shapes are static for a fixed input
size, so the whole backbone jits once.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    patch_size: int = 4
    out_stages: Tuple[int, ...] = (1, 2, 3)  # 0-based: stage2, stage3, stage4

    @staticmethod
    def tiny() -> "SwinConfig":
        return SwinConfig()

    @staticmethod
    def base() -> "SwinConfig":
        """Swin-B/384-w12 — the trunk of groundingdino_swinb_cogcoor, the
        second checkpoint the reference downloads
        (``scripts/download_ckpts.sh:5``; HF grounding-dino-base)."""
        return SwinConfig(embed_dim=128, depths=(2, 2, 18, 2),
                          num_heads=(4, 8, 16, 32), window_size=12)

    def stage_dim(self, i: int) -> int:
        return self.embed_dim * (2 ** i)


def _layer_norm(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def _rel_bias(p_table: Array, window: int, num_heads: int) -> Array:
    """(ws*ws, ws*ws, heads) bias from the (2w-1)^2 table (constant index)."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    idx = (rel[0] + window - 1) * (2 * window - 1) + (rel[1] + window - 1)
    return p_table[idx]  # (ws^2, ws^2, H)


def _shift_mask(Hp: int, Wp: int, window: int, shift: int) -> np.ndarray:
    """Region mask for shifted windows (HF ``get_attn_mask``): (nw, T, T)
    additive with -100 across region boundaries."""
    img = np.zeros((Hp, Wp), np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws_ in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws_] = cnt
            cnt += 1
    win = img.reshape(Hp // window, window, Wp // window, window)
    win = win.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _window_attention(x: Array, p: Dict, num_heads: int, window: int,
                      mask: Array | None) -> Array:
    """x (B, nw, T, C) windows; mask (nw, T, T) additive or None."""
    B, nw, T, C = x.shape
    hd = C // num_heads

    def proj(name):
        v = x @ p[name + "_w"] + p[name + "_b"]
        return v.reshape(B, nw, T, num_heads, hd).transpose(0, 1, 3, 2, 4)

    q, k, v = proj("q"), proj("k"), proj("v")
    logits = (q @ k.transpose(0, 1, 2, 4, 3)) / np.sqrt(hd)
    bias = _rel_bias(p["rel_table"], window, num_heads)  # (T, T, H)
    logits = logits + bias.transpose(2, 0, 1)[None, None]
    if mask is not None:
        logits = logits + mask[None, :, None]
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
    out = (probs @ v).transpose(0, 1, 3, 2, 4).reshape(B, nw, T, C)
    return out @ p["o_w"] + p["o_b"]


def _swin_block(x: Array, hw: Tuple[int, int], p: Dict, num_heads: int,
                window: int, shift: int) -> Array:
    """x (B, H*W, C). Pre-norm window attention + MLP."""
    H, W = hw
    B, _, C = x.shape
    shortcut = x
    h = _layer_norm(x, p["ln1_w"], p["ln1_b"]).reshape(B, H, W, C)

    ph, pw = (-H) % window, (-W) % window
    h = jnp.pad(h, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = H + ph, W + pw
    if shift > 0:
        h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
        mask = jnp.asarray(_shift_mask(Hp, Wp, window, shift))
    else:
        mask = None
    h = h.reshape(B, Hp // window, window, Wp // window, window, C)
    h = h.transpose(0, 1, 3, 2, 4, 5).reshape(B, -1, window * window, C)
    h = _window_attention(h, p, num_heads, window, mask)
    h = h.reshape(B, Hp // window, Wp // window, window, window, C)
    h = h.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    if shift > 0:
        h = jnp.roll(h, (shift, shift), axis=(1, 2))
    h = h[:, :H, :W].reshape(B, H * W, C)

    x = shortcut + h
    h = _layer_norm(x, p["ln2_w"], p["ln2_b"])
    h = jax.nn.gelu(h @ p["fc1_w"] + p["fc1_b"], approximate=False)
    return x + (h @ p["fc2_w"] + p["fc2_b"])


def _patch_merge(x: Array, hw: Tuple[int, int], p: Dict) -> Tuple[Array, Tuple[int, int]]:
    H, W = hw
    B, _, C = x.shape
    h = x.reshape(B, H, W, C)
    if H % 2 or W % 2:
        h = jnp.pad(h, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
    h = jnp.concatenate(
        [h[:, 0::2, 0::2], h[:, 1::2, 0::2], h[:, 0::2, 1::2], h[:, 1::2, 1::2]],
        axis=-1,
    )
    nh, nw = (H + 1) // 2, (W + 1) // 2
    h = h.reshape(B, nh * nw, 4 * C)
    h = _layer_norm(h, p["ln_w"], p["ln_b"])
    return h @ p["red_w"], (nh, nw)


def swin_backbone(params: Dict, pixels: Array, cfg: SwinConfig) -> List[Array]:
    """pixels (B, H, W, 3) -> list of NHWC feature maps at out_stages."""
    P = cfg.patch_size
    B, H, W, _ = pixels.shape
    pad_h, pad_w = (-H) % P, (-W) % P
    if pad_h or pad_w:
        pixels = jnp.pad(pixels, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        H, W = H + pad_h, W + pad_w
    gh, gw = H // P, W // P
    x = pixels.reshape(B, gh, P, gw, P, 3).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, gh * gw, P * P * 3) @ params["patch_w"] + params["patch_b"]
    x = _layer_norm(x, params["embed_ln_w"], params["embed_ln_b"])

    hw = (gh, gw)
    outs = []
    for si, stage in enumerate(params["stages"]):
        nh = cfg.num_heads[si]
        for bi, bp in enumerate(stage["blocks"]):
            shift = 0 if bi % 2 == 0 else cfg.window_size // 2
            x = _swin_block(x, hw, bp, nh, cfg.window_size, shift)
        if si in cfg.out_stages:
            C = cfg.stage_dim(si)
            normed = _layer_norm(
                x, params["out_norms"][si]["w"], params["out_norms"][si]["b"]
            )
            outs.append(normed.reshape(B, hw[0], hw[1], C))
        if "merge" in stage:
            x, hw = _patch_merge(x, hw, stage["merge"])
    return outs


# ---------------------------------------------------------------------------
# HF weight conversion (SwinBackbone state-dict layout)
# ---------------------------------------------------------------------------

def convert_hf_swin(sd: Dict[str, np.ndarray], cfg: SwinConfig,
                    prefix: str = "") -> Dict:
    """Convert ``SwinBackbone`` weights; ``prefix`` addresses the nesting
    inside a GroundingDino state dict."""
    g = lambda n: jnp.asarray(np.asarray(sd[prefix + n]))
    lin = lambda n: jnp.asarray(np.asarray(sd[prefix + n]).T)

    P = cfg.patch_size
    pw = np.asarray(sd[prefix + "embeddings.patch_embeddings.projection.weight"])
    stages = []
    for si, depth in enumerate(cfg.depths):
        blocks = []
        for bi in range(depth):
            pre = f"encoder.layers.{si}.blocks.{bi}"
            att = pre + ".attention.self"
            blocks.append({
                "ln1_w": g(pre + ".layernorm_before.weight"),
                "ln1_b": g(pre + ".layernorm_before.bias"),
                "q_w": lin(att + ".query.weight"), "q_b": g(att + ".query.bias"),
                "k_w": lin(att + ".key.weight"), "k_b": g(att + ".key.bias"),
                "v_w": lin(att + ".value.weight"), "v_b": g(att + ".value.bias"),
                "rel_table": g(att + ".relative_position_bias_table"),
                "o_w": lin(pre + ".attention.output.dense.weight"),
                "o_b": g(pre + ".attention.output.dense.bias"),
                "ln2_w": g(pre + ".layernorm_after.weight"),
                "ln2_b": g(pre + ".layernorm_after.bias"),
                "fc1_w": lin(pre + ".intermediate.dense.weight"),
                "fc1_b": g(pre + ".intermediate.dense.bias"),
                "fc2_w": lin(pre + ".output.dense.weight"),
                "fc2_b": g(pre + ".output.dense.bias"),
            })
        stage = {"blocks": blocks}
        if si < len(cfg.depths) - 1:
            pre = f"encoder.layers.{si}.downsample"
            stage["merge"] = {
                "ln_w": g(pre + ".norm.weight"), "ln_b": g(pre + ".norm.bias"),
                "red_w": lin(pre + ".reduction.weight"),
            }
        stages.append(stage)

    out_norms = {}
    for si in cfg.out_stages:
        pre = f"hidden_states_norms.stage{si + 1}"
        out_norms[si] = {"w": g(pre + ".weight"), "b": g(pre + ".bias")}

    return {
        "patch_w": jnp.asarray(pw.transpose(2, 3, 1, 0).reshape(P * P * 3, -1)),
        "patch_b": g("embeddings.patch_embeddings.projection.bias"),
        "embed_ln_w": g("embeddings.norm.weight"),
        "embed_ln_b": g("embeddings.norm.bias"),
        "stages": stages,
        "out_norms": out_norms,
    }
