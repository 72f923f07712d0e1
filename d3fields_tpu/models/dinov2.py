"""DINOv2 vision transformer in pure JAX.

The reference loads DINOv2 ViT-L/14 from torch hub and takes
``x_norm_patchtokens`` as the per-view descriptor map
(``fusion.py:593-629``). Here the model is reimplemented TPU-first:

- layers are stacked and driven by ``lax.scan`` (one compiled layer body,
  fast compiles, MXU-shaped matmuls);
- patch embedding is an unfold+matmul, not a conv (same math, direct MXU);
- positional embeddings are interpolated per target resolution on the host
  with torch-parity bicubic and cached;
- weights convert from either the torch-hub DINOv2 state dict or a
  huggingface ``Dinov2Model`` state dict (the latter doubles as a
  random-weight numerical oracle in tests).

Compute dtype is configurable; bf16 matmuls with f32 accumulation stay well
inside the <1e-3 descriptor-cosine budget (BASELINE.json).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from d3fields_tpu.models.resize import (
    bilinear_resize, cubic_resize_np, pil_bilinear_resize_u8,
)

Array = jax.Array

from d3fields_tpu.models.common import IMAGENET_MEAN, IMAGENET_STD  # noqa: F401 (re-export)

from d3fields_tpu.utils.convert import np_view


@dataclasses.dataclass(frozen=True)
class Dinov2Config:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_ratio: int = 4
    patch_size: int = 14
    layerscale_init: float = 1.0
    image_size: int = 518  # pretraining grid: (518/14)^2 = 37^2 positions

    @staticmethod
    def vit_large() -> "Dinov2Config":
        return Dinov2Config()

    @staticmethod
    def vit_base() -> "Dinov2Config":
        return Dinov2Config(hidden_size=768, num_layers=12, num_heads=12)

    @staticmethod
    def vit_small() -> "Dinov2Config":
        return Dinov2Config(hidden_size=384, num_layers=12, num_heads=6)

    @staticmethod
    def tiny_test() -> "Dinov2Config":
        """Small config for unit tests."""
        return Dinov2Config(hidden_size=64, num_layers=3, num_heads=4, image_size=56)

    @property
    def pos_grid(self) -> int:
        return self.image_size // self.patch_size


def init_params(rng: jax.Array, cfg: Dinov2Config) -> Dict[str, Array]:
    D = cfg.hidden_size
    L = cfg.num_layers
    M = cfg.mlp_ratio * D
    P = cfg.patch_size
    G = cfg.pos_grid
    keys = jax.random.split(rng, 8)

    def nrm(k, shape, scale=0.02):
        return jax.random.normal(k, shape, jnp.float32) * scale

    return {
        "cls_token": nrm(keys[0], (1, 1, D)),
        "pos_embed": nrm(keys[1], (1 + G * G, D)),
        "patch_w": nrm(keys[2], (P * P * 3, D)),
        "patch_b": jnp.zeros((D,)),
        "ln1_w": jnp.ones((L, D)), "ln1_b": jnp.zeros((L, D)),
        "qkv_w": nrm(keys[3], (L, D, 3 * D)), "qkv_b": jnp.zeros((L, 3 * D)),
        "proj_w": nrm(keys[4], (L, D, D)), "proj_b": jnp.zeros((L, D)),
        "ls1": jnp.full((L, D), cfg.layerscale_init),
        "ln2_w": jnp.ones((L, D)), "ln2_b": jnp.zeros((L, D)),
        "fc1_w": nrm(keys[5], (L, D, M)), "fc1_b": jnp.zeros((L, M)),
        "fc2_w": nrm(keys[6], (L, M, D)), "fc2_b": jnp.zeros((L, D)),
        "ls2": jnp.full((L, D), cfg.layerscale_init),
        "norm_w": jnp.ones((D,)), "norm_b": jnp.zeros((D,)),
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _layer_norm(x: Array, w: Array, b: Array, eps: float = 1e-6) -> Array:
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * w + b).astype(x.dtype)


def _attention(x: Array, p: Dict[str, Array], num_heads: int) -> Array:
    B, N, D = x.shape
    qkv = x @ p["qkv_w"] + p["qkv_b"]  # (B, N, 3D)
    qkv = qkv.reshape(B, N, 3, num_heads, D // num_heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, dh)
    scale = 1.0 / np.sqrt(D // num_heads)
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", probs, v).reshape(B, N, D)
    return out @ p["proj_w"] + p["proj_b"]


@functools.partial(jax.jit, static_argnames=("num_heads", "compute_dtype"))
def forward_tokens(
    params: Dict[str, Array],
    pixels: Array,
    pos_embed: Array,
    num_heads: int,
    compute_dtype: str = "float32",
) -> Array:
    """Run the transformer.

    Args:
      pixels: (B, H, W, 3) normalized images, H/W multiples of patch size.
      pos_embed: (1 + gh*gw, D) interpolated positional table.

    Returns: (B, 1 + gh*gw, D) final-layernorm tokens (cls first) — the
    torch-hub ``x_norm_*`` outputs.
    """
    dt = jnp.dtype(compute_dtype)
    B, H, W, _ = pixels.shape
    D = params["patch_b"].shape[0]
    P = int(np.sqrt(params["patch_w"].shape[0] // 3))
    gh, gw = H // P, W // P

    x = pixels.reshape(B, gh, P, gw, P, 3).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, gh * gw, P * P * 3).astype(dt)
    x = x @ params["patch_w"].astype(dt) + params["patch_b"].astype(dt)

    cls = jnp.broadcast_to(params["cls_token"].astype(dt), (B, 1, D))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + pos_embed[None].astype(dt)

    layer_params = {
        k: params[k].astype(dt)
        for k in (
            "ln1_w", "ln1_b", "qkv_w", "qkv_b", "proj_w", "proj_b", "ls1",
            "ln2_w", "ln2_b", "fc1_w", "fc1_b", "fc2_w", "fc2_b", "ls2",
        )
    }

    def body(x, p):
        h = _layer_norm(x, p["ln1_w"], p["ln1_b"])
        h = _attention(h, p, num_heads)
        x = x + p["ls1"] * h
        h = _layer_norm(x, p["ln2_w"], p["ln2_b"])
        h = jax.nn.gelu(h @ p["fc1_w"] + p["fc1_b"], approximate=False)
        h = h @ p["fc2_w"] + p["fc2_b"]
        x = x + p["ls2"] * h
        return x, None

    x, _ = jax.lax.scan(body, x, layer_params)
    x = _layer_norm(x, params["norm_w"].astype(dt), params["norm_b"].astype(dt))
    return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Backbone wrapper (pos-embed cache + preprocessing)
# ---------------------------------------------------------------------------

class Dinov2Backbone:
    """Feature backend: (K, H, W, 3) uint8 images -> (K, ph, pw, D) tokens.

    Matches ``Fusion.extract_dinov2_features`` (``fusion.py:593-629``):
    resize to (ph*14, pw*14), ImageNet-normalize, forward, reshape patch
    tokens to the (ph, pw) grid.
    """

    def __init__(self, params, cfg: Dinov2Config, compute_dtype: str = "float32",
                 pos_interpolate: str = "hub", resize_mode: str = "pil"):
        """``pos_interpolate``: 'hub' reproduces torch-hub DINOv2's
        scale-factor interpolation with interpolate_offset=0.1 (what the
        reference loads, ``fusion.py:223``); 'hf' is huggingface
        Dinov2Model's exact-size grid.

        ``resize_mode``: 'pil' (default) resizes on the host with the
        bit-exact Pillow 8bpc bilinear resampler the reference's
        ``T.Resize`` on a PIL image uses (``fusion.py:603-607``) — also
        shrinking the host->device upload to the target resolution;
        'device' resizes inside the fused jit with ``jax.image.resize``
        (float triangle filter — close but not bit-identical to PIL).
        """
        assert resize_mode in ("pil", "device")
        # Commit weights to device once: host-numpy leaves (npz-loaded
        # checkpoints) passed to a jitted forward are re-transferred per
        # call — ~1.2 GB/frame at ViT-L scale through the TPU tunnel.
        self.params = jax.device_put(params)
        self.cfg = cfg
        self.compute_dtype = compute_dtype
        self.pos_interpolate = pos_interpolate
        self.resize_mode = resize_mode
        self._pos_cache: Dict[Tuple[int, int], Array] = {}
        self._view_mesh = None

    def shard_views(self, mesh, axis: str = "dp") -> "Dinov2Backbone":
        """Scale multi-camera extraction across chips: params replicated,
        the view axis of each batch sharded over mesh ``axis`` (same
        contract as ``XMemCore.shard_views``). Each chip then runs the
        ViT forward for its own cameras with no collectives — the serving
        analogue of the reference's one-GPU per-frame loop
        (``fusion.py:593-629``). The mesh axis size must divide the view
        count; outputs keep the sharding (device-local until fetched)."""
        from d3fields_tpu.parallel.mesh import replicate

        self.params = replicate(mesh, self.params)
        self._pos_cache = {
            k: replicate(mesh, v) for k, v in self._pos_cache.items()
        }
        self._view_mesh = (mesh, axis)
        return self

    def interpolated_pos_embed(self, gh: int, gw: int) -> Array:
        key = (gh, gw)
        if key not in self._pos_cache:
            pe = np.asarray(self.params["pos_embed"], np.float32)
            G = int(np.sqrt(pe.shape[0] - 1))
            if (gh, gw) == (G, G):
                out = pe
            else:
                cls_pe, patch_pe = pe[:1], pe[1:].reshape(G, G, -1)
                if self.pos_interpolate == "hub":
                    # torch-hub DINOv2 interpolates with explicit scale
                    # factors (g + 0.1)/G (interpolate_offset=0.1,
                    # dinov2/models/vision_transformer.py) -- a different
                    # sampling grid than the plain size-ratio path
                    off = 0.1
                    scale_hw = ((gh + off) / G, (gw + off) / G)
                else:  # 'hf': huggingface Dinov2Model exact-size grid
                    scale_hw = None
                patch_pe = cubic_resize_np(
                    patch_pe, (gh, gw), scale_hw=scale_hw
                ).reshape(gh * gw, -1)
                out = np.concatenate([cls_pe, patch_pe], axis=0)
            pos = jnp.asarray(out)
            if self._view_mesh is not None:
                from d3fields_tpu.parallel.mesh import replicate

                pos = replicate(self._view_mesh[0], pos)
            self._pos_cache[key] = pos
        return self._pos_cache[key]

    def __call__(self, images: np.ndarray, patch_hw: Optional[Tuple[int, int]] = None) -> Array:
        K, H, W, _ = images.shape
        P = self.cfg.patch_size
        if patch_hw is None:
            patch_hw = (H // 10, W // 10)
        ph, pw = patch_hw
        pos = self.interpolated_pos_embed(ph, pw)
        if self.resize_mode == "pil" and np.asarray(images).dtype == np.uint8:
            images = pil_bilinear_resize_u8(np.asarray(images), (ph * P, pw * P))
        if self._view_mesh is not None:
            from d3fields_tpu.parallel.mesh import shard_leading_checked

            mesh, axis = self._view_mesh
            images = shard_leading_checked(mesh, images, axis)
        # ONE dispatch for upload + preprocess + forward: separate
        # resize/normalize ops each pay a host->device round trip (~20 ms
        # apiece through a remote-tunnel backend).
        return _extract_patch_features(
            self.params, jnp.asarray(images), pos, (ph * P, pw * P),
            self.cfg.num_heads, self.compute_dtype,
        )


@functools.partial(
    jax.jit, static_argnames=("resize_hw", "num_heads", "compute_dtype")
)
def _extract_patch_features(params, images_u8, pos_embed, resize_hw,
                            num_heads, compute_dtype):
    """uint8 (K, H, W, 3) -> (K, ph, pw, D) patch tokens, fully fused."""
    pixels = images_u8.astype(jnp.float32) / 255.0
    if pixels.shape[1:3] != resize_hw:  # pre-resized (pil mode): skip
        pixels = bilinear_resize(pixels, resize_hw)
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    pixels = (pixels - mean) / std
    tokens = forward_tokens(params, pixels, pos_embed, num_heads, compute_dtype)
    K = images_u8.shape[0]
    P = int(np.sqrt(params["patch_w"].shape[0] // 3))
    ph, pw = resize_hw[0] // P, resize_hw[1] // P
    return tokens[:, 1:].reshape(K, ph, pw, -1)


# ---------------------------------------------------------------------------
# Weight conversion
# ---------------------------------------------------------------------------

def _lin(sd, name):
    return np.asarray(sd[name]).T  # torch (out,in) -> (in,out)


def convert_hf_state_dict(sd, cfg: Dinov2Config) -> Dict[str, Array]:
    """Convert a huggingface ``Dinov2Model`` state dict."""
    sd = np_view(sd)
    L, D = cfg.num_layers, cfg.hidden_size
    P = cfg.patch_size

    def stack(fn):
        return jnp.asarray(np.stack([fn(i) for i in range(L)]))

    pw = sd["embeddings.patch_embeddings.projection.weight"]  # (D, 3, P, P)
    patch_w = pw.transpose(2, 3, 1, 0).reshape(P * P * 3, D)

    def qkv_w(i):
        pre = f"encoder.layer.{i}.attention.attention"
        return np.concatenate(
            [_lin(sd, f"{pre}.{n}.weight") for n in ("query", "key", "value")], axis=1
        )

    def qkv_b(i):
        pre = f"encoder.layer.{i}.attention.attention"
        return np.concatenate(
            [sd[f"{pre}.{n}.bias"] for n in ("query", "key", "value")], axis=0
        )

    return {
        "cls_token": jnp.asarray(sd["embeddings.cls_token"]),
        "pos_embed": jnp.asarray(sd["embeddings.position_embeddings"][0]),
        "patch_w": jnp.asarray(patch_w),
        "patch_b": jnp.asarray(sd["embeddings.patch_embeddings.projection.bias"]),
        "ln1_w": stack(lambda i: sd[f"encoder.layer.{i}.norm1.weight"]),
        "ln1_b": stack(lambda i: sd[f"encoder.layer.{i}.norm1.bias"]),
        "qkv_w": stack(qkv_w),
        "qkv_b": stack(qkv_b),
        "proj_w": stack(lambda i: _lin(sd, f"encoder.layer.{i}.attention.output.dense.weight")),
        "proj_b": stack(lambda i: sd[f"encoder.layer.{i}.attention.output.dense.bias"]),
        "ls1": stack(lambda i: sd[f"encoder.layer.{i}.layer_scale1.lambda1"]),
        "ln2_w": stack(lambda i: sd[f"encoder.layer.{i}.norm2.weight"]),
        "ln2_b": stack(lambda i: sd[f"encoder.layer.{i}.norm2.bias"]),
        "fc1_w": stack(lambda i: _lin(sd, f"encoder.layer.{i}.mlp.fc1.weight")),
        "fc1_b": stack(lambda i: sd[f"encoder.layer.{i}.mlp.fc1.bias"]),
        "fc2_w": stack(lambda i: _lin(sd, f"encoder.layer.{i}.mlp.fc2.weight")),
        "fc2_b": stack(lambda i: sd[f"encoder.layer.{i}.mlp.fc2.bias"]),
        "ls2": stack(lambda i: sd[f"encoder.layer.{i}.layer_scale2.lambda1"]),
        "norm_w": jnp.asarray(sd["layernorm.weight"]),
        "norm_b": jnp.asarray(sd["layernorm.bias"]),
    }


def hub_sd_to_hf_sd(sd, cfg: Dinov2Config) -> Dict[str, np.ndarray]:
    """Re-key a torch-hub DINOv2 state dict to huggingface ``Dinov2Model``
    layout (the two public distributions of the same weights).

    Used by the real-checkpoint test tier: a hub checkpoint mapped through
    this loads into ``transformers.Dinov2Model``, giving a torch oracle for
    the hub-format conversion path without torch-hub network access
    (the reference's download at ``fusion.py:223``).
    """
    sd = np_view(sd)
    L, D = cfg.num_layers, cfg.hidden_size
    out = {
        "embeddings.cls_token": sd["cls_token"],
        "embeddings.mask_token": sd["mask_token"].reshape(1, D),
        "embeddings.position_embeddings": sd["pos_embed"],
        "embeddings.patch_embeddings.projection.weight": sd["patch_embed.proj.weight"],
        "embeddings.patch_embeddings.projection.bias": sd["patch_embed.proj.bias"],
        "layernorm.weight": sd["norm.weight"],
        "layernorm.bias": sd["norm.bias"],
    }
    for i in range(L):
        qkv_w = sd[f"blocks.{i}.attn.qkv.weight"]  # (3D, D)
        qkv_b = sd[f"blocks.{i}.attn.qkv.bias"]
        pre = f"encoder.layer.{i}"
        for j, n in enumerate(("query", "key", "value")):
            out[f"{pre}.attention.attention.{n}.weight"] = qkv_w[j * D:(j + 1) * D]
            out[f"{pre}.attention.attention.{n}.bias"] = qkv_b[j * D:(j + 1) * D]
        out.update({
            f"{pre}.norm1.weight": sd[f"blocks.{i}.norm1.weight"],
            f"{pre}.norm1.bias": sd[f"blocks.{i}.norm1.bias"],
            f"{pre}.attention.output.dense.weight": sd[f"blocks.{i}.attn.proj.weight"],
            f"{pre}.attention.output.dense.bias": sd[f"blocks.{i}.attn.proj.bias"],
            f"{pre}.layer_scale1.lambda1": sd[f"blocks.{i}.ls1.gamma"],
            f"{pre}.norm2.weight": sd[f"blocks.{i}.norm2.weight"],
            f"{pre}.norm2.bias": sd[f"blocks.{i}.norm2.bias"],
            f"{pre}.mlp.fc1.weight": sd[f"blocks.{i}.mlp.fc1.weight"],
            f"{pre}.mlp.fc1.bias": sd[f"blocks.{i}.mlp.fc1.bias"],
            f"{pre}.mlp.fc2.weight": sd[f"blocks.{i}.mlp.fc2.weight"],
            f"{pre}.mlp.fc2.bias": sd[f"blocks.{i}.mlp.fc2.bias"],
            f"{pre}.layer_scale2.lambda1": sd[f"blocks.{i}.ls2.gamma"],
        })
    return out


def convert_hub_state_dict(sd, cfg: Dinov2Config) -> Dict[str, Array]:
    """Convert a facebookresearch/dinov2 torch-hub state dict (the
    checkpoints the reference downloads, ``fusion.py:223``)."""
    sd = np_view(sd)
    L, D, P = cfg.num_layers, cfg.hidden_size, cfg.patch_size

    def stack(fn):
        return jnp.asarray(np.stack([fn(i) for i in range(L)]))

    pw = sd["patch_embed.proj.weight"]
    patch_w = pw.transpose(2, 3, 1, 0).reshape(P * P * 3, D)

    return {
        "cls_token": jnp.asarray(sd["cls_token"]),
        "pos_embed": jnp.asarray(sd["pos_embed"][0]),
        "patch_w": jnp.asarray(patch_w),
        "patch_b": jnp.asarray(sd["patch_embed.proj.bias"]),
        "ln1_w": stack(lambda i: sd[f"blocks.{i}.norm1.weight"]),
        "ln1_b": stack(lambda i: sd[f"blocks.{i}.norm1.bias"]),
        "qkv_w": stack(lambda i: sd[f"blocks.{i}.attn.qkv.weight"].T),
        "qkv_b": stack(lambda i: sd[f"blocks.{i}.attn.qkv.bias"]),
        "proj_w": stack(lambda i: sd[f"blocks.{i}.attn.proj.weight"].T),
        "proj_b": stack(lambda i: sd[f"blocks.{i}.attn.proj.bias"]),
        "ls1": stack(lambda i: sd[f"blocks.{i}.ls1.gamma"]),
        "ln2_w": stack(lambda i: sd[f"blocks.{i}.norm2.weight"]),
        "ln2_b": stack(lambda i: sd[f"blocks.{i}.norm2.bias"]),
        "fc1_w": stack(lambda i: sd[f"blocks.{i}.mlp.fc1.weight"].T),
        "fc1_b": stack(lambda i: sd[f"blocks.{i}.mlp.fc1.bias"]),
        "fc2_w": stack(lambda i: sd[f"blocks.{i}.mlp.fc2.weight"].T),
        "fc2_b": stack(lambda i: sd[f"blocks.{i}.mlp.fc2.bias"]),
        "ls2": stack(lambda i: sd[f"blocks.{i}.ls2.gamma"]),
        "norm_w": jnp.asarray(sd["norm.weight"]),
        "norm_b": jnp.asarray(sd["norm.bias"]),
    }
