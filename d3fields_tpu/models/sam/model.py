"""Segment Anything (SAM) in pure JAX, TPU-first.

Rebuild of the SAM used by the reference's Grounded-SAM wrapper
(``utils/grounded_sam.py:427-431``, SamPredictor with box prompts,
``multimask_output=True``). Weight format follows the huggingface
``SamModel`` state dict (``facebook/sam-vit-huge`` et al.), which doubles as
a numerical oracle in tests (tiny random configs; no downloads needed).

TPU-first choices:
- NHWC layout everywhere; windowed attention partitions are pure reshapes;
- the ViT trunk is vmapped over windows and jitted once per image size
  (SAM's input is always 1024x1024, so shapes are static);
- all box prompts of a view run through the two-way decoder in ONE batched
  call (the reference loops SamPredictor.predict per box);
- decomposed relative-position bias tables are gathered once per layer
  (q/k sizes are equal and static, so the reference's interpolation is the
  identity and the gather indices are constants).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from d3fields_tpu.utils.convert import np_view

Array = jax.Array
Params = Dict


@dataclasses.dataclass(frozen=True)
class SamConfig:
    # vision encoder
    hidden_size: int = 1280            # ViT-H
    num_layers: int = 32
    num_heads: int = 16
    mlp_dim: int = 5120
    patch_size: int = 16
    image_size: int = 1024
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    output_channels: int = 256
    # prompt encoder / decoder
    prompt_hidden: int = 256
    decoder_heads: int = 8
    decoder_layers: int = 2
    decoder_mlp_dim: int = 2048
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden: int = 256
    mask_input_channels: int = 16

    @staticmethod
    def vit_huge() -> "SamConfig":
        return SamConfig()

    @staticmethod
    def vit_base() -> "SamConfig":
        return SamConfig(hidden_size=768, num_layers=12, num_heads=12,
                         mlp_dim=3072, global_attn_indexes=(2, 5, 8, 11))

    @staticmethod
    def vit_large() -> "SamConfig":
        return SamConfig(hidden_size=1024, num_layers=24, num_heads=16,
                         mlp_dim=4096, global_attn_indexes=(5, 11, 17, 23))

    @staticmethod
    def tiny_test() -> "SamConfig":
        """Matches the tiny HF SamConfig used as the test oracle."""
        return SamConfig(
            hidden_size=32, num_layers=2, num_heads=2, mlp_dim=128,
            patch_size=8, image_size=64, window_size=14,
            global_attn_indexes=(1,), output_channels=16, prompt_hidden=16,
            decoder_heads=2, decoder_mlp_dim=64, iou_head_hidden=16,
        )

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size


_ENCODER_WIDTHS = {768: SamConfig.vit_base, 1024: SamConfig.vit_large,
                   1280: SamConfig.vit_huge}


def config_for_encoder_width(hidden: int) -> SamConfig:
    """Single source for the encoder-width -> config mapping: 768 = vit-b,
    1024 = vit-l, 1280 = vit-h (the checkpoint the reference downloads,
    ``scripts/download_ckpts.sh``/``fusion.py:235``). Used by the
    checkpoint-conversion sniffer (``utils/convert.py``) and the ``.npz``
    backend loader (``apps/_backends.py``)."""
    if hidden not in _ENCODER_WIDTHS:
        raise ValueError(
            f"unsupported SAM encoder width {hidden} (know 768 = vit_base, "
            "1024 = vit_large, 1280 = vit_huge) — pass an explicit cfg"
        )
    return _ENCODER_WIDTHS[hidden]()


def _layer_norm(x, w, b, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


# ---------------------------------------------------------------------------
# vision encoder
# ---------------------------------------------------------------------------

def _rel_pos_bias(q_hw: Tuple[int, int], rel_h: Array, rel_w: Array,
                  query: Array) -> Array:
    """Decomposed relative position bias (mvitv2 style; HF
    ``get_decomposed_rel_pos`` with q_size == k_size, so the table gather
    uses constant indices)."""
    qh, qw = q_hw
    idx_h = np.arange(qh)[:, None] - np.arange(qh)[None, :] + (qh - 1)
    idx_w = np.arange(qw)[:, None] - np.arange(qw)[None, :] + (qw - 1)
    Rh = rel_h[idx_h]  # (qh, qh, hd)
    Rw = rel_w[idx_w]  # (qw, qw, hd)
    B = query.shape[0]
    q = query.reshape(B, qh, qw, -1)
    bias_h = jnp.einsum("bhwc,hkc->bhwk", q, Rh)
    bias_w = jnp.einsum("bhwc,wkc->bhwk", q, Rw)
    return (bias_h[..., :, None] + bias_w[..., None, :]).reshape(
        B, qh * qw, qh * qw
    )


def _vision_attention(x: Array, p: Params, num_heads: int,
                      use_rel_pos: bool = True) -> Array:
    """Windowed/global attention with decomposed rel-pos; x (B, h, w, C)."""
    B, h, w, C = x.shape
    hd = C // num_heads
    qkv = x.reshape(B, h * w, C) @ p["qkv_w"] + p["qkv_b"]
    qkv = qkv.reshape(B, h * w, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
    qkv = qkv.reshape(3, B * num_heads, h * w, hd)
    q, k, v = qkv[0], qkv[1], qkv[2]

    logits = (q * (hd ** -0.5)) @ k.transpose(0, 2, 1)
    if use_rel_pos:
        logits = logits + _rel_pos_bias((h, w), p["rel_pos_h"], p["rel_pos_w"], q)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = (probs @ v).reshape(B, num_heads, h, w, hd)
    out = out.transpose(0, 2, 3, 1, 4).reshape(B, h, w, C)
    return out @ p["proj_w"] + p["proj_b"]


def _window_partition(x: Array, ws: int):
    B, H, W, C = x.shape
    ph, pw = (-H) % ws, (-W) % ws
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = H + ph, W + pw
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws, ws, C), (Hp, Wp)


def _window_unpartition(win: Array, ws: int, padded_hw, orig_hw):
    Hp, Wp = padded_hw
    H, W = orig_hw
    B = win.shape[0] // ((Hp // ws) * (Wp // ws))
    x = win.reshape(B, Hp // ws, Wp // ws, ws, ws, -1).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


def vision_encoder(params: Params, pixels: Array, cfg: SamConfig,
                   compute_dtype: str = "float32") -> Array:
    """pixels (B, H, W, 3) preprocessed -> image embeddings (B, h, w, Cout).

    HF ``SamVisionEncoder``: patch embed + abs pos + windowed/global ViT
    layers + 2-conv neck with channel layernorms.

    ``compute_dtype="bfloat16"`` runs the ViT trunk matmuls on the MXU in
    bf16 (layernorm statistics and attention softmax stay f32 as in the
    DINOv2 trunk, dinov2.py:104-121; the neck runs f32): ~4x the f32
    encoder on TPU for the heaviest model in the stack. Mask effect is
    bounded by the decoder's 0-threshold — validated against the f32
    encoder in tests/test_sam.py.
    """
    dt = jnp.dtype(compute_dtype)
    P = cfg.patch_size
    B, H, W, _ = pixels.shape
    gh, gw = H // P, W // P
    x = pixels.reshape(B, gh, P, gw, P, 3).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, gh, gw, P * P * 3).astype(dt)
    x = x @ params["patch_w"].astype(dt) + params["patch_b"].astype(dt)
    x = x + params["pos_embed"].astype(dt)

    for i, lp in enumerate(params["layers"]):
        lp = jax.tree.map(lambda a: a.astype(dt), lp)
        ws = 0 if i in cfg.global_attn_indexes else cfg.window_size
        shortcut = x
        h = _layer_norm(x, lp["ln1_w"], lp["ln1_b"])
        if ws > 0:
            h, padded = _window_partition(h, ws)
            h = _vision_attention(h, lp, cfg.num_heads)
            h = _window_unpartition(h, ws, padded, (gh, gw))
        else:
            h = _vision_attention(h, lp, cfg.num_heads)
        x = shortcut + h
        h = _layer_norm(x, lp["ln2_w"], lp["ln2_b"])
        h = jax.nn.gelu(h @ lp["fc1_w"] + lp["fc1_b"], approximate=False)
        x = x + (h @ lp["fc2_w"] + lp["fc2_b"])

    # neck: 1x1 conv + channel LN + 3x3 conv + channel LN (channels_last
    # here); runs f32 — the embeddings feed the f32 decoder
    x = x.astype(jnp.float32)
    x = jnp.einsum("bhwc,co->bhwo", x, params["neck"]["conv1_w"])
    x = _layer_norm(x, params["neck"]["ln1_w"], params["neck"]["ln1_b"])
    x = jax.lax.conv_general_dilated(
        x, params["neck"]["conv2_w"], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = _layer_norm(x, params["neck"]["ln2_w"], params["neck"]["ln2_b"])
    return x


# ---------------------------------------------------------------------------
# prompt encoder
# ---------------------------------------------------------------------------

def fourier_embed(coords01: Array, pe_table: Array) -> Array:
    """Random-fourier positional encoding of [0,1] coords (HF
    ``SamPositionalEmbedding``): sin/cos of 2pi * (2c-1) @ W."""
    c = (2.0 * coords01 - 1.0) @ pe_table
    c = 2.0 * np.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


def image_wide_positional_embedding(params: Params, size: int) -> Array:
    """Dense grid positional encoding (h, w, C)."""
    y = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    x = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    grid = jnp.stack(
        [jnp.broadcast_to(x[None, :], (size, size)),
         jnp.broadcast_to(y[:, None], (size, size))], axis=-1
    )
    return fourier_embed(grid, params["pe_table"])


def embed_boxes(params: Params, boxes: Array, input_size: int) -> Array:
    """boxes (N, 4) xyxy in input-image pixels -> sparse embeddings (N, 2, C).

    HF ``SamPromptEncoder._embed_boxes``: +0.5 pixel-center shift, corner
    fourier encoding, plus learned top-left / bottom-right embeddings.
    """
    corners = (boxes.reshape(-1, 2, 2) + 0.5) / input_size
    emb = fourier_embed(corners, params["pe_table"])
    emb = emb.at[:, 0, :].add(params["point_embed"][2])
    emb = emb.at[:, 1, :].add(params["point_embed"][3])
    return emb


def embed_points(params: Params, points: Array, labels: Array,
                 input_size: int, pad: bool = True) -> Array:
    """points (N, P, 2), labels (N, P) in {1 fg, 0 bg, -1 pad} -> (N, P', C).

    HF ``_embed_points``: pixel-center shift, fourier encode, replace pad
    entries with not_a_point, add per-label embeddings; appends one pad
    point when no boxes accompany the points.
    """
    if pad:
        points = jnp.concatenate(
            [points, jnp.zeros((points.shape[0], 1, 2), points.dtype)], axis=1
        )
        labels = jnp.concatenate(
            [labels, -jnp.ones((labels.shape[0], 1), labels.dtype)], axis=1
        )
    emb = fourier_embed((points + 0.5) / input_size, params["pe_table"])
    emb = jnp.where(labels[..., None] == -1, params["not_a_point"], emb)
    emb = jnp.where(labels[..., None] == 0, emb + params["point_embed"][0], emb)
    emb = jnp.where(labels[..., None] == 1, emb + params["point_embed"][1], emb)
    return emb


def embed_mask_dense(params: Params, mask_logits: Array) -> Array:
    """Mask-prompt embedding (N, 4s, 4s) low-res logits -> (N, s, s, C)
    per-prompt dense embeddings. HF ``SamMaskEmbedding`` / original SAM
    ``mask_downscaling``: stride-2 conv -> LN -> GELU -> stride-2 conv ->
    LN -> GELU -> 1x1 conv. Feeding a previous decode's low-res logits
    back in is how upstream SAM (and the reference GUI's click loop)
    iteratively refines a mask."""
    p = params["mask_embed"]
    dn = ("NHWC", "HWIO", "NHWC")

    def conv(x, w, b, stride):
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), "VALID", dimension_numbers=dn) + b

    x = mask_logits[..., None]
    x = conv(x, p["c1_w"], p["c1_b"], 2)
    x = _layer_norm(x, p["ln1_w"], p["ln1_b"])
    x = jax.nn.gelu(x, approximate=False)
    x = conv(x, p["c2_w"], p["c2_b"], 2)
    x = _layer_norm(x, p["ln2_w"], p["ln2_b"])
    x = jax.nn.gelu(x, approximate=False)
    return conv(x, p["c3_w"], p["c3_b"], 1)


def no_mask_dense_embedding(params: Params, size: int) -> Array:
    return jnp.broadcast_to(
        params["no_mask"][None, None, :], (size, size, params["no_mask"].shape[0])
    )


# ---------------------------------------------------------------------------
# two-way mask decoder
# ---------------------------------------------------------------------------

def _attn(q, k, v, p, num_heads):
    """SamAttention: project to internal dim, multi-head, project out.
    q/k/v: (B, T, C)."""
    qi = q @ p["q_w"] + p["q_b"]
    ki = k @ p["k_w"] + p["k_b"]
    vi = v @ p["v_w"] + p["v_b"]
    B, Tq, Ci = qi.shape
    Tk = ki.shape[1]
    hd = Ci // num_heads

    def split(t, T):
        return t.reshape(B, T, num_heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = split(qi, Tq), split(ki, Tk), split(vi, Tk)
    logits = (qh @ kh.transpose(0, 1, 3, 2)) * (hd ** -0.5)
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(q.dtype)
    out = (probs @ vh).transpose(0, 2, 1, 3).reshape(B, Tq, Ci)
    return out @ p["out_w"] + p["out_b"]


def _mlp_block(x, p):
    return jax.nn.relu(x @ p["lin1_w"] + p["lin1_b"]) @ p["lin2_w"] + p["lin2_b"]


def two_way_transformer(params: Params, tokens: Array, image_emb: Array,
                        image_pe: Array, cfg: SamConfig):
    """tokens (B, T, C); image_emb/image_pe (B, HW, C). Returns
    (queries (B, T, C), keys (B, HW, C)). HF ``SamTwoWayTransformer``."""
    nh = cfg.decoder_heads
    queries, keys = tokens, image_emb
    for i, lp in enumerate(params["layers"]):
        if i == 0:
            # skip_first_layer_pe: the self-attention output REPLACES the
            # queries (no residual) on layer 0 (HF SamTwoWayAttentionBlock)
            queries = _attn(queries, queries, queries, lp["self_attn"], nh)
        else:
            q = queries + tokens
            queries = queries + _attn(q, q, queries, lp["self_attn"], nh)
        queries = _layer_norm(queries, lp["ln1_w"], lp["ln1_b"], eps=1e-5)

        q = queries + tokens
        k = keys + image_pe
        queries = queries + _attn(q, k, keys, lp["t2i"], nh)
        queries = _layer_norm(queries, lp["ln2_w"], lp["ln2_b"], eps=1e-5)

        queries = queries + _mlp_block(queries, lp["mlp"])
        queries = _layer_norm(queries, lp["ln3_w"], lp["ln3_b"], eps=1e-5)

        q = queries + tokens
        k = keys + image_pe
        keys = keys + _attn(k, q, queries, lp["i2t"], nh)
        keys = _layer_norm(keys, lp["ln4_w"], lp["ln4_b"], eps=1e-5)

    q = queries + tokens
    k = keys + image_pe
    queries = queries + _attn(q, k, keys, params["final_attn"], nh)
    queries = _layer_norm(queries, params["final_ln_w"], params["final_ln_b"],
                          eps=1e-5)
    return queries, keys


def _feed_forward(x, p, sigmoid=False):
    h = jax.nn.relu(x @ p["in_w"] + p["in_b"])
    for lw, lb in p.get("mid", []):
        h = jax.nn.relu(h @ lw + lb)
    h = h @ p["out_w"] + p["out_b"]
    return jax.nn.sigmoid(h) if sigmoid else h


def _conv_transpose_2x(x, w, b):
    """ConvTranspose2d(kernel 2, stride 2) in NHWC (torch IOHW weights are
    pre-converted to HWIO)."""
    out = jax.lax.conv_transpose(
        x, w, strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b


def mask_decoder(params: Params, image_emb: Array, image_pe: Array,
                 sparse_emb: Array, dense_emb: Array, cfg: SamConfig,
                 multimask_output: bool = True):
    """image_emb (h, w, C); sparse_emb (N, T, C) for N prompts;
    dense_emb (h, w, C) shared, or (N, h, w, C) per-prompt (mask prompts).
    Returns (masks (N, M, 4h, 4w), iou (N, M)).

    HF ``SamMaskDecoder`` with the prompt batch as the leading axis — every
    box of a view is decoded in one batched transformer call.
    """
    h, w, C = image_emb.shape
    N = sparse_emb.shape[0]
    nm = cfg.num_multimask_outputs + 1
    out_tokens = jnp.concatenate(
        [params["iou_token"][None], params["mask_tokens"]], axis=0
    )  # (1+nm, C)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(out_tokens[None], (N,) + out_tokens.shape), sparse_emb],
        axis=1,
    )

    if dense_emb.ndim == 4:  # per-prompt dense (mask prompts), (N, h, w, C)
        img = (image_emb[None] + dense_emb).reshape(N, h * w, C)
    else:
        img = jnp.broadcast_to(
            (image_emb + dense_emb).reshape(1, h * w, C), (N, h * w, C)
        )
    pe = jnp.broadcast_to(image_pe.reshape(1, h * w, C), (N, h * w, C))

    queries, keys = two_way_transformer(params["transformer"], tokens, img, pe, cfg)
    iou_tok = queries[:, 0]
    mask_toks = queries[:, 1 : 1 + nm]

    up = keys.reshape(N, h, w, C)
    up = _conv_transpose_2x(up, params["up1_w"], params["up1_b"])
    up = _layer_norm(up, params["up_ln_w"], params["up_ln_b"])
    up = jax.nn.gelu(up, approximate=False)
    up = _conv_transpose_2x(up, params["up2_w"], params["up2_b"])
    up = jax.nn.gelu(up, approximate=False)  # (N, 4h, 4w, C/8)

    hyper = jnp.stack(
        [_feed_forward(mask_toks[:, i], params["hyper"][i]) for i in range(nm)],
        axis=1,
    )  # (N, nm, C/8)
    masks = jnp.einsum("nmc,nhwc->nmhw", hyper, up)
    iou = _feed_forward(iou_tok, params["iou_head"])
    if multimask_output:
        return masks[:, 1:], iou[:, 1:]
    return masks[:, :1], iou[:, :1]


# ---------------------------------------------------------------------------
# full forward
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def sam_encode_image(params: Params, pixels: Array, cfg: SamConfig,
                     compute_dtype: str = "float32") -> Array:
    """pixels (1, S, S, 3) preprocessed -> image embeddings (h, w, C).
    Split from the box decoder so one encoding serves any number of
    predict calls without re-running the ViT trunk."""
    # the f32 precision pin only applies to the f32 trunk: with bf16
    # operands it would force multi-pass f32 emulation, defeating the MXU
    prec = "float32" if compute_dtype == "float32" else "default"
    with jax.default_matmul_precision(prec):
        return vision_encoder(params["vision"], pixels, cfg,
                              compute_dtype)[0]


@functools.partial(jax.jit, static_argnames=("cfg", "multimask_output",
                                              "compute_dtype"))
def sam_decode_boxes(params: Params, image_emb: Array, boxes: Array,
                     cfg: SamConfig, multimask_output: bool = True,
                     compute_dtype: str = "float32"):
    """image_emb (h, w, C) from :func:`sam_encode_image`; boxes (N, 4) xyxy
    in model-input pixels -> (low_res_masks (N, M, 4h, 4w), iou (N, M)).

    ``compute_dtype`` selects the matmul precision only (values stay f32):
    the f32 pin forces multi-pass bf16 emulation on the MXU, which costs
    ~9x on the decoder's skinny matmuls (measured 517 -> 58 ms for a
    4-view rig). "bfloat16" = default MXU precision; mask agreement vs
    f32 is pinned on-chip in tests_tpu/test_sam_decode_precision.py."""
    prec = "float32" if compute_dtype == "float32" else "default"
    with jax.default_matmul_precision(prec):
        size = cfg.grid
        pe = image_wide_positional_embedding(params["prompt"], size)
        sparse = embed_boxes(params["prompt"], boxes, cfg.image_size)
        dense = no_mask_dense_embedding(params["prompt"], size)
        return mask_decoder(
            params["decoder"], image_emb, pe, sparse, dense, cfg,
            multimask_output=multimask_output,
        )


@functools.partial(jax.jit,
                   static_argnames=("cfg", "compute_dtype", "view_chunk"))
def sam_encode_images(params: Params, pixels: Array, cfg: SamConfig,
                      compute_dtype: str = "float32",
                      view_chunk: int = 1) -> Array:
    """pixels (V, S, S, 3) preprocessed -> (V, h, w, C): ALL views in ONE
    dispatched executable (the per-view ``sam_encode_image`` loop pays a
    tunnel round trip per view — 4 sequential dispatches for the reference
    rig, ``utils/grounded_sam.py:425-431`` scaled over ``fusion.py:
    1116-1120``'s view loop).

    ``view_chunk`` bounds how many views run concurrently inside the
    executable (``lax.map`` over chunks): a ViT-H global-attention layer
    materializes (c, 16, 4096, 4096) logits — 4.3 GB at c=4 f32 — so the
    default c=1 keeps the peak at the single-view level while still paying
    only one dispatch. Identical numerics for any chunk (views are
    independent)."""
    prec = "float32" if compute_dtype == "float32" else "default"
    V = pixels.shape[0]
    if view_chunk < 1:
        raise ValueError(f"view_chunk must be >= 1, got {view_chunk}")
    with jax.default_matmul_precision(prec):
        if view_chunk >= V:
            return vision_encoder(params["vision"], pixels, cfg,
                                  compute_dtype)
        if V % view_chunk:
            raise ValueError(
                f"view count {V} not divisible by view_chunk {view_chunk}")
        groups = pixels.reshape((V // view_chunk, view_chunk)
                                + pixels.shape[1:])
        out = jax.lax.map(
            lambda g: vision_encoder(params["vision"], g, cfg,
                                     compute_dtype), groups)
        return out.reshape((V,) + out.shape[2:])


@functools.partial(jax.jit, static_argnames=("cfg", "multimask_output",
                                              "compute_dtype"))
def sam_decode_boxes_views(params: Params, image_embs: Array, boxes: Array,
                           cfg: SamConfig, multimask_output: bool = True,
                           compute_dtype: str = "float32"):
    """Multi-view batched box decode: image_embs (V, h, w, C) from
    :func:`sam_encode_images`; boxes (V, N, 4) xyxy in model-input pixels
    -> (low_res_masks (V, N, M, 4h, 4w), iou (V, N, M)). One dispatch for
    the whole rig — the decoder's FLOPs are trivial (~0.09 TFLOP/s
    measured when looped per view), so the per-view loop was pure tunnel
    dispatch latency. ``compute_dtype``: see :func:`sam_decode_boxes`
    (matmul precision only; ~9x on TPU)."""
    prec = "float32" if compute_dtype == "float32" else "default"
    with jax.default_matmul_precision(prec):
        size = cfg.grid
        pe = image_wide_positional_embedding(params["prompt"], size)
        dense = no_mask_dense_embedding(params["prompt"], size)

        def one(emb, bx):
            sparse = embed_boxes(params["prompt"], bx, cfg.image_size)
            return mask_decoder(
                params["decoder"], emb, pe, sparse, dense, cfg,
                multimask_output=multimask_output,
            )

        return jax.vmap(one)(image_embs, boxes)


def sam_predict_boxes(params: Params, pixels: Array, boxes: Array,
                      cfg: SamConfig, multimask_output: bool = True):
    """One-shot encode + decode (see the predictor for the cached-encoding
    path). pixels (1, S, S, 3); boxes (N, 4)."""
    image_emb = sam_encode_image(params, pixels, cfg)
    return sam_decode_boxes(params, image_emb, boxes, cfg, multimask_output)


@functools.partial(jax.jit, static_argnames=("cfg", "multimask_output",
                                              "compute_dtype"))
def sam_decode_points(params: Params, image_emb: Array, points: Array,
                      labels: Array, cfg: SamConfig,
                      multimask_output: bool = True,
                      mask_input: Optional[Array] = None,
                      compute_dtype: str = "float32"):
    """Point-prompt (click) decoding: points (N, P, 2) xy in model-input
    pixels, labels (N, P) in {1 foreground, 0 background, -1 pad} ->
    (low_res_masks (N, M, 4h, 4w), iou (N, M)).

    ``mask_input`` (N, 4h, 4w) low-res logits from a previous decode make
    this an iterative refinement step (upstream SAM's ``mask_input``).

    The headless capability behind the reference GUI's click segmentation
    (``XMem/inference/interact/`` fbrs/S2M — positive/negative clicks to a
    mask); upstream SAM exposes the same as
    ``predictor.predict(point_coords=..., point_labels=...)``.

    ``compute_dtype``: matmul precision only — see :func:`sam_decode_boxes`
    (~9x on TPU)."""
    prec = "float32" if compute_dtype == "float32" else "default"
    with jax.default_matmul_precision(prec):
        size = cfg.grid
        pe = image_wide_positional_embedding(params["prompt"], size)
        # pad=True: the extra not-a-point entry HF appends when points
        # arrive without boxes
        sparse = embed_points(params["prompt"], points, labels,
                              cfg.image_size, pad=True)
        dense = (embed_mask_dense(params["prompt"], mask_input)
                 if mask_input is not None
                 else no_mask_dense_embedding(params["prompt"], size))
        return mask_decoder(
            params["decoder"], image_emb, pe, sparse, dense, cfg,
            multimask_output=multimask_output,
        )


def build_random_hf(cfg: SamConfig, seed: int = 0):
    """A randomly-initialized HF ``SamModel`` at ``cfg``'s scale — the
    oracle/smoke-mode weight source (tests compare against it;
    :func:`random_params` converts it). One builder so the test oracle
    and smoke-mode weights can't drift apart."""
    import torch
    from transformers import (
        SamConfig as HFSamConfig, SamMaskDecoderConfig, SamModel,
        SamPromptEncoderConfig, SamVisionConfig,
    )

    grid = cfg.image_size // cfg.patch_size
    # HF's SamVisionConfig DEFAULTS initializer_range to 1e-10 (the model
    # is always loaded pretrained upstream, so nobody noticed): weights at
    # that scale collapse through layernorm eps floors and once made every
    # encoder-parity assertion trivially compare ~0 vs ~0. Real-scale init
    # keeps the oracle meaningful.
    vis = SamVisionConfig(
        hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        global_attn_indexes=list(cfg.global_attn_indexes),
        mlp_ratio=cfg.mlp_dim / cfg.hidden_size,
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        output_channels=cfg.output_channels, window_size=cfg.window_size,
        num_pos_feats=cfg.prompt_hidden // 2,
        initializer_range=0.02,
    )
    prm = SamPromptEncoderConfig(
        hidden_size=cfg.prompt_hidden, image_embedding_size=grid,
        image_size=cfg.image_size, patch_size=cfg.patch_size,
    )
    dec = SamMaskDecoderConfig(
        hidden_size=cfg.prompt_hidden, num_attention_heads=cfg.decoder_heads,
        mlp_dim=cfg.decoder_mlp_dim, iou_head_hidden_dim=cfg.iou_head_hidden,
    )
    # the top-level config's initializer_range drives _init_weights for the
    # prompt encoder / mask decoder modules
    top = HFSamConfig(vision_config=vis, prompt_encoder_config=prm,
                      mask_decoder_config=dec)
    top.initializer_range = 0.02
    torch.manual_seed(seed)
    hf = SamModel(top).eval()
    with torch.no_grad():  # _init_weights zeroes these; randomize them
        for layer in hf.vision_encoder.layers:
            layer.attn.rel_pos_h.normal_(0, 0.02)
            layer.attn.rel_pos_w.normal_(0, 0.02)
        hf.vision_encoder.pos_embed.normal_(0, 0.02)
    return hf


def random_params(cfg: SamConfig, seed: int = 0) -> Params:
    """Random-weight params for smoke/test runs (no checkpoint),
    converted through the same audited path real checkpoints take."""
    hf = build_random_hf(cfg, seed)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    return convert_hf_state_dict(sd, cfg)


def random_params_direct(cfg: SamConfig, seed: int = 0) -> Params:
    """Random-weight params built directly in numpy — no torch/HF.

    :func:`random_params` routes through an HF ``SamModel`` so tests share
    one weight source with the oracle, but at ViT-H scale the torch
    construction alone costs ~2 minutes; this builds the identical pytree
    STRUCTURE (asserted against the HF-converted tree in
    tests/test_sam.py) in under a second for benchmarking and smoke runs
    where the values only need to be finite and sanely scaled.
    """
    rs = np.random.default_rng(seed)

    # Host numpy leaves (eager per-leaf jnp.asarray would pay a device
    # transfer per leaf — 55 s through the remote TPU tunnel at ViT-H's
    # 2.5 GB; SamPredictor.__init__ device_puts the whole tree in ONE
    # batched transfer — numpy leaves passed straight to a jitted call
    # would be re-transferred per call).
    # Weight values are drawn from a 1M-sample gaussian pool with a
    # rotating offset rather than 640M i.i.d. samples: this host generates
    # ~6M normals/s, and benchmark-grade weights only need finite, sanely
    # scaled, non-degenerate values.
    pool = 0.02 * rs.standard_normal(1 << 20, dtype=np.float32)
    off = [0]

    def w(*shape):
        n = int(np.prod(shape))
        start = off[0] % pool.size
        off[0] += 104729  # prime stride decorrelates successive leaves
        return np.resize(np.roll(pool, -start), n).reshape(shape)

    def zeros(*shape):
        return np.zeros(shape, np.float32)

    def ones(*shape):
        return np.ones(shape, np.float32)

    D, L, NH = cfg.hidden_size, cfg.num_layers, cfg.num_heads
    mlp, P, G = cfg.mlp_dim, cfg.patch_size, cfg.grid
    Cout, Ch, mc = cfg.output_channels, cfg.prompt_hidden, cfg.mask_input_channels
    nm = cfg.num_multimask_outputs + 1
    hd = D // NH

    def vis_layer(i):
        S = G if i in cfg.global_attn_indexes else cfg.window_size
        return {
            "ln1_w": ones(D), "ln1_b": zeros(D),
            "qkv_w": w(D, 3 * D), "qkv_b": zeros(3 * D),
            "proj_w": w(D, D), "proj_b": zeros(D),
            "rel_pos_h": w(2 * S - 1, hd), "rel_pos_w": w(2 * S - 1, hd),
            "ln2_w": ones(D), "ln2_b": zeros(D),
            "fc1_w": w(D, mlp), "fc1_b": zeros(mlp),
            "fc2_w": w(mlp, D), "fc2_b": zeros(D),
        }

    vision = {
        "patch_w": w(P * P * 3, D), "patch_b": zeros(D),
        "pos_embed": w(G, G, D),
        "layers": [vis_layer(i) for i in range(L)],
        "neck": {
            "conv1_w": w(D, Cout), "ln1_w": ones(Cout), "ln1_b": zeros(Cout),
            "conv2_w": w(3, 3, Cout, Cout),
            "ln2_w": ones(Cout), "ln2_b": zeros(Cout),
        },
    }

    prompt = {
        "pe_table": w(2, Ch // 2),
        "point_embed": w(4, Ch),
        "not_a_point": w(Ch), "no_mask": w(Ch),
        "mask_embed": {
            "c1_w": w(2, 2, 1, mc // 4), "c1_b": zeros(mc // 4),
            "ln1_w": ones(mc // 4), "ln1_b": zeros(mc // 4),
            "c2_w": w(2, 2, mc // 4, mc), "c2_b": zeros(mc),
            "ln2_w": ones(mc), "ln2_b": zeros(mc),
            "c3_w": w(1, 1, mc, Ch), "c3_b": zeros(Ch),
        },
    }

    def attn(ci):
        return {
            "q_w": w(Ch, ci), "q_b": zeros(ci),
            "k_w": w(Ch, ci), "k_b": zeros(ci),
            "v_w": w(Ch, ci), "v_b": zeros(ci),
            "out_w": w(ci, Ch), "out_b": zeros(Ch),
        }

    def dec_layer():
        return {
            "self_attn": attn(Ch), "t2i": attn(Ch // 2), "i2t": attn(Ch // 2),
            "ln1_w": ones(Ch), "ln1_b": zeros(Ch),
            "ln2_w": ones(Ch), "ln2_b": zeros(Ch),
            "ln3_w": ones(Ch), "ln3_b": zeros(Ch),
            "ln4_w": ones(Ch), "ln4_b": zeros(Ch),
            "mlp": {
                "lin1_w": w(Ch, cfg.decoder_mlp_dim),
                "lin1_b": zeros(cfg.decoder_mlp_dim),
                "lin2_w": w(cfg.decoder_mlp_dim, Ch), "lin2_b": zeros(Ch),
            },
        }

    def feed_forward(din, dhid, dout, depth):
        return {
            "in_w": w(din, dhid), "in_b": zeros(dhid),
            "mid": [(w(dhid, dhid), zeros(dhid)) for _ in range(depth - 2)],
            "out_w": w(dhid, dout), "out_b": zeros(dout),
        }

    decoder = {
        "iou_token": w(Ch), "mask_tokens": w(nm, Ch),
        "transformer": {
            "layers": [dec_layer() for _ in range(cfg.decoder_layers)],
            "final_attn": attn(Ch // 2),
            "final_ln_w": ones(Ch), "final_ln_b": zeros(Ch),
        },
        "up1_w": w(2, 2, Ch, Ch // 4), "up1_b": zeros(Ch // 4),
        "up_ln_w": ones(Ch // 4), "up_ln_b": zeros(Ch // 4),
        "up2_w": w(2, 2, Ch // 4, Ch // 8), "up2_b": zeros(Ch // 8),
        "hyper": [feed_forward(Ch, Ch, Ch // 8, 3) for _ in range(nm)],
        "iou_head": feed_forward(Ch, cfg.iou_head_hidden, nm,
                                 cfg.iou_head_depth),
    }

    return {"vision": vision, "prompt": prompt, "decoder": decoder}


# ---------------------------------------------------------------------------
# HF weight conversion
# ---------------------------------------------------------------------------

def _lin_t(sd, pre):
    return (
        jnp.asarray(np.asarray(sd[pre + ".weight"]).T),
        jnp.asarray(np.asarray(sd[pre + ".bias"])),
    )


def convert_hf_state_dict(sd, cfg: SamConfig) -> Params:
    """Convert a huggingface ``SamModel`` state dict."""
    sd = np_view(sd)
    g = lambda n: jnp.asarray(sd[n])

    P = cfg.patch_size
    pw = sd["vision_encoder.patch_embed.projection.weight"]  # (D, 3, P, P)
    layers = []
    for i in range(cfg.num_layers):
        pre = f"vision_encoder.layers.{i}"
        qkv_w, qkv_b = _lin_t(sd, pre + ".attn.qkv")
        proj_w, proj_b = _lin_t(sd, pre + ".attn.proj")
        fc1_w, fc1_b = _lin_t(sd, pre + ".mlp.lin1")
        fc2_w, fc2_b = _lin_t(sd, pre + ".mlp.lin2")
        layers.append({
            "ln1_w": g(pre + ".layer_norm1.weight"),
            "ln1_b": g(pre + ".layer_norm1.bias"),
            "qkv_w": qkv_w, "qkv_b": qkv_b,
            "proj_w": proj_w, "proj_b": proj_b,
            "rel_pos_h": g(pre + ".attn.rel_pos_h"),
            "rel_pos_w": g(pre + ".attn.rel_pos_w"),
            "ln2_w": g(pre + ".layer_norm2.weight"),
            "ln2_b": g(pre + ".layer_norm2.bias"),
            "fc1_w": fc1_w, "fc1_b": fc1_b,
            "fc2_w": fc2_w, "fc2_b": fc2_b,
        })
    vision = {
        "patch_w": jnp.asarray(pw.transpose(2, 3, 1, 0).reshape(P * P * 3, -1)),
        "patch_b": g("vision_encoder.patch_embed.projection.bias"),
        "pos_embed": g("vision_encoder.pos_embed")[0],
        "layers": layers,
        "neck": {
            "conv1_w": jnp.asarray(
                sd["vision_encoder.neck.conv1.weight"][:, :, 0, 0].T
            ),
            "ln1_w": g("vision_encoder.neck.layer_norm1.weight"),
            "ln1_b": g("vision_encoder.neck.layer_norm1.bias"),
            "conv2_w": jnp.asarray(
                sd["vision_encoder.neck.conv2.weight"].transpose(2, 3, 1, 0)
            ),
            "ln2_w": g("vision_encoder.neck.layer_norm2.weight"),
            "ln2_b": g("vision_encoder.neck.layer_norm2.bias"),
        },
    }

    prompt = {
        "pe_table": g("shared_image_embedding.positional_embedding"),
        "point_embed": jnp.stack(
            [g(f"prompt_encoder.point_embed.{i}.weight")[0] for i in range(4)]
        ),
        "not_a_point": g("prompt_encoder.not_a_point_embed.weight")[0],
        "no_mask": g("prompt_encoder.no_mask_embed.weight")[0],
        # mask-prompt downscaler (HF SamMaskEmbedding / original SAM
        # mask_downscaling): conv s2 -> LN -> GELU -> conv s2 -> LN ->
        # GELU -> 1x1; torch OIHW -> HWIO
        "mask_embed": {
            "c1_w": jnp.asarray(
                sd["prompt_encoder.mask_embed.conv1.weight"].transpose(2, 3, 1, 0)),
            "c1_b": g("prompt_encoder.mask_embed.conv1.bias"),
            "ln1_w": g("prompt_encoder.mask_embed.layer_norm1.weight"),
            "ln1_b": g("prompt_encoder.mask_embed.layer_norm1.bias"),
            "c2_w": jnp.asarray(
                sd["prompt_encoder.mask_embed.conv2.weight"].transpose(2, 3, 1, 0)),
            "c2_b": g("prompt_encoder.mask_embed.conv2.bias"),
            "ln2_w": g("prompt_encoder.mask_embed.layer_norm2.weight"),
            "ln2_b": g("prompt_encoder.mask_embed.layer_norm2.bias"),
            "c3_w": jnp.asarray(
                sd["prompt_encoder.mask_embed.conv3.weight"].transpose(2, 3, 1, 0)),
            "c3_b": g("prompt_encoder.mask_embed.conv3.bias"),
        },
    }

    def attn_t(pre):
        qw, qb = _lin_t(sd, pre + ".q_proj")
        kw, kb = _lin_t(sd, pre + ".k_proj")
        vw, vb = _lin_t(sd, pre + ".v_proj")
        ow, ob = _lin_t(sd, pre + ".out_proj")
        return {"q_w": qw, "q_b": qb, "k_w": kw, "k_b": kb,
                "v_w": vw, "v_b": vb, "out_w": ow, "out_b": ob}

    dec_layers = []
    for i in range(cfg.decoder_layers):
        pre = f"mask_decoder.transformer.layers.{i}"
        mlp1_w, mlp1_b = _lin_t(sd, pre + ".mlp.lin1")
        mlp2_w, mlp2_b = _lin_t(sd, pre + ".mlp.lin2")
        dec_layers.append({
            "self_attn": attn_t(pre + ".self_attn"),
            "t2i": attn_t(pre + ".cross_attn_token_to_image"),
            "i2t": attn_t(pre + ".cross_attn_image_to_token"),
            "mlp": {"lin1_w": mlp1_w, "lin1_b": mlp1_b,
                    "lin2_w": mlp2_w, "lin2_b": mlp2_b},
            **{f"ln{j}_w": g(f"{pre}.layer_norm{j}.weight") for j in range(1, 5)},
            **{f"ln{j}_b": g(f"{pre}.layer_norm{j}.bias") for j in range(1, 5)},
        })

    def ff_t(pre, depth):
        mid = []
        for i in range(depth - 2):
            w, b = _lin_t(sd, f"{pre}.layers.{i}")
            mid.append((w, b))
        in_w, in_b = _lin_t(sd, pre + ".proj_in")
        out_w, out_b = _lin_t(sd, pre + ".proj_out")
        return {"in_w": in_w, "in_b": in_b, "mid": mid,
                "out_w": out_w, "out_b": out_b}

    nm = cfg.num_multimask_outputs + 1
    # torch ConvTranspose2d weight (I, O, kh, kw) -> spatially FLIPPED HWIO
    # (jax conv_transpose without transpose_kernel is a fractionally-strided
    # convolution; torch's transposed conv applies the mirrored kernel)
    up1 = np.ascontiguousarray(
        sd["mask_decoder.upscale_conv1.weight"][:, :, ::-1, ::-1]
    ).transpose(2, 3, 0, 1)
    up2 = np.ascontiguousarray(
        sd["mask_decoder.upscale_conv2.weight"][:, :, ::-1, ::-1]
    ).transpose(2, 3, 0, 1)
    decoder = {
        "iou_token": g("mask_decoder.iou_token.weight")[0],
        "mask_tokens": g("mask_decoder.mask_tokens.weight"),
        "transformer": {
            "layers": dec_layers,
            "final_attn": attn_t("mask_decoder.transformer.final_attn_token_to_image"),
            "final_ln_w": g("mask_decoder.transformer.layer_norm_final_attn.weight"),
            "final_ln_b": g("mask_decoder.transformer.layer_norm_final_attn.bias"),
        },
        "up1_w": jnp.asarray(up1), "up1_b": g("mask_decoder.upscale_conv1.bias"),
        "up2_w": jnp.asarray(up2), "up2_b": g("mask_decoder.upscale_conv2.bias"),
        "up_ln_w": g("mask_decoder.upscale_layer_norm.weight"),
        "up_ln_b": g("mask_decoder.upscale_layer_norm.bias"),
        "hyper": [
            ff_t(f"mask_decoder.output_hypernetworks_mlps.{i}", 3)
            for i in range(nm)
        ],
        "iou_head": ff_t("mask_decoder.iou_prediction_head", cfg.iou_head_depth),
    }
    return {"vision": vision, "prompt": prompt, "decoder": decoder}
