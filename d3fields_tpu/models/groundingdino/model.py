"""GroundingDINO open-set detector in pure JAX.

Rebuild of the detector behind the reference's
``grounded_instance_sam_new_ver`` (``utils/grounded_sam.py:404-442``). The
reference depends on a CUDA MultiScaleDeformableAttention extension
(``env.yaml:33``); here deformable attention is expressed as batched
bilinear gathers + weighted sums that XLA fuses — no custom op. Weight
format follows the huggingface ``GroundingDinoForObjectDetection`` state
dict (``IDEA-Research/grounding-dino-tiny`` et al.), which is the converted
original checkpoint.

Structure mirrors the published architecture: Swin backbone (swin.py), BERT
text trunk (bert.py), feature-enhancer encoder (bi-directional
vision<->text fusion + text self-attention + multi-scale deformable vision
self-attention), language-guided query selection (top-900 proposals by
max contrastive logit), and a cross-modality decoder with iterative box
refinement.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from d3fields_tpu.models.groundingdino import bert as B
from d3fields_tpu.models.groundingdino import swin as SW

from d3fields_tpu.utils.convert import np_view

Array = jax.Array

# BERT ids treated as caption separators: [CLS], [SEP], '.', '?'
SPECIAL_TOKEN_IDS = (101, 102, 1012, 1029)


@dataclasses.dataclass(frozen=True)
class GroundingDinoConfig:
    d_model: int = 256
    num_feature_levels: int = 4
    encoder_layers: int = 6
    decoder_layers: int = 6
    encoder_heads: int = 8
    decoder_heads: int = 8
    encoder_ffn_dim: int = 2048
    decoder_ffn_dim: int = 2048
    encoder_points: int = 4
    decoder_points: int = 4
    num_queries: int = 900
    max_text_len: int = 256
    pe_temperature: float = 20.0
    swin: SW.SwinConfig = SW.SwinConfig.tiny()
    text: B.BertConfig = B.BertConfig()

    @staticmethod
    def swin_b() -> "GroundingDinoConfig":
        """groundingdino_swinb_cogcoor (HF grounding-dino-base) — the
        larger of the two checkpoints the reference's download script
        fetches (``scripts/download_ckpts.sh:5``; the runtime default is
        swin-t, ``fusion.py:241``)."""
        return GroundingDinoConfig(swin=SW.SwinConfig.base())

    @staticmethod
    def tiny_test() -> "GroundingDinoConfig":
        return GroundingDinoConfig(
            d_model=32, num_feature_levels=3, encoder_layers=2,
            decoder_layers=2, encoder_heads=4, decoder_heads=4,
            encoder_ffn_dim=64, decoder_ffn_dim=64, num_queries=16,
            max_text_len=32,
            swin=SW.SwinConfig(embed_dim=8, depths=(1, 1), num_heads=(2, 4),
                               window_size=4, out_stages=(0, 1)),
            text=B.BertConfig(vocab_size=2000, hidden_size=24, num_layers=2,
                              num_heads=2, intermediate_size=48,
                              max_position=64),
        )


# the one trunk-width table: 96 = swin-t (the reference's runtime default,
# ``fusion.py:241``), 128 = swin-b (the second checkpoint its download
# script fetches) — both trunk_name() and config_for_trunk() derive from it
_TRUNKS = {
    96: ("swin_t", GroundingDinoConfig),
    128: ("swin_b", GroundingDinoConfig.swin_b),
}


def _require_trunk(embed_dim: int):
    if embed_dim not in _TRUNKS:
        known = ", ".join(f"{w} = {n}" for w, (n, _) in sorted(_TRUNKS.items()))
        raise ValueError(
            f"unsupported GroundingDINO trunk width {embed_dim} (know "
            f"{known}) — pass an explicit cfg"
        )
    return _TRUNKS[embed_dim]


def config_for_trunk(embed_dim: int) -> GroundingDinoConfig:
    """Config for a Swin patch-embed width. Used by both the
    checkpoint-conversion sniffer (``utils/convert.py``) and the ``.npz``
    backend loader (``apps/_backends.py``)."""
    return _require_trunk(embed_dim)[1]()


def trunk_name(embed_dim: int) -> str:
    """Canonical trunk label for a Swin embed width (for ``.npz`` meta)."""
    return _require_trunk(embed_dim)[0]


def _layer_norm(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def _mlp_head(x, p):
    """N-layer relu MLP (GroundingDinoMLPPredictionHead)."""
    for i, (w, b) in enumerate(p):
        x = x @ w + b
        if i < len(p) - 1:
            x = jax.nn.relu(x)
    return x


# ---------------------------------------------------------------------------
# positional encodings
# ---------------------------------------------------------------------------

def sine_position_embedding(h: int, w: int, d_model: int,
                            temperature: float) -> Array:
    """DETR-style 2D sine embedding for an unpadded (h, w) map -> (h*w, D).
    (``GroundingDinoSinePositionEmbedding`` with an all-ones mask.)"""
    half = d_model // 2
    scale = 2.0 * np.pi
    y = (np.arange(h, dtype=np.float32) + 1.0) / h * scale
    x = (np.arange(w, dtype=np.float32) + 1.0) / w * scale
    dim_t = temperature ** (2.0 * (np.arange(half) // 2) / half)
    py = y[:, None] / dim_t  # (h, half)
    px = x[:, None] / dim_t
    def interleave(p):
        return np.stack([np.sin(p[:, 0::2]), np.cos(p[:, 1::2])], -1).reshape(p.shape[0], -1)
    py, px = interleave(py), interleave(px)
    pos = np.concatenate(
        [np.broadcast_to(py[:, None], (h, w, half)),
         np.broadcast_to(px[None, :], (h, w, half))], axis=-1
    )
    return jnp.asarray(pos.reshape(h * w, d_model))


def get_sine_pos_embed(pos: Array, num_pos_feats: int,
                       temperature: float = 10000.0,
                       exchange_xy: bool = True) -> Array:
    """(..., n) positions -> (..., n*num_pos_feats) sine features
    (``get_sine_pos_embed``)."""
    scale = 2.0 * np.pi
    dim_t = temperature ** (
        2.0 * (np.arange(num_pos_feats) // 2) / num_pos_feats
    )
    sx = pos[..., None] * scale / dim_t  # (..., n, F)
    emb = jnp.stack([jnp.sin(sx[..., 0::2]), jnp.cos(sx[..., 1::2])], -1)
    emb = emb.reshape(emb.shape[:-2] + (-1,))  # (..., n, F)
    parts = [emb[..., i, :] for i in range(pos.shape[-1])]
    if exchange_xy and len(parts) >= 2:
        parts[0], parts[1] = parts[1], parts[0]
    return jnp.concatenate(parts, axis=-1)


# ---------------------------------------------------------------------------
# multi-scale deformable attention (pure XLA)
# ---------------------------------------------------------------------------

def _bilinear_sample_nchw(img: Array, gx: Array, gy: Array) -> Array:
    """img (h, w, C); gx/gy (N,) in [-1, 1] grid coords
    (align_corners=False, zeros padding). Returns (N, C).

    The readable single-image reference implementation (4 masked corner
    gathers); the batched hot path below uses the corner-table layout —
    equivalence is pinned by tests/test_groundingdino.py."""
    h, w, C = img.shape
    ix = ((gx + 1.0) * w - 1.0) * 0.5
    iy = ((gy + 1.0) * h - 1.0) * 0.5
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    tx, ty = ix - x0, iy - y0
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    flat = img.reshape(h * w, C)
    out = 0.0
    for dy, dx, wgt in ((0, 0, (1 - tx) * (1 - ty)), (0, 1, tx * (1 - ty)),
                        (1, 0, (1 - tx) * ty), (1, 1, tx * ty)):
        xi, yi = x0i + dx, y0i + dy
        inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        yc = jnp.clip(yi, 0, h - 1)
        tap = jnp.take(flat, yc * w + xc, axis=0)
        out = out + tap * (wgt * inb.astype(img.dtype))[:, None]
    return out


def _corner_table(value_level: Array) -> Array:
    """(bn, h, w, hd) level values -> (bn, (h+1)*(w+1), 4*hd) corner table.

    Row (y0+1, x0+1) holds the four bilinear corner taps
    [v[y0,x0], v[y0,x0+1], v[y0+1,x0], v[y0+1,x0+1]] with zeros-padding
    semantics baked in (the 1-pixel zero border IS padding_mode="zeros").
    One gathered row then serves a whole bilinear sample: 4x fewer gather
    rows than per-corner takes, each 4*hd = 128 channels wide (a full f32
    vector register row) — TPU gathers are row-count-bound, so this is
    the difference between the deformable attention running at ~1/4 of
    achievable gather throughput and at it."""
    bn, h, w, hd = value_level.shape
    vp = jnp.pad(value_level, ((0, 0), (1, 1), (1, 1), (0, 0)))
    table = jnp.concatenate(
        [vp[:, :-1, :-1], vp[:, :-1, 1:], vp[:, 1:, :-1], vp[:, 1:, 1:]],
        axis=-1,
    )
    return table.reshape(bn, (h + 1) * (w + 1), 4 * hd)


def _table_bilinear(table: Array, hw: Tuple[int, int], gx: Array,
                    gy: Array) -> Array:
    """table (bn, (h+1)*(w+1), 4*hd) from :func:`_corner_table`; gx/gy
    (bn, N) in [-1, 1]. Returns (bn, N, hd) — bilinear samples with
    align_corners=False, zeros padding (identical to
    :func:`_bilinear_sample_nchw` per image)."""
    h, w = hw
    bn, N = gx.shape
    hd = table.shape[-1] // 4
    ix = ((gx + 1.0) * w - 1.0) * 0.5
    iy = ((gy + 1.0) * h - 1.0) * 0.5
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    tx, ty = ix - x0, iy - y0
    # base corners outside [-1, size-1] have ALL four taps out of bounds
    # (the 1-px zero border covers exactly the -1 / size-1 rows/cols)
    x0c = jnp.clip(x0, -1.0, w - 1.0)
    y0c = jnp.clip(y0, -1.0, h - 1.0)
    valid = (x0 == x0c) & (y0 == y0c)
    idx = ((y0c + 1.0) * (w + 1) + (x0c + 1.0)).astype(jnp.int32)
    taps = jax.vmap(lambda t, i: jnp.take(t, i, axis=0))(table, idx)
    taps = taps.reshape(bn, N, 4, hd)
    w4 = jnp.stack(
        [(1 - tx) * (1 - ty), tx * (1 - ty), (1 - tx) * ty, tx * ty],
        axis=-1,
    ) * valid[..., None]
    return (taps * w4[..., None].astype(taps.dtype)).sum(axis=2)


def _deformable_core_tile(
    tables: List[Array], spatial_shapes: List[Tuple[int, int]],
    sampling_locations: Array, attention_weights: Array, hd: int,
) -> Array:
    """One query tile of the deformable-attention gather: tables are the
    per-level corner tables (:func:`_corner_table`); sampling_locations
    (B, Q, nh, L, P, 2) in [0,1]; attention_weights (B, Q, nh, L, P).
    Returns (B, Q, nh*hd). (``MultiScaleDeformableAttention.forward``.)"""
    B, Q, nh, L, P, _ = sampling_locations.shape
    grids = 2.0 * sampling_locations - 1.0
    wgt = attention_weights.transpose(0, 2, 1, 3, 4)  # (B, nh, Q, L, P)
    out = jnp.zeros((B, nh, Q, hd), tables[0].dtype)
    # accumulate the weighted sum per level instead of stacking all levels:
    # the (B, nh, Q, L, P, hd) stack is ~1.2 GB per encoder layer at
    # 4 views x 800x1067 (Q = S = 17.8k) and OOMed the 4-view detection
    # batch on a 16 GB chip; the sum over (L, P) decomposes exactly
    for li, (h, w) in enumerate(spatial_shapes):
        g = grids[:, :, :, li].transpose(0, 2, 1, 3, 4)  # (B, nh, Q, P, 2)
        g = g.reshape(B * nh, Q * P, 2)
        tap = _table_bilinear(tables[li], (h, w), g[..., 0], g[..., 1])
        tap = tap.reshape(B, nh, Q, P, hd)
        out = out + (tap * wgt[:, :, :, li, :, None].astype(tap.dtype)).sum(
            axis=3)
    return out.transpose(0, 2, 1, 3).reshape(B, Q, nh * hd)


def deformable_attention_core(
    value: Array, spatial_shapes: List[Tuple[int, int]],
    sampling_locations: Array, attention_weights: Array,
    query_chunk: Optional[int] = None,
    gather_impl: Optional[str] = None,
) -> Array:
    """Deformable-attention gather, optionally tiled over the query axis.

    value (B, S, nh, hd); sampling_locations (B, Q, nh, L, P, 2) in [0,1];
    attention_weights (B, Q, nh, L, P). Returns (B, Q, nh*hd).

    Two TPU-first structural choices vs the reference CUDA op
    (``env.yaml:33``): (1) each level's values are laid out as a
    zero-padded 4-corner table so ONE gathered row yields a whole bilinear
    sample (:func:`_corner_table` — 4x fewer gather rows, full-width
    vector rows); (2) the query axis is optionally tiled with ``lax.map``
    so the tap temporaries scale with the tile, not the full
    (views x queries x levels x points) product — the round-3 HBM blowup
    that forced single-view detection batches on a 16 GB chip. The tables
    are built ONCE per call, outside the tile loop. Identical math:
    queries are independent in the gather; the pad tail is sliced off.

    ``gather_impl="pallas"`` routes the gather through the Mosaic kernel
    (:func:`gather_pallas.deformable_gather_pallas` — tables VMEM-resident,
    row loads on the scalar core instead of XLA's index-serial take loop);
    ``"pallas_interpret"`` is the same math interpreted (CPU test tier).
    The kernel gathers in f32 and accumulates in f32 — for bf16 tables the
    XLA path sums taps in bf16, so the two agree to bf16 rounding, the
    kernel being the more precise one.
    """
    B, S, nh, hd = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    tables = []
    start = 0
    for h, w in spatial_shapes:
        v = value[:, start : start + h * w]        # (B, hw, nh, hd)
        v = v.transpose(0, 2, 1, 3).reshape(B * nh, h, w, hd)
        tables.append(_corner_table(v))
        start += h * w
    # The Mosaic kernel is built for the production head width: 4*hd = 128
    # channels = exactly one f32 vector row. Off-width heads (tiny test
    # configs) crash the TPU backend compiler on sub-128-lane row accesses
    # (probed: hd=8 dies in the compile helper with no diagnostic), so
    # they take the XLA path — every real GroundingDINO checkpoint has
    # d_model=256 / 8 heads = hd=32. Interpret mode never reaches that
    # compiler, so it runs at any width (CPU test tier, tiny configs).
    if (gather_impl is not None and gather_impl.startswith("pallas")
            and (4 * hd == 128 or gather_impl == "pallas_interpret")):
        from d3fields_tpu.models.groundingdino.gather_pallas import (
            deformable_gather_pallas)

        return deformable_gather_pallas(
            jnp.concatenate(tables, axis=1), tuple(spatial_shapes),
            sampling_locations, attention_weights,
            interpret=(gather_impl == "pallas_interpret"))
    if query_chunk is None or Q <= query_chunk:
        return _deformable_core_tile(
            tables, spatial_shapes, sampling_locations, attention_weights, hd
        )
    qc = query_chunk
    nt = -(-Q // qc)
    pad = nt * qc - Q
    loc = jnp.pad(sampling_locations,
                  ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0), (0, 0)))
    wgt = jnp.pad(attention_weights,
                  ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0)))
    loc = loc.reshape((B, nt, qc) + loc.shape[2:]).transpose(1, 0, 2, 3, 4, 5, 6)
    wgt = wgt.reshape((B, nt, qc) + wgt.shape[2:]).transpose(1, 0, 2, 3, 4, 5)
    out = jax.lax.map(
        lambda lw: _deformable_core_tile(tables, spatial_shapes, lw[0],
                                         lw[1], hd),
        (loc, wgt),
    )  # (nt, B, qc, nh*hd)
    return out.transpose(1, 0, 2, 3).reshape(B, nt * qc, nh * hd)[:, :Q]


def deformable_attention(
    p: Dict, hidden: Array, encoder_hidden: Array, pos: Optional[Array],
    reference_points: Array, spatial_shapes: List[Tuple[int, int]],
    num_heads: int, n_points: int, query_chunk: Optional[int] = None,
    gather_impl: Optional[str] = None,
) -> Array:
    """(``GroundingDinoMultiscaleDeformableAttention``): hidden (B, Q, D)
    queries; encoder_hidden (B, S, D) values; reference_points
    (B, Q, L, 2 or 4) normalized. Sampling COORDINATES are always f32 —
    under a bf16 compute dtype a [0,1] coordinate quantizes to ~4 px steps
    at the 800-scale, which would wreck the gather."""
    B, Q, D = hidden.shape
    S = encoder_hidden.shape[1]
    L = len(spatial_shapes)
    if pos is not None:
        hidden = hidden + pos
    value = (encoder_hidden @ p["value_w"] + p["value_b"]).reshape(
        B, S, num_heads, D // num_heads
    )
    offsets = (hidden @ p["offs_w"] + p["offs_b"]).astype(jnp.float32).reshape(
        B, Q, num_heads, L, n_points, 2
    )
    weights = (hidden @ p["attw_w"] + p["attw_b"]).reshape(
        B, Q, num_heads, L * n_points
    )
    weights = jax.nn.softmax(weights.astype(jnp.float32), -1).reshape(
        B, Q, num_heads, L, n_points)
    reference_points = reference_points.astype(jnp.float32)
    if reference_points.shape[-1] == 2:
        normalizer = jnp.asarray(
            [[w, h] for h, w in spatial_shapes], jnp.float32
        )  # (L, 2) in (x, y) order
        loc = (
            reference_points[:, :, None, :, None, :]
            + offsets / normalizer[None, None, None, :, None, :]
        )
    else:
        loc = (
            reference_points[:, :, None, :, None, :2]
            + offsets / n_points * reference_points[:, :, None, :, None, 2:] * 0.5
        )
    out = deformable_attention_core(value, spatial_shapes, loc, weights,
                                    query_chunk, gather_impl)
    return out.astype(hidden.dtype) @ p["out_w"] + p["out_b"]


# ---------------------------------------------------------------------------
# attention / encoder / decoder building blocks
# ---------------------------------------------------------------------------

def _mha(p, queries, keys, values, num_heads, bias=None):
    """GroundingDinoMultiheadAttention: additive mask pre-softmax."""
    B, Tq, D = queries.shape
    Tk = keys.shape[1]
    hd = D // num_heads

    def proj(name, t, T):
        v = t @ p[name + "_w"] + p[name + "_b"]
        return v.reshape(B, T, num_heads, hd).transpose(0, 2, 1, 3)

    q, k, v = proj("q", queries, Tq), proj("k", keys, Tk), proj("v", values, Tk)
    logits = (q @ k.transpose(0, 1, 3, 2)) / np.sqrt(hd)
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(queries.dtype)
    out = (probs @ v).transpose(0, 2, 1, 3).reshape(B, Tq, D)
    return out @ p["o_w"] + p["o_b"]


def _bi_attention(p, vision, text, text_pad_mask, embed_dim, num_heads):
    """GroundingDinoBiMultiHeadAttention: returns (delta_v, delta_t).
    text_pad_mask (B, Lt) True = padding."""
    B, Tv, _ = vision.shape
    Tt = text.shape[1]
    hd = embed_dim // num_heads

    def rs(t, T):
        return t.reshape(B, T, num_heads, hd).transpose(0, 2, 1, 3)

    vq = rs((vision @ p["v_proj_w"] + p["v_proj_b"]) * (hd ** -0.5), Tv)
    tk = rs(text @ p["t_proj_w"] + p["t_proj_b"], Tt)
    vv = rs(vision @ p["vv_proj_w"] + p["vv_proj_b"], Tv)
    tv = rs(text @ p["tv_proj_w"] + p["tv_proj_b"], Tt)

    attn = vq @ tk.transpose(0, 1, 3, 2)  # (B, nh, Tv, Tt)
    attn = attn - attn.max()
    attn = jnp.clip(attn, -50000, 50000)
    attn_t = attn.transpose(0, 1, 3, 2)
    attn_t = attn_t - attn_t.max(-1, keepdims=True)
    attn_t = jnp.clip(attn_t, -50000, 50000)

    # text->vision: no vision padding in this pipeline. Softmax always in
    # f32 (bf16 exp/normalize would quantize the attention distribution)
    t_probs = jax.nn.softmax(attn_t.astype(jnp.float32), -1).astype(text.dtype)
    if text_pad_mask is not None:
        attn = jnp.where(text_pad_mask[:, None, None, :], -jnp.inf, attn)
    v_probs = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(vision.dtype)

    dv = (v_probs @ tv).transpose(0, 2, 1, 3).reshape(B, Tv, embed_dim)
    dt = (t_probs @ vv).transpose(0, 2, 1, 3).reshape(B, Tt, embed_dim)
    return dv @ p["out_v_w"] + p["out_v_b"], dt @ p["out_t_w"] + p["out_t_b"]


def encoder_layer(p, cfg, vision, text, pos_embed, reference_points,
                  spatial_shapes, text_self_mask, text_pad_mask,
                  text_position_ids, query_chunk=None, gather_impl=None):
    """(``GroundingDinoEncoderLayer``): fusion -> text enhancer ->
    deformable vision self-attention."""
    # fusion (pre-LN + layer-scale residuals)
    vn = _layer_norm(vision, p["fusion"]["ln_v_w"], p["fusion"]["ln_v_b"])
    tn = _layer_norm(text, p["fusion"]["ln_t_w"], p["fusion"]["ln_t_b"])
    dv, dt = _bi_attention(
        p["fusion"]["attn"], vn, tn, text_pad_mask,
        cfg.encoder_ffn_dim // 2, cfg.encoder_heads // 2,
    )
    vision = vn + p["fusion"]["scale_v"] * dv
    text = tn + p["fusion"]["scale_t"] * dt

    # text enhancer (self-attention over per-caption segments)
    tp = get_sine_pos_embed(
        text_position_ids[..., None].astype(jnp.float32), cfg.d_model,
        exchange_xy=False,
    )
    bias = jnp.where(text_self_mask[:, None], 0.0, -1e30)  # (B,1,Lt,Lt)
    q = text + tp.astype(text.dtype)
    att = _mha(p["text"]["attn"], q, q, text, cfg.encoder_heads // 2, bias)
    text = _layer_norm(text + att, p["text"]["ln1_w"], p["text"]["ln1_b"])
    h = jax.nn.relu(text @ p["text"]["fc1_w"] + p["text"]["fc1_b"])
    h = h @ p["text"]["fc2_w"] + p["text"]["fc2_b"]
    text = _layer_norm(text + h, p["text"]["ln2_w"], p["text"]["ln2_b"])

    # deformable vision self-attention (query-tiled: Q = S is the full
    # multi-scale pixel count, where the gather temporaries blow up)
    att = deformable_attention(
        p["deform"]["attn"], vision, vision, pos_embed, reference_points,
        spatial_shapes, cfg.encoder_heads, cfg.encoder_points, query_chunk,
        gather_impl,
    )
    vision = _layer_norm(vision + att, p["deform"]["ln1_w"], p["deform"]["ln1_b"])
    h = jax.nn.relu(vision @ p["deform"]["fc1_w"] + p["deform"]["fc1_b"])
    h = h @ p["deform"]["fc2_w"] + p["deform"]["fc2_b"]
    vision = _layer_norm(vision + h, p["deform"]["ln2_w"], p["deform"]["ln2_b"])
    return vision, text


def decoder_layer(p, cfg, hidden, query_pos, reference_points_input,
                  vision, text, spatial_shapes, text_bias=None):
    """(``GroundingDinoDecoderLayer``): self-attn -> text cross-attn ->
    deformable vision cross-attn -> FFN."""
    q = hidden + query_pos
    att = _mha(p["self_attn"], q, q, hidden, cfg.decoder_heads)
    hidden = _layer_norm(hidden + att, p["ln1_w"], p["ln1_b"])

    q = hidden + query_pos
    att = _mha(p["text_attn"], q, text, text, cfg.decoder_heads, text_bias)
    hidden = _layer_norm(hidden + att, p["ln2_w"], p["ln2_b"])

    att = deformable_attention(
        p["cross_attn"], hidden, vision, query_pos, reference_points_input,
        spatial_shapes, cfg.decoder_heads, cfg.decoder_points,
    )
    hidden = _layer_norm(hidden + att, p["ln3_w"], p["ln3_b"])

    h = jax.nn.relu(hidden @ p["fc1_w"] + p["fc1_b"])
    h = h @ p["fc2_w"] + p["fc2_b"]
    return _layer_norm(hidden + h, p["ln4_w"], p["ln4_b"])


def contrastive_logits(vision_hidden, text_hidden, text_token_mask,
                       max_text_len):
    """(``GroundingDinoContrastiveEmbedding``): (B, Q, max_text_len)."""
    out = vision_hidden @ text_hidden.transpose(0, 2, 1)
    out = jnp.where(text_token_mask[:, None, :], out, -jnp.inf)
    pad = max_text_len - out.shape[-1]
    if pad > 0:
        out = jnp.pad(out, ((0, 0), (0, 0), (0, pad)),
                      constant_values=-jnp.inf)
    return out[..., :max_text_len]


# ---------------------------------------------------------------------------
# text preprocessing (host-side; variable structure)
# ---------------------------------------------------------------------------

def generate_text_masks(input_ids: np.ndarray):
    """Per-caption self-attention masks and restarting position ids
    (``generate_masks_with_special_tokens_and_transfer_map``)."""
    bsz, L = input_ids.shape
    special = np.isin(input_ids, SPECIAL_TOKEN_IDS)
    attn = np.eye(L, dtype=bool)[None].repeat(bsz, 0)
    pos_ids = np.zeros((bsz, L), np.int64)
    for b in range(bsz):
        prev = 0
        for col in np.nonzero(special[b])[0]:
            if col == 0 or col == L - 1:
                attn[b, col, col] = True
                pos_ids[b, col] = 0
            else:
                attn[b, prev + 1 : col + 1, prev + 1 : col + 1] = True
                pos_ids[b, prev + 1 : col + 1] = np.arange(0, col - prev)
            prev = col
    return attn, pos_ids


# ---------------------------------------------------------------------------
# full forward
# ---------------------------------------------------------------------------

def _grid_proposals(spatial_shapes, d_level_scale=0.05):
    """Per-pixel box proposals (``generate_encoder_output_proposals`` with
    an all-valid mask): (S, 4) in (cx, cy, w, h), inverse-sigmoid space with
    invalid positions +inf."""
    parts = []
    for level, (h, w) in enumerate(spatial_shapes):
        gy, gx = np.meshgrid(np.arange(h, dtype=np.float32),
                             np.arange(w, dtype=np.float32), indexing="ij")
        grid = np.stack([(gx + 0.5) / w, (gy + 0.5) / h], -1)
        wh = np.full_like(grid, d_level_scale * (2.0 ** level))
        parts.append(np.concatenate([grid, wh], -1).reshape(-1, 4))
    props = np.concatenate(parts, 0)
    valid = ((props > 0.01) & (props < 0.99)).all(-1, keepdims=True)
    out = np.log(props / (1 - props))
    out[~valid[:, 0]] = np.inf
    return jnp.asarray(out), jnp.asarray(valid[:, 0])


@functools.partial(jax.jit,
                   static_argnames=("cfg", "spatial_shapes", "query_chunk",
                                    "gather_impl"))
def _transformer_forward(params, cfg: GroundingDinoConfig,
                         vision_flat, pos_flat, spatial_shapes,
                         text_features, text_self_mask, text_pad_mask,
                         text_position_ids, text_token_mask,
                         query_chunk=None, gather_impl=None):
    """Everything after the backbones: encoder, query selection, decoder,
    heads. Returns (logits (B, Q, max_text_len), boxes (B, Q, 4) cxcywh).

    The encoder runs at the dtype of ``vision_flat`` (bf16 under the gated
    MXU path); query selection, the decoder, and every head run f32 — the
    discrete top-k and the box heads are where dtype noise becomes entirely
    different detections."""
    B = vision_flat.shape[0]
    L = len(spatial_shapes)

    # encoder reference points: per-level normalized pixel-center grids,
    # broadcast over levels (valid_ratios == 1, no padding)
    refs = []
    for h, w in spatial_shapes:
        gy, gx = np.meshgrid(
            np.linspace(0.5, h - 0.5, h, dtype=np.float32) / h,
            np.linspace(0.5, w - 0.5, w, dtype=np.float32) / w,
            indexing="ij",
        )
        refs.append(np.stack([gx, gy], -1).reshape(-1, 2))
    ref_points = jnp.asarray(np.concatenate(refs, 0))  # (S, 2)
    ref_points = jnp.broadcast_to(
        ref_points[None, :, None, :], (B, ref_points.shape[0], L, 2)
    )

    dt = vision_flat.dtype
    vision, text = vision_flat, text_features.astype(dt)
    enc_params = params["encoder_layers"]
    if dt != jnp.float32:
        enc_params = jax.tree.map(
            lambda x: x.astype(dt)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, enc_params)
    for lp in enc_params:
        vision, text = encoder_layer(
            lp, cfg, vision, text, pos_flat.astype(dt), ref_points,
            spatial_shapes, text_self_mask, text_pad_mask,
            text_position_ids, query_chunk, gather_impl,
        )
    vision = vision.astype(jnp.float32)
    text = text.astype(jnp.float32)

    # ---- language-guided query selection (two-stage) ----
    proposals, proposals_valid = _grid_proposals(spatial_shapes)
    obj_query = jnp.where(proposals_valid[None, :, None], vision, 0.0)
    obj_query = obj_query @ params["enc_out_w"] + params["enc_out_b"]
    obj_query = _layer_norm(obj_query, params["enc_out_ln_w"], params["enc_out_ln_b"])

    enc_logits = contrastive_logits(
        obj_query, text, text_token_mask, cfg.max_text_len
    )
    delta = _mlp_head(obj_query, params["enc_bbox_head"])
    coord_logits = delta + proposals[None]

    topk_scores = jnp.max(enc_logits, -1)  # (B, S)
    _, topk_idx = jax.lax.top_k(topk_scores, cfg.num_queries)
    topk_coords = jnp.take_along_axis(
        coord_logits, topk_idx[..., None], axis=1
    )
    reference = jax.nn.sigmoid(topk_coords)  # (B, Q, 4)

    target = jnp.broadcast_to(
        params["query_embed"][None], (B,) + params["query_embed"].shape
    )

    # ---- decoder with iterative box refinement ----
    text_bias = jnp.where(text_pad_mask[:, None, None, :], -1e30, 0.0) \
        if text_pad_mask is not None else None
    hidden = target
    intermediate = []

    def _logit(r):
        rc = jnp.clip(r, 1e-5, 1 - 1e-5)
        return jnp.log(rc / (1 - rc))

    ref_into_last = reference
    for li, lp in enumerate(params["decoder_layers"]):
        ref_input = jnp.broadcast_to(
            reference[:, :, None, :], (B, cfg.num_queries, L, 4)
        )
        qpos = get_sine_pos_embed(reference, cfg.d_model // 2)
        qpos = _mlp_head(qpos, params["ref_head"])
        hidden = decoder_layer(
            lp, cfg, hidden, qpos, ref_input, vision, text, spatial_shapes,
            text_bias,
        )
        # in-loop refinement uses the UN-normed hidden (HF decoder hack)
        ref_into_last = reference
        delta = _mlp_head(hidden, params["bbox_head"])
        reference = jax.nn.sigmoid(delta + _logit(reference))
        intermediate.append(
            _layer_norm(hidden, params["dec_ln_w"], params["dec_ln_b"])
        )

    final_hidden = intermediate[-1]
    logits = contrastive_logits(
        final_hidden, text, text_token_mask, cfg.max_text_len
    )
    # final pred_boxes re-apply the bbox head to the LAYER-NORMED final
    # hidden against the reference points that entered the last layer
    # (GroundingDinoForObjectDetection.forward, NOT the in-loop refs —
    # they differ once decoder.layer_norm is non-identity)
    final_delta = _mlp_head(final_hidden, params["bbox_head"])
    boxes = jax.nn.sigmoid(final_delta + _logit(ref_into_last))
    return logits, boxes


def groundingdino_forward(params, cfg: GroundingDinoConfig,
                          pixels: Array, input_ids: np.ndarray,
                          compute_dtype: str = "float32",
                          query_chunk: Optional[int] = None,
                          gather_impl: Optional[str] = None):
    """pixels (B, H, W, 3) normalized; input_ids (B, Lt) numpy.

    Returns (logits (B, Q, max_text_len), boxes (B, Q, 4) normalized
    cxcywh) — the contract of ``GroundingDinoForObjectDetection``.

    The f32 default runs at f32 matmul precision: default-precision TPU
    matmuls plus the discrete top-k query selection turn small numeric
    noise into entirely different detections (measured: 0.59 box drift at
    default precision vs 1e-5 at f32). ``compute_dtype="bfloat16"`` is the
    gated MXU path (same pattern as SAM's trunk, sam/model.py:172-190): the
    Swin backbone, input projections, and the 6 feature-enhancer encoder
    layers run bf16 while BERT, query selection, the decoder, and all heads
    stay f32 — the encoder is where the FLOPs and the deformable-gather
    memory live, the f32 tail keeps the discrete selection stable.
    Detection-level agreement vs f32 is pinned in
    tests/test_groundingdino.py::test_bf16_trunk_agreement.

    ``query_chunk`` tiles the encoder's deformable-attention gather over
    queries (identical numerics; bounds the per-layer temporaries so a
    multi-view 800-scale batch fits one chip's HBM).

    The text self-attention mask derives from the DATA of input_ids
    (special-token positions), so it is computed on the host; everything
    downstream — BERT, Swin, input projections, transformer — is one jitted
    executable (an eager trunk costs minutes of per-primitive remote
    compiles through the TPU tunnel on first call and per-op dispatch
    after).
    """
    text_self_mask_np, pos_ids_np = generate_text_masks(np.asarray(input_ids))
    token_mask_np = np.ones_like(np.asarray(input_ids), bool)
    prec = "float32" if compute_dtype == "float32" else "default"
    with jax.default_matmul_precision(prec):
        return _groundingdino_forward_impl(
            params, cfg, pixels, jnp.asarray(input_ids),
            jnp.asarray(text_self_mask_np), jnp.asarray(pos_ids_np),
            jnp.asarray(token_mask_np), compute_dtype, query_chunk,
            gather_impl,
        )


@functools.partial(jax.jit,
                   static_argnames=("cfg", "compute_dtype", "query_chunk",
                                    "gather_impl"))
def _groundingdino_forward_impl(params, cfg, pixels, input_ids,
                                text_self_mask, pos_ids, token_mask,
                                compute_dtype="float32", query_chunk=None,
                                gather_impl=None):
    dt = jnp.dtype(compute_dtype)
    # text trunk + projection (always f32: tiny cost, feeds the contrastive
    # logits that gate detection directly)
    text = B.bert_encode(
        params["bert"], input_ids, text_self_mask,
        jnp.zeros_like(input_ids), pos_ids, cfg.text,
    )
    text = text @ params["text_proj_w"] + params["text_proj_b"]

    # vision trunk + input projections (+ extra stride-2 level) at dt
    swin_p, proj_p = params["swin"], params["input_proj"]
    if dt != jnp.float32:
        cast = lambda t: jax.tree.map(
            lambda x: x.astype(dt)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
        swin_p, proj_p = cast(swin_p), cast(proj_p)
    feats = SW.swin_backbone(swin_p, pixels.astype(dt), cfg.swin)
    maps = []
    for li, f in enumerate(feats):
        p = proj_p[li]
        m = jnp.einsum("bhwc,co->bhwo", f, p["conv_w"]) + p["conv_b"]
        m = _group_norm32(m, p["gn_w"], p["gn_b"])
        maps.append(m)
    for li in range(len(feats), cfg.num_feature_levels):
        p = proj_p[li]
        src = feats[-1] if li == len(feats) else maps[-1]
        m = jax.lax.conv_general_dilated(
            src, p["conv_w"], (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["conv_b"]
        m = _group_norm32(m, p["gn_w"], p["gn_b"])
        maps.append(m)

    spatial_shapes = tuple((m.shape[1], m.shape[2]) for m in maps)
    flat = jnp.concatenate([m.reshape(m.shape[0], -1, cfg.d_model) for m in maps], 1)
    pos = jnp.concatenate([
        sine_position_embedding(h, w, cfg.d_model, cfg.pe_temperature)
        + params["level_embed"][li]
        for li, (h, w) in enumerate(spatial_shapes)
    ], 0)[None]

    return _transformer_forward(
        params, cfg, flat, pos, spatial_shapes, text,
        text_self_mask, ~token_mask, pos_ids, token_mask, query_chunk,
        gather_impl,
    )


def _group_norm32(x, w, b, groups=32, eps=1e-5):
    """torch GroupNorm(32, C) over NHWC."""
    Bn, H, W, C = x.shape
    g = min(groups, C)
    xg = x.reshape(Bn, H, W, g, C // g).astype(jnp.float32)
    mu = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = xg.var(axis=(1, 2, 4), keepdims=True)
    xg = (xg - mu) * jax.lax.rsqrt(var + eps)
    return (xg.reshape(Bn, H, W, C) * w + b).astype(x.dtype)


# ---------------------------------------------------------------------------
# HF weight conversion
# ---------------------------------------------------------------------------

def _lin(sd, n):
    return (jnp.asarray(np.asarray(sd[n]).T), jnp.asarray(np.asarray(sd[n.replace('.weight', '.bias')])))


def _mha_t(sd, pre):
    qw, qb = _lin(sd, pre + ".query.weight")
    kw, kb = _lin(sd, pre + ".key.weight")
    vw, vb = _lin(sd, pre + ".value.weight")
    ow, ob = _lin(sd, pre + ".out_proj.weight")
    return {"q_w": qw, "q_b": qb, "k_w": kw, "k_b": kb, "v_w": vw, "v_b": vb,
            "o_w": ow, "o_b": ob}


def _deform_t(sd, pre):
    ow, obias = _lin(sd, pre + ".output_proj.weight")
    vw, vb = _lin(sd, pre + ".value_proj.weight")
    sw_, sb = _lin(sd, pre + ".sampling_offsets.weight")
    aw, ab = _lin(sd, pre + ".attention_weights.weight")
    return {"value_w": vw, "value_b": vb, "offs_w": sw_, "offs_b": sb,
            "attw_w": aw, "attw_b": ab, "out_w": ow, "out_b": obias}


def _mlp_head_t(sd, pre, n_layers):
    return [
        _lin(sd, f"{pre}.layers.{i}.weight") for i in range(n_layers)
    ]


def build_random_hf(cfg: GroundingDinoConfig, seed: int = 0):
    """A randomly-initialized HF ``GroundingDinoForObjectDetection`` at
    ``cfg``'s scale — the oracle/smoke-mode weight source (the test oracle
    fixture and the bench's random-weight detector both build here so they
    cannot drift apart). HF zero-initializes the bbox-head output layers
    and leaves ``decoder.layer_norm`` at identity, which once masked a real
    final-box bug — randomize them so every path is exercised."""
    import torch
    from transformers import (
        BertConfig as HFBert, GroundingDinoConfig as HFGDC,
        GroundingDinoForObjectDetection, SwinConfig as HFSwin,
    )

    sw, tx = cfg.swin, cfg.text
    hfc = HFGDC(
        backbone_config=HFSwin(
            embed_dim=sw.embed_dim, depths=list(sw.depths),
            num_heads=list(sw.num_heads), window_size=sw.window_size,
            mlp_ratio=sw.mlp_ratio, patch_size=sw.patch_size,
            out_features=[f"stage{i + 1}" for i in sw.out_stages],
        ),
        text_config=HFBert(
            vocab_size=tx.vocab_size, hidden_size=tx.hidden_size,
            num_hidden_layers=tx.num_layers, num_attention_heads=tx.num_heads,
            intermediate_size=tx.intermediate_size,
            max_position_embeddings=tx.max_position,
            type_vocab_size=tx.type_vocab_size,
        ),
        d_model=cfg.d_model, encoder_layers=cfg.encoder_layers,
        decoder_layers=cfg.decoder_layers,
        encoder_attention_heads=cfg.encoder_heads,
        decoder_attention_heads=cfg.decoder_heads,
        encoder_ffn_dim=cfg.encoder_ffn_dim,
        decoder_ffn_dim=cfg.decoder_ffn_dim,
        num_queries=cfg.num_queries, max_text_len=cfg.max_text_len,
        num_feature_levels=cfg.num_feature_levels,
    )
    torch.manual_seed(seed)
    hf = GroundingDinoForObjectDetection(hfc).eval()
    with torch.no_grad():
        for head in hf.bbox_embed:
            head.layers[-1].weight.normal_(0, 0.05)
            head.layers[-1].bias.normal_(0, 0.05)
        hf.model.decoder.layer_norm.weight.normal_(1.0, 0.2)
        hf.model.decoder.layer_norm.bias.normal_(0, 0.2)
        hf.model.encoder_output_bbox_embed.layers[-1].weight.normal_(0, 0.05)
        hf.model.encoder_output_bbox_embed.layers[-1].bias.normal_(0, 0.05)
    return hf


def random_params(cfg: GroundingDinoConfig, seed: int = 0) -> Dict:
    """Random-weight params for smoke/bench runs (no checkpoint), converted
    through the same audited path real checkpoints take (~15 s at swin-t
    scale for the torch construction)."""
    hf = build_random_hf(cfg, seed)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    return convert_hf_state_dict(sd, cfg)


def convert_hf_state_dict(sd, cfg: GroundingDinoConfig) -> Dict:
    """Convert a huggingface ``GroundingDinoForObjectDetection`` state dict."""
    sd = np_view(sd)
    g = lambda n: jnp.asarray(sd[n])

    swin_p = SW.convert_hf_swin(sd, cfg.swin,
                                prefix="model.backbone.conv_encoder.model.")
    bert_p = B.convert_hf_bert(sd, cfg.text, prefix="model.text_backbone.")

    input_proj = []
    for li in range(cfg.num_feature_levels):
        pre = f"model.input_proj_vision.{li}"
        w = sd[pre + ".0.weight"]
        if w.shape[-1] == 1:  # 1x1 conv as einsum
            conv_w = jnp.asarray(w[:, :, 0, 0].T)
        else:
            conv_w = jnp.asarray(w.transpose(2, 3, 1, 0))
        input_proj.append({
            "conv_w": conv_w,
            "conv_b": g(pre + ".0.bias"),
            "gn_w": g(pre + ".1.weight"),
            "gn_b": g(pre + ".1.bias"),
        })

    def fusion_t(pre):
        a = pre + ".attn"
        def l(n):
            return _lin(sd, a + "." + n + ".weight")
        vp = l("vision_proj"); tp = l("text_proj")
        vv = l("values_vision_proj"); tv = l("values_text_proj")
        ov = l("out_vision_proj"); ot = l("out_text_proj")
        return {
            "ln_v_w": g(pre + ".layer_norm_vision.weight"),
            "ln_v_b": g(pre + ".layer_norm_vision.bias"),
            "ln_t_w": g(pre + ".layer_norm_text.weight"),
            "ln_t_b": g(pre + ".layer_norm_text.bias"),
            "scale_v": g(pre + ".vision_param"),
            "scale_t": g(pre + ".text_param"),
            "attn": {
                "v_proj_w": vp[0], "v_proj_b": vp[1],
                "t_proj_w": tp[0], "t_proj_b": tp[1],
                "vv_proj_w": vv[0], "vv_proj_b": vv[1],
                "tv_proj_w": tv[0], "tv_proj_b": tv[1],
                "out_v_w": ov[0], "out_v_b": ov[1],
                "out_t_w": ot[0], "out_t_b": ot[1],
            },
        }

    enc_layers = []
    for i in range(cfg.encoder_layers):
        pre = f"model.encoder.layers.{i}"
        te = pre + ".text_enhancer_layer"
        fc1 = _lin(sd, te + ".fc1.weight")
        fc2 = _lin(sd, te + ".fc2.weight")
        dl = pre + ".deformable_layer"
        dfc1 = _lin(sd, dl + ".fc1.weight")
        dfc2 = _lin(sd, dl + ".fc2.weight")
        enc_layers.append({
            "fusion": fusion_t(pre + ".fusion_layer"),
            "text": {
                "attn": _mha_t(sd, te + ".self_attn"),
                "fc1_w": fc1[0], "fc1_b": fc1[1],
                "fc2_w": fc2[0], "fc2_b": fc2[1],
                "ln1_w": g(te + ".layer_norm_before.weight"),
                "ln1_b": g(te + ".layer_norm_before.bias"),
                "ln2_w": g(te + ".layer_norm_after.weight"),
                "ln2_b": g(te + ".layer_norm_after.bias"),
            },
            "deform": {
                "attn": _deform_t(sd, dl + ".self_attn"),
                "ln1_w": g(dl + ".self_attn_layer_norm.weight"),
                "ln1_b": g(dl + ".self_attn_layer_norm.bias"),
                "fc1_w": dfc1[0], "fc1_b": dfc1[1],
                "fc2_w": dfc2[0], "fc2_b": dfc2[1],
                "ln2_w": g(dl + ".final_layer_norm.weight"),
                "ln2_b": g(dl + ".final_layer_norm.bias"),
            },
        })

    dec_layers = []
    for i in range(cfg.decoder_layers):
        pre = f"model.decoder.layers.{i}"
        fc1 = _lin(sd, pre + ".fc1.weight")
        fc2 = _lin(sd, pre + ".fc2.weight")
        dec_layers.append({
            "self_attn": _mha_t(sd, pre + ".self_attn"),
            "text_attn": _mha_t(sd, pre + ".encoder_attn_text"),
            "cross_attn": _deform_t(sd, pre + ".encoder_attn"),
            "ln1_w": g(pre + ".self_attn_layer_norm.weight"),
            "ln1_b": g(pre + ".self_attn_layer_norm.bias"),
            "ln2_w": g(pre + ".encoder_attn_text_layer_norm.weight"),
            "ln2_b": g(pre + ".encoder_attn_text_layer_norm.bias"),
            "ln3_w": g(pre + ".encoder_attn_layer_norm.weight"),
            "ln3_b": g(pre + ".encoder_attn_layer_norm.bias"),
            "fc1_w": fc1[0], "fc1_b": fc1[1],
            "fc2_w": fc2[0], "fc2_b": fc2[1],
            "ln4_w": g(pre + ".final_layer_norm.weight"),
            "ln4_b": g(pre + ".final_layer_norm.bias"),
        })

    tproj = _lin(sd, "model.text_projection.weight")
    return {
        "swin": swin_p,
        "bert": bert_p,
        "text_proj_w": tproj[0], "text_proj_b": tproj[1],
        "input_proj": input_proj,
        "level_embed": g("model.level_embed"),
        "encoder_layers": enc_layers,
        "decoder_layers": dec_layers,
        "enc_out_w": _lin(sd, "model.enc_output.weight")[0],
        "enc_out_b": _lin(sd, "model.enc_output.weight")[1],
        "enc_out_ln_w": g("model.enc_output_norm.weight"),
        "enc_out_ln_b": g("model.enc_output_norm.bias"),
        "enc_bbox_head": _mlp_head_t(sd, "model.encoder_output_bbox_embed", 3),
        "query_embed": g("model.query_position_embeddings.weight"),
        "ref_head": _mlp_head_t(sd, "model.decoder.reference_points_head", 2),
        "bbox_head": _mlp_head_t(sd, "bbox_embed.0", 3),
        "dec_ln_w": g("model.decoder.layer_norm.weight"),
        "dec_ln_b": g("model.decoder.layer_norm.bias"),
    }
