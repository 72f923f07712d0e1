"""XMem network: encode_key / encode_value / segment as pure functions.

Rebuild of ``XMem/model/network.py:17-198`` over parameter pytrees. Layouts
are TPU-native NHWC; the object axis is folded into batch for conv stacks
and restored for group ops. Weight conversion consumes the reference torch
checkpoint format (state-dict key names from ``XMem/model/``).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from d3fields_tpu.config import XMemConfig
from d3fields_tpu.models.xmem import blocks as B

from d3fields_tpu.utils.convert import np_view

Array = jax.Array
Params = Dict


# ---------------------------------------------------------------------------
# forward functions
# ---------------------------------------------------------------------------

def encode_key(params: Params, image: Array, *, need_sk: bool = True,
               need_ek: bool = True):
    """image (B, H, W, 3) -> (key, shrinkage, selection, f16, f8, f4).

    Reference ``XMem.encode_key`` (``network.py:41-74``): ResNet-50 trunk +
    key projection. key (B, h, w, CK); shrinkage (B, h, w, 1) or None;
    selection (B, h, w, CK) or None.
    """
    f16, f8, f4 = B.key_encoder(image, params["key_encoder"])
    key, shrinkage, selection = B.key_projection(
        f16, params["key_proj"], need_s=need_sk, need_e=need_ek
    )
    return key, shrinkage, selection, f16, f8, f4


def encode_value(params: Params, image: Array, f16: Array, hidden: Array,
                 masks: Array, *, is_deep_update: bool = True):
    """Value encoding for all objects of one frame.

    image (H, W, 3); f16 (h, w, 1024); hidden (O, h, w, CH);
    masks (O, H, W) probabilities (no background). Returns
    (value (O, h, w, CV), new_hidden). Reference ``XMem.encode_value``
    (``network.py:76-89``) + ``ValueEncoder`` (``modules.py:102-150``):
    per-object input is [image, own_mask, sum_of_other_masks].
    """
    O = masks.shape[0]
    others = jnp.sum(masks, axis=0, keepdims=True) - masks  # (O, H, W)
    img = jnp.broadcast_to(image[None], (O,) + image.shape)
    g = jnp.concatenate(
        [img, masks[..., None], others[..., None]], axis=-1
    )  # (O, H, W, 5)
    g = B.value_encoder_trunk(g, params["value_encoder"])  # (O, h, w, 256)

    f16_b = jnp.broadcast_to(f16[None], (O,) + f16.shape)
    g = B.feature_fusion(f16_b, g, params["value_fuser"])  # (O, h, w, CV)

    if is_deep_update:
        hidden = B.gru_update(
            g, hidden, params["hidden_reinforce"], hidden.shape[-1]
        )
    return g, hidden


def segment(params: Params, f16: Array, f8: Array, f4: Array,
            hidden: Array, memory_readout: Array, *, h_out: bool = True,
            obj_active: Optional[Array] = None):
    """Decode per-object logits from the memory readout.

    f16 (h, w, 1024), f8 (2h, 2w, 512), f4 (4h, 4w, 256);
    hidden (O, h, w, CH); memory_readout (O, h, w, CV).
    ``obj_active`` (O,) bool masks preallocated-but-not-yet-entered object
    slots (multi-group mid-video entry): their probability is forced to 0
    before soft aggregation, which makes them exactly equivalent to absent
    channels (bg product term 1, clipped logit -> softmax weight ~1e-7).
    Returns (new_hidden or None, logits (O, H, W), prob_with_bg (O+1, H, W)).
    Reference ``XMem.segment`` + ``Decoder`` (``network.py:110-125``,
    ``modules.py:214-250``).
    """
    O = memory_readout.shape[0]
    hidden_dim = hidden.shape[-1]
    f16_b = jnp.broadcast_to(f16[None], (O,) + f16.shape)
    g16 = B.feature_fusion(
        f16_b, jnp.concatenate([memory_readout, hidden], axis=-1),
        params["decoder"]["fuser"],
    )  # (O, h, w, 512)

    f8_b = jnp.broadcast_to(f8[None], (O,) + f8.shape)
    f4_b = jnp.broadcast_to(f4[None], (O,) + f4.shape)
    g8 = B.upsample_block(f8_b, g16, params["decoder"]["up_16_8"])
    g4 = B.upsample_block(f4_b, g8, params["decoder"]["up_8_4"])
    logits4 = B.conv2d(
        jax.nn.relu(g4), params["decoder"]["pred"]["w"],
        params["decoder"]["pred"]["b"], padding=1,
    )  # (O, 4h, 4w, 1)

    new_hidden = None
    if h_out:
        g4h = jnp.concatenate([g4, logits4], axis=-1)
        new_hidden = B.hidden_updater(
            g16, g8, g4h, hidden, params["decoder"]["hidden_update"], hidden_dim
        )

    logits = B.upsample_4x_logits(logits4)[..., 0]  # (O, H, W)
    prob = jax.nn.sigmoid(logits)
    if obj_active is not None:
        prob = jnp.where(obj_active[:, None, None], prob, 0.0)
    prob_with_bg = B.soft_aggregate(prob, axis=0)
    return new_hidden, logits, prob_with_bg


# ---------------------------------------------------------------------------
# parameter initialization (random; torch-checkpoint conversion below)
# ---------------------------------------------------------------------------

def _conv_p(rng, kh, kw, cin, cout, bias=True, scale=None):
    scale = scale if scale is not None else float(np.sqrt(2.0 / (kh * kw * cin)))
    p = {"w": jax.random.normal(rng, (kh, kw, cin, cout), jnp.float32) * scale}
    if bias:
        p["b"] = jnp.zeros((cout,))
    return p


def _bn_p(c):
    return {
        "scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
        "mean": jnp.zeros((c,)), "var": jnp.ones((c,)),
    }


def _res_layer_init(rng, kind, cin, cmid, cout, blocks, stride):
    out = []
    for i in range(blocks):
        keys = jax.random.split(rng := jax.random.fold_in(rng, i), 4)
        s = stride if i == 0 else 1
        ci = cin if i == 0 else cout
        if kind == "bottleneck":
            p = {
                "conv1": _conv_p(keys[0], 1, 1, ci, cmid, bias=False),
                "bn1": _bn_p(cmid),
                "conv2": _conv_p(keys[1], 3, 3, cmid, cmid, bias=False),
                "bn2": _bn_p(cmid),
                "conv3": _conv_p(keys[2], 1, 1, cmid, cout, bias=False),
                "bn3": _bn_p(cout),
            }
        else:
            p = {
                "conv1": _conv_p(keys[0], 3, 3, ci, cout, bias=False),
                "bn1": _bn_p(cout),
                "conv2": _conv_p(keys[1], 3, 3, cout, cout, bias=False),
                "bn2": _bn_p(cout),
            }
        if i == 0 and (stride != 1 or ci != cout):
            p["downsample"] = {
                "conv": _conv_p(keys[3], 1, 1, ci, cout, bias=False),
                "bn": _bn_p(cout),
            }
        out.append(p)
    return out


def _group_res_p(rng, cin, cout):
    keys = jax.random.split(rng, 3)
    p = {
        "conv1": _conv_p(keys[0], 3, 3, cin, cout),
        "conv2": _conv_p(keys[1], 3, 3, cout, cout),
    }
    if cin != cout:
        p["downsample"] = _conv_p(keys[2], 3, 3, cin, cout)
    return p


def _cbam_p(rng, c, reduction=16):
    keys = jax.random.split(rng, 3)
    r = c // reduction
    return {
        "mlp1": {"w": jax.random.normal(keys[0], (c, r)) * 0.05, "b": jnp.zeros((r,))},
        "mlp2": {"w": jax.random.normal(keys[1], (r, c)) * 0.05, "b": jnp.zeros((c,))},
        "spatial": _conv_p(keys[2], 7, 7, 2, 1),
    }


def _fusion_p(rng, x_dim, g_dim, mid, out):
    keys = jax.random.split(rng, 3)
    return {
        "block1": _group_res_p(keys[0], x_dim + g_dim, mid),
        "attention": _cbam_p(keys[1], mid),
        "block2": _group_res_p(keys[2], mid, out),
    }


def init_params(rng: jax.Array, cfg: XMemConfig) -> Params:
    """Random parameters with the checkpoint's architecture (for tests and
    training-from-scratch; real weights come from convert_torch_state_dict)."""
    ck, cv, ch = cfg.key_dim, cfg.value_dim, cfg.hidden_dim
    ks = jax.random.split(rng, 16)
    key_encoder = {
        "conv1": _conv_p(ks[0], 7, 7, 3, 64, bias=False),
        "bn1": _bn_p(64),
        "layer1": _res_layer_init(ks[1], "bottleneck", 64, 64, 256, 3, 1),
        "layer2": _res_layer_init(ks[2], "bottleneck", 256, 128, 512, 4, 2),
        "layer3": _res_layer_init(ks[3], "bottleneck", 512, 256, 1024, 6, 2),
    }
    value_encoder = {
        "conv1": _conv_p(ks[4], 7, 7, 5, 64, bias=False),
        "bn1": _bn_p(64),
        "layer1": _res_layer_init(ks[5], "basic", 64, 64, 64, 2, 1),
        "layer2": _res_layer_init(ks[6], "basic", 64, 128, 128, 2, 2),
        "layer3": _res_layer_init(ks[7], "basic", 128, 256, 256, 2, 2),
    }
    return {
        "key_encoder": key_encoder,
        "key_proj": {
            "key": _conv_p(ks[8], 3, 3, 1024, ck),
            "d": _conv_p(ks[9], 3, 3, 1024, 1),
            "e": _conv_p(ks[10], 3, 3, 1024, ck),
        },
        "value_encoder": value_encoder,
        "value_fuser": _fusion_p(ks[11], 1024, 256, cv, cv),
        "hidden_reinforce": _conv_p(ks[12], 3, 3, cv + ch, ch * 3),
        "decoder": {
            "fuser": _fusion_p(ks[13], 1024, cv + ch, 512, 512),
            "hidden_update": {
                "g16": _conv_p(jax.random.fold_in(ks[14], 0), 1, 1, 512, 256),
                "g8": _conv_p(jax.random.fold_in(ks[14], 1), 1, 1, 256, 256),
                "g4": _conv_p(jax.random.fold_in(ks[14], 2), 1, 1, 257, 256),
                "transform": _conv_p(
                    jax.random.fold_in(ks[14], 3), 3, 3, 256 + ch, ch * 3
                ),
            },
            "up_16_8": {
                "skip": _conv_p(jax.random.fold_in(ks[15], 0), 3, 3, 512, 512),
                "out": _group_res_p(jax.random.fold_in(ks[15], 1), 512, 256),
            },
            "up_8_4": {
                "skip": _conv_p(jax.random.fold_in(ks[15], 2), 3, 3, 256, 256),
                "out": _group_res_p(jax.random.fold_in(ks[15], 3), 256, 256),
            },
            "pred": _conv_p(jax.random.fold_in(ks[15], 4), 3, 3, 256, 1),
        },
    }


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------

def _cw(sd, name):
    """torch conv weight (O, I, kh, kw) -> HWIO."""
    return jnp.asarray(np.asarray(sd[name]).transpose(2, 3, 1, 0))


def _conv_t(sd, prefix, bias=True):
    p = {"w": _cw(sd, prefix + ".weight")}
    if bias and prefix + ".bias" in sd:
        p["b"] = jnp.asarray(np.asarray(sd[prefix + ".bias"]))
    return p


def _bn_t(sd, prefix):
    g = lambda n: jnp.asarray(np.asarray(sd[f"{prefix}.{n}"]))
    return {
        "scale": g("weight"), "bias": g("bias"),
        "mean": g("running_mean"), "var": g("running_var"),
    }


def _res_layer_t(sd, prefix, blocks, kind):
    out = []
    for i in range(blocks):
        pre = f"{prefix}.{i}"
        if kind == "bottleneck":
            p = {
                "conv1": _conv_t(sd, pre + ".conv1"), "bn1": _bn_t(sd, pre + ".bn1"),
                "conv2": _conv_t(sd, pre + ".conv2"), "bn2": _bn_t(sd, pre + ".bn2"),
                "conv3": _conv_t(sd, pre + ".conv3"), "bn3": _bn_t(sd, pre + ".bn3"),
            }
        else:
            p = {
                "conv1": _conv_t(sd, pre + ".conv1"), "bn1": _bn_t(sd, pre + ".bn1"),
                "conv2": _conv_t(sd, pre + ".conv2"), "bn2": _bn_t(sd, pre + ".bn2"),
            }
        if pre + ".downsample.0.weight" in sd:
            p["downsample"] = {
                "conv": _conv_t(sd, pre + ".downsample.0"),
                "bn": _bn_t(sd, pre + ".downsample.1"),
            }
        out.append(p)
    return out


def _group_res_t(sd, prefix):
    p = {
        "conv1": _conv_t(sd, prefix + ".conv1"),
        "conv2": _conv_t(sd, prefix + ".conv2"),
    }
    if prefix + ".downsample.weight" in sd:
        p["downsample"] = _conv_t(sd, prefix + ".downsample")
    return p


def _cbam_t(sd, prefix):
    lin = lambda n: {
        "w": jnp.asarray(np.asarray(sd[f"{prefix}.{n}.weight"]).T),
        "b": jnp.asarray(np.asarray(sd[f"{prefix}.{n}.bias"])),
    }
    return {
        "mlp1": lin("ChannelGate.mlp.1"),
        "mlp2": lin("ChannelGate.mlp.3"),
        "spatial": _conv_t(sd, prefix + ".SpatialGate.spatial.conv"),
    }


def _fusion_t(sd, prefix):
    return {
        "block1": _group_res_t(sd, prefix + ".block1"),
        "attention": _cbam_t(sd, prefix + ".attention"),
        "block2": _group_res_t(sd, prefix + ".block2"),
    }


def convert_torch_state_dict(sd, cfg: XMemConfig) -> Params:
    """Convert the reference XMem checkpoint state dict (key names from
    ``XMem/model/network.py`` + ``modules.py``; single->multi-object conv1
    padding as in ``network.py:181-198``)."""
    sd = np_view(sd)

    ve_conv1 = sd["value_encoder.conv1.weight"]
    if ve_conv1.shape[1] == 4:  # single-object checkpoint: pad 'others' chan
        ve_conv1 = np.concatenate(
            [ve_conv1, np.zeros((64, 1, 7, 7), ve_conv1.dtype)], axis=1
        )
        sd["value_encoder.conv1.weight"] = ve_conv1

    return {
        "key_encoder": {
            "conv1": _conv_t(sd, "key_encoder.conv1"),
            "bn1": _bn_t(sd, "key_encoder.bn1"),
            "layer1": _res_layer_t(sd, "key_encoder.res2", 3, "bottleneck"),
            "layer2": _res_layer_t(sd, "key_encoder.layer2", 4, "bottleneck"),
            "layer3": _res_layer_t(sd, "key_encoder.layer3", 6, "bottleneck"),
        },
        "key_proj": {
            "key": _conv_t(sd, "key_proj.key_proj"),
            "d": _conv_t(sd, "key_proj.d_proj"),
            "e": _conv_t(sd, "key_proj.e_proj"),
        },
        "value_encoder": {
            "conv1": _conv_t(sd, "value_encoder.conv1"),
            "bn1": _bn_t(sd, "value_encoder.bn1"),
            "layer1": _res_layer_t(sd, "value_encoder.layer1", 2, "basic"),
            "layer2": _res_layer_t(sd, "value_encoder.layer2", 2, "basic"),
            "layer3": _res_layer_t(sd, "value_encoder.layer3", 2, "basic"),
        },
        "value_fuser": _fusion_t(sd, "value_encoder.fuser"),
        "hidden_reinforce": _conv_t(
            sd, "value_encoder.hidden_reinforce.transform"
        ),
        "decoder": {
            "fuser": _fusion_t(sd, "decoder.fuser"),
            "hidden_update": {
                "g16": _conv_t(sd, "decoder.hidden_update.g16_conv"),
                "g8": _conv_t(sd, "decoder.hidden_update.g8_conv"),
                "g4": _conv_t(sd, "decoder.hidden_update.g4_conv"),
                "transform": _conv_t(sd, "decoder.hidden_update.transform"),
            },
            "up_16_8": {
                "skip": _conv_t(sd, "decoder.up_16_8.skip_conv"),
                "out": _group_res_t(sd, "decoder.up_16_8.out_conv"),
            },
            "up_8_4": {
                "skip": _conv_t(sd, "decoder.up_8_4.skip_conv"),
                "out": _group_res_t(sd, "decoder.up_8_4.out_conv"),
            },
            "pred": _conv_t(sd, "decoder.pred"),
        },
    }
