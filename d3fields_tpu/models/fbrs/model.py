"""f-BRS interactive segmentation model: click dist-maps + HRNet-OCR.

Rebuild of ``DistMapsHRNetModel``
(``XMem/inference/interact/fbrs/model/is_hrnet_model.py:24-67``) and its
click-encoding ``DistMaps`` (``model/ops.py:39-85``): clicks become two
tanh-of-distance channels (positive / negative), a 1x1 "rgb_conv" fuses
them with the image, and HRNet-OCR predicts one instance logit map,
bilinearly (align_corners=True) upsampled to the input size.

The click tensor follows the reference layout: (B, 2*N, 2) rows of (y, x)
with the first N positive and last N negative, invalid rows (-1, -1).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from d3fields_tpu.models.fbrs import hrnet
from d3fields_tpu.models.xmem.blocks import batch_norm, conv2d

Array = jax.Array
Params = Dict[str, Dict[str, Array]]


@dataclasses.dataclass(frozen=True)
class FbrsConfig:
    backbone: hrnet.HrnetConfig = dataclasses.field(
        default_factory=hrnet.HrnetConfig)
    norm_radius: float = 260.0  # fbrs_controller.py:9 (max_size=800 regime)

    @classmethod
    def tiny_test(cls):
        return cls(backbone=hrnet.HrnetConfig(width=4, ocr_width=8,
                                              small=True), norm_radius=20.0)


def dist_maps(points: Array, hw: Tuple[int, int], norm_radius: float) -> Array:
    """(B, 2N, 2) click rows -> (B, H, W, 2) tanh distance features
    (``DistMaps.get_coord_features``, model/ops.py:46-80): per pixel the
    min normalized squared distance over each polarity's valid clicks,
    then ``tanh(2 * sqrt(d))``; rows with max(coord) < 0 are invalid."""
    H, W = hw
    B, N2, _ = points.shape
    n = N2 // 2
    pts = points.reshape(B, 2, n, 2)
    invalid = jnp.max(pts, axis=-1) < 0                      # (B, 2, n)
    ys = jnp.arange(H, dtype=jnp.float32)[:, None, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :, None]
    py = pts[..., 0][:, :, None, None, :]                    # (B,2,1,1,n)
    px = pts[..., 1][:, :, None, None, :]
    d2 = (jnp.square(ys[None, None] - py) + jnp.square(xs[None, None] - px))
    d2 = d2 / (norm_radius * norm_radius)
    d2 = jnp.where(invalid[:, :, None, None, :], 1e6, d2)
    d2 = d2.min(axis=-1)                                     # (B, 2, H, W)
    feat = jnp.tanh(2.0 * jnp.sqrt(d2))
    return feat.transpose(0, 2, 3, 1)                        # NHWC


def rgb_conv(params: Params, image: Array, coord_feats: Array) -> Array:
    """1x1 conv + LeakyReLU(0.2) + BN + 1x1 conv fusing image with click
    features (is_hrnet_model.py:31-36)."""
    x = jnp.concatenate([image, coord_feats], axis=-1)
    p0, p1 = params["rgb_conv.0"], params["rgb_conv.3"]
    x = conv2d(x, p0["w"], p0["b"])
    x = jax.nn.leaky_relu(x, 0.2)
    x = batch_norm(x, params["rgb_conv.2"])
    return conv2d(x, p1["w"], p1["b"])


def _fx(params: Params) -> Params:
    """Backbone sub-dict (keys prefixed ``feature_extractor.``)."""
    pre = "feature_extractor."
    return {k[len(pre):]: v for k, v in params.items() if k.startswith(pre)}


def forward(params: Params, cfg: FbrsConfig, image: Array,
            points: Array) -> Array:
    """(B, H, W, 3) image + clicks -> (B, H, W, 1) instance logits
    (``DistMapsHRNetModel.forward``, is_hrnet_model.py:43-66)."""
    coord = dist_maps(points, image.shape[1:3], cfg.norm_radius)
    x = rgb_conv(params, image, coord)
    out, _ = hrnet.forward(_fx(params), cfg.backbone, x)
    return hrnet.resize_bilinear_ac(out, image.shape[1:3])


forward_jit = jax.jit(forward, static_argnames=("cfg",))


def backbone_feats(params: Params, cfg: FbrsConfig, image: Array,
                   points: Array) -> Array:
    """Head input for f-BRS insertion 'A': the concatenated HRNet feats
    BEFORE the OCR head (``HRNetFeatureBRSPredictor._get_head_input``,
    predictors/brs.py:216-231)."""
    coord = dist_maps(points, image.shape[1:3], cfg.norm_radius)
    x = rgb_conv(params, image, coord)
    return hrnet.compute_feats(_fx(params), cfg.backbone, x)


def head_from_feats(params: Params, cfg: FbrsConfig, feats: Array,
                    out_hw: Tuple[int, int]) -> Array:
    """OCR head on (possibly scale/bias-modulated) backbone feats ->
    full-resolution logits (the f-BRS-B re-run path, brs.py:176-196)."""
    out, _ = hrnet.ocr_head(_fx(params), cfg.backbone, feats)
    return hrnet.resize_bilinear_ac(out, out_hw)


def init_params(key: Array, cfg: FbrsConfig) -> Params:
    k1, k2 = jax.random.split(key)
    params = {f"feature_extractor.{n}": v
              for n, v in hrnet.init_params(k1, cfg.backbone).items()}
    ks = jax.random.split(k2, 2)
    params["rgb_conv.0"] = {
        "w": 0.1 * jax.random.normal(ks[0], (1, 1, 5, 8)),
        "b": jnp.zeros((8,)),
    }
    params["rgb_conv.2"] = {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,)),
                            "mean": jnp.zeros((8,)), "var": jnp.ones((8,))}
    params["rgb_conv.3"] = {
        "w": 0.1 * jax.random.normal(ks[1], (1, 1, 8, 3)),
        "b": jnp.zeros((3,)),
    }
    return params


def detect_config(sd: Dict[str, np.ndarray],
                  norm_radius: float = 260.0) -> FbrsConfig:
    """Auto-detect width / ocr_width / small from a checkpoint, the
    reference's sniffing rules (``inference/utils.py:40-53``)."""
    n_fe = len([k for k in sd if k.startswith("feature_extractor.")])
    ocr = [v for k, v in sd.items()
           if "object_context_block.f_down.1.0.bias" in k]
    width = [v for k, v in sd.items()
             if "stage2.0.branches.0.0.conv1.weight" in k]
    if len(ocr) != 1 or len(width) != 1:
        raise ValueError("not an fbrs HRNet checkpoint (missing sniff keys)")
    return FbrsConfig(
        backbone=hrnet.HrnetConfig(
            width=int(np.asarray(width[0]).shape[0]),
            ocr_width=int(np.asarray(ocr[0]).shape[0]),
            small=n_fe < 1800,
        ),
        norm_radius=norm_radius,
    )


def convert_torch_state_dict(sd: Dict[str, np.ndarray],
                             cfg: Optional[FbrsConfig] = None) -> Tuple[
                                 Params, FbrsConfig]:
    """Full ``DistMapsHRNetModel.state_dict()`` -> params (audited)."""
    cfg = cfg or detect_config(sd)
    fx = {k[len("feature_extractor."):]: v for k, v in sd.items()
          if k.startswith("feature_extractor.")}
    params = {f"feature_extractor.{n}": v for n, v in
              hrnet.convert_torch_state_dict(fx, cfg.backbone).items()}
    for idx, kind in (("0", "conv"), ("2", "bn"), ("3", "conv")):
        name = f"rgb_conv.{idx}"
        if kind == "conv":
            params[name] = {
                "w": jnp.asarray(
                    np.asarray(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)),
                "b": jnp.asarray(np.asarray(sd[f"{name}.bias"])),
            }
        else:
            params[name] = {
                "scale": jnp.asarray(np.asarray(sd[f"{name}.weight"])),
                "bias": jnp.asarray(np.asarray(sd[f"{name}.bias"])),
                "mean": jnp.asarray(np.asarray(sd[f"{name}.running_mean"])),
                "var": jnp.asarray(np.asarray(sd[f"{name}.running_var"])),
            }
    return params, cfg
