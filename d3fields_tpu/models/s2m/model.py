"""Scribble-to-Mask (S2M) network: DeepLabV3+ over a 6-channel ResNet-50.

Rebuild of the reference GUI's scribble backend
(``XMem/inference/interact/s2m/s2m_network.py:7-56`` ->
``deeplabv3plus_resnet50`` with ``s2m_resnet.py``'s 6-channel conv1 and
``_deeplab.py``'s DeepLabHeadV3Plus/ASPP) as a functional NHWC forward.
Input channels: RGB (3) + previous mask (1) + positive/negative scribble
maps (2) (``s2m_controller.py:22-38``). Output: one logit map at input
resolution (bilinear align_corners=False upsample).

Parameters are keyed by torch module paths; :func:`param_spec` is the
single source of truth for init and audited conversion (same pattern as
``models/fbrs/hrnet.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from d3fields_tpu.models.xmem.blocks import (
    batch_norm, conv2d, max_pool_3x3_s2,
)

Array = jax.Array
Params = Dict[str, Dict[str, Array]]

# ResNet-50 stage plan: (blocks, planes, stride, dilation of later blocks).
# output_stride=16: layer4 trades its stride for dilation 2
# (s2m_network.py:9-14 -> replace_stride_with_dilation=[F, F, T]).
_STAGES = (
    ("layer1", 3, 64, 1, 1),
    ("layer2", 4, 128, 2, 1),
    ("layer3", 6, 256, 2, 1),
    ("layer4", 3, 512, 1, 2),
)
_ASPP_RATES = (6, 12, 18)  # output_stride=16 rates (s2m_network.py:13)


@dataclasses.dataclass(frozen=True)
class S2mConfig:
    num_classes: int = 1


def _conv(spec, name, cin, cout, k, bias=False):
    spec[name] = {"kind": "conv", "shape": (k, k, cin, cout), "bias": bias}


def _bn(spec, name, c):
    spec[name] = {"kind": "bn", "shape": (c,)}


def param_spec(cfg: S2mConfig) -> Dict[str, dict]:
    spec: Dict[str, dict] = {}
    _conv(spec, "backbone.conv1", 6, 64, 7)
    _bn(spec, "backbone.bn1", 64)
    cin = 64
    for name, blocks, planes, stride, _dil in _STAGES:
        for b in range(blocks):
            p = f"backbone.{name}.{b}"
            _conv(spec, f"{p}.conv1", cin if b == 0 else 4 * planes, planes, 1)
            _bn(spec, f"{p}.bn1", planes)
            _conv(spec, f"{p}.conv2", planes, planes, 3)
            _bn(spec, f"{p}.bn2", planes)
            _conv(spec, f"{p}.conv3", planes, 4 * planes, 1)
            _bn(spec, f"{p}.bn3", 4 * planes)
            if b == 0:
                _conv(spec, f"{p}.downsample.0", cin, 4 * planes, 1)
                _bn(spec, f"{p}.downsample.1", 4 * planes)
        cin = 4 * planes

    # DeepLabHeadV3Plus (_deeplab.py:30-62)
    _conv(spec, "classifier.project.0", 256, 48, 1)
    _bn(spec, "classifier.project.1", 48)
    # ASPP branch 0: 1x1; branches 1-3: dilated 3x3; branch 4: global pool
    _conv(spec, "classifier.aspp.convs.0.0", 2048, 256, 1)
    _bn(spec, "classifier.aspp.convs.0.1", 256)
    for i in range(1, 4):
        _conv(spec, f"classifier.aspp.convs.{i}.0", 2048, 256, 3)
        _bn(spec, f"classifier.aspp.convs.{i}.1", 256)
    _conv(spec, "classifier.aspp.convs.4.1", 2048, 256, 1)
    _bn(spec, "classifier.aspp.convs.4.2", 256)
    _conv(spec, "classifier.aspp.project.0", 5 * 256, 256, 1)
    _bn(spec, "classifier.aspp.project.1", 256)
    _conv(spec, "classifier.classifier.0", 304, 256, 3)
    _bn(spec, "classifier.classifier.1", 256)
    _conv(spec, "classifier.classifier.3", 256, cfg.num_classes, 1, bias=True)
    return spec


def init_params(key: Array, cfg: S2mConfig = S2mConfig(),
                scale: float = 0.1) -> Params:
    spec = param_spec(cfg)
    out: Params = {}
    keys = jax.random.split(key, len(spec))
    for (name, s), k in zip(sorted(spec.items()), keys):
        if s["kind"] == "conv":
            p = {"w": scale * jax.random.normal(k, s["shape"], jnp.float32)}
            if s["bias"]:
                p["b"] = jnp.zeros((s["shape"][-1],), jnp.float32)
            out[name] = p
        else:
            c = s["shape"][0]
            out[name] = {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
                         "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}
    return out


def _bottleneck(params, p, x, *, stride, dilation):
    r = x
    y = conv2d(x, params[f"{p}.conv1"]["w"])
    y = jax.nn.relu(batch_norm(y, params[f"{p}.bn1"]))
    y = conv2d(y, params[f"{p}.conv2"]["w"], stride=stride,
               padding=dilation, dilation=dilation)
    y = jax.nn.relu(batch_norm(y, params[f"{p}.bn2"]))
    y = conv2d(y, params[f"{p}.conv3"]["w"])
    y = batch_norm(y, params[f"{p}.bn3"])
    if f"{p}.downsample.0" in params:
        r = conv2d(x, params[f"{p}.downsample.0"]["w"], stride=stride)
        r = batch_norm(r, params[f"{p}.downsample.1"])
    return jax.nn.relu(y + r)


def _upsample_ac_false(x: Array, size: Tuple[int, int]) -> Array:
    """Bilinear resize, half-pixel centers (torch align_corners=False)."""
    H, W = size
    h, w = x.shape[1], x.shape[2]
    if (h, w) == (H, W):
        return x

    def axis_resize(a, n_in, n_out, axis):
        if n_in == n_out:
            return a
        pos = (jnp.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
        pos = jnp.clip(pos, 0.0, n_in - 1.0)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, max(n_in - 2, 0))
        t = (pos - lo).astype(a.dtype)
        lo_v = jnp.take(a, lo, axis=axis)
        hi_v = jnp.take(a, jnp.minimum(lo + 1, n_in - 1), axis=axis)
        shape = [1] * a.ndim
        shape[axis] = n_out
        return lo_v * (1 - t.reshape(shape)) + hi_v * t.reshape(shape)

    x = axis_resize(x, h, H, 1)
    return axis_resize(x, w, W, 2)


def forward(params: Params, cfg: S2mConfig, x: Array) -> Array:
    """(B, H, W, 6) -> (B, H, W, num_classes) logits. H/W multiples of 16
    (the controller pads; ``s2m_controller.py:36``)."""
    if x.shape[1] % 16 or x.shape[2] % 16:
        raise ValueError("S2M input must be padded to multiples of 16")
    in_hw = x.shape[1:3]
    y = conv2d(x, params["backbone.conv1"]["w"], stride=2, padding=3)
    y = jax.nn.relu(batch_norm(y, params["backbone.bn1"]))
    y = max_pool_3x3_s2(y)
    feats = {}
    for name, blocks, _planes, stride, dil in _STAGES:
        for b in range(blocks):
            # torchvision semantics: the first block carries the stride and
            # the PREVIOUS dilation; later blocks the stage dilation
            y = _bottleneck(params, f"backbone.{name}.{b}", y,
                            stride=stride if b == 0 else 1,
                            dilation=1 if (b == 0 and dil > 1) else dil)
        feats[name] = y

    low = conv2d(feats["layer1"], params["classifier.project.0"]["w"])
    low = jax.nn.relu(batch_norm(low, params["classifier.project.1"]))

    top = feats["layer4"]
    branches = []
    b0 = conv2d(top, params["classifier.aspp.convs.0.0"]["w"])
    branches.append(jax.nn.relu(
        batch_norm(b0, params["classifier.aspp.convs.0.1"])))
    for i, rate in enumerate(_ASPP_RATES, start=1):
        bi = conv2d(top, params[f"classifier.aspp.convs.{i}.0"]["w"],
                    padding=rate, dilation=rate)
        branches.append(jax.nn.relu(
            batch_norm(bi, params[f"classifier.aspp.convs.{i}.1"])))
    pooled = jnp.mean(top, axis=(1, 2), keepdims=True)
    pooled = conv2d(pooled, params["classifier.aspp.convs.4.1"]["w"])
    pooled = jax.nn.relu(batch_norm(pooled, params["classifier.aspp.convs.4.2"]))
    branches.append(jnp.broadcast_to(
        pooled, top.shape[:3] + (pooled.shape[-1],)))

    y = jnp.concatenate(branches, axis=-1)
    y = conv2d(y, params["classifier.aspp.project.0"]["w"])
    y = jax.nn.relu(batch_norm(y, params["classifier.aspp.project.1"]))
    # dropout(0.1): inference no-op

    y = _upsample_ac_false(y, low.shape[1:3])
    y = jnp.concatenate([low, y], axis=-1)
    y = conv2d(y, params["classifier.classifier.0"]["w"], padding=1)
    y = jax.nn.relu(batch_norm(y, params["classifier.classifier.1"]))
    y = conv2d(y, params["classifier.classifier.3"]["w"],
               params["classifier.classifier.3"]["b"])
    return _upsample_ac_false(y, in_hw)


forward_jit = jax.jit(forward, static_argnames=("cfg",))


def convert_torch_state_dict(sd: Dict[str, np.ndarray],
                             cfg: S2mConfig = S2mConfig()) -> Params:
    """Torch ``deeplabv3plus_resnet50.state_dict()`` -> params (audited:
    every expected tensor present, every float tensor consumed)."""
    spec = param_spec(cfg)
    out: Params = {}
    used = set()

    def take(name):
        if name not in sd:
            raise KeyError(f"checkpoint missing '{name}'")
        used.add(name)
        return np.asarray(sd[name])

    for name, s in spec.items():
        if s["kind"] == "conv":
            p = {"w": jnp.asarray(take(f"{name}.weight").transpose(2, 3, 1, 0))}
            if s["bias"]:
                p["b"] = jnp.asarray(take(f"{name}.bias"))
            if p["w"].shape != s["shape"]:
                raise ValueError(
                    f"{name}: shape {p['w'].shape} != spec {s['shape']}")
            out[name] = p
        else:
            out[name] = {
                "scale": jnp.asarray(take(f"{name}.weight")),
                "bias": jnp.asarray(take(f"{name}.bias")),
                "mean": jnp.asarray(take(f"{name}.running_mean")),
                "var": jnp.asarray(take(f"{name}.running_var")),
            }
    leftover = [k for k in sd
                if k not in used and not k.endswith("num_batches_tracked")]
    if leftover:
        raise ValueError(f"unconsumed checkpoint tensors: {sorted(leftover)[:8]}")
    return out
