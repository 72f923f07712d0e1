"""HRNet-W + OCR interactive-segmentation backbone in functional JAX.

Rebuild of the f-BRS feature extractor the reference GUI loads for click
segmentation (``XMem/inference/interact/fbrs/model/modeling/hrnet_ocr.py:158-332``,
``ocr.py:7-141``, ``resnetv1b.py:6-91``) as a pure NHWC forward over a flat
parameter dict. Parameters are keyed by the torch module paths (e.g.
``"stage2.0.branches.0.0.conv1"``), so checkpoint conversion is a mechanical
OIHW->HWIO transpose with a single :func:`param_spec` as the source of truth
for init, conversion audit, and the forward's expectations.

All convs/BNs ride :mod:`d3fields_tpu.models.xmem.blocks` primitives (MXU
convs, folded inference BN); cross-branch fusion upsampling is bilinear
``align_corners=True`` (:func:`resize_bilinear_ac`) matching
``F.interpolate`` exactly. Dropout layers are inference no-ops.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from d3fields_tpu.models.xmem.blocks import batch_norm, conv2d

Array = jax.Array
Params = Dict[str, Dict[str, Array]]


@dataclasses.dataclass(frozen=True)
class HrnetConfig:
    """`hrnet_ocr.py:159-163`; ``small`` halves block counts (HRNet-18s)."""

    width: int = 18
    ocr_width: int = 64
    small: bool = True
    num_classes: int = 1

    @property
    def num_blocks(self) -> int:
        return 2 if self.small else 4

    @property
    def stage_modules(self) -> Tuple[int, int, int]:
        # (stage2, stage3, stage4) module counts, hrnet_ocr.py:186-208
        return (1, 3 if self.small else 4, 2 if self.small else 3)

    @property
    def stage_channels(self) -> Tuple[List[int], ...]:
        w = self.width
        return ([w, 2 * w], [w, 2 * w, 4 * w], [w, 2 * w, 4 * w, 8 * w])

    @property
    def feats_channels(self) -> int:
        return 15 * self.width  # concat of [w, 2w, 4w, 8w]

    @property
    def ocr_mid(self) -> int:
        return 2 * self.ocr_width


def resize_bilinear_ac(x: Array, size: Tuple[int, int]) -> Array:
    """NHWC bilinear resize with ``align_corners=True`` (torch
    ``F.interpolate(..., align_corners=True)`` parity): output index o maps
    to input coordinate ``o * (in-1)/(out-1)``. Separable two-pass gather."""
    H, W = size
    h, w = x.shape[1], x.shape[2]
    if (h, w) == (H, W):
        return x

    def axis_resize(a, n_in, n_out, axis):
        if n_in == n_out:
            return a
        if n_in == 1:
            return jnp.repeat(a, n_out, axis=axis)
        pos = jnp.linspace(0.0, n_in - 1.0, n_out)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 2)
        t = (pos - lo).astype(a.dtype)
        lo_v = jnp.take(a, lo, axis=axis)
        hi_v = jnp.take(a, lo + 1, axis=axis)
        shape = [1] * a.ndim
        shape[axis] = n_out
        t = t.reshape(shape)
        return lo_v * (1 - t) + hi_v * t

    x = axis_resize(x, h, H, 1)
    return axis_resize(x, w, W, 2)


# ---------------------------------------------------------------------------
# parameter spec (single source of truth)
# ---------------------------------------------------------------------------

def _conv(spec, name, cin, cout, k, bias=False):
    spec[name] = {"kind": "conv", "shape": (k, k, cin, cout), "bias": bias}


def _bn(spec, name, c):
    spec[name] = {"kind": "bn", "shape": (c,)}


def _basic_block(spec, p, cin, cout, with_down):
    # resnetv1b.py:6-40
    _conv(spec, f"{p}.conv1", cin, cout, 3)
    _bn(spec, f"{p}.bn1", cout)
    _conv(spec, f"{p}.conv2", cout, cout, 3)
    _bn(spec, f"{p}.bn2", cout)
    if with_down:
        _conv(spec, f"{p}.downsample.0", cin, cout, 1)
        _bn(spec, f"{p}.downsample.1", cout)


def _bottleneck(spec, p, cin, planes, with_down):
    # resnetv1b.py:43-91 (expansion 4)
    _conv(spec, f"{p}.conv1", cin, planes, 1)
    _bn(spec, f"{p}.bn1", planes)
    _conv(spec, f"{p}.conv2", planes, planes, 3)
    _bn(spec, f"{p}.bn2", planes)
    _conv(spec, f"{p}.conv3", planes, 4 * planes, 1)
    _bn(spec, f"{p}.bn3", 4 * planes)
    if with_down:
        _conv(spec, f"{p}.downsample.0", cin, 4 * planes, 1)
        _bn(spec, f"{p}.downsample.1", 4 * planes)


def _conv_bn_seq(spec, p, cin, cout, k):
    _conv(spec, f"{p}.0", cin, cout, k)
    _bn(spec, f"{p}.1", cout)


def _ocr_pair(spec, p, cin, cout):
    # ocr.py f_* heads: Sequential(conv, Sequential(bn, relu))
    _conv(spec, f"{p}.0", cin, cout, 1)
    _bn(spec, f"{p}.1.0", cout)


def param_spec(cfg: HrnetConfig) -> Dict[str, dict]:
    """Every parameter the forward consumes, keyed by torch module path
    (relative to the HighResolutionNet root)."""
    spec: Dict[str, dict] = {}
    nb = cfg.num_blocks

    _conv(spec, "conv1", 3, 64, 3)
    _bn(spec, "bn1", 64)
    _conv(spec, "conv2", 64, 64, 3)
    _bn(spec, "bn2", 64)
    for i in range(nb):
        _bottleneck(spec, f"layer1.{i}", 64 if i == 0 else 256, 64, i == 0)

    chans = cfg.stage_channels
    mods = cfg.stage_modules
    # transitions (hrnet_ocr.py:241-275)
    pre = [256]
    for t, cur in enumerate(chans, start=1):
        for i, c in enumerate(cur):
            if i < len(pre):
                if pre[i] != c:
                    _conv_bn_seq(spec, f"transition{t}.{i}", pre[i], c, 3)
            else:
                # one stride-2 conv per level gap (always exactly one here)
                for j in range(i + 1 - len(pre)):
                    cin = pre[-1]
                    cout = c if j == i - len(pre) else cin
                    _conv_bn_seq(spec, f"transition{t}.{i}.{j}", cin, cout, 3)
        # stage modules (hrnet_ocr.py:13-131)
        for m in range(mods[t - 1]):
            sp = f"stage{t + 1}.{m}"
            for b, c in enumerate(cur):
                for k in range(nb):
                    _basic_block(spec, f"{sp}.branches.{b}.{k}", c, c, False)
            for i in range(len(cur)):
                for j in range(len(cur)):
                    if j > i:
                        _conv_bn_seq(spec, f"{sp}.fuse_layers.{i}.{j}",
                                     cur[j], cur[i], 1)
                    elif j < i:
                        for k in range(i - j):
                            cout = cur[i] if k == i - j - 1 else cur[j]
                            cin = cur[j]
                            _conv_bn_seq(
                                spec, f"{sp}.fuse_layers.{i}.{j}.{k}",
                                cin, cout, 3,
                            )
        pre = cur

    fc = cfg.feats_channels
    mid, key = cfg.ocr_mid, cfg.ocr_width
    _conv(spec, "conv3x3_ocr.0", fc, mid, 3, bias=True)
    _bn(spec, "conv3x3_ocr.1", mid)
    ocb = "ocr_distri_head.object_context_block"
    for head in ("f_pixel", "f_object"):
        _ocr_pair(spec, f"{ocb}.{head}", mid, key)
        _conv(spec, f"{ocb}.{head}.2", key, key, 1)
        _bn(spec, f"{ocb}.{head}.3.0", key)
    _ocr_pair(spec, f"{ocb}.f_down", mid, key)
    _ocr_pair(spec, f"{ocb}.f_up", key, mid)
    _ocr_pair(spec, "ocr_distri_head.conv_bn_dropout", 2 * mid, mid)
    _conv(spec, "cls_head", mid, cfg.num_classes, 1, bias=True)
    _conv(spec, "aux_head.0", fc, fc, 1, bias=True)
    _bn(spec, "aux_head.1", fc)
    _conv(spec, "aux_head.3", fc, cfg.num_classes, 1, bias=True)
    return spec


def init_params(key: Array, cfg: HrnetConfig, scale: float = 0.1) -> Params:
    """Random parameters matching :func:`param_spec` (tests / smoke mode)."""
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
            out[name] = {
                "scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
                "mean": jnp.zeros((c,)), "var": jnp.ones((c,)),
            }
    return out


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _cbr(params, name, x, *, stride=1, relu=True):
    p = params[f"{name}.0"]
    pad = (p["w"].shape[0] - 1) // 2
    x = conv2d(x, p["w"], p.get("b"), stride=stride, padding=pad)
    x = batch_norm(x, params[f"{name}.1"])
    return jax.nn.relu(x) if relu else x


def _basic_fwd(params, p, x):
    r = x
    y = conv2d(x, params[f"{p}.conv1"]["w"], stride=1, padding=1)
    y = jax.nn.relu(batch_norm(y, params[f"{p}.bn1"]))
    y = conv2d(y, params[f"{p}.conv2"]["w"], stride=1, padding=1)
    y = batch_norm(y, params[f"{p}.bn2"])
    return jax.nn.relu(y + r)


def _bottleneck_fwd(params, p, x):
    r = x
    y = conv2d(x, params[f"{p}.conv1"]["w"])
    y = jax.nn.relu(batch_norm(y, params[f"{p}.bn1"]))
    y = conv2d(y, params[f"{p}.conv2"]["w"], stride=1, padding=1)
    y = jax.nn.relu(batch_norm(y, params[f"{p}.bn2"]))
    y = conv2d(y, params[f"{p}.conv3"]["w"])
    y = batch_norm(y, params[f"{p}.bn3"])
    if f"{p}.downsample.0" in params:
        r = conv2d(x, params[f"{p}.downsample.0"]["w"])
        r = batch_norm(r, params[f"{p}.downsample.1"])
    return jax.nn.relu(y + r)


def _module_fwd(params, cfg, sp, chans, xs):
    """One HighResolutionModule: per-branch blocks then full fusion
    (hrnet_ocr.py:128-155)."""
    nb = cfg.num_blocks
    xs = list(xs)
    for b in range(len(chans)):
        for k in range(nb):
            xs[b] = _basic_fwd(params, f"{sp}.branches.{b}.{k}", xs[b])
    fused = []
    for i in range(len(chans)):
        y = None
        for j in range(len(chans)):
            if j == i:
                t = xs[j]
            elif j > i:
                t = _cbr(params, f"{sp}.fuse_layers.{i}.{j}", xs[j],
                         relu=False)
                t = resize_bilinear_ac(t, xs[i].shape[1:3])
            else:
                t = xs[j]
                for k in range(i - j):
                    t = _cbr(params, f"{sp}.fuse_layers.{i}.{j}.{k}", t,
                             stride=2, relu=(k != i - j - 1))
            y = t if y is None else y + t
        fused.append(jax.nn.relu(y))
    return fused


def compute_feats(params: Params, cfg: HrnetConfig, x: Array) -> Array:
    """Image (B, H, W, 3) -> concatenated multi-resolution features
    (B, H/4, W/4, 15*width) (``compute_hrnet_feats``,
    hrnet_ocr.py:334-383)."""
    x = conv2d(x, params["conv1"]["w"], stride=2, padding=1)
    x = jax.nn.relu(batch_norm(x, params["bn1"]))
    x = conv2d(x, params["conv2"]["w"], stride=2, padding=1)
    x = jax.nn.relu(batch_norm(x, params["bn2"]))
    for i in range(cfg.num_blocks):
        x = _bottleneck_fwd(params, f"layer1.{i}", x)

    chans = cfg.stage_channels
    mods = cfg.stage_modules
    ys = [x]
    for t, cur in enumerate(chans, start=1):
        xs = []
        for i in range(len(cur)):
            src = ys[i] if i < len(ys) else ys[-1]
            name = f"transition{t}.{i}"
            if f"{name}.0" in params:          # same-level channel change
                xs.append(_cbr(params, name, src))
            elif f"{name}.0.0" in params:      # new (downsampled) branch
                xs.append(_cbr(params, f"{name}.0", src, stride=2))
            else:
                xs.append(src)
        for m in range(mods[t - 1]):
            xs = _module_fwd(params, cfg, f"stage{t + 1}.{m}", cur, xs)
        ys = xs

    size = ys[0].shape[1:3]
    up = [ys[0]] + [resize_bilinear_ac(y, size) for y in ys[1:]]
    return jnp.concatenate(up, axis=-1)


def ocr_head(params: Params, cfg: HrnetConfig, feats: Array,
             scaled: bool = False) -> Tuple[Array, Array]:
    """OCR refinement over backbone feats -> (out, out_aux) logits at
    feats resolution (hrnet_ocr.py:322-332 + ocr.py). ``scaled`` is
    ignored (kept for call-site symmetry with the f-BRS insertion)."""
    aux = conv2d(feats, params["aux_head.0"]["w"], params["aux_head.0"]["b"])
    aux = jax.nn.relu(batch_norm(aux, params["aux_head.1"]))
    aux = conv2d(aux, params["aux_head.3"]["w"], params["aux_head.3"]["b"])

    f = conv2d(feats, params["conv3x3_ocr.0"]["w"],
               params["conv3x3_ocr.0"]["b"], padding=1)
    f = jax.nn.relu(batch_norm(f, params["conv3x3_ocr.1"]))

    # SpatialGather (ocr.py:7-27): class-probability-weighted feature means
    B, h, w, c = f.shape
    K = aux.shape[-1]
    probs = jax.nn.softmax(aux.reshape(B, h * w, K), axis=1)   # over pixels
    context = jnp.einsum("bpk,bpc->bkc", probs, f.reshape(B, h * w, c))
    context = context[:, :, None, :]                           # (B, K, 1, C)

    # ObjectAttentionBlock2D (ocr.py:64-141)
    ocb = "ocr_distri_head.object_context_block"

    def pair(name, x):
        y = conv2d(x, params[f"{name}.0"]["w"])
        return jax.nn.relu(batch_norm(y, params[f"{name}.1.0"]))

    def double(name, x):
        y = pair(name, x)
        y = conv2d(y, params[f"{name}.2"]["w"])
        return jax.nn.relu(batch_norm(y, params[f"{name}.3.0"]))

    key_c = cfg.ocr_width
    query = double(f"{ocb}.f_pixel", f).reshape(B, h * w, key_c)
    key = double(f"{ocb}.f_object", context).reshape(B, K, key_c)
    value = pair(f"{ocb}.f_down", context).reshape(B, K, key_c)
    sim = jnp.einsum("bpc,bkc->bpk", query, key) * (key_c ** -0.5)
    attn = jax.nn.softmax(sim, axis=-1)
    ctx = jnp.einsum("bpk,bkc->bpc", attn, value).reshape(B, h, w, key_c)
    ctx = pair(f"{ocb}.f_up", ctx)

    y = jnp.concatenate([ctx, f], axis=-1)
    y = pair("ocr_distri_head.conv_bn_dropout", y)  # dropout: inference noop
    out = conv2d(y, params["cls_head"]["w"], params["cls_head"]["b"])
    return out, aux


def forward(params: Params, cfg: HrnetConfig, x: Array) -> Tuple[Array, Array]:
    """Full HRNet-OCR: image -> (out, aux) logits at 1/4 resolution."""
    return ocr_head(params, cfg, compute_feats(params, cfg, x))


def convert_torch_state_dict(sd: Dict[str, np.ndarray],
                             cfg: HrnetConfig) -> Params:
    """Torch ``HighResolutionNet.state_dict()`` -> :func:`param_spec`
    params (OIHW->HWIO). Audited: every expected tensor must exist and
    every floating tensor in ``sd`` must be consumed (num_batches_tracked
    counters excepted)."""
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
