"""XMem network blocks in pure JAX (NHWC, TPU-first).

Rebuild of the reference's torch modules (``XMem/model/modules.py``,
``XMem/model/group_modules.py``, ``XMem/model/cbam.py``,
``XMem/model/resnet.py``) as functional blocks over parameter pytrees:

- all convs run in NHWC (TPU-native layout) with HWIO weights;
- batch norm is inference-mode (running stats), matching the frozen
  checkpoints the reference always runs with at test time
  (``XMem/model/network.py:17-40`` loads pretrained weights);
- the object ("group") axis is folded into the batch axis before convs
  (the reference's GConv2D flatten, ``group_modules.py:29-34``);
- GRU-style updaters replicate the reference's nonstandard gate order
  (``modules.py:64-76``: new value before forget gate).

Parameter containers are plain nested dicts so the whole network is a
pytree usable with jit/vmap/shard_map.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
Params = Dict[str, "Params | Array"]


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

# Alternate lowering for 3x3/s1 convs: 9 shifted (N*H*W, Cin)@(Cin, Cout)
# matmuls instead of conv_general_dilated. The XMem step is
# activation-traffic-bound with XLA's conv scheduling on the small
# deep-stage spatial dims (30x40 at /16) named as part of the 2x-floor gap
# (docs/PARITY.md "XMem: why 28% MFU"); the explicit-matmul form hands XLA
# plain MXU tiles (4,800 well-shaped rows at /16) to schedule instead.
# Identical math up to f32 reassociation (the 9 partial sums accumulate in
# conv order dy,dx); parity pinned in tests/test_xmem_blocks.py. Module
# flag, set BEFORE the step is traced (trace-time constant).
_CONV3X3_AS_MATMUL = False


def set_conv3x3_matmul(on: bool) -> None:
    """Route eligible 3x3/s1/d1 convs through the 9-matmul lowering for
    subsequently TRACED executables (already-compiled ones are unchanged)."""
    global _CONV3X3_AS_MATMUL
    _CONV3X3_AS_MATMUL = bool(on)


def _conv3x3_matmul(x: Array, w: Array) -> Array:
    N, H, W, Cin = x.shape
    Cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            xs = xp[:, dy:dy + H, dx:dx + W, :].reshape(N * H * W, Cin)
            t = xs @ w[dy, dx]
            acc = t if acc is None else acc + t
    return acc.reshape(N, H, W, Cout)


def conv2d(x: Array, w: Array, b: Optional[Array] = None, *, stride: int = 1,
           padding: int = 0, dilation: int = 1) -> Array:
    """NHWC conv with HWIO weights (torch Conv2d semantics, symmetric pad;
    ``dilation`` is atrous kernel dilation as in torch)."""
    if (_CONV3X3_AS_MATMUL and stride == 1 and dilation == 1
            and padding == 1 and w.shape[:2] == (3, 3)):
        out = _conv3x3_matmul(x, w)
        return out if b is None else out + b
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        out = out + b
    return out


def batch_norm(x: Array, p: Params, eps: float = 1e-5) -> Array:
    """Inference-mode batch norm with running statistics."""
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * (inv * p["scale"]) + p["bias"]


def conv_bn_relu(x: Array, conv_p: Params, bn_p: Params, *, stride: int,
                 padding: int, relu: bool = True) -> Array:
    x = conv2d(x, conv_p["w"], conv_p.get("b"), stride=stride, padding=padding)
    x = batch_norm(x, bn_p)
    return jax.nn.relu(x) if relu else x


def max_pool_3x3_s2(x: Array) -> Array:
    """torch MaxPool2d(kernel_size=3, stride=2, padding=1)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def avg_pool(x: Array, k: int) -> Array:
    """k x k average pool, stride k (== F.interpolate(mode='area', 1/k))."""
    out = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, k, k, 1),
        padding="VALID",
    )
    return out / (k * k)


def upsample_2x(x: Array) -> Array:
    """Bilinear x2 with half-pixel centers (align_corners=False).

    For integer x2 the kernel weights are the fixed (0.25, 0.75) stencil, so
    this is expressed as pad + fixed-weight blend — cheaper than a general
    gather resize and exactly matches ``F.interpolate(scale_factor=2,
    mode='bilinear', align_corners=False)`` with its implicit edge clamp.
    """

    def up1d(v, axis):
        # source coordinate of output i is (i + 0.5)/2 - 0.5: even outputs
        # blend (prev, curr) at (0.25, 0.75); odd blend (curr, next).
        lo = jnp.concatenate(
            [jax.lax.slice_in_dim(v, 0, 1, axis=axis), v], axis=axis
        )  # v[-1 clamped], v[0..n-1]
        hi = jnp.concatenate(
            [v, jax.lax.slice_in_dim(v, v.shape[axis] - 1, v.shape[axis], axis=axis)],
            axis=axis,
        )
        even = 0.25 * jax.lax.slice_in_dim(lo, 0, v.shape[axis], axis=axis) + \
            0.75 * v
        odd = 0.75 * v + 0.25 * jax.lax.slice_in_dim(
            hi, 1, v.shape[axis] + 1, axis=axis
        )
        out = jnp.stack([even, odd], axis=axis + 1)
        new_shape = list(v.shape)
        new_shape[axis] = 2 * v.shape[axis]
        return out.reshape(new_shape)

    return up1d(up1d(x, 1), 2)


def upsample_4x_logits(x: Array) -> Array:
    """Bilinear x4, align_corners=False (decoder's final logit upsample,
    reference ``modules.py:247``)."""
    from d3fields_tpu.models.resize import bilinear_resize

    H, W = x.shape[1], x.shape[2]
    return bilinear_resize(x, (4 * H, 4 * W))


# ---------------------------------------------------------------------------
# residual blocks (torchvision-style, reference XMem/model/resnet.py)
# ---------------------------------------------------------------------------

def basic_block(x: Array, p: Params, *, stride: int) -> Array:
    """ResNet-18 BasicBlock."""
    identity = x
    out = conv_bn_relu(x, p["conv1"], p["bn1"], stride=stride, padding=1)
    out = conv_bn_relu(out, p["conv2"], p["bn2"], stride=1, padding=1, relu=False)
    if "downsample" in p:
        identity = conv_bn_relu(
            x, p["downsample"]["conv"], p["downsample"]["bn"],
            stride=stride, padding=0, relu=False,
        )
    return jax.nn.relu(out + identity)


def bottleneck_block(x: Array, p: Params, *, stride: int) -> Array:
    """ResNet-50 Bottleneck (stride on the 3x3, torchvision v1.5 style)."""
    identity = x
    out = conv_bn_relu(x, p["conv1"], p["bn1"], stride=1, padding=0)
    out = conv_bn_relu(out, p["conv2"], p["bn2"], stride=stride, padding=1)
    out = conv_bn_relu(out, p["conv3"], p["bn3"], stride=1, padding=0, relu=False)
    if "downsample" in p:
        identity = conv_bn_relu(
            x, p["downsample"]["conv"], p["downsample"]["bn"],
            stride=stride, padding=0, relu=False,
        )
    return jax.nn.relu(out + identity)


def res_layer(x: Array, blocks: Sequence[Params], *, stride: int,
              kind: str) -> Array:
    fn = basic_block if kind == "basic" else bottleneck_block
    x = fn(x, blocks[0], stride=stride)
    for bp in blocks[1:]:
        x = fn(x, bp, stride=1)
    return x


def key_encoder(x: Array, p: Params) -> Tuple[Array, Array, Array]:
    """ResNet-50 trunk -> (f16 1024ch, f8 512ch, f4 256ch).

    Reference ``KeyEncoder`` (``modules.py:153-175``).
    """
    x = conv_bn_relu(x, p["conv1"], p["bn1"], stride=2, padding=3)
    x = max_pool_3x3_s2(x)
    f4 = res_layer(x, p["layer1"], stride=1, kind="bottleneck")
    f8 = res_layer(f4, p["layer2"], stride=2, kind="bottleneck")
    f16 = res_layer(f8, p["layer3"], stride=2, kind="bottleneck")
    return f16, f8, f4


def value_encoder_trunk(x: Array, p: Params) -> Array:
    """ResNet-18 trunk (5-channel input) -> 256ch @ 1/16.

    Reference ``ValueEncoder`` (``modules.py:102-150``). NOTE the reference
    applies relu AFTER maxpool (an upstream quirk); since relu and maxpool
    commute this is equivalent to the standard order.
    """
    x = conv_bn_relu(x, p["conv1"], p["bn1"], stride=2, padding=3)
    x = max_pool_3x3_s2(x)
    x = res_layer(x, p["layer1"], stride=1, kind="basic")
    x = res_layer(x, p["layer2"], stride=2, kind="basic")
    x = res_layer(x, p["layer3"], stride=2, kind="basic")
    return x


# ---------------------------------------------------------------------------
# XMem-specific blocks. The object axis is pre-folded into batch: all inputs
# are (B*O, H, W, C); per-image features are pre-broadcast by callers.
# ---------------------------------------------------------------------------

def group_res_block(g: Array, p: Params) -> Array:
    """GroupResBlock (``group_modules.py:37-55``): two 3x3 convs on
    relu-activated input + (projected) skip."""
    out = conv2d(jax.nn.relu(g), p["conv1"]["w"], p["conv1"]["b"], padding=1)
    out = conv2d(jax.nn.relu(out), p["conv2"]["w"], p["conv2"]["b"], padding=1)
    skip = g
    if "downsample" in p:
        skip = conv2d(g, p["downsample"]["w"], p["downsample"]["b"], padding=1)
    return out + skip


def cbam(x: Array, p: Params) -> Array:
    """CBAM channel+spatial attention (``cbam.py:20-95``, no_spatial=False)."""
    B, H, W, C = x.shape
    # channel gate: shared MLP over global avg+max pooled vectors
    avg = x.mean(axis=(1, 2))
    mx = x.max(axis=(1, 2))

    def mlp(v):
        h = jax.nn.relu(v @ p["mlp1"]["w"] + p["mlp1"]["b"])
        return h @ p["mlp2"]["w"] + p["mlp2"]["b"]

    scale = jax.nn.sigmoid(mlp(avg) + mlp(mx))[:, None, None, :]
    x = x * scale
    # spatial gate: 7x7 conv over [max_c, mean_c], then sigmoid
    pooled = jnp.concatenate(
        [x.max(axis=-1, keepdims=True), x.mean(axis=-1, keepdims=True)], axis=-1
    )
    att = conv2d(pooled, p["spatial"]["w"], p["spatial"]["b"], padding=3)
    return x * jax.nn.sigmoid(att)


def feature_fusion(x: Array, g: Array, p: Params) -> Array:
    """FeatureFusionBlock (``modules.py:22-41``): concat -> resblock ->
    CBAM residual -> resblock. ``x`` is already broadcast to g's batch."""
    g = jnp.concatenate([x, g], axis=-1)
    g = group_res_block(g, p["block1"])
    r = cbam(g, p["attention"])
    return group_res_block(g + r, p["block2"])


def gru_update(g: Array, h: Array, p: Params, hidden_dim: int) -> Array:
    """The reference's nonstandard GRU (``modules.py:64-76``):
    new_h = f*h*(1-u) + u*tanh(v) with [f, u, v] = conv3x3([g, h])."""
    values = conv2d(
        jnp.concatenate([g, h], axis=-1), p["w"], p["b"], padding=1
    )
    forget = jax.nn.sigmoid(values[..., :hidden_dim])
    update = jax.nn.sigmoid(values[..., hidden_dim : 2 * hidden_dim])
    new_value = jnp.tanh(values[..., 2 * hidden_dim :])
    return forget * h * (1.0 - update) + update * new_value


def hidden_updater(g16: Array, g8: Array, g4: Array, h: Array, p: Params,
                   hidden_dim: int) -> Array:
    """Decoder-side multi-scale GRU (``modules.py:45-79``)."""
    g = (
        conv2d(g16, p["g16"]["w"], p["g16"]["b"])
        + conv2d(avg_pool(g8, 2), p["g8"]["w"], p["g8"]["b"])
        + conv2d(avg_pool(g4, 4), p["g4"]["w"], p["g4"]["b"])
    )
    return gru_update(g, h, p["transform"], hidden_dim)


def upsample_block(skip_f: Array, up_g: Array, p: Params) -> Array:
    """UpsampleBlock (``modules.py:178-190``): conv skip + x2-upsampled g,
    then a group res block."""
    skip = conv2d(skip_f, p["skip"]["w"], p["skip"]["b"], padding=1)
    g = upsample_2x(up_g)
    return group_res_block(skip + g, p["out"])


def key_projection(f16: Array, p: Params, *, need_s: bool, need_e: bool):
    """KeyProjection (``modules.py:194-211``): key conv + shrinkage d^2+1 +
    sigmoid selection."""
    key = conv2d(f16, p["key"]["w"], p["key"]["b"], padding=1)
    shrinkage = (
        jnp.square(conv2d(f16, p["d"]["w"], p["d"]["b"], padding=1)) + 1.0
        if need_s else None
    )
    selection = (
        jax.nn.sigmoid(conv2d(f16, p["e"]["w"], p["e"]["b"], padding=1))
        if need_e else None
    )
    return key, shrinkage, selection


def soft_aggregate(prob: Array, axis: int) -> Array:
    """Soft aggregation from STM (``aggregate.py:6-19``): prepend implicit
    background prod(1-p), renormalize through logits. Always computed in
    f32: in bf16 the clip bound 1-1e-7 rounds to exactly 1.0 and the logit
    becomes log(inf) -> NaN."""
    prob = prob.astype(jnp.float32)
    bg = jnp.prod(1.0 - prob, axis=axis, keepdims=True)
    new_prob = jnp.concatenate([bg, prob], axis=axis)
    new_prob = jnp.clip(new_prob, 1e-7, 1.0 - 1e-7)
    logits = jnp.log(new_prob / (1.0 - new_prob))
    return jax.nn.softmax(logits, axis=axis)


def pad_divide_by(x: Array, d: int, hw_axes: Tuple[int, int] = (1, 2)):
    """Symmetric pad H/W up to multiples of d (``util/tensor_util.py``).
    Returns (padded, pad_spec) where pad_spec = (lh, uh, lw, uw)."""
    H, W = x.shape[hw_axes[0]], x.shape[hw_axes[1]]
    new_h = (H + d - 1) // d * d
    new_w = (W + d - 1) // d * d
    lh, uh = (new_h - H) // 2, (new_h - H + 1) // 2
    lw, uw = (new_w - W) // 2, (new_w - W + 1) // 2
    pads = [(0, 0)] * x.ndim
    pads[hw_axes[0]] = (lh, uh)
    pads[hw_axes[1]] = (lw, uw)
    return jnp.pad(x, pads), (lh, uh, lw, uw)


def unpad(x: Array, pad_spec, hw_axes: Tuple[int, int] = (1, 2)) -> Array:
    lh, uh, lw, uw = pad_spec
    sl = [slice(None)] * x.ndim
    sl[hw_axes[0]] = slice(lh, x.shape[hw_axes[0]] - uh)
    sl[hw_axes[1]] = slice(lw, x.shape[hw_axes[1]] - uw)
    return x[tuple(sl)]
