"""Cross-device collective ops.

TPU-native equivalents of the reference's native multi-device kernels
(SURVEY 2g): the fbrs SyncBN CUDA extension
(``XMem/inference/interact/fbrs/model/syncbn/.../bn_cuda.cu``) becomes a
``psum`` over a mesh axis — cross-replica moments compiled by XLA onto ICI.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def sync_batch_norm(
    x: Array,
    scale: Array,
    bias: Array,
    axis_name: str,
    *,
    eps: float = 1e-5,
    reduce_axes: Tuple[int, ...] = (0, 1, 2),
) -> Tuple[Array, Array, Array]:
    """Training-mode batch norm with cross-replica statistics.

    Call inside ``shard_map``/``pmap`` over ``axis_name``; x (B, H, W, C)
    per-device shard. Returns (normalized, batch_mean, batch_var) — the
    moments are the GLOBAL ones (fbrs syncbn forward semantics: sum and
    sum-of-squares all-reduced before normalization).
    """
    n_local = 1
    for a in reduce_axes:
        n_local *= x.shape[a]
    s = jnp.sum(x, axis=reduce_axes)
    ss = jnp.sum(jnp.square(x), axis=reduce_axes)
    s = jax.lax.psum(s, axis_name)
    ss = jax.lax.psum(ss, axis_name)
    n = jax.lax.psum(jnp.asarray(n_local, x.dtype), axis_name)
    mean = s / n
    var = ss / n - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps)
    return (x - mean) * (inv * scale) + bias, mean, var


def all_gather_points(x: Array, axis_name: str) -> Array:
    """Gather per-device point shards back to the full axis (tiled)."""
    return jax.lax.all_gather(x, axis_name, axis=0, tiled=True)
