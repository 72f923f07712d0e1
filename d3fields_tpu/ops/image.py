"""Image-space ops: distance maps and depth normals.

TPU-native equivalents of two inventoried native/unused reference pieces:

- :func:`seed_distance_maps` — the fbrs Cython BFS click-distance maps
  (``XMem/inference/interact/fbrs/utils/cython/_get_dist_maps.pyx``) as a
  vectorized exact Euclidean distance field from seed points (clicks are
  few; an (HW, S) broadcast beats a host BFS);
- :func:`depth_to_normal` — ``depth2normal`` (``utils/my_utils.py:891-926``,
  the commented-out normal-weighted eval path ``fusion.py:334-356``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


@functools.partial(jax.jit, static_argnames=("hw",))
def seed_distance_maps(seeds: Array, valid: Array, hw: Tuple[int, int],
                       norm_radius: float = 1.0) -> Array:
    """seeds (S, 2) (y, x) float; valid (S,) bool -> (H, W) min distance
    over valid seeds, scaled by 1/norm_radius (fbrs semantics; invalid
    seeds contribute +inf)."""
    H, W = hw
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    dy = ys[:, None, None] - seeds[None, None, :, 0]     # (H, 1, S)
    dx = xs[None, :, None] - seeds[None, None, :, 1]     # (1, W, S)
    d2 = jnp.square(dy) + jnp.square(dx)                 # (H, W, S)
    d2 = jnp.where(valid[None, None, :], d2, jnp.inf)
    return jnp.sqrt(d2.min(axis=-1)) / norm_radius


@jax.jit
def depth_to_normal(depth: Array, K: Array) -> Array:
    """(H, W) metric depth -> (H, W, 3) camera-space unit normals via
    central differences of the backprojected point map."""
    H, W = depth.shape
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=depth.dtype),
                          jnp.arange(W, dtype=depth.dtype), indexing="ij")
    x = (xs - K[0, 2]) / K[0, 0] * depth
    y = (ys - K[1, 2]) / K[1, 1] * depth
    pts = jnp.stack([x, y, depth], axis=-1)

    def grad(a, axis):
        lo = jnp.concatenate(
            [jax.lax.slice_in_dim(a, 0, 1, axis=axis), a], axis=axis
        )
        hi = jnp.concatenate(
            [a, jax.lax.slice_in_dim(a, a.shape[axis] - 1, a.shape[axis], axis=axis)],
            axis=axis,
        )
        return (
            jax.lax.slice_in_dim(hi, 1, a.shape[axis] + 1, axis=axis)
            - jax.lax.slice_in_dim(lo, 0, a.shape[axis], axis=axis)
        ) * 0.5

    du = grad(pts, 1)
    dv = grad(pts, 0)
    n = jnp.cross(du, dv)
    n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-9)
    # orient toward the camera (-z half-space)
    flip = jnp.sign(-n[..., 2:3] + 1e-12)
    return n * flip
