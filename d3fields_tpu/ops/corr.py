"""Descriptor correspondence: similarity fields between feature sets.

Rebuild of ``utils/corr_utils.py`` (``compute_similarity_tensor[_multi]``,
``compute_dist_tensor``): a softmax over negative scaled distances between
source descriptors and a target descriptor field. The reference catches GPU
OOM and rebatches reactively (``corr_utils.py:84-94``); here the pairwise
distance runs in fixed-size tiles under ``lax.map`` — constant memory by
construction.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


@functools.partial(jax.jit, static_argnames=("tile",))
def pairwise_sq_dist(src: Array, tgt: Array, *, tile: int = 4096) -> Array:
    """src (S, D), tgt (N, D) -> (S, N) squared L2, tiled over N."""
    S, D = src.shape
    N = tgt.shape[0]
    pad = (-N) % tile
    tgt_p = jnp.pad(tgt, ((0, pad), (0, 0)))
    tiles = tgt_p.reshape(-1, tile, D)
    s_sq = jnp.sum(jnp.square(src), axis=1)

    def one(t):
        t_sq = jnp.sum(jnp.square(t), axis=1)
        return s_sq[:, None] - 2.0 * (src @ t.T) + t_sq[None, :]

    out = jax.lax.map(one, tiles)  # (num_tiles, S, tile)
    return jnp.transpose(out, (1, 0, 2)).reshape(S, N + pad)[:, :N]


def similarity_softmax(src: Array, tgt: Array, scale: float = 0.5,
                       *, tile: int = 4096) -> Array:
    """(S, N) correspondence distribution: softmax_n(-scale * ||s - t_n||)
    (``compute_similarity_tensor``, ``corr_utils.py:20-40``)."""
    dist = jnp.sqrt(jnp.maximum(pairwise_sq_dist(src, tgt, tile=tile), 0.0))
    return jax.nn.softmax(-scale * dist, axis=1)


def best_matches(src: Array, tgt: Array, tgt_pts: Array,
                 *, tile: int = 4096) -> Tuple[Array, Array]:
    """Hard correspondence: per-source argmin distance target point +
    distance (the DON-style best-match search,
    ``network/dense_correspondence_network.py:488-551``)."""
    d = pairwise_sq_dist(src, tgt, tile=tile)
    idx = jnp.argmin(d, axis=1)
    best = jnp.maximum(jnp.take_along_axis(d, idx[:, None], 1)[:, 0], 0.0)
    return tgt_pts[idx], jnp.sqrt(best)
