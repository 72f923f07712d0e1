"""Farthest point sampling.

The reference keeps FPS on the host as a python loop over numpy
(``fps_np``, ``utils/my_utils.py:478-497``) — the keypoint-selection hot
loop (``fusion.py:1447,1505,1566``). Here:

- :func:`fps` — device version: ``lax.fori_loop`` with static sample count,
  O(N) distance update per step, jit/vmap-friendly.
- :func:`fps_np` — host version with reference-identical semantics
  (random or given init index, returns (samples, indices, max residual)).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@functools.partial(jax.jit, static_argnames=("num_samples",))
def fps(
    pts: Array,
    num_samples: int,
    init_idx: Array | int = 0,
    valid: Optional[Array] = None,
) -> Tuple[Array, Array, Array]:
    """Farthest point sampling on device.

    Args:
      pts: (N, C) points.
      num_samples: static number of samples.
      init_idx: index of the first sample.
      valid: optional (N,) bool — invalid points are never selected (their
        distance is pinned to -inf). Lets padded/masked sets run under jit.

    Returns: (samples (S, C), indices (S,), max residual distance).
    """
    n = pts.shape[0]
    init_idx = jnp.asarray(init_idx, jnp.int32)
    invalid_pin = None
    if valid is not None:
        invalid_pin = jnp.where(valid, 0.0, -jnp.inf).astype(pts.dtype)

    def seed_dist():
        d = jnp.linalg.norm(pts - pts[init_idx], axis=1)
        return d if invalid_pin is None else d + invalid_pin

    idxs = jnp.zeros((num_samples,), jnp.int32).at[0].set(init_idx)

    def body(i, carry):
        dist, idxs = carry
        nxt = jnp.argmax(dist)
        idxs = idxs.at[i].set(nxt)
        d = jnp.linalg.norm(pts - pts[nxt], axis=1)
        if invalid_pin is not None:
            d = d + invalid_pin
        dist = jnp.minimum(dist, d)
        return dist, idxs

    dist, idxs = jax.lax.fori_loop(1, num_samples, body, (seed_dist(), idxs))
    return pts[idxs], idxs, jnp.max(dist)


def fps_np(
    pcd: np.ndarray, particle_num: int, init_idx: int = -1
) -> Tuple[np.ndarray, list, float]:
    """Host FPS with the reference contract (``utils/my_utils.py:478-497``):
    ``init_idx=-1`` draws a random start via ``np.random.randint``."""
    assert pcd.shape[0] > 0
    start = np.random.randint(pcd.shape[0]) if init_idx == -1 else init_idx
    fps_idx = [int(start)]
    dist = np.linalg.norm(pcd - pcd[start], axis=1)
    while len(fps_idx) < particle_num:
        nxt = int(dist.argmax())
        fps_idx.append(nxt)
        dist = np.minimum(dist, np.linalg.norm(pcd - pcd[nxt], axis=1))
    return pcd[fps_idx], fps_idx, float(dist.max())


def fps_rad_np(pcd: np.ndarray, radius: float) -> np.ndarray:
    """Radius-terminated FPS (``utils/my_utils.py:465-476``)."""
    start = np.random.randint(pcd.shape[0])
    out = [pcd[start]]
    dist = np.linalg.norm(pcd - out[0], axis=1)
    while dist.max() > radius:
        out.append(pcd[dist.argmax()])
        dist = np.minimum(dist, np.linalg.norm(pcd - out[-1], axis=1))
    return np.stack(out, axis=0)
