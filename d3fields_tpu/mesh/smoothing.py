"""Constrained volume smoothing on TPU.

PyMCubes-compatible contract (reference ``fusion.py:1323``: ``mcubes.smooth``
before marching cubes): the input volume is binarized at 0.5, and the output
is a smooth scalar field whose zero level set approximates the 0.5 level set
of the binarized input — positive inside the ``>0.5`` region, negative
outside. Implemented as constrained diffusion: repeated 6-neighbor Jacobi
averaging with the sign of every voxel clamped to its binary side after each
step, which is the discrete form of PyMCubes' constrained energy
minimization. Runs jitted on device (the volume is already there — it is the
output of ``batch_eval``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def _diffuse_step(phi: Array) -> Array:
    """One 6-neighbor Jacobi averaging step with edge replication."""
    p = jnp.pad(phi, 1, mode="edge")
    out = (
        p[:-2, 1:-1, 1:-1]
        + p[2:, 1:-1, 1:-1]
        + p[1:-1, :-2, 1:-1]
        + p[1:-1, 2:, 1:-1]
        + p[1:-1, 1:-1, :-2]
        + p[1:-1, 1:-1, 2:]
        + 2.0 * phi
    ) / 8.0
    return out


@functools.partial(jax.jit, static_argnames=("iters",))
def smooth_volume(volume: Array, iters: int = 20) -> Array:
    """Smooth a (possibly binary) volume into a signed embedding.

    Args:
      volume: (n0, n1, n2); binarized internally at 0.5 (PyMCubes contract).
      iters: diffusion steps; interface stays pinned within one voxel.

    Returns a float32 field, positive where ``volume > 0.5``.
    """
    inside = volume > 0.5
    band = jnp.asarray(0.5, jnp.float32)
    phi = jnp.where(inside, band, -band)

    def body(_, phi):
        phi = _diffuse_step(phi)
        # Constraint: every voxel keeps its binary sign (magnitude >= eps).
        eps = 1e-3
        phi = jnp.where(inside, jnp.maximum(phi, eps), jnp.minimum(phi, -eps))
        return phi

    return jax.lax.fori_loop(0, iters, body, phi)
