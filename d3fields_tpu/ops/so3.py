"""SO(3) exponential map and rigid transforms, hand-rolled (no pytorch3d).

The reference parameterizes per-instance rigid motion as (t, log_r) and maps
through pytorch3d's ``so3_exp_map`` + ``Transform3d().rotate(R).translate(t)``
(``fusion.py:1643-1646``), i.e. row-vector convention ``p' = p @ R + t``.
We reproduce that composition exactly so tracking behaves identically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def hat(w: Array) -> Array:
    """(…, 3) -> (…, 3, 3) skew-symmetric matrices."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(log_r: Array, eps: float = 1e-8) -> Array:
    """Rodrigues exponential map: (…, 3) axis-angle -> (…, 3, 3) rotation.

    Taylor-safe near zero so gradients at the identity are finite (the
    tracking optimizer starts at log_r = 0).
    """
    theta2 = jnp.sum(log_r * log_r, axis=-1)
    theta = jnp.sqrt(theta2 + eps)
    K = hat(log_r)
    K2 = K @ K
    s = jnp.sin(theta) / theta
    c = (1.0 - jnp.cos(theta)) / (theta2 + eps)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=log_r.dtype), K.shape)
    return eye + s[..., None, None] * K + c[..., None, None] * K2


def rigid_transform_points(pts: Array, log_r: Array, t: Array) -> Array:
    """Apply per-instance rigid motion in the reference's row convention.

    Args:
      pts: (I, P, 3) per-instance points.
      log_r: (I, 3) axis-angle.
      t: (I, 3) translation.

    Returns (I, P, 3): ``pts @ so3_exp(log_r) + t`` — matching pytorch3d
    ``Transform3d().rotate(R).translate(t).transform_points``.
    """
    R = so3_exp(log_r)  # (I, 3, 3)
    return jnp.einsum("ipk,ikj->ipj", pts, R) + t[:, None, :]
