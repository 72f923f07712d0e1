"""FieldState: the runtime observation state as an immutable pytree.

The reference keeps its runtime state in a mutable dict
``Fusion.curr_obs_torch`` (``fusion.py:210-215,707-712``). Here it is a frozen
flax dataclass so every field query is a pure function of (state, points) —
jittable, differentiable, and shardable over a device mesh.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@flax.struct.dataclass
class FieldState:
    """Per-frame multi-view observation.

    Attributes:
      depth: (V, H, W) metric depth.
      pose: (V, 3, 4) world->camera extrinsics.
      K: (V, 3, 3) intrinsics.
      dino_feats: (V, ph, pw, C) patch descriptors, or None before features
        are extracted.
      color: (V, H, W, 3) float colors in [0, 1] (reference 'color_tensor').
      mask: (V, H, W, NI) one-hot/probabilistic instance masks, or None before
        text queries run.
      mu: scalar truncation band (reference ``fusion.py:208``).
    """

    depth: Array
    pose: Array
    K: Array
    dino_feats: Optional[Array] = None
    color: Optional[Array] = None
    mask: Optional[Array] = None
    mu: float = flax.struct.field(pytree_node=False, default=0.02)

    @property
    def num_views(self) -> int:
        return self.depth.shape[0]

    @property
    def image_hw(self) -> Tuple[int, int]:
        return (int(self.depth.shape[1]), int(self.depth.shape[2]))

    def feature_maps(self, names: Tuple[str, ...]):
        """Resolve interpolation targets by reference-compatible name."""
        table = {
            "dino_feats": self.dino_feats,
            "mask": self.mask,
            "color_tensor": self.color,
        }
        out = {}
        for n in names:
            v = table.get(n)
            if v is None:
                raise ValueError(f"FieldState has no data for return name {n!r}")
            out[n] = v
        return out


def state_from_obs(
    obs: dict,
    dino_feats=None,
    mask=None,
    mu: float = 0.02,
    dtype=jnp.float32,
) -> FieldState:
    """Build a FieldState from a reference-style obs dict.

    ``obs`` carries 'color' (V,H,W,3 uint8), 'depth' (V,H,W float meters),
    'pose' (V,3,4 or V,4,4 world->cam), 'K' (V,3,3) — the contract of
    ``Fusion.update`` (``fusion.py:686-714``).
    """
    pose = np.asarray(obs["pose"], dtype=np.float32)
    if pose.shape[-2:] == (4, 4):
        pose = pose[:, :3, :]
    color = obs.get("color")
    color_t = None
    if color is not None:
        color_t = jnp.asarray(np.asarray(color).astype(np.float32) / 255.0, dtype=dtype)
    return FieldState(
        depth=jnp.asarray(np.asarray(obs["depth"], dtype=np.float32), dtype=dtype),
        pose=jnp.asarray(pose, dtype=dtype),
        K=jnp.asarray(np.asarray(obs["K"], dtype=np.float32), dtype=dtype),
        dino_feats=None if dino_feats is None else jnp.asarray(dino_feats, dtype=dtype),
        color=color_t,
        mask=None if mask is None else jnp.asarray(mask, dtype=dtype),
        mu=mu,
    )
