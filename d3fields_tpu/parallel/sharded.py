"""Multi-chip field evaluation: the query-point axis over the dp mesh axis.

The reference saturates ONE GPU with a 60k-point chunk loop
(``fusion.py:526-545``); here arbitrarily many query points spread across
every chip of a slice — the observation state is small (a few feature maps)
and is replicated, points and outputs are sharded, and no collective is
needed until the caller gathers results.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from d3fields_tpu.fields import fusion as F
from d3fields_tpu.fields.state import FieldState


@functools.partial(jax.jit, static_argnames=("names", "t", "use_pallas"))
def _run_sharded(st, p, names, t, use_pallas):
    # module-level jit: defining this inside sharded_batch_eval would make
    # every call a fresh function object and recompile the whole sharded
    # evaluation each time
    return F._batch_eval_padded(st, p, names, t, use_pallas)


def sharded_batch_eval(
    mesh: Mesh,
    state: FieldState,
    pts,
    return_names: Tuple[str, ...] = ("dino_feats", "mask"),
    *,
    tile: int = 32768,
    axis: str = "dp",
    use_pallas: bool = False,
):
    """batch_eval with points sharded over ``axis``; outputs come back with
    the same sharding (device-local until fetched)."""
    ndev = mesh.shape[axis]
    pts = jnp.asarray(pts)
    n = pts.shape[0]
    per = tile * ndev
    padded_n = ((n + per - 1) // per) * per
    if padded_n != n:
        pts = jnp.concatenate(
            [pts, jnp.zeros((padded_n - n, 3), pts.dtype)], axis=0
        )
    state_r = jax.device_put(
        state, jax.tree.map(lambda _: NamedSharding(mesh, P()), state)
    )
    pts = jax.device_put(pts, NamedSharding(mesh, P(axis, None)))
    out = _run_sharded(state_r, pts, tuple(return_names), tile, use_pallas)
    return {k: v[:n] for k, v in out.items()}
