"""Determinism helpers (reference ``set_seed``, ``utils/my_utils.py:222-228``).

JAX is deterministic by construction (explicit PRNG keys); this seeds the
host-side numpy/python RNGs the pipeline's host stages use (FPS random
starts, data sampling) and returns a root jax key for model code.
"""

from __future__ import annotations

import random


def set_seed(seed: int, make_jax_key: bool = False):
    """Seed host RNGs. ``make_jax_key=True`` additionally returns a root
    jax PRNG key — this touches the JAX backend (first client creation),
    so callers that must control backend init order (virtual CPU meshes)
    leave it False."""
    import numpy as np

    random.seed(seed)
    np.random.seed(seed)
    try:
        import torch

        torch.manual_seed(seed)
    except ImportError:
        pass
    if not make_jax_key:
        return None
    import jax

    return jax.random.PRNGKey(seed)
