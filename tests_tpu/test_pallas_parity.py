"""On-hardware numerical parity of the fused Pallas field path.

The CPU suite proves the fused kernels in interpret mode; this tier proves
the MOSAIC-LOWERED kernels — the exact executables behind the headline
benchmark — against the pure-XLA path on the same chip. Semantics under
test: the reference's per-view weighting/interpolation fusion
(``fusion.py:305-394``).
"""

import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pytestmark = pytest.mark.tpu


def test_fused_path_matches_exact_on_chip(tpu_backend):
    import bench

    depth, pose, K, feats, mask = bench._scene()
    parity = bench.parity_check(depth, pose, K, feats, mask, n_pts=131072,
                                tile=32768)
    assert parity["rows_compared"] > 1000  # the scene must exercise the fuse
    assert parity["dist_max_abs"] <= bench.PARITY_DIST_ATOL
    assert parity["mask_max_abs"] <= bench.PARITY_MASK_ATOL
    assert parity["desc_min_cosine"] >= bench.PARITY_COS_MIN
    assert parity["ok"]


def test_dist_only_query_matches_on_chip(tpu_backend):
    """The dist-only kernel variant (row-gather + one-hot lane select,
    ``fields/kernels.py:302-310``) has its own gather layout — gate it
    separately."""
    import jax.numpy as jnp

    import bench
    from d3fields_tpu.fields.fusion import batch_eval
    from d3fields_tpu.fields.state import FieldState

    depth, pose, K, feats, mask = bench._scene()
    state = FieldState(depth=jnp.asarray(depth), pose=jnp.asarray(pose),
                       K=jnp.asarray(K), dino_feats=jnp.asarray(feats),
                       mask=jnp.asarray(mask))
    pts = jnp.asarray(np.random.RandomState(7)
                      .uniform(-0.5, 0.5, (32768, 3)).astype(np.float32))
    a = batch_eval(state, pts, (), tile=8192, use_pallas=True)
    b = batch_eval(state, pts, (), tile=8192, use_pallas=False)
    d = float(jnp.max(jnp.abs(a["dist"] - b["dist"])))
    assert d <= bench.PARITY_DIST_ATOL
    v = int(jnp.sum(a["valid_mask"] != b["valid_mask"]))
    assert v == 0
