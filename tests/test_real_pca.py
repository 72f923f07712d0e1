"""Real-artifact tests against the reference's fitted PCA pickles.

The reference ships fitted 3-component sklearn PCA objects
(``pca_model/{mug,fork,shoe}.pkl``, fit by ``scripts/precompute_pca.py:76-96``
over real DINOv2 descriptors) and applies ``pca.transform`` when coloring
descriptor meshes (``fusion.py:1389-1394``). These are the only real
pretrained artifacts available offline, so this tier runs NON-skipped in the
default suite: it proves ``PCAParams.load`` consumes the genuine on-disk
format (old-sklearn pickle, (3, 1024) components) and that the device
transform matches the sklearn object's own ``transform`` output.
"""

import os
import warnings

import numpy as np
import pytest

REF_PCA_DIR = "/root/reference/pca_model"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_PCA_DIR),
    reason="reference pca_model pickles not on disk",
)


def _load_sklearn(path):
    import pickle

    with warnings.catch_warnings():
        # the pickles were fit with sklearn 1.2; unpickling under a newer
        # sklearn warns InconsistentVersionWarning — parity is asserted below
        warnings.simplefilter("ignore")
        with open(path, "rb") as f:
            return pickle.load(f)


@pytest.mark.parametrize("name", ["mug", "fork", "shoe"])
def test_reference_pickle_transform_parity(name):
    """PCAParams.load on the real pickle == the sklearn object's transform."""
    import jax.numpy as jnp

    from d3fields_tpu.ops.pca import PCAParams, pca_transform

    path = os.path.join(REF_PCA_DIR, f"{name}.pkl")
    params = PCAParams.load(path)
    assert params.components.shape == (3, 1024)
    assert params.mean.shape == (1024,)

    sk = _load_sklearn(path)
    X = np.random.RandomState(0).randn(256, 1024).astype(np.float32)
    want = sk.transform(X.astype(np.float64))
    got = np.asarray(pca_transform(jnp.asarray(X), params))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_vis_repr_consumes_reference_pickle(tmp_path):
    """End-to-end: ``vis_repr --pca_path <real mug.pkl>`` colors the
    descriptor mesh through the genuine artifact (synthetic 1024-d scene,
    the real pickle's descriptor dimensionality)."""
    from d3fields_tpu.apps.vis_repr import main

    out = str(tmp_path / "repr_real_pca")
    rc = main([
        "--synthetic", "--feat_dim", "1024", "--step", "0.02",
        "--pca_path", os.path.join(REF_PCA_DIR, "mug.pkl"),
        "--out", out,
    ])
    assert rc == 0
    p = os.path.join(out, "descriptor_mesh.ply")
    assert os.path.exists(p) and os.path.getsize(p) > 1000
