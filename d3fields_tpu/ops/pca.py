"""PCA descriptor projection (sklearn-compatible, device transform).

The reference fits a 3-component sklearn PCA offline
(``scripts/precompute_pca.py:76-96``) and applies ``pca.transform`` on the
host when coloring descriptor meshes (``fusion.py:1389-1394``). Here the fit
stays on the host (tiny) but produces a plain parameter pytree whose
transform is a jittable matmul, so descriptor->RGB projection runs on-device
for millions of vertices.
"""

from __future__ import annotations

import dataclasses
import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclasses.dataclass
class PCAParams:
    components: np.ndarray  # (k, D)
    mean: np.ndarray        # (D,)

    @staticmethod
    def fit(X: np.ndarray, n_components: int = 3) -> "PCAParams":
        """SVD fit matching ``sklearn.decomposition.PCA`` (full SVD, sign
        convention: largest-|loading| element of each component positive)."""
        mean = X.mean(axis=0)
        Xc = X - mean
        _, _, Vt = np.linalg.svd(Xc, full_matrices=False)
        comps = Vt[:n_components]
        # sklearn's svd_flip: sign from the max-abs element of each row of Vt
        signs = np.sign(comps[np.arange(comps.shape[0]), np.abs(comps).argmax(axis=1)])
        comps = comps * signs[:, None]
        return PCAParams(components=comps.astype(X.dtype), mean=mean.astype(X.dtype))

    @staticmethod
    def from_sklearn(pca) -> "PCAParams":
        """Adopt a fitted sklearn PCA (including the reference's pickles —
        sklearn PCA objects with (3, 1024) components, ``pca_model/*.pkl``)."""
        return PCAParams(
            components=np.asarray(pca.components_),
            mean=np.asarray(pca.mean_),
        )

    @staticmethod
    def load(path: str) -> "PCAParams":
        with open(path, "rb") as f:
            obj = pickle.load(f)
        if isinstance(obj, PCAParams):
            return obj
        return PCAParams.from_sklearn(obj)

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump(self, f)


def pca_transform(feats: Array, params: PCAParams) -> Array:
    """(N, D) -> (N, k) on device."""
    comps = jnp.asarray(params.components, feats.dtype)
    mean = jnp.asarray(params.mean, feats.dtype)
    return (feats - mean) @ comps.T
