"""Fit the descriptor-coloring PCA from clean object images.

Reference ``scripts/precompute_pca.py``: DINOv2 patch tokens of 4 object
images -> PCA(3) -> foreground = tokens with component-0 <= threshold
(background is component-0 > threshold, ``precompute_pca.py:76``) -> refit
PCA(3) on foreground tokens -> pickle. The saved artifact is a
:class:`d3fields_tpu.ops.pca.PCAParams` (which also loads the reference's
sklearn pickles).

  python -m d3fields_tpu.apps.precompute_pca --images a.png b.png \\
      --out pca_model/mug.pkl
  python -m d3fields_tpu.apps.precompute_pca --synthetic --out out/pca.pkl
"""

from __future__ import annotations

import argparse

import numpy as np

from d3fields_tpu.ops.pca import PCAParams


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--images", nargs="+", default=None)
    p.add_argument("--patch_h", type=int, default=75)
    p.add_argument("--patch_w", type=int, default=75)
    p.add_argument("--fg_threshold", type=float, default=-15.0,
                   help="component-0 split (reference precompute_pca.py:76)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--out", required=True)
    return p


def fit_fg_pca(features: np.ndarray, fg_threshold: float) -> PCAParams:
    """features (N, D) -> PCA refit on tokens whose first full-PCA component
    is <= fg_threshold (background is component0 > threshold)."""
    full = PCAParams.fit(features, 3)
    comp0 = (features - full.mean) @ full.components[0]
    fg = comp0 <= fg_threshold
    if not fg.any():
        fg = np.ones(features.shape[0], bool)
    return PCAParams.fit(features[fg], 3)


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.synthetic:
        rs = np.random.RandomState(0)
        feats = rs.randn(4 * 100, 64).astype(np.float32)
    else:
        import cv2

        from d3fields_tpu.apps._backends import build_feature_backend

        backend = build_feature_backend()
        imgs = []
        for path in args.images:
            img = cv2.imread(path)
            img = cv2.resize(img, (14 * args.patch_w, 14 * args.patch_h))
            imgs.append(img)
        feats = np.asarray(
            backend(np.stack(imgs), patch_hw=(args.patch_h, args.patch_w))
        ).reshape(-1, 1024)
    params = fit_fg_pca(feats, args.fg_threshold)
    params.save(args.out)
    print(f"[precompute_pca] saved PCA({params.components.shape}) -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
