"""Merge per-object probability maps from multiple eval runs into masks.

Rebuild of the reference's multi-scale merging entry point
(``XMem/merge_multi_scale.py``): each input directory holds the
``--save_scores`` output of one ``apps.eval_xmem`` run (e.g. different
processing sizes and/or ``--flip``); per frame the probability maps are
averaged (resized to the first run's resolution when scales differ) and
argmaxed into final index masks.

Usage:
  python -m d3fields_tpu.apps.merge_scores --inputs out/s480 out/s600_flip \
      --out out/merged
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--inputs", nargs="+", required=True,
                   help="eval_xmem --save_scores output roots to merge")
    p.add_argument("--out", required=True)
    return p


def _resize_prob(prob: np.ndarray, hw) -> np.ndarray:
    """(H, W, C) -> (h, w, C) bilinear, channel-wise."""
    if prob.shape[:2] == tuple(hw):
        return prob
    import cv2

    return cv2.resize(prob, (hw[1], hw[0]), interpolation=cv2.INTER_LINEAR)


def merge_video(in_dirs, out_dir) -> int:
    """Average the per-frame .npy score maps of one video; returns #frames."""
    os.makedirs(out_dir, exist_ok=True)
    names = sorted(
        n for n in os.listdir(in_dirs[0]) if n.endswith(".npy")
    )
    from d3fields_tpu.utils.visualization import save_index_mask_png

    for name in names:
        acc = None
        for d in in_dirs:
            prob = np.load(os.path.join(d, name)).astype(np.float32)
            if acc is None:
                acc = prob
            else:
                acc = acc + _resize_prob(prob, acc.shape[:2])
        pred = acc.argmax(-1).astype(np.uint8)
        save_index_mask_png(
            os.path.join(out_dir, name.replace(".npy", ".png")), pred
        )
    return len(names)


def main(argv=None):
    args = build_parser().parse_args(argv)
    videos = sorted(
        v for v in os.listdir(args.inputs[0])
        if os.path.isdir(os.path.join(args.inputs[0], v))
    )
    if not videos:  # flat layout: the roots ARE single-video score dirs
        n = merge_video(args.inputs, args.out)
        print(f"[merge_scores] merged {n} frames from {len(args.inputs)} runs")
        return 0
    total = 0
    for vid in videos:
        dirs = [os.path.join(root, vid) for root in args.inputs]
        dirs = [d for d in dirs if os.path.isdir(d)]
        total += merge_video(dirs, os.path.join(args.out, vid))
    print(f"[merge_scores] merged {len(videos)} videos "
          f"({total} frames) from {len(args.inputs)} runs")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
