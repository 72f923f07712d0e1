"""Metrics / logging: AverageMeter, Integrator, Tee.

Rebuilds the reference's observability helpers: ``AverageMeter``
(``utils/my_utils.py:394-411``), XMem's metric ``Integrator``
(``XMem/util/log_integrator.py``), and the ``Tee`` stdout capture
(``utils/my_utils.py:373-391``). TensorBoard logging
(``XMem/util/logger.py:22-46``) writes JSONL instead — greppable, no
TensorFlow dependency.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Dict, Optional, Sequence

import numpy as np


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


class Integrator:
    """Accumulate scalar dicts; ``finalize`` averages what was added.

    The reference Integrator all_reduces across DDP ranks
    (``log_integrator.py``); here no cross-process reduction is needed —
    the trainer's metrics come out of a mesh-sharded jitted step, so each
    value is already the GLOBAL mean over the whole (dp-sharded) batch and
    every process logs identical numbers. Feed it per-host values only if
    they were reduced inside the step."""

    def __init__(self, logger: Optional["JsonlLogger"] = None):
        self.logger = logger
        self.values: Dict[str, AverageMeter] = {}

    def add_dict(self, d: Dict[str, float]):
        for k, v in d.items():
            self.values.setdefault(k, AverageMeter()).update(float(v))

    def finalize(self, prefix: str, it: int) -> Dict[str, float]:
        out = {k: m.avg for k, m in self.values.items()}
        if self.logger is not None:
            self.logger.log_scalars(prefix, out, it)
        return out

    def reset(self):
        self.values = {}


class JsonlLogger:
    """Append-only JSONL metrics sink with git-commit stamping
    (``TensorboardLogger``'s stamp, ``XMem/util/logger.py:22-46``)."""

    def __init__(self, path: str, run_name: str = "run"):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.f = open(path, "a")
        stamp = {"run": run_name, "time": time.time()}
        try:
            import subprocess

            stamp["git"] = subprocess.check_output(
                ["git", "rev-parse", "HEAD"], stderr=subprocess.DEVNULL
            ).decode().strip()
        except Exception:
            pass
        self._write({"event": "start", **stamp})

    def _write(self, d: dict):
        self.f.write(json.dumps(d) + "\n")
        self.f.flush()

    def log_scalar(self, tag: str, value: float, it: int):
        self._write({"tag": tag, "value": float(value), "it": int(it)})

    def log_scalars(self, prefix: str, values: Dict[str, float], it: int):
        self._write(
            {"prefix": prefix, "it": int(it),
             **{k: float(v) for k, v in values.items()}}
        )

    def close(self):
        self.f.close()


class Tee:
    """Duplicate stdout to a file (``utils/my_utils.py:373-391``)."""

    def __init__(self, path: str, mode: str = "a"):
        self.file = open(path, mode)
        self.stdout = sys.stdout
        sys.stdout = self

    def close(self):
        sys.stdout = self.stdout
        self.file.close()

    def write(self, data):
        self.file.write(data)
        self.stdout.write(data)

    def flush(self):
        self.file.flush()
        self.stdout.flush()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# ---------------------------------------------------------------------------
# DAVIS J&F video-segmentation scoring
# ---------------------------------------------------------------------------

def _boundary(mask: np.ndarray) -> np.ndarray:
    """Binary boundary map, exactly davis2017-evaluation's ``seg2bmap``
    at equal input/output size: a pixel is boundary iff it differs from
    its east, south, or south-east neighbour (with the official
    border-row/column handling)."""
    seg = mask.astype(bool)
    e = np.zeros_like(seg)
    s = np.zeros_like(seg)
    se = np.zeros_like(seg)
    e[:, :-1] = seg[:, 1:]
    s[:-1, :] = seg[1:, :]
    se[:-1, :-1] = seg[1:, 1:]
    b = (seg ^ e) | (seg ^ s) | (seg ^ se)
    b[-1, :] = seg[-1, :] ^ e[-1, :]
    b[:, -1] = seg[:, -1] ^ s[:, -1]
    b[-1, -1] = False
    return b


def davis_jf(pred_idx: np.ndarray, gt_idx: np.ndarray,
             num_objects: Optional[int] = None,
             bound_ratio: float = 0.008,
             objects: Optional[Sequence[int]] = None) -> Dict[str, float]:
    """Per-frame DAVIS metrics for index masks (0 = background).

    The reference writes masks for EXTERNAL davis2017-evaluation scoring
    (``XMem/eval.py``); here the standard measures are computed directly:
    J = per-object region IoU, F = boundary F-measure with boundary-match
    tolerance ``bound_ratio * image diagonal`` (the davis2017 default).
    Returns {'J': mean over objects, 'F': mean, 'JF': (J+F)/2}.

    ``objects`` restricts scoring to those ids (for partially-annotated
    ground truth, e.g. YouTubeVOS first-appearance frames where absent
    objects are background in the PNG, not truly absent).
    """
    import cv2

    H, W = gt_idx.shape
    if num_objects is None:
        num_objects = int(max(pred_idx.max(), gt_idx.max()))
    if objects is None:
        objects = range(1, num_objects + 1)
    objects = [int(o) for o in objects]
    if not objects:
        return {"J": 1.0, "F": 1.0, "JF": 1.0}
    # official bound_pix: ceil(bound_th * diagonal), dilated with the
    # skimage Euclidean disk (f_boundary.py: binary_dilation(., disk(r)))
    rad = max(1, int(np.ceil(bound_ratio * np.sqrt(H * H + W * W))))
    yy, xx = np.mgrid[-rad:rad + 1, -rad:rad + 1]
    kernel = ((yy * yy + xx * xx) <= rad * rad).astype(np.uint8)
    js, fs = [], []
    for o in objects:
        p = pred_idx == o
        g = gt_idx == o
        union = (p | g).sum()
        js.append(1.0 if union == 0 else (p & g).sum() / union)
        pb, gb = _boundary(p), _boundary(g)
        if pb.sum() == 0 and gb.sum() == 0:
            fs.append(1.0)
            continue
        if pb.sum() == 0 or gb.sum() == 0:
            fs.append(0.0)
            continue
        gb_d = cv2.dilate(gb.astype(np.uint8), kernel) > 0
        pb_d = cv2.dilate(pb.astype(np.uint8), kernel) > 0
        precision = (pb & gb_d).sum() / pb.sum()
        recall = (gb & pb_d).sum() / gb.sum()
        fs.append(0.0 if precision + recall == 0
                  else 2 * precision * recall / (precision + recall))
    j, f = float(np.mean(js)), float(np.mean(fs))
    return {"J": j, "F": f, "JF": (j + f) / 2}
