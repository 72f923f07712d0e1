"""f-BRS click predictor + controller: the reference GUI's click pipeline.

Rebuild of ``fbrs/inference`` (``predictors/base.py``, ``predictors/brs.py``
``HRNetFeatureBRSPredictor`` insertion 'A' — the f-BRS-B mode the GUI
configures, ``fbrs_controller.py:20``), the transforms (``zoom_in.py``,
``limit_longest_side.py``, flip, sigmoid), the clicker, and the
``InteractiveController``/``FBRSController`` pair.

The f-BRS optimization ("backpropagating refinement") fits a per-channel
scale/bias over the CACHED backbone features so the re-run cost per
L-BFGS step is only the OCR head: here the loss AND its gradient are one
jitted JAX value_and_grad executable (the reference pays a full torch
autograd graph per step), driven by scipy's L-BFGS-B exactly like the
reference (``brs_functors.py:42-80``).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from d3fields_tpu.models.fbrs import hrnet
from d3fields_tpu.models.fbrs import model as fm

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class Click:
    is_positive: bool
    coords: Tuple[float, float]  # (y, x)


class Clicker:
    """Click history with undo (``inference/clicker.py:10-107``, the
    no-ground-truth subset the GUI uses)."""

    def __init__(self):
        self.clicks_list: List[Click] = []

    def add_click(self, click: Click):
        self.clicks_list.append(click)

    def get_clicks(self, clicks_limit: Optional[int] = None) -> List[Click]:
        return self.clicks_list[:clicks_limit]

    def reset_clicks(self):
        self.clicks_list = []

    def get_state(self) -> List[Click]:
        return list(self.clicks_list)

    def set_state(self, state: List[Click]):
        self.clicks_list = list(state)

    def __len__(self):
        return len(self.clicks_list)


# ---------------------------------------------------------------------------
# zoom-in (transforms/zoom_in.py)
# ---------------------------------------------------------------------------

def _bbox_from_mask(mask: np.ndarray) -> Tuple[int, int, int, int]:
    rows = np.any(mask, axis=1)
    cols = np.any(mask, axis=0)
    rmin, rmax = np.where(rows)[0][[0, -1]]
    cmin, cmax = np.where(cols)[0][[0, -1]]
    return rmin, rmax, cmin, cmax


def _expand_bbox(bbox, ratio, min_size):
    rmin, rmax, cmin, cmax = bbox
    rc, cc = 0.5 * (rmin + rmax), 0.5 * (cmin + cmax)
    h = ratio * (rmax - rmin + 1)
    w = ratio * (cmax - cmin + 1)
    h, w = max(h, min_size), max(w, min_size)
    return (int(round(rc - 0.5 * h)), int(round(rc + 0.5 * h)),
            int(round(cc - 0.5 * w)), int(round(cc + 0.5 * w)))


def _clamp_bbox(bbox, rmin, rmax, cmin, cmax):
    return (max(bbox[0], rmin), min(bbox[1], rmax),
            max(bbox[2], cmin), min(bbox[3], cmax))


def _bbox_iou(b1, b2):
    h = min(b1[1], b2[1]) - max(b1[0], b2[0]) + 1
    w = min(b1[3], b2[3]) - max(b1[2], b2[2]) + 1
    if h <= 0 or w <= 0:
        return 0.0
    a1 = (b1[1] - b1[0] + 1) * (b1[3] - b1[2] + 1)
    a2 = (b2[1] - b2[0] + 1) * (b2[3] - b2[2] + 1)
    return h * w / (a1 + a2 - h * w)


class ZoomIn:
    """Crop-and-refine around the current object (``zoom_in.py:9-160``):
    once clicks exceed ``skip_clicks`` and a mask exists, the network runs
    on an expanded tight-crop resized so its long side is ``target_size``;
    predictions paste back into the full frame."""

    def __init__(self, target_size=480, skip_clicks=1, expansion_ratio=1.4,
                 min_crop_size=200, recompute_thresh_iou=0.5,
                 prob_thresh=0.5):
        self.target_size = target_size
        self.skip_clicks = skip_clicks
        self.expansion_ratio = expansion_ratio
        self.min_crop_size = min_crop_size
        self.recompute_thresh_iou = recompute_thresh_iou
        self.prob_thresh = prob_thresh
        self.reset()

    def reset(self):
        self._input_hw = None
        self._object_roi = None
        self._prev_probs = None   # np (1, H, W)
        self._roi_image = None
        self.image_changed = False

    def transform(self, image: Array, clicks: List[Click]):
        self.image_changed = False
        if len(clicks) <= self.skip_clicks:
            return image, clicks
        self._input_hw = image.shape[1:3]
        roi = None
        if self._prev_probs is not None:
            mask = self._prev_probs[0] > self.prob_thresh
            for c in clicks:
                if c.is_positive:
                    mask[int(c.coords[0]), int(c.coords[1])] = True
            if mask.any():
                bbox = _expand_bbox(_bbox_from_mask(mask),
                                    self.expansion_ratio, self.min_crop_size)
                H, W = mask.shape
                roi = _clamp_bbox(bbox, 0, H - 1, 0, W - 1)
        if roi is None:
            return image, clicks

        update = (
            self._object_roi is None
            or not self._clicks_inside(self._object_roi, clicks)
            or _bbox_iou(roi, self._object_roi) < self.recompute_thresh_iou
        )
        if update:
            self._object_roi = roi
            rmin, rmax, cmin, cmax = roi
            crop = image[:, rmin:rmax + 1, cmin:cmax + 1]
            scale = self.target_size / max(crop.shape[1], crop.shape[2])
            size = (int(round(crop.shape[1] * scale)),
                    int(round(crop.shape[2] * scale)))
            self._roi_image = hrnet.resize_bilinear_ac(crop, size)
            self.image_changed = True
        return self._roi_image, self._transform_clicks(clicks)

    @staticmethod
    def _clicks_inside(roi, clicks):
        for c in clicks:
            if c.is_positive:
                if not (roi[0] <= c.coords[0] < roi[1]
                        and roi[2] <= c.coords[1] < roi[3]):
                    return False
        return True

    def _transform_clicks(self, clicks):
        rmin, rmax, cmin, cmax = self._object_roi
        ch, cw = self._roi_image.shape[1:3]
        out = []
        for c in clicks:
            out.append(Click(
                c.is_positive,
                (ch * (c.coords[0] - rmin) / (rmax - rmin + 1),
                 cw * (c.coords[1] - cmin) / (cmax - cmin + 1)),
            ))
        return out

    def inv_transform(self, prob: np.ndarray) -> np.ndarray:
        """(1, h, w) roi probs -> full-frame probs (pasted into zeros)."""
        if self._object_roi is None:
            self._prev_probs = prob
            return prob
        rmin, rmax, cmin, cmax = self._object_roi
        up = hrnet.resize_bilinear_ac(
            jnp.asarray(prob)[..., None],
            (rmax - rmin + 1, cmax - cmin + 1),
        )[..., 0]
        full = np.zeros((1,) + tuple(self._input_hw), np.float32)
        full[:, rmin:rmax + 1, cmin:cmax + 1] = np.asarray(up)
        self._prev_probs = full
        return full

    def check_possible_recalculation(self) -> bool:
        if (self._prev_probs is None or self._object_roi is not None
                or self.skip_clicks > 0):
            return False
        mask = self._prev_probs[0] > self.prob_thresh
        if not mask.any():
            return False
        H, W = mask.shape
        roi = _clamp_bbox(
            _expand_bbox(_bbox_from_mask(mask), self.expansion_ratio,
                         self.min_crop_size), 0, H - 1, 0, W - 1)
        return _bbox_iou(roi, (0, H - 1, 0, W - 1)) < 0.5

    def get_state(self):
        return (self._input_hw, self._object_roi, self._prev_probs,
                self._roi_image, self.image_changed)

    def set_state(self, state):
        (self._input_hw, self._object_roi, self._prev_probs,
         self._roi_image, self.image_changed) = state


# ---------------------------------------------------------------------------
# predictor
# ---------------------------------------------------------------------------

def _points_array(clicks: List[Click], limit: int) -> np.ndarray:
    """(1, 2*n, 2) reference click layout (``base.py:76-96``)."""
    clicks = clicks[:limit]
    pos = [c.coords for c in clicks if c.is_positive]
    neg = [c.coords for c in clicks if not c.is_positive]
    n = max(1, max(len(pos), len(neg)))
    pos = pos + [(-1.0, -1.0)] * (n - len(pos))
    neg = neg + [(-1.0, -1.0)] * (n - len(neg))
    return np.asarray([pos + neg], np.float32)


def _click_masks(clicks: List[Click], hw, radius=1):
    """3x3 positive/negative click stamps (``brs.py:24-44``)."""
    H, W = hw
    pos = np.zeros((1, H, W), np.float32)
    neg = np.zeros((1, H, W), np.float32)
    for c in clicks:
        y, x = int(round(c.coords[0])), int(round(c.coords[1]))
        tgt = pos if c.is_positive else neg
        tgt[0, max(y - radius, 0):y + radius + 1,
            max(x - radius, 0):x + radius + 1] = 1.0
    return pos, neg


class FbrsPredictor:
    """f-BRS-B prediction over cached HRNet feats (``brs.py:141-231``).

    ``brs=False`` gives the NoBRS fallback (plain forward). ``with_flip``
    doubles the batch with a mirrored copy and averages at the end
    (``AddHorizontalFlip``). The per-click L-BFGS-B refinement optimizes
    a per-channel (scale, bias) on the cached features; value+gradient
    come from ONE jitted executable per feature shape.
    """

    def __init__(self, params, cfg: fm.FbrsConfig, *, brs=True,
                 with_flip=True, zoom_in: Optional[ZoomIn] = None,
                 net_clicks_limit=8, optimize_after_n_clicks=1,
                 prob_thresh=0.5, reg_weight=1e-3, reg_bias_weight=10.0,
                 min_iou_diff=1e-3, maxfun=20):
        self.params = jax.device_put(params)
        self.cfg = cfg
        self.brs = brs
        self.with_flip = with_flip
        self.zoom_in = zoom_in
        self.net_clicks_limit = net_clicks_limit
        self.optimize_after_n_clicks = optimize_after_n_clicks
        self.prob_thresh = prob_thresh
        self.reg_weight = reg_weight
        self.reg_bias_weight = reg_bias_weight
        self.min_iou_diff = min_iou_diff
        self.maxfun = maxfun
        self.num_channels = cfg.backbone.feats_channels
        self._image = None
        self.opt_data = None
        self.input_data = None

        self._feats_fn = jax.jit(fm.backbone_feats, static_argnames=("cfg",))
        self._forward_fn = jax.jit(fm.forward, static_argnames=("cfg",))

        def loss_and_pred(params, feats, sb, pos, neg, out_hw):
            # BRSMaskLoss over every (possibly flipped) batch row with its
            # own mirrored click masks — the reference's flip_average=False
            # configuration (brs_losses.py:6-26, predictors/__init__.py:55)
            scale, bias = jnp.split(sb, 2)
            reg = (self.reg_weight
                   * (jnp.sum(scale ** 2)
                      + self.reg_bias_weight * jnp.sum(bias ** 2)))
            mod = feats * (1.0 + scale)[None, None, None, :] + bias
            logits = fm.head_from_feats(params, cfg, mod, out_hw)[..., 0]
            prob = jax.nn.sigmoid(logits)
            pos_diff = (1.0 - prob) * pos
            neg_diff = prob * neg
            eps = 1e-5
            loss = (jnp.sum(pos_diff ** 2) / (jnp.sum(pos) + eps)
                    + jnp.sum(neg_diff ** 2) / (jnp.sum(neg) + eps) + reg)
            aux = (logits, jnp.max(jnp.abs(pos_diff)),
                   jnp.max(jnp.abs(neg_diff)), prob)
            return loss, aux

        self._val_grad = jax.jit(
            jax.value_and_grad(loss_and_pred, argnums=2, has_aux=True),
            static_argnames=("out_hw",),
        )

    # -- reference API ----------------------------------------------------
    def set_input_image(self, image: np.ndarray):
        """image (H, W, 3) float32, already normalized like the GUI feeds
        it (``fbrs_controller.py:36-40``)."""
        if self.zoom_in is not None:
            self.zoom_in.reset()
        self._image = jnp.asarray(image, jnp.float32)[None]
        self.opt_data = None
        self.input_data = None

    def get_prediction(self, clicker: Clicker) -> np.ndarray:
        clicks = clicker.get_clicks()
        image, tclicks = self._image, clicks
        if self.zoom_in is not None:
            image, tclicks = self.zoom_in.transform(image, clicks)
            changed = self.zoom_in.image_changed
        else:
            changed = False

        prob = self._predict(image, tclicks, changed)
        if self.zoom_in is not None:
            prob = self.zoom_in.inv_transform(prob)
            if self.zoom_in.check_possible_recalculation():
                return self.get_prediction(clicker)
        return prob[0]

    def _predict(self, image: Array, clicks: List[Click],
                 image_changed: bool) -> np.ndarray:
        """Returns (1, h, w) probabilities at ``image`` resolution."""
        hw = image.shape[1:3]
        pts = _points_array(clicks, self.net_clicks_limit)
        if self.with_flip:
            W = hw[1]
            flipped = pts.copy()
            valid = flipped.max(axis=-1) >= 0
            flipped[..., 1] = np.where(valid, W - 1 - flipped[..., 1],
                                       flipped[..., 1])
            pts = np.concatenate([pts, flipped], axis=0)
            image = jnp.concatenate([image, image[:, :, ::-1]], axis=0)

        if not self.brs:
            logits = self._forward_fn(self.params, self.cfg, image,
                                      jnp.asarray(pts))[..., 0]
            return np.asarray(self._finalize(logits))

        pos, neg = _click_masks(clicks, hw)
        if self.with_flip:
            # each flipped batch row gets mirrored click stamps
            pos = np.concatenate([pos, pos[:, :, ::-1]], axis=0)
            neg = np.concatenate([neg, neg[:, :, ::-1]], axis=0)
        if self.opt_data is None:
            self.opt_data = np.zeros((2 * self.num_channels,), np.float32)
        if (len(clicks) <= self.net_clicks_limit or image_changed
                or self.input_data is None
                or self.input_data.shape[1:3] != (hw[0] // 4, hw[1] // 4)):
            self.input_data = self._feats_fn(self.params, self.cfg, image,
                                             jnp.asarray(pts))

        posj, negj = jnp.asarray(pos), jnp.asarray(neg)
        best = {"loss": None, "logits": None}
        last_mask = [None]

        def fun(x):
            (loss, aux), grad = self._val_grad(
                self.params, self.input_data,
                jnp.asarray(x, jnp.float32), posj, negj, tuple(hw),
            )
            logits, fpos, fneg, prob = aux
            f = float(loss)
            if best["loss"] is None or f < best["loss"]:
                best["loss"], best["logits"] = f, np.asarray(logits)
            # reference early-stop rules (brs_functors.py:63-74)
            if (float(fpos) < 1 - self.prob_thresh
                    and float(fneg) < self.prob_thresh):
                return f, np.zeros_like(x)
            cur = np.asarray(prob) > self.prob_thresh
            if last_mask[0] is not None and self.min_iou_diff > 0:
                # per-row IoU vs the previous step, mean over rows
                # (metrics._compute_iou via brs_functors.py:67-71)
                inter = np.logical_and(cur, last_mask[0]).sum(axis=(1, 2))
                union = np.logical_or(cur, last_mask[0]).sum(axis=(1, 2))
                ious = inter[union > 0] / union[union > 0]
                if ious.size and ious.mean() > 1 - self.min_iou_diff:
                    return f, np.zeros_like(x)
            last_mask[0] = cur
            return f, np.asarray(grad, np.float64)

        if len(clicks) > self.optimize_after_n_clicks:
            from scipy.optimize import fmin_l_bfgs_b

            x, _, _ = fmin_l_bfgs_b(fun, self.opt_data.astype(np.float64),
                                    m=20, factr=0, pgtol=1e-8,
                                    maxfun=self.maxfun,
                                    maxiter=2 * self.maxfun)
            self.opt_data = x.astype(np.float32)

        if best["logits"] is not None:
            logits = best["logits"]
        else:
            (_, aux), _ = self._val_grad(
                self.params, self.input_data,
                jnp.asarray(self.opt_data), posj, negj, tuple(hw),
            )
            logits = np.asarray(aux[0])
        return np.asarray(self._finalize(jnp.asarray(logits)))

    def _finalize(self, logits: Array) -> Array:
        """Flip-average LOGITS then sigmoid — the reference's inverse
        transform order (reversed [zoom, sigmoid, flip] applies the flip
        average before SigmoidForPred, base.py:46-49)."""
        if self.with_flip:
            logits = 0.5 * (logits[:1] + logits[1:2, :, ::-1])
        return jax.nn.sigmoid(logits)

    def get_states(self):
        zoom = self.zoom_in.get_state() if self.zoom_in is not None else None
        return {"opt_data": None if self.opt_data is None
                else self.opt_data.copy(), "zoom": zoom}

    def set_states(self, states):
        self.opt_data = states["opt_data"]
        if self.zoom_in is not None:
            self.zoom_in.set_state(states["zoom"])


class FBRSController:
    """Top-level click controller with undo, the GUI's click backend
    (``fbrs_controller.py`` + ``fbrs/controller.py``): anchor an image,
    feed (x, y, positive) clicks, get back thresholded masks."""

    def __init__(self, params, cfg: fm.FbrsConfig, *, brs=True,
                 with_flip=True, target_size=480, prob_thresh=0.5):
        self.predictor = FbrsPredictor(
            params, cfg, brs=brs, with_flip=with_flip,
            zoom_in=ZoomIn(target_size=target_size, skip_clicks=1,
                           expansion_ratio=1.4),
            prob_thresh=prob_thresh,
        )
        self.prob_thresh = prob_thresh
        self.clicker = Clicker()
        self.states: list = []
        self.probs_history: list = []
        self.anchored = False

    def unanchor(self):
        self.anchored = False

    def interact(self, image: np.ndarray, x: float, y: float,
                 is_positive: bool) -> np.ndarray:
        """(H, W, 3) normalized image + one click -> (H, W) bool mask."""
        if not self.anchored:
            self.predictor.set_input_image(image)
            self.clicker.reset_clicks()
            self.states = []
            self.probs_history = []
            self.anchored = True
        self.states.append({
            "clicker": self.clicker.get_state(),
            "predictor": self.predictor.get_states(),
        })
        self.clicker.add_click(Click(is_positive, (y, x)))
        prob = self.predictor.get_prediction(self.clicker)
        self.probs_history.append(prob)
        return prob > self.prob_thresh

    def undo(self) -> Optional[np.ndarray]:
        if not self.states:
            return None
        st = self.states.pop()
        self.clicker.set_state(st["clicker"])
        self.predictor.set_states(st["predictor"])
        self.probs_history.pop()
        if not self.probs_history:
            return None
        return self.probs_history[-1] > self.prob_thresh
