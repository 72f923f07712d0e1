"""GroundedSAMBackend: open-text instance masks from GroundingDINO + SAM.

Rebuild of ``grounded_instance_sam_new_ver`` (``utils/grounded_sam.py:
404-442``), the one segmentation entry d3fields uses: detect boxes for the
query texts, segment every box with SAM (multimask, keep the best-scoring
mask), prepend the background mask = complement of the union. Implements the
:class:`d3fields_tpu.seg.backends.MaskBackend` protocol, so it drops into
``Fusion.text_queries_for_inst_mask[_no_track]`` unchanged.

Unlike the reference (one SamPredictor.predict python call per box,
``utils/grounded_sam.py:392-402``), all boxes are decoded in a single
batched SAM call.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from d3fields_tpu.models.groundingdino.detector import GroundingDinoDetector
from d3fields_tpu.models.sam.predictor import SamPredictor
from d3fields_tpu.seg.backends import with_background
from d3fields_tpu.seg.instances import ViewMasks

TEXT_THRESHOLD = 0.25  # reference utils/grounded_sam.py:414


class GroundedSAMBackend:
    def __init__(self, detector: GroundingDinoDetector, sam: SamPredictor):
        self.detector = detector
        self.sam = sam

    def segment(
        self,
        image: np.ndarray,
        queries: Sequence[str],
        thresholds: Sequence[float],
    ) -> ViewMasks:
        """image (H, W, 3) RGB uint8 -> ViewMasks with background first.

        ``thresholds[0]`` is the box threshold (reference
        ``grounded_instance_sam_new_ver`` uses only the first,
        ``utils/grounded_sam.py:423``).
        """
        det = self.detector.predict_with_classes(
            image, list(queries), box_threshold=float(thresholds[0]),
            text_threshold=TEXT_THRESHOLD,
        )
        H, W = image.shape[:2]
        if det.xyxy.shape[0] == 0:
            return with_background(
                np.zeros((0, H, W), bool), [], np.zeros((0,), np.float32)
            )
        masks_mm, iou = self.sam.set_image(image).predict_boxes(
            det.xyxy, multimask_output=True
        )
        best = iou.argmax(axis=1)
        masks = masks_mm[np.arange(masks_mm.shape[0]), best]  # (N, H, W)
        labels = [queries[int(c)] for c in det.class_id]
        return with_background(masks, labels, det.confidence)

    def segment_views(
        self,
        images: np.ndarray,
        queries: Sequence[str],
        thresholds: Sequence[float],
    ) -> List[ViewMasks]:
        """Every view in batched forwards: ONE GroundingDINO pass over all V
        images, ONE SAM encode dispatch for the whole rig, and ONE padded
        SAM decode dispatch for every view's boxes (the reference runs a
        python loop of detector+SAM per view, ``fusion.py:1116-1120``;
        round 3 still paid a dispatch per view for encode AND decode).
        images (V, H, W, 3) RGB uint8."""
        dets = self.detector.predict_with_classes_batch(
            images, list(queries), box_threshold=float(thresholds[0]),
            text_threshold=TEXT_THRESHOLD,
        )
        out = []
        H, W = images.shape[1:3]
        if all(det.xyxy.shape[0] == 0 for det in dets):
            return [
                with_background(np.zeros((0, H, W), bool), [],
                                np.zeros((0,), np.float32))
                for _ in dets
            ]
        per_view = self.sam.set_images(images).predict_boxes_views(
            [det.xyxy for det in dets], multimask_output=True
        )
        for v, det in enumerate(dets):
            if det.xyxy.shape[0] == 0:
                out.append(with_background(
                    np.zeros((0, H, W), bool), [],
                    np.zeros((0,), np.float32),
                ))
                continue
            masks_mm, iou = per_view[v]
            best = iou.argmax(axis=1)
            masks = masks_mm[np.arange(masks_mm.shape[0]), best]
            labels = [queries[int(c)] for c in det.class_id]
            out.append(with_background(masks, labels, det.confidence))
        return out
