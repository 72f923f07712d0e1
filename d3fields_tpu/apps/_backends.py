"""Real-model backend construction for the apps.

Loads pretrained weights when available (paths or env vars); raises with a
clear message otherwise so the ``--synthetic`` path stays the zero-setup
default. Checkpoint sources:

- DINOv2: a torch-hub ``dinov2_vitl14`` state dict (``D3F_DINOV2_CKPT``);
- SAM: a huggingface ``SamModel`` state dict (``D3F_SAM_CKPT``);
- GroundingDINO: a huggingface ``GroundingDinoForObjectDetection`` state
  dict (``D3F_GDINO_CKPT``) + a BERT vocab file (``D3F_BERT_VOCAB``);
- XMem: the reference XMem.pth (``D3F_XMEM_CKPT``) for video mask
  propagation (without it, tracking apps fall back to per-frame
  re-detection with overlap relabeling).
"""

from __future__ import annotations

import os


def _load_torch_sd(path: str):
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() for k, v in sd.items()}


def _load_family_params(path: str, family: str, cfg=None):
    """Load model params from either a pre-converted ``.npz`` pytree
    (``tools/convert_ckpts.py``) or a raw torch checkpoint (converted here
    under the key-coverage audit)."""
    from d3fields_tpu.utils.convert import convert_family, load_params

    if path.endswith(".npz"):
        params, _meta = load_params(path)
        return params
    params, _cfg = convert_family(family, _load_torch_sd(path), cfg)
    return params


def build_feature_backend(ckpt: str | None = None):
    from d3fields_tpu.models.dinov2 import Dinov2Backbone, Dinov2Config

    ckpt = ckpt or os.environ.get("D3F_DINOV2_CKPT")
    if not ckpt or not os.path.exists(ckpt):
        raise FileNotFoundError(
            "DINOv2 checkpoint not found; set D3F_DINOV2_CKPT to a torch-hub "
            "dinov2_vitl14 state dict (or a converted .npz), or run with "
            "--synthetic"
        )
    cfg = Dinov2Config.vit_large()
    params = _load_family_params(ckpt, "dinov2_hub", cfg)
    return Dinov2Backbone(params, cfg, compute_dtype="bfloat16")


def build_mask_backend(sam_ckpt: str | None = None,
                       gdino_ckpt: str | None = None,
                       vocab: str | None = None):
    from d3fields_tpu.models.groundingdino.detector import GroundingDinoDetector
    from d3fields_tpu.models.groundingdino.model import GroundingDinoConfig
    from d3fields_tpu.models.sam.model import SamConfig
    from d3fields_tpu.models.sam.predictor import SamPredictor
    from d3fields_tpu.seg.grounded_sam import GroundedSAMBackend

    sam_ckpt = sam_ckpt or os.environ.get("D3F_SAM_CKPT")
    gdino_ckpt = gdino_ckpt or os.environ.get("D3F_GDINO_CKPT")
    vocab = vocab or os.environ.get("D3F_BERT_VOCAB")
    if not (sam_ckpt and gdino_ckpt and os.path.exists(sam_ckpt)
            and os.path.exists(gdino_ckpt)):
        raise FileNotFoundError(
            "SAM/GroundingDINO checkpoints not found; set D3F_SAM_CKPT and "
            "D3F_GDINO_CKPT (+ D3F_BERT_VOCAB), or run with --synthetic"
        )
    sam_params = _load_family_params(sam_ckpt, "sam", SamConfig.vit_huge())
    gdino_params = _load_family_params(
        gdino_ckpt, "gdino", GroundingDinoConfig()
    )
    tokenize = _wordpiece_tokenizer(vocab) if vocab else None
    return GroundedSAMBackend(
        GroundingDinoDetector(gdino_params, GroundingDinoConfig(),
                              tokenize=tokenize),
        SamPredictor(sam_params),
    )


def _wordpiece_tokenizer(vocab_path: str):
    """Minimal BERT wordpiece tokenizer from a vocab.txt file."""
    with open(vocab_path) as f:
        vocab = {w.strip(): i for i, w in enumerate(f)}

    def tokenize(text: str):
        ids = []
        for word in text.lower().split():
            start, toks = 0, []
            while start < len(word):
                end = len(word)
                cur = None
                while start < end:
                    sub = word[start:end]
                    if start > 0:
                        sub = "##" + sub
                    if sub in vocab:
                        cur = vocab[sub]
                        break
                    end -= 1
                if cur is None:
                    toks = [vocab.get("[UNK]", 100)]
                    break
                toks.append(cur)
                start = end
            ids.extend(toks)
        return ids

    return tokenize


def build_video_tracker_factory(ckpt: str | None = None):
    """Factory for ``Fusion(video_tracker_factory=...)``: called lazily on
    the first tracked frame with (num_views, num_objects, image_hw) once
    the consensus object count is known. Returns None when no XMem
    checkpoint is configured (callers then use per-frame re-detection)."""
    ckpt = ckpt or os.environ.get("D3F_XMEM_CKPT")
    if not ckpt or not os.path.exists(ckpt):
        return None
    from d3fields_tpu.config import XMemConfig
    from d3fields_tpu.seg.video_tracker import VideoMaskTracker

    cfg = XMemConfig()
    params = _load_family_params(ckpt, "xmem", cfg)

    def factory(num_views, num_objects, image_hw):
        return VideoMaskTracker(
            params, cfg, num_views=num_views, num_objects=num_objects,
            image_hw=image_hw, size=cfg.size,
        )

    return factory


def build_real_backends():
    return build_feature_backend(), build_mask_backend()
