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

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}


def _load_family_params(path: str, family: str, cfg=None):
    """Load model params from either a pre-converted ``.npz`` pytree
    (``tools/convert_ckpts.py``) or a raw torch checkpoint (converted here
    under the key-coverage audit). Returns ``(params, cfg)`` — for
    GroundingDINO the config is sniffed from the checkpoint (swin-t vs
    swin-b) unless given, so the detector is built with the matching
    trunk."""
    from d3fields_tpu.utils.convert import convert_family, load_params

    if path.endswith(".npz"):
        params, _meta = load_params(path)
        if cfg is None and family in ("gdino", "sam"):
            # sniff the variant from the params themselves (the patch-embed
            # width), so any .npz works — including ones written via plain
            # save_params without the convert_ckpts meta; the config_for_*
            # helpers raise actionably on unknown widths
            leaf = (("swin", "patch_w") if family == "gdino"
                    else ("vision", "patch_w"))
            try:
                node = params
                for k in leaf:
                    node = node[k]
                embed = int(node.shape[-1])
            except (KeyError, TypeError, AttributeError):
                raise ValueError(
                    f"cannot sniff the {family} model variant from "
                    f"{path!r}: no {'/'.join(leaf)} leaf in the pytree — "
                    "pass an explicit cfg"
                ) from None
            if family == "gdino":
                from d3fields_tpu.models.groundingdino.model import (
                    config_for_trunk,
                )

                cfg = config_for_trunk(embed)
            else:
                from d3fields_tpu.models.sam.model import (
                    config_for_encoder_width,
                )

                cfg = config_for_encoder_width(embed)
        return params, cfg
    params, cfg = convert_family(family, _load_torch_sd(path), cfg)
    return params, cfg


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
    params, _ = _load_family_params(ckpt, "dinov2_hub", cfg)
    return Dinov2Backbone(params, cfg, compute_dtype="bfloat16")


def build_mask_backend(sam_ckpt: str | None = None,
                       gdino_ckpt: str | None = None,
                       vocab: str | None = None):
    from d3fields_tpu.models.groundingdino.detector import GroundingDinoDetector
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
    # cfg=None: the SAM encoder variant (vit-b/l/h) and the GroundingDINO
    # trunk (swin-t/b) are sniffed from the checkpoint / npz params so any
    # reference checkpoint works end-to-end
    sam_params, scfg = _load_family_params(sam_ckpt, "sam", None)
    gdino_params, gcfg = _load_family_params(gdino_ckpt, "gdino", None)
    tokenize = _wordpiece_tokenizer(vocab) if vocab else None
    # On ONE 16 GB chip the 800-scale multi-view detection batch overflows
    # HBM (encoder deformable-sampling temporaries) — chunk per view there;
    # with more devices the all-views batch shards over dp. Chunking never
    # changes numerics (tests/test_groundingdino.py::
    # test_view_chunked_batch_matches_unchunked). D3F_GDINO_VIEW_CHUNK
    # overrides (0 = all views in one batch).
    import jax

    chunk_env = os.environ.get("D3F_GDINO_VIEW_CHUNK")
    if chunk_env is not None:
        view_chunk = int(chunk_env) or None
    else:
        view_chunk = 1 if jax.device_count() == 1 else None
    return GroundedSAMBackend(
        # D3F_GDINO_DTYPE=bfloat16: the gated MXU trunk (Swin + encoder
        # bf16, selection/decoder/heads f32 — detection agreement pinned
        # in tests/test_groundingdino.py::test_bf16_trunk_agreement;
        # measured 1.2x the f32 detection on one v5e).
        # D3F_GDINO_QUERY_CHUNK tiles the deformable gather (default 4096
        # — the measured single-chip optimum; 0 = un-tiled).
        # D3F_GDINO_GATHER overrides the gather lowering (auto | pallas |
        # xla; "auto" = the Mosaic VMEM-resident kernel on TPU — exact
        # parity, gates in tests_tpu/test_gdino_gather.py).
        GroundingDinoDetector(
            gdino_params, gcfg, tokenize=tokenize, view_chunk=view_chunk,
            compute_dtype=os.environ.get("D3F_GDINO_DTYPE", "float32"),
            query_chunk=int(
                os.environ.get("D3F_GDINO_QUERY_CHUNK", "4096")) or None,
            gather_impl={"xla": None}.get(
                os.environ.get("D3F_GDINO_GATHER", "auto"),
                os.environ.get("D3F_GDINO_GATHER", "auto")),
        ),
        # D3F_SAM_DTYPE=bfloat16 runs the ViT trunk on the MXU in bf16
        # (~4x encode on TPU; bf16-vs-f32 mask agreement is pinned in
        # tests/test_sam.py) and lifts the decoder's f32 matmul-precision
        # pin (~9x decode; on-chip gate in tests_tpu/)
        SamPredictor(sam_params, scfg,
                     compute_dtype=os.environ.get("D3F_SAM_DTYPE",
                                                  "float32")),
    )


def _is_punctuation(ch: str) -> bool:
    import unicodedata

    cp = ord(ch)
    # BERT treats all non-letter/number ASCII as punctuation
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(cp: int) -> bool:
    return (
        0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF or 0x2A700 <= cp <= 0x2B73F
        or 0x2B740 <= cp <= 0x2B81F or 0x2B820 <= cp <= 0x2CEAF
        or 0xF900 <= cp <= 0xFAFF or 0x2F800 <= cp <= 0x2FA1F
    )


def _basic_tokenize(text: str):
    """HF ``BasicTokenizer(do_lower_case=True)`` semantics: clean control
    chars, space out CJK, whitespace-split, lowercase, strip accents (NFD,
    drop Mn), split each punctuation char into its own token."""
    import unicodedata

    cleaned = []
    for ch in text:
        cp = ord(ch)
        cat = unicodedata.category(ch)
        # HF _is_control treats every category-C char (Cc/Cf/Co/Cs/Cn)
        # except \t\n\r as a control character to strip
        if cp == 0 or cp == 0xFFFD or (cat.startswith("C")
                                       and ch not in "\t\n\r"):
            continue
        if ch in "\t\n\r" or cat == "Zs":
            cleaned.append(" ")
        elif _is_cjk(cp):
            cleaned.append(f" {ch} ")
        else:
            cleaned.append(ch)
    out = []
    for tok in "".join(cleaned).split():
        tok = tok.lower()
        tok = "".join(c for c in unicodedata.normalize("NFD", tok)
                      if unicodedata.category(c) != "Mn")
        cur = []
        for ch in tok:
            if _is_punctuation(ch):
                if cur:
                    out.append("".join(cur))
                    cur = []
                out.append(ch)
            else:
                cur.append(ch)
        if cur:
            out.append("".join(cur))
    return out


def _wordpiece_tokenizer(vocab_path: str):
    """BERT tokenizer from a vocab.txt: full BasicTokenizer preprocessing
    (punctuation splitting, accent stripping, CJK spacing — what the
    reference gets via HF ``BertTokenizer`` inside GroundingDINO,
    ``utils/grounded_sam.py:418-424``) + greedy-longest-match WordPiece.
    Returns content ids only; the detector adds [CLS]/[SEP] itself.
    Token-id equality vs HF is asserted in
    ``tests/test_groundingdino.py::test_tokenizer_matches_hf_bert``."""
    with open(vocab_path, encoding="utf-8") as f:
        vocab = {w.rstrip("\n") : i for i, w in enumerate(f)}
    unk = vocab.get("[UNK]", 100)

    def wordpiece(word: str):
        if len(word) > 100:  # HF max_input_chars_per_word
            return [unk]
        start, toks = 0, []
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = ("##" if start > 0 else "") + word[start:end]
                if sub in vocab:
                    cur = vocab[sub]
                    break
                end -= 1
            if cur is None:
                return [unk]
            toks.append(cur)
            start = end
        return toks

    def tokenize(text: str):
        ids = []
        for word in _basic_tokenize(text):
            ids.extend(wordpiece(word))
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
    params, _ = _load_family_params(ckpt, "xmem", cfg)

    def factory(num_views, num_objects, image_hw):
        return VideoMaskTracker(
            params, cfg, num_views=num_views, num_objects=num_objects,
            image_hw=image_hw, size=cfg.size,
        )

    return factory


def build_real_backends():
    return build_feature_backend(), build_mask_backend()
