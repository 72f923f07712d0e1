"""Checkpoint conversion utilities: key-coverage auditing + on-disk pytrees.

The reference consumes torch checkpoints directly (``fusion.py:223,235-262``
loads torch-hub DINOv2, SAM, GroundingDINO; ``XMem/model/network.py:134-198``
loads XMem.pth with ad-hoc key surgery). Our models convert those state
dicts to JAX pytrees. Conversion bugs are silent — a typo'd key pattern
drops a tensor and the model still runs, just wrong — so conversion here is
auditable:

- ``TrackedStateDict`` records every key a converter reads;
- ``audit_conversion`` fails on unconsumed tensors (unless explicitly
  allow-listed with a reason) and surfaces missing keys as real KeyErrors;
- ``save_params`` / ``load_params`` store converted pytrees as ``.npz``
  (flattened '/'-joined paths), so apps skip torch at startup.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Mapping, Sequence, Tuple

import numpy as np


class TrackedStateDict(Mapping):
    """A read-only mapping that records which keys were accessed.

    Membership tests (``k in sd``) are NOT recorded as consumption — a
    converter probing for an optional key shouldn't mark it consumed unless
    it actually reads the tensor.
    """

    def __init__(self, sd: Mapping[str, np.ndarray]):
        self._sd = dict(sd)
        self.accessed: set[str] = set()

    def __getitem__(self, k):
        v = self._sd[k]  # raise KeyError before recording
        self.accessed.add(k)
        return v

    def __iter__(self):
        return iter(self._sd)

    def __len__(self):
        return len(self._sd)

    def __contains__(self, k):
        return k in self._sd

    def unconsumed(self) -> set:
        return set(self._sd) - self.accessed


class _NpView(Mapping):
    """Lazy view over a state dict: ``np.asarray`` per read, no bulk copy.

    Converters use this instead of copying the whole dict up front so that
    a ``TrackedStateDict`` underneath sees the converter's REAL per-key
    reads (a bulk copy would mark every key accessed and make the coverage
    audit vacuous). Supports ``sd[k] = v`` via an overlay for converters
    that patch tensors in place (e.g. XMem's single-object conv1 pad).
    """

    def __init__(self, sd: Mapping):
        self._sd = sd
        self._overlay: Dict[str, np.ndarray] = {}

    def __getitem__(self, k):
        if k in self._overlay:
            return self._overlay[k]
        return np.asarray(self._sd[k])

    def __setitem__(self, k, v):
        self._overlay[k] = np.asarray(v)

    def __iter__(self):
        return iter(self._sd)

    def __len__(self):
        return len(self._sd)

    def __contains__(self, k):
        return k in self._overlay or k in self._sd


def np_view(sd: Mapping) -> _NpView:
    """Wrap a (possibly tracked) state dict for per-key numpy reads."""
    return sd if isinstance(sd, _NpView) else _NpView(sd)


def audit_conversion(
    convert_fn: Callable[[Mapping], Dict],
    sd: Mapping[str, np.ndarray],
    *,
    allowed_unused: Sequence[str] = (),
) -> Tuple[Dict, set]:
    """Run ``convert_fn`` on ``sd`` and fail on silently-dropped tensors.

    ``allowed_unused`` is a list of regex patterns (``re.search``) for keys
    the converter legitimately ignores (e.g. ``mask_token`` for
    inference-only DINOv2, BN ``num_batches_tracked`` counters, tied
    duplicates). Returns ``(params, unused_but_allowed)``. Raises
    ``ValueError`` listing every unconsumed key not covered by the
    allow-list; missing keys surface as the converter's own ``KeyError``.
    """
    import re

    tracked = TrackedStateDict(sd)
    params = convert_fn(tracked)
    unused = tracked.unconsumed()
    allowed = {k for k in unused if any(re.search(p, k) for p in allowed_unused)}
    bad = sorted(unused - allowed)
    if bad:
        shapes = {k: tuple(np.shape(sd[k])) for k in bad[:20]}
        raise ValueError(
            f"conversion dropped {len(bad)} checkpoint tensor(s) not on the "
            f"allow-list: {shapes}{' ...' if len(bad) > 20 else ''}"
        )
    return params, allowed


# ---------------------------------------------------------------------------
# Per-family conversion registry (what each converter may legitimately drop)
# ---------------------------------------------------------------------------

#: family -> allow-list of regexes for unconsumed checkpoint keys, each with
#: a reason documented here:
#: - dinov2 ``mask_token``: iBOT masking token, inference never uses it;
#: - sam ``prompt_encoder.shared_embedding``: tied duplicate of
#:   ``shared_image_embedding`` (verified tensor-equal);
#: - gdino ``relative_position_index``: constant Swin index buffer,
#:   recomputed at trace time;
#: - gdino ``model.decoder.bbox_embed`` / ``bbox_embed.{i>0}``: HF
#:   ``decoder_bbox_embed_share=True`` ties every head to ``bbox_embed.0``
#:   (verified tensor-equal);
#: - xmem ``num_batches_tracked``: torch BN step counters, meaningless for
#:   inference-mode BN;
#: - s2m / fbrs ``num_batches_tracked``: same BN counters (their trunks are
#:   torchvision-style ResNet/HRNet with eval-mode BN folded at conversion).
ALLOWED_UNUSED = {
    "dinov2_hub": [r"mask_token"],
    "dinov2_hf": [r"mask_token"],
    "sam": [
        r"^prompt_encoder\.shared_embedding\.",
    ],
    "gdino": [
        r"relative_position_index",
        r"^model\.decoder\.bbox_embed\.",
        r"^bbox_embed\.(?!0\.)",
        r"position_ids",  # arange buffer old transformers serialized
    ],
    "xmem": [r"num_batches_tracked"],
    "s2m": [r"num_batches_tracked"],
    "fbrs": [r"num_batches_tracked"],
}


def convert_family(family: str, sd: Mapping[str, np.ndarray], cfg=None):
    """Audited conversion for a model family; returns (params, cfg).

    ``family``: dinov2_hub | dinov2_hf | sam | gdino | xmem | s2m | fbrs.
    ``cfg``
    defaults to the reference's production configuration for that family
    (ViT-L/14, XMem base); the SAM encoder variant (vit-b/l/h) and the
    GroundingDINO trunk (swin-t/b) are sniffed from the state dict.
    """
    if family in ("dinov2_hub", "dinov2_hf"):
        from d3fields_tpu.models import dinov2 as d2

        cfg = cfg or d2.Dinov2Config.vit_large()
        fn = (
            d2.convert_hub_state_dict
            if family == "dinov2_hub"
            else d2.convert_hf_state_dict
        )
        params, _ = audit_conversion(
            lambda s: fn(s, cfg), sd, allowed_unused=ALLOWED_UNUSED[family]
        )
    elif family == "sam":
        from d3fields_tpu.models.sam import model as S

        if cfg is None:
            # sniff the encoder variant from the patch-embed weight
            pe = "vision_encoder.patch_embed.projection.weight"
            if pe not in sd:
                raise ValueError(
                    f"cannot sniff the SAM encoder variant: key {pe!r} "
                    "missing from the state dict — pass an explicit cfg"
                )
            cfg = S.config_for_encoder_width(int(np.shape(sd[pe])[0]))
        params, _ = audit_conversion(
            lambda s: S.convert_hf_state_dict(s, cfg), sd,
            allowed_unused=ALLOWED_UNUSED["sam"],
        )
    elif family == "gdino":
        from d3fields_tpu.models.groundingdino import model as G

        if cfg is None:
            # sniff the trunk width from the patch-embed weight
            pe = ("model.backbone.conv_encoder.model.embeddings."
                  "patch_embeddings.projection.weight")
            if pe not in sd:
                raise ValueError(
                    f"cannot sniff the GroundingDINO trunk: key {pe!r} "
                    "missing from the state dict — pass an explicit cfg"
                )
            cfg = G.config_for_trunk(int(np.shape(sd[pe])[0]))
        params, _ = audit_conversion(
            lambda s: G.convert_hf_state_dict(s, cfg), sd,
            allowed_unused=ALLOWED_UNUSED["gdino"],
        )
    elif family == "xmem":
        from d3fields_tpu.config import XMemConfig
        from d3fields_tpu.models.xmem import network as xnet

        cfg = cfg or XMemConfig()
        params, _ = audit_conversion(
            lambda s: xnet.convert_torch_state_dict(s, cfg), sd,
            allowed_unused=ALLOWED_UNUSED["xmem"],
        )
    elif family == "s2m":
        from d3fields_tpu.models.s2m import model as s2

        cfg = cfg or s2.S2mConfig()
        params, _ = audit_conversion(
            s2.convert_torch_state_dict, sd,
            allowed_unused=ALLOWED_UNUSED["s2m"],
        )
    elif family == "fbrs":
        from d3fields_tpu.models.fbrs import model as fm

        # the fbrs converter sniffs its HRNet width/ocr config from the
        # state dict itself (is_hrnet_model.py checkpoints carry no cfg)
        sniffed = {}

        def _cv(s):
            p, c = fm.convert_torch_state_dict(s)
            sniffed["cfg"] = c
            return p

        params, _ = audit_conversion(
            _cv, sd, allowed_unused=ALLOWED_UNUSED["fbrs"]
        )
        cfg = cfg or sniffed["cfg"]
    else:
        raise ValueError(f"unknown family {family!r}; want one of "
                         f"{sorted(ALLOWED_UNUSED)}")
    return params, cfg


# ---------------------------------------------------------------------------
# On-disk converted pytrees
# ---------------------------------------------------------------------------

_SEP = "/"


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, Mapping):
        for k, v in tree.items():
            assert _SEP not in str(k), f"key {k!r} contains separator"
            out.update(_flatten(v, f"{prefix}{k}{_SEP}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}#{i}{_SEP}"))
    else:
        out[prefix[: -len(_SEP)]] = np.asarray(tree)
    return out


def _unflatten(flat: Mapping[str, np.ndarray]):
    root: Dict = {}
    for path, v in flat.items():
        parts = path.split(_SEP)
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v

    def fix(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.startswith("#") for k in node):
            return [fix(node[f"#{i}"]) for i in range(len(node))]
        return {k: fix(v) for k, v in node.items()}

    return fix(root)


def save_params(path: str, params, meta: Mapping[str, str] | None = None) -> None:
    """Save a converted pytree as .npz (host copy; device arrays fetched)."""
    flat = _flatten(params)
    if meta:
        for k, v in meta.items():
            flat[f"__meta__{_SEP}{k}"] = np.asarray(str(v))
    np.savez(path, **flat)


def load_params(path: str):
    """Load a pytree saved by ``save_params``; returns (params, meta)."""
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    meta = {
        k.split(_SEP, 1)[1]: str(flat.pop(k))
        for k in list(flat)
        if k.startswith(f"__meta__{_SEP}")
    }
    return _unflatten(flat), meta
