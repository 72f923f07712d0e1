"""Convert the reference's torch/HF checkpoints to framework pytrees.

The reference downloads torch checkpoints and loads them at runtime
(``fusion.py:223,235-262`` for DINOv2/SAM/GroundingDINO,
``XMem/model/network.py:134-198`` for XMem.pth). Here conversion is a
one-time offline step: each family's state dict is converted under a
key-coverage audit (fails on silently-dropped tensors) and stored as a
``.npz`` pytree that the apps load without importing torch.

Usage (also installed as the ``d3f-convert-ckpts`` console script):
    python -m d3fields_tpu.apps.convert_ckpts dinov2 /path/dinov2_vitl14.pth out/
    python -m d3fields_tpu.apps.convert_ckpts --hf dinov2 /path/hf_state.pth out/
    python -m d3fields_tpu.apps.convert_ckpts sam /path/sam_hf.pth out/
    python -m d3fields_tpu.apps.convert_ckpts gdino /path/gdino_hf.pth out/
    python -m d3fields_tpu.apps.convert_ckpts xmem /path/XMem.pth out/
    python -m d3fields_tpu.apps.convert_ckpts all out/   # paths from D3F_* env vars

Outputs ``<family>.npz``; point ``D3F_<FAMILY>_CKPT`` at either the
original torch file or the converted ``.npz`` — the app backends accept
both.
"""

from __future__ import annotations

import argparse
import os
import sys

from d3fields_tpu.apps._backends import _load_torch_sd
from d3fields_tpu.utils.convert import convert_family, save_params


ENV_VARS = {
    "dinov2": "D3F_DINOV2_CKPT",
    "sam": "D3F_SAM_CKPT",
    "gdino": "D3F_GDINO_CKPT",
    "xmem": "D3F_XMEM_CKPT",
}


def convert_one(family: str, ckpt_path: str, out_dir: str, hf: bool = False) -> str:
    fam_key = (
        ("dinov2_hf" if hf else "dinov2_hub") if family == "dinov2" else family
    )
    sd = _load_torch_sd(ckpt_path)
    params, cfg = convert_family(fam_key, sd)
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{family}.npz")
    meta = {"family": fam_key, "source": ckpt_path}
    if family == "gdino":
        # record the sniffed trunk for humans inspecting the npz (the
        # loader re-sniffs from the params, so this is informational)
        from d3fields_tpu.models.groundingdino.model import trunk_name

        meta["gdino_trunk"] = trunk_name(cfg.swin.embed_dim)
    save_params(out, params, meta=meta)
    n = sum(1 for _ in _iter_leaves(params))
    print(f"[convert] {family}: {len(sd)} torch tensors -> {n} pytree leaves "
          f"-> {out}")
    return out


def _iter_leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _iter_leaves(v)
    elif isinstance(tree, (list, tuple)):
        for v in tree:
            yield from _iter_leaves(v)
    else:
        yield tree


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("family", choices=[*ENV_VARS, "all"])
    ap.add_argument("args", nargs="*",
                    help="<ckpt_path> <out_dir> (family mode) | <out_dir> (all)")
    ap.add_argument("--hf", action="store_true",
                    help="dinov2 checkpoint is a huggingface Dinov2Model "
                         "state dict rather than torch-hub format")
    ns = ap.parse_args(argv)

    if ns.family == "all":
        out_dir = ns.args[0] if ns.args else "converted_ckpts"
        done = 0
        for fam, env in ENV_VARS.items():
            path = os.environ.get(env)
            if not path or not os.path.exists(path):
                print(f"[convert] skip {fam}: ${env} unset or missing")
                continue
            convert_one(fam, path, out_dir, hf=ns.hf and fam == "dinov2")
            done += 1
        if not done:
            sys.exit("no checkpoints found via D3F_* env vars")
    else:
        if len(ns.args) != 2:
            ap.error("family mode needs <ckpt_path> <out_dir>")
        convert_one(ns.family, ns.args[0], ns.args[1], hf=ns.hf)


if __name__ == "__main__":
    main()
