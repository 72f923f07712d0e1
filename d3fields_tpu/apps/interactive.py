"""Scriptable interactive video segmentation — the reference's
``XMem/interactive_demo.py`` without the Qt shell.

The GUI's full annotate/commit/propagate loop (``inference/interact/
gui.py``) runs headless from a command script (``--script`` file or
stdin), against the same workspace layout as the reference's
``ResourceManager`` (``resource_manager.py:39-180``): frames are decoded
from ``--video`` or copied/short-side-resized from ``--images`` into
``<workspace>/images`` (reused if already present, so interrupted runs
continue), masks load from and save to ``<workspace>/masks`` as
DAVIS-paletted PNGs.

Command language (one per line; ``#`` comments):

  goto T                     jump to frame T
  object K                   set the click target object (1-based)
  click X Y [+|-]            f-BRS click (default positive)
  scribble OBJ x,y x,y ...   S2M scribble stroke (OBJ 0 = background)
  free OBJ x,y x,y ...       free-paint stroke writing indices
  commit                     adopt the interacted mask for this frame
  propagate [forward|backward] [N]   XMem propagation (N = pause after)
  undo                       undo the last click
  vis MODE PATH              write the viewer overlay (davis|fade|light|
                             popup|layered) to PATH
  vis_target K               toggle object K in the popup/layered target set
  import_layer PATH          RGBA layer for 'layered' mode
  reset_mask | clear_memory | import_mask PATH | save

Checkpoints: ``D3F_XMEM_CKPT`` / ``D3F_S2M_CKPT`` / ``D3F_FBRS_CKPT``
(or the ``--*_ckpt`` flags, mirroring ``interactive_demo.py:31-34``);
unset ones fall back to random weights (smoke mode — the loop executes
end-to-end but masks are noise).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--images", default=None,
                   help="folder of input frames (copied/resized into the "
                        "workspace)")
    p.add_argument("--video", default=None,
                   help="video file readable by OpenCV (decoded into the "
                        "workspace)")
    p.add_argument("--workspace", default=None,
                   help="directory for buffered images and output masks "
                        "(default: ./workspace/<input basename>)")
    p.add_argument("--script", default=None,
                   help="command script file (default: read stdin)")
    p.add_argument("--num_objects", type=int, default=1)
    p.add_argument("--size", type=int, default=480,
                   help="short-side resize for processing (-1 = native)")
    p.add_argument("--xmem_ckpt", default=None)
    p.add_argument("--s2m_ckpt", default=None)
    p.add_argument("--fbrs_ckpt", default=None)
    p.add_argument("--key_dim", type=int, default=64)
    p.add_argument("--value_dim", type=int, default=512)
    p.add_argument("--hidden_dim", type=int, default=64)
    # the GUI's tunable memory knobs (interactive_demo.py:52-62)
    p.add_argument("--mem_every", type=int, default=10)
    p.add_argument("--top_k", type=int, default=30)
    p.add_argument("--max_mid_term_frames", type=int, default=10)
    p.add_argument("--min_mid_term_frames", type=int, default=5)
    p.add_argument("--num_prototypes", type=int, default=128)
    p.add_argument("--max_long_term_elements", type=int, default=10000)
    return p


# ---------------------------------------------------------------------------
# workspace (resource_manager.py:39-180)
# ---------------------------------------------------------------------------

def _short_side_resize(frame: np.ndarray, size: int) -> np.ndarray:
    import cv2

    if size <= 0:
        return frame
    h, w = frame.shape[:2]
    nw, nh = w * size // min(w, h), h * size // min(w, h)
    if (nw, nh) == (w, h):
        return frame
    return cv2.resize(frame, dsize=(nw, nh), interpolation=cv2.INTER_AREA)


def prepare_workspace(images, video, workspace, size):
    """Populate ``<workspace>/images`` (reused when already present) and
    return (workspace, frame names, image dir, mask dir)."""
    import cv2

    if workspace is None:
        if images is not None:
            base = os.path.basename(os.path.normpath(images))
        elif video is not None:
            base = os.path.splitext(os.path.basename(video))[0]
        else:
            raise SystemExit("need --images, --video, or --workspace")
        workspace = os.path.join("./workspace", base)
    image_dir = os.path.join(workspace, "images")
    mask_dir = os.path.join(workspace, "masks")
    have_images = os.path.isdir(image_dir) and os.listdir(image_dir)
    os.makedirs(image_dir, exist_ok=True)
    os.makedirs(mask_dir, exist_ok=True)

    if not have_images:
        if video is not None:
            cap = cv2.VideoCapture(video)
            t = 0
            while cap.isOpened():
                ok, frame = cap.read()
                if not ok or frame is None:
                    break
                frame = _short_side_resize(frame, size)
                cv2.imwrite(os.path.join(image_dir, f"{t:07d}.jpg"), frame)
                t += 1
            cap.release()
        elif images is not None:
            for name in sorted(os.listdir(images)):
                frame = cv2.imread(os.path.join(images, name))
                if frame is None:
                    continue
                frame = _short_side_resize(frame, size)
                cv2.imwrite(os.path.join(image_dir, name), frame)
        else:
            raise SystemExit(f"workspace {workspace!r} has no images/ and "
                             "no --images/--video to populate it")
    names = sorted(os.path.splitext(n)[0] for n in os.listdir(image_dir))
    if not names:
        raise SystemExit(f"no frames found in {image_dir}")
    return workspace, names, image_dir, mask_dir


# ---------------------------------------------------------------------------
# model loading (interactive_demo.py:64-88; smoke fallback like click_track)
# ---------------------------------------------------------------------------

def _load_models(args, cfg):
    import jax

    from d3fields_tpu.apps.click_track import _resolve_ckpt
    from d3fields_tpu.models.fbrs import model as fmod
    from d3fields_tpu.models.fbrs.predictor import FBRSController
    from d3fields_tpu.models.s2m import S2MController
    from d3fields_tpu.models.s2m import model as smod
    from d3fields_tpu.models.xmem import network as xnet

    def family(path, fam, fcfg):
        from d3fields_tpu.apps._backends import _load_family_params

        return _load_family_params(path, fam, fcfg)

    ck = _resolve_ckpt(args.xmem_ckpt, "D3F_XMEM_CKPT", "XMem")
    if ck:
        xparams, _ = family(ck, "xmem", cfg)
    else:
        print("[interactive] no XMem checkpoint: random weights (smoke)")
        xparams = xnet.init_params(jax.random.PRNGKey(0), cfg)

    ck = _resolve_ckpt(args.s2m_ckpt, "D3F_S2M_CKPT", "S2M")
    if ck:
        sparams, _ = family(ck, "s2m", None)
    else:
        print("[interactive] no S2M checkpoint: random weights (smoke)")
        sparams = smod.init_params(jax.random.PRNGKey(1))
    s2m = S2MController(sparams, num_objects=args.num_objects)

    ck = _resolve_ckpt(args.fbrs_ckpt, "D3F_FBRS_CKPT", "f-BRS")
    if ck:
        fparams, fcfg = family(ck, "fbrs", None)
    else:
        print("[interactive] no f-BRS checkpoint: random weights (smoke)")
        # random weights are noise either way — use the tiny config so
        # smoke runs stay cheap
        fcfg = fmod.FbrsConfig.tiny_test()
        fparams = fmod.init_params(jax.random.PRNGKey(2), fcfg)
    fbrs = FBRSController(fparams, fcfg)
    return xparams, s2m, fbrs


# ---------------------------------------------------------------------------
# command interpreter
# ---------------------------------------------------------------------------

def _parse_points(tokens):
    pts = []
    for tok in tokens:
        x, y = tok.split(",")
        pts.append((float(x), float(y)))
    return pts


def run_command(session, line: str, mask_dir: str, names) -> None:
    from PIL import Image

    toks = line.split()
    cmd = toks[0]
    if cmd == "goto":
        session.goto(int(toks[1]))
    elif cmd == "object":
        session.set_object(int(toks[1]))
    elif cmd == "click":
        positive = True if len(toks) < 4 else toks[3] != "-"
        session.click(float(toks[1]), float(toks[2]), positive)
    elif cmd == "scribble":
        session.scribble(_parse_points(toks[2:]), obj=int(toks[1]))
    elif cmd == "free":
        session.free_draw(_parse_points(toks[2:]), obj=int(toks[1]))
    elif cmd == "undo":
        from d3fields_tpu.interact import ClickInteraction

        if (session.fbrs_controller is not None
                and isinstance(session.interaction, ClickInteraction)):
            mask = session.fbrs_controller.undo()
            if mask is not None:
                session.interaction.obj_mask = mask
                session._finish_gesture()
    elif cmd == "commit":
        session.commit()
    elif cmd == "propagate":
        forward = True if len(toks) < 2 else toks[1] != "backward"
        cap = int(toks[2]) if len(toks) > 2 else None
        written = session.propagate(forward=forward, max_frames=cap)
        print(f"[interactive] propagated {len(written)} frame(s) "
              f"{'forward' if forward else 'backward'} "
              f"from frame {written[0] - (1 if forward else -1)}"
              if written else "[interactive] nothing to propagate")
    elif cmd == "reset_mask":
        session.reset_mask()
    elif cmd == "clear_memory":
        session.clear_memory()
    elif cmd == "import_mask":
        session.import_mask(np.array(Image.open(toks[1])))
    elif cmd == "import_layer":
        session.set_layer(np.array(Image.open(toks[1]).convert("RGBA")))
    elif cmd == "vis_target":
        session.toggle_vis_target(int(toks[1]))
    elif cmd == "vis":
        mode, out_path = toks[1], toks[2]
        Image.fromarray(session.visualize(mode)).save(out_path)
        print(f"[interactive] wrote {mode} overlay to {out_path}")
    elif cmd == "save":
        paths = session.save_masks(
            mask_dir, names=[n + ".png" for n in names])
        print(f"[interactive] saved {len(paths)} mask(s) to {mask_dir}")
    else:
        raise SystemExit(f"unknown command: {line!r}")


def main(argv=None):
    args = build_parser().parse_args(argv)
    from d3fields_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import cv2
    from PIL import Image

    from d3fields_tpu.config import XMemConfig
    from d3fields_tpu.interact import InteractiveSession

    workspace, names, image_dir, mask_dir = prepare_workspace(
        args.images, args.video, args.workspace, args.size)
    print(f"[interactive] workspace: {workspace} ({len(names)} frames)")

    def get_frame(t):
        for ext in (".jpg", ".png", ".jpeg", ".bmp"):
            p = os.path.join(image_dir, names[t] + ext)
            if os.path.exists(p):
                return np.ascontiguousarray(cv2.imread(p)[..., ::-1])
        raise FileNotFoundError(names[t])

    cfg = XMemConfig(
        key_dim=args.key_dim, value_dim=args.value_dim,
        hidden_dim=args.hidden_dim,
        mem_every=args.mem_every, top_k=args.top_k,
        max_mid_term_frames=args.max_mid_term_frames,
        min_mid_term_frames=args.min_mid_term_frames,
        num_prototypes=args.num_prototypes,
        max_long_term_elements=args.max_long_term_elements,
    )
    xparams, s2m, fbrs = _load_models(args, cfg)
    session = InteractiveSession(
        get_frame, num_objects=args.num_objects, xmem_params=xparams,
        xmem_cfg=cfg, s2m_controller=s2m, fbrs_controller=fbrs,
        num_frames=len(names),
    )

    # continue an interrupted run: adopt any masks already in the
    # workspace (resource_manager.py:169-180)
    for t, name in enumerate(names):
        p = os.path.join(mask_dir, name + ".png")
        if os.path.exists(p):
            session.goto(t)
            session.import_mask(np.array(Image.open(p)))
    session.goto(0)

    lines = (open(args.script).read().splitlines()
             if args.script else sys.stdin.read().splitlines())
    for raw in lines:
        line = raw.split("#", 1)[0].strip()
        if line:
            run_command(session, line, mask_dir, names)

    # the GUI saves on every commit/propagation step; headless we flush
    # once at the end too, so a script without 'save' still persists
    session.save_masks(mask_dir, names=[n + ".png" for n in names])
    print(f"[interactive] done — masks in {mask_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
