"""Headless click-to-track: seed objects with SAM point prompts, then
propagate them through the video with XMem.

The capability of the reference's interactive demo
(``XMem/interactive_demo.py`` + ``inference/interact/`` click modules —
fbrs/S2M positive/negative clicks to a mask, then propagation) without the
Qt GUI: clicks come from the command line, masks go to DAVIS-palette PNGs.

  python -m d3fields_tpu.apps.click_track --data_root <videos> \\
      --clicks "120,80;200,150,0|340,200" --out out/click_track

``--clicks``: object groups separated by ``|``; within a group,
``x,y[,label]`` clicks separated by ``;`` (label 1 = foreground, the
default; 0 = background click). Each group seeds one object.

Checkpoints: ``D3F_SAM_CKPT`` / ``D3F_XMEM_CKPT`` (or ``--sam_ckpt`` /
``--xmem_ckpt``); without them the models run at random weights — the
pipeline executes end-to-end but masks are noise (smoke/test mode only).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", default=None,
                   help="video root (generic <video>/frames, DAVIS or "
                        "YouTubeVOS checkout layout)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--clicks", required=False, default=None,
                   help="'x,y[,label];...|x,y...' — '|' separates objects, "
                        "';' separates clicks, label 1=fg (default) 0=bg")
    p.add_argument("--refine", type=int, default=0,
                   help="iterative mask-input refinement rounds per object "
                        "(upstream SAM's mask_input loop)")
    p.add_argument("--frames", type=int, default=8,
                   help="frame cap per video; <=0 = all frames")
    p.add_argument("--size", type=int, default=480,
                   help="XMem processing short side (-1 = native)")
    p.add_argument("--sam_ckpt", default=None)
    p.add_argument("--xmem_ckpt", default=None)
    p.add_argument("--key_dim", type=int, default=64)
    p.add_argument("--value_dim", type=int, default=512)
    p.add_argument("--hidden_dim", type=int, default=64)
    # memory sizing (mid-video entry runs with long-term memory off, so
    # size the bounded working memory to the video — see eval_xmem)
    p.add_argument("--mem_every", type=int, default=5)
    p.add_argument("--top_k", type=int, default=30)
    p.add_argument("--max_mid_term_frames", type=int, default=10)
    p.add_argument("--out", default="out/click_track")
    return p


def parse_clicks(spec: str):
    """'[@T:]x,y[,label];...|...' -> list of (frame T, points (P, 2) f32,
    labels (P,) i32) per object. ``@T:`` seeds that object at frame T
    (default 0) — mid-video entry, like drawing a new object partway
    through an interactive session."""
    if not spec or not spec.strip():
        raise ValueError("no click groups given")
    groups = []
    for raw in spec.split("|"):
        grp, at = raw, 0
        if grp.startswith("@"):
            head, sep, grp = grp.partition(":")
            if not sep or not grp:
                raise ValueError(f"bad group {raw!r}: want '@T:clicks'")
            at = int(head[1:])
        pts, lbls = [], []
        for c in grp.split(";"):
            parts = [float(v) for v in c.split(",")] if c.strip() else []
            if len(parts) not in (2, 3):
                raise ValueError(f"bad click {c!r}: want x,y or x,y,label")
            lab = int(parts[2]) if len(parts) == 3 else 1
            if lab not in (0, 1):
                raise ValueError(
                    f"bad click label {lab} in {c!r}: 1 = foreground, "
                    "0 = background"
                )
            pts.append(parts[:2])
            lbls.append(lab)
        groups.append((at, np.asarray(pts, np.float32),
                       np.asarray(lbls, np.int32)))
    return groups


def _resolve_ckpt(explicit, env_var, what):
    """A configured-but-missing checkpoint path fails loudly (a typo must
    not silently produce random-weight noise); only a fully unset one
    falls back to smoke mode (returns None)."""
    ckpt = explicit or os.environ.get(env_var)
    if ckpt and not os.path.exists(ckpt):
        raise FileNotFoundError(f"{what} checkpoint not found: {ckpt}")
    return ckpt


def _sam_predictor(args):
    from d3fields_tpu.models.sam.model import SamConfig, random_params
    from d3fields_tpu.models.sam.predictor import SamPredictor

    ckpt = _resolve_ckpt(args.sam_ckpt, "D3F_SAM_CKPT", "SAM")
    if ckpt:
        from d3fields_tpu.apps._backends import _load_family_params

        params, cfg = _load_family_params(ckpt, "sam", None)
    else:
        print("[click_track] no SAM checkpoint: random weights (smoke mode)")
        cfg = SamConfig.tiny_test()
        params = random_params(cfg)
    return SamPredictor(params, cfg)


def _xmem(args, cfg):
    import jax

    from d3fields_tpu.models.xmem import network as N

    ckpt = _resolve_ckpt(args.xmem_ckpt, "D3F_XMEM_CKPT", "XMem")
    if ckpt:
        from d3fields_tpu.apps._backends import _load_family_params

        params, _ = _load_family_params(ckpt, "xmem", cfg)
        return params
    print("[click_track] no XMem checkpoint: random weights (smoke mode)")
    return N.init_params(jax.random.PRNGKey(1), cfg)


def seed_mask_from_clicks(predictor, rgb: np.ndarray, groups,
                          refine: int = 0) -> np.ndarray:
    """Run each click group (object_id, points, labels) through SAM
    (best-IoU channel of the multimask output, like upstream's
    select-best default); later objects overwrite earlier ones where
    masks overlap. ``refine`` extra rounds feed the winning low-res
    logits back as the mask prompt."""
    H, W = rgb.shape[:2]
    predictor.set_image(rgb)
    mask = np.zeros((H, W), np.uint8)
    for obj_id, pts, lbls in groups:
        m, iou, low = predictor.predict_points(pts[None], lbls[None])
        best = int(np.argmax(iou[0]))
        for _ in range(refine):
            m, iou, low = predictor.predict_points(
                pts[None], lbls[None], mask_input=low[:, best])
            best = int(np.argmax(iou[0]))
        mask[m[0, best]] = obj_id
    return mask


def main(argv=None):
    args = build_parser().parse_args(argv)
    from d3fields_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from d3fields_tpu.config import XMemConfig
    from d3fields_tpu.seg.video_tracker import VideoMaskTracker
    from d3fields_tpu.utils.profiling import Throughput
    from d3fields_tpu.utils.visualization import save_index_mask_png

    os.makedirs(args.out, exist_ok=True)
    if args.synthetic:
        from d3fields_tpu.utils.synthetic import render_sphere_scene

        # synthetic videos have no natural end: <=0 picks a default run
        n_frames = 8 if args.frames <= 0 else max(args.frames, 2)

        def get_rgb(t):
            offs = np.array([[0.008 * t, 0.004 * t, 0.0],
                             [-0.005 * t, 0.006 * t, 0.0]])
            sc = render_sphere_scene(num_views=1, H=120, W=160, feat_dim=4,
                                     sphere_offsets=offs)
            return sc["color"][0]

        videos = [("synthetic_0", get_rgb, n_frames)]
    else:
        import cv2

        from d3fields_tpu.models.xmem.data import (
            IMAGE_EXTS, resolve_video_dirs,
        )

        if args.data_root is None:
            raise SystemExit("need --data_root or --synthetic")
        videos = []
        for vid, fdir, _mdir in resolve_video_dirs(args.data_root):
            names = sorted(n for n in os.listdir(fdir)
                           if n.lower().endswith(IMAGE_EXTS))
            n = len(names) if args.frames <= 0 else min(len(names),
                                                        args.frames)

            def get_rgb(t, names=names, fdir=fdir):
                return cv2.imread(os.path.join(fdir, names[t]))[..., ::-1]

            videos.append((vid, get_rgb, n))

    if args.clicks is None:
        raise SystemExit("need --clicks 'x,y[,label];...|...'")
    groups = parse_clicks(args.clicks)
    predictor = _sam_predictor(args)
    xcfg = XMemConfig(key_dim=args.key_dim, value_dim=args.value_dim,
                      hidden_dim=args.hidden_dim, mem_every=args.mem_every,
                      top_k=args.top_k,
                      max_mid_term_frames=args.max_mid_term_frames)
    xparams = _xmem(args, xcfg)

    # group clicks by seed frame; object ids follow the group order
    by_frame = {}
    for i, (at, pts, lbls) in enumerate(groups):
        by_frame.setdefault(at, []).append((i + 1, pts, lbls))
    start = min(by_frame)
    multi_group = len(by_frame) > 1
    if multi_group and xcfg.enable_long_term:
        import dataclasses

        # mid-video entry needs the bounded working memory (see
        # eval_xmem / models/xmem/memory.py)
        xcfg = dataclasses.replace(xcfg, enable_long_term=False)
        print("[click_track] objects enter mid-video -> long-term memory "
              "disabled")

    tp = Throughput()
    for vid, get_rgb, n_frames in videos:
        late = [t for t in by_frame if t >= n_frames]
        if late:
            raise SystemExit(
                f"seed frame(s) {sorted(late)} are past the end of "
                f"{vid!r} ({n_frames} frames; --frames caps it) — those "
                "objects would silently never enter"
            )
        rgb0 = np.ascontiguousarray(get_rgb(start))
        mask0 = seed_mask_from_clicks(predictor, rgb0, by_frame[start],
                                      refine=args.refine)
        vdir = os.path.join(args.out, vid)
        os.makedirs(vdir, exist_ok=True)
        save_index_mask_png(os.path.join(vdir, f"{start:05d}.png"), mask0)
        tracker = VideoMaskTracker(
            xparams, xcfg, num_views=1, num_objects=len(groups),
            image_hw=rgb0.shape[:2], size=args.size,
            multi_group=multi_group,
        )
        tracker.process(rgb0[None], mask0[None], return_index=True)
        # background-decode upcoming frames (serving.host_prefetch) so
        # disk reads overlap the tracker's device compute
        from d3fields_tpu.serving import host_prefetch

        frame_stream = host_prefetch(
            ((t, np.ascontiguousarray(get_rgb(t)))
             for t in range(start + 1, n_frames)), size=2)
        for t, rgb in frame_stream:
            if t in by_frame:
                # new objects enter: SAM-decode their clicks on this
                # frame (outside the tracking-FPS clock), feed the
                # entering mask to the tracker
                mt = seed_mask_from_clicks(predictor, rgb, by_frame[t],
                                           refine=args.refine)
                tp.start()
                idx = tracker.process(rgb[None], mt[None],
                                      return_index=True)
            else:
                tp.start()
                idx = tracker.process(rgb[None], return_index=True)
            tp.stop(units=1, result_tree=None)
            save_index_mask_png(os.path.join(vdir, f"{t:05d}.png"), idx[0])
        print(f"[click_track] {vid}: seeded {len(groups)} object(s) from "
              f"clicks, propagated {n_frames - start - 1} frames")
    print(f"[click_track] FPS: {tp.per_second:.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
