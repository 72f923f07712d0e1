"""XMem video-segmentation evaluation harness (reference ``XMem/eval.py``).

Runs mask propagation over video directories, writes predicted index masks
as PNGs, and reports FPS (``total_frames / total_process_time``,
``XMem/eval.py:248-250``). Works on any of

  <root>/<video>/frames/*.png          RGB frames
  <root>/<video>/masks/<first>.png     index mask of the first frame

  <root>/JPEGImages/480p/<video>/*.jpg     DAVIS checkout (reference
  <root>/Annotations/480p/<video>/*.png    ``XMem/eval.py`` d16/d17 paths)

  <root>/JPEGImages/<video>/*.jpg          YouTubeVOS-style checkout
  <root>/Annotations/<video>/*.png         (``XMem/eval.py`` y18/y19)

or on synthetic drifting-sphere videos with ``--synthetic`` (reporting IoU
against the analytic ground truth as the J-score stand-in).

Seeding follows the reference protocol (``XMem/eval.py`` feeds ``msk``
whenever the dataset supplies one): every annotation frame that introduces
an unseen object id seeds the tracker — frame 0 for DAVIS, each object's
first appearance for YouTubeVOS (mid-video entry via the multi-group
memory). Densely-annotated layouts seed once and score the rest.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--frames", type=int, default=8,
                   help="frame cap per video; <=0 = all frames (directory "
                        "sources; synthetic always uses the cap)")
    p.add_argument("--size", type=int, default=480)
    p.add_argument("--ckpt", default=None,
                   help="trainer checkpoint or torch XMem state dict")
    p.add_argument("--key_dim", type=int, default=64)
    p.add_argument("--value_dim", type=int, default=512)
    p.add_argument("--hidden_dim", type=int, default=64)
    p.add_argument("--out", default="out/eval_xmem")
    p.add_argument("--flip", action="store_true",
                   help="test-time augmentation: propagate the horizontally "
                        "flipped video, un-flip predictions (XMem/eval.py "
                        "--flip)")
    p.add_argument("--disable_long_term", action="store_true",
                   help="bounded working memory, no long-term consolidation "
                        "(XMem/eval.py --disable_long_term); size "
                        "--max_mid_term_frames to the video for exact "
                        "reference semantics")
    p.add_argument("--split", default=None,
                   help="ImageSets split to evaluate (e.g. val on a DAVIS "
                        "trainval checkout, XMem/eval.py --split); default: "
                        "every video under --data_root")
    # the reference's memory-tuning knobs (XMem/eval.py:52-60)
    p.add_argument("--max_mid_term_frames", type=int, default=10,
                   help="T_max in the paper")
    p.add_argument("--min_mid_term_frames", type=int, default=5,
                   help="T_min in the paper")
    p.add_argument("--max_long_term_elements", type=int, default=10000,
                   help="LT_max in the paper")
    p.add_argument("--num_prototypes", type=int, default=128,
                   help="P in the paper")
    p.add_argument("--top_k", type=int, default=30)
    p.add_argument("--mem_every", type=int, default=5,
                   help="r in the paper; increase to improve speed")
    p.add_argument("--deep_update_every", type=int, default=-1,
                   help="-1 synchronizes with mem_every")
    p.add_argument("--save_scores", action="store_true",
                   help="also save per-object probability maps as .npy for "
                        "multi-scale/flip merging (XMem/eval.py "
                        "--save_scores; merge with apps.merge_scores)")
    p.add_argument("--video_batch", type=int, default=1,
                   help="evaluate up to N same-shape, same-object-count "
                        "videos in lockstep on the tracker's vmapped view "
                        "axis (one batched dispatch per frame instead of N "
                        "sequential ones — the reference eval is strictly "
                        "per-video). Outputs match per-video runs "
                        "(bit-identical on CPU; on TPU, compiler tilings "
                        "may differ across batch widths, so boundary "
                        "pixels can flip within float tolerance); "
                        "multi-group videos fall back to the per-video "
                        "path")
    return p


def _load_params(args, cfg):
    import jax

    from d3fields_tpu.models.xmem import network as N

    if args.ckpt:
        if args.ckpt.endswith(".npz"):
            # converted pytree from tools/convert_ckpts.py (no torch needed)
            from d3fields_tpu.utils.convert import load_params

            params, _meta = load_params(args.ckpt)
            return params
        try:  # trainer checkpoint (plain pickle with a "params" tree)
            import pickle

            with open(args.ckpt, "rb") as f:
                blob = pickle.load(f)
        except Exception:
            blob = None
        if isinstance(blob, dict) and "params" in blob:
            return jax.tree.map(np.asarray, blob["params"])
        if not isinstance(blob, dict):
            # real torch XMem .pth (zip-format torch.save): torch.load it
            from d3fields_tpu.apps._backends import _load_torch_sd

            blob = _load_torch_sd(args.ckpt)
        return N.convert_torch_state_dict(blob, cfg)
    return N.init_params(jax.random.PRNGKey(0), cfg)


def make_config(args):
    """CLI memory knobs -> XMemConfig (reference XMem/eval.py:51-60)."""
    from d3fields_tpu.config import XMemConfig

    return XMemConfig(key_dim=args.key_dim, value_dim=args.value_dim,
                      hidden_dim=args.hidden_dim,
                      enable_long_term=not args.disable_long_term,
                      max_mid_term_frames=args.max_mid_term_frames,
                      min_mid_term_frames=args.min_mid_term_frames,
                      max_long_term_elements=args.max_long_term_elements,
                      num_prototypes=args.num_prototypes,
                      top_k=args.top_k, mem_every=args.mem_every,
                      deep_update_every=args.deep_update_every)


def main(argv=None):
    args = build_parser().parse_args(argv)
    from d3fields_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import time

    from d3fields_tpu.seg.video_tracker import VideoMaskTracker
    from d3fields_tpu.serving import host_prefetch
    from d3fields_tpu.utils.profiling import Throughput

    cfg = make_config(args)
    params = _load_params(args, cfg)
    os.makedirs(args.out, exist_ok=True)

    if args.synthetic:
        from d3fields_tpu.utils.synthetic import render_sphere_scene

        def videos():
            cache = {}

            def render(t):
                # memoized per frame index: the seed scan and the
                # propagation loop both visit each t (tiny frames, so
                # keeping all of them is cheaper than re-rendering)
                if t not in cache:
                    offs = np.array([[0.008 * t, 0.004 * t, 0.0],
                                     [-0.005 * t, 0.006 * t, 0.0]])
                    sc = render_sphere_scene(num_views=1, H=120, W=160,
                                             feat_dim=4, sphere_offsets=offs)
                    m = np.zeros((120, 160), np.uint8)
                    for si in range(sc["sphere_masks"].shape[1]):
                        m[sc["sphere_masks"][0, si]] = si + 1
                    cache[t] = (sc["color"][0], m)
                return cache[t]

            yield ("synthetic_0", lambda t: render(t)[0],
                   lambda t: render(t)[1], max(args.frames, 2))
    else:
        import cv2

        from d3fields_tpu.models.xmem.data import (
            IMAGE_EXTS, load_index_mask, resolve_video_dirs,
        )

        def videos():
            for vid, fdir, mdir in resolve_video_dirs(args.data_root,
                                                      subset=args.split):
                names = sorted(
                    n for n in os.listdir(fdir)
                    if n.lower().endswith(IMAGE_EXTS))

                def get_rgb(t, names=names, fdir=fdir):
                    return cv2.imread(os.path.join(fdir, names[t]))[..., ::-1]

                def get_mask(t, names=names, mdir=mdir):
                    mpath = os.path.join(
                        mdir, os.path.splitext(names[t])[0] + ".png"
                    )
                    return (load_index_mask(mpath)
                            if os.path.exists(mpath) else None)
                # the whole video, like the reference XMem/eval.py (--frames
                # caps it for smoke runs)
                n = len(names) if args.frames <= 0 else min(len(names), args.frames)
                yield vid, get_rgb, get_mask, n

    from d3fields_tpu.utils.metrics import davis_jf
    from d3fields_tpu.utils.visualization import save_index_mask_png

    tp = Throughput()
    ious = []
    jfs = []
    per_video = {}

    def scan_video(vid, get_rgb, get_mask, n_frames):
        """Seed/gt scan. Seed frames = annotations that INTRODUCE unseen
        object ids (the YouTubeVOS first-appearance protocol the reference
        eval follows: XMem/eval.py feeds `msk` whenever the dataset
        supplies one, and YTVOS supplies each object's mask at its first
        appearance only). Densely-annotated layouts (DAVIS train, generic
        frames/masks) thus seed on frame 0 alone; the rest is ground
        truth for scoring."""
        seeds, seen, gt_frames = {}, set(), set()
        for t in range(n_frames):
            m = get_mask(t)
            if m is None:
                continue
            gt_frames.add(t)
            new_ids = set(np.unique(m).tolist()) - {0} - seen
            if new_ids:
                seeds[t] = m
                seen |= new_ids
        if not seeds:
            print(f"[eval_xmem] {vid}: no annotated objects, skipped")
            return None
        return {
            # gt masks are re-decoded lazily at scoring time (get_gt):
            # records for the WHOLE dataset are alive at once, so caching
            # every decoded mask here would hold the full annotation set
            # in RAM; only the (few) seed frames stay decoded
            "vid": vid, "get_rgb": get_rgb, "get_gt": get_mask,
            "n": n_frames, "seeds": seeds, "gt_frames": gt_frames,
            "start": min(seeds), "num_obj": max(seen),
            "multi_group": len(seeds) > 1,
        }

    def emit_frame(rec, vdir, t, pred, prob, vid_jfs):
        """Per-frame host output: paletted PNG with the DAVIS palette
        (what the reference eval writes for davis2017-evaluation; indices
        survive round-trip), optional soft scores, and J&F scoring."""
        if args.flip:
            pred = pred[:, ::-1]
        pred = np.ascontiguousarray(pred)  # (H, W) uint8
        save_index_mask_png(os.path.join(vdir, f"{t:05d}.png"), pred)
        if args.save_scores:
            # SOFT per-object probabilities (reference --save_scores
            # semantics), not the argmaxed one-hot — merging runs
            # averages real confidences
            p = prob.transpose(1, 2, 0)
            if args.flip:
                p = p[:, ::-1]
            np.save(os.path.join(vdir, f"{t:05d}.npy"), p.astype(np.float16))
        # Seed frames are excluded from scoring: a first-appearance
        # annotation was fed to the tracker (trivially right for the
        # entering object) and leaves already-tracked objects as
        # background (falsely zeroing their J/F). On sparse
        # first-appearance datasets (multi_group) remaining annotations
        # are partial too — score only the ids they contain; densely
        # annotated gt (DAVIS) scores every object, absent = empty.
        gt = rec["get_gt"](t) if t in rec["gt_frames"] else None
        if t not in rec["seeds"] and gt is not None and gt.max() > 0:
            inter = ((pred > 0) & (gt > 0)).sum()
            union = ((pred > 0) | (gt > 0)).sum()
            ious.append(inter / max(union, 1))
            gt_ids = None
            if rec["multi_group"]:
                gt_ids = np.unique(gt)
                gt_ids = gt_ids[gt_ids > 0].tolist()
            m = davis_jf(pred, gt, rec["num_obj"], objects=gt_ids)
            jfs.append(m)
            vid_jfs.append(m)

    def finish_video(rec, vid_jfs):
        print(f"[eval_xmem] {rec['vid']}: {rec['n'] - rec['start'] - 1} "
              "frames propagated"
              + (f" ({len(rec['seeds'])} annotation frames)"
                 if rec["multi_group"] else ""))
        if vid_jfs:
            # per-sequence breakdown, like davis2017-evaluation's CSV
            row = {
                "J": float(np.mean([m["J"] for m in vid_jfs])),
                "F": float(np.mean([m["F"] for m in vid_jfs])),
                "frames_scored": len(vid_jfs),
            }
            row["JF"] = (row["J"] + row["F"]) / 2
            per_video[rec["vid"]] = row

    def flip_rgb(rgb):
        return np.ascontiguousarray(rgb[:, ::-1]) if args.flip else rgb

    def run_single(rec):
        # mid-video entry composes with long-term memory here (per-object
        # prototype visibility, models/xmem/memory.py) — the reference has
        # to disable long-term for such videos (its multi-group eviction
        # raises, kv_memory_store.py:146-151); no downgrade needed
        vcfg = cfg
        vid_jfs = []
        seeds, start = rec["seeds"], rec["start"]
        rgb0, m0 = flip_rgb(rec["get_rgb"](start)), seeds[start]
        if args.flip:
            m0 = m0[:, ::-1]
        tracker = VideoMaskTracker(
            params, vcfg, num_views=1, num_objects=rec["num_obj"],
            image_hw=rgb0.shape[:2], size=args.size,
            multi_group=rec["multi_group"],
        )
        vdir = os.path.join(args.out, rec["vid"])
        os.makedirs(vdir, exist_ok=True)
        tracker.process(np.ascontiguousarray(rgb0[None]),
                        np.ascontiguousarray(m0[None]), return_index=True)
        # decode upcoming frames in a background thread (2 ahead) so PNG
        # reads overlap the tracker's device compute + mask writing
        frame_stream = host_prefetch(
            ((t, flip_rgb(rec["get_rgb"](t)))
             for t in range(start + 1, rec["n"])), size=2)
        for t, rgb in frame_stream:
            tp.start()
            if t in seeds:
                m = seeds[t][:, ::-1] if args.flip else seeds[t]
                idx = tracker.process(rgb[None],
                                      np.ascontiguousarray(m[None]),
                                      return_index=True)
            else:
                idx = tracker.process(rgb[None], return_index=True)
            tp.stop(units=1, result_tree=None)
            prob = (np.asarray(tracker.last_prob)[0]
                    if args.save_scores else None)
            emit_frame(rec, vdir, t, idx[0], prob, vid_jfs)
        finish_video(rec, vid_jfs)

    def run_batch(recs, pad_to=None):
        """Cross-video batching: videos of one (H, W, num_obj) group ride
        the tracker's vmapped view axis (models/xmem/core.py — per-view
        memories are independent stacked pytrees), so B ResNet encodes and
        memory reads fuse into one dispatch. The reference eval is
        strictly per-video (XMem/eval.py); lockstep propagation with
        last-frame clamping for shorter videos is output-identical to
        running each video alone (clamped steps only touch that video's
        own memory, which is never read again)."""
        real = len(recs)
        if pad_to and real < pad_to:
            # pad the ragged final chunk with n=1 copies of the first
            # video (never "live", outputs suppressed) so every chunk of
            # a shape group jits ONE static view count instead of
            # compiling a fresh executable for the remainder (30-120 s
            # per shape through the remote compile service)
            recs = recs + [{**recs[0], "n": 1}] * (pad_to - real)
        B = len(recs)
        max_n = max(r["n"] for r in recs)
        rgb0 = np.stack([flip_rgb(r["get_rgb"](0)) for r in recs])
        m0 = np.stack([r["seeds"][0] for r in recs])
        if args.flip:
            m0 = m0[:, :, ::-1]
        tracker = VideoMaskTracker(
            params, cfg, num_views=B, num_objects=recs[0]["num_obj"],
            image_hw=rgb0.shape[1:3], size=args.size,
        )
        vdirs = []
        for r in recs:
            vdir = os.path.join(args.out, r["vid"])
            os.makedirs(vdir, exist_ok=True)
            vdirs.append(vdir)
        tracker.process(np.ascontiguousarray(rgb0),
                        np.ascontiguousarray(m0), return_index=True)
        vid_jfs = [[] for _ in recs]

        def stacked_frames():
            for t in range(1, max_n):
                yield t, np.stack([
                    flip_rgb(r["get_rgb"](min(t, r["n"] - 1))) for r in recs
                ])

        for t, rgb in host_prefetch(stacked_frames(), size=2):
            live = [i for i, r in enumerate(recs) if t < r["n"]]
            tp.start()
            idx = tracker.process(rgb, return_index=True)
            tp.stop(units=len(live), result_tree=None)
            prob = (np.asarray(tracker.last_prob)
                    if args.save_scores else None)
            for i in live:
                emit_frame(recs[i], vdirs[i], t, idx[i],
                           prob[i] if prob is not None else None, vid_jfs[i])
        for r, jfl in zip(recs[:real], vid_jfs[:real]):
            finish_video(r, jfl)

    records = [r for v in videos() if (r := scan_video(*v)) is not None]
    # Batchable: single-group videos seeded at frame 0 (DAVIS-style).
    # Multi-group (YTVOS first-appearance) videos keep the per-video path
    # (their schedules/configs diverge per video).
    if args.video_batch > 1:
        batchable = [r for r in records
                     if not r["multi_group"] and r["start"] == 0]
        singles = [r for r in records if r["multi_group"] or r["start"] != 0]
        groups = {}
        for r in batchable:
            h, w = r["get_rgb"](0).shape[:2]
            groups.setdefault((h, w, r["num_obj"]), []).append(r)
        for key, recs in sorted(groups.items(), key=lambda kv: kv[0]):
            recs.sort(key=lambda r: r["n"])  # minimize clamped tail steps
            for i in range(0, len(recs), args.video_batch):
                chunk = recs[i : i + args.video_batch]
                print(f"[eval_xmem] batching {len(chunk)} videos "
                      f"(hw={key[0]}x{key[1]}, {key[2]} objects): "
                      + ", ".join(r["vid"] for r in chunk))
                # pad only when the group has already compiled the full
                # batch width (a group smaller than --video_batch jits
                # its own width once either way)
                run_batch(chunk, pad_to=args.video_batch if i > 0 else None)
        for rec in singles:
            run_single(rec)
    else:
        for rec in records:
            run_single(rec)
    if per_video:
        import json

        # global J/F follow the davis2017-evaluation convention: mean of
        # per-SEQUENCE means (not frame-weighted — a long video must not
        # dominate), so `global` equals the mean of the per_video rows.
        # frame-weighted means are kept under distinct names. Namespaced
        # so a sequence directory named "global" cannot collide.
        blob = {
            "per_video": per_video,
            "global": {
                "J": float(np.mean([v["J"] for v in per_video.values()])),
                "F": float(np.mean([v["F"] for v in per_video.values()])),
                "J_frame_mean": float(np.mean([m["J"] for m in jfs])),
                "F_frame_mean": float(np.mean([m["F"] for m in jfs])),
                "fg_iou_frame_mean": (float(np.mean(ious)) if ious
                                      else None),
                "fps": tp.per_second,
            },
        }
        g = blob["global"]
        g["JF"] = (g["J"] + g["F"]) / 2
        with open(os.path.join(args.out, "metrics.json"), "w") as f:
            json.dump(blob, f, indent=1)
    line = f"[eval_xmem] FPS: {tp.per_second:.2f}"
    if ious:
        line += f", fg-IoU vs GT: {np.mean(ious):.3f}"
    if jfs:
        J = np.mean([m["J"] for m in jfs])
        F = np.mean([m["F"] for m in jfs])
        line += f", J: {J:.3f}, F: {F:.3f}, J&F: {(J + F) / 2:.3f}"
    print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
