"""Video keypoint tracking demo (reference ``vis_tracking.py``).

Per frame: Fusion.update + tracked text queries (GroundedSAM on frame 0,
XMem propagation after); at t=0 keypoints are farthest-point-sampled per
instance and their descriptors recorded; each later frame solves a rigid
SE(3) fit through the differentiable field and writes a reprojection-mosaic
video + per-frame match-point pickles.

  python -m d3fields_tpu.apps.vis_tracking --synthetic --frames 6 --out out/track
  python -m d3fields_tpu.apps.vis_tracking --data_path data/... \\
      --query_texts shoe --query_thresholds 0.5
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from d3fields_tpu.config import Boundaries, TrackingConfig


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_path", default=None)
    p.add_argument("--query_texts", nargs="+", default=["shoe"])
    p.add_argument("--query_thresholds", nargs="+", type=float, default=[0.5])
    p.add_argument("--num_cam", type=int, default=4)
    p.add_argument("--frames", type=int, default=0, help="0 = all")
    p.add_argument("--num_kypts", type=int, default=100)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--out", default="out/vis_tracking")
    # reference vis_tracking.py:21-40 defaults (tabletop scenes, objects at
    # z < 0.02); --synthetic overrides with the sphere scene's workspace
    p.add_argument("--x_lower", type=float, default=-0.4)
    p.add_argument("--x_upper", type=float, default=0.4)
    p.add_argument("--y_lower", type=float, default=-0.4)
    p.add_argument("--y_upper", type=float, default=0.3)
    p.add_argument("--z_lower", type=float, default=-0.3)
    p.add_argument("--z_upper", type=float, default=0.02)
    p.add_argument("--kypts_z_lower", type=float, default=-0.2)
    p.add_argument("--kypts_z_upper", type=float, default=-0.02)
    p.add_argument("--pipeline_depth", type=int, default=0,
                   help="frames of host-visible lag: device work for frame "
                        "t+1 dispatches before frame t's video/pickle "
                        "writes (serving.AsyncFrameLoop). 0 = the "
                        "reference's synchronous loop; outputs are "
                        "identical either way")
    p.add_argument("--segment", type=int, default=0,
                   help="with --fused: batch N frames per dispatch "
                        "(FusedFrameStep.step_segment — the whole clip "
                        "chunk scans inside ONE executable, one dispatch "
                        "+ one deferred fetch per chunk; short tails run "
                        "per-frame). 0/1 = per-frame fused steps")
    p.add_argument("--fused", action="store_true",
                   help="after the first (seed) frame, run each frame as "
                        "ONE dispatched executable (serving.FusedFrameStep"
                        ": DINOv2 + XMem propagation + field + tracking) "
                        "instead of the staged Fusion calls — same math, "
                        "one deployable artifact, all pre/post on device "
                        "(~60 ms/frame with --pipeline_depth 2 on one "
                        "v5e, bench_all.log). Requires the XMem video "
                        "tracker (D3F_XMEM_CKPT on the real-data path)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from d3fields_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    from d3fields_tpu.fields.fusion import Fusion
    from d3fields_tpu.serving import AsyncFrameLoop
    from d3fields_tpu.track.keypoints import select_keypoints
    from d3fields_tpu.track.rigid import (
        boundary_vectors, rigid_tracking_jit, stack_keypoints,
    )
    from d3fields_tpu.utils.io import save_pickle
    from d3fields_tpu.utils.visualization import TrackVis, jet_colors

    boundaries = Boundaries(
        args.x_lower, args.x_upper, args.y_lower, args.y_upper,
        args.z_lower, args.z_upper,
    )
    # separate keypoint-selection bounds (reference kypts_boundaries,
    # vis_tracking.py:35-40)
    kypts_boundaries = Boundaries(
        args.x_lower, args.x_upper, args.y_lower, args.y_upper,
        args.kypts_z_lower, args.kypts_z_upper,
    )
    os.makedirs(args.out, exist_ok=True)

    if args.synthetic:
        from d3fields_tpu.utils.synthetic import (
            render_sphere_scene, sphere_mask_backend,
        )

        frames = args.frames or 6
        # spheres drift linearly: a rigid motion the tracker must recover
        def get_frame(t):
            offs = np.array([[0.008 * t, 0.004 * t, 0.0],
                             [-0.005 * t, 0.006 * t, 0.0]])
            return render_sphere_scene(
                num_views=args.num_cam, H=120, W=160, feat_dim=32,
                sphere_offsets=offs,
            )

        boundaries = Boundaries(-0.3, 0.6, -0.4, 0.4, 0.001, 0.4)
        kypts_boundaries = boundaries
        scene0 = get_frame(0)
        labels = (args.query_texts * 2 if len(args.query_texts) == 1
                  else args.query_texts)
        backend = sphere_mask_backend(scene0, labels)
        fusion = Fusion(num_cam=args.num_cam, mask_backend=backend)

        def refresh_masks(sc):
            # serve the current frame's analytic masks (per-frame
            # re-detection fallback of text_queries_for_inst_mask)
            backend.per_view = sphere_mask_backend(sc, labels).per_view
            backend.reset()

        feature_of = lambda sc: sc["dino_feats"]
    else:
        from d3fields_tpu.apps._backends import (
            build_real_backends, build_video_tracker_factory,
        )
        from d3fields_tpu.utils.io import load_frame, num_frames

        frames = args.frames or num_frames(args.data_path)
        feature_backend, mask_backend = build_real_backends()
        # XMem propagation when D3F_XMEM_CKPT is set (reference behavior);
        # otherwise per-frame re-detection with overlap relabeling
        fusion = Fusion(num_cam=args.num_cam, feature_backend=feature_backend,
                        mask_backend=mask_backend,
                        video_tracker_factory=build_video_tracker_factory())
        get_frame = lambda t: load_frame(args.data_path, t, args.num_cam)
        feature_of = lambda obs: None
        refresh_masks = lambda obs: None

    if args.fused and args.synthetic:
        raise SystemExit(
            "--fused requires the XMem video tracker (real-data path with "
            "D3F_XMEM_CKPT); the synthetic demo serves analytic per-frame "
            "masks with no tracker to fuse"
        )
    if args.segment > 1 and not args.fused:
        raise SystemExit(
            "--segment batches frames through FusedFrameStep.step_segment "
            "and does nothing on the staged path — add --fused"
        )

    tracker = None
    track_info = {}
    cfg = TrackingConfig(iters=args.iters)
    src_feats_dev = lo = hi = last_match = None
    fused = None

    def consume(frame_ctx, out):
        # host side of the pipeline: video frame + per-frame pickles
        # (reference vis_tracking.py:136-138); runs `pipeline_depth`
        # frames behind device dispatch
        t, color, t0 = frame_ctx
        match_pts = out["match_pts"]
        pts_list = [match_pts[i] for i in range(match_pts.shape[0])]
        tracker.visualize_match_pts(pts_list, color, track_info)
        save_pickle(os.path.join(args.out, f"match_pts_{t:06d}.pkl"),
                    pts_list)
        # per-iteration (feat, dist, reg, oob) losses: the directly
        # numerics-sensitive record of the whole differentiable pipeline
        # (Adam's argmin is scale-invariant, so match_pts alone cannot
        # catch small loss-level regressions — the golden tier pins this)
        save_pickle(os.path.join(args.out, f"loss_hist_{t:06d}.pkl"),
                    out["loss_history"])
        print(f"[vis_tracking] frame {t}: {time.perf_counter() - t0:.2f}s "
              f"submit-to-consume, {sum(p.shape[0] for p in pts_list)} pts")

    loop = AsyncFrameLoop(consume, depth=args.pipeline_depth)
    seg_buf = []

    def _flush_segment():
        # a full-size chunk scans inside ONE executable; a short tail
        # would compile a second executable, so the caller routes tails
        # through per-frame fused steps instead
        nonlocal last_match
        if not seg_buf:
            return
        clip = np.stack([np.asarray(o["color"]) for _, o, _ in seg_buf])
        depths = np.stack([np.asarray(o["depth"]) for _, o, _ in seg_buf])
        outs = fused.step_segment(clip, src_feats_dev, last_match,
                                  depths=depths)
        last_match = outs["match_pts"][-1]
        for i, (ti, o, ti0) in enumerate(seg_buf):
            loop.submit((ti, o["color"], ti0),
                        {"match_pts": outs["match_pts"][i],
                         "loss_history": outs["loss_history"][i]})
        seg_buf.clear()

    for t in range(frames):
        t0 = time.perf_counter()
        scene = get_frame(t)
        obs = {k: scene[k] for k in ("color", "depth", "pose", "K")}
        if fused is not None:
            if args.segment > 1:
                seg_buf.append((t, obs, t0))
                if len(seg_buf) == args.segment:
                    _flush_segment()
                continue
            # single-dispatch frame: DINOv2 + XMem propagation + field +
            # tracking as ONE executable (serving.FusedFrameStep); no
            # host sync — the AsyncFrameLoop consumer does the only fetch
            out = fused.step(np.asarray(obs["color"]), src_feats_dev,
                             last_match, depth=obs["depth"])
            last_match = out["match_pts"]
            loop.submit((t, obs["color"], t0),
                        {"match_pts": last_match,
                         "loss_history": out["loss_history"]})
            continue
        feats = feature_of(scene)
        if feats is not None:
            obs["dino_feats"] = feats
        refresh_masks(scene)
        fusion.update(obs)
        fusion.text_queries_for_inst_mask(
            args.query_texts, args.query_thresholds, boundaries=boundaries
        )

        if t == 0:
            src_feats, src_pts, inst_ids = select_keypoints(
                fusion.state, fusion.consensus_mask_label, kypts_boundaries,
                args.num_kypts, res=0.002, init_idx=0,
            )
            for k, (f, p, i) in enumerate(zip(src_feats, src_pts, inst_ids)):
                colors = (jet_colors(np.linspace(0, 1, p.shape[0])) * 255
                          ).astype(np.uint8)
                track_info[f"inst_{i}"] = {
                    "src_feats": f, "src_pts": p, "src_pts_color": colors,
                }
            save_pickle(os.path.join(args.out, "src_feats.pkl"), track_info)
            tracker = TrackVis(obs["pose"], obs["K"], args.out)
            # device-side tracking chain state (stays on device across
            # frames so the per-frame loop never host-syncs; the only
            # fetch is the AsyncFrameLoop consumer's)
            src_feats_dev, last_match = stack_keypoints(src_feats, src_pts)
            lo, hi = boundary_vectors(boundaries)

        # the reference optimizes at EVERY frame including t=0 (refining the
        # FPS samples onto the field surface, vis_tracking.py:130-134)
        res = rigid_tracking_jit(
            fusion.state, src_feats_dev, last_match, lo, hi, cfg,
        )
        last_match = res["match_pts"]
        loop.submit((t, obs["color"], t0),
                    {"match_pts": last_match,
                     "loss_history": res["loss_history"]})

        if args.fused and t == 0:
            # seed frame done through the staged path (detection seeds the
            # tracker); every later frame runs the fused executable
            from d3fields_tpu.models.dinov2 import Dinov2Backbone
            from d3fields_tpu.serving import FusedFrameStep

            if fusion.video_tracker is None:
                raise SystemExit(
                    "--fused needs the XMem video tracker — set "
                    "D3F_XMEM_CKPT so frames propagate instead of "
                    "re-detecting per frame"
                )
            fb = feature_backend
            if getattr(fb, "resize_mode", None) != "device":
                # the fused jit resizes on device; rebuild the wrapper on
                # the SAME params (no re-upload, they are device arrays)
                fb = Dinov2Backbone(fb.params, fb.cfg, fb.compute_dtype,
                                    fb.pos_interpolate, "device")
            # obs color is BGR (cv2 convention): DINOv2 consumes it
            # as-is (matching Fusion.update) but the tracker was seeded
            # with RGB — flip inside the XMem branch of the executable
            fused = FusedFrameStep(fb, fusion.video_tracker, obs["depth"],
                                   obs["pose"], obs["K"], lo, hi, cfg,
                                   xmem_bgr_to_rgb=True,
                                   mu=fusion.config.fusion.mu)

    if fused is not None and seg_buf:
        # tail shorter than --segment: per-frame fused steps (no second
        # segment executable for a one-off shape)
        for ti, o, ti0 in seg_buf:
            out = fused.step(np.asarray(o["color"]), src_feats_dev,
                             last_match, depth=o["depth"])
            last_match = out["match_pts"]
            loop.submit((ti, o["color"], ti0),
                        {"match_pts": last_match,
                         "loss_history": out["loss_history"]})
        seg_buf.clear()
    loop.flush()
    tracker.close()
    print(f"[vis_tracking] wrote {args.out}/tracking.mp4 + pickles")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
