"""Headline benchmark: batch_eval query-point throughput, 4-view fusion.

Prints ONE JSON line:
  {"metric": "batch_eval_pts_per_sec", "value": N, "unit": "pts/s",
   "vs_baseline": R}

``value`` is the TPU-native throughput of ``d3fields_tpu`` batch_eval
(dino_feats 1024-d + full-res mask fusion, 4 views) over 1M query points.
``vs_baseline`` is the speedup over the reference algorithm (torch
grid_sample + 60k-point host chunking, ``fusion.py:305-545``) re-implemented
faithfully in torch and run on the host CPU of this machine — the only
executable form of the reference here (no CUDA GPU; the reference publishes
no numbers, BASELINE.json ``published: {}``). North star: >=10x.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _scene(num_views=4, H=240, W=320, feat_dim=1024, num_inst=4, seed=0):
    rs = np.random.RandomState(seed)
    depth = (0.6 + 0.2 * rs.rand(num_views, H, W)).astype(np.float32)
    K = np.tile(
        np.array([[260.0, 0, W / 2], [0, 260.0, H / 2], [0, 0, 1]], np.float32),
        (num_views, 1, 1),
    )
    poses = []
    for v in range(num_views):
        th = 2 * np.pi * v / num_views
        c, s = np.cos(th), np.sin(th)
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        t = np.array([0.02 * v, -0.01 * v, 0.8], np.float32)
        poses.append(np.concatenate([R, t[:, None]], 1))
    pose = np.stack(poses)
    feats = rs.randn(num_views, H // 10, W // 10, feat_dim).astype(np.float32)
    mask = rs.rand(num_views, H, W, num_inst).astype(np.float32)
    return depth, pose, K, feats, mask


def bench_tpu(depth, pose, K, feats, mask, n_pts=1024 * 1024, repeats=3):
    import jax
    import jax.numpy as jnp

    from d3fields_tpu.fields.fusion import batch_eval
    from d3fields_tpu.fields.state import FieldState

    state = FieldState(
        depth=jnp.asarray(depth),
        pose=jnp.asarray(pose),
        K=jnp.asarray(K),
        dino_feats=jnp.asarray(feats),
        mask=jnp.asarray(mask),
    )
    pts = jnp.asarray(
        np.random.RandomState(1).uniform(-0.5, 0.5, (n_pts, 3)).astype(np.float32)
    )
    use_pallas = jax.default_backend() == "tpu"
    names = ("dino_feats", "mask")

    def run():
        out = batch_eval(state, pts, names, tile=131072, use_pallas=use_pallas)
        # Force execution + completion of every output buffer with ONE host
        # fetch (block_until_ready alone does not synchronize through
        # remote-tunnel TPU backends, and per-buffer fetches each pay a
        # tunnel round trip).
        probe = jnp.stack(
            [v.reshape(-1)[0].astype(jnp.float32) for v in out.values()]
        ).sum()
        sync = float(probe)
        del out
        return sync

    run()  # compile
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"[bench] tpu backend={jax.default_backend()} pallas={use_pallas} "
          f"{n_pts} pts in {dt:.3f}s", file=sys.stderr)
    return n_pts / dt


# Numerical budgets for the fused Pallas path vs the exact XLA path ON THE
# SAME BACKEND. dist / mask are computed in f32 in both paths (only the
# reduction schedule differs); descriptors go through a bf16 MXU matmul on
# TPU, whose documented budget is a 1e-3 cosine deficit
# (fields/kernels.py:330-334). Measured on the real chip 2026-08-18:
# dist 0.0, mask 1.19e-7, min cosine 0.999992 — thresholds sit far above
# the measured deltas and far below anything a real kernel bug produces.
PARITY_DIST_ATOL = 1e-5
PARITY_MASK_ATOL = 1e-5
PARITY_COS_MIN = 1.0 - 1e-3


def parity_check(depth, pose, K, feats, mask, n_pts=262144, tile=65536):
    """On-device numerical parity gate for the fused Pallas path.

    The headline row times ``use_pallas=True`` (Mosaic-lowered kernels, bf16
    MXU matmuls); this runs the SAME scene through both that path and the
    exact XLA path (``use_pallas=False``) on the same backend and measures
    the deltas, so every ``BENCH_r*.json`` certifies the numerics of the
    code path that produced its speed number — not just the speed. Both
    paths implement the reference's weighting/interp semantics
    (``fusion.py:305-394``); their CPU-interpret-mode equivalence is pinned
    by tests/test_fusion.py, and this closes the on-hardware gap (Mosaic
    lowering is where hand-rolled gathers/interp matrices could silently
    diverge).

    Returns the measured deltas plus ``ok`` for the JSON ``parity`` field.
    """
    import jax
    import jax.numpy as jnp

    from d3fields_tpu.fields.fusion import batch_eval
    from d3fields_tpu.fields.state import FieldState

    state = FieldState(
        depth=jnp.asarray(depth),
        pose=jnp.asarray(pose),
        K=jnp.asarray(K),
        dino_feats=jnp.asarray(feats),
        mask=jnp.asarray(mask),
    )
    pts = jnp.asarray(
        np.random.RandomState(1).uniform(-0.5, 0.5, (n_pts, 3)).astype(np.float32)
    )
    names = ("dino_feats", "mask")
    a = batch_eval(state, pts, names, tile=tile, use_pallas=True)
    b = batch_eval(state, pts, names, tile=tile, use_pallas=False)

    @jax.jit
    def deltas(a, b):
        dist = jnp.max(jnp.abs(a["dist"] - b["dist"]))
        msk = jnp.max(jnp.abs(a["mask"] - b["mask"]))
        fa = a["dino_feats"].astype(jnp.float32)
        fb = b["dino_feats"].astype(jnp.float32)
        na = jnp.linalg.norm(fa, axis=-1)
        nb = jnp.linalg.norm(fb, axis=-1)
        cos = (fa * fb).sum(-1) / jnp.maximum(na * nb, 1e-12)
        # rows with no valid view fuse to exact zeros in both paths; their
        # cosine is undefined (0/0), so compare only rows that carry signal
        valid = (na > 1e-6) & (nb > 1e-6)
        min_cos = jnp.min(jnp.where(valid, cos, 1.0))
        return dist, msk, min_cos, valid.sum()

    dist_d, mask_d, min_cos, nrows = (float(x) for x in deltas(a, b))
    del a, b
    ok = (
        dist_d <= PARITY_DIST_ATOL
        and mask_d <= PARITY_MASK_ATOL
        and min_cos >= PARITY_COS_MIN
    )
    print(f"[bench] pallas parity over {n_pts} pts ({int(nrows)} live rows): "
          f"dist_max_abs={dist_d:.2e} mask_max_abs={mask_d:.2e} "
          f"desc_min_cosine={min_cos:.6f} -> {'OK' if ok else 'FAIL'}",
          file=sys.stderr)
    return {
        "dist_max_abs": round(dist_d, 9),
        "mask_max_abs": round(mask_d, 9),
        "desc_min_cosine": round(min_cos, 6),
        "rows_compared": int(nrows),
        "ok": ok,
    }


def bench_torch_reference(depth, pose, K, feats, mask, n_pts=131072,
                          chunk=60000, reps=3):
    """The reference eval algorithm (``fusion.py:305-394,526-545``): torch
    grid_sample interpolation per view, exp distance weighting, python
    chunk loop at 60k points — on the host CPU.

    Returns (best_pts_per_sec, per_rep_seconds). ``reps`` full passes,
    best (min-time) kept — the 1-CPU driver host is noisy under load and
    the TPU side already reports min-of-reps; recording the reps in the
    JSON makes the ratio's variance visible (round-3 verdict weak #7)."""
    import torch
    import torch.nn.functional as F

    torch.set_num_threads(max(1, torch.get_num_threads()))
    dev = torch.device("cpu")
    mu = 0.02
    V, H, W = depth.shape
    depth_t = torch.from_numpy(depth).to(dev)
    pose_t = torch.from_numpy(pose).to(dev)
    K_t = torch.from_numpy(K).to(dev)
    # (V, C, h, w) layouts for grid_sample
    feats_t = torch.from_numpy(feats).permute(0, 3, 1, 2).contiguous().to(dev)
    mask_t = torch.from_numpy(mask).permute(0, 3, 1, 2).contiguous().to(dev)
    pts_all = torch.from_numpy(
        np.random.RandomState(1).uniform(-0.5, 0.5, (n_pts, 3)).astype(np.float32)
    ).to(dev)

    def eval_chunk(pts):
        N = pts.shape[0]
        hom = torch.cat([pts, torch.ones(N, 1)], 1)  # (N, 4)
        cam = torch.einsum("vij,nj->vni", pose_t, hom)  # (V, N, 3)
        z = cam[..., 2]
        pix = torch.einsum("vij,vnj->vni", K_t, cam)
        pix = pix[..., :2] / pix[..., 2:3].clamp(min=1e-4)
        gx = pix[..., 0] / (W - 1) * 2 - 1
        gy = pix[..., 1] / (H - 1) * 2 - 1
        grid = torch.stack([gx, gy], -1).unsqueeze(1)  # (V, 1, N, 2)
        inter_depth = F.grid_sample(
            depth_t.unsqueeze(1), grid, mode="nearest",
            padding_mode="zeros", align_corners=True,
        )[:, 0, 0]  # (V, N)
        dist = inter_depth - z
        valid = (inter_depth > 0) & (z > 1e-4) & (dist > -mu)
        wgt = torch.exp(torch.clamp(mu - dist.abs(), max=0.0) / mu) * valid
        outs = []
        for m in (feats_t, mask_t):
            s = F.grid_sample(
                m, grid, mode="bilinear", padding_mode="zeros", align_corners=True
            )[:, :, 0]  # (V, C, N)
            outs.append(
                (s * wgt.unsqueeze(1)).sum(0) / (valid.float().sum(0) + 1e-6)
            )
        dclamp = dist.clamp(-mu, mu)
        dfused = (dclamp * valid).sum(0) / (valid.float().sum(0) + 1e-6)
        return dfused, outs

    rep_times = []
    with torch.no_grad():
        eval_chunk(pts_all[:chunk])  # warm up
        for _ in range(reps):
            t0 = time.perf_counter()
            for i in range(0, n_pts, chunk):
                eval_chunk(pts_all[i : i + chunk])
            rep_times.append(time.perf_counter() - t0)
    dt = min(rep_times)
    print(f"[bench] torch-cpu reference {n_pts} pts in {dt:.3f}s "
          f"(best of {reps}: {['%.3f' % t for t in rep_times]})",
          file=sys.stderr)
    return n_pts / dt, rep_times


def _mfu_msg(flops, dt, peak):
    """'; X TFLOP/s = Y% of measured peak' or '' when uncounted."""
    if not flops or not peak:
        return ""
    v = flops / dt / 1e12
    return f"; {v:.1f} TFLOP/s = {100 * v / peak:.0f}% of measured peak {peak:.0f}"


def dinov2_extract_flops(bb, imgs, H, W):
    """Scan-corrected FLOP count for one DINOv2 extraction executable.

    XLA's cost analysis counts a ``lax.scan`` body ONCE regardless of trip
    count (``profiling.xla_flops`` caveat); the ViT trunk is a scan over
    ``num_layers`` blocks, so the raw count under-reports ~24x for ViT-L.
    This is THE one accounting both the standalone ``bench_dinov2`` row and
    the ``bench_pipeline`` FLOP split use — round-4 verdict weak #2 was
    exactly these two rows applying different corrections to the same
    executable. (Slightly overcounts the un-scanned patch-embed prologue by
    scaling it with the layers; that prologue is <2% of a ViT-L forward.)
    Returns None when the backend exposes no cost analysis."""
    import jax.numpy as jnp

    from d3fields_tpu.models import dinov2 as dv2
    from d3fields_tpu.utils.profiling import xla_flops

    cfg = bb.cfg
    ph, pw = H // 10, W // 10
    P = cfg.patch_size
    fl = xla_flops(dv2._extract_patch_features, bb.params, jnp.asarray(imgs),
                   bb.interpolated_pos_embed(ph, pw), (ph * P, pw * P),
                   cfg.num_heads, bb.compute_dtype)
    return fl * cfg.num_layers if fl else None


def bench_xmem(num_views=4, H=480, W=640, num_obj=2, frames=6, peak=None,
               base_cfg=None):
    """4-camera XMem propagate step latency, f32 AND bf16 CNN trunks (the
    README row). The bf16 path is ``XMemConfig.compute_dtype`` — the
    memory-attention affinity math stays f32 either way (core.py:86-107);
    round 3 measured 28% MFU without saying which dtype ran or why.
    Returns a row dict for the structured bench artifact."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from d3fields_tpu.config import XMemConfig
    from d3fields_tpu.models.xmem import core as C
    from d3fields_tpu.models.xmem import network as N
    from d3fields_tpu.utils.profiling import xla_flops

    base_cfg = base_cfg or XMemConfig()
    params = N.init_params(jax.random.PRNGKey(0), base_cfg)
    rs = np.random.RandomState(0)
    imgs = jnp.asarray(rs.rand(num_views, H, W, 3).astype(np.float32))
    mask = jnp.asarray((rs.rand(num_views, num_obj, H, W) > 0.7).astype(np.float32))
    row = {}
    for dtype in ("float32", "bfloat16"):
        cfg = dataclasses.replace(base_cfg, compute_dtype=dtype)
        core = C.XMemCore(params, cfg, num_views, num_obj, (H, W))
        p = core.step(imgs, mask)
        float(jnp.asarray(p).reshape(-1)[0])
        ts = []
        for _ in range(frames):
            t0 = time.perf_counter()
            p = core.step(imgs)
            float(p.reshape(-1)[0])
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        # XLA's own count for the one executable the loop runs (both
        # lax.cond branches are in the module: the compiled-in upper bound)
        fl = xla_flops(C.propagate_step_views, core.params, core.mem, imgs,
                       jnp.asarray(True), cfg.compute_dtype,
                       core.deep_update_sync, None)
        print(f"[bench] xmem propagate {num_views} cams @ {H}x{W} {dtype}: "
              f"{dt*1e3:.1f} ms ({num_views/dt:.1f} camera-FPS)"
              f"{_mfu_msg(fl, dt, peak)}", file=sys.stderr)
        key = "f32" if dtype == "float32" else "bf16"
        row[f"xmem_step_{key}_ms"] = round(dt * 1e3, 2)
        if fl and peak:
            row[f"xmem_step_{key}_mfu_pct"] = round(
                100 * fl / dt / 1e12 / peak, 1)

    # deep-stage conv-scheduling experiment (round-4 verdict next #4b): the
    # same bf16 step with eligible 3x3/s1 convs lowered as 9 explicit
    # matmuls (blocks.set_conv3x3_matmul) — fresh XMemCore so the step
    # re-traces under the flag; parity pinned in tests/test_xmem.py
    from d3fields_tpu.models.xmem import blocks as B

    # the flag is a trace-time module global, NOT part of the jit cache
    # key — the bf16 loop above already traced propagate_step_views with
    # identical avals, so without clearing the cache this block would
    # silently re-time the plain-conv executable (caught by round-5
    # review; the first recorded 65.56 ms "no-op" was exactly that)
    jax.clear_caches()
    B.set_conv3x3_matmul(True)
    try:
        cfg = dataclasses.replace(base_cfg, compute_dtype="bfloat16")
        core = C.XMemCore(params, cfg, num_views, num_obj, (H, W))
        p = core.step(imgs, mask)
        float(jnp.asarray(p).reshape(-1)[0])
        ts = []
        for _ in range(frames):
            t0 = time.perf_counter()
            p = core.step(imgs)
            float(p.reshape(-1)[0])
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(f"[bench] xmem propagate {num_views} cams bf16 + conv3x3-as-"
              f"matmul: {dt*1e3:.1f} ms ({num_views/dt:.1f} camera-FPS)",
              file=sys.stderr)
        row["xmem_step_bf16_conv3x3mm_ms"] = round(dt * 1e3, 2)
    finally:
        B.set_conv3x3_matmul(False)
        jax.clear_caches()  # don't leak matmul-conv traces to later stages
    return row


def bench_dinov2(num_views=4, H=240, W=320, peak=None, cfg=None):
    """Fused DINOv2 extraction latency (the README row). FLOPs come from
    :func:`dinov2_extract_flops` — the scan-corrected count the pipeline
    split also uses, so the two rows can never diverge again (round-4
    verdict weak #2: this row printed 1% MFU next to a pipeline split
    implying 16% for the same executable). Returns a row dict."""
    import jax
    import jax.numpy as jnp

    from d3fields_tpu.models import dinov2 as dv2

    cfg = cfg or dv2.Dinov2Config.vit_large()
    params = dv2.init_params(jax.random.PRNGKey(0), cfg)
    bb = dv2.Dinov2Backbone(params, cfg, compute_dtype="bfloat16")
    rs = np.random.RandomState(0)
    imgs = (rs.rand(num_views, H, W, 3) * 255).astype(np.uint8)

    o = bb(imgs)
    float(jnp.asarray(o).reshape(-1)[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        o = bb(imgs)
        float(jnp.asarray(o).reshape(-1)[0])
        ts.append(time.perf_counter() - t0)
    fl = dinov2_extract_flops(bb, imgs, H, W)
    dt = min(ts)
    # Roofline: at the bench shape the ViT-L forward is ~2.3 TFLOP over
    # ~0.9 GB of bf16 params+activations -> arithmetic intensity ~2500
    # FLOP/B, far above the chip ridge (~149), so the stage is
    # compute-CAPABLE; the gap to peak is small-batch attention shapes
    # (4 views x 768 tokens) under-filling the MXU, not memory traffic.
    print(f"[bench] dinov2 extract {num_views} views @ {H}x{W} bf16: "
          f"{dt*1e3:.1f} ms{_mfu_msg(fl, dt, peak)} "
          f"(scan-corrected x{cfg.num_layers}; compute-capable AI, "
          f"MXU under-fill bounds it)", file=sys.stderr)
    row = {"dinov2_extract_ms": round(dt * 1e3, 2)}
    if fl:
        row["dinov2_extract_gflop"] = round(fl / 1e9, 1)
        if peak:
            row["dinov2_extract_mfu_pct"] = round(
                100 * fl / dt / 1e12 / peak, 1)
    return row


def bench_train(batch=4, T=4, num_obj=2, H=96, W=128, steps=4):
    """XMem training step throughput (reference XMem/train.py stage-like
    shapes scaled to one chip; uses the donated loop variant the real
    trainer runs)."""
    import jax
    import jax.numpy as jnp

    from d3fields_tpu.config import XMemConfig
    from d3fields_tpu.models.xmem import network as N
    from d3fields_tpu.models.xmem import trainer as TR

    cfg = XMemConfig()
    rs = np.random.RandomState(0)
    batch_d = {
        "frames": jnp.asarray(rs.rand(batch, T, H, W, 3).astype(np.float32)),
        "first_gt": jnp.asarray(
            (rs.rand(batch, num_obj, H, W) > 0.5).astype(np.float32)),
        "cls_gt": jnp.asarray(rs.randint(0, num_obj + 1, (batch, T, H, W))),
        "selector": jnp.ones((batch, num_obj), jnp.float32),
    }
    opt = TR.make_optimizer()
    state = TR.init_train_state(N.init_params(jax.random.PRNGKey(0), cfg), opt)
    state, out = TR.train_step_donated(state, batch_d, cfg, opt,
                                       num_ref_frames=2)
    float(out["loss"])  # compile + sync
    ts = []
    for _ in range(steps):
        t0 = time.perf_counter()
        state, out = TR.train_step_donated(state, batch_d, cfg, opt,
                                           num_ref_frames=2)
        float(out["loss"])
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"[bench] xmem train step batch={batch} T={T} @ {H}x{W}: "
          f"{dt*1e3:.1f} ms ({batch/dt:.1f} clips/s)", file=sys.stderr)
    return {"xmem_train_step_ms": round(dt * 1e3, 2),
            "xmem_train_clips_per_s": round(batch / dt, 2)}


def bench_grounded_sam(num_views=4, H=240, W=320, boxes_per_view=4,
                       repeats=3, peak=None):
    """First-frame open-text segmentation stage (reference
    ``utils/grounded_sam.py:404-442`` via ``fusion.py:1178-1236``):
    GroundingDINO swin-t detection (f32 AND the gated bf16 trunk, both
    with the corner-table deformable gather + query tiling), then SAM
    ViT-H encode of the whole rig in ONE dispatch and ONE batched
    multi-view box decode dispatch. Random weights at REAL scale; reports
    ms plus XLA-counted FLOPs and MFU against the chip's measured matmul
    peak for BOTH models (round 3 only accounted SAM).
    """
    import jax
    import jax.numpy as jnp

    from d3fields_tpu.models.groundingdino import model as gd
    from d3fields_tpu.models.groundingdino.detector import (
        GroundingDinoDetector, tokenize_classes,
    )
    from d3fields_tpu.models.sam import model as sm
    from d3fields_tpu.models.sam.predictor import SamPredictor
    from d3fields_tpu.utils.profiling import (
        measured_matmul_peak_tflops, xla_flops,
    )

    t0 = time.perf_counter()
    gcfg = gd.GroundingDinoConfig()  # swin-t: the reference runtime default
    gparams = gd.random_params(gcfg)
    scfg = sm.SamConfig.vit_huge()
    sparams = sm.random_params_direct(scfg)
    print(f"[bench] grounded-sam setup (random real-scale weights): "
          f"{time.perf_counter() - t0:.0f}s", file=sys.stderr)

    rs = np.random.RandomState(0)
    images = rs.randint(0, 255, (num_views, H, W, 3), np.uint8)
    tokenize = lambda s: [200 + (hash(w) % 1000) for w in s.split()]
    queries = ["mug", "red can"]

    # ---- GroundingDINO with the corner-table deformable gather +
    # query_chunk=4096 (the measured single-chip optimum: the sweep over
    # {f32,bf16} x view_chunk x query_chunk put bf16/vc=1/qc=4096 fastest
    # at 1654 ms/4 views vs round-3's 3247 ms; the 4-view single batch
    # also FITS now — 2544 ms bf16 — and is the multi-chip layout, dryrun
    # stage 6, where each chip holds one view) ----
    def time_gdino(dt, vc, gather="auto"):
        det = GroundingDinoDetector(gparams, gcfg, tokenize=tokenize,
                                    compute_dtype=dt, view_chunk=vc,
                                    query_chunk=4096, gather_impl=gather)
        det.predict_with_classes_batch(images, queries, 0.99)  # compile
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            det.predict_with_classes_batch(images, queries, 0.99)
            ts.append(time.perf_counter() - t0)
        return min(ts), det

    # default "auto" = the Mosaic gather kernel on TPU (round 5); the
    # explicit gather_impl=None row keeps the XLA take-loop path measured
    # so the kernel's win stays visible round-over-round
    t_gd32, det32 = time_gdino("float32", 1)
    t_gd16, det16 = time_gdino("bfloat16", 1)
    t_gd16_xla, _ = time_gdino("bfloat16", 1, gather=None)
    t_gdino = min(t_gd32, t_gd16)

    # GDINO FLOPs: XLA's count of the full jitted forward at the batched
    # shape (text-mask preprocessing reproduced host-side as the detector
    # does). query_chunk=None for the COUNT only: XLA's cost analysis
    # counts a lax.map body once regardless of trip count, so the tiled
    # executable under-reports; the un-tiled lowering counts every tile
    # (lower+compile only — never executed, so its HBM blowup is moot).
    ids, _spans = tokenize_classes(queries, tokenize)
    ids_b = np.repeat(np.asarray(ids), num_views, axis=0)
    self_mask, pos_ids = gd.generate_text_masks(ids_b)
    token_mask = np.ones_like(ids_b, bool)
    pixels_b = jnp.concatenate(
        [det32._prep(im) for im in images], axis=0)
    gd_flops = xla_flops(
        gd._groundingdino_forward_impl, gparams, gcfg, pixels_b,
        jnp.asarray(ids_b), jnp.asarray(self_mask), jnp.asarray(pos_ids),
        jnp.asarray(token_mask), "float32", None,
    )

    # ---- SAM: whole-rig encode in ONE dispatch (sam_encode_images) and
    # ONE batched multi-view decode dispatch (sam_decode_boxes_views) —
    # round 3 paid a tunnel round trip per view for each ----
    boxes = rs.uniform(0, min(H, W) // 2, (boxes_per_view, 4)).astype(np.float32)
    boxes[:, 2:] += boxes[:, :2]  # xyxy
    boxes_views = [boxes] * num_views

    def time_encode(sam):
        sam.set_images(images)  # compile
        float(jnp.asarray(sam._image_embs).reshape(-1)[0])
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            sam.set_images(images)
            float(jnp.asarray(sam._image_embs).reshape(-1)[0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    sam = SamPredictor(sparams, scfg)
    t_enc = time_encode(sam)
    # the bf16 MXU trunk (f32-agreement pinned in
    # tests/test_sam.py::test_bf16_encoder_agreement)
    sam16 = SamPredictor(sparams, scfg, compute_dtype="bfloat16")
    t_enc16 = time_encode(sam16)

    def time_decode(s):
        s.predict_boxes_views(boxes_views)  # compile the decoder
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            s.predict_boxes_views(boxes_views)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_dec = time_decode(sam)
    # bf16 drops the decoder's f32 matmul-precision pin (~9x on TPU;
    # agreement pinned on-chip in tests_tpu/test_sam_decode_precision.py)
    t_dec16 = time_decode(sam16)
    total = t_gdino + min(t_enc, t_enc16) + min(t_dec, t_dec16)

    # ---- FLOP accounting: XLA's own count per executable, MFU vs the
    # chip's measured (not datasheet) matmul peak. Encode FLOPs are
    # counted per view and multiplied by V: the one-dispatch executable
    # wraps the per-view body in lax.map, whose body XLA counts once ----
    enc_flops = xla_flops(sm.sam_encode_image, sparams, sam._pixels[:1],
                          scfg)
    if enc_flops:
        enc_flops *= num_views
    embs = sam._image_embs
    nb = SamPredictor._bucket(boxes_per_view)
    dec_flops = xla_flops(
        sm.sam_decode_boxes_views, sparams, embs,
        jnp.zeros((num_views, nb, 4), jnp.float32), scfg, True,
    )
    if peak is None:
        peak = measured_matmul_peak_tflops()
    msg = (f"[bench] grounded-sam first-frame ({num_views} views @ {H}x{W}, "
           f"swin-t + vit-h): gdino f32 {t_gd32*1e3:.0f} ms / bf16 "
           f"{t_gd16*1e3:.0f} ms "
           f"(gather={det16.gather_impl or 'xla'}; xla-gather bf16 "
           f"{t_gd16_xla*1e3:.0f} ms), "
           f"sam encode f32 {t_enc*1e3:.0f} ms / bf16 {t_enc16*1e3:.0f} ms "
           f"(one dispatch), sam decode f32 {t_dec*1e3:.0f} ms / bf16 "
           f"{t_dec16*1e3:.0f} ms (one dispatch) -> {total*1e3:.0f} ms "
           f"total")
    if gd_flops:
        g32 = gd_flops / t_gd32 / 1e12
        g16 = gd_flops / t_gd16 / 1e12
        msg += (f"; gdino f32 {g32:.2f} / bf16 {g16:.2f} TFLOP/s = "
                f"{100 * g16 / peak:.1f}% of measured peak {peak:.0f} "
                f"(gather-bound: XLA counts {gd_flops/1e9:.0f} GFLOP)")
    if enc_flops:
        v32 = enc_flops / t_enc / 1e12
        v16 = enc_flops / t_enc16 / 1e12
        msg += (f"; sam-encode f32 {v32:.1f} / bf16 {v16:.1f} TFLOP/s = "
                f"{100 * v16 / peak:.0f}% of peak")
    if dec_flops:
        v_dec = dec_flops / t_dec16 / 1e12
        msg += f"; decode {v_dec:.2f} TFLOP/s"
    print(msg, file=sys.stderr)
    # first-frame latency as a tracked headline row (round-4 verdict next
    # #7): detect + segment is the device-side first frame (consensus +
    # seeding are host-side numpy, <50 ms, reference fusion.py:1068-1098);
    # recorded base is round 4's 2,502 ms (VERDICT.md round-4 bottom line)
    r04_base_ms = 2502.0
    print(f"[bench] FIRST FRAME (detect+segment, {num_views} views): "
          f"{total*1e3:.0f} ms (r04 base {r04_base_ms:.0f} ms, "
          f"{r04_base_ms/(total*1e3):.2f}x)", file=sys.stderr)
    return {"gdino_ms": t_gd32 * 1e3, "gdino_bf16_ms": t_gd16 * 1e3,
            "gdino_gather_impl": det16.gather_impl or "xla",
            "gdino_bf16_xla_gather_ms": t_gd16_xla * 1e3,
            "sam_encode_ms": t_enc * 1e3,
            "sam_encode_bf16_ms": t_enc16 * 1e3,
            "sam_decode_ms": t_dec * 1e3,
            "sam_decode_bf16_ms": t_dec16 * 1e3, "total_ms": total * 1e3,
            "first_frame_ms": round(total * 1e3, 1),
            "first_frame_r04_base_ms": r04_base_ms,
            "measured_peak_tflops": peak}


def bench_pipeline(num_views=4, H=240, W=320, num_obj=2, track_pts=100,
                   frames=5, peak=None):
    """Full per-frame serving step (BASELINE configs 3-4, the
    ``vis_tracking.py`` stack): DINOv2 ViT-L extraction + XMem mask
    propagation + field rebuild + 100-iter rigid keypoint tracking
    through the field, synced to the host each frame."""
    import jax
    import jax.numpy as jnp

    from d3fields_tpu.config import TrackingConfig, XMemConfig
    from d3fields_tpu.fields.fusion import eval_field_jit
    from d3fields_tpu.fields.state import FieldState
    from d3fields_tpu.models import dinov2 as dv2
    from d3fields_tpu.models.xmem import core as C
    from d3fields_tpu.models.xmem import network as N
    from d3fields_tpu.track.rigid import _tracking_scan_jit, rigid_tracking_jit

    rs = np.random.RandomState(0)
    depth, pose, K, _, _ = _scene(num_views, H, W)
    color = rs.randint(0, 255, (num_views, H, W, 3), np.uint8)
    imgs_f = jnp.asarray(color, jnp.float32) / 255.0
    depth_j, pose_j, K_j = jnp.asarray(depth), jnp.asarray(pose), jnp.asarray(K)

    dcfg = dv2.Dinov2Config.vit_large()
    # resize_mode='device': the 3-dispatch rows and the fused rows must
    # run the SAME resampler for an apples-to-apples comparison (the
    # fused executable cannot host-PIL-resize; divergence budget is the
    # documented 1e-3 descriptor cosine, models/dinov2.py)
    bb = dv2.Dinov2Backbone(dv2.init_params(jax.random.PRNGKey(0), dcfg),
                            dcfg, compute_dtype="bfloat16",
                            resize_mode="device")
    xcfg = XMemConfig()
    xcore = C.XMemCore(N.init_params(jax.random.PRNGKey(1), xcfg), xcfg,
                       num_views, num_obj, (H, W))
    seed = jnp.asarray(
        (rs.rand(num_views, num_obj, H, W) > 0.7).astype(np.float32))
    tcfg = TrackingConfig()
    kp = jnp.asarray(
        rs.uniform(-0.2, 0.2, (1, track_pts, 3)).astype(np.float32))
    lo = jnp.asarray([-0.5, -0.5, -0.5], jnp.float32)
    hi = jnp.asarray([0.5, 0.5, 0.5], jnp.float32)

    def frame(masks_prob):
        feats = bb(color)  # (V, H//10, W//10, 1024)
        probs = xcore.step(imgs_f, masks_prob)
        mask = jnp.transpose(probs[:, 1:], (0, 2, 3, 1))  # drop bg
        st = FieldState(depth=depth_j, pose=pose_j, K=K_j,
                        dino_feats=feats.astype(jnp.float32), mask=mask)
        return st

    st0 = frame(seed)
    src = eval_field_jit(st0, kp.reshape(-1, 3), ("dino_feats",))["dino_feats"]
    out = rigid_tracking_jit(st0, src, kp, lo, hi, tcfg)  # compile
    float(out["match_pts"].reshape(-1)[0])
    # warm the propagate path too (mask_prob=None jits a different XMem
    # step than the seed frame) so the timed loop is compile-free
    float(frame(None).mask.reshape(-1)[0])

    ts = []
    for _ in range(frames):
        t0 = time.perf_counter()
        st = frame(None)
        out = rigid_tracking_jit(st, src, kp, lo, hi, tcfg)
        float(out["match_pts"].reshape(-1)[0])  # host sync (tunnel-safe)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    # per-frame FLOPs = the three executables the timed loop dispatches
    # (XLA's own counts); FieldState assembly is layout-only
    from d3fields_tpu.utils.profiling import xla_flops

    # XLA counts a lax.scan body ONCE (profiling.xla_flops caveat): scale
    # the scan-dominated executables by their trip counts — the ViT layer
    # scan (dinov2_extract_flops, the SAME accounting as the standalone
    # bench_dinov2 row) and the Adam scan (x iters/unroll). XMem's step is
    # vmapped, not scanned: counted fully as-is.
    fl_track = xla_flops(_tracking_scan_jit, st0, src, kp, lo, hi, tcfg, 4)
    fls = [
        dinov2_extract_flops(bb, color, H, W),
        xla_flops(C.propagate_step_views, xcore.params, xcore.mem, imgs_f,
                  jnp.asarray(True), xcfg.compute_dtype,
                  xcore.deep_update_sync, None),
        fl_track * (tcfg.iters // 4) if fl_track else None,
    ]
    fl = sum(fls) if all(fls) else None
    print(f"[bench] pipeline frame ({num_views} cams @ {H}x{W}: dinov2 + "
          f"xmem + field + {tcfg.iters}-iter tracking): {dt*1e3:.1f} ms "
          f"({1.0/dt:.2f} FPS; reference XMem-only claim ~20 FPS, "
          f"XMem/README.md:34){_mfu_msg(fl, dt, peak)}", file=sys.stderr)
    if fl:
        print(f"[bench]   pipeline FLOP split (scan trip counts applied): "
              f"dinov2 ~{fls[0]/1e9:.0f} G, xmem {fls[1]/1e9:.1f} G, "
              f"tracking ~{fls[2]/1e9:.1f} G", file=sys.stderr)

    # pipelined serving: defer the host fetch by one frame
    # (serving.AsyncFrameLoop) so frame t's result crosses the host
    # boundary while frame t+1 computes — same outputs, the per-frame
    # sync (a full tunnel round trip on remote TPU) hides behind compute
    from d3fields_tpu.serving import AsyncFrameLoop

    fetched = []
    sink = AsyncFrameLoop(
        lambda fid, pts: fetched.append(pts.reshape(-1)[0]), depth=1)
    t0 = time.perf_counter()
    for i in range(frames):
        st = frame(None)
        out = rigid_tracking_jit(st, src, kp, lo, hi, tcfg)
        sink.submit(i, out["match_pts"])
    sink.flush()
    dt2 = (time.perf_counter() - t0) / frames
    # compare like statistics: mean synced per-frame vs mean pipelined
    # per-frame (min() is undefined for the overlapped loop)
    dt_mean = sum(ts) / len(ts)
    print(f"[bench] pipeline frame, pipelined depth=1 (AsyncFrameLoop): "
          f"{dt2*1e3:.1f} ms/frame ({1.0/dt2:.2f} FPS, "
          f"{dt_mean/dt2:.2f}x vs synced mean {dt_mean*1e3:.1f} ms)",
          file=sys.stderr)

    # ---- fused single-dispatch step (serving.FusedFrameStep): the whole
    # per-frame stack (dinov2 + xmem + field + tracking) as ONE executable.
    # The 3-dispatch loop above pays a tunnel round trip per dispatch plus
    # the host sync — at ~10 ms of actual compute that made the frame
    # dispatch-bound (round-3 verdict weak #3) ----
    from d3fields_tpu.seg.video_tracker import VideoMaskTracker
    from d3fields_tpu.serving import FusedFrameStep

    tracker = VideoMaskTracker(xcore.params, xcfg, num_views=num_views,
                               num_objects=num_obj, image_hw=(H, W),
                               size=-1)
    idx_mask = np.zeros((num_views, H, W), np.uint8)
    idx_mask[:, : H // 3, : W // 2] = 1
    idx_mask[:, H // 2 :, W // 2 :] = 2
    tracker.process(color, idx_mask)  # seed
    fused = FusedFrameStep(bb, tracker, depth_j, pose_j, K_j, lo, hi, tcfg)
    out = fused.step(color, src, kp)  # compile
    float(out["match_pts"].reshape(-1)[0])
    ts_f = []
    for _ in range(frames):
        t0 = time.perf_counter()
        out = fused.step(color, src, kp)
        float(out["match_pts"].reshape(-1)[0])
        ts_f.append(time.perf_counter() - t0)
    dtf = min(ts_f)
    # the fused executable computes the same math as the three stages, so
    # the corrected (trip-count-scaled) stage sum is its FLOP numerator —
    # lowering the fused module itself would re-hit the scan-body-once
    # undercount for the ViT and Adam scans inside it
    print(f"[bench] pipeline frame, FUSED single dispatch: "
          f"{dtf*1e3:.1f} ms/frame synced ({1.0/dtf:.2f} FPS, "
          f"{dt/dtf:.2f}x vs 3-dispatch synced)"
          f"{_mfu_msg(fl, dtf, peak)}", file=sys.stderr)

    # fused + AsyncFrameLoop depth sweep: >= depth frames in flight through
    # the tunnel; the host fetch of frame t overlaps frames t+1..t+depth.
    # The sweep quantifies the dispatch-vs-compute split of the remaining
    # per-frame cost (round-4 verdict weak #5): if deeper pipelines keep
    # shaving time, the loop is still latency-bound; a plateau = compute.
    dtf_mean = sum(ts_f) / len(ts_f)
    depth_ms = {}
    for depth_sweep in (2, 4, 8):
        sink2 = AsyncFrameLoop(
            lambda fid, pts: fetched.append(pts.reshape(-1)[0]),
            depth=depth_sweep)
        n_sweep = max(frames, 2 * depth_sweep)
        t0 = time.perf_counter()
        for i in range(n_sweep):
            out = fused.step(color, src, kp)
            sink2.submit(i, out["match_pts"])
        sink2.flush()
        depth_ms[depth_sweep] = (time.perf_counter() - t0) / n_sweep
    dtf2 = depth_ms[2]
    print(f"[bench] pipeline frame, FUSED pipelined depth sweep: "
          + ", ".join(f"depth={d} {v*1e3:.1f} ms/frame"
                      for d, v in depth_ms.items())
          + f" ({1.0/dtf2:.2f} FPS at depth=2, "
          f"{dtf_mean/dtf2:.2f}x vs fused synced mean "
          f"{dtf_mean*1e3:.1f} ms; {dt_mean/dtf2:.2f}x vs round-3-style "
          f"3-dispatch synced mean)", file=sys.stderr)

    # ---- segment mode: T frames scanned inside ONE executable
    # (FusedFrameStep.step_segment) — the offline/recorded-video mode; one
    # dispatch + one fetch amortized over the whole clip ----
    T = 8
    clip = np.broadcast_to(color, (T,) + color.shape)
    outs = fused.step_segment(clip, src, kp)  # compile
    float(outs["match_pts"].reshape(-1)[0])
    ts_s = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = fused.step_segment(clip, src, kp)
        float(outs["match_pts"].reshape(-1)[0])
        ts_s.append(time.perf_counter() - t0)
    dts = min(ts_s) / T
    print(f"[bench] pipeline frame, FUSED SEGMENT (T={T} frames, one "
          f"executable): {dts*1e3:.1f} ms/frame ({1.0/dts:.2f} FPS, "
          f"{dt/dts:.2f}x vs 3-dispatch synced)", file=sys.stderr)

    # segment PIPELINED: exactly what vis_tracking --segment does — each
    # clip's device outputs go into the AsyncFrameLoop, so clip k's fetch
    # overlaps clip k+1's dispatch+compute (only the match_pts carry
    # chains device-side, no host sync at the clip boundary). The synced
    # row above serializes clip-fetch after clip-compute, which is why
    # round 4 saw segment "lose" to per-frame depth-2 pipelining (71.3 vs
    # 59.9 ms/frame): the gap was the un-overlapped round trip + clip
    # fetch, not scan compute.
    sink3 = AsyncFrameLoop(
        lambda fid, pts: fetched.append(np.asarray(pts).reshape(-1)[0]),
        depth=1)
    n_clips = 3
    t0 = time.perf_counter()
    for c in range(n_clips):
        outs = fused.step_segment(clip, src, kp)
        sink3.submit(c, outs["match_pts"])
    sink3.flush()
    dts_p = (time.perf_counter() - t0) / (n_clips * T)
    print(f"[bench] pipeline frame, FUSED SEGMENT pipelined (T={T}, "
          f"{n_clips} clips, depth=1 clip overlap): {dts_p*1e3:.1f} "
          f"ms/frame ({1.0/dts_p:.2f} FPS)", file=sys.stderr)
    row = {
        "pipeline_synced_ms": round(dt * 1e3, 2),
        "pipeline_depth1_ms": round(dt2 * 1e3, 2),
        "fused_synced_ms": round(dtf * 1e3, 2),
        "fused_segment_ms_per_frame": round(dts * 1e3, 2),
        "fused_segment_pipelined_ms_per_frame": round(dts_p * 1e3, 2),
    }
    for d, v in depth_ms.items():
        row[f"fused_depth{d}_ms"] = round(v * 1e3, 2)
    if fl and peak:
        row["fused_synced_mfu_pct"] = round(100 * fl / dtf / 1e12 / peak, 1)
    return row


def write_rows_artifact(headline: dict, rows: dict, path: str) -> None:
    """One machine-readable record of EVERY bench row (round-4 verdict next
    #3: per-stage numbers lived as stderr prose in bench_all.log, so
    round-over-round stage regressions could not be diffed mechanically).
    ``headline`` is the stdout JSON contract object; ``rows`` the merged
    per-stage dicts the ``bench_*`` functions return. The stderr prose
    stays; this is the diffable artifact (committed as BENCH_ALL.json)."""
    record = {"headline": headline, "rows": rows}
    with open(path, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"[bench] structured rows -> {path}", file=sys.stderr)


def _probe_subprocess(timeout_s):
    """One backend probe in a SUBPROCESS so a wedged remote TPU tunnel
    cannot hang the benchmark itself (observed: jax.devices() blocking
    indefinitely while the tunnel service is down). Pays one interpreter
    spin-up + tiny compile; killed on timeout."""
    import subprocess

    code = ("import jax, jax.numpy as jnp; x = jnp.ones((8, 8)); "
            "print(float((x @ x)[0, 0]))")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _default_backend_alive(timeout_s=240, attempts=5, backoff_s=120,
                           probe=_probe_subprocess, sleep=time.sleep):
    """Is the default JAX backend responsive? Retries with backoff before
    giving up: the remote tunnel has transient outages (round 3's official
    headline artifact fell back to CPU on a single failed probe; round 4
    observed three outages of ~5-15 min in one afternoon, one of which
    outlasted a 3x90 s retry), so the bench bridges ~10+ minutes of
    downtime before demoting the round's record. Healthy chips pay one
    ~30 s probe. ``probe``/``sleep`` are injectable for the fallback-logic
    tests."""
    for i in range(attempts):
        if probe(timeout_s):
            return True
        if i + 1 < attempts:
            print(f"[bench] backend probe failed (attempt {i + 1}/"
                  f"{attempts}); retrying in {backoff_s}s", file=sys.stderr)
            sleep(backoff_s)
    return False


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--all", action="store_true",
                   help="also bench the XMem step, DINOv2 extraction, and "
                        "the full per-frame tracking pipeline (stderr "
                        "lines; the JSON contract is unchanged)")
    p.add_argument("--no_probe", action="store_true",
                   help="skip the backend liveness probe (saves ~30s when "
                        "the TPU is known healthy)")
    p.add_argument("--rows_out", default="BENCH_ALL.json",
                   help="path of the structured per-row artifact written "
                        "incrementally during --all")
    args = p.parse_args(argv)
    fallback = not args.no_probe and not _default_backend_alive()
    if fallback:
        print("[bench] WARNING: default JAX backend unresponsive (remote "
              "tunnel down?) — falling back to CPU so a metric row is "
              "still produced; these are NOT TPU numbers", file=sys.stderr)
        import jax

        jax.config.update("jax_platforms", "cpu")
    from d3fields_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    depth, pose, K, feats, mask = _scene()
    # on the CPU fallback, a smaller point count keeps the row cheap
    # (pts/s is size-invariant at these scales)
    tpu_pps = bench_tpu(depth, pose, K, feats, mask,
                        n_pts=131072 if fallback else 1024 * 1024)
    # numerics gate for the path just timed (use_pallas on TPU); on the CPU
    # fallback this still runs (interpret-mode kernels) but certifies less
    parity = parity_check(depth, pose, K, feats, mask,
                          n_pts=65536 if fallback else 262144)
    ref_pps, ref_reps = bench_torch_reference(depth, pose, K, feats, mask)
    import jax

    # the record prints BEFORE the --all extras: a worker crash / tunnel
    # outage during the (30+ min) extra rows must not lose the headline
    # (stderr rows still follow; the stdout contract stays one JSON line)
    headline = {
        "metric": "batch_eval_pts_per_sec",
        "value": round(tpu_pps, 1),
        "unit": "pts/s",
        "vs_baseline": round(tpu_pps / ref_pps, 2),
        # machine-readable fallback markers: degraded=true means the TPU
        # tunnel stayed down through every probe retry and this row is a
        # CPU fallback, NOT a TPU measurement — it can never be mistaken
        # for the record
        "backend": jax.default_backend(),
        "degraded": bool(fallback),
        # the torch-CPU baseline's per-rep seconds (best-of kept): makes
        # the vs_baseline ratio's host-load variance visible in the record
        "baseline_reps_s": [round(t, 3) for t in ref_reps],
        # numerics certificate for the timed path (parity_check above)
        "parity": parity,
    }
    print(json.dumps(headline), flush=True)
    if args.all:
        from d3fields_tpu.utils.profiling import (
            measured_dispatch_floor_ms, measured_matmul_peak_tflops,
        )

        # MFU denominator for every row: the dense-matmul peak this chip
        # DELIVERS through this allocation/tunnel, not the datasheet
        peak = measured_matmul_peak_tflops()
        # the latency floor under every per-frame row: one dispatch +
        # scalar-fetch round trip (~30 ms through the remote tunnel) —
        # a k-dispatch stage near k x this is dispatch-bound by evidence
        floor = measured_dispatch_floor_ms()
        print(f"[bench] measured bf16 matmul peak: {peak:.1f} TFLOP/s; "
              f"dispatch+fetch round-trip floor: {floor:.1f} ms",
              file=sys.stderr)
        rows = {"measured_peak_tflops": round(peak, 1),
                "dispatch_floor_ms": round(floor, 2)}
        # each stage writes the artifact incrementally: a crash/outage in
        # a later row keeps every earlier row on disk
        for fn in (lambda: bench_xmem(peak=peak),
                   lambda: bench_dinov2(peak=peak),
                   lambda: bench_pipeline(peak=peak),
                   bench_train,
                   lambda: bench_grounded_sam(peak=peak)):
            rows.update(fn() or {})
            write_rows_artifact(headline, rows, args.rows_out)


if __name__ == "__main__":
    main()
