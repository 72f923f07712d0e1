"""XMem training entry point (reference ``XMem/train.py``).

The reference launches NCCL DDP processes; here one process lays the batch
over a ``dp`` mesh axis (multi-chip via ICI; the virtual CPU mesh for dry
runs) and XLA all-reduces gradients.

  python -m d3fields_tpu.apps.train_xmem --synthetic --steps 5 --batch 2 \\
      --out out/xmem_train
  python -m d3fields_tpu.apps.train_xmem --data_root <videos> --steps 1000 \\
      --dp 8
  # the reference's staged curriculum (s0 -> s3):
  python -m d3fields_tpu.apps.train_xmem --stage 0 --static_root <imgs>
  python -m d3fields_tpu.apps.train_xmem --stage 3 --davis_root <DAVIS> \\
      --yv_root <YouTubeVOS> --load_network out/xmem_train/ckpt_final.pkl

Stage presets (reference ``util/configuration.py:35-79``) fill batch size,
iteration budget, LR schedule, clip length, num_ref_frames and the warm-up
window; the temporal-skip curriculum and the low-augmentation finetune
tail mirror ``train.py:155-236``.
"""

from __future__ import annotations

import argparse
import os
import time


# Stage hyperparameter presets — the reference's staged Configuration
# defaults (XMem/util/configuration.py:35-79; single_object for s0 from
# train.py:61). "steps" is the iteration budget; "lr_steps" the MultiStep
# LR decay points; "finetune" the low-augmentation tail.
STAGE_PRESETS = {
    0: dict(batch=16, steps=150_000, finetune=0, lr_steps=(), lr=1e-5,
            num_ref_frames=2, num_frames=3, start_warm=20_000,
            end_warm=70_000, max_num_obj=1),
    1: dict(batch=8, steps=250_000, finetune=0, lr_steps=(200_000,), lr=1e-5,
            num_ref_frames=3, num_frames=8, start_warm=20_000,
            end_warm=70_000, max_num_obj=3),
    2: dict(batch=8, steps=150_000, finetune=10_000, lr_steps=(120_000,),
            lr=1e-5, num_ref_frames=3, num_frames=8, start_warm=20_000,
            end_warm=70_000, max_num_obj=3),
    3: dict(batch=8, steps=100_000, finetune=10_000, lr_steps=(80_000,),
            lr=1e-5, num_ref_frames=3, num_frames=8, start_warm=20_000,
            end_warm=70_000, max_num_obj=3),
}

# free-form (no --stage) defaults: tiny smoke-run scale
_FREEFORM = dict(batch=2, steps=100, finetune=0, lr_steps=(), lr=1e-5,
                 num_ref_frames=0, num_frames=3, start_warm=20_000,
                 end_warm=70_000, max_num_obj=2)


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--stage", type=int, default=None, choices=(0, 1, 2, 3),
                   help="reference curriculum stage: 0 static pretraining, "
                        "1 BL30K, 2/3 DAVIS+YouTubeVOS; presets fill any "
                        "hyperparameter not given explicitly")
    p.add_argument("--data_root", default=None,
                   help="single video root (generic <video>/{frames,masks}, "
                        "DAVIS or YouTubeVOS checkout layout)")
    p.add_argument("--davis_root", default=None,
                   help="DAVIS checkout for the stage-2/3 mixture "
                        "(sampled with 5x weight, reference train.py:132)")
    p.add_argument("--yv_root", default=None,
                   help="YouTubeVOS checkout for the stage-2/3 mixture "
                        "(max_skip // 5: annotations every five frames)")
    p.add_argument("--static_root", default=None,
                   help="static X.jpg + X.png pairs -> pseudo-video clips "
                        "(the reference's s0 pretraining stage)")
    p.add_argument("--subset", default="train",
                   help="ImageSets split for --davis_root/--yv_root "
                        "(reference load_sub_davis/load_sub_yv); checkouts "
                        "without a split file use all videos")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--finetune", type=int, default=None,
                   help="extra low-augmentation steps after --steps "
                        "(reference train.py:232-236)")
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--num_frames", type=int, default=None)
    p.add_argument("--num_ref_frames", type=int, default=None,
                   help="memory frames per training query (0 = all)")
    p.add_argument("--max_jump", type=int, default=5)
    p.add_argument("--max_num_obj", type=int, default=None)
    p.add_argument("--size", type=int, nargs=2, default=(96, 128))
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--lr_steps", type=int, nargs="*", default=None,
                   help="MultiStep LR decay iterations")
    p.add_argument("--start_warm", type=int, default=None)
    p.add_argument("--end_warm", type=int, default=None)
    p.add_argument("--dp", type=int, default=0, help="0 = single device")
    p.add_argument("--key_dim", type=int, default=64)
    p.add_argument("--value_dim", type=int, default=512)
    p.add_argument("--hidden_dim", type=int, default=64)
    p.add_argument("--resume", default=None)
    p.add_argument("--load_network", default=None,
                   help="init params from this checkpoint but start the "
                        "stage fresh (optimizer + iteration reset) — the "
                        "reference's previous-stage handoff, train.py:100-104")
    p.add_argument("--save_every", type=int, default=500)
    p.add_argument("--dump_images_every", type=int, default=0,
                   help="save frame|gt|pred training grids every N steps "
                        "(the reference image_saver; 0 = off)")
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--out", default="out/xmem_train")
    return p


def resolve_stage_args(args):
    """Fill every None hyperparameter from the stage preset (or the
    free-form defaults when --stage is absent); explicit flags win."""
    preset = STAGE_PRESETS[args.stage] if args.stage is not None else _FREEFORM
    for k, v in preset.items():
        if getattr(args, k) is None:
            setattr(args, k, v)
    args.lr_steps = tuple(args.lr_steps)
    return args


def main(argv=None):
    args = resolve_stage_args(build_parser().parse_args(argv))
    from d3fields_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    # Multi-host runtime init (the reference's init_process_group,
    # XMem/train.py:25) MUST precede the first JAX computation —
    # jax.distributed.initialize refuses once any backend is live.
    if args.dp > 1:
        from d3fields_tpu.parallel.mesh import initialize_distributed

        if initialize_distributed():
            import jax as _jax

            print(f"[train_xmem] multi-host: process "
                  f"{_jax.process_index()}/{_jax.process_count()}")
    import jax
    import jax.numpy as jnp

    from d3fields_tpu.config import XMemConfig
    from d3fields_tpu.models.xmem import network as N
    from d3fields_tpu.models.xmem import trainer as TR
    from d3fields_tpu.models.xmem.data import (
        DirectoryVideoSource, MixedClipLoader, StaticImageSource,
        SyntheticVideoSource, VideoClipLoader, max_skip_schedule, skip_at,
    )
    from d3fields_tpu.utils.metrics import Integrator, JsonlLogger

    os.makedirs(args.out, exist_ok=True)
    cfg = XMemConfig(key_dim=args.key_dim, value_dim=args.value_dim,
                     hidden_dim=args.hidden_dim)

    def make_loader(source, seed=0):
        return VideoClipLoader(
            source, num_frames=args.num_frames, max_jump=args.max_jump,
            max_num_obj=args.max_num_obj, out_hw=tuple(args.size), seed=seed,
        )

    scheduled = False  # temporal-skip curriculum applies to video data only
    if args.synthetic:
        loader = make_loader(SyntheticVideoSource(hw=tuple(args.size)))
    elif args.static_root:
        loader = make_loader(StaticImageSource(root=args.static_root))
    elif args.davis_root or args.yv_root:
        # the reference's ConcatDataset([davis]*5 + [yv]) mixture
        # (train.py:125-138); either root alone degrades to that dataset
        loaders, weights, divisors = [], [], []
        if args.davis_root:
            # subset="train" guards a trainval checkout against training
            # on the val videos (reference load_sub_davis); checkouts
            # without ImageSets keep everything (with a warning)
            src = DirectoryVideoSource(args.davis_root, subset=args.subset)
            print(f"[train_xmem] DAVIS: {len(src.videos)} videos")
            loaders.append(make_loader(src))
            weights.append(5.0 * len(src.videos))
            divisors.append(1)
        if args.yv_root:
            src = DirectoryVideoSource(args.yv_root, subset=args.subset)
            print(f"[train_xmem] YouTubeVOS: {len(src.videos)} videos")
            loaders.append(make_loader(src, seed=1))
            weights.append(float(len(src.videos)))
            divisors.append(5)
        loader = MixedClipLoader(loaders, weights, jump_divisors=divisors)
        scheduled = True
    elif args.data_root:
        loader = make_loader(DirectoryVideoSource(args.data_root))
        scheduled = True
    else:
        raise SystemExit("need --data_root, --davis_root/--yv_root, "
                         "--static_root or --synthetic")
    schedule = (max_skip_schedule(args.stage, args.steps)
                if scheduled and args.stage not in (None, 0) else [])

    # Build the mesh BEFORE the first JAX computation: available_devices
    # sets --xla_force_host_platform_device_count, which only takes effect
    # if the cpu client has not been created yet (virtual-mesh dry runs).
    mesh = None
    if args.dp > 1:
        from d3fields_tpu.parallel.mesh import make_mesh, replicate

        mesh = make_mesh(dp=args.dp, tp=1)

    opt = TR.make_optimizer(lr=args.lr, steps=args.lr_steps)
    if args.resume:
        state = TR.load_checkpoint(args.resume, opt)
        print(f"[train_xmem] resumed from {args.resume} at it={int(state.it)}")
    elif args.load_network:
        # previous-stage handoff: weights only, fresh optimizer + it
        # (reference train.py:100-104 "loading network from the previous
        # stage")
        prev = TR.load_checkpoint(args.load_network, opt)
        state = TR.init_train_state(prev.params, opt)
        print(f"[train_xmem] network initialized from {args.load_network}")
    else:
        params = N.init_params(jax.random.PRNGKey(0), cfg)
        state = TR.init_train_state(params, opt)

    if mesh is not None:
        state = TR.TrainState(
            replicate(mesh, state.params),
            replicate(mesh, state.opt_state), state.it,
        )

    logger = JsonlLogger(os.path.join(args.out, "train.jsonl"), "xmem")
    integ = Integrator(logger)
    t0 = time.perf_counter()
    total_iters = args.steps + args.finetune
    cur_skip = args.max_jump
    finetuning = False
    step = 0
    # Input-pipeline overlap: train_step advances state.it by exactly 1
    # (trainer.py TrainState it+1), so track the iteration host-side and
    # defer the loss fetch to log boundaries — the old per-step
    # int(state.it)/float(loss) syncs made the host wait out every device
    # step before preparing the next batch; now batch t+1 loads and
    # uploads while step t computes (JAX async dispatch).
    it = int(state.it)  # one sync at entry (resume-aware)
    pending_losses = []
    while it < total_iters:
        if schedule:
            want = skip_at(schedule, it, initial=args.max_jump)
            if want != cur_skip:
                cur_skip = want
                loader.set_max_jump(cur_skip)
                print(f"[train_xmem] it={it} max_skip -> {cur_skip}")
        if args.finetune > 0 and not finetuning and it >= args.steps:
            # low-augmentation tail to train the sensory memory
            # (reference train.py:232-236)
            finetuning = True
            loader.set_finetune(True)
            print(f"[train_xmem] it={it} entering finetune phase")
        batch = loader.batch(args.batch)
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
        if mesh is not None:
            from d3fields_tpu.parallel.mesh import shard_leading

            jbatch = {k: shard_leading(mesh, v) for k, v in jbatch.items()}
        # donating variant: params/opt state alias in place across steps
        state, out = TR.train_step_donated(
            state, jbatch, cfg, opt, num_ref_frames=args.num_ref_frames,
            start_warm=args.start_warm, end_warm=args.end_warm,
        )
        step += 1
        it += 1
        pending_losses.append(out["loss"])  # device scalar, fetched later
        if len(pending_losses) > 4:
            # backpressure: block on the OLDEST loss so at most ~4 staged
            # batches are ever live on device (a large --log_every must
            # not translate into unbounded run-ahead -> HBM growth)
            integ.add_dict({"loss": float(pending_losses.pop(0))})
        if step % args.log_every == 0:
            for loss in pending_losses:
                integ.add_dict({"loss": float(loss)})
            pending_losses.clear()
            stats = integ.finalize("train", it)
            integ.reset()
            dt = (time.perf_counter() - t0) / args.log_every
            t0 = time.perf_counter()
            print(f"[train_xmem] it={it} loss={stats['loss']:.4f} "
                  f"{dt:.2f}s/step")
        if args.dump_images_every and step % args.dump_images_every == 0:
            _dump_train_images(args.out, state, batch, cfg, TR, it)
        if step % args.save_every == 0:
            TR.save_checkpoint(os.path.join(args.out, f"ckpt_{it}.pkl"),
                               state)
    TR.save_checkpoint(os.path.join(args.out, "ckpt_final.pkl"), state)
    logger.close()
    print(f"[train_xmem] done; final checkpoint in {args.out}")
    return 0


_DUMP_FWD = {}


def _dump_train_images(out_dir, state, batch, cfg, TR, it):
    """frame | GT | prediction grid for batch sample 0 (the reference's
    periodic image dumps, ``XMem/util/image_saver.py``)."""
    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from d3fields_tpu.models.common import IMAGENET_MEAN, IMAGENET_STD
    from d3fields_tpu.utils.visualization import davis_palette

    one = {k: jnp.asarray(np.asarray(v)[0]) for k, v in batch.items()}
    if cfg not in _DUMP_FWD:
        # jit once: eager sequence_loss would dispatch the whole rollout
        # op-by-op on every dump
        _DUMP_FWD[cfg] = jax.jit(
            lambda p, b, i: TR.sequence_loss(
                p, b, i, cfg, None, return_probs=True
            )[1]["last_prob"]
        )
    last_prob = _DUMP_FWD[cfg](state.params, one, state.it)
    pal = davis_palette()
    frame = np.asarray(one["frames"][-1])
    frame = np.clip((frame * IMAGENET_STD + IMAGENET_MEAN) * 255, 0, 255)
    gt = pal[np.asarray(one["cls_gt"][-1], np.int64)]
    pred = pal[np.asarray(jnp.argmax(last_prob, axis=0), np.int64)]
    grid = np.concatenate([frame, gt, pred], axis=1).astype(np.uint8)
    os.makedirs(os.path.join(out_dir, "images"), exist_ok=True)
    cv2.imwrite(os.path.join(out_dir, "images", f"{it:07d}.png"),
                grid[..., ::-1])


if __name__ == "__main__":
    raise SystemExit(main())
