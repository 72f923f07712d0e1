"""XMem training entry point (reference ``XMem/train.py``).

The reference launches NCCL DDP processes; here one process lays the batch
over a ``dp`` mesh axis (multi-chip via ICI; the virtual CPU mesh for dry
runs) and XLA all-reduces gradients.

  python -m d3fields_tpu.apps.train_xmem --synthetic --steps 5 --batch 2 \\
      --out out/xmem_train
  python -m d3fields_tpu.apps.train_xmem --data_root <videos> --steps 1000 \\
      --dp 8
"""

from __future__ import annotations

import argparse
import os
import time


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", default=None,
                   help="<root>/<video>/{frames,masks}/*.png")
    p.add_argument("--static_root", default=None,
                   help="static X.jpg + X.png pairs -> pseudo-video clips "
                        "(the reference's s0 pretraining stage)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--num_frames", type=int, default=3)
    p.add_argument("--max_jump", type=int, default=5)
    p.add_argument("--max_num_obj", type=int, default=2)
    p.add_argument("--size", type=int, nargs=2, default=(96, 128))
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--dp", type=int, default=0, help="0 = single device")
    p.add_argument("--key_dim", type=int, default=64)
    p.add_argument("--value_dim", type=int, default=512)
    p.add_argument("--hidden_dim", type=int, default=64)
    p.add_argument("--resume", default=None)
    p.add_argument("--save_every", type=int, default=500)
    p.add_argument("--dump_images_every", type=int, default=0,
                   help="save frame|gt|pred training grids every N steps "
                        "(the reference image_saver; 0 = off)")
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--out", default="out/xmem_train")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
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
        DirectoryVideoSource, StaticImageSource, SyntheticVideoSource,
        VideoClipLoader,
    )
    from d3fields_tpu.utils.metrics import Integrator, JsonlLogger

    os.makedirs(args.out, exist_ok=True)
    cfg = XMemConfig(key_dim=args.key_dim, value_dim=args.value_dim,
                     hidden_dim=args.hidden_dim)
    if args.synthetic:
        source = SyntheticVideoSource(hw=tuple(args.size))
    elif args.static_root:
        source = StaticImageSource(root=args.static_root)
    elif args.data_root:
        source = DirectoryVideoSource(args.data_root)
    else:
        raise SystemExit("need --data_root, --static_root or --synthetic")
    loader = VideoClipLoader(
        source, num_frames=args.num_frames, max_jump=args.max_jump,
        max_num_obj=args.max_num_obj, out_hw=tuple(args.size),
    )

    # Build the mesh BEFORE the first JAX computation: available_devices
    # sets --xla_force_host_platform_device_count, which only takes effect
    # if the cpu client has not been created yet (virtual-mesh dry runs).
    mesh = None
    if args.dp > 1:
        from d3fields_tpu.parallel.mesh import make_mesh, replicate

        mesh = make_mesh(dp=args.dp, tp=1)

    opt = TR.make_optimizer(lr=args.lr)
    if args.resume:
        state = TR.load_checkpoint(args.resume, opt)
        print(f"[train_xmem] resumed from {args.resume} at it={int(state.it)}")
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
    for step in range(args.steps):
        batch = loader.batch(args.batch)
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
        if mesh is not None:
            from d3fields_tpu.parallel.mesh import shard_leading

            jbatch = {k: shard_leading(mesh, v) for k, v in jbatch.items()}
        state, out = TR.train_step(state, jbatch, cfg, opt)
        integ.add_dict({"loss": float(out["loss"])})
        if (step + 1) % args.log_every == 0:
            stats = integ.finalize("train", int(state.it))
            integ.reset()
            dt = (time.perf_counter() - t0) / args.log_every
            t0 = time.perf_counter()
            print(f"[train_xmem] it={int(state.it)} loss={stats['loss']:.4f} "
                  f"{dt:.2f}s/step")
        if args.dump_images_every and (step + 1) % args.dump_images_every == 0:
            _dump_train_images(args.out, state, batch, cfg, TR, int(state.it))
        if (step + 1) % args.save_every == 0:
            TR.save_checkpoint(os.path.join(args.out, f"ckpt_{int(state.it)}.pkl"),
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
