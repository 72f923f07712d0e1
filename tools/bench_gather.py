"""On-chip microbenchmark: deformable-attention gather, XLA vs Pallas.

Real 800-scale shapes (reference ``utils/grounded_sam.py:418-424`` rig:
4 levels at strides 8/16/32/64 of an 800x1067 input, nh=8, hd=32, P=4,
Q = S = 17,821). Reports per-variant wall time for ONE (view, layer)
gather plus the implied full-detection gather total (x 24 view-layers),
and numerical parity between the paths.

Run manually on the chip (never concurrently with another TPU process):

    python tools/bench_gather.py [--dtype bfloat16] [--tiles 128 256 512]
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:  # `python tools/bench_gather.py` puts tools/ first
    sys.path.insert(0, REPO)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--tiles", type=int, nargs="*", default=[128, 256, 512])
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--qc", type=int, default=4096,
                   help="query_chunk for the XLA baseline (bench optimum)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from d3fields_tpu.models.groundingdino.gather_pallas import (
        concat_corner_tables, deformable_gather_pallas)
    from d3fields_tpu.models.groundingdino.model import (
        deformable_attention_core)
    from d3fields_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"[gather] backend={jax.default_backend()}", file=sys.stderr)

    # 800x1067 -> swin strides 8/16/32/64 (detector's real level shapes)
    shapes = ((100, 134), (50, 67), (25, 34), (13, 17))
    B, nh, hd, P = 1, 8, 32, 4
    S = sum(h * w for h, w in shapes)
    Q = S
    dt = jnp.dtype(args.dtype)
    rs = np.random.RandomState(0)
    value = jnp.asarray(rs.randn(B, S, nh, hd).astype(np.float32)).astype(dt)
    loc = jnp.asarray(
        rs.uniform(-0.05, 1.05, (B, Q, nh, len(shapes), P, 2))
        .astype(np.float32))
    wgt = jnp.asarray(
        rs.rand(B, Q, nh, len(shapes), P).astype(np.float32))
    wgt = wgt / wgt.sum(axis=(-2, -1), keepdims=True)
    n_rows = B * nh * Q * len(shapes) * P
    print(f"[gather] {n_rows/1e6:.2f}M sampled rows per (view, layer); "
          f"x24 view-layers per 4-view detection", file=sys.stderr)

    def timeit(fn, label):
        out = fn()
        _ = float(jnp.asarray(out).astype(jnp.float32).reshape(-1)[0])
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn()
            _ = float(jnp.asarray(out).astype(jnp.float32).reshape(-1)[0])
            ts.append(time.perf_counter() - t0)
        dt_s = min(ts)
        print(f"[gather] {label}: {dt_s*1e3:7.1f} ms/view-layer "
              f"({dt_s*24*1e3:7.0f} ms/detection, "
              f"{dt_s/n_rows*1e9:6.2f} ns/row)", file=sys.stderr)
        return out, dt_s

    xla = jax.jit(lambda v, l, w: deformable_attention_core(
        v, list(shapes), l, w, args.qc))
    ref, t_xla = timeit(lambda: xla(value, loc, wgt), f"XLA qc={args.qc}")

    tables = jax.jit(lambda v: concat_corner_tables(v, shapes))(value)
    _ = float(tables.astype(jnp.float32).reshape(-1)[0])
    print(f"[gather] concat table: {tables.shape} "
          f"{tables.nbytes/1e6:.1f} MB total "
          f"({tables.nbytes/tables.shape[0]/1e6:.2f} MB/bn slice)",
          file=sys.stderr)

    for T in args.tiles:
        try:
            out, t_pl = timeit(
                lambda T=T: deformable_gather_pallas(
                    tables, shapes, loc, wgt, query_tile=T),
                f"pallas T={T}")
        except Exception as e:
            print(f"[gather] pallas T={T} FAILED: "
                  f"{type(e).__name__}: {str(e)[:300]}", file=sys.stderr)
            continue
        d = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                  - ref.astype(jnp.float32))))
        print(f"[gather]   parity max|d|={d:.3e}  speedup x{t_xla/t_pl:.2f}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
