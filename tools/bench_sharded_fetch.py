"""Measure the host-fetch share of a sharded field eval (VERDICT r4 #6).

At 1M+ query points the compute of ``sharded_batch_eval`` is embarrassingly
sharded over the mesh but the results must land on the host for the
consumers (mesh extraction, visualization, tracking seeds) — that fetch is
the serial term. This tool measures, on the virtual 8-device CPU mesh (or
real chips), the eval dispatch time vs the host-landing time for the plain
f32 path and the ``pack_fetch`` path (bf16 floats + bit-packed bools,
``parallel/sharded.pack_outputs``).

Run: python tools/bench_sharded_fetch.py [--n 262144] [--feat_dim 384]
(the tool pins the CPU platform + 8 virtual devices itself — the
JAX_PLATFORMS env var does NOT override the axon TPU plugin, and a
1M-point eval on the 1-core driver host runs for tens of minutes, so the
default n is 256k: fetch bytes scale linearly, which is the quantity
under test).
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:  # `python tools/bench_sharded_fetch.py` puts tools/ first
    sys.path.insert(0, REPO)

# virtual 8-device CPU mesh, exactly like tests/conftest.py: the flag must
# be in place before the cpu client is first created, and the platform pin
# must be a config update (env alone loses to the axon plugin)
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=262_144)
    p.add_argument("--feat_dim", type=int, default=384)
    p.add_argument("--views", type=int, default=4)
    p.add_argument("--hw", type=int, nargs=2, default=(240, 320))
    p.add_argument("--tile", type=int, default=32768)
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from d3fields_tpu.fields.state import FieldState
    from d3fields_tpu.parallel.mesh import make_mesh
    from d3fields_tpu.parallel.sharded import (sharded_batch_eval,
                                               unpack_outputs)

    ndev = len(jax.devices())
    mesh = make_mesh(dp=ndev, tp=1)
    print(f"[fetch] backend={jax.default_backend()} ndev={ndev} "
          f"n={args.n} feat_dim={args.feat_dim}", file=sys.stderr)

    rs = np.random.RandomState(0)
    V, (H, W) = args.views, args.hw
    depth = jnp.asarray(rs.rand(V, H, W).astype(np.float32) + 0.5)
    pose = jnp.asarray(
        np.tile(np.eye(4, dtype=np.float32)[None, :3], (V, 1, 1)))
    K = jnp.asarray(
        np.tile(np.array([[200.0, 0, W / 2], [0, 200.0, H / 2], [0, 0, 1]],
                         np.float32)[None], (V, 1, 1)))
    feats = jnp.asarray(rs.rand(V, H, W, args.feat_dim).astype(np.float32))
    st = FieldState(depth=depth, pose=pose, K=K, dino_feats=feats)
    pts = rs.uniform(-0.4, 0.4, (args.n, 3)).astype(np.float32)

    def land_plain():
        t0 = time.perf_counter()
        out = sharded_batch_eval(mesh, st, pts, ("dino_feats",),
                                 tile=args.tile)
        jax.block_until_ready(out)
        t_eval = time.perf_counter() - t0
        t0 = time.perf_counter()
        host = {k: np.asarray(v) for k, v in out.items()}
        t_fetch = time.perf_counter() - t0
        nbytes = sum(v.nbytes for v in host.values())
        return host, t_eval, t_fetch, nbytes

    def land_packed():
        t0 = time.perf_counter()
        packed, n = sharded_batch_eval(mesh, st, pts, ("dino_feats",),
                                       tile=args.tile, pack_fetch=True)
        jax.block_until_ready(packed)
        t_eval = time.perf_counter() - t0
        t0 = time.perf_counter()
        host = unpack_outputs(packed, n)
        t_fetch = time.perf_counter() - t0
        nbytes = sum(int(np.prod(v.shape)) * v.dtype.itemsize
                     for v in packed.values())
        return host, t_eval, t_fetch, nbytes

    # warm both executables
    h0 = land_plain()[0]
    h1 = land_packed()[0]
    d = np.abs(h0["dist"][: args.n] - h1["dist"]).max()
    print(f"[fetch] packed-vs-plain dist max|d|={d:.2e}", file=sys.stderr)

    for name, fn in (("plain f32", land_plain), ("pack_fetch", land_packed)):
        te, tf, nb = [], [], 0
        for _ in range(args.reps):
            _, t_eval, t_fetch, nb = fn()
            te.append(t_eval)
            tf.append(t_fetch)
        print(f"[fetch] {name:10s}: eval {min(te)*1e3:8.1f} ms, "
              f"land-on-host {min(tf)*1e3:8.1f} ms "
              f"({nb/1e6:.1f} MB crossing; median land "
              f"{sorted(tf)[len(tf)//2]*1e3:.1f} ms)", file=sys.stderr)


if __name__ == "__main__":
    main()
