"""Regenerate the golden end-to-end regression fixtures in tests/golden/.

The fixtures pin the NUMERIC outputs of the two headline apps on the same
pinned CPU backend the test suite uses (tests/conftest.py), so silent
numeric drift from future refactors is caught by value, not just by smoke
(the executable stand-in for the reference's bundled-scene byte
comparability, BASELINE.json configs 1-4 — the bundled scenes themselves
are unreachable offline).

Run from the repo root after an INTENTIONAL numeric change, eyeball the
diff the failing test printed first, then:

    python tools/gen_golden.py

and commit the refreshed .npz files together with the change that moved
the numbers, explaining the move in the commit message.
"""

import os
import pickle
import sys
import tempfile

import numpy as np


def _pin_test_backend():
    """Identical backend pinning to tests/conftest.py — goldens are only
    meaningful on the environment the suite replays them on. Called from
    the script entry point only; tests import this module for the shared
    arg lists and are already pinned by their conftest."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ.setdefault("JAX_ENABLE_X64", "0")
    os.environ["D3F_COMPILE_CACHE"] = "0"

    import jax

    jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, "tests", "golden")
if REPO not in sys.path:  # `python tools/gen_golden.py` puts tools/ first
    sys.path.insert(0, REPO)

# one source of truth for the app invocations — the test imports these
VIS_REPR_ARGS = ["--synthetic", "--step", "0.015"]
VIS_TRACKING_ARGS = ["--synthetic", "--frames", "3",
                     "--num_kypts", "20", "--iters", "60"]
# fast-tier variant: small enough to run by default (the full golden above
# is slow-tier), still covering FPS keypoint selection + the Adam tracking
# scan so everyday changes can't silently drift the trajectory numerics
VIS_TRACKING_FAST_ARGS = ["--synthetic", "--frames", "2",
                          "--num_kypts", "8", "--iters", "10"]


def gen_vis_repr(out_npz):
    from d3fields_tpu.apps.vis_repr import main

    with tempfile.TemporaryDirectory() as td:
        assert main(VIS_REPR_ARGS + ["--out", td,
                                     "--dump_arrays", out_npz]) == 0
    d = np.load(out_npz)
    print(f"[golden] vis_repr: dist {d['dist'].shape}, "
          f"{d['vertices'].shape[0]} verts, {d['triangles'].shape[0]} tris "
          f"-> {out_npz}")


def gen_vis_tracking(out_npz, args=VIS_TRACKING_ARGS):
    from d3fields_tpu.apps.vis_tracking import main

    nframes = int(args[args.index("--frames") + 1])
    with tempfile.TemporaryDirectory() as td:
        assert main(args + ["--out", td]) == 0
        frames, losses = [], []
        for t in range(nframes):
            with open(os.path.join(td, f"match_pts_{t:06d}.pkl"), "rb") as f:
                pts = pickle.load(f)
            frames.append(np.stack(pts).astype(np.float32))
            with open(os.path.join(td, f"loss_hist_{t:06d}.pkl"), "rb") as f:
                losses.append(np.asarray(pickle.load(f), np.float32))
        with open(os.path.join(td, "src_feats.pkl"), "rb") as f:
            info = pickle.load(f)
    src_pts = np.stack(
        [info[k]["src_pts"] for k in sorted(info)]).astype(np.float32)
    np.savez_compressed(out_npz,
                        match_pts=np.stack(frames),  # (T, inst, K, 3)
                        src_pts=src_pts,
                        # (T, iters, 4): per-iteration feat/dist/reg/oob —
                        # the numerics-sensitive record (Adam's argmin is
                        # scale-invariant; this is not)
                        loss_history=np.stack(losses))
    print(f"[golden] vis_tracking: match_pts {np.stack(frames).shape} "
          f"-> {out_npz}")


def main(argv=None):
    _pin_test_backend()
    os.makedirs(GOLDEN, exist_ok=True)
    gen_vis_repr(os.path.join(GOLDEN, "vis_repr.npz"))
    gen_vis_tracking(os.path.join(GOLDEN, "vis_tracking.npz"))
    gen_vis_tracking(os.path.join(GOLDEN, "vis_tracking_fast.npz"),
                     VIS_TRACKING_FAST_ARGS)
    return 0


if __name__ == "__main__":
    sys.exit(main())
