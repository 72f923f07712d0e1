"""Golden end-to-end regression tests: app outputs compared BY VALUE.

The smoke tests in test_apps.py assert sanity (files exist, shapes, coarse
correlations); these pin the actual numbers against committed fixtures so a
silent numeric regression in any layer the apps traverse (geometry ->
fusion -> field eval -> marching tetrahedra -> PCA / rigid tracking) fails
loudly. This is the executable stand-in for byte-comparing against the
reference's bundled scenes (BASELINE.json configs 1-4), which are
unreachable offline.

Tolerances document the accepted cross-version drift budget: the suite runs
on the pinned CPU backend (tests/conftest.py), where reruns are bit-exact;
the atol headroom absorbs XLA/compiler upgrades reordering float reductions.
After an INTENTIONAL numeric change, regenerate with

    python tools/gen_golden.py

and commit the refreshed fixtures with the change (see that file's header).
"""

import os
import pickle

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_vis_repr_golden(tmp_path):
    from tools.gen_golden import VIS_REPR_ARGS

    from d3fields_tpu.apps.vis_repr import main

    dump = str(tmp_path / "arrays.npz")
    assert main(VIS_REPR_ARGS + ["--out", str(tmp_path / "out"),
                                 "--dump_arrays", dump]) == 0
    got = np.load(dump)
    want = np.load(os.path.join(GOLDEN, "vis_repr.npz"))

    # signed-distance field on the dense grid: the fusion core's output
    np.testing.assert_allclose(got["dist"], want["dist"], atol=1e-4,
                               err_msg="grid dist field drifted")
    # mesh topology must be identical (a dist drift < 1e-4 can only flip a
    # marching-tetrahedra cell if a value sits within 1e-4 of the iso
    # level; the fixture scene has no such knife-edge cell)
    assert got["triangles"].shape == want["triangles"].shape
    np.testing.assert_array_equal(got["triangles"], want["triangles"],
                                  err_msg="mesh topology changed")
    np.testing.assert_allclose(got["vertices"], want["vertices"], atol=1e-3,
                               err_msg="mesh vertex positions drifted >1mm")
    # per-vertex field samples: instance mask, color, PCA'd descriptors
    np.testing.assert_allclose(got["mask"], want["mask"], atol=1e-4)
    np.testing.assert_allclose(got["color"], want["color"], atol=1e-3)
    np.testing.assert_allclose(got["desc_pca"], want["desc_pca"], atol=1e-3,
                               err_msg="descriptor field / PCA drifted")


@pytest.mark.slow
def test_vis_tracking_golden(tmp_path):
    from tools.gen_golden import VIS_TRACKING_ARGS

    from d3fields_tpu.apps.vis_tracking import main

    out = str(tmp_path / "track")
    assert main(VIS_TRACKING_ARGS + ["--out", out]) == 0
    frames = []
    for t in range(3):
        with open(os.path.join(out, f"match_pts_{t:06d}.pkl"), "rb") as f:
            frames.append(np.stack(pickle.load(f)).astype(np.float32))
    got = np.stack(frames)
    with open(os.path.join(out, "src_feats.pkl"), "rb") as f:
        info = pickle.load(f)
    src_pts = np.stack(
        [info[k]["src_pts"] for k in sorted(info)]).astype(np.float32)

    want = np.load(os.path.join(GOLDEN, "vis_tracking.npz"))
    # FPS keypoint selection is discrete: must be exactly reproducible
    np.testing.assert_allclose(src_pts, want["src_pts"], atol=1e-6,
                               err_msg="keypoint selection changed")
    # 60 Adam iterations compound reduction-order drift; 2 mm over a
    # ~0.7 m workspace still pins the trajectory to 4 significant digits
    np.testing.assert_allclose(got, want["match_pts"], atol=2e-3,
                               err_msg="tracked trajectories drifted >2mm")


def test_vis_tracking_golden_fast(tmp_path):
    """Fast-tier trajectory golden (2 frames, 8 keypoints, 10 Adam iters):
    guards FPS keypoint selection and the tracking-scan numerics on every
    default run — the full-size golden above stays slow-tier. Verified:
    a seeded relative 1e-3 perturbation of the feat term moves the pinned
    loss history by 2.2e-3 (220x the tolerance) -> caught."""
    from tools.gen_golden import VIS_TRACKING_FAST_ARGS

    from d3fields_tpu.apps.vis_tracking import main

    out = str(tmp_path / "track")
    assert main(VIS_TRACKING_FAST_ARGS + ["--out", out]) == 0
    frames = []
    for t in range(2):
        with open(os.path.join(out, f"match_pts_{t:06d}.pkl"), "rb") as f:
            frames.append(np.stack(pickle.load(f)).astype(np.float32))
    got = np.stack(frames)
    with open(os.path.join(out, "src_feats.pkl"), "rb") as f:
        info = pickle.load(f)
    src_pts = np.stack(
        [info[k]["src_pts"] for k in sorted(info)]).astype(np.float32)

    losses = []
    for t in range(2):
        with open(os.path.join(out, f"loss_hist_{t:06d}.pkl"), "rb") as f:
            losses.append(np.asarray(pickle.load(f), np.float32))

    want = np.load(os.path.join(GOLDEN, "vis_tracking_fast.npz"))
    np.testing.assert_allclose(src_pts, want["src_pts"], atol=1e-6,
                               err_msg="keypoint selection changed")
    # 10 Adam iterations: tighter than the 60-iter slow golden (less
    # compounded reduction-order drift), still > float noise
    np.testing.assert_allclose(got, want["match_pts"], atol=5e-4,
                               err_msg="tracked trajectories drifted")
    # the per-iteration loss terms are the numerics-sensitive guard: a
    # 1e-3-level change anywhere in the loss pipeline (feature fusion,
    # field eval, weighting) lands here at its own magnitude, whereas
    # Adam's trajectory is nearly invariant to loss scaling (verified:
    # a +1e-3 loss perturbation moves match_pts by only 1e-7)
    np.testing.assert_allclose(np.stack(losses), want["loss_history"],
                               atol=1e-5,
                               err_msg="tracking loss numerics drifted")
