"""Test harness: run everything on a virtual 8-device CPU mesh.

Env vars must be set before the first jax import, so this file does it at
collection time. Torch (CPU) serves as the numerical oracle for
grid_sample/model parity tests.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

# The environment pins JAX_PLATFORMS=axon (TPU tunnel); tests must run on the
# virtual 8-device CPU mesh, and the env var alone does not win over the
# plugin, so force it through the config as well.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy oracle/end-to-end tests (~20 of them, ~80% of suite "
        "time); deselect with -m 'not slow' for a <5 min dev loop",
    )


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules.

    After ~190 tests' worth of XLA CPU compilations in one process, the
    compiler segfaults inside ``backend_compile_and_load`` on the next
    large module (reproducible at tests/test_xmem.py::
    test_full_video_parity_object_enters_midvideo when the FULL suite
    runs in one process; every <=80-test subset passes, and the test
    passes alone). Clearing jit caches at module boundaries bounds the
    accumulated compiler state. Costs only recompiles across module
    boundaries, which tests don't share anyway.
    """
    yield
    import gc

    jax.clear_caches()
    gc.collect()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def synthetic_scene(
    num_views=4, H=48, W=64, feat_dim=32, num_inst=3, seed=0, spheres=None,
    ground=False, focal=80.0,
):
    """A tiny calibrated multi-camera scene looking at analytic spheres.

    Cameras sit on a circle looking inward; depth maps are rendered
    analytically (nearest-hit over all spheres). ``spheres`` is a list of
    (center (3,), radius); default is one sphere of radius 0.12 m at
    (0, 0, 0.06). Also returns per-view per-sphere hit masks under
    'sphere_masks' (V, S, H, W). Feature/mask maps are random but
    deterministic.
    """
    rs = np.random.RandomState(seed)
    if spheres is None:
        spheres = [(np.array([0.0, 0.0, 0.06]), 0.12)]
    spheres = [(np.asarray(c, np.float64), float(r)) for c, r in spheres]
    look_at = np.mean([c for c, _ in spheres], axis=0)

    fx = fy = float(focal)
    cx, cy = W / 2.0, H / 2.0
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], dtype=np.float32)
    Ks = np.tile(K[None], (num_views, 1, 1))

    poses = []
    depths = []
    sphere_masks = []
    for v in range(num_views):
        ang = 2 * np.pi * v / num_views
        cam_pos = look_at + np.array([0.5 * np.cos(ang), 0.5 * np.sin(ang), 0.35])
        # Build look-at world->cam.
        fwd = look_at - cam_pos
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd], axis=0)  # world->cam rotation
        t = -R @ cam_pos
        pose = np.concatenate([R, t[:, None]], axis=1).astype(np.float32)
        poses.append(pose)

        # Analytic nearest-hit sphere depth render.
        ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        dirs = np.stack([(xs - cx) / fx, (ys - cy) / fy, np.ones_like(xs)], axis=-1)
        dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
        dirs_w = dirs @ R  # (H, W, 3) world-frame directions
        s_best = np.full((H, W), np.inf)
        which = np.full((H, W), -1)
        for si, (center, radius) in enumerate(spheres):
            oc = cam_pos - center
            b = 2 * (dirs_w @ oc)
            c = oc @ oc - radius**2
            disc = b**2 - 4 * c
            hit = disc > 0
            s = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0))) / 2, np.inf)
            s = np.where(s > 0, s, np.inf)
            closer = s < s_best
            s_best = np.where(closer, s, s_best)
            which = np.where(closer, si, which)
        if ground:
            # ground plane z=0 behind the spheres (the 'table' every real
            # scene has; gives the background mask observable depth)
            dz = dirs_w[..., 2]
            s_plane = np.where(dz < -1e-6, -cam_pos[2] / dz, np.inf)
            closer = s_plane < s_best
            s_best = np.where(closer, s_plane, s_best)
            which = np.where(closer, -1, which)
        hit_any = np.isfinite(s_best)
        pts = cam_pos + np.where(hit_any, s_best, 0.0)[..., None] * dirs_w
        z = (pts - cam_pos) @ R[2]
        depth = np.where(hit_any, z, 0.0).astype(np.float32)
        depths.append(depth)
        sphere_masks.append(
            np.stack([(which == si) & hit_any for si in range(len(spheres))])
        )

    depth = np.stack(depths, axis=0)
    ph, pw = H // 10, W // 10
    feats = rs.randn(num_views, ph, pw, feat_dim).astype(np.float32)
    mask_logits = rs.rand(num_views, H, W, num_inst).astype(np.float32)
    mask = (mask_logits == mask_logits.max(axis=-1, keepdims=True)).astype(np.float32)
    color = rs.randint(0, 255, size=(num_views, H, W, 3), dtype=np.uint8)
    return {
        "color": color,
        "depth": depth,
        "pose": np.stack(poses, axis=0),
        "K": Ks,
        "dino_feats": feats,
        "mask": mask,
        "sphere_masks": np.stack(sphere_masks, axis=0),
    }


@pytest.fixture(scope="session")
def scene():
    return synthetic_scene()
