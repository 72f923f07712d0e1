"""Mesh subsystem tests: native marching tetrahedra, smoothing, colorizers."""

import numpy as np
import pytest

import jax.numpy as jnp

from d3fields_tpu.config import Boundaries
from d3fields_tpu.fields.geometry import create_grid
from d3fields_tpu.mesh import _native, extract, smoothing
from d3fields_tpu.ops.pca import PCAParams


def sphere_sdf_volume(n=40, radius=0.3):
    xs = np.linspace(-1, 1, n, dtype=np.float32)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    return np.sqrt(X**2 + Y**2 + Z**2) - radius, xs


def test_marching_tetrahedra_sphere():
    vol, xs = sphere_sdf_volume()
    verts, tris = _native.marching_tetrahedra(vol, 0.0)
    assert verts.shape[0] > 100 and tris.shape[0] > 100
    assert tris.max() < verts.shape[0] and tris.min() >= 0
    # vertices lie on the sphere of radius 0.3 (grid coords -> world)
    step = xs[1] - xs[0]
    world = verts * step - 1.0
    r = np.linalg.norm(world, axis=1)
    assert np.abs(r - 0.3).max() < 1.5 * step

    # watertight: every edge shared by exactly two triangles
    edges = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert np.all(counts == 2)

    # Euler characteristic of a sphere: V - E + F = 2
    ne = np.unique(np.sort(edges, axis=1), axis=0).shape[0]
    assert verts.shape[0] - ne + tris.shape[0] == 2


def test_marching_tetrahedra_empty():
    vol = np.ones((8, 8, 8), np.float32)
    verts, tris = _native.marching_tetrahedra(vol, 0.0)
    assert verts.shape == (0, 3) and tris.shape == (0, 3)


def test_smooth_volume_preserves_interface():
    vol, xs = sphere_sdf_volume(n=32)
    binary = (vol < 0).astype(np.float32)  # 1 inside sphere
    phi = np.asarray(smoothing.smooth_volume(jnp.asarray(binary), iters=15))
    assert np.all(phi[binary > 0.5] > 0)
    assert np.all(phi[binary <= 0.5] < 0)
    # smoothed field must be smoother than the binary step
    assert np.abs(np.diff(phi, axis=0)).max() < 1.0


def test_extract_mesh_pipeline_dist_contract():
    """End-to-end: reference-style dist volume (clamped ±mu, 1e3 invalid)."""
    b = Boundaries(-0.3, 0.3, -0.3, 0.3, -0.3, 0.3)
    grid, shape = create_grid(b, 0.02)
    r = np.linalg.norm(grid, axis=1)
    mu = 0.02
    dist = np.clip(r - 0.15, -mu, mu).astype(np.float32)
    dist[r < 0.05] = 1e3  # unobserved core, as eval() marks it
    verts, tris = extract.extract_mesh(grid, dist, shape, smooth=True, smooth_iters=10)
    assert verts.shape[0] > 50
    # surface encloses the unobserved core: vertices around r≈0.05..0.15 band
    vr = np.linalg.norm(verts, axis=1)
    assert vr.max() < 0.2


def test_extract_mesh_unsmoothed_sdf():
    b = Boundaries(-0.3, 0.3, -0.3, 0.3, -0.3, 0.3)
    grid, shape = create_grid(b, 0.02)
    dist = (np.linalg.norm(grid, axis=1) - 0.15).astype(np.float32)
    verts, tris = extract.extract_mesh(grid, dist, shape, smooth=False)
    vr = np.linalg.norm(verts, axis=1)
    # quantized to grid: within one voxel of the analytic sphere
    assert np.abs(vr - 0.15).max() < 0.045


def test_colorizers_and_export(tmp_path, rng):
    vol, _ = sphere_sdf_volume(n=24)
    verts, tris = _native.marching_tetrahedra(vol, 0.0)
    n = verts.shape[0]
    masks = rng.random((n, 3)).astype(np.float32)
    feats = rng.standard_normal((n, 32)).astype(np.float32)
    pca = PCAParams.fit(rng.standard_normal((100, 32)), 3)

    mm = extract.create_mask_meshes(verts, tris, masks)
    assert len(mm) == 3 and mm[0].vertex_colors.shape == (n, 4)
    im = extract.create_instance_mask_mesh(verts, tris, masks)
    dm = extract.create_descriptor_mesh(verts, tris, feats, masks, pca)
    cmesh = extract.create_color_mesh(verts, tris, rng.random((n, 3)))
    for i, m in enumerate([im, dm, cmesh]):
        p = str(tmp_path / f"m{i}.ply")
        m.export_ply(p)
        assert open(p, "rb").read(3) == b"ply"
    dm.export_obj(str(tmp_path / "m.obj"))


def _grid(n=48):
    xs = np.linspace(-1, 1, n, dtype=np.float32)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    return np.stack([X, Y, Z], -1).reshape(-1, 3), (n, n, n), xs[1] - xs[0]


@pytest.mark.parametrize("shape_name", ["sphere", "torus", "two_spheres"])
def test_mesh_surface_distance_vs_analytic(shape_name, rng):
    """Quantitative parity for BASELINE config 2 ('matching meshes'):
    smooth + marching tetrahedra + the reference's snap-to-grid vertex
    contract (``fusion.py:1313-1330``) must reproduce analytic isosurfaces
    to within grid quantization — the bound the reference's own
    truncation-snap implies (max <= sqrt(3) steps). Measured on all three
    shapes: mesh->surface mean ~0.45 / max ~1.70 steps, surface->mesh mean
    ~0.54 / max ~1.15 steps — i.e. the deviation is the shared snap
    contract, not the marching-tetrahedra redesign."""
    from scipy.spatial import cKDTree

    grid, shape, step = _grid(48)
    dirs = rng.standard_normal((4000, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    if shape_name == "sphere":
        sdf = lambda p: np.linalg.norm(p, axis=1) - 0.6
        surf = 0.6 * dirs
    elif shape_name == "torus":
        def sdf(p):
            q = np.stack([np.sqrt(p[:, 0]**2 + p[:, 1]**2) - 0.55, p[:, 2]], 1)
            return np.linalg.norm(q, axis=1) - 0.25
        u = rng.random(4000) * 2 * np.pi
        v = rng.random(4000) * 2 * np.pi
        surf = np.stack([(0.55 + 0.25 * np.cos(v)) * np.cos(u),
                         (0.55 + 0.25 * np.cos(v)) * np.sin(u),
                         0.25 * np.sin(v)], 1)
    else:
        def sdf(p):
            d1 = np.linalg.norm(p - [0.45, 0, 0], axis=1) - 0.3
            d2 = np.linalg.norm(p + [0.45, 0, 0], axis=1) - 0.3
            return np.minimum(d1, d2)
        surf = np.concatenate([0.3 * dirs[:2000] + [0.45, 0, 0],
                               0.3 * dirs[2000:] - [0.45, 0, 0]])

    occ = (sdf(grid) < 0).astype(np.float32)
    verts, tris = extract.extract_mesh(grid, occ, shape, smooth=True,
                                       smooth_iters=20)
    assert verts.shape[0] > 1000
    d_mesh_to_surf = np.abs(sdf(verts)) / step
    assert d_mesh_to_surf.max() <= np.sqrt(3) + 0.05, d_mesh_to_surf.max()
    assert d_mesh_to_surf.mean() <= 0.6, d_mesh_to_surf.mean()
    d_surf_to_mesh = cKDTree(verts).query(surf)[0] / step
    assert d_surf_to_mesh.max() <= 1.6, d_surf_to_mesh.max()
    assert d_surf_to_mesh.mean() <= 0.7, d_surf_to_mesh.mean()

    # topology sanity: watertight 2-manifold (every edge in two triangles)
    edges = np.sort(np.concatenate(
        [tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]]), axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert np.all(counts == 2)
