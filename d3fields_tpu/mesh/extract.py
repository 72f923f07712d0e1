"""Mesh extraction and colorization.

Rebuilds the reference mesh layer (``fusion.py:1313-1416``) without
trimesh/PyMCubes/Open3D:

- :func:`extract_mesh` — smooth (TPU) + marching tetrahedra (native C++) +
  the reference's vertex->grid-coordinate snap (``fusion.py:1325-1329``:
  vertices truncated to int grid indices and mapped through the flat grid).
- colorizers producing :class:`TriMesh` (plain numpy dataclass with PLY/OBJ
  export) for per-query masks (viridis), instance argmax (jet), PCA
  descriptors (bg gray 0.8), and RGB colors — matching
  ``create_mask_mesh`` / ``create_instance_mask_mesh`` /
  ``create_descriptor_mesh`` / ``create_color_mesh``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import matplotlib
import numpy as np

from d3fields_tpu.fields.geometry import onehot_to_instance
from d3fields_tpu.mesh import _native, smoothing
from d3fields_tpu.ops.pca import PCAParams, pca_transform


@dataclasses.dataclass
class TriMesh:
    """Minimal triangle mesh container (replaces the trimesh dependency)."""

    vertices: np.ndarray            # (NV, 3) float
    faces: np.ndarray               # (NT, 3) int
    vertex_colors: Optional[np.ndarray] = None  # (NV, 4) uint8 RGBA

    def export_ply(self, path: str) -> None:
        nv, nf = self.vertices.shape[0], self.faces.shape[0]
        has_color = self.vertex_colors is not None
        with open(path, "wb") as f:
            header = ["ply", "format binary_little_endian 1.0", f"element vertex {nv}",
                      "property float x", "property float y", "property float z"]
            if has_color:
                header += ["property uchar red", "property uchar green",
                           "property uchar blue", "property uchar alpha"]
            header += [f"element face {nf}", "property list uchar int vertex_indices",
                       "end_header"]
            f.write(("\n".join(header) + "\n").encode())
            if has_color:
                vdt = np.dtype([("xyz", np.float32, 3), ("rgba", np.uint8, 4)])
                buf = np.empty(nv, vdt)
                buf["xyz"] = self.vertices.astype(np.float32)
                buf["rgba"] = self.vertex_colors.astype(np.uint8)
            else:
                buf = self.vertices.astype("<f4")
            f.write(buf.tobytes())
            fdt = np.dtype([("n", np.uint8), ("idx", np.int32, 3)])
            fbuf = np.empty(nf, fdt)
            fbuf["n"] = 3
            fbuf["idx"] = self.faces.astype(np.int32)
            f.write(fbuf.tobytes())

    def export_obj(self, path: str) -> None:
        with open(path, "w") as f:
            for i, v in enumerate(self.vertices):
                if self.vertex_colors is not None:
                    c = self.vertex_colors[i][:3] / 255.0
                    f.write(f"v {v[0]} {v[1]} {v[2]} {c[0]} {c[1]} {c[2]}\n")
                else:
                    f.write(f"v {v[0]} {v[1]} {v[2]}\n")
            for t in self.faces:
                f.write(f"f {t[0]+1} {t[1]+1} {t[2]+1}\n")


def extract_mesh(
    grid_pts: np.ndarray,
    dist: np.ndarray,
    grid_shape: Tuple[int, int, int],
    *,
    smooth: bool = True,
    smooth_iters: int = 20,
    iso: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Distance volume -> (world vertices, triangles).

    Mirrors ``Fusion.extract_mesh`` (``fusion.py:1313-1330``): the smoothed
    volume's iso-surface vertices are truncated to integer grid indices and
    mapped back to world coordinates via the flat grid — the output mesh is
    quantized to grid resolution by design.
    """
    vol = np.asarray(dist, np.float32).reshape(grid_shape)
    if smooth:
        vol = np.asarray(smoothing.smooth_volume(vol, iters=smooth_iters))
    verts, tris = _native.marching_tetrahedra(vol, iso)
    if verts.shape[0] == 0:
        return np.zeros((0, 3), np.float32), tris
    vi = verts.astype(np.int32)
    flat = np.ravel_multi_index(
        (vi[:, 0], vi[:, 1], vi[:, 2]), grid_shape, mode="clip"
    )
    world = np.asarray(grid_pts)[flat]
    return world, tris


def _colormap_colors(values: np.ndarray, cmap_name: str) -> np.ndarray:
    """Map scalars in [0, 1] to RGBA uint8 via a matplotlib colormap
    (stand-in for ``trimesh.visual.interpolate``)."""
    v = np.asarray(values, np.float64)
    rng = v.max() - v.min()
    if rng > 0:
        v = (v - v.min()) / rng
    cmap = matplotlib.colormaps[cmap_name]
    return (cmap(v) * 255).astype(np.uint8)


def create_mask_meshes(vertices, triangles, query_masks) -> list:
    """Per-query-channel viridis meshes (``create_mask_mesh``, fusion.py:1332-1346)."""
    query_masks = np.asarray(query_masks)
    out = []
    for i in range(query_masks.shape[1]):
        colors = _colormap_colors(query_masks[:, i], "viridis")
        out.append(TriMesh(np.asarray(vertices), np.asarray(triangles)[..., ::-1], colors))
    return out


def create_instance_mask_mesh(vertices, triangles, mask) -> TriMesh:
    """Instance argmax colored with jet (``create_instance_mask_mesh``,
    fusion.py:1348-1375)."""
    mask = np.asarray(mask)
    num_instances = mask.shape[1]
    inst = onehot_to_instance(mask).astype(np.float64) / num_instances
    colors = _colormap_colors(inst, "jet")
    return TriMesh(np.asarray(vertices), np.asarray(triangles)[..., ::-1], colors)


def create_descriptor_mesh(
    vertices, triangles, features, mask, pca: PCAParams, mask_out_bg: bool = True
) -> TriMesh:
    """PCA(3)-projected descriptors as RGB; background (instance 0) gray 0.8
    (``create_descriptor_mesh``, fusion.py:1392-1416). Colors follow the
    reference's BGR->RGB flip on the projected channels."""
    import jax.numpy as jnp

    features = np.asarray(features)
    proj = np.asarray(pca_transform(jnp.asarray(features), pca))
    rgb = np.zeros((proj.shape[0], 3))
    for i in range(proj.shape[1]):
        lo, hi = proj[:, i].min(), proj[:, i].max()
        rgb[:, i] = (proj[:, i] - lo) / (hi - lo + 1e-12)
    if mask_out_bg and mask is not None:
        bg = onehot_to_instance(np.asarray(mask)) == 0
        rgb[bg] = 0.8
    rgb = rgb[..., ::-1]
    rgba = np.concatenate(
        [(rgb * 255).astype(np.uint8), np.full((rgb.shape[0], 1), 255, np.uint8)], axis=1
    )
    return TriMesh(np.asarray(vertices), np.asarray(triangles)[..., ::-1], rgba)


def create_color_mesh(vertices, triangles, colors_bgr) -> TriMesh:
    """Observed-color mesh; input colors are BGR in [0,1] as stored in the
    state (``create_color_mesh``, fusion.py:1408-1416)."""
    c = np.asarray(colors_bgr)[..., ::-1]
    rgba = np.concatenate(
        [(c * 255).astype(np.uint8), np.full((c.shape[0], 1), 255, np.uint8)], axis=1
    )
    return TriMesh(np.asarray(vertices), np.asarray(triangles)[..., ::-1], rgba)
