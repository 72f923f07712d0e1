"""Scene and artifact I/O.

Loads the reference's recorded-scene layout (``vis_repr.py:57-69``,
``vis_tracking.py:70-85``):

  data_path/
    camera_{i}/
      color/{t}.png          (BGR uint8)
      depth/{t}.png          (uint16 millimeters)
      camera_extrinsics.npy  (4x4 world->cam)
      camera_params.npy      (fx, fy, cx, cy)

and writes meshes as ASCII PLY (the reference hands trimesh objects to an
interactive viewer; headless environments get files instead).
"""

from __future__ import annotations

import os
import pickle
from typing import Optional, Tuple

import numpy as np


def load_frame(data_path: str, t: int, num_cam: int) -> dict:
    """One timestep -> reference obs dict {color (BGR), depth (m), pose, K}."""
    import cv2

    colors, depths, poses, Ks = [], [], [], []
    for i in range(num_cam):
        cam = os.path.join(data_path, f"camera_{i}")
        color = cv2.imread(os.path.join(cam, "color", f"{t}.png"))
        if color is None:
            raise FileNotFoundError(os.path.join(cam, "color", f"{t}.png"))
        depth = cv2.imread(
            os.path.join(cam, "depth", f"{t}.png"), cv2.IMREAD_ANYDEPTH
        )
        if depth is None:
            raise FileNotFoundError(os.path.join(cam, "depth", f"{t}.png"))
        depth = depth.astype(np.float32) / 1000.0
        ext = np.load(os.path.join(cam, "camera_extrinsics.npy"))
        fx, fy, cx, cy = np.load(os.path.join(cam, "camera_params.npy"))[:4]
        K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
        colors.append(color)
        depths.append(depth)
        poses.append(np.asarray(ext, np.float32)[:3])
        Ks.append(K)
    return {
        "color": np.stack(colors),
        "depth": np.stack(depths),
        "pose": np.stack(poses),
        "K": np.stack(Ks),
    }


def num_frames(data_path: str, cam: int = 0) -> int:
    d = os.path.join(data_path, f"camera_{cam}", "color")
    return len([f for f in os.listdir(d) if f.endswith(".png")])


def save_ply(path: str, vertices: np.ndarray, triangles: np.ndarray,
             colors: Optional[np.ndarray] = None) -> None:
    """ASCII PLY with optional per-vertex uint8 colors."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    has_color = colors is not None
    if has_color:
        colors = np.asarray(colors)
        if colors.dtype != np.uint8:
            colors = (np.clip(colors, 0, 1) * 255).astype(np.uint8)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(vertices)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if has_color:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write(f"element face {len(triangles)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for i, v in enumerate(vertices):
            line = f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}"
            if has_color:
                c = colors[i]
                line += f" {c[0]} {c[1]} {c[2]}"
            f.write(line + "\n")
        for tri in triangles:
            f.write(f"3 {tri[0]} {tri[1]} {tri[2]}\n")


def save_pickle(path: str, obj) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def load_pickle(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)
