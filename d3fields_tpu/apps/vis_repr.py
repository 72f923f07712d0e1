"""Representation demo: fused field -> meshes (the reference's headline app).

Unifies the reference's ``vis_repr.py`` (hardcoded scene table) and
``vis_repr_custom.py`` (argparse) into one CLI, headless-first: meshes are
written as PLY files instead of opened in a trimesh window.

  python -m d3fields_tpu.apps.vis_repr --scene mug --data_root data \\
      --pca pca_model/mug.pkl --out out/mug
  python -m d3fields_tpu.apps.vis_repr --synthetic --out out/demo

Pipeline (reference ``vis_repr.py:57-126``): load frame -> Fusion.update ->
text_queries_for_inst_mask_no_track -> dense-grid batch_eval -> marching
cubes -> vertex batch_eval(dino/mask/color) -> instance / descriptor /
color meshes.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from d3fields_tpu.config import Boundaries, D3FieldsConfig

# reference scene table (vis_repr.py:16-31)
SCENES = {
    "mug": ("2023-09-15-13-21-56-171587", ["mug"], [0.3]),
    "fork": ("2023-09-15-14-15-01-238216", ["fork"], [0.25]),
    "shoe": ("2023-09-11-14-15-50-607452", ["shoe"], [0.5]),
}


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scene", choices=sorted(SCENES), default=None)
    p.add_argument("--data_path", default=None, help="explicit scene dir")
    p.add_argument("--data_root", default="data")
    p.add_argument("--pca_path", default=None)
    p.add_argument("--query_texts", nargs="+", default=None)
    p.add_argument("--query_thresholds", nargs="+", type=float, default=None)
    p.add_argument("--num_cam", type=int, default=4)
    p.add_argument("--t", type=int, default=50)
    p.add_argument("--step", type=float, default=0.004)
    for axis, lo, hi in (("x", -0.4, 0.4), ("y", -0.4, 0.3), ("z", -0.2, 0.02)):
        p.add_argument(f"--{axis}_lower", type=float, default=lo)
        p.add_argument(f"--{axis}_upper", type=float, default=hi)
    p.add_argument("--synthetic", action="store_true",
                   help="checkpoint-free analytic demo scene")
    p.add_argument("--feat_dim", type=int, default=64,
                   help="synthetic descriptor dimensionality (use 1024 to "
                        "pair the synthetic scene with the reference's "
                        "fitted pca_model/*.pkl pickles)")
    p.add_argument("--out", default="out/vis_repr")
    p.add_argument("--dump_arrays", default=None,
                   help="also np.savez the numeric intermediates (grid dist "
                        "field, mesh vertices/triangles, per-vertex "
                        "mask/color/PCA-descriptor values) — the golden-"
                        "fixture hook (tests/test_golden.py)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from d3fields_tpu.fields.fusion import Fusion
    from d3fields_tpu.fields.geometry import create_grid
    from d3fields_tpu.mesh.extract import (
        create_color_mesh, create_descriptor_mesh, create_instance_mask_mesh,
        extract_mesh,
    )
    from d3fields_tpu.ops.pca import PCAParams, pca_transform

    boundaries = Boundaries(
        x_lower=args.x_lower, x_upper=args.x_upper,
        y_lower=args.y_lower, y_upper=args.y_upper,
        z_lower=args.z_lower, z_upper=args.z_upper,
    )

    if args.synthetic:
        from d3fields_tpu.utils.synthetic import (
            render_sphere_scene, sphere_mask_backend,
        )

        queries = args.query_texts or ["ball", "small ball"]
        thresholds = args.query_thresholds or [0.3] * len(queries)
        scene = render_sphere_scene(num_views=args.num_cam,
                                    feat_dim=args.feat_dim)
        backend = sphere_mask_backend(scene, queries)
        obs = {k: scene[k] for k in ("color", "depth", "pose", "K")}
        obs["dino_feats"] = scene["dino_feats"]
        boundaries = Boundaries(-0.3, 0.5, -0.3, 0.35, 0.001, 0.3)
        fusion = Fusion(num_cam=args.num_cam, mask_backend=backend)
    else:
        from d3fields_tpu.utils.io import load_frame

        if args.scene:
            sub, queries, thresholds = SCENES[args.scene]
            data_path = args.data_path or os.path.join(args.data_root, sub)
        else:
            data_path = args.data_path
            queries, thresholds = args.query_texts, args.query_thresholds
            if not (data_path and queries and thresholds):
                raise SystemExit(
                    "need --scene, or --data_path + --query_texts + "
                    "--query_thresholds, or --synthetic"
                )
        obs = load_frame(data_path, args.t, args.num_cam)
        from d3fields_tpu.apps._backends import build_real_backends

        feature_backend, mask_backend = build_real_backends()
        fusion = Fusion(num_cam=args.num_cam, feature_backend=feature_backend,
                        mask_backend=mask_backend)

    os.makedirs(args.out, exist_ok=True)
    t0 = time.perf_counter()
    fusion.update(obs)
    fusion.text_queries_for_inst_mask_no_track(
        queries, thresholds, boundaries=boundaries
    )
    print(f"[vis_repr] update+masks: {time.perf_counter() - t0:.2f}s; "
          f"consensus labels: {fusion.consensus_mask_label}")

    grid, grid_shape = create_grid(boundaries, args.step)
    t0 = time.perf_counter()
    out = fusion.batch_eval(grid.astype(np.float32), ())
    vertices, triangles = extract_mesh(grid, np.asarray(out["dist"]), grid_shape)
    print(f"[vis_repr] grid eval ({grid.shape[0]} pts) + marching cubes "
          f"({vertices.shape[0]} verts): {time.perf_counter() - t0:.2f}s")
    if vertices.shape[0] == 0:
        raise SystemExit("empty mesh: no surface crossed the iso level")

    vout = fusion.batch_eval_np(
        vertices.astype(np.float32), ("dino_feats", "mask", "color_tensor")
    )

    inst_mesh = create_instance_mask_mesh(vertices, triangles, vout["mask"])
    inst_mesh.export_ply(os.path.join(args.out, "instance_mesh.ply"))

    if args.pca_path:
        pca = PCAParams.load(args.pca_path)
    else:
        pca = PCAParams.fit(vout["dino_feats"], 3)
    desc_mesh = create_descriptor_mesh(
        vertices, triangles, vout["dino_feats"], vout["mask"], pca
    )
    desc_mesh.export_ply(os.path.join(args.out, "descriptor_mesh.ply"))

    color_mesh = create_color_mesh(vertices, triangles, vout["color_tensor"])
    color_mesh.export_ply(os.path.join(args.out, "color_mesh.ply"))
    if args.dump_arrays:
        np.savez_compressed(
            args.dump_arrays,
            dist=np.asarray(out["dist"], np.float32),
            vertices=vertices.astype(np.float32),
            triangles=triangles.astype(np.int32),
            mask=np.asarray(vout["mask"], np.float32),
            color=np.asarray(vout["color_tensor"], np.float32),
            desc_pca=np.asarray(
                pca_transform(vout["dino_feats"], pca), np.float32),
        )
        print(f"[vis_repr] dumped numeric intermediates to {args.dump_arrays}")
    print(f"[vis_repr] wrote instance/descriptor/color meshes to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
