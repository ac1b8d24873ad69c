"""Measure the mesh-extraction step on a trained flagship checkpoint (TPU):
carved 512^3 MISE extraction through the fused occupancy kernel + the jitted
device silhouette carver, with a phase breakdown and an A/B against a
previously extracted mesh (Chamfer + vertex count) to pin semantics.

Usage:
  python tools/bench_mesh_step.py --workdir /tmp/flagship12_s7 \
      [--ref-mesh /tmp/flagship12_s7/mesh.ply] [--res0 64 --ups 3]
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True,
                    help="a tpu_pipeline_demo workdir (scene/ + stage1/)")
    ap.add_argument("--ref-mesh", default=None,
                    help="previously extracted .ply to A/B against")
    ap.add_argument("--res0", type=int, default=64)
    ap.add_argument("--ups", type=int, default=3)
    ap.add_argument("--exterior", action="store_true",
                    help="also extract with exterior_only and record both")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from psnerf_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    import numpy as np

    from psnerf_tpu.config import Stage1Config
    from psnerf_tpu.fields.occupancy import OccFieldConfig
    from psnerf_tpu.render.unisurf import UnisurfConfig
    from psnerf_tpu.runners.stage1 import Stage1Runner
    from psnerf_tpu.train.stage1 import Stage1TrainConfig

    scene_dir = os.path.join(args.workdir, "scene")
    cfg1 = Stage1Config(
        field=OccFieldConfig(num_layers=8, hidden_dim=256, feat_size=256,
                             octaves_pe=6, octaves_pe_views=4,
                             compute_dtype="bfloat16"),
        render=UnisurfConfig(near=1.2, far=5.0, radius=1.2,
                             interval_start=0.6, interval_end=0.05,
                             interval_decay=3e-4, num_points_in=32,
                             num_points_out=16, ray_marching_steps=128),
        train=Stage1TrainConfig(learning_rate=5e-4, milestone_iters=(),
                                n_training_points=1024, normal_after=0),
        data_dir=scene_dir, inten_normalize=None,
    )
    r1 = Stage1Runner(cfg1, os.path.join(args.workdir, "stage1"), resume=True)

    summary = {"workdir": args.workdir,
               "resolution": f"res0 {args.res0} + {args.ups} ups "
                             f"({args.res0 * 2 ** args.ups}^3)"}

    t0 = time.time()
    out_ply = os.path.join(args.workdir, "mesh_r4.ply")
    verts, tris = r1.extract_mesh_to(out_ply, resolution0=args.res0,
                                     upsampling=args.ups, mask_carve=True)
    summary["mesh_s"] = round(time.time() - t0, 1)
    summary["n_verts"] = int(len(verts))
    summary["n_tris"] = int(len(tris))

    if args.exterior:
        t0 = time.time()
        v_ext, t_ext = r1.extract_mesh_to(
            os.path.join(args.workdir, "mesh_r4_exterior.ply"),
            resolution0=args.res0, upsampling=args.ups, mask_carve=True,
            exterior_only=True)
        summary["mesh_exterior_s"] = round(time.time() - t0, 1)
        summary["n_verts_exterior"] = int(len(v_ext))

    if args.ref_mesh and os.path.exists(args.ref_mesh):
        from psnerf_tpu.mesh import chamfer_distance
        from psnerf_tpu.mesh.meshio import load_mesh

        v_old, t_old = load_mesh(args.ref_mesh)
        t0 = time.time()
        cd = chamfer_distance(verts, tris, v_old, t_old)
        summary["ab_chamfer_vs_ref_mm"] = round(cd * 1000, 6)
        summary["ab_nverts_ref"] = int(len(v_old))
        summary["ab_chamfer_s"] = round(time.time() - t0, 1)

    print(json.dumps(summary, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
