"""Full two-stage pipeline on the real TPU with a realistic-size synthetic
scene: stage-1 training -> full-image eval -> shape export -> mesh + Chamfer
-> stage-2 joint training -> eval outputs -> metrics. Writes everything under
--workdir and prints a final JSON summary. This is the framework's
end-to-end evidence run (quality + wall-clock on one chip)."""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main():
    from psnerf_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/tpu_pipeline")
    ap.add_argument("--hw", type=int, default=128)
    ap.add_argument("--views", type=int, default=6)
    ap.add_argument("--lights", type=int, default=16)
    ap.add_argument("--stage1-iters", type=int, default=1500)
    ap.add_argument("--stage2-iters", type=int, default=1500)
    args = ap.parse_args()

    from psnerf_tpu.config import Stage1Config, Stage2Config
    from psnerf_tpu.data.synthetic import generate_synthetic_scene
    from psnerf_tpu.fields.occupancy import OccFieldConfig
    from psnerf_tpu.fields.psnet import PSNetConfig
    from psnerf_tpu.render.unisurf import UnisurfConfig
    from psnerf_tpu.runners.stage1 import Stage1Runner
    from psnerf_tpu.runners.stage2 import Stage2Runner
    from psnerf_tpu.train.losses import Stage1LossWeights, Stage2LossWeights
    from psnerf_tpu.train.stage1 import Stage1TrainConfig
    from psnerf_tpu.train.stage2 import Stage2TrainConfig

    wd = args.workdir
    os.makedirs(wd, exist_ok=True)
    scene_dir = os.path.join(wd, "scene")
    summary = {}

    t0 = time.time()
    generate_synthetic_scene(scene_dir, n_views=args.views, n_test=1,
                             n_lights=args.lights, hw=(args.hw, args.hw),
                             radius=0.6, focal=1.6 * args.hw)
    summary["scene_s"] = round(time.time() - t0, 1)

    cfg1 = Stage1Config(
        field=OccFieldConfig(num_layers=8, hidden_dim=256, feat_size=256,
                             octaves_pe=6, octaves_pe_views=4),
        render=UnisurfConfig(near=1.2, far=5.0, radius=1.2,
                             interval_start=0.6, interval_end=0.05,
                             interval_decay=3e-4, num_points_in=32,
                             num_points_out=16, ray_marching_steps=128),
        train=Stage1TrainConfig(
            learning_rate=5e-4, milestone_iters=(),
            n_training_points=1024, normal_after=0,
            weights=Stage1LossWeights(use_mask_loss=True, lambda_mask=1.0)),
        data_dir=scene_dir, inten_normalize=None,
        checkpoint_every=2000, backup_every=100000,
    )
    t0 = time.time()
    r1 = Stage1Runner(cfg1, os.path.join(wd, "stage1"), resume=True)
    r1.train(args.stage1_iters, log_every=200)
    summary["stage1_train_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    r1.render_visdata(os.path.join(wd, "stage1_vis.png"), views=(0,))
    m = r1.eval_views(os.path.join(wd, "stage1_eval"), "test", tile=4096)
    summary["stage1_eval_psnr"] = round(float(np.mean([x["psnr"] for x in m])), 2)
    summary["stage1_eval_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    exports = os.path.join(wd, "exports")
    r1.shape_extract(exports, visibility=True, vis_plus=True,
                     vis_plus_num=64, tile=4096, n_steps=256)
    summary["shape_extract_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    from psnerf_tpu.mesh import chamfer_distance, extract_mesh
    verts, tris = r1.extract_mesh_to(os.path.join(wd, "mesh.ply"),
                                     resolution0=32, upsampling=2)
    v_gt, t_gt = extract_mesh(lambda p: 0.6 - np.linalg.norm(p, axis=-1),
                              resolution0=32, upsampling_steps=2)
    cd = chamfer_distance(verts, tris, v_gt, t_gt)
    summary["mesh_chamfer_mm"] = round(cd * 1000, 3)
    summary["mesh_s"] = round(time.time() - t0, 1)
    summary["mesh_tris"] = int(len(tris))

    cfg2 = Stage2Config(
        net=PSNetConfig(light_int=1.2, compute_dtype="bfloat16"),
        train=Stage2TrainConfig(
            sg_learning_rate=5e-4, light_learning_rate=5e-4,
            train_order=True, warmup_iters=300,
            weights=Stage2LossWeights()),
        data_dir=scene_dir, stage1_shape_path=exports,
        inten_normalize=None,
        light_bs=8, vis_train_num=8, num_pixels=4096,
        train_all_pixels=False, ckpt_freq=100000,
    )
    t0 = time.time()
    r2 = Stage2Runner(cfg2, os.path.join(wd, "stage2"), resume=True)
    r2.train(args.stage2_iters, log_every=200)
    summary["stage2_train_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    test_out = os.path.join(wd, "test_out")
    r2.evaluate(test_out, split="test", tile=4096)
    summary["stage2_eval_s"] = round(time.time() - t0, 1)

    from psnerf_tpu.eval.evaluation import evaluate_outputs
    res = evaluate_outputs(scene_dir, test_out)
    summary.update({f"final_{k}": (round(v, 3) if isinstance(v, float) else v)
                    for k, v in res.items()})

    # relight + edit smoke
    # keep the integrated radiance O(1): 512 directional lights sum, so mean
    # texel ~ 1/L (the reference exposes the same knob as --envmap_scale)
    env = np.full((16, 32, 3), 0.002, np.float32)
    env[3:9, 8:18] = [0.03, 0.025, 0.018]
    r2.render_envmap(os.path.join(wd, "relight"), env, tile=4096)
    r2.edit_material(os.path.join(wd, "edit"),
                     albedo_new=np.asarray([0.75, 0.15, 0.1]), basis_new=4)

    with open(os.path.join(wd, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
