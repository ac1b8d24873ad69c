"""Visibility-MLP cast-shadow accuracy sweep on the snowman scene.

The flagship snowman run trains the visibility MLP to 0.953 cast-shadow
accuracy while its own marched supervision is 99.5% right (RESULTS_snowman
_tpu.json) — the gap is supervision-side headroom (reference knobs:
vis_plus 256 FPS dirs / vnum 16 per step, shape_extract.py:117-129 +
trainer.py:384-392). This tool amortizes the expensive shared work (scene,
stage-1 training, shape export with a dense vis_plus set) ONCE, then trains
stage-2 fresh under each supervision setting and reports cast/lit accuracy
plus final image metrics, so the knob that buys >=0.98 cast accuracy at
unchanged PSNR/MAE can be found in one chip session.

Usage:
  python tools/vis_acc_experiment.py --workdir /tmp/vis_acc \
      --settings 16:1:300 16:2:300 24:2:600     # vis_train_num:vis_weight:warmup
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    from tpu_pipeline_demo import _shadow_metrics

    from psnerf_tpu.config import Stage1Config, Stage2Config
    from psnerf_tpu.data.synthetic import (
        SNOWMAN_SPHERES,
        generate_synthetic_scene,
    )
    from psnerf_tpu.eval.evaluation import evaluate_outputs
    from psnerf_tpu.fields.occupancy import OccFieldConfig
    from psnerf_tpu.fields.psnet import PSNetConfig
    from psnerf_tpu.render.unisurf import UnisurfConfig
    from psnerf_tpu.runners.stage1 import Stage1Runner
    from psnerf_tpu.runners.stage2 import Stage2Runner
    from psnerf_tpu.train.losses import Stage1LossWeights, Stage2LossWeights
    from psnerf_tpu.train.stage1 import Stage1TrainConfig
    from psnerf_tpu.train.stage2 import Stage2TrainConfig
    from psnerf_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/vis_acc")
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--views", type=int, default=12)
    ap.add_argument("--lights", type=int, default=16)
    ap.add_argument("--stage1-iters", type=int, default=15000)
    ap.add_argument("--stage2-iters", type=int, default=15000)
    ap.add_argument("--vis-plus-num", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--settings", nargs="+", default=["8:1:300", "16:1:300"],
                    help="vis_train_num:vis_weight:warmup_iters triplets")
    args = ap.parse_args()

    wd = args.workdir
    os.makedirs(wd, exist_ok=True)
    scene_dir = os.path.join(wd, "scene")

    # ---- shared work: scene + stage-1 + exports (resumable) ----
    if not os.path.exists(os.path.join(scene_dir, "params.json")):
        generate_synthetic_scene(
            scene_dir, n_views=args.views, n_test=1, n_lights=args.lights,
            hw=(args.hw, args.hw), radius=0.6, focal=1.6 * args.hw,
            spheres=SNOWMAN_SPHERES, light_spread=0.9)

    cfg1 = Stage1Config(
        field=OccFieldConfig(num_layers=8, hidden_dim=256, feat_size=256,
                             octaves_pe=6, octaves_pe_views=4,
                             compute_dtype="bfloat16"),
        render=UnisurfConfig(near=1.2, far=5.0, radius=1.2,
                             interval_start=0.6, interval_end=0.05,
                             interval_decay=3e-4, num_points_in=32,
                             num_points_out=16, ray_marching_steps=128),
        train=Stage1TrainConfig(
            learning_rate=5e-4,
            # same budget-scaled MultiStepLR as the pipeline demo (epoch
            # units: Stage1Runner scales by n_views)
            milestone_iters=(args.stage1_iters * 8 // 15 // args.views,
                             args.stage1_iters * 12 // 15 // args.views),
            n_training_points=1024, normal_after=0,
            weights=Stage1LossWeights(use_mask_loss=True, lambda_mask=1.0)),
        data_dir=scene_dir, inten_normalize=None,
        checkpoint_every=2000, backup_every=100000,
    )
    t0 = time.time()
    r1 = Stage1Runner(cfg1, os.path.join(wd, "stage1"), seed=args.seed,
                      resume=True)
    r1.train(args.stage1_iters, log_every=500)
    print(f"[shared] stage1 ready in {time.time() - t0:.1f}s", flush=True)

    exports = os.path.join(wd, "exports")
    stamp = os.path.join(exports, ".complete")
    if not os.path.exists(stamp):
        t0 = time.time()
        r1.shape_extract(exports, visibility=True, vis_plus=True,
                         vis_plus_num=args.vis_plus_num, tile=4096,
                         n_steps=256)
        with open(stamp, "w") as f:
            f.write(json.dumps({"vis_plus_num": args.vis_plus_num}))
        print(f"[shared] exports in {time.time() - t0:.1f}s", flush=True)

    # ---- per-setting stage-2 runs ----
    results = {}
    for spec in args.settings:
        vnum, vw, warm = spec.split(":")
        vnum, vw, warm = int(vnum), float(vw), int(warm)
        tag = f"v{vnum}_w{vw:g}_warm{warm}"
        cfg2 = Stage2Config(
            net=PSNetConfig(light_int=1.2, compute_dtype="bfloat16"),
            train=Stage2TrainConfig(
                sg_learning_rate=5e-4, light_learning_rate=5e-4,
                train_order=True, warmup_iters=warm,
                weights=Stage2LossWeights(vis_weight=vw)),
            data_dir=scene_dir, stage1_shape_path=exports,
            inten_normalize=None,
            light_bs=8, vis_train_num=vnum,
            num_pixels=4096,
            # same budget-scaled sg_sched as the pipeline demo (epoch
            # units: Stage2Runner scales by n_views * light_bs)
            sched_milestones_epochs=tuple(
                max(1, args.stage2_iters * k // 5 // (args.views * 8))
                for k in range(1, 5)),
            train_all_pixels=False, ckpt_freq=100000,
        )
        t0 = time.time()
        r2 = Stage2Runner(cfg2, os.path.join(wd, f"stage2_{tag}"),
                          seed=args.seed, resume=True)
        r2.train(args.stage2_iters, log_every=1000)
        train_s = time.time() - t0

        rec = {"train_s": round(train_s, 1),
               "it_s": round(args.stage2_iters / max(train_s, 1e-9), 1)}
        rec.update(_shadow_metrics(r2, scene_dir, exports))

        test_out = os.path.join(wd, f"test_out_{tag}")
        r2.evaluate(test_out, split="test", tile=4096)
        ev = evaluate_outputs(scene_dir, test_out)
        rec.update({f"final_{k}": (round(v, 3) if isinstance(v, float) else v)
                    for k, v in ev.items()})
        results[tag] = rec
        print(json.dumps({tag: rec}, indent=2), flush=True)
        with open(os.path.join(wd, "sweep.json"), "w") as f:
            json.dump(results, f, indent=2)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
