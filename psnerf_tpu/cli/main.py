"""Unified CLI: `python -m psnerf_tpu.cli.main <command> ...`

Commands mirror the reference entry points (README.md:157-168):
  stage1-train    <config.yaml>            (stage1/train.py)
  stage1-eval     <config.yaml>            (stage1/eval.py)
  shape-extract   <config.yaml>            (stage1/shape_extract.py)
  extract-mesh    <config.yaml>            (stage1/extract_mesh.py)
  stage2-train    --conf <obj.conf>        (stage2/train.py)
  stage2-eval     --conf <obj.conf>        (stage2/eval.py, incl.
                  --render_envmap / --edit_albedo / --edit_specular)
  evaluation      --obj ... --test_out_dir (evaluation.py)
  chamfer         --mesh_gt --mesh_pred    (chamfer_dist.py)
  light-avg       --obj <dir>              (light_avg.py)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    parser = argparse.ArgumentParser(prog="psnerf_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("stage1-train")
    p.add_argument("config")
    p.add_argument("--workdir", default=None)
    p.add_argument("--max-iters", type=int, default=100000)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--mesh-devices", type=int, default=None,
                   help="data-parallel training over the first N devices "
                        "(1-D 'rays' mesh; params replicated, batches "
                        "sharded, grad all-reduce over ICI)")

    p = sub.add_parser("stage1-eval")
    p.add_argument("config")
    p.add_argument("--workdir", default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--split", default="test")

    p = sub.add_parser("shape-extract")
    p.add_argument("config")
    p.add_argument("--workdir", default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--visibility", action="store_true", default=True)
    p.add_argument("--no-visibility", dest="visibility", action="store_false")
    p.add_argument("--vis_plus", action="store_true")
    p.add_argument("--vis_plus_num", type=int, default=256)

    p = sub.add_parser("extract-mesh")
    p.add_argument("config")
    p.add_argument("--workdir", default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--resolution0", type=int, default=None)
    p.add_argument("--upsampling", type=int, default=None)
    p.add_argument("--mask_carve", action="store_true",
                   help="carve by dilated multi-view silhouettes")
    p.add_argument("--clip_bottom", type=float, default=None)
    p.add_argument("--exterior_only", action="store_true",
                   help="flood-fill enclosed interior pockets before "
                        "marching: extract only the exterior surface")

    p = sub.add_parser("stage2-train")
    p.add_argument("--conf", required=True)
    p.add_argument("--workdir", default=None)
    p.add_argument("--max-iters", type=int, default=200000)
    p.add_argument("--mesh-devices", type=int, default=None,
                   help="data-parallel training over the first N devices")

    p = sub.add_parser("stage2-eval")
    p.add_argument("--conf", required=True)
    p.add_argument("--workdir", default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--render_envmap", action="store_true")
    p.add_argument("--envmap_path", default=None)
    p.add_argument("--envmap_scale", type=float, default=1.0)
    p.add_argument("--gamma", type=float, default=1.0)
    p.add_argument("--edit_albedo", action="store_true")
    p.add_argument("--edit_specular", action="store_true")
    p.add_argument("--color", default=None)
    p.add_argument("--basis", type=int, default=None)

    p = sub.add_parser("evaluation")
    p.add_argument("--data_path", required=True)
    p.add_argument("--test_out_path", required=True)
    p.add_argument("--inten_normalize", default=None)
    p.add_argument("--lpips_weights", default=None)

    p = sub.add_parser("chamfer")
    p.add_argument("--mesh_gt", required=True)
    p.add_argument("--mesh_pred", required=True)
    p.add_argument("--num_samples", type=int, default=10000)

    p = sub.add_parser("light-avg")
    p.add_argument("--obj", required=True, help="dataset directory")
    p.add_argument("--intnorm", action="store_true")

    p = sub.add_parser("convert-ckpt",
                       help="reference torch checkpoint -> psnerf_tpu npz")
    p.add_argument("--stage", choices=["stage1", "stage2", "lcnet", "nenet"],
                   required=True)
    p.add_argument("--model", required=True, help="torch .pt/.pth[.tar] path")
    p.add_argument("--lights", default=None,
                   help="stage2 LightParameters .pth (optional)")
    p.add_argument("--out", required=True, help="output .npz path")

    p = sub.add_parser("sdps-preprocess",
                       help="run SDPS-Net (LCNet+NENet) over a dataset")
    p.add_argument("--obj", required=True, help="dataset directory")
    p.add_argument("--lcnet", required=True, help="converted or torch ckpt")
    p.add_argument("--nenet", required=True)
    p.add_argument("--train_light", type=int, default=None)
    p.add_argument("--intnorm_gt", action="store_true")

    from psnerf_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()

    args = parser.parse_args(argv)
    cmd = args.cmd

    if cmd in ("stage1-train", "stage1-eval", "shape-extract", "extract-mesh"):
        from psnerf_tpu.config import stage1_config_from_yaml
        from psnerf_tpu.runners.stage1 import Stage1Runner

        cfg = stage1_config_from_yaml(args.config)
        workdir = args.workdir or cfg.out_dir
        mesh = None
        if getattr(args, "mesh_devices", None):
            from psnerf_tpu.parallel import make_mesh

            mesh = make_mesh(args.mesh_devices)
        runner = Stage1Runner(cfg, workdir,
                              resume=not getattr(args, "no_resume", False),
                              mesh=mesh)
        if cmd == "stage1-train":
            runner.train(args.max_iters)
        elif cmd == "stage1-eval":
            out = args.out or os.path.join(workdir, "eval")
            metrics = runner.eval_views(out, args.split)
            print(json.dumps(metrics, indent=2))
        elif cmd == "shape-extract":
            out = args.out or os.path.join(workdir, "shape_out")
            runner.shape_extract(out, visibility=args.visibility,
                                 vis_plus=args.vis_plus,
                                 vis_plus_num=args.vis_plus_num)
            print(f"exports written to {out}")
        else:
            out = args.out or os.path.join(workdir, "mesh.ply")
            verts, tris = runner.extract_mesh_to(
                out, args.resolution0, args.upsampling,
                mask_carve=args.mask_carve, clip_bottom=args.clip_bottom,
                exterior_only=args.exterior_only)
            print(f"mesh: {len(verts)} verts, {len(tris)} tris -> {out}")

    elif cmd in ("stage2-train", "stage2-eval"):
        from psnerf_tpu.config import stage2_config_from_conf
        from psnerf_tpu.runners.stage2 import Stage2Runner, load_envmap

        cfg = stage2_config_from_conf(args.conf)
        workdir = args.workdir or os.path.join("out2", cfg.obj_name, cfg.expname)
        mesh = None
        if getattr(args, "mesh_devices", None):
            from psnerf_tpu.parallel import make_mesh

            mesh = make_mesh(args.mesh_devices)
        runner = Stage2Runner(cfg, workdir, mesh=mesh)
        if cmd == "stage2-train":
            runner.train(args.max_iters, plot_every=cfg.plot_freq)
        else:
            out = args.out or os.path.join(workdir, "test_out")
            if args.render_envmap:
                env = load_envmap(args.envmap_path)
                runner.render_envmap(out, env, gamma=args.gamma,
                                     envmap_scale=args.envmap_scale)
            elif args.edit_albedo or args.edit_specular:
                albedo_new = None
                if args.edit_albedo:
                    c = args.color or "#804020"
                    albedo_new = np.asarray(
                        [int(c.lstrip("#")[i:i + 2], 16) for i in (0, 2, 4)],
                        np.float32) / 255.0
                basis_new = args.basis if args.edit_specular else None
                runner.edit_material(out, albedo_new=albedo_new,
                                     basis_new=basis_new)
            else:
                runner.evaluate(out)
            print(f"outputs written to {out}")

    elif cmd == "evaluation":
        from psnerf_tpu.eval.evaluation import evaluate_outputs

        res = evaluate_outputs(args.data_path, args.test_out_path,
                               args.inten_normalize,
                               lpips_weights=args.lpips_weights)
        print(json.dumps(res, indent=2))

    elif cmd == "chamfer":
        from psnerf_tpu.mesh import chamfer_distance, load_mesh

        vg, tg = load_mesh(args.mesh_gt)
        vp, tp = load_mesh(args.mesh_pred)
        cd = chamfer_distance(vp, tp, vg, tg, args.num_samples)
        print(f"Chamfer Distance (mm):  {cd * 1000:.2f}")

    elif cmd == "light-avg":
        from psnerf_tpu.preprocess.light_avg import light_average

        light_average(args.obj, intnorm=args.intnorm)

    elif cmd == "convert-ckpt":
        from psnerf_tpu.convert import load_torch_file
        from psnerf_tpu.train.checkpoints import save_checkpoint

        blob = load_torch_file(args.model)
        if args.stage == "stage1":
            from psnerf_tpu.convert import stage1_params_from_torch

            tree = stage1_params_from_torch(blob)
        elif args.stage == "stage2":
            from psnerf_tpu.convert import stage2_params_from_torch

            lights = load_torch_file(args.lights) if args.lights else None
            tree = stage2_params_from_torch(blob, lights)
        elif args.stage == "lcnet":
            from psnerf_tpu.preprocess.sdps import load_lcnet_torch

            tree = load_lcnet_torch(blob.get("state_dict", blob))
        else:
            from psnerf_tpu.preprocess.sdps import load_nenet_torch

            tree = load_nenet_torch(blob.get("state_dict", blob))
        save_checkpoint(args.out, tree)
        print(f"converted {args.stage} checkpoint -> {args.out}")

    elif cmd == "sdps-preprocess":
        from psnerf_tpu.convert import load_torch_file
        from psnerf_tpu.preprocess.runner import run_sdps
        from psnerf_tpu.preprocess.sdps import (
            init_lcnet, init_nenet, load_lcnet_torch, load_nenet_torch,
        )
        from psnerf_tpu.train.checkpoints import load_checkpoint

        def load_net(path, stage):
            if path.endswith(".npz"):
                import jax

                template = (init_lcnet(jax.random.PRNGKey(0)) if stage == "lc"
                            else init_nenet(jax.random.PRNGKey(0)))
                return load_checkpoint(path, template)[0]
            blob = load_torch_file(path)
            sd = blob.get("state_dict", blob)
            return (load_lcnet_torch(sd) if stage == "lc"
                    else load_nenet_torch(sd))

        out = run_sdps(args.obj, load_net(args.lcnet, "lc"),
                       load_net(args.nenet, "ne"),
                       train_light=args.train_light,
                       light_intnorm_gt=args.intnorm_gt)
        print(f"SDPS outputs written to {out}")


if __name__ == "__main__":
    main()
