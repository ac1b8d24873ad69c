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
    ap.add_argument("--s1-dtype", choices=("float32", "bfloat16"),
                    default="bfloat16",
                    help="activation storage dtype of the stage-1 field's "
                         "differentiated pass (training is HBM-bound; "
                         "bfloat16 halves the traffic, params stay f32)")
    ap.add_argument("--seed", type=int, default=0,
                    help="training seed for both runners (the scene itself "
                         "stays seed-fixed, so different seeds measure "
                         "same-config trajectory spread)")
    ap.add_argument("--mesh-upsample", type=int, default=3,
                    help="MISE upsampling steps from res0 64 (3 = 512^3)")
    ap.add_argument("--light-bs", type=int, default=8,
                    help="stage-2 training light batch (reference bear: 10 "
                         "of 96, confs/bear.conf:17)")
    ap.add_argument("--vis-train-num", type=int, default=8,
                    help="stage-2 vis-supervision light count per step")
    ap.add_argument("--vis-plus-num", type=int, default=64,
                    help="extra FPS-sampled visibility supervision dirs "
                         "exported per view (reference vis_plus)")
    ap.add_argument("--vis-steps", type=int, default=64,
                    help="visibility-march steps in the shape export")
    ap.add_argument("--vis-rescale", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="span the visibility-march step budget over "
                         "[lnear, per-ray box exit] instead of the "
                         "reference's fixed [0.1, 3.5] grid — at the "
                         "default 64 steps this cuts the export 2.54x at "
                         "equal-or-better accuracy (RESULTS_export_ab.json, "
                         "PARITY.md delta 12; end-to-end neutrality "
                         "validated at 96 lights). "
                         "--no-vis-rescale --vis-steps 128 restores the "
                         "reference-faithful export")
    ap.add_argument("--vis-plus-guided", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="march the vis_plus supervision dirs with the "
                         "occupancy-grid-guided interval at 16 steps (the "
                         "measured Pareto point; marching.py "
                         "occupancy_guide_grid, A/B in RESULTS_export_ab"
                         ".json). Train-light visibility keeps the "
                         "--vis-steps/--vis-rescale protocol.")
    ap.add_argument("--vis-weight", type=float, default=1.0,
                    help="post-warmup visibility loss weight")
    ap.add_argument("--warmup-iters", type=int, default=300,
                    help="stage-2 train_fix warm-up iterations (vis+normal "
                         "only, albedo/rough/lights frozen)")
    ap.add_argument("--stage1-only", action="store_true",
                    help="stop after stage-1 train+eval (workdir is then "
                         "ready for tools/bench_shape_export.py)")
    ap.add_argument("--scene", choices=("sphere", "snowman"),
                    default="sphere",
                    help="snowman: non-convex two-sphere scene with analytic "
                         "CAST shadows — adds shadow-accuracy metrics and a "
                         "relighting shadow-contrast check to the summary")
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
    summary = {"config": f"{args.hw}px x {args.views} views x "
                         f"{args.lights} lights, stage1 {args.stage1_iters} "
                         f"its, stage2 {args.stage2_iters} its"}

    t0 = time.time()
    scene_kw = {}
    if args.scene == "snowman":
        from psnerf_tpu.data.synthetic import SNOWMAN_SPHERES

        scene_kw = dict(spheres=SNOWMAN_SPHERES, light_spread=0.9)
    generate_synthetic_scene(scene_dir, n_views=args.views, n_test=1,
                             n_lights=args.lights, hw=(args.hw, args.hw),
                             radius=0.6, focal=1.6 * args.hw, **scene_kw)
    summary["scene"] = args.scene
    summary["scene_s"] = round(time.time() - t0, 1)

    # a process's FIRST device->host readback on the tunneled backend can
    # stall for minutes while the remote service spins up; pay it here,
    # visibly, so it cannot pollute the stage timings below
    t0 = time.time()
    import jax
    import jax.numpy as jnp

    jax.device_get(jnp.zeros((8,)) + 1.0)
    summary["backend_warmup_s"] = round(time.time() - t0, 1)

    cfg1 = Stage1Config(
        field=OccFieldConfig(num_layers=8, hidden_dim=256, feat_size=256,
                             octaves_pe=6, octaves_pe_views=4,
                             compute_dtype=args.s1_dtype),
        render=UnisurfConfig(near=1.2, far=5.0, radius=1.2,
                             interval_start=0.6, interval_end=0.05,
                             interval_decay=3e-4, num_points_in=32,
                             num_points_out=16, ray_marching_steps=128),
        train=Stage1TrainConfig(
            # the reference's 2-step MultiStepLR (scheduler_milestones
            # [4000, 8000] epochs x 0.5, bear.yaml:49) scaled to the demo
            # budget: without terminal lr decay, which seed a run ends on
            # is final-iterate luck — diagnosed across 5 constant-lr seeds,
            # whose bad runs ended on a loss spike 2-5x above their own
            # trajectory minimum (docs/stage1_quality.md)
            learning_rate=5e-4,
            # Stage1Runner scales these by n_views (reference milestones
            # are EPOCHS, scheduler stepped per epoch, train.py:135)
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
    r1.train(args.stage1_iters, log_every=200)
    summary["stage1_train_s"] = round(time.time() - t0, 1)
    summary["stage1_it_s"] = round(args.stage1_iters / max(
        time.time() - t0, 1e-9), 1)

    t0 = time.time()
    r1.render_visdata(os.path.join(wd, "stage1_vis.png"), views=(0,))
    m = r1.eval_views(os.path.join(wd, "stage1_eval"), "test", tile=4096)
    summary["stage1_eval_psnr"] = round(float(np.mean([x["psnr"] for x in m])), 2)
    summary["stage1_eval_s"] = round(time.time() - t0, 1)

    if args.stage1_only:
        print(json.dumps(summary, indent=2))
        return

    t0 = time.time()
    exports = os.path.join(wd, "exports")
    legs = r1.shape_extract(
        exports, visibility=True, vis_plus=True,
        vis_plus_num=args.vis_plus_num, tile=4096, n_steps=256,
        vis_steps=args.vis_steps, vis_rescale=args.vis_rescale,
        vis_plus_guided=args.vis_plus_guided)
    summary["shape_extract_s"] = round(time.time() - t0, 1)
    summary["shape_extract_legs"] = legs

    t0 = time.time()
    from psnerf_tpu.data.synthetic import _normalize_spheres
    from psnerf_tpu.mesh import chamfer_distance, extract_mesh

    spheres = _normalize_spheres(scene_kw.get("spheres"), 0.6)

    def gt_field(p):  # union-of-spheres SDF (inside-positive)
        return np.max(np.stack([
            r - np.linalg.norm(p - np.asarray(c)[None], axis=-1)
            for c, r in spheres]), axis=0)

    # Headline extraction at the reference's production protocol: res0 64 +
    # `mesh_upsample` refinement steps (3 -> 512^3 effective,
    # extracting.py:75-135). The decomposition below separates field error
    # from extraction-resolution error (the round-2 numbers were published
    # from a 128^3 extraction with the resolution unrecorded — VERDICT r2).
    res0, ups = 64, args.mesh_upsample
    # mask_carve = the reference's silhouette-carving step (extracting.py:
    # 120-126, value_grid[~occ] = -30): regions outside every training
    # frustum are unconstrained by the mask loss and can hold spurious
    # occupancy — without carving they surface as floaters that dominate
    # the Chamfer number.
    # both protocols from ONE evaluated+carved grid: raw (the reference's
    # extracting.py protocol) + exterior-only (flood-filled interior pockets
    # — UNISURF interiors are unsupervised and can hollow out; the raw
    # protocol then samples cavity walls, see RESULTS_snowman note)
    (verts, tris), (v_ext, t_ext) = r1.extract_mesh_both(
        os.path.join(wd, "mesh.ply"), os.path.join(wd, "mesh_exterior.ply"),
        resolution0=res0, upsampling=ups, mask_carve=True)
    # mesh_extract_s = the PIPELINE's mesh step (grid eval + carve + both
    # marches + ply save); everything after is evaluation-protocol overhead
    # (analytic GT meshes on the 1-core host + BVH Chamfer), reported
    # separately as mesh_protocol_s
    summary["mesh_extract_s"] = round(time.time() - t0, 1)
    v_gt, t_gt = extract_mesh(gt_field, resolution0=res0, upsampling_steps=ups)
    cd = chamfer_distance(verts, tris, v_gt, t_gt)
    summary["mesh_resolution"] = (
        f"res0 {res0} + {ups} upsamplings ({res0 * 2 ** ups}^3 effective), "
        "silhouette-carved (extracting.py:120-126 protocol)")
    summary["mesh_chamfer_mm"] = round(cd * 1000, 3)
    summary["mesh_chamfer_exterior_mm"] = round(
        chamfer_distance(v_ext, t_ext, v_gt, t_gt) * 1000, 3)
    # extraction-resolution floor: the SAME analytic field extracted at the
    # round-2 resolution (128^3) vs the headline resolution — pure
    # discretization, no field error
    v_lo, t_lo = extract_mesh(gt_field, resolution0=32, upsampling_steps=2)
    summary["mesh_extraction_floor_128_mm"] = round(
        chamfer_distance(v_lo, t_lo, v_gt, t_gt) * 1000, 3)
    v_plo, t_plo = r1.extract_mesh_to(os.path.join(wd, "mesh_128.ply"),
                                      resolution0=32, upsampling=2,
                                      mask_carve=True)
    summary["mesh_chamfer_128_mm"] = round(
        chamfer_distance(v_plo, t_plo, v_lo, t_lo) * 1000, 3)
    summary["mesh_s"] = round(time.time() - t0, 1)
    summary["mesh_protocol_s"] = round(
        summary["mesh_s"] - summary["mesh_extract_s"], 1)
    summary["mesh_tris"] = int(len(tris))

    cfg2 = Stage2Config(
        net=PSNetConfig(light_int=1.2, compute_dtype="bfloat16"),
        train=Stage2TrainConfig(
            sg_learning_rate=5e-4, light_learning_rate=5e-4,
            train_order=True, warmup_iters=args.warmup_iters,
            weights=Stage2LossWeights(vis_weight=args.vis_weight)),
        data_dir=scene_dir, stage1_shape_path=exports,
        inten_normalize=None,
        light_bs=args.light_bs, vis_train_num=args.vis_train_num,
        num_pixels=4096,
        # the reference's 5-step sg_sched_milestones (bear.conf:49, x0.5
        # each, evenly spaced once scaled by dataset x light_bs,
        # trainer.py:118-124) scaled to the demo budget; Stage2Runner
        # converts epochs -> iters via n_views * light_bs
        sched_milestones_epochs=tuple(
            max(1, args.stage2_iters * k // 5 // (args.views * args.light_bs))
            for k in range(1, 5)),
        train_all_pixels=False, ckpt_freq=100000,
    )
    t0 = time.time()
    r2 = Stage2Runner(cfg2, os.path.join(wd, "stage2"), seed=args.seed,
                      resume=True)
    r2.train(args.stage2_iters, log_every=200)
    summary["stage2_train_s"] = round(time.time() - t0, 1)
    summary["stage2_it_s"] = round(args.stage2_iters / max(
        time.time() - t0, 1e-9), 1)

    t0 = time.time()
    test_out = os.path.join(wd, "test_out")
    r2.evaluate(test_out, split="test", tile=4096)
    summary["stage2_eval_s"] = round(time.time() - t0, 1)

    from psnerf_tpu.eval.evaluation import evaluate_outputs
    res = evaluate_outputs(scene_dir, test_out)
    summary.update({f"final_{k}": (round(v, 3) if isinstance(v, float) else v)
                    for k, v in res.items()})

    if args.scene == "snowman":
        summary.update(_shadow_metrics(r2, scene_dir, exports))

    # relight + edit smoke
    # keep the integrated radiance O(1): 512 directional lights sum, so mean
    # texel ~ 1/L (the reference exposes the same knob as --envmap_scale)
    env = np.full((16, 32, 3), 0.002, np.float32)
    env[3:9, 8:18] = [0.03, 0.025, 0.018]
    r2.render_envmap(os.path.join(wd, "relight"), env, tile=4096)
    r2.edit_material(os.path.join(wd, "edit"),
                     albedo_new=np.asarray([0.75, 0.15, 0.1]), basis_new=4)
    if args.scene == "snowman":
        summary.update(_relight_shadow_contrast(r2, scene_dir, wd))

    with open(os.path.join(wd, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


def _scene_geometry(scene_dir, view):
    """Analytic surface + light rig of a synthetic scene view."""
    from psnerf_tpu.data.synthetic import _normalize_spheres, _trace_spheres

    with open(os.path.join(scene_dir, "params.json")) as f:
        pj = json.load(f)
    spheres = _normalize_spheres(
        [(s[:3], s[3]) for s in pj.get("synthetic_spheres", [])] or None, 0.6)
    pose_gl = np.asarray(pj["pose_c2w"][view], np.float32)
    pose_cv = pose_gl.copy()
    pose_cv[:3, 1:3] *= -1.0
    K = np.asarray(pj["K"], np.float32)
    h, w = pj["imhw"]
    hit, pts, nrm, _, sid = _trace_spheres(pose_cv, K, (h, w), spheres)
    l_world = np.einsum("ij,kj->ki", pose_gl[:3, :3],
                        np.asarray(pj["light_direction"], np.float32))
    return pj, spheres, hit, pts, nrm, sid, l_world


def _shadow_metrics(r2, scene_dir, exports):
    """Cast-shadow fidelity of the REAL pipeline outputs on train view 0:
    (a) stage-1 MARCHED visibility (shape_extract exports) vs the analytic
    shadowed ground truth — VERDICT item 3's <5%-shadow-error gate;
    (b) the TRAINED stage-2 visibility MLP's cast/lit accuracy."""
    import jax.numpy as jnp

    from psnerf_tpu.data.synthetic import analytic_visibility
    from psnerf_tpu.render import render_psnet

    pj, spheres, hit, pts, nrm, sid, l_world = _scene_geometry(scene_dir, 0)
    vis_gt = analytic_visibility(pts, nrm, sid, l_world, spheres)  # [L,H,W]
    vis_marched = np.load(os.path.join(exports, "visibility", "view_01.npy"))

    cos = np.einsum("hwi,li->lhw", nrm, l_world)
    front = hit[None] & (cos > 0.1)
    gt_bin = vis_gt > 0.5
    pred_bin = vis_marched > 0.5
    overall_err = float((gt_bin != pred_bin)[front].mean())
    shadowed = front & ~gt_bin
    shadow_err = float((pred_bin[shadowed]).mean()) if shadowed.sum() else 0.0
    # interior = shadowed set eroded 1px per light: drops the boundary ring
    # where the 128-step march's penumbra legitimately straddles the edge
    # (same clear-margin methodology as tests/test_shadows)
    from scipy import ndimage

    interior = np.stack([ndimage.binary_erosion(s) for s in shadowed])
    interior_err = (float(pred_bin[interior].mean())
                    if interior.sum() else 0.0)

    out = {
        "marched_vis_err_frontlit": round(overall_err, 4),
        "marched_vis_err_shadowed": round(shadow_err, 4),
        "marched_vis_err_shadow_interior": round(interior_err, 4),
        "n_cast_shadow_px": int(shadowed.sum()),
    }

    # trained visibility MLP on the same view (runner's own data arrays)
    import jax

    d = r2.data
    mask = np.asarray(d["surface_mask"][0]).astype(bool)
    o = jax.jit(lambda p, pts, nrm, msk, rays, ld, li: render_psnet(
        p, r2.cfg.net, pts, nrm, msk, rays, ld, li))(
        r2.params["model"],
        d["points"][0], d["normals"][0], d["surface_mask"][0],
        jnp.zeros_like(d["points"][0]),
        jnp.asarray(l_world), jnp.ones((len(l_world),)),
    )
    vis_pred = np.asarray(o["visibility"])[..., 0]        # [L, N]
    gt_flat = np.asarray(d["visibility"][0])              # [L, N]
    cosf = cos.reshape(len(l_world), -1)
    cast = (cosf > 0.15) & (gt_flat < 0.5) & mask[None]
    lit = (cosf > 0.15) & (gt_flat > 0.5) & mask[None]
    if cast.sum():
        out["vis_mlp_cast_acc"] = round(float((vis_pred[cast] < 0.5).mean()), 4)
    if lit.sum():
        out["vis_mlp_lit_acc"] = round(float((vis_pred[lit] > 0.5).mean()), 4)
    return out


def _relight_shadow_contrast(r2, scene_dir, wd):
    """Envmap relighting must PRESERVE cast shadows: under the demo's
    concentrated-patch envmap, analytically-shadowed pixels (w.r.t. the
    patch's mean direction) must come out darker than cosine-matched lit
    pixels on the relit test view."""
    import imageio.v2 as imageio

    from psnerf_tpu.core.spherical import gen_light_xyz
    from psnerf_tpu.data.synthetic import analytic_visibility

    data = r2._eval_data("test")
    vi = int(data["views"][0])
    pj, spheres, hit, pts, nrm, sid, _ = _scene_geometry(scene_dir, vi)

    lxyz, _ = gen_light_xyz(16, 32, envmap_radius=1.0)
    patch = lxyz[3:9, 8:18].reshape(-1, 3)
    patch = patch / np.linalg.norm(patch, axis=-1, keepdims=True)
    d_star = patch.mean(0)
    d_star /= np.linalg.norm(d_star)

    vis = analytic_visibility(pts, nrm, sid, d_star[None], spheres)[0]
    cos = np.einsum("hwi,i->hw", nrm, d_star)
    img = np.asarray(imageio.imread(os.path.join(
        wd, "relight", "rgb", "img", f"view_{vi + 1:02d}.png")),
        np.float32) / 255.0
    lum = img[..., :3].mean(-1)

    cast = hit & (cos > 0.3) & (vis < 0.5)
    lit = hit & (cos > 0.3) & (vis > 0.5)
    out = {"relight_cast_px": int(cast.sum()), "relight_lit_px": int(lit.sum())}
    if cast.sum() > 20 and lit.sum() > 20:
        out["relight_shadow_contrast"] = round(
            float(lum[lit].mean() / max(lum[cast].mean(), 1e-6)), 3)
    return out


if __name__ == "__main__":
    main()
