"""Micro-bench the vis_plus march protocols on a trained checkpoint (TPU).

Times ONLY the visibility march (one tile x L lights), steady-state, for
rescaled-{64,32} and guided-{32,24} x guide_coarse {8,16,32}: separates
the MLP-march cost from the guide-probe (gather) cost so the default
guided protocol (runners/stage1.py shape_extract vis_plus_guided) is the
measured optimum, not a guess. See RESULTS_export_ab.json for the
end-to-end export A/B these legs feed.

  python tools/bench_vis_guided_sweep.py --workdir /tmp/snow_r5
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--tile", type=int, default=4096)
    ap.add_argument("--lights", type=int, default=32,
                    help="lights per timed call (vis_plus uses 256 total; "
                         "cost is linear in L, light_chunk=1)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from psnerf_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from psnerf_tpu.config import Stage1Config
    from psnerf_tpu.fields.occupancy import OccFieldConfig, occ_alpha
    from psnerf_tpu.render.marching import (
        light_visibility,
        occupancy_guide_grid,
    )
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
    params, fcfg = r1.params, cfg1.field

    occ_fn_of = lambda p: (lambda q: occ_alpha(p, q, fcfg))

    # surface points: bisect each radial ray (origin -> random direction)
    # onto the trained field's 0.5 level set so the agreement columns see
    # REAL self-occlusion geometry, not an arbitrary shell (interior points
    # read vis~0 under every protocol and would inflate agreement); rays
    # that never cross 0.5 keep their outermost sample and behave like
    # detached background points (a minority, matching masked-out pixels)
    rng = np.random.default_rng(0)
    d = rng.normal(size=(args.tile, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)

    @jax.jit
    def to_surface(p):
        occ = occ_fn_of(p)
        lo = jnp.zeros((args.tile,))
        hi = jnp.full((args.tile,), 1.1)

        def body(_, lohi):
            lo, hi = lohi
            mid = 0.5 * (lo + hi)
            inside = occ(d * mid[:, None]) > 0.5
            return jnp.where(inside, mid, lo), jnp.where(inside, hi, mid)

        lo, hi = jax.lax.fori_loop(0, 24, body, (lo, hi))
        return d * (0.5 * (lo + hi))[:, None]

    surf = to_surface(params)
    radii = np.linalg.norm(np.asarray(surf), axis=-1)
    print(f"[surface] occ(origin)="
          f"{float(occ_fn_of(params)(jnp.zeros((1, 3)))[0]):.3f} "
          f"radii p5/p50/p95 = {np.percentile(radii, 5):.3f}/"
          f"{np.percentile(radii, 50):.3f}/{np.percentile(radii, 95):.3f}",
          file=sys.stderr)
    ld = rng.normal(size=(args.lights, 3))
    ld /= np.linalg.norm(ld, axis=-1, keepdims=True)
    ldir = jnp.asarray(ld, jnp.float32)


    guides = {}
    for gres, dilate in ((64, 1), (64, 3), (32, 2), (16, 2)):
        guides[(gres, dilate)] = jax.jit(
            lambda p, r=gres, d=dilate: occupancy_guide_grid(
                occ_fn_of(p), res=r, dilate=d))(params)
    jax.device_get(guides[(64, 1)][0, 0, 0])  # warm first-readback stall

    def timed(fn, *a):
        out = np.asarray(jax.device_get(fn(*a)))  # compile + warm
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            jax.device_get(fn(*a)[0, 0])
            ts.append(time.time() - t0)
        return min(ts), out

    res = {"tile": args.tile, "lights": args.lights}
    base = None
    for steps, rescale, tag in ((128, False, "fixed128"),
                                (64, True, "rescaled64"),
                                (32, True, "rescaled32"),
                                (16, True, "rescaled16")):
        f = jax.jit(lambda p, s, l, st=steps, rs=rescale: light_visibility(
            occ_fn_of(p), s, l, n_steps=st, rescale=rs))
        t, out = timed(f, params, surf, ldir)
        res[f"{tag}_s"] = round(t, 4)
        if base is None:
            base = out  # faithful protocol = agreement reference
        else:
            res[f"{tag}_agree"] = round(
                float(((out > .5) == (base > .5)).mean()), 5)
    # guided variants: probe spacing must stay <= the dilated-occupied
    # thickness ((2*dilate+1) * cell) for worst-case span ~3.8, else thin
    # occluders can fall between probes — (64,1,32) is the shipped default,
    # (32,2,16) and (16,2,8) are the calibrated cheaper-probe candidates,
    # (64,3,16) a finer-grid alternative at the same probe budget
    for steps in (32, 24, 16):
        for gres, dilate, coarse in ((64, 1, 32), (64, 3, 16),
                                     (32, 2, 16), (16, 2, 8)):
            f = jax.jit(lambda p, s, l, g, st=steps, gc=coarse:
                        light_visibility(occ_fn_of(p), s, l, n_steps=st,
                                         guide=g, guide_coarse=gc))
            t, out = timed(f, params, surf, ldir, guides[(gres, dilate)])
            key = f"guided{steps}_r{gres}d{dilate}c{coarse}"
            res[f"{key}_s"] = round(t, 4)
            res[f"{key}_agree"] = round(
                float(((out > .5) == (base > .5)).mean()), 5)
    print(json.dumps(res, indent=2))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(res, fh, indent=2)


if __name__ == "__main__":
    main()
