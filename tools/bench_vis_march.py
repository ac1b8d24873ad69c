"""Microbench the export's light-visibility march (its dominant leg).

The shape export's vis_plus leg marches the stage-1 occupancy MLP at
S samples per (surface point, light dir) — reference rendering.py:378-408.
RESULTS_export_ab.json shows it at ~209 s of a ~258 s snowman export while
the raw fused occ kernel runs near roofline, so this bench separates:

  * raw_kernel_tflops  — fused_occ_logit alone on one megabatch (the MLP
    floor as the kernel actually computes it, padded-embed FLOPs);
  * light_chunk sweep  — light_visibility with C lights per lax.map
    iteration (C*N*S-row matmul chains vs C serially-dependent N*S ones);
  * occ tile sweep     — the Pallas kernel's row-tile size.

Prints one JSON object; use it to pick the export's default (light_chunk,
tile). Numbers are steady-state: everything is warmed (incl. the first
device->host readback stall on this tunneled backend) before timing.

Usage: python tools/bench_vis_march.py [--n 4096] [--lights 256]
       [--steps 64] [--reps 3]
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp


def _sync(x):
    """block_until_ready is unreliable on the tunneled backend — read a
    scalar back instead (STATUS.md operational note)."""
    return float(x.reshape(-1)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096,
                    help="surface points per launch (= export tile)")
    ap.add_argument("--lights", type=int, default=256)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--rescale", action="store_true", default=True)
    ap.add_argument("--chunks", type=int, nargs="*",
                    default=[1, 2, 4, 8, 16])
    ap.add_argument("--tiles", type=int, nargs="*", default=[1024, 2048])
    args = ap.parse_args()

    from psnerf_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    from psnerf_tpu.fields.occupancy import OccFieldConfig, init_occupancy_field
    from psnerf_tpu.ops.fused_occ import fused_occ_logit, make_fused_occ_fn
    from psnerf_tpu.render.marching import light_visibility

    cfg = OccFieldConfig(num_layers=8, hidden_dim=256, feat_size=256,
                         octaves_pe=6, octaves_pe_views=4)
    params = init_occupancy_field(jax.random.PRNGKey(0), cfg)

    key = jax.random.PRNGKey(1)
    surf = jax.random.normal(key, (args.n, 3)) * 0.45  # blob inside the box
    dirs = jax.random.normal(jax.random.PRNGKey(2), (args.lights, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    # kernel FLOPs per sample (padded-embed accounting, fused_occ.py):
    # w0 [128,W] + skip-PE [128,W] + (n_lin-2) trunk [W,W] matmuls + head.
    w = cfg.hidden_dim
    n_lin = cfg.num_layers + 1
    flops_per_sample = 2 * (128 * w * 2 + (n_lin - 2) * w * w) + 2 * w

    out = {"n": args.n, "lights": args.lights, "steps": args.steps,
           "backend": jax.default_backend(),
           "flops_per_sample_mf": round(flops_per_sample / 1e6, 4)}

    # ---- warm the backend (first readback can stall for minutes)
    _sync(jnp.zeros((8,)) + 1.0)

    # ---- raw kernel throughput at each tile size
    m = 1 << 22  # 4.19M samples
    pts = jax.random.normal(jax.random.PRNGKey(3), (m, 3)) * 0.45
    for tile in args.tiles:
        f = jax.jit(functools.partial(fused_occ_logit, cfg=cfg, tile=tile))
        _sync(f(params, pts))
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            _sync(f(params, pts))
            ts.append(time.time() - t0)
        dt = min(ts)
        out[f"raw_kernel_tile{tile}_tflops"] = round(
            m * flops_per_sample / dt / 1e12, 1)
        out[f"raw_kernel_tile{tile}_ms"] = round(dt * 1e3, 2)

    # ---- light_visibility sweep: C lights per map iteration
    total_samples = args.n * args.lights * args.steps
    for chunk in args.chunks:
        for tile in args.tiles:

            @jax.jit
            def vis_fn(params, surf, dirs, chunk=chunk, tile=tile):
                occ = make_fused_occ_fn(params, cfg, tile=tile)
                return light_visibility(occ, surf, dirs,
                                        n_steps=args.steps,
                                        rescale=args.rescale,
                                        light_chunk=chunk)

            r = vis_fn(params, surf, dirs)
            _sync(r)
            ts = []
            for _ in range(args.reps):
                t0 = time.time()
                _sync(vis_fn(params, surf, dirs))
                ts.append(time.time() - t0)
            dt = min(ts)
            key_ = f"vis_c{chunk}_tile{tile}"
            out[key_ + "_ms"] = round(dt * 1e3, 1)
            out[key_ + "_tflops"] = round(
                total_samples * flops_per_sample / dt / 1e12, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
