"""Stage-2 training-step roofline on the attached TPU chip.

The reference's hot stage-2 loop (stage2/trainer.py:348-481) samples a pixel
batch per light chunk and runs PSNetwork fwd+bwd per step; psnerf_tpu runs
the same math as ONE compiled train step (train/stage2.py). This tool
measures that step at the reference's bear regime — 8192 pixels x 10 lights
x 16 vis-supervision dirs, flagship net (brdf 4x128, sg 2x64, normal 4x128,
visibility 8x256, bf16 matmuls) — against an analytic FLOP count, and prints
the fraction of the chip's bf16 matmul peak, mirroring the stage-1 analysis
(tools/bench_radiance_kernel.py, README "Why ~37 it/s...").

FLOP accounting (MACs from the exact skip-MLP shapes, x2 FLOP/MAC):
  per pixel:            albedo + rough(+spec-weight) + normal nets
  per (pixel, light):   visibility net (L train lights + Lv vis_train dirs)
  fwd+bwd ~ 3x fwd (standard: bwd does ~2x fwd matmul work)
The measured loop scans K steps over a FIXED resident batch in one launch
(sampling excluded; the runner's megastep gathers batches on device at ~0
cost next to the MLPs — see tools JSON key 'note').

Usage:  python tools/bench_stage2_step.py [--pixels 8192] [--lights 10]
        [--vis-train 16] [--steps 50] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

V5E_BF16_PEAK = 197e12  # TPU v5e (v5 lite) bf16 matmul peak, FLOP/s


def skip_mlp_macs(din: int, dout: int, width: int, depth: int,
                  skip_at: int) -> int:
    """MACs of one point through fields/mlp.py::skip_mlp_apply shapes:
    depth hidden layers + output head; the skip layer re-concats the input."""
    macs = din * width
    for i in range(1, depth):
        cin = width + din if i == skip_at else width
        macs += cin * width
    macs += width * dout
    return macs


def psnet_flops_per_step(cfg, n_px: int, n_lights: int, n_vis_train: int):
    """Analytic fwd FLOPs of one train step's PSNet evaluation."""
    per_px = 0
    # albedo net: emb -> 3
    per_px += skip_mlp_macs(cfg.dim_emb, 3, cfg.mlp_width, cfg.mlp_depth,
                            cfg.mlp_skip_at)
    # sg weights net: emb -> n_weights
    per_px += skip_mlp_macs(cfg.dim_emb, cfg.n_weights, cfg.sg_mlp_width,
                            cfg.sg_mlp_depth, cfg.sg_mlp_skip_at)
    # normal net: emb_n -> 3
    if cfg.normal_mlp:
        per_px += skip_mlp_macs(cfg.dim_emb_n, 3, cfg.normal_mlp_width,
                                cfg.normal_mlp_depth, cfg.normal_mlp_skip_at)
    per_px_light = 0
    if cfg.visibility:
        per_px_light = skip_mlp_macs(cfg.dim_emb * 2, 1, cfg.vis_mlp_width,
                                     cfg.vis_mlp_depth, cfg.vis_mlp_skip_at)
    macs = n_px * per_px + n_px * (n_lights + n_vis_train) * per_px_light
    return 2 * macs  # FLOPs, forward


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pixels", type=int, default=8192)
    ap.add_argument("--lights", type=int, default=10)
    ap.add_argument("--vis-train", type=int, default=16)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=("bfloat16", "float32"))
    ap.add_argument("--total-lights", type=int, default=96)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from psnerf_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from psnerf_tpu.fields.psnet import PSNetConfig, init_psnet
    from psnerf_tpu.train.stage2 import (
        Stage2TrainConfig,
        init_stage2_params,
        make_stage2_train_step,
    )

    cfg = PSNetConfig(light_int=1.2, compute_dtype=args.dtype)
    tcfg = Stage2TrainConfig(warmup_iters=0, train_order=False)
    init_opt, step = make_stage2_train_step(cfg, tcfg)

    key = jax.random.PRNGKey(0)
    n, L, Lv = args.pixels, args.lights, args.vis_train
    rng = np.random.default_rng(0)
    dirs0 = rng.normal(size=(args.total_lights, 3))
    dirs0 /= np.linalg.norm(dirs0, axis=-1, keepdims=True)
    params = init_stage2_params(
        init_psnet(key, cfg), jnp.asarray(dirs0, jnp.float32),
        jnp.ones((args.total_lights, 1), jnp.float32))
    opt_state = init_opt(params)

    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0, 0, -3.0]
    K = np.asarray([[300.0, 0, 256, 0], [0, 300.0, 256, 0],
                    [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    pts = (rng.normal(size=(n, 3)) * 0.3).astype(np.float32)
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    lvt = rng.normal(size=(Lv, 3)).astype(np.float32)
    lvt /= np.linalg.norm(lvt, axis=-1, keepdims=True)
    batch = {
        "uv": jnp.asarray(rng.uniform(0, 512, size=(n, 2)), jnp.float32),
        "pose": jnp.asarray(pose), "intrinsics": jnp.asarray(K),
        "object_mask": jnp.ones((n,), bool),
        "points": jnp.asarray(pts), "normal": jnp.asarray(nrm),
        "surface_mask": jnp.ones((n,), bool),
        "rgb_gt": jnp.asarray(rng.uniform(size=(L, n, 3)), jnp.float32),
        "l_slt": jnp.arange(L, dtype=jnp.int32),
        "visibility": jnp.ones((L, n), jnp.float32),
        "light_vis_train": jnp.asarray(lvt),
        "vis_train_gt": jnp.ones((Lv, n), jnp.float32),
    }

    k_steps = args.steps

    @jax.jit
    def run(params, opt_state, key):
        def body(carry, i):
            p, o, k = carry
            k, sub = jax.random.split(k)
            p, o, terms = step(p, o, batch, i.astype(jnp.float32), sub)
            return (p, o, k), terms["loss"]

        (p, o, k), losses = jax.lax.scan(
            body, (params, opt_state, key), jnp.arange(k_steps))
        return p, o, losses[-1]

    def sync(x):
        return float(np.asarray(x))  # scalar read = reliable tunnel sync

    # warmup/compile
    t0 = time.time()
    p, o, last = run(params, opt_state, key)
    sync(last)
    compile_s = time.time() - t0

    times = []
    for _ in range(args.reps):
        t0 = time.time()
        p, o, last = run(p, o, key)
        sync(last)
        times.append(time.time() - t0)
    best = min(times)
    ms_per_step = best / k_steps * 1e3
    it_s = k_steps / best

    fwd = psnet_flops_per_step(cfg, n, L, Lv)
    total = 3 * fwd  # fwd + bwd
    tflops = total / (best / k_steps) / 1e12
    frac = tflops * 1e12 / V5E_BF16_PEAK

    res = {
        "config": {"pixels": n, "lights": L, "vis_train": Lv,
                   "dtype": args.dtype, "scan_steps": k_steps,
                   "vis_mlp": f"{cfg.vis_mlp_depth}x{cfg.vis_mlp_width}"},
        "compile_s": round(compile_s, 1),
        "ms_per_step": round(ms_per_step, 3),
        "it_per_s": round(it_s, 1),
        "flops_fwd_per_step": fwd,
        "flops_total_per_step": total,
        "achieved_tflops": round(tflops, 1),
        "frac_of_v5e_bf16_peak": round(frac, 3),
        "note": ("fixed resident batch scanned on device; production "
                 "megastep adds an on-device gather per step"),
    }
    print(json.dumps(res))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
