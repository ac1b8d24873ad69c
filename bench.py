"""Benchmark: stage-2 multi-light frame render throughput on one chip.

Primary metric (BASELINE.json): pixel-light rays/sec for a 512x512 x 96-light
stage-2 render. `vs_baseline` compares the fused single-launch frame renderer
against a faithful emulation of the reference's serialization — 64-light
chunks x 1024-pixel splits, each a separate device dispatch
(stage2/eval.py:347-365) — measured on the SAME chip, same math, so the ratio
isolates the design (megabatch + vmapped lights vs nested Python loops).

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

H = W = 512
N_LIGHTS = 96
TILE = 4096
REPS = 5


def setup():
    from psnerf_tpu.fields import PSNetConfig, init_psnet

    # full bear config: 9x3 SG basis, vis MLP 8x256. bf16 matmuls + the
    # Pallas fused vis kernel are the production eval path; the rgb delta vs
    # the true-f32 XLA path is measured fresh on EVERY run and reported as
    # bf16_rgb_max_abs_err (max over all 512*512*96 values in [0,1] — a
    # worst-case stat; quality parity is gated in tests/eval on real scenes).
    cfg = PSNetConfig(compute_dtype="bfloat16")
    params = init_psnet(jax.random.PRNGKey(0), cfg)

    n = H * W
    key = jax.random.PRNGKey(1)
    # synthetic surface of a sphere-ish blob (throughput is weight/data
    # independent; quality parity is validated separately in tests/eval)
    pts = jax.random.normal(key, (n, 3)) * 0.3
    nrm = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    mask = jnp.ones((n,), bool)
    xs, ys = jnp.meshgrid(jnp.arange(W), jnp.arange(H), indexing="ij")
    uv = jnp.stack([xs, ys], -1).reshape(-1, 2).astype(jnp.float32)
    pose = jnp.eye(4).at[:3, 3].set(jnp.asarray([0.0, 0.0, -3.0]))
    K = jnp.asarray(
        [[500.0, 0, W / 2, 0], [0, 500.0, H / 2, 0], [0, 0, 1, 0], [0, 0, 0, 1.0]]
    )
    ldirs = jax.random.normal(jax.random.PRNGKey(3), (N_LIGHTS, 3))
    ldirs = ldirs / jnp.linalg.norm(ldirs, axis=-1, keepdims=True)
    lints = jnp.full((N_LIGHTS,), 2.0)
    return cfg, params, (uv, pose, K, pts, nrm, mask, ldirs, lints)


def _sync(x):
    """Force completion: block_until_ready is not reliable on the tunneled
    axon backend — read a scalar back instead."""
    return float(x.reshape(-1)[0])


def bench_fused(cfg, params, args):
    # rgb_cnl: every (light, pixel) rgb value materialized on device in the
    # kernel's channel-major [3, N, L] layout (the host assembles per-light
    # images from it, exactly as the torch reference's host assembles its
    # 1024-px chunk outputs — the reference never materializes a device
    # [L, N, 3] either). Avoids a ~36 ms minor-dim-3 device transpose.
    from psnerf_tpu.eval import make_frame_renderer

    render = make_frame_renderer(cfg, tile=TILE, outputs=("rgb_cnl",),
                                 use_fused_vis=True)
    out = render(params, *args)  # compile
    _sync(out["rgb_cnl"])
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = render(params, *args)
        _sync(out["rgb_cnl"])
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]  # median: tunnel latency is heavy-tailed
    # steady-state: K frames enqueued back-to-back, ONE final sync — this is
    # how eval loops actually consume the renderer (queue all views/tiles,
    # fetch at the end), and it amortizes the ~30 ms host<->device tunnel
    # round trip the single-dispatch median pays per frame. Median of 5
    # passes: single-pass stream times vary ~10% on the tunneled backend.
    k = 8
    stream_times = []
    for _ in range(5):
        t0 = time.perf_counter()
        outs = [render(params, *args) for _ in range(k)]
        _sync(outs[-1]["rgb_cnl"])
        stream_times.append((time.perf_counter() - t0) / k)
    stream_times.sort()
    dt_stream = stream_times[len(stream_times) // 2]
    return dt, dt_stream, out["rgb_cnl"]


def measure_bf16_parity(cfg, params, args, rgb_fused):
    """Gate the bf16 design trade with a NUMBER every run: render the same
    frame through the f32 XLA streaming path (true-f32 matmuls) and report
    max |drgb| vs the fused bf16 kernel output (rgb in [0,1])."""
    import dataclasses

    from psnerf_tpu.eval import make_frame_renderer

    cfg32 = dataclasses.replace(cfg, compute_dtype="float32")
    render = make_frame_renderer(cfg32, tile=TILE, outputs=("rgb_cnl",),
                                 use_fused_vis=False)
    with jax.default_matmul_precision("float32"):
        ref = render(params, *args)["rgb_cnl"]
        err = float(jnp.max(jnp.abs(ref - rgb_fused)))
    return round(err, 6)


def bench_reference_device(cfg, params, args, light_chunk=64, px_chunk=1024,
                           reps=3, precision="float32"):
    """Reference ALGORITHM as one compiled program: the 64-light x 1024-pixel
    chunk structure (stage2/eval.py:347-365, --light_batch default 64 at
    :442) executed back-to-back on device (lax.map over the full chunks +
    one remainder call, so 96 lights run as 64+32 exactly like the
    reference), per-point heads recomputed for every light
    chunk as the reference does. This is a conservative LOWER bound on the
    reference's per-frame cost — it removes all of the reference's Python
    dispatch and host<->device overhead and runs its kernels on the same TPU.
    Full frame, median of `reps` (no sampling/extrapolation: the tunnel sync
    overhead would be scaled up with the sample otherwise).

    precision: "float32" pins true-f32 matmuls, faithful to the torch
    reference's numerics (torch CUDA matmuls are f32; it never validated a
    bf16 path). "default" lets XLA use bf16 multiplication passes — the same
    trade OUR pipeline makes deliberately (rgb delta measured every run as
    bf16_rgb_max_abs_err in the output line);
    reported separately for transparency."""
    import dataclasses

    from psnerf_tpu.render.shading import render_psnet
    from psnerf_tpu.core.rays import get_camera_params

    cfg = dataclasses.replace(cfg, compute_dtype="float32")
    uv, pose, K, pts, nrm, mask, ldirs, lints = args
    ray_dirs, _ = get_camera_params(uv, pose, K)
    n = uv.shape[0]
    n_px = n // px_chunk
    n_full = N_LIGHTS // light_chunk
    n_rem = N_LIGHTS % light_chunk

    @jax.jit
    def frame(params):
        tiles = (
            pts.reshape(n_px, px_chunk, 3),
            nrm.reshape(n_px, px_chunk, 3),
            mask.reshape(n_px, px_chunk),
            ray_dirs.reshape(n_px, px_chunk, 3),
        )
        ld = ldirs[: n_full * light_chunk].reshape(n_full, light_chunk, 3)
        li = lints[: n_full * light_chunk].reshape(n_full, light_chunk)

        def px_tile(t):
            p, nr, msk, r = t

            def light_chunk_fn(i):
                return render_psnet(params, cfg, p, nr, msk, r, ld[i], li[i])["rgb"]

            out = jax.lax.map(light_chunk_fn, jnp.arange(n_full))
            out = out.reshape(n_full * light_chunk, px_chunk, 3)
            if n_rem:
                rem = render_psnet(
                    params, cfg, p, nr, msk, r,
                    ldirs[n_full * light_chunk:],
                    lints[n_full * light_chunk:])["rgb"]
                out = jnp.concatenate([out, rem], axis=0)
            return out

        return jax.lax.map(px_tile, tiles)

    ctx = (jax.default_matmul_precision("float32")
           if precision == "float32" else _nullcontext())
    with ctx:
        out = frame(params)
        _sync(out)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = frame(params)
            _sync(out)
            times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


class _nullcontext:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def bench_stage1_train(n_steps=50, reps=3):
    """Stage-1 training throughput at the full bear config (2048 rays x 256
    marching steps, 64+32 integration samples), production path: fused Pallas
    marching kernel + bf16 activation storage, n_steps scanned per dispatch
    (the runners' megastep). Returns steps/sec."""
    import dataclasses

    import numpy as np

    from psnerf_tpu.fields.occupancy import OccFieldConfig, init_occupancy_field
    from psnerf_tpu.render.unisurf import UnisurfConfig
    from psnerf_tpu.train.stage1 import Stage1TrainConfig, make_stage1_train_step

    fcfg = OccFieldConfig(compute_dtype="bfloat16")
    rcfg = UnisurfConfig()
    tcfg = Stage1TrainConfig(n_training_points=2048)
    params = init_occupancy_field(jax.random.PRNGKey(0), fcfg)
    on_tpu = jax.default_backend() != "cpu"
    init_opt, step = make_stage1_train_step(
        fcfg, rcfg, tcfg, use_fused_occ=on_tpu, use_fused_radiance=on_tpu)
    opt_state = init_opt(params)

    n = tcfg.n_training_points
    rng = np.random.default_rng(0)
    batch = {
        "pixels": jnp.asarray(rng.uniform(-1, 1, (n, 2)), jnp.float32),
        "rgb_gt": jnp.full((n, 3), 0.5),
        "camera_mat": jnp.eye(4),
        "world_mat": jnp.eye(4),
        "normal_gt": jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1)),
        "norm_mask": jnp.ones((n,), bool),
        "mask_gt": jnp.ones((n,)),
        "mask_valid": jnp.ones((n,), bool),
    }

    @jax.jit
    def many(params, opt_state, key):
        def body(carry, i):
            params, opt_state, key = carry
            key, k = jax.random.split(key)
            params, opt_state, terms = step(
                params, opt_state, batch, 6000.0 + i, k, use_outside=True)
            return (params, opt_state, key), terms["loss"]

        (params, opt_state, key), losses = jax.lax.scan(
            body, (params, opt_state, key), jnp.arange(n_steps))
        return params, opt_state, losses

    key = jax.random.PRNGKey(1)
    params, opt_state, losses = many(params, opt_state, key)
    _sync(losses)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        params, opt_state, losses = many(params, opt_state, key)
        _sync(losses)
        times.append(time.perf_counter() - t0)
    times.sort()
    return n_steps / times[len(times) // 2]


def bench_stage2_train(n_steps=50, reps=3):
    """Stage-2 training throughput at the bear config (8192 px x 10 lights,
    full PSNet incl. 8x256 visibility MLP), n_steps scanned per dispatch.
    Returns steps/sec."""
    import numpy as np

    from psnerf_tpu.fields.psnet import PSNetConfig, init_psnet
    from psnerf_tpu.train.stage2 import (
        Stage2TrainConfig, init_stage2_params, make_stage2_train_step)

    cfg = PSNetConfig()
    tcfg = Stage2TrainConfig()
    L, lbs, n = 96, 10, 8192
    rng = np.random.default_rng(0)
    dirs0 = rng.normal(size=(L, 3))
    dirs0 /= np.linalg.norm(dirs0, axis=-1, keepdims=True)
    params = init_stage2_params(
        init_psnet(jax.random.PRNGKey(0), cfg), dirs0, np.ones((L, 1)))
    init_opt, step = make_stage2_train_step(cfg, tcfg)
    opt_state = init_opt(params)
    batch = {
        "uv": jnp.asarray(rng.uniform(0, 512, (n, 2)), jnp.float32),
        "pose": jnp.eye(4),
        "intrinsics": jnp.eye(4),
        "points": jnp.asarray(rng.normal(size=(n, 3)) * 0.3, jnp.float32),
        "normal": jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1)),
        "surface_mask": jnp.ones((n,), bool),
        "object_mask": jnp.ones((n,), bool),
        "rgb_gt": jnp.full((lbs, n, 3), 0.5),
        "l_slt": jnp.arange(lbs, dtype=jnp.int32),
        "visibility": jnp.ones((lbs, n)),
    }

    @jax.jit
    def many(params, opt_state, key):
        def body(carry, i):
            params, opt_state, key = carry
            key, k = jax.random.split(key)
            params, opt_state, terms = step(
                params, opt_state, batch, 6000.0 + i, k)
            return (params, opt_state, key), terms["loss"]

        (params, opt_state, key), losses = jax.lax.scan(
            body, (params, opt_state, key), jnp.arange(n_steps))
        return params, opt_state, losses

    key = jax.random.PRNGKey(1)
    params, opt_state, losses = many(params, opt_state, key)
    _sync(losses)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        params, opt_state, losses = many(params, opt_state, key)
        _sync(losses)
        times.append(time.perf_counter() - t0)
    times.sort()
    return n_steps / times[len(times) // 2]


def bench_reference_style(cfg, params, args, light_chunk=64, px_chunk=1024,
                          sample_frac=8):
    """Reference loop structure with HOST-side dispatch per chunk
    (stage2/eval.py:347-365), f32 math. Times 1/sample_frac of the pixel
    splits and extrapolates. NOTE: on this tunneled backend, per-dispatch
    latency dominates, so this is an upper bound; the honest algorithmic
    comparison is bench_reference_device."""
    import dataclasses

    from psnerf_tpu.render.shading import render_psnet
    from psnerf_tpu.core.rays import get_camera_params

    cfg = dataclasses.replace(cfg, compute_dtype="float32")

    uv, pose, K, pts, nrm, mask, ldirs, lints = args
    ray_dirs, _ = get_camera_params(uv, pose, K)

    @jax.jit
    def chunk_fn(params, pts, nrm, msk, rays, ld, li):
        return render_psnet(params, cfg, pts, nrm, msk, rays, ld, li)["rgb"]

    n = uv.shape[0]
    n_px_chunks = n // px_chunk
    n_l_chunks = (N_LIGHTS + light_chunk - 1) // light_chunk
    # warm both light-chunk shapes
    for ls in range(0, N_LIGHTS, light_chunk):
        le = min(N_LIGHTS, ls + light_chunk)
        jax.block_until_ready(chunk_fn(
            params, pts[:px_chunk], nrm[:px_chunk], mask[:px_chunk],
            ray_dirs[:px_chunk], ldirs[ls:le], lints[ls:le]))

    # free-running enqueue with a single final sync: the torch reference also
    # enqueues CUDA kernels asynchronously and only syncs when saving, so this
    # is the charitable timing for the loop structure (per-dispatch serialized
    # timing over the tunneled backend would exaggerate the gap ~30x)
    n_timed = max(1, n_px_chunks // sample_frac)
    t0 = time.perf_counter()
    for ls in range(0, N_LIGHTS, light_chunk):
        le = min(N_LIGHTS, ls + light_chunk)
        for ci in range(n_timed):
            s = ci * px_chunk
            out = chunk_fn(
                params, pts[s:s + px_chunk], nrm[s:s + px_chunk],
                mask[s:s + px_chunk], ray_dirs[s:s + px_chunk],
                ldirs[ls:le], lints[ls:le],
            )
    _sync(out)
    dt_sampled = time.perf_counter() - t0
    return dt_sampled * (n_px_chunks / n_timed)


def main():
    from psnerf_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    cfg, params, args = setup()
    dt_fused, dt_stream, rgb = bench_fused(cfg, params, args)
    rays = H * W * N_LIGHTS
    bf16_err = measure_bf16_parity(cfg, params, args, rgb)
    dt_dev = bench_reference_device(cfg, params, args, precision="float32")
    dt_dev_bf16 = bench_reference_device(cfg, params, args,
                                         precision="default")
    dt_host = bench_reference_style(cfg, params, args)
    s1_its = bench_stage1_train()
    s2_its = bench_stage2_train()
    print(json.dumps({
        "metric": "stage2 multi-light render rays/sec/chip (512x512x96)",
        "value": round(rays / dt_fused, 1),
        "unit": "pixel-lights/sec",
        # conservative: reference algorithm fully on-device, zero host overhead
        "vs_baseline": round(dt_dev / dt_fused, 2),
        "frame_ms": round(dt_fused * 1e3, 1),
        # 8 frames enqueued, one sync: per-frame cost with the tunnel round
        # trip amortized (how eval loops actually run the renderer)
        "frame_ms_stream": round(dt_stream * 1e3, 1),
        "reference_algorithm_on_device_ms": round(dt_dev * 1e3, 1),
        "reference_algorithm_on_device_bf16_ms": round(dt_dev_bf16 * 1e3, 1),
        "vs_baseline_bf16": round(dt_dev_bf16 / dt_fused, 2),
        "reference_host_loop_ms": round(dt_host * 1e3, 1),
        "vs_reference_host_loop": round(dt_host / dt_fused, 2),
        # measured on THIS run: max |rgb_bf16_fused - rgb_f32_xla| over the
        # full 512x512x96 frame (values in [0,1])
        "bf16_rgb_max_abs_err": bf16_err,
        # training throughput, bear configs, megastep path (50 steps/dispatch)
        "stage1_train_it_s": round(s1_its, 1),
        "stage2_train_it_s": round(s2_its, 1),
        "device": str(jax.devices()[0]),
        "notes": (
            "vs_baseline compares against the reference's chunked algorithm "
            "recompiled as ONE optimal on-device program at the reference's "
            "own numerics (true-f32 matmuls, as torch computes) — a strict "
            "lower bound on its cost with all Python/host dispatch removed. "
            "vs_baseline_bf16 additionally grants that emulation OUR bf16 "
            "design trade (XLA default precision). The actual torch "
            "reference pays ~512 host-driven dispatches per frame on top "
            "(vs_reference_host_loop measures that structure here, inflated "
            "by this backend's tunnel latency)."
        ),
    }))


if __name__ == "__main__":
    main()
