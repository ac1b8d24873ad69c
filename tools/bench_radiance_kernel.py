"""Microbench of the fused radiance kernel pair on the attached TPU chip.

Times the forward kernel and the full fwd+bwd at the bear-config integration
megabatch (2048 rays x 96 samples = 196,608 points), against the XLA
autodiff path. This is the measured round-2 bottleneck: the bwd kernel ran
at ~2/3 of the fwd kernel's FLOP-rate (STATUS.md round-2 table).
"""

import argparse
import time

import jax
import jax.numpy as jnp

from psnerf_tpu.fields.occupancy import (
    OccFieldConfig,
    init_occupancy_field,
    radiance_and_alpha,
)
from psnerf_tpu.ops.fused_radiance import fused_radiance_and_alpha
from psnerf_tpu.utils.profiling import enable_compilation_cache


def _sync(x):
    """block_until_ready is NOT reliable on the tunneled axon backend (it
    can return before the device work completes) — read a scalar back."""
    return float(jnp.asarray(x).reshape(-1)[0])


def timeit(fn, *args, reps=5):
    _sync(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def scan_timeit(make_step, params, k=20, reps=5):
    """Median wall time of ONE step inside a k-iteration lax.scan (amortizes
    the ~30 ms tunnel dispatch). Each iteration nudges the params so XLA can
    neither hoist nor CSE the body (the round-2 ablation lesson)."""
    import jax.numpy as jnp

    @jax.jit
    def run(params):
        def body(carry, i):
            p = jax.tree_util.tree_map(
                lambda x: x + i * 1e-12, params)
            return carry + make_step(p), None

        out, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(k))
        return out

    _sync(run(params))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(run(params))
        times.append(time.perf_counter() - t0)
    times.sort()
    # one tunnel round trip is amortized over k in-scan iterations; the
    # residual per-step bias is ~30/k ms and identical across variants
    return times[len(times) // 2] / k


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048 * 96)
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--compute", default="bfloat16")
    ap.add_argument("--xla", action="store_true", help="also time XLA path")
    args = ap.parse_args()

    enable_compilation_cache()
    cfg = OccFieldConfig(compute_dtype=args.compute)
    params = init_occupancy_field(jax.random.PRNGKey(0), cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    p = jax.random.normal(k1, (args.n, 3)) * 0.5
    rd = jax.random.normal(k2, (args.n, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)

    def fwd_step(q):
        rgb, alpha = fused_radiance_and_alpha(
            q, p, rd, cfg, tile=args.tile, compute=args.compute)
        return rgb.sum() + alpha.sum()

    def all_step(q):
        g = jax.grad(fwd_step)(q)
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))

    import sys
    print("compiling fwd scan...", file=sys.stderr)
    t_fwd = scan_timeit(fwd_step, params)
    print("compiling fwd+bwd scan...", file=sys.stderr)
    t_all = scan_timeit(all_step, params)
    print(f"n={args.n} tile={args.tile} compute={args.compute} "
          f"(per-step inside a 20-iteration scan)")
    print(f"fwd kernel         : {t_fwd * 1e3:8.2f} ms")
    print(f"fwd+bwd            : {t_all * 1e3:8.2f} ms")
    print(f"bwd (delta)        : {(t_all - t_fwd) * 1e3:8.2f} ms")

    if args.xla:
        def fwd_x(q):
            rgb, alpha = radiance_and_alpha(
                q, jax.lax.stop_gradient(p), jax.lax.stop_gradient(rd), cfg)
            return rgb.sum() + alpha.sum()

        def all_x(q):
            g = jax.grad(fwd_x)(q)
            return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))

        t_fwd_x = scan_timeit(fwd_x, params)
        t_all_x = scan_timeit(all_x, params)
        print(f"XLA fwd            : {t_fwd_x * 1e3:8.2f} ms")
        print(f"XLA fwd+bwd        : {t_all_x * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
