"""A/B the stage-2 image-stack preload: f32 vs the uint8 on-device store.

The stage-2 trainer preloads every (view, light) image to device memory
(data/stage2.py::load_stage2_data; reference keeps them in host RAM and
pays per-step H2D instead, stage2/datasets/dataset.py:117-151). At the
flagship 96-light scale that stack is [12, 96, 512*512, 3] — 3.62 GB as
f32, 0.91 GB as raw PNG bytes. This tool measures the device_put cost of
both representations at a given shape (worst case: incompressible random
data; real PNG-derived stacks can only do better).

Usage:  python tools/bench_preload.py [--views 12] [--lights 96] [--hw 512]

Round-4 measurement on the tunneled v5e chip at the default shape:
f32 222.1 s, u8 47.9 s (4.64x) — see STATUS.md item 12a.
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=12)
    ap.add_argument("--lights", type=int, default=96)
    ap.add_argument("--hw", type=int, default=512)
    args = ap.parse_args()

    import jax.numpy as jnp  # after argparse so --help stays instant

    shape = (args.views, args.lights, args.hw * args.hw, 3)
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, size=shape, dtype=np.uint8)
    f32 = u8.astype(np.float32) / 255.0

    def put(x):
        t0 = time.time()
        d = jnp.asarray(x)
        # sync by reading a scalar: block_until_ready is unreliable on the
        # tunneled backend (STATUS.md), and a flat reshape would force a
        # padded-layout copy that can OOM at this shape
        float(d[0, 0, 0, 0])
        del d
        return time.time() - t0

    put(np.zeros((4, 4, 4, 4), np.float32))  # warm the transfer path
    tf = put(f32)
    del f32
    tu = put(u8)
    gb = float(np.prod(shape))
    print(
        f"shape {shape}: f32 preload {tf:.1f}s ({gb * 4 / 1e9:.2f} GB)  "
        f"u8 preload {tu:.1f}s ({gb / 1e9:.2f} GB)  speedup {tf / tu:.2f}x"
    )


if __name__ == "__main__":
    main()
