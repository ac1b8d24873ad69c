"""psnerf_tpu — a TPU-native (JAX/XLA/Pallas) neural inverse-rendering framework.

Re-implements the full capability surface of PS-NeRF (ECCV 2022, reference at
/root/reference): multi-view photometric stereo with unknown lights, recovering
geometry (occupancy field -> mesh), SVBRDF (albedo + spherical-Gaussian specular
basis), surface normals, per-light visibility, and the lights themselves; plus
novel-view rendering, environment-map relighting, and material editing.

Design (TPU-first, not a port):
  * all compute paths are pure functions over parameter pytrees — jit/vmap/grad
    compose freely; no module objects in the hot path.
  * dense masked computation everywhere (no boolean gather/scatter): rays and
    lights are megabatched to static shapes; the light axis is a vmapped array
    axis instead of the reference's Python chunk loops (stage2/eval.py:347-365).
  * scaling is jax.sharding over a device mesh (rays = data axis, lights
    optionally sharded), not memory-chunking.
  * hot kernels (fused PE+MLP occupancy queries) have Pallas implementations.
"""

__version__ = "0.1.0"
