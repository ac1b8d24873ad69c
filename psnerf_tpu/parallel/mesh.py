"""Device mesh + sharding layout for multi-chip scaling.

The reference is single-GPU; its scaling story is Python chunk loops
(SURVEY.md §2.b). Here scaling is jax.sharding over a 1-D "rays" mesh axis:

  * both stages are data-parallel over the ray/pixel axis — rays are
    embarrassingly parallel, so layouts put the pixel axis on the mesh and
    replicate params; XLA inserts the gradient all-reduce (psum over ICI)
    when the jitted train step consumes sharded batches with replicated
    params.
  * the light axis stays vmapped per device (L is small: 10 train / 96 eval);
    per-light work is already parallel across rays.
  * light embedding tables (<= views x 96 x 3 floats) are replicated; their
    row-sparse Adam update is cheap everywhere.

No hand-written collectives are needed — this module only names the layout.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"
LIGHT_AXIS = "lights"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the ray axis. n_devices=None uses every visible device."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (RAY_AXIS,))


def make_mesh_2d(n_ray: int, n_light: int, devices=None) -> Mesh:
    """2-D (rays x lights) mesh — both render axes are embarrassingly
    parallel, so eval frames shard over BOTH: each device renders its
    (ray-shard, light-shard) block (SURVEY.md §2.b/§5.8)."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: n_ray * n_light]).reshape(n_ray, n_light)
    return Mesh(devices, (RAY_AXIS, LIGHT_AXIS))


def replicate(tree, mesh: Mesh):
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


# keys whose FIRST axis is the pixel axis
_STAGE2_PIX0 = ("uv", "object_mask", "points", "normal", "surface_mask")
# keys whose SECOND axis is the pixel axis (leading light axis)
_STAGE2_PIX1 = ("rgb_gt", "visibility", "vis_train_gt")


def shard_stage2_batch(batch: dict, mesh: Mesh) -> dict:
    """Lay a stage-2 batch out over the ray axis (everything else replicated).
    Pixel counts must be divisible by the mesh size (data layer pads)."""
    out = {}
    for k, v in batch.items():
        if k in _STAGE2_PIX0:
            spec = P(RAY_AXIS)
        elif k in _STAGE2_PIX1:
            spec = P(None, RAY_AXIS)
        else:
            spec = P()
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


_STAGE1_PIX0 = ("pixels", "rgb_gt", "normal_gt", "norm_mask", "mask_gt", "mask_valid")


def shard_stage1_batch(batch: dict, mesh: Mesh) -> dict:
    out = {}
    for k, v in batch.items():
        spec = P(RAY_AXIS) if k in _STAGE1_PIX0 else P()
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def shard_stage2_batch_2d(batch: dict, mesh: Mesh) -> dict:
    """Lay a stage-2 batch over a 2-D (rays x lights) mesh: per-pixel keys
    shard over the ray axis, per-(light, pixel) keys over BOTH axes, and the
    light-index row over the light axis. XLA inserts the light-axis reduction
    collectives the loss sums need (SURVEY.md §2.b). The light-axis size must
    divide the training light count; vis-train lights stay ray-sharded only
    (their count is schedule-dependent)."""
    n_light = mesh.shape[LIGHT_AXIS]
    out = {}
    for k, v in batch.items():
        if k in _STAGE2_PIX0:
            spec = P(RAY_AXIS)
        elif k in ("rgb_gt", "visibility"):
            assert v.shape[0] % n_light == 0, (
                f"{k}: light count {v.shape[0]} not divisible by the "
                f"{n_light}-device light axis")
            spec = P(LIGHT_AXIS, RAY_AXIS)
        elif k == "l_slt":
            spec = P(LIGHT_AXIS)
        elif k == "vis_train_gt":
            spec = P(None, RAY_AXIS)
        else:
            spec = P()
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


# ------------- traced variants: constrain batches SAMPLED inside a jit ------
# (the runners' megastep samples on device inside a lax.scan; device_put is a
# host-side op, so layout is pinned with with_sharding_constraint instead)

def _constrain(batch: dict, mesh: Mesh, pix0, pix1=()) -> dict:
    out = {}
    for k, v in batch.items():
        if k in pix0:
            spec = P(RAY_AXIS)
        elif k in pix1:
            spec = P(None, RAY_AXIS)
        else:
            spec = P()
        out[k] = jax.lax.with_sharding_constraint(v, NamedSharding(mesh, spec))
    return out


def constrain_stage1_batch(batch: dict, mesh: Mesh) -> dict:
    return _constrain(batch, mesh, _STAGE1_PIX0)


def constrain_stage2_batch(batch: dict, mesh: Mesh) -> dict:
    # lidx/l_slt/pix and light_vis_train stay replicated
    return _constrain(batch, mesh, _STAGE2_PIX0, _STAGE2_PIX1)
