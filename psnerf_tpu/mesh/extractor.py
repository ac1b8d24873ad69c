"""Octree-refined mesh extraction driver.

Host MISE loop batching occupancy evaluations through a jitted field —
the host<->device ping-pong of stage1/model/extracting.py:98-119 with the
query batches padded to a fixed chunk so the device function compiles once.

Values are INSIDE-POSITIVE logits (the reference evaluates
`model(p, return_logits=True)` = -geometry_logit, extracting.py:149 +
network.py:138); the iso level for occupancy tau is
log(tau) - log(1-tau) (extracting.py:83).
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import numpy as np

from psnerf_tpu.mesh.native import MISE, marching_cubes


def extract_mesh(
    value_fn: Callable[[np.ndarray], np.ndarray],  # [N,3] -> [N] inside-positive
    threshold: float = 0.5,
    resolution0: int = 64,
    upsampling_steps: int = 3,
    padding: float = 0.4,
    points_batch: int = 100_000,
    mask_carve: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    clip_bottom: Optional[float] = None,
):
    """Returns (vertices [V,3] float32 world coords, triangles [T,3] int64).

    mask_carve: optional fn points[N,3] -> bool[N] keep-mask (multi-view
    silhouette carving, extracting.py:120-126). clip_bottom: clip z below
    this world coordinate (extracting.py:130-132).
    """
    iso = math.log(threshold) - math.log(1.0 - threshold)
    box_size = 2.0 + padding

    def eval_padded(pts: np.ndarray) -> np.ndarray:
        """Evaluate in fixed-size chunks (pad the tail) to avoid retraces."""
        n = pts.shape[0]
        out = np.empty((n,), np.float64)
        for s in range(0, n, points_batch):
            chunk = pts[s:s + points_batch]
            if chunk.shape[0] < points_batch:
                pad = np.zeros((points_batch - chunk.shape[0], 3), chunk.dtype)
                vals = np.asarray(value_fn(np.concatenate([chunk, pad], 0)))
                out[s:s + chunk.shape[0]] = vals[: chunk.shape[0]]
            else:
                out[s:s + points_batch] = np.asarray(value_fn(chunk))
        return out

    if upsampling_steps == 0:
        nx = resolution0
        lin = np.linspace(-0.5, 0.5, nx)
        grid = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1)
        pts = (box_size * grid).reshape(-1, 3).astype(np.float32)
        value_grid = eval_padded(pts).reshape(nx, nx, nx)
        res = nx - 1
    else:
        mise = MISE(resolution0, upsampling_steps, iso)
        res = mise.resolution
        points = mise.query()
        while points.shape[0] != 0:
            pts = points.astype(np.float32) / res
            pts = box_size * (pts - 0.5)
            values = eval_padded(pts)
            mise.update(points, values)
            points = mise.query()
        value_grid = mise.to_dense()

    n = value_grid.shape[0]
    if mask_carve is not None:
        lin = np.linspace(-0.5, 0.5, n)
        grid = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1)
        pts = (box_size * grid).reshape(-1, 3).astype(np.float32)
        keep = mask_carve(pts).reshape(value_grid.shape)
        value_grid = np.where(keep, value_grid, -30.0)
    if clip_bottom is not None:
        lin = box_size * np.linspace(-0.5, 0.5, n)
        zmask = lin < clip_bottom
        value_grid[:, :, zmask] = -30.0

    padded = np.pad(value_grid, 1, "constant", constant_values=-1e6)
    verts, tris = marching_cubes(padded, iso)
    # undo padding; normalize grid coords to the world box (extracting.py:176-181)
    verts = verts - 1.0
    verts = verts / (n - 1)
    verts = box_size * (verts - 0.5)
    return verts.astype(np.float32), tris


def _field_logit_jit(field_params, pts, field_cfg):
    from psnerf_tpu.fields.occupancy import occ_logit

    return -occ_logit(field_params, pts, field_cfg)


_field_logit_cache: dict = {}


def make_field_value_fn(field_params, field_cfg, jit: bool = True):
    """Inside-positive logit evaluator for extract_mesh.

    Params are passed as jit ARGUMENTS (cfg static), so repeated extractions
    with updated params reuse one compiled program instead of re-baking the
    weights as constants every call."""
    import jax
    import jax.numpy as jnp

    if jit:
        fn = _field_logit_cache.get("jit")
        if fn is None:
            fn = _field_logit_cache["jit"] = jax.jit(
                _field_logit_jit, static_argnames=("field_cfg",))
        return lambda pts: np.asarray(
            fn(field_params, jnp.asarray(pts), field_cfg), np.float64)
    return lambda pts: np.asarray(
        _field_logit_jit(field_params, jnp.asarray(pts), field_cfg),
        np.float64)
