"""Phong visualization renderer (stage1/model/rendering.py:228-293):
headlight diffuse shading of the marched surface, used by render_visdata."""

from __future__ import annotations

import jax.numpy as jnp

from psnerf_tpu.fields.occupancy import OccFieldConfig, occ_gradient
from psnerf_tpu.render.unisurf import UnisurfConfig, _march_and_surface

DIFFUSE = jnp.asarray([0.7, 0.7, 0.7])
AMBIENT = jnp.asarray([0.3, 0.3, 0.3])


def render_phong(
    field_params: dict,
    field_cfg: OccFieldConfig,
    rcfg: UnisurfConfig,
    pixels: jnp.ndarray,
    camera_mat: jnp.ndarray,
    world_mat: jnp.ndarray,
    n_steps: int = 512,
) -> dict:
    _, _, _, points, surface_mask = _march_and_surface(
        field_params, field_cfg, rcfg, pixels, camera_mat, world_mat, n_steps
    )
    light = world_mat[:3, 3]
    light = light / jnp.linalg.norm(light)

    g = occ_gradient(field_params, points, field_cfg)
    normals = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)

    diffuse = jnp.maximum(normals @ light, 0.0)[:, None] * DIFFUSE
    shaded = jnp.minimum(AMBIENT + diffuse, 1.0)
    rgb = jnp.where(surface_mask[:, None], shaded, 1.0)
    return {"rgb": rgb}
