"""Multi-chip shape/visibility export: the most expensive pipeline step
(surface marching + per-light visibility marching over every frame pixel,
reference stage1/model/rendering.py:297-408) sharded over the device mesh.

Both passes are embarrassingly parallel, so no collectives are needed:

  * surface march (pixels -> points/normals/mask): shard_map over the ray
    axis — each device runs the 512-step march + secant + analytic normals
    on its pixel shard (with the fused Pallas occupancy kernel per device
    when enabled).
  * visibility (surface points x lights -> transmittance): shard_map over a
    2-D rays x lights mesh — each device marches its (pixel-shard,
    light-shard) block 128 steps toward its lights (SURVEY.md §2.b: the
    per-light loop in rendering.py:378-408 is the reference's largest
    serialization).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from psnerf_tpu.parallel.mesh import LIGHT_AXIS, RAY_AXIS


def make_sharded_march_fn(field_cfg, rcfg, mesh, n_steps: int = 512,
                          occ_builder=None):
    """Returns fn(params, pix [N,2], K, pose) -> {points, normal, mask} with
    the pixel axis sharded over the mesh's 'rays' axis during compute.
    N must be divisible by the ray-axis size. occ_builder(params) -> occ_fn
    builds the per-device occupancy closure (e.g. the fused Pallas kernel
    WITHOUT an inner mesh — it already runs per device here)."""
    from psnerf_tpu.render.unisurf import render_shape_extract

    def per_device(params, pix, K, pose):
        occ_fn = occ_builder(params) if occ_builder is not None else None
        return render_shape_extract(
            params, field_cfg, rcfg, pix, K, pose,
            light_dir=None, n_steps=n_steps, occ_fn=occ_fn,
        )

    out_specs = {"mask": P(RAY_AXIS), "normal": P(RAY_AXIS),
                 "points": P(RAY_AXIS)}
    fn = jax.shard_map(
        per_device, mesh=mesh, in_specs=(P(), P(RAY_AXIS), P(), P()),
        out_specs=out_specs, check_vma=False,
    )
    return jax.jit(fn)


def make_sharded_vis_fn(field_cfg, mesh2, occ_builder=None,
                        vis_steps: int = 128, vis_rescale: bool = False,
                        light_chunk: int = 1, guided: bool = False,
                        guide_coarse: int = 16):
    """Returns fn(params, surf [N,3], light_dir [L,3]) -> visibility [L,N]
    sharded over a 2-D (rays x lights) mesh: N % ray_devices == 0 and
    L % light_devices == 0 (callers pad both). vis_steps/vis_rescale select
    the per-ray box-exit-rescaled march; light_chunk the per-iteration light
    batching (see render/marching.py — applies per device shard here).
    guided=True adds a trailing replicated guide-grid arg (occupancy_guide_
    grid) that shrinks each ray's march interval to its occupied span."""
    from psnerf_tpu.fields.occupancy import occ_alpha
    from psnerf_tpu.render.marching import light_visibility

    def per_device(params, pts, ldir, *guide):
        if occ_builder is not None:
            occ_fn = occ_builder(params)
        else:
            occ_fn = lambda p: occ_alpha(params, p, field_cfg)
        return light_visibility(occ_fn, pts, ldir, n_steps=vis_steps,
                                rescale=vis_rescale,
                                light_chunk=light_chunk,
                                guide=guide[0] if guide else None,
                                guide_coarse=guide_coarse)

    in_specs = (P(), P(RAY_AXIS), P(LIGHT_AXIS)) + ((P(),) if guided else ())
    fn = jax.shard_map(
        per_device, mesh=mesh2,
        in_specs=in_specs,
        out_specs=P(LIGHT_AXIS, RAY_AXIS), check_vma=False,
    )
    return jax.jit(fn)


def export_vis_mesh(mesh):
    """Reshape a mesh's devices into the 2-D (rays x lights) layout used by
    the visibility pass: lights get a 2-way split when the device count is
    even (both axes are embarrassingly parallel — the split only balances
    per-device working sets)."""
    from psnerf_tpu.parallel.mesh import make_mesh_2d

    devices = list(mesh.devices.flatten())
    n = len(devices)
    if n % 2 == 0 and n > 1:
        return make_mesh_2d(n // 2, 2, devices=devices)
    return make_mesh_2d(n, 1, devices=devices)
