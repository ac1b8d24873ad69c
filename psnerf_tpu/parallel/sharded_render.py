"""Multi-chip full-frame rendering: shard_map over the ray axis.

Each device renders its contiguous pixel shard with the fused tiled frame
renderer (lax.map inside the shard bounds per-device memory); results
all-gather back to the host implicitly through the output sharding. Rays are
embarrassingly parallel — no cross-device collectives are needed during
rendering, so scaling is linear over ICI (SURVEY.md §2.b / §5.8).
"""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P

from psnerf_tpu.eval.frame import render_frame_stage2
from psnerf_tpu.fields.psnet import PSNetConfig
from psnerf_tpu.parallel.mesh import LIGHT_AXIS, RAY_AXIS


def make_sharded_frame_renderer(
    cfg: PSNetConfig,
    mesh,
    tile: int = 4096,
    outputs: tuple = ("rgb",),
    use_fused_vis: bool = False,
    fused_interpret: bool = False,
    albedo_new=None,
    basis_new: int | None = None,
):
    """Returns fn(params, uv, pose, K, points, normals, mask, ldirs, lints)
    -> {name: [L, N, ...]} with N sharded over the mesh during compute.
    N must be divisible by (mesh size * tile). The fused Pallas kernels run
    per device inside the shard_map (fused_interpret: interpreter mode for
    the CPU test mesh). albedo_new/basis_new: material-edit hooks, applied
    per device (they are pixel-independent constants)."""

    def per_device(params, uv, pose, K, pts, nrm, msk, ld, li):
        return render_frame_stage2(
            params, cfg, uv, pose, K, pts, nrm, msk, ld, li,
            tile=tile, outputs=outputs, use_fused_vis=use_fused_vis,
            fused_interpret=fused_interpret,
            albedo_new=albedo_new, basis_new=basis_new,
        )

    # pixel-axis leaves sharded; params/camera/lights replicated
    pix0 = P(RAY_AXIS)
    rep = P()
    in_specs = (rep, pix0, rep, rep, pix0, pix0, pix0, rep, rep)

    def out_spec(name):
        # [L, N, ...] and [3, N, L] outputs shard on axis 1; [N, ...] on 0
        return (P(None, RAY_AXIS)
                if name in ("rgb", "rough", "visibility", "rgb_cnl")
                else P(RAY_AXIS))

    out_specs = {name: out_spec(name) for name in outputs}

    fn = jax.shard_map(
        per_device, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(fn)


def make_sharded_frame_renderer_2d(
    cfg: PSNetConfig,
    mesh,
    tile: int = 4096,
    outputs: tuple = ("rgb",),
    use_fused_vis: bool = False,
    fused_interpret: bool = False,
    albedo_new=None,
    basis_new: int | None = None,
):
    """Shard BOTH render axes over a 2-D (rays x lights) mesh: each device
    renders its pixel shard under its light shard. N % (ray_devices * tile)
    == 0 and L % light_devices == 0. Per-light outputs need no collectives;
    the light-integrated "rgb_sum" output (envmap relighting,
    stage2/eval.py:218) psums partial per-shard sums over the light axis.
    albedo_new/basis_new: material-edit hooks (pixel-independent constants,
    applied per device)."""

    def per_device(params, uv, pose, K, pts, nrm, msk, ld, li):
        out = render_frame_stage2(
            params, cfg, uv, pose, K, pts, nrm, msk, ld, li,
            tile=tile, outputs=outputs, use_fused_vis=use_fused_vis,
            fused_interpret=fused_interpret,
            albedo_new=albedo_new, basis_new=basis_new,
        )
        if "rgb_sum" in out:
            # each device summed only its light shard; reduce over ICI
            out["rgb_sum"] = jax.lax.psum(out["rgb_sum"], LIGHT_AXIS)
        return out

    pix0 = P(RAY_AXIS)
    rep = P()
    lspec = P(LIGHT_AXIS)
    in_specs = (rep, pix0, rep, rep, pix0, pix0, pix0, lspec, lspec)

    def out_spec(name):
        if name == "rgb_cnl":
            return P(None, RAY_AXIS, LIGHT_AXIS)
        return (P(LIGHT_AXIS, RAY_AXIS)
                if name in ("rgb", "rough", "visibility") else P(RAY_AXIS))

    out_specs = {name: out_spec(name) for name in outputs}
    fn = jax.shard_map(per_device, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    return jax.jit(fn)
