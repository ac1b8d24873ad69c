"""Full-frame stage-2 rendering: the 20x-target path.

The reference renders a 512x512 x 96-light frame as ~512 sequential Python
calls (64-light chunks x 1024-pixel splits, stage2/eval.py:347-365). Here the
whole frame is ONE jitted computation: lax.map over fixed pixel tiles (to
bound VMEM/HBM working set), with all L lights vmapped inside each tile.
Per-point heads run once per pixel; only the per-(light,pixel) shading and
visibility MLP scale with L.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from psnerf_tpu.core.rays import get_camera_params
from psnerf_tpu.fields.psnet import PSNetConfig
from psnerf_tpu.render.shading import psnet_point_heads, render_psnet

# outputs the single-kernel vis+shade path can serve: rgb/rgb_cnl/rgb_sum
# come out of the kernel; the rest are per-point heads (cheap XLA).
# Per-(light, pixel) outputs other than rgb (rough [L,N,3], visibility
# [L,N,1]) need the streaming path. rgb_cnl is rgb in the kernel-natural
# channel-major [3, N, L] layout — same values, but skips a ~36 ms/frame
# minor-dim-3 device transpose; prefer it when the consumer assembles
# per-light images on the host anyway.
_FUSED_SHADE_OUTPUTS = frozenset(
    {"rgb", "rgb_cnl", "rgb_sum", "albedo", "sg_weight", "normal_pred"})


def _render_frame_fused_shade(
    params, cfg, ray_dirs, points, normals, surface_mask,
    light_dirs, light_ints, outputs, k_tile, interpret=False,
) -> dict:
    """One kernel family for the whole frame: per-point heads in XLA (tiny),
    then the Pallas vis+shade kernel emits rgb (or its light-axis sum)
    without the [L,N] vis or [L,N,3] rgb tensors ever round-tripping HBM
    between ops."""
    from psnerf_tpu.core.encoding import nerf_embed
    from psnerf_tpu.ops.fused_vis import fused_vis_shade

    heads = psnet_point_heads(params, cfg, points, normals)
    light_emb = nerf_embed(light_dirs, cfg.n_freqs_xyz)
    mask1 = surface_mask[:, None]

    res = {}
    want_rgb = "rgb" in outputs
    want_cnl = "rgb_cnl" in outputs
    want_sum = "rgb_sum" in outputs
    if want_rgb or want_cnl or want_sum:
        sum_only = want_sum and not (want_rgb or want_cnl)
        out = fused_vis_shade(
            params["visibility"], heads["point_emb"], light_emb,
            heads["normal"], -ray_dirs, heads["albedo"], heads["weights"],
            surface_mask, light_dirs, light_ints,
            nbasis=cfg.nbasis, specular_rgb=cfg.specular_rgb,
            sum_lights=sum_only, tile=k_tile, interpret=interpret,
            layout="cnl" if want_cnl and not want_rgb else "lnc",
        )
        if sum_only:
            res["rgb_sum"] = out
        elif want_rgb:
            res["rgb"] = out
            if want_cnl:
                res["rgb_cnl"] = jnp.moveaxis(out, (0, 1, 2), (2, 1, 0))
            if want_sum:
                res["rgb_sum"] = out.sum(axis=0)
        else:
            res["rgb_cnl"] = out                   # [3, N, L]
            if want_sum:
                res["rgb_sum"] = out.sum(axis=2).T  # [N, 3]
    if "albedo" in outputs:
        res["albedo"] = jnp.where(mask1, heads["albedo"], 1.0)
    if "sg_weight" in outputs:
        res["sg_weight"] = jnp.where(mask1, heads["weights"], 0.0)
    if "normal_pred" in outputs and cfg.normal_mlp:
        res["normal_pred"] = jnp.where(mask1, heads["normal_pred"], 1.0)
    return {k: res[k] for k in outputs if k in res}


def render_frame_stage2(
    params: dict,
    cfg: PSNetConfig,
    uv: jnp.ndarray,            # [N, 2] all frame pixels
    pose: jnp.ndarray,
    intrinsics: jnp.ndarray,
    points: jnp.ndarray,        # [N, 3]
    normals: jnp.ndarray,       # [N, 3]
    surface_mask: jnp.ndarray,  # [N]
    light_dirs: jnp.ndarray,    # [L, 3]
    light_ints: jnp.ndarray,    # [L]
    tile: int = 4096,
    outputs: tuple = ("rgb",),
    use_fused_vis: bool = False,
    fused_interpret: bool = False,
    albedo_new=None,
    basis_new: int | None = None,
) -> dict:
    """Render every pixel under every light. N must be divisible by `tile`
    (callers pad the frame). Returns {name: [L, N, ...] or [N, ...]}.

    albedo_new / basis_new: material-edit hooks (stage2/eval.py:233-312) —
    the edit path renders through the SAME tiled frame program as standard
    eval (a monolithic all-lights x all-pixels launch is ~42 GB of
    activations at 512^2 x 96 lights). Edits take the XLA tile path; the
    fused vis precompute still applies (edits don't touch visibility).

    use_fused_vis: evaluate the visibility MLP for the whole frame with the
    Pallas fused kernel. When the requested outputs allow it (rgb/rgb_sum +
    per-point heads only) the SG shading fuses into the SAME kernel
    (fused_vis_shade) and the lax.map streaming pass disappears entirely;
    otherwise the [L, N] vis result streams through the shading tiles.
    """
    n = uv.shape[0]
    assert n % tile == 0, f"pixel count {n} not divisible by tile {tile}"
    ray_dirs, _ = get_camera_params(uv, pose, intrinsics)

    if (use_fused_vis and cfg.visibility and cfg.render_model == "sgbasis"
            and set(outputs) <= _FUSED_SHADE_OUTPUTS
            and albedo_new is None and basis_new is None):
        k_tile = 1024 if n % 1024 == 0 else 256
        return _render_frame_fused_shade(
            params, cfg, ray_dirs, points, normals, surface_mask,
            light_dirs, light_ints, outputs, k_tile,
            interpret=fused_interpret,
        )

    vis_pre = None
    if use_fused_vis and cfg.visibility:
        from psnerf_tpu.core.encoding import nerf_embed
        from psnerf_tpu.ops.fused_vis import fused_visibility

        point_emb = nerf_embed(points, cfg.n_freqs_xyz)
        light_emb = nerf_embed(light_dirs, cfg.n_freqs_xyz)
        k_tile = 1024 if n % 1024 == 0 else 256
        vis_pre = fused_visibility(
            params["visibility"], point_emb, light_emb, tile=k_tile,
            interpret=fused_interpret,
        )[..., None]  # [L, N, 1]

    def render_tile(args):
        if vis_pre is not None:
            pts, nrm, msk, rays, vp = args  # vp: [L, tile, 1]
        else:
            pts, nrm, msk, rays = args
            vp = None
        out = render_psnet(
            params, cfg, pts, nrm, msk, rays, light_dirs, light_ints,
            key=None, vis_precomputed=vp,
            albedo_new=albedo_new, basis_new=basis_new,
        )
        res = {k: out[k] for k in outputs
               if k not in ("rgb_sum", "rgb_cnl")}
        if "rgb_sum" in outputs:
            # on-device reduction over the light axis (envmap relighting
            # integrates anyway; avoids shipping [L, N, 3] off-device)
            res["rgb_sum"] = out["rgb"].sum(axis=0)
        if "rgb_cnl" in outputs and "rgb" not in outputs:
            res["rgb"] = out["rgb"]   # converted post-merge
        return res

    tiles = (
        points.reshape(-1, tile, 3),
        normals.reshape(-1, tile, 3),
        surface_mask.reshape(-1, tile),
        ray_dirs.reshape(-1, tile, 3),
    )
    if vis_pre is not None:
        # [L, N, 1] -> [T, L, tile, 1] so lax.map slices the tile axis
        vis_tiled = jnp.moveaxis(
            vis_pre.reshape(vis_pre.shape[0], -1, tile, 1), 1, 0
        )
        tiles = tiles + (vis_tiled,)
    per_tile = jax.lax.map(render_tile, tiles)  # leading tile axis

    def merge(v):
        # [T, L, tile, ...] -> [L, N, ...] ; [T, tile, ...] -> [N, ...]
        if v.ndim >= 3 and v.shape[1] == light_dirs.shape[0]:
            return jnp.moveaxis(v, 0, 1).reshape(
                v.shape[1], n, *v.shape[3:]
            )
        return v.reshape(n, *v.shape[2:])

    merged = {k: merge(v) for k, v in per_tile.items()}
    if "rgb_cnl" in outputs:
        merged["rgb_cnl"] = jnp.moveaxis(merged["rgb"], (0, 1, 2), (2, 1, 0))
        if "rgb" not in outputs:
            del merged["rgb"]
    return merged


def make_frame_renderer(cfg: PSNetConfig, tile: int = 4096,
                        outputs: tuple = ("rgb",),
                        use_fused_vis: bool = False):
    """Jit-once closure over static config."""
    fn = partial(render_frame_stage2, tile=tile, outputs=outputs,
                 use_fused_vis=use_fused_vis)
    return jax.jit(
        lambda params, uv, pose, K, pts, nrm, msk, ld, li: fn(
            params, cfg, uv, pose, K, pts, nrm, msk, ld, li
        )
    )
