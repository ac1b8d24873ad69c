"""Stage-2 PSNetwork parameter set (SVBRDF + normal + visibility MLPs).

Mirrors the reference's network shapes (stage2/model/renderer.py:52-108,
configs stage2/confs/bear.conf:59-98):
  * albedo_net:     Network(PE(xyz; 10), 3, W=128, depth=4, skip@2), sigmoid out
  * rough_net (SG): Normal_Network(PE(xyz), nbasis[*3], W=64, depth=2, no skip)
  * rough_net (MF): Network(PE(xyz), 1, 128, 4, skip@2), sigmoid out
  * normal_net:     Normal_Network(PE(xyz), 3, 128, 4, skip@2), normalized out
  * visibility_net: Normal_Network(PE(xyz) ++ PE(l), 1, 256, 8, skip@4)

The forward pass lives in psnerf_tpu.render.shading (pure function, light axis
vmapped). Params hold arrays only; all topology is in PSNetConfig.
"""

from __future__ import annotations

import dataclasses

import jax

from psnerf_tpu.core.encoding import nerf_embed_dim
from psnerf_tpu.fields.mlp import skip_mlp_init


@dataclasses.dataclass(frozen=True)
class PSNetConfig:
    render_model: str = "sgbasis"      # 'sgbasis' | 'microfacet'
    nbasis: int = 9
    specular_rgb: bool = True          # per-RGB-channel SG weights (bear.conf:25)
    fresnel_f0: float = 0.05
    light_int: float = 2.0             # scalar fallback intensity (bear.conf:75)

    n_freqs_xyz: int = 10              # brdf.net.n_freqs_xyz
    mlp_width: int = 128
    mlp_depth: int = 4
    mlp_skip_at: int = 2
    xyz_jitter_std: float = 0.01

    sg_mlp_width: int = 64
    sg_mlp_depth: int = 2
    sg_mlp_skip_at: int = -1

    normal_mlp: bool = True
    normal_joint: bool = True
    normal_n_freqs_xyz: int = 10
    normal_mlp_width: int = 128
    normal_mlp_depth: int = 4
    normal_mlp_skip_at: int = 2
    normal_jitter_std: float = 0.0

    visibility: bool = True
    light_vis_detach: bool = True      # stop-grad light dirs into vis net
    vis_rgb_detach: bool = True        # stop-grad vis factor in the rgb product
    vis_mlp_width: int = 256
    vis_mlp_depth: int = 8
    vis_mlp_skip_at: int = 4

    # 'float32' | 'bfloat16': matmul precision of the per-point / per-light
    # MLPs (bf16 doubles MXU throughput; accumulation stays f32)
    compute_dtype: str = "float32"

    @property
    def dim_emb(self) -> int:
        return nerf_embed_dim(3, self.n_freqs_xyz)

    @property
    def dim_emb_n(self) -> int:
        return nerf_embed_dim(3, self.normal_n_freqs_xyz)

    @property
    def n_weights(self) -> int:
        """Width of the SG-weight head output."""
        return self.nbasis * (3 if self.specular_rgb else 1)


def init_psnet(key: jax.Array, cfg: PSNetConfig) -> dict:
    """Build {albedo, rough, normal?, visibility?} param pytree."""
    k_alb, k_rough, k_norm, k_vis = jax.random.split(key, 4)
    params = {
        "albedo": skip_mlp_init(
            k_alb, cfg.dim_emb, 3, cfg.mlp_width, cfg.mlp_depth, (cfg.mlp_skip_at,)
        )
    }
    if cfg.render_model == "sgbasis":
        params["rough"] = skip_mlp_init(
            k_rough, cfg.dim_emb, cfg.n_weights,
            cfg.sg_mlp_width, cfg.sg_mlp_depth, (cfg.sg_mlp_skip_at,),
        )
    elif cfg.render_model == "microfacet":
        params["rough"] = skip_mlp_init(
            k_rough, cfg.dim_emb, 1, cfg.mlp_width, cfg.mlp_depth, (cfg.mlp_skip_at,)
        )
    else:
        raise ValueError(f"unknown render_model {cfg.render_model!r}")

    if cfg.normal_mlp:
        params["normal"] = skip_mlp_init(
            k_norm, cfg.dim_emb_n, 3, cfg.normal_mlp_width, cfg.normal_mlp_depth,
            (cfg.normal_mlp_skip_at,),
        )
    if cfg.visibility:
        params["visibility"] = skip_mlp_init(
            k_vis, cfg.dim_emb * 2, 1, cfg.vis_mlp_width, cfg.vis_mlp_depth,
            (cfg.vis_mlp_skip_at,),
        )
    return params
