"""Stage-1 training: jitted train step for the occupancy/appearance field.

Replaces stage1/model/training.py:46-60 + train.py:96-135. One compiled step:
render a ray batch, compute the loss, Adam-update. The MultiStepLR schedule
and the normal-supervision gating (`it >= normal_after`) are traced functions
of the iteration counter, so a single executable serves the whole run; only
the `use_outside` sample-grid switch (it > 5000, rendering.py:124-127) is a
static variant (two executables total).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

from psnerf_tpu.fields.occupancy import OccFieldConfig
from psnerf_tpu.render.unisurf import UnisurfConfig, render_unisurf
from psnerf_tpu.train.losses import Stage1LossWeights, stage1_loss
from psnerf_tpu.train.optim import adam_init, adam_update, multistep_lr


@dataclasses.dataclass(frozen=True)
class Stage1TrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.0
    # NOTE: through Stage1Runner these are EPOCH units (scaled by n_views —
    # the reference steps its scheduler per epoch, stage1/train.py:135);
    # make_stage1_train_step used directly treats them as iterations
    milestone_iters: Sequence[int] = (60000, 120000)
    gamma: float = 0.5
    n_training_points: int = 2048
    normal_after: int = 1000
    outside_after: int = 5000   # switch to steps+steps_outside grid
    # row-tile of the fused radiance kernel over the integration megabatch;
    # 512 measured ~3% faster than 256 at the bear config (2048x96 points),
    # 1024 regresses — tune here for other batch geometries
    radiance_tile: int = 512
    # row-tile of the fused occupancy kernel (marching/visibility queries)
    occ_tile: int = 1024
    # run both fused kernels in Pallas interpret mode (CPU tests/dryruns);
    # production TPU leaves this False
    fused_interpret: bool = False
    weights: Stage1LossWeights = Stage1LossWeights()


def make_stage1_train_step(
    field_cfg: OccFieldConfig, rcfg: UnisurfConfig, tcfg: Stage1TrainConfig,
    use_fused_occ: bool = False, use_fused_radiance: bool = False,
    mesh=None,
):
    """Returns (init_opt_state, step). step signature:

      step(params, opt_state, batch, it, key, use_outside: static bool)
        -> (params, opt_state, metrics)

    batch: pixels [N,2], rgb_gt [N,3], camera_mat [4,4], world_mat [4,4],
           normal_gt [N,3] (world frame), norm_mask [N] bool,
           mask_gt [N] float, mask_valid [N] bool.
    use_fused_occ: run the (no-grad) ray-marching occupancy queries through
    the Pallas fused kernel (TPU only).
    use_fused_radiance: run the grad-tracked integration megabatch (radiance
    + alpha + analytic normals + appearance, fwd AND bwd) through the fused
    Pallas kernel pair (ops/fused_radiance.py; TPU only).
    mesh: optional Mesh with a 'rays' axis — the fused kernels run inside a
    shard_map over the ray/point axis (per-device kernels + weight-grad
    psum), so data-parallel training keeps the kernel performance.
    """

    def loss_fn(params, batch, it, key, use_outside):
        occ_fn = None
        if use_fused_occ:
            from psnerf_tpu.ops.fused_occ import make_fused_occ_fn

            occ_fn = make_fused_occ_fn(
                params, field_cfg, tile=tcfg.occ_tile,
                interpret=tcfg.fused_interpret, mesh=mesh)
        radiance_fn = None
        if use_fused_radiance:
            from psnerf_tpu.ops.fused_radiance import fused_radiance_and_alpha

            radiance_fn = lambda p, rd: fused_radiance_and_alpha(
                params, p, rd, field_cfg, tile=tcfg.radiance_tile,
                interpret=tcfg.fused_interpret,
                compute=("bfloat16" if field_cfg.compute_dtype == "bfloat16"
                         else "float32"), mesh=mesh)
        out = render_unisurf(
            params, field_cfg, rcfg,
            batch["pixels"], batch["camera_mat"], batch["world_mat"],
            it=it, key=key, use_outside=use_outside, train=True,
            occ_fn=occ_fn, radiance_fn=radiance_fn,
        )
        # gate SDPS-normal supervision on iteration (training.py:187)
        norm_mask = batch["norm_mask"] & (it >= tcfg.normal_after)
        terms = stage1_loss(
            out, batch["rgb_gt"], tcfg.weights,
            normal_gt=batch.get("normal_gt"),
            norm_mask=norm_mask,
            mask_gt=batch.get("mask_gt"),
            mask_valid=batch.get("mask_valid"),
        )
        return terms["loss"], terms

    @partial(jax.jit, static_argnames=("use_outside",))
    def step(params, opt_state, batch, it, key, use_outside=True):
        it = jnp.asarray(it, jnp.float32)
        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, it, key, use_outside
        )
        lr = multistep_lr(tcfg.learning_rate, tcfg.milestone_iters, tcfg.gamma, it)
        params, opt_state = adam_update(params, grads, opt_state, lr)
        terms["lr"] = lr
        return params, opt_state, terms

    return adam_init, step
