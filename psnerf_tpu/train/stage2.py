"""Stage-2 training: joint SVBRDF + normal + visibility + light optimization.

Replaces stage2/trainer.py:348-514 with ONE compiled train step:
  * light directions/intensities are embedding tables in the param pytree;
    the SparseAdam behavior (only gathered rows update, trainer.py:165)
    is a row-gate on the Adam update;
  * the train_fix warm-up (iters < 5000: rgb/smooth weights zeroed,
    vis_weight 10, albedo/rough/lights frozen; trainer.py:485-514) is traced
    off the iteration counter — weights become where()-selected scalars and
    freezes become 0/1 update gates, so no recompilation at the boundary;
  * MultiStepLR milestones are pre-scaled by dataset_len * light_bs
    (trainer.py:118-124) by the caller.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from psnerf_tpu.core.rays import get_camera_params
from psnerf_tpu.fields.psnet import PSNetConfig
from psnerf_tpu.render.shading import render_psnet
from psnerf_tpu.train.losses import Stage2LossWeights, stage2_loss
from psnerf_tpu.train.optim import (
    adam_init,
    adam_update,
    multistep_lr,
    row_mask_from_indices,
)


@dataclasses.dataclass(frozen=True)
class Stage2TrainConfig:
    sg_learning_rate: float = 5e-4
    light_learning_rate: float = 5e-4
    light_inten_lr: float = 1e-3
    # iteration-unit milestones. Stage2Runner overrides these from the
    # epoch-unit Stage2Config.sched_milestones_epochs (x n_views x light_bs,
    # trainer.py:118-124) when that is non-empty; a direct value here is
    # respected otherwise.
    milestone_iters: Sequence[int] = ()
    gamma: float = 0.5
    light_train: bool = True
    light_inten_train: bool = True
    light_decay: bool = True              # schedule the light lr too
    train_order: bool = True              # enable the train_fix warm-up
    warmup_iters: int = 5000
    warmup_vis_weight: float = 10.0
    ana_fixlight: bool = False            # never unfreeze lights if True
    weights: Stage2LossWeights = Stage2LossWeights()


def init_stage2_params(
    psnet_params: dict,
    light_dirs_init: jnp.ndarray,   # [Ltot, 3] (SDPS preds or GT, world frame)
    light_ints_init: jnp.ndarray,   # [Ltot, 1]
) -> dict:
    return {
        "model": psnet_params,
        "light_dirs": jnp.asarray(light_dirs_init, jnp.float32),
        "light_ints": jnp.asarray(light_ints_init, jnp.float32).reshape(-1, 1),
    }


def make_stage2_train_step(cfg: PSNetConfig, tcfg: Stage2TrainConfig):
    """Returns (init_opt_state, step).

    step(params, opt_state, batch, it, key) -> (params, opt_state, metrics)

    batch:
      uv [N,2], pose [4,4], intrinsics [4,4], object_mask [N] bool,
      points [N,3], normal [N,3], surface_mask [N] bool,
      rgb_gt [L,N,3], l_slt [L] int (global light-table rows),
      visibility [L,N] (stage-1 GT) or absent,
      light_vis_train [Lv,3] + vis_train_gt [Lv,N] (vis_plus) or absent.
    """
    w = tcfg.weights

    def loss_fn(params, batch, it, key):
        warm = (it < tcfg.warmup_iters) & jnp.asarray(tcfg.train_order)
        wf = warm.astype(jnp.float32)

        l_slt = batch["l_slt"]
        ldirs_tab = params["light_dirs"]
        ldirs = ldirs_tab[l_slt]
        ldirs = ldirs / jnp.maximum(
            jnp.linalg.norm(ldirs, axis=-1, keepdims=True), 1e-12
        )
        lints = params["light_ints"][l_slt][:, 0]

        ray_dirs, _ = get_camera_params(
            batch["uv"], batch["pose"], batch["intrinsics"]
        )

        out = render_psnet(
            params["model"], cfg,
            batch["points"], batch["normal"], batch["surface_mask"],
            ray_dirs, ldirs, lints,
            key=key,
            light_vis_train=batch.get("light_vis_train"),
        )

        override = {
            "sg_rgb_weight": (1 - wf) * w.sg_rgb_weight,
            "albedo_smooth_weight": (1 - wf) * w.albedo_smooth_weight,
            "rough_smooth_weight": (1 - wf) * w.rough_smooth_weight,
            "vis_weight": wf * tcfg.warmup_vis_weight + (1 - wf) * w.vis_weight,
        }
        terms = stage2_loss(
            out, batch["rgb_gt"], batch["object_mask"], w,
            vis_gt=batch.get("visibility"),
            vis_train_gt=batch.get("vis_train_gt"),
            weights_override=override,
        )
        return terms["loss"], (terms, warm)

    def make_gates(params, warm, l_slt):
        """Update gates: albedo/rough frozen during warm-up; light rows gated
        by both warm-up and this step's gathered rows."""
        live = 1.0 - warm.astype(jnp.float32)
        model_gate = jax.tree_util.tree_map(lambda p: jnp.ones((), p.dtype),
                                            params["model"])
        model_gate["albedo"] = jax.tree_util.tree_map(
            lambda p: live, params["model"]["albedo"]
        )
        model_gate["rough"] = jax.tree_util.tree_map(
            lambda p: live, params["model"]["rough"]
        )
        if "normal" in params["model"] and not cfg.normal_joint:
            # normal_mlp without normal_joint: frozen net (renderer.py:98-100)
            model_gate["normal"] = jax.tree_util.tree_map(
                lambda p: jnp.zeros(()), params["model"]["normal"]
            )
        n_rows = params["light_dirs"].shape[0]
        row = row_mask_from_indices(n_rows, l_slt)
        light_live = live * float(not tcfg.ana_fixlight)
        return {
            "model": model_gate,
            "light_dirs": row * light_live * float(tcfg.light_train),
            "light_ints": row * light_live * float(tcfg.light_inten_train),
        }

    @jax.jit
    def step(params, opt_state, batch, it, key):
        it = jnp.asarray(it, jnp.float32)
        (loss, (terms, warm)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch, it, key)

        gates = make_gates(params, warm, batch["l_slt"])
        lr_sg = multistep_lr(tcfg.sg_learning_rate, tcfg.milestone_iters,
                             tcfg.gamma, it)
        if tcfg.light_decay:
            lr_l = multistep_lr(tcfg.light_learning_rate, tcfg.milestone_iters,
                                tcfg.gamma, it)
            lr_i = multistep_lr(tcfg.light_inten_lr, tcfg.milestone_iters,
                                tcfg.gamma, it)
        else:
            lr_l = jnp.asarray(tcfg.light_learning_rate)
            lr_i = jnp.asarray(tcfg.light_inten_lr)

        new_model, st_model = adam_update(
            params["model"], grads["model"], opt_state["model"], lr_sg,
            gate=gates["model"],
        )
        new_ld, st_ld = adam_update(
            params["light_dirs"], grads["light_dirs"], opt_state["light_dirs"],
            lr_l, gate=gates["light_dirs"],
        )
        new_li, st_li = adam_update(
            params["light_ints"], grads["light_ints"], opt_state["light_ints"],
            lr_i, gate=gates["light_ints"],
        )
        new_params = {
            "model": new_model, "light_dirs": new_ld, "light_ints": new_li
        }
        new_state = {"model": st_model, "light_dirs": st_ld, "light_ints": st_li}
        terms["sg_lr"] = lr_sg
        return new_params, new_state, terms

    def init_opt_state(params):
        return {
            "model": adam_init(params["model"]),
            "light_dirs": adam_init(params["light_dirs"]),
            "light_ints": adam_init(params["light_ints"]),
        }

    return init_opt_state, step


def light_direction_error_deg(light_dirs: jnp.ndarray, gt_dirs: jnp.ndarray):
    """Mean angular error vs GT in degrees (stage2/trainer.py:412-416)."""
    a = light_dirs / jnp.maximum(
        jnp.linalg.norm(light_dirs, axis=-1, keepdims=True), 1e-12
    )
    b = gt_dirs / jnp.maximum(
        jnp.linalg.norm(gt_dirs, axis=-1, keepdims=True), 1e-12
    )
    dot = jnp.clip(jnp.sum(a * b, axis=-1), -1.0, 1.0)
    return jnp.mean(jnp.degrees(jnp.arccos(dot)))
