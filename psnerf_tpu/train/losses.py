"""Training losses for both stages, as pure functions of dense masked arrays.

All reference boolean-mask reductions (`x[mask].mean()`) become
sum(x * m) / max(sum(m), 1) — identical values, static shapes.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of x over elements where mask (broadcast over trailing dims).

    Matches `x[mask].mean()`: the denominator counts masked ELEMENTS of x
    (mask count * trailing dims), and an empty mask yields 0.0 (the reference
    returns torch.tensor(0.0) in that case, stage2/model/loss.py:29-30).
    """
    mask = mask.astype(x.dtype)
    while mask.ndim < x.ndim:
        mask = mask[..., None]
    num = jnp.sum(x * mask)
    den = jnp.sum(jnp.broadcast_to(mask, x.shape))
    return jnp.where(den > 0, num / jnp.maximum(den, 1.0), 0.0)


# --------------------------------------------------------------------- stage 1

@dataclasses.dataclass(frozen=True)
class Stage1LossWeights:
    """stage1/model/losses.py:6-15 + configs/bear.yaml:36-56."""
    lambda_rgb: float = 1.0        # full_weight
    lambda_smooth: float = 0.005   # grad_weight (normal smoothness)
    lambda_normal: float = 0.05    # norm_weight (SDPS normal supervision)
    lambda_mask: float = 1.0       # mask_weight (BCE on acc)
    use_mask_loss: bool = False


def stage1_loss(
    out: dict,
    rgb_gt: jnp.ndarray,            # [N, 3]
    w: Stage1LossWeights,
    normal_gt: jnp.ndarray | None = None,   # [N, 3] world-frame SDPS normals
    norm_mask: jnp.ndarray | None = None,   # [N] bool
    mask_gt: jnp.ndarray | None = None,     # [N] float
    mask_valid: jnp.ndarray | None = None,  # [N] bool
) -> dict:
    """Reference: stage1/model/losses.py:30-70. `normal_gt` gating by
    iteration/angle is done by the caller (it builds norm_mask)."""
    n = rgb_gt.shape[0]
    rgb_loss = jnp.sum(jnp.abs(out["rgb"] - rgb_gt)) / n  # L1(sum)/N

    diff_norm = out.get("diff_norm")
    smooth_loss = (
        jnp.mean(diff_norm) if diff_norm is not None else jnp.asarray(0.0)
    )

    loss = w.lambda_rgb * rgb_loss + w.lambda_smooth * smooth_loss
    terms = {"fullrgb_loss": rgb_loss, "grad_loss": smooth_loss}

    if normal_gt is not None and norm_mask is not None:
        # L1(sum over masked rays) / count (losses.py:55)
        m = norm_mask.astype(rgb_gt.dtype)
        diff = jnp.sum(jnp.abs(out["normal_pred"] - normal_gt), axis=-1)
        cnt = jnp.maximum(jnp.sum(m), 1.0)
        normal_loss = jnp.where(jnp.sum(m) > 0, jnp.sum(diff * m) / cnt, 0.0)
        loss = loss + w.lambda_normal * normal_loss
        terms["normal_loss"] = normal_loss

    if w.use_mask_loss and mask_gt is not None:
        acc = jnp.clip(out["acc_map"], 1e-7, 1 - 1e-7)
        bce = -(mask_gt * jnp.log(acc) + (1 - mask_gt) * jnp.log(1 - acc))
        mv = (
            mask_valid.astype(acc.dtype)
            if mask_valid is not None
            else jnp.ones_like(acc)
        )
        mask_loss = jnp.sum(bce * mv) / jnp.maximum(jnp.sum(mv), 1.0)
        loss = loss + w.lambda_mask * mask_loss
        terms["mask_loss"] = mask_loss

    terms["loss"] = loss
    return terms


# --------------------------------------------------------------------- stage 2

@dataclasses.dataclass(frozen=True)
class Stage2LossWeights:
    """stage2/model/loss.py + confs/bear.conf:52-58, 85-89. The train_fix
    warm-up zeroes rgb/smooth and sets vis_weight=10 for iters < 5000 — the
    train step passes these as traced scalars."""
    sg_rgb_weight: float = 1.0
    loss_type: str = "L1"          # 'L1' | 'L2'
    albedo_smooth_weight: float = 0.05
    rough_smooth_weight: float = 0.01
    vis_weight: float = 1.0
    normal_weight: float = 1.0
    normal_smooth_weight: float = 0.05


def stage2_loss(
    out: dict,
    rgb_gt: jnp.ndarray,           # [L, N, 3]
    object_mask: jnp.ndarray,      # [N] bool
    w: Stage2LossWeights,
    vis_gt: jnp.ndarray | None = None,        # [L, N] stage-1 marched vis
    vis_train_gt: jnp.ndarray | None = None,  # [Lv, N] vis_plus supervision
    weights_override: dict | None = None,     # traced warm-up weights
) -> dict:
    """MainLoss + NormalLoss (stage2/model/loss.py:6-141), dense-masked.

    weights_override may carry traced scalars for sg_rgb_weight /
    albedo_smooth_weight / rough_smooth_weight / vis_weight (train_fix).
    """
    ww = {
        "sg_rgb_weight": w.sg_rgb_weight,
        "albedo_smooth_weight": w.albedo_smooth_weight,
        "rough_smooth_weight": w.rough_smooth_weight,
        "vis_weight": w.vis_weight,
    }
    if weights_override:
        ww.update(weights_override)

    mask = out["network_object_mask"] & object_mask  # [N]

    err = out["rgb"] - rgb_gt  # [L, N, 3]
    per_elem = jnp.abs(err) if w.loss_type == "L1" else err**2
    rgb_loss = masked_mean(per_elem, mask[None, :])
    loss = ww["sg_rgb_weight"] * rgb_loss
    terms = {"sg_rgb_loss": rgb_loss}

    if "albedo_jitter" in out:
        al = masked_mean(jnp.abs(out["albedo"] - out["albedo_jitter"]), mask)
        loss = loss + ww["albedo_smooth_weight"] * al
        terms["albedo_smooth_loss"] = al
    if "rough_jitter" in out:
        rl = masked_mean(jnp.abs(out["sg_weight"] - out["rough_jitter"]), mask)
        loss = loss + ww["rough_smooth_weight"] * rl
        terms["rough_smooth_loss"] = rl

    # visibility supervision: prefer vis_plus GT on vis_train, else stage-1
    # vis on vis_train, else the rendering-head visibility (loss.py:81-89)
    if "vis_train" in out and vis_train_gt is not None:
        vl = masked_mean(jnp.abs(out["vis_train"] - vis_train_gt), mask[None, :])
        loss = loss + ww["vis_weight"] * vl
        terms["vis_loss"] = vl
    elif "vis_train" in out and vis_gt is not None:
        vl = masked_mean(jnp.abs(out["vis_train"] - vis_gt), mask[None, :])
        loss = loss + ww["vis_weight"] * vl
        terms["vis_loss"] = vl
    elif vis_gt is not None:
        vl = masked_mean(jnp.abs(out["visibility"][..., 0] - vis_gt), mask[None, :])
        loss = loss + ww["vis_weight"] * vl
        terms["vis_loss"] = vl

    # NormalLoss (loss.py:96-141)
    if "normal_pred" in out:
        normal_gt = out["normal_values"]
        normal_gt = normal_gt / jnp.maximum(
            jnp.linalg.norm(normal_gt, axis=-1, keepdims=True), 1e-12
        )
        nl = masked_mean((out["normal_pred"] - normal_gt) ** 2, mask)
        loss = loss + w.normal_weight * nl
        terms["normal_loss"] = nl
        if "normal_jitter" in out:
            ns = masked_mean(jnp.abs(out["normal_pred"] - out["normal_jitter"]), mask)
            loss = loss + w.normal_smooth_weight * ns
            terms["normal_smooth_loss"] = ns

    terms["loss"] = loss
    return terms
