"""Optimizers: Adam with per-leaf update gating, reproducing two reference
behaviors inside ONE compiled train step:

  * mid-run freezing (`requires_grad_(False)` during the train_fix warm-up,
    stage2/trainer.py:485-514) — a frozen leaf keeps params AND moments
    untouched, exactly like torch skipping the param;
  * torch.optim.SparseAdam on the light Embeddings (trainer.py:165) — only
    rows gathered this step update their moments; untouched rows are
    bit-identical to not having stepped.

Both are expressed as a `gate` pytree broadcastable against each leaf
(scalars 0/1 for whole-leaf freezing, [rows, 1] masks for embeddings), traced
so phase changes don't retrigger compilation.

Schedules are pure functions of the iteration counter (MultiStepLR,
stage2/trainer.py:118-124; stage1/train.py:75-77).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def adam_init(params) -> dict:
    zeros = lambda p: jnp.zeros_like(p)
    return {
        "m": jax.tree_util.tree_map(zeros, params),
        "v": jax.tree_util.tree_map(zeros, params),
        "step": jax.tree_util.tree_map(lambda p: jnp.zeros((), jnp.int32), params),
    }


def adam_update(
    params,
    grads,
    state: dict,
    lr,
    gate=None,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
):
    """One Adam step. `gate`: None (all update) or a pytree matching `params`
    whose leaves broadcast against the param leaves (0 = frozen: param, m, v,
    and the per-leaf bias-correction step all stay untouched).

    Per-leaf step counters reproduce SparseAdam's per-row staleness closely
    enough at leaf granularity (torch tracks per-tensor `step`; rows share it).
    """
    if gate is None:
        gate = jax.tree_util.tree_map(lambda p: jnp.ones((), p.dtype), params)

    def leaf(p, g, m, v, step, gt):
        gt = jnp.asarray(gt, p.dtype)
        # does anything in this leaf update? (scalar gate or row mask)
        any_on = jnp.any(gt > 0)
        new_step = step + jnp.asarray(any_on, jnp.int32)
        m_new = b1 * m + (1 - b1) * g
        v_new = b2 * v + (1 - b2) * g * g
        # clamp t >= 1: a frozen leaf has step 0, and 1 - b1**0 = 0 would
        # produce inf * 0 = NaN in the (discarded) update
        t = jnp.maximum(new_step, 1).astype(p.dtype)
        mhat = m_new / (1 - b1**t)
        vhat = v_new / (1 - b2**t)
        upd = lr * mhat / (jnp.sqrt(vhat) + eps)
        p_out = p - gt * upd
        m_out = jnp.where(gt > 0, m_new, m)
        v_out = jnp.where(gt > 0, v_new, v)
        return p_out, m_out, v_out, new_step

    flat = jax.tree_util.tree_map(
        leaf, params, grads, state["m"], state["v"], state["step"], gate
    )
    new_params = jax.tree_util.tree_map(lambda t: t[0], flat,
                                        is_leaf=lambda x: isinstance(x, tuple))
    new_state = {
        "m": jax.tree_util.tree_map(lambda t: t[1], flat,
                                    is_leaf=lambda x: isinstance(x, tuple)),
        "v": jax.tree_util.tree_map(lambda t: t[2], flat,
                                    is_leaf=lambda x: isinstance(x, tuple)),
        "step": jax.tree_util.tree_map(lambda t: t[3], flat,
                                       is_leaf=lambda x: isinstance(x, tuple)),
    }
    return new_params, new_state


def multistep_lr(base_lr: float, milestones: Sequence[int], gamma: float, it):
    """MultiStepLR as a pure function of the iteration counter."""
    if not milestones:
        return jnp.asarray(base_lr, jnp.float32)
    ms = jnp.asarray(sorted(milestones))
    n_passed = jnp.sum(jnp.asarray(it) >= ms)
    return base_lr * gamma ** n_passed.astype(jnp.float32)


def row_mask_from_indices(n_rows: int, indices: jnp.ndarray) -> jnp.ndarray:
    """[n_rows, 1] 0/1 mask with ones at `indices` — the SparseAdam row gate."""
    mask = jnp.zeros((n_rows,), jnp.float32).at[indices].set(1.0)
    return mask[:, None]
