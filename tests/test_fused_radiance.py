"""Fused radiance+alpha kernel vs the XLA reference — forward AND backward.

The backward is a hand-derived doubled reverse sweep (first-order cotangents
+ the Hessian-vector terms of the analytic-normal path). Run in interpreter
mode at f32 so agreement with jax.grad of the plain implementation is tight.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psnerf_tpu.fields.occupancy import (
    OccFieldConfig,
    init_occupancy_field,
    radiance_and_alpha,
)
from psnerf_tpu.ops.fused_radiance import fused_radiance_and_alpha

CFG = OccFieldConfig()  # the kernel targets the full bear architecture
N = 256


@pytest.fixture(scope="module")
def setup():
    params = init_occupancy_field(jax.random.PRNGKey(0), CFG)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    p = jax.random.normal(k1, (N, 3)) * 0.5
    rd = jax.random.normal(k2, (N, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    return params, p, rd


def test_forward_matches_reference(setup):
    params, p, rd = setup
    rgb_ref, alpha_ref = radiance_and_alpha(params, p, rd, CFG)
    rgb, alpha = fused_radiance_and_alpha(
        params, p, rd, CFG, tile=128, interpret=True, compute="float32")
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(alpha_ref),
                               rtol=1e-5, atol=1e-5)


def test_backward_matches_autodiff(setup):
    """Weight gradients — including the second-order terms through the
    normals feeding the appearance net — must match jax.grad of the plain
    implementation."""
    params, p, rd = setup
    k = jax.random.PRNGKey(7)
    w_rgb = jax.random.normal(k, (N, 3))
    w_a = jax.random.normal(jax.random.PRNGKey(8), (N,))

    def loss_ref(params):
        rgb, alpha = radiance_and_alpha(
            params, jax.lax.stop_gradient(p), jax.lax.stop_gradient(rd), CFG)
        return jnp.sum(rgb * w_rgb) + jnp.sum(alpha * w_a)

    def loss_fused(params):
        rgb, alpha = fused_radiance_and_alpha(
            params, p, rd, CFG, tile=128, interpret=True, compute="float32")
        return jnp.sum(rgb * w_rgb) + jnp.sum(alpha * w_a)

    g_ref = jax.grad(loss_ref)(params)
    g_fused = jax.grad(loss_fused)(params)

    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_fused = jax.tree_util.tree_leaves(g_fused)
    assert len(flat_ref) == len(flat_fused)
    for (path, a), b in zip(flat_ref, flat_fused):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(
            b / scale, a / scale, rtol=0, atol=2e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_padding_and_batch_shape(setup):
    """Non-multiple-of-tile N and leading batch dims both work."""
    params, p, rd = setup
    p2 = p[:200].reshape(8, 25, 3)
    rd2 = rd[:200].reshape(8, 25, 3)
    rgb_ref, alpha_ref = radiance_and_alpha(params, p2, rd2, CFG)
    rgb, alpha = fused_radiance_and_alpha(
        params, p2, rd2, CFG, tile=128, interpret=True, compute="float32")
    assert rgb.shape == (8, 25, 3) and alpha.shape == (8, 25)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref),
                               rtol=1e-5, atol=1e-5)


def test_train_step_wiring(setup):
    """make_stage1_train_step(use_fused_radiance=True) must produce the same
    update as the plain step (the kernel replaces only the integration
    megabatch; marching/normal-smoothness paths are shared)."""
    import dataclasses

    from psnerf_tpu.render.unisurf import UnisurfConfig
    from psnerf_tpu.train.losses import Stage1LossWeights
    from psnerf_tpu.train.stage1 import Stage1TrainConfig, make_stage1_train_step
    from psnerf_tpu.ops import fused_radiance

    params, _, _ = setup
    rcfg = UnisurfConfig(near=1.2, far=5.0, radius=1.2,
                         interval_start=0.6, interval_end=0.05,
                         interval_decay=1e-3, num_points_in=8,
                         num_points_out=4, ray_marching_steps=16)
    tcfg = Stage1TrainConfig(learning_rate=1e-3, milestone_iters=(),
                             n_training_points=32, normal_after=0,
                             weights=Stage1LossWeights())
    n = 32
    k = jax.random.PRNGKey(3)
    batch = {
        "pixels": jax.random.uniform(k, (n, 2), minval=-0.5, maxval=0.5),
        "rgb_gt": jnp.full((n, 3), 0.4),
        "camera_mat": jnp.eye(4),
        "world_mat": jnp.eye(4).at[2, 3].set(-3.0),
        "normal_gt": jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1)),
        "norm_mask": jnp.ones((n,), bool),
        "mask_gt": jnp.ones((n,)),
        "mask_valid": jnp.ones((n,), bool),
    }

    init_opt, step_ref = make_stage1_train_step(CFG, rcfg, tcfg)
    opt0 = init_opt(params)
    p_ref, _, t_ref = step_ref(params, opt0, batch, 100.0,
                               jax.random.PRNGKey(5), use_outside=True)

    # interpret-mode kernel on CPU: patch the default pallas path. The
    # wrapper OVERRIDES the caller's tile/interpret kwargs (the stage-1 call
    # site passes its own tile) so the test really runs tile=128 interpreted.
    orig = fused_radiance.fused_radiance_and_alpha

    def patched(params, p, rd, cfg, tile=None, interpret=None, **kw):
        assert tile is not None, "call site should pass its tile explicitly"
        return orig(params, p, rd, cfg, tile=128, interpret=True, **kw)
    fused_radiance.fused_radiance_and_alpha = patched
    try:
        _, step_fused = make_stage1_train_step(CFG, rcfg, tcfg,
                                               use_fused_radiance=True)
        p_f, _, t_f = step_fused(params, opt0, batch, 100.0,
                                 jax.random.PRNGKey(5), use_outside=True)
    finally:
        fused_radiance.fused_radiance_and_alpha = orig

    assert abs(float(t_f["loss"]) - float(t_ref["loss"])) < 2e-3
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-4)
