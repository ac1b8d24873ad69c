"""Fused Pallas kernels composed with sharding: under a mesh the kernels run
per-device inside shard_map (interpret mode on the 8-virtual-CPU test mesh)
and must match both the unsharded kernel and the plain XLA path — forward
AND backward (the weight-gradient psum lives inside the custom vjp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psnerf_tpu.fields.occupancy import (
    OccFieldConfig,
    init_occupancy_field,
    occ_alpha,
    radiance_and_alpha,
)
from psnerf_tpu.ops.fused_occ import make_fused_occ_fn
from psnerf_tpu.ops.fused_radiance import fused_radiance_and_alpha
from psnerf_tpu.parallel import make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

CFG = OccFieldConfig()  # the kernels target the full bear architecture


@pytest.fixture(scope="module")
def setup():
    params = init_occupancy_field(jax.random.PRNGKey(0), CFG)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    p = jax.random.normal(k1, (256, 3)) * 0.5
    rd = jax.random.normal(k2, (256, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    return params, p, rd


def test_fused_occ_under_mesh_matches_xla(setup):
    params, p, _ = setup
    mesh = make_mesh(8)
    fn = make_fused_occ_fn(params, CFG, tile=1024, interpret=True, mesh=mesh)
    alpha = fn(p)  # pads 256 -> 8 * 1024
    assert alpha.shape == (256,)
    ref = occ_alpha(params, p, CFG)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref), atol=0.02)


def test_fused_radiance_under_mesh_forward(setup):
    params, p, rd = setup
    mesh = make_mesh(8)
    rgb_ref, alpha_ref = radiance_and_alpha(params, p, rd, CFG)
    rgb, alpha = fused_radiance_and_alpha(
        params, p, rd, CFG, tile=128, interpret=True, compute="float32",
        mesh=mesh)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(alpha_ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_radiance_under_mesh_backward(setup):
    """Per-device partial weight grads psum'd inside the custom vjp must
    reproduce jax.grad of the plain implementation."""
    params, p, rd = setup
    mesh = make_mesh(8)
    w_rgb = jax.random.normal(jax.random.PRNGKey(7), (256, 3))
    w_a = jax.random.normal(jax.random.PRNGKey(8), (256,))

    def loss_ref(params):
        rgb, alpha = radiance_and_alpha(
            params, jax.lax.stop_gradient(p), jax.lax.stop_gradient(rd), CFG)
        return jnp.sum(rgb * w_rgb) + jnp.sum(alpha * w_a)

    def loss_sharded(params):
        rgb, alpha = fused_radiance_and_alpha(
            params, p, rd, CFG, tile=128, interpret=True, compute="float32",
            mesh=mesh)
        return jnp.sum(rgb * w_rgb) + jnp.sum(alpha * w_a)

    g_ref = jax.grad(loss_ref)(params)
    g_sh = jax.grad(loss_sharded)(params)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_sh = jax.tree_util.tree_leaves(g_sh)
    assert len(flat_ref) == len(flat_sh)
    for (path, a), b in zip(flat_ref, flat_sh):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(
            b / scale, a / scale, rtol=0, atol=2e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_sharded_frame_renderer_with_fused_vis_shade():
    """Stage-2: the fused vis+shade kernel runs per-device inside the
    shard_map'd frame renderer (interpret mode) and must match the
    single-device XLA frame."""
    from psnerf_tpu.eval.frame import render_frame_stage2
    from psnerf_tpu.fields import PSNetConfig, init_psnet
    from psnerf_tpu.parallel import replicate
    from psnerf_tpu.parallel.sharded_render import make_sharded_frame_renderer

    cfg = PSNetConfig(mlp_width=32, sg_mlp_width=16, normal_mlp_width=32,
                      vis_mlp_width=32, vis_mlp_depth=4, vis_mlp_skip_at=2,
                      xyz_jitter_std=0)
    n, l = 8 * 256, 4
    params = init_psnet(jax.random.PRNGKey(0), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(1), (n, 3)) * 0.3
    nrm = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    msk = jnp.ones((n,), bool)
    uv = jnp.stack([jnp.arange(n) % 32, jnp.arange(n) // 32],
                   -1).astype(jnp.float32)
    pose = jnp.eye(4).at[:3, 3].set(jnp.asarray([0.0, 0.0, -3.0]))
    K = jnp.asarray([[80.0, 0, 16, 0], [0, 80.0, 16, 0],
                     [0, 0, 1, 0], [0, 0, 0, 1.0]])
    ld = jax.random.normal(jax.random.PRNGKey(3), (l, 3))
    ld = ld / jnp.linalg.norm(ld, axis=-1, keepdims=True)
    li = jnp.full((l,), 1.0)
    args = (uv, pose, K, pts, nrm, msk, ld, li)

    single = render_frame_stage2(params, cfg, *args, tile=256,
                                 outputs=("rgb",))
    mesh = make_mesh(8)
    render = make_sharded_frame_renderer(cfg, mesh, tile=256,
                                         outputs=("rgb",),
                                         use_fused_vis=True,
                                         fused_interpret=True)
    with mesh:
        sharded = render(replicate(params, mesh), *args)
    np.testing.assert_allclose(np.asarray(sharded["rgb"]),
                               np.asarray(single["rgb"]), atol=2e-2)
    err = np.abs(np.asarray(sharded["rgb"]) - np.asarray(single["rgb"]))
    assert err.mean() < 2e-3


def test_stage1_train_step_with_sharded_kernels(tmp_path):
    """End-to-end wiring: the train step with BOTH fused kernels active under
    a mesh must match the plain XLA train step (same batch, same key)."""
    from psnerf_tpu.parallel import replicate, shard_stage1_batch
    from psnerf_tpu.render.unisurf import UnisurfConfig
    from psnerf_tpu.train.stage1 import (
        Stage1TrainConfig,
        make_stage1_train_step,
    )
    from tests.test_train import _stage1_batch

    rcfg = UnisurfConfig(near=1.0, far=5.0, radius=2.0, num_points_in=8,
                         num_points_out=4, ray_marching_steps=32)
    tcfg = Stage1TrainConfig(n_training_points=64, milestone_iters=())
    params = init_occupancy_field(jax.random.PRNGKey(0), CFG)
    batch = _stage1_batch(n=64)
    mesh = make_mesh(8)

    init_opt, step_ref = make_stage1_train_step(CFG, rcfg, tcfg)
    opt0 = init_opt(params)
    p_ref, _, t_ref = step_ref(params, opt0, batch, 100.0,
                               jax.random.PRNGKey(5), use_outside=True)

    # interpret-mode kernels on CPU, configured exactly the way production
    # does — through Stage1TrainConfig (no module-global monkeypatching)
    tcfg_fused = Stage1TrainConfig(
        n_training_points=64, milestone_iters=(),
        radiance_tile=128, occ_tile=1024, fused_interpret=True)
    _, step_fused = make_stage1_train_step(
        CFG, rcfg, tcfg_fused, use_fused_occ=True, use_fused_radiance=True,
        mesh=mesh)
    with mesh:
        pr = replicate(params, mesh)
        orr = replicate(opt0, mesh)
        sb = shard_stage1_batch(batch, mesh)
        p_f, _, t_f = step_fused(pr, orr, sb, 100.0,
                                 jax.random.PRNGKey(5), use_outside=True)

    assert abs(float(t_f["loss"]) - float(t_ref["loss"])) < 2e-3
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-4)
