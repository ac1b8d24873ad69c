"""Multi-device (8 virtual CPU) sharding: sharded renders and train steps
must match the single-device results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psnerf_tpu.fields import PSNetConfig, init_psnet
from psnerf_tpu.parallel import make_mesh, replicate, shard_stage2_batch
from psnerf_tpu.parallel.sharded_render import make_sharded_frame_renderer
from psnerf_tpu.eval.frame import render_frame_stage2

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

CFG = PSNetConfig(mlp_width=32, sg_mlp_width=16, normal_mlp_width=32,
                  vis_mlp_width=32, vis_mlp_depth=4, vis_mlp_skip_at=2,
                  xyz_jitter_std=0)


def _frame_inputs(n=8 * 64, l=3):
    params = init_psnet(jax.random.PRNGKey(0), CFG)
    pts = jax.random.normal(jax.random.PRNGKey(1), (n, 3)) * 0.3
    nrm = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    msk = jnp.ones((n,), bool)
    xs = jnp.arange(n) % 32
    uv = jnp.stack([xs, jnp.arange(n) // 32], -1).astype(jnp.float32)
    pose = jnp.eye(4).at[:3, 3].set(jnp.asarray([0.0, 0.0, -3.0]))
    K = jnp.asarray([[80.0, 0, 16, 0], [0, 80.0, 16, 0],
                     [0, 0, 1, 0], [0, 0, 0, 1.0]])
    ld = jax.random.normal(jax.random.PRNGKey(3), (l, 3))
    ld = ld / jnp.linalg.norm(ld, axis=-1, keepdims=True)
    li = jnp.full((l,), 1.0)
    return params, (uv, pose, K, pts, nrm, msk, ld, li)


def test_sharded_frame_matches_single_device():
    mesh = make_mesh(8)
    params, args = _frame_inputs()
    single = render_frame_stage2(params, CFG, *args, tile=64,
                                 outputs=("rgb", "albedo"))
    render = make_sharded_frame_renderer(CFG, mesh, tile=64,
                                         outputs=("rgb", "albedo"))
    with mesh:
        sharded = render(replicate(params, mesh), *args)
    np.testing.assert_allclose(np.asarray(sharded["rgb"]),
                               np.asarray(single["rgb"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sharded["albedo"]),
                               np.asarray(single["albedo"]), atol=1e-5)


def test_edit_hooks_through_tiled_and_sharded_frame():
    """Material edits (albedo_new/basis_new) render through the SAME tiled
    frame program as standard eval (stage2/eval.py:233-312 reuses its
    split_input chunking; a monolithic all-lights launch OOMs at
    512^2 x 96 lights). The tiled path must equal the direct render_psnet
    edit, and the sharded path must equal the tiled one."""
    from psnerf_tpu.render.shading import render_psnet

    mesh = make_mesh(8)
    params, args = _frame_inputs()
    uv, pose, K, pts, nrm, msk, ld, li = args
    albedo_new = jnp.asarray([0.8, 0.15, 0.1])

    from psnerf_tpu.core.rays import get_camera_params

    rays, _ = get_camera_params(uv, pose, K)
    direct = render_psnet(params, CFG, pts, nrm, msk, rays, ld, li,
                          albedo_new=albedo_new, basis_new=2)
    tiled = render_frame_stage2(params, CFG, *args, tile=64,
                                outputs=("rgb",),
                                albedo_new=albedo_new, basis_new=2)
    np.testing.assert_allclose(np.asarray(tiled["rgb"]),
                               np.asarray(direct["rgb"]), atol=1e-5)

    render = make_sharded_frame_renderer(CFG, mesh, tile=64,
                                         outputs=("rgb",),
                                         albedo_new=albedo_new, basis_new=2)
    with mesh:
        sharded = render(replicate(params, mesh), *args)
    np.testing.assert_allclose(np.asarray(sharded["rgb"]),
                               np.asarray(tiled["rgb"]), atol=1e-5)


def test_sharded_train_step_matches_single_device():
    """Data-parallel stage-2 train step: gradients psum'd by XLA from the
    sharded batch must equal the single-device step bit-for-tolerance."""
    from psnerf_tpu.train import Stage2TrainConfig, make_stage2_train_step
    from psnerf_tpu.train.stage2 import init_stage2_params
    from tests.test_train import _stage2_batch

    tcfg = Stage2TrainConfig(milestone_iters=(), train_order=False)
    model = init_psnet(jax.random.PRNGKey(0), CFG)
    dirs0 = jax.random.normal(jax.random.PRNGKey(3), (12, 3))
    dirs0 = dirs0 / jnp.linalg.norm(dirs0, axis=-1, keepdims=True)
    params = init_stage2_params(model, dirs0, jnp.full((12, 1), 1.0))
    init_opt, step = make_stage2_train_step(CFG, tcfg)
    opt = init_opt(params)
    batch = _stage2_batch(n=64, l=4)

    p1, o1, t1 = step(params, opt, batch, 10.0, jax.random.PRNGKey(0))

    mesh = make_mesh(8)
    with mesh:
        pr = replicate(params, mesh)
        orr = replicate(opt, mesh)
        sb = shard_stage2_batch(batch, mesh)
        p2, o2, t2 = step(pr, orr, sb, 10.0, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(t1["loss"]), float(t2["loss"]), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(p1)
    l2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sharded_train_step_2d_rays_x_lights_matches_single_device():
    """2-D (rays x lights) GSPMD train step: rgb_gt/visibility sharded over
    BOTH mesh axes and l_slt over the light axis must reproduce the
    single-device step (XLA inserts the light-axis loss reductions)."""
    from psnerf_tpu.parallel.mesh import make_mesh_2d, shard_stage2_batch_2d
    from psnerf_tpu.train import Stage2TrainConfig, make_stage2_train_step
    from psnerf_tpu.train.stage2 import init_stage2_params
    from tests.test_train import _stage2_batch

    tcfg = Stage2TrainConfig(milestone_iters=(), train_order=False)
    model = init_psnet(jax.random.PRNGKey(0), CFG)
    dirs0 = jax.random.normal(jax.random.PRNGKey(3), (12, 3))
    dirs0 = dirs0 / jnp.linalg.norm(dirs0, axis=-1, keepdims=True)
    params = init_stage2_params(model, dirs0, jnp.full((12, 1), 1.0))
    init_opt, step = make_stage2_train_step(CFG, tcfg)
    opt = init_opt(params)
    batch = _stage2_batch(n=64, l=4)

    p1, o1, t1 = step(params, opt, batch, 10.0, jax.random.PRNGKey(0))

    mesh = make_mesh_2d(4, 2)
    with mesh:
        pr = replicate(params, mesh)
        orr = replicate(opt, mesh)
        sb = shard_stage2_batch_2d(batch, mesh)
        p2, o2, t2 = step(pr, orr, sb, 10.0, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(t1["loss"]), float(t2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sharded_shape_extract_matches_single_device(tmp_path):
    """The export path (surface march + 2-D rays x lights visibility
    marching) under a mesh must write the same npys as the single-device
    runner (reference stage1/model/rendering.py:297-408)."""
    import os

    from psnerf_tpu.config import Stage1Config
    from psnerf_tpu.data.synthetic import generate_synthetic_scene
    from psnerf_tpu.fields.occupancy import OccFieldConfig
    from psnerf_tpu.render.unisurf import UnisurfConfig
    from psnerf_tpu.runners.stage1 import Stage1Runner
    from psnerf_tpu.train.losses import Stage1LossWeights
    from psnerf_tpu.train.stage1 import Stage1TrainConfig

    d = str(tmp_path / "scene")
    generate_synthetic_scene(d, n_views=2, n_test=0, n_lights=3, hw=(24, 24))
    cfg = Stage1Config(
        field=OccFieldConfig(num_layers=4, hidden_dim=32, feat_size=32,
                             octaves_pe=2, octaves_pe_views=2, skips=(2,)),
        render=UnisurfConfig(near=1.2, far=5.0, radius=1.2,
                             interval_start=0.6, interval_end=0.05,
                             interval_decay=1e-3, num_points_in=8,
                             num_points_out=4, ray_marching_steps=16),
        train=Stage1TrainConfig(n_training_points=64, normal_after=0,
                                milestone_iters=(),
                                weights=Stage1LossWeights()),
        data_dir=d, inten_normalize=None,
        checkpoint_every=100000, backup_every=100000, visualize_every=0,
    )
    r1 = Stage1Runner(cfg, str(tmp_path / "s"), resume=False)
    e1 = str(tmp_path / "exp_single")
    r1.shape_extract(e1, visibility=True, vis_plus=True, vis_plus_num=4,
                     tile=256, n_steps=16)

    rm = Stage1Runner(cfg, str(tmp_path / "m"), resume=False,
                      mesh=make_mesh(8))
    e2 = str(tmp_path / "exp_mesh")
    rm.shape_extract(e2, visibility=True, vis_plus=True, vis_plus_num=4,
                     tile=256, n_steps=16)

    for sub in ("points", "normal", "mask", "visibility", "vis_plus"):
        a = np.load(os.path.join(e1, sub, "view_01.npy"))
        b = np.load(os.path.join(e2, sub, "view_01.npy"))
        np.testing.assert_allclose(b, a, atol=1e-5,
                                   err_msg=f"mismatch in {sub}")


def test_sharded_frame_2d_rays_x_lights():
    """4 ray-devices x 2 light-devices: the 2-D sharded render must match the
    single-device frame."""
    from psnerf_tpu.parallel.mesh import make_mesh_2d
    from psnerf_tpu.parallel.sharded_render import make_sharded_frame_renderer_2d

    mesh = make_mesh_2d(4, 2)
    params, args = _frame_inputs(n=4 * 64, l=4)
    single = render_frame_stage2(params, CFG, *args, tile=64,
                                 outputs=("rgb", "visibility"))
    render = make_sharded_frame_renderer_2d(CFG, mesh, tile=64,
                                            outputs=("rgb", "visibility"))
    with mesh:
        sharded = render(replicate(params, mesh), *args)
    np.testing.assert_allclose(np.asarray(sharded["rgb"]),
                               np.asarray(single["rgb"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sharded["visibility"]),
                               np.asarray(single["visibility"]), atol=1e-5)


def test_sharded_2d_envmap_sum_matches_single_device():
    """Envmap relighting over the 2-D mesh: per-light per-channel texel
    intensities, rgb summed over the SHARDED light axis (psum over the
    light devices) must match the single-device light-axis sum
    (stage2/eval.py:218)."""
    from psnerf_tpu.parallel.mesh import make_mesh_2d
    from psnerf_tpu.parallel.sharded_render import (
        make_sharded_frame_renderer_2d,
    )

    mesh = make_mesh_2d(4, 2)
    params, args = _frame_inputs(n=4 * 64, l=6)
    texels = jax.random.uniform(jax.random.PRNGKey(9), (6, 3), maxval=0.1)
    args = args[:-1] + (texels,)
    single = render_frame_stage2(params, CFG, *args, tile=64,
                                 outputs=("rgb_sum",))
    render = make_sharded_frame_renderer_2d(CFG, mesh, tile=64,
                                            outputs=("rgb_sum",))
    with mesh:
        sharded = render(replicate(params, mesh), *args)
    assert sharded["rgb_sum"].shape == (4 * 64, 3)
    np.testing.assert_allclose(np.asarray(sharded["rgb_sum"]),
                               np.asarray(single["rgb_sum"]), atol=1e-5)


def test_sharded_2d_edit_hooks_match_single_device():
    """Material edits (albedo override + SG-basis swap) through the 2-D
    sharded renderer must match the single-device edit render."""
    from psnerf_tpu.parallel.mesh import make_mesh_2d
    from psnerf_tpu.parallel.sharded_render import (
        make_sharded_frame_renderer_2d,
    )

    mesh = make_mesh_2d(4, 2)
    params, args = _frame_inputs(n=4 * 64, l=4)
    albedo_new = jnp.asarray([0.8, 0.2, 0.1])
    single = render_frame_stage2(params, CFG, *args, tile=64,
                                 outputs=("rgb",),
                                 albedo_new=albedo_new, basis_new=3)
    render = make_sharded_frame_renderer_2d(CFG, mesh, tile=64,
                                            outputs=("rgb",),
                                            albedo_new=albedo_new,
                                            basis_new=3)
    with mesh:
        sharded = render(replicate(params, mesh), *args)
    np.testing.assert_allclose(np.asarray(sharded["rgb"]),
                               np.asarray(single["rgb"]), atol=1e-5)
    # the edit actually changed the image vs the unedited render
    plain = render_frame_stage2(params, CFG, *args, tile=64,
                                outputs=("rgb",))
    assert np.abs(np.asarray(single["rgb"]) -
                  np.asarray(plain["rgb"])).max() > 1e-3


def test_sharded_stage1_train_step_matches_single_device():
    from psnerf_tpu.fields import OccFieldConfig, init_occupancy_field
    from psnerf_tpu.parallel import shard_stage1_batch
    from psnerf_tpu.render import UnisurfConfig
    from psnerf_tpu.train import Stage1TrainConfig, make_stage1_train_step
    from tests.test_train import _stage1_batch

    fcfg = OccFieldConfig(num_layers=4, hidden_dim=64, feat_size=64,
                          octaves_pe=4, octaves_pe_views=2)
    rcfg = UnisurfConfig(near=1.0, far=5.0, radius=2.0, num_points_in=8,
                         num_points_out=4, ray_marching_steps=32)
    tcfg = Stage1TrainConfig(n_training_points=64, milestone_iters=())
    params = init_occupancy_field(jax.random.PRNGKey(0), fcfg)
    init_opt, step = make_stage1_train_step(fcfg, rcfg, tcfg)
    opt = init_opt(params)
    batch = _stage1_batch(n=64)

    p1, o1, t1 = step(params, opt, batch, 6000.0, jax.random.PRNGKey(0),
                      use_outside=True)

    mesh = make_mesh(8)
    with mesh:
        pr = replicate(params, mesh)
        orr = replicate(opt, mesh)
        sb = shard_stage1_batch(batch, mesh)
        p2, o2, t2 = step(pr, orr, sb, 6000.0, jax.random.PRNGKey(0),
                          use_outside=True)
    np.testing.assert_allclose(float(t1["loss"]), float(t2["loss"]), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_stage1_runner_mesh_training_matches_single_device(tmp_path):
    """Runner-level multi-chip API: Stage1Runner(mesh=...) must produce the
    same trajectory as the single-device runner (same seed/key schedule) —
    params replicated, batches ray-sharded, grad psum inserted by XLA."""
    from psnerf_tpu.config import Stage1Config
    from psnerf_tpu.data.synthetic import generate_synthetic_scene
    from psnerf_tpu.fields.occupancy import OccFieldConfig
    from psnerf_tpu.render.unisurf import UnisurfConfig
    from psnerf_tpu.runners.stage1 import Stage1Runner
    from psnerf_tpu.train.losses import Stage1LossWeights
    from psnerf_tpu.train.stage1 import Stage1TrainConfig

    d = str(tmp_path / "scene")
    generate_synthetic_scene(d, n_views=2, n_test=0, n_lights=3, hw=(24, 24))
    cfg = Stage1Config(
        field=OccFieldConfig(num_layers=4, hidden_dim=32, feat_size=32,
                             octaves_pe=2, octaves_pe_views=2, skips=(2,)),
        render=UnisurfConfig(near=1.2, far=5.0, radius=1.2,
                             interval_start=0.6, interval_end=0.05,
                             interval_decay=1e-3, num_points_in=8,
                             num_points_out=4, ray_marching_steps=16),
        train=Stage1TrainConfig(learning_rate=1e-3, milestone_iters=(),
                                n_training_points=64, normal_after=0,
                                weights=Stage1LossWeights()),
        data_dir=d, inten_normalize=None,
        checkpoint_every=100000, backup_every=100000, visualize_every=0,
    )
    r_single = Stage1Runner(cfg, str(tmp_path / "s"), resume=False)
    r_single.train(5, log_every=1000)

    mesh = make_mesh(8)
    r_mesh = Stage1Runner(cfg, str(tmp_path / "m"), resume=False, mesh=mesh)
    r_mesh.train(5, log_every=1000)
    for a, b in zip(jax.tree_util.tree_leaves(r_single.params),
                    jax.tree_util.tree_leaves(r_mesh.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)
    # the mesh runner's params really live replicated on all 8 devices
    leaf = jax.tree_util.tree_leaves(r_mesh.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_stage2_runner_mesh_training_matches_single_device(tmp_path):
    from psnerf_tpu.config import Stage1Config, Stage2Config
    from psnerf_tpu.data.synthetic import generate_synthetic_scene
    from psnerf_tpu.fields.occupancy import OccFieldConfig
    from psnerf_tpu.fields.psnet import PSNetConfig as PC
    from psnerf_tpu.render.unisurf import UnisurfConfig
    from psnerf_tpu.runners.stage1 import Stage1Runner
    from psnerf_tpu.runners.stage2 import Stage2Runner
    from psnerf_tpu.train.losses import Stage1LossWeights, Stage2LossWeights
    from psnerf_tpu.train.stage1 import Stage1TrainConfig
    from psnerf_tpu.train.stage2 import Stage2TrainConfig

    d = str(tmp_path / "scene")
    generate_synthetic_scene(d, n_views=2, n_test=0, n_lights=3, hw=(24, 24))
    cfg1 = Stage1Config(
        field=OccFieldConfig(num_layers=4, hidden_dim=32, feat_size=32,
                             octaves_pe=2, octaves_pe_views=2, skips=(2,)),
        render=UnisurfConfig(near=1.2, far=5.0, radius=1.2,
                             interval_start=0.6, interval_end=0.05,
                             interval_decay=1e-3, num_points_in=8,
                             num_points_out=4, ray_marching_steps=16),
        train=Stage1TrainConfig(n_training_points=64, normal_after=0,
                                milestone_iters=(),
                                weights=Stage1LossWeights()),
        data_dir=d, inten_normalize=None,
        checkpoint_every=100000, backup_every=100000, visualize_every=0,
    )
    r1 = Stage1Runner(cfg1, str(tmp_path / "s1"), resume=False)
    exports = str(tmp_path / "exports")
    r1.shape_extract(exports, visibility=True, vis_plus=True, vis_plus_num=4,
                     tile=256, n_steps=16)

    cfg2 = Stage2Config(
        net=PC(mlp_width=16, mlp_depth=2, mlp_skip_at=-1, sg_mlp_width=8,
               sg_mlp_depth=1, normal_mlp_width=16, normal_mlp_depth=2,
               normal_mlp_skip_at=-1, vis_mlp_width=16, vis_mlp_depth=2,
               vis_mlp_skip_at=-1, n_freqs_xyz=2, normal_n_freqs_xyz=2),
        train=Stage2TrainConfig(warmup_iters=2, weights=Stage2LossWeights()),
        data_dir=d, stage1_shape_path=exports, inten_normalize=None,
        light_bs=2, num_pixels=32, train_all_pixels=False, vis_train_num=2)
    rs = Stage2Runner(cfg2, str(tmp_path / "w1"), resume=False)
    rs.train(5, log_every=1000)

    rm = Stage2Runner(cfg2, str(tmp_path / "w2"), resume=False,
                      mesh=make_mesh(8))
    rm.train(5, log_every=1000)
    for a, b in zip(jax.tree_util.tree_leaves(rs.params),
                    jax.tree_util.tree_leaves(rm.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)

    # runner-level eval under the mesh: render_view routes through the
    # shard_map'd frame renderer and must match the single-device render
    data = rs.data
    dirs, ints = rs.trained_lights_for_view(data, 0)
    r_single = rs.render_view(data, 0, dirs, ints, tile=64,
                              outputs=("rgb", "albedo"))
    r_mesh = rm.render_view(rm.data, 0, dirs, ints, tile=64,
                            outputs=("rgb", "albedo"))
    np.testing.assert_allclose(r_mesh["rgb"], r_single["rgb"], atol=1e-4)
    np.testing.assert_allclose(r_mesh["albedo"], r_single["albedo"],
                               atol=1e-4)
