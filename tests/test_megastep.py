"""Megastep (scanned multi-iteration dispatch) == the single-step loop.

The runners' train() now scans K full iterations (view draw + batch sample +
train step) inside one jitted dispatch. The key schedule inside the scan body
is written to match one pass of the single-step loop exactly, so the training
trajectory must be identical — these tests pin that, per stage, on CPU f32.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psnerf_tpu.config import Stage1Config
from psnerf_tpu.fields.occupancy import OccFieldConfig
from psnerf_tpu.render.unisurf import UnisurfConfig
from psnerf_tpu.train.losses import Stage1LossWeights
from psnerf_tpu.train.stage1 import Stage1TrainConfig


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    from psnerf_tpu.data.synthetic import generate_synthetic_scene

    d = str(tmp_path_factory.mktemp("mega_scene"))
    generate_synthetic_scene(d, n_views=2, n_test=0, n_lights=3, hw=(24, 24))
    return d


def _cfg1(scene_dir):
    return Stage1Config(
        field=OccFieldConfig(num_layers=4, hidden_dim=32, feat_size=32,
                             octaves_pe=2, octaves_pe_views=2, skips=(2,)),
        render=UnisurfConfig(near=1.2, far=5.0, radius=1.2,
                             interval_start=0.6, interval_end=0.05,
                             interval_decay=1e-3, num_points_in=8,
                             num_points_out=4, ray_marching_steps=16),
        train=Stage1TrainConfig(learning_rate=1e-3, milestone_iters=(),
                                n_training_points=64, normal_after=0,
                                weights=Stage1LossWeights()),
        data_dir=scene_dir, inten_normalize=None,
        checkpoint_every=100000, backup_every=100000, visualize_every=0,
    )


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


def test_stage1_megastep_matches_single_steps(scene_dir, tmp_path):
    from psnerf_tpu.runners.stage1 import Stage1Runner

    r = Stage1Runner(_cfg1(scene_dir), str(tmp_path / "mega"), resume=False)

    # reference trajectory: the same schedule unrolled with single step calls
    params, opt_state, key = r.params, r.opt_state, r.key
    for i in range(7):
        key, k1, k2, k3 = jax.random.split(key, 4)
        view = jax.random.randint(k1, (), 0, r.n_views)
        batch = r._sample(view, k2)
        params, opt_state, terms = r.step_fn(
            params, opt_state, batch, float(i), k3, use_outside=False)

    r.train(7, log_every=1000)
    # scan-vs-unrolled compiles to different HLO (different fusion rounding),
    # so agreement is tight-tolerance, not bitwise
    for a, b in zip(_leaves(r.params), _leaves(params)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-6)
    # loop advanced and the carried key matches the reference schedule
    assert r.it == 7
    np.testing.assert_array_equal(np.asarray(r.key), np.asarray(key))


def test_stage1_megastep_chunk_boundaries(scene_dir, tmp_path):
    """Chunks must stop at log/ckpt boundaries: one train(7) with log_every=3
    equals the same 7 steps in one chunk (pure function of the key)."""
    from psnerf_tpu.runners.stage1 import Stage1Runner

    ra = Stage1Runner(_cfg1(scene_dir), str(tmp_path / "a"), resume=False)
    rb = Stage1Runner(_cfg1(scene_dir), str(tmp_path / "b"), resume=False)
    ra.train(7, log_every=3)
    rb.train(7, log_every=1000)
    for a, b in zip(_leaves(ra.params), _leaves(rb.params)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-6)


def test_stage2_megastep_matches_single_steps(scene_dir, tmp_path):
    from psnerf_tpu.config import Stage2Config
    from psnerf_tpu.runners.stage1 import Stage1Runner
    from psnerf_tpu.runners.stage2 import Stage2Runner

    # produce minimal stage-1 exports for the stage-2 dataset
    r1 = Stage1Runner(_cfg1(scene_dir), str(tmp_path / "s1"), resume=False)
    exports = str(tmp_path / "exports")
    r1.shape_extract(exports, visibility=True, vis_plus=True, vis_plus_num=4,
                     tile=256, n_steps=16)

    from psnerf_tpu.fields.psnet import PSNetConfig
    from psnerf_tpu.train.losses import Stage2LossWeights
    from psnerf_tpu.train.stage2 import Stage2TrainConfig

    cfg2 = Stage2Config(
        net=PSNetConfig(mlp_width=16, mlp_depth=2, mlp_skip_at=-1,
                        sg_mlp_width=8, sg_mlp_depth=1,
                        normal_mlp_width=16, normal_mlp_depth=2,
                        normal_mlp_skip_at=-1, vis_mlp_width=16,
                        vis_mlp_depth=2, vis_mlp_skip_at=-1,
                        n_freqs_xyz=2, normal_n_freqs_xyz=2),
        train=Stage2TrainConfig(warmup_iters=2,
                                weights=Stage2LossWeights()),
        data_dir=scene_dir, stage1_shape_path=exports,
        inten_normalize=None,
        light_bs=2, num_pixels=32, train_all_pixels=False, vis_train_num=2)
    r2 = Stage2Runner(cfg2, str(tmp_path / "s2"), resume=False)

    params, opt_state, key = r2.params, r2.opt_state, r2.key
    use_vp = r2.cfg.vis_plus and "vis_plus" in r2.data
    from psnerf_tpu.data.stage2 import sample_stage2_batch
    for i in range(5):
        key, k1, k2 = jax.random.split(key, 3)
        view = int(jax.random.randint(k1, (), 0, r2.n_views))
        batch = r2._sample(view, k2)
        if not use_vp:
            batch["light_vis_train"] = r2.light_init_dirs[view][batch["lidx"]]
        params, opt_state, terms = r2.step_fn(
            params, opt_state, batch, float(i), k2)

    r2.train(5, log_every=1000)
    for a, b in zip(_leaves(r2.params), _leaves(params)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-6)
    assert r2.it == 5
