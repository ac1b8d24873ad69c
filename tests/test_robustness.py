"""Failure-handling and override paths: wall-budget checkpoint/resume cycle,
NaN halt, custom occupancy override through the renderers."""

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

    d = str(tmp_path_factory.mktemp("robust_scene"))
    generate_synthetic_scene(d, n_views=2, n_test=0, n_lights=3, hw=(24, 24))
    return d


def _cfg(scene_dir):
    return Stage1Config(
        field=OccFieldConfig(num_layers=4, hidden_dim=32, feat_size=32,
                             octaves_pe=2, octaves_pe_views=2, skips=(2,)),
        render=UnisurfConfig(near=1.2, far=5.0, radius=1.2,
                             interval_start=0.6, interval_end=0.05,
                             interval_decay=1e-3, num_points_in=8,
                             num_points_out=4, ray_marching_steps=16),
        train=Stage1TrainConfig(learning_rate=1e-3, milestone_iters=(),
                                n_training_points=64,
                                normal_after=0,
                                weights=Stage1LossWeights()),
        data_dir=scene_dir, inten_normalize=None,
        checkpoint_every=10, backup_every=100000, visualize_every=0,
    )


def test_wall_budget_checkpoint_and_resume(scene_dir, tmp_path):
    from psnerf_tpu.runners.stage1 import Stage1Runner

    wd = str(tmp_path / "wd")
    r = Stage1Runner(_cfg(scene_dir), wd, resume=False)
    r.train(10_000, log_every=1000, ckpt_every=1000, wall_budget_s=0.0)
    # budget 0: checkpointed immediately at it=0 and stopped
    assert r.it == 0
    assert os.path.exists(os.path.join(wd, "checkpoints", "model.npz"))

    r.train(5, log_every=1000, ckpt_every=1000)  # a real few steps + ckpt
    assert r.it == 5

    r2 = Stage1Runner(_cfg(scene_dir), wd, resume=True)
    assert r2.it == 5  # resumed from the rolling checkpoint
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(r2.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(r.params)[0]), atol=1e-7)


def test_nan_guard_halts(scene_dir, tmp_path):
    from psnerf_tpu.runners.stage1 import Stage1Runner

    r = Stage1Runner(_cfg(scene_dir), str(tmp_path / "wd2"), resume=False)
    # poison the params: training must halt loudly, not march on
    r.params["geo"][0]["g"] = r.params["geo"][0]["g"] * jnp.nan
    with pytest.raises(FloatingPointError, match="non-finite loss"):
        r.train(2, log_every=1)


def test_occ_fn_override_is_used(scene_dir):
    """render_shape_extract must march the OVERRIDE field, not the params."""
    from psnerf_tpu.fields.occupancy import init_occupancy_field
    from psnerf_tpu.render.unisurf import render_shape_extract

    cfg = _cfg(scene_dir)
    params = init_occupancy_field(jax.random.PRNGKey(0), cfg.field)
    k = jnp.asarray([[50.0, 0, 12, 0], [0, 50.0, 12, 0],
                     [0, 0, 1, 0], [0, 0, 0, 1.0]])
    pose = jnp.eye(4).at[:3, 3].set(jnp.asarray([0.0, 0.0, -3.0]))
    pix = jnp.asarray([[12.0, 12.0], [11.0, 13.0]])

    # analytic override: a LARGE sphere (r=0.9) regardless of the tiny field
    occ = lambda p: jax.nn.sigmoid(-40 * (jnp.linalg.norm(p, axis=-1) - 0.9))
    out = render_shape_extract(params, cfg.field, cfg.render, pix, k, pose,
                               n_steps=64, occ_fn=occ)
    assert bool(out["mask"].all())
    radii = np.linalg.norm(np.asarray(out["points"]), axis=-1)
    np.testing.assert_allclose(radii, 0.9, atol=0.02)


def test_extract_mesh_with_carving_and_clip(scene_dir, tmp_path):
    """Silhouette carving + bottom clip through the runner path."""
    from psnerf_tpu.runners.stage1 import Stage1Runner

    r = Stage1Runner(_cfg(scene_dir), str(tmp_path / "wd3"), resume=False)
    path = str(tmp_path / "m.ply")
    v, t = r.extract_mesh_to(path, resolution0=12, upsampling=1,
                             mask_carve=True, clip_bottom=-0.4,
                             dilate_radius=3)
    assert len(v) > 0 and os.path.exists(path)
    # bottom clip honored (marching interpolates at most one cell below)
    assert v[:, 2].min() >= -0.4 - 0.2

def test_eval_paths_do_not_recompile_on_param_updates(scene_dir, tmp_path):
    """Params flow through render_view/shape_extract as jit arguments:
    training between eval calls must not trigger a retrace/recompile
    (VERDICT round-1: per-eval recompilation made 512^2 shape_extract
    cost ~516 s)."""
    from psnerf_tpu.runners.stage1 import Stage1Runner

    r = Stage1Runner(_cfg(scene_dir), str(tmp_path / "wd4"), resume=False)
    tile = 128
    r.render_view(0, tile=tile)
    fn = r._view_fns[tile]
    n0 = fn._cache_size()
    r.train(3, log_every=1000, ckpt_every=1000)  # params change
    out1 = r.render_view(0, tile=tile)
    assert fn._cache_size() == n0, "render_view recompiled after training"

    ed = str(tmp_path / "exp")
    r.shape_extract(ed, visibility=True, vis_plus=False, tile=tile, n_steps=8)
    march_fn = r._extract_fns[("march", tile, 8)]
    vis_fn = r._extract_fns[("vis", tile, 128, False)]
    nm, nv = march_fn._cache_size(), vis_fn._cache_size()
    r.train(3, log_every=1000, ckpt_every=1000)
    r.shape_extract(ed, visibility=True, vis_plus=False, tile=tile, n_steps=8)
    assert march_fn._cache_size() == nm, "shape_extract recompiled (march)"
    assert vis_fn._cache_size() == nv, "shape_extract recompiled (visibility)"
    assert np.isfinite(out1["rgb"]).all()


def test_field_value_fn_shared_compile():
    """make_field_value_fn evaluates through one shared jit (params as
    arguments), so a second extraction with new params compiles nothing."""
    from psnerf_tpu.fields.occupancy import (OccFieldConfig,
                                             init_occupancy_field)
    from psnerf_tpu.mesh.extractor import _field_logit_cache, make_field_value_fn

    cfg = OccFieldConfig(num_layers=3, hidden_dim=16, feat_size=8,
                         octaves_pe=2, octaves_pe_views=2, skips=(1,))
    p1 = init_occupancy_field(jax.random.PRNGKey(0), cfg)
    p2 = init_occupancy_field(jax.random.PRNGKey(1), cfg)
    pts = np.random.default_rng(0).normal(size=(64, 3)).astype(np.float32)
    v1 = make_field_value_fn(p1, cfg)(pts)
    jfn = _field_logit_cache["jit"]
    n0 = jfn._cache_size()
    v2 = make_field_value_fn(p2, cfg)(pts)
    assert jfn._cache_size() == n0
    assert not np.allclose(v1, v2)  # different params, different field
