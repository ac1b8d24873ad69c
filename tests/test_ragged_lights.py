"""Ragged per-view light counts (light_is_same=false), the reference's
per-view light-list layout (stage2/datasets/dataset.py:117-151): the loader
pads the light axis, samplers draw only real lights, the light table packs
exactly sum(L_v) rows, and a short train + eval runs end to end."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psnerf_tpu.config import Stage2Config
from psnerf_tpu.fields.psnet import PSNetConfig
from psnerf_tpu.train.losses import Stage2LossWeights
from psnerf_tpu.train.stage2 import Stage2TrainConfig

N_LIGHTS = 6  # views get 6, 5, 4, 6, ... lights (counts cycle by -vi%3)


@pytest.fixture(scope="module")
def ragged_scene(tmp_path_factory):
    from psnerf_tpu.data.synthetic import (generate_synthetic_scene,
                                           write_stage1_exports)

    d = str(tmp_path_factory.mktemp("ragged_scene"))
    generate_synthetic_scene(d, n_views=3, n_test=1, n_lights=N_LIGHTS,
                             hw=(32, 32), ragged_lights=True)
    write_stage1_exports(d, os.path.join(d, "exports"), n_vis_plus=6)
    return d


def _cfg(scene):
    return Stage2Config(
        net=PSNetConfig(mlp_width=32, sg_mlp_width=16, normal_mlp_width=32,
                        vis_mlp_width=32, vis_mlp_depth=4, vis_mlp_skip_at=2,
                        n_freqs_xyz=4, normal_n_freqs_xyz=4, light_int=1.2),
        train=Stage2TrainConfig(
            sg_learning_rate=2e-3, light_learning_rate=5e-4,
            train_order=True, warmup_iters=10,
            weights=Stage2LossWeights(vis_weight=1.0),
        ),
        data_dir=scene,
        stage1_shape_path=os.path.join(scene, "exports"),
        inten_normalize=None,
        light_bs=4, vis_train_num=4,
        num_pixels=256, train_all_pixels=False,
        ckpt_freq=100000,
    )


def test_ragged_loader_pads_and_masks(ragged_scene):
    from psnerf_tpu.data.scene import load_scene_params
    from psnerf_tpu.data.stage2 import load_stage2_data

    scene = load_scene_params(ragged_scene)
    assert not scene.light_is_same
    data = load_stage2_data(scene, os.path.join(ragged_scene, "exports"),
                            "train", inten_normalize=None)
    counts = np.asarray(data["light_count"])
    assert counts.tolist() == [6, 5, 4]
    l_max = int(counts.max())
    assert data["imgs"].shape[:2] == (3, l_max)
    assert data["visibility"].shape[:2] == (3, l_max)
    assert data["light_dirs"].shape == (3, l_max, 3)
    lm = np.asarray(data["light_mask"])
    for i, c in enumerate(counts):
        assert lm[i, :c].all() and not lm[i, c:].any()
        # padded image rows are zero
        assert float(np.abs(np.asarray(data["imgs"][i, c:])).sum()) == 0.0
        # padded dirs stay unit (+z) for safe normalization
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(data["light_dirs"][i]), axis=-1), 1.0,
            atol=1e-5)
    # flat light-table offsets pack exactly sum(L_v) rows
    assert data["n_light_rows"] == int(counts.sum())
    np.testing.assert_array_equal(data["light_row_offset"], [0, 6, 11])


def test_ragged_sampler_avoids_padding(ragged_scene):
    from psnerf_tpu.data.scene import load_scene_params
    from psnerf_tpu.data.stage2 import load_stage2_data, sample_stage2_batch

    scene = load_scene_params(ragged_scene)
    data = load_stage2_data(scene, os.path.join(ragged_scene, "exports"),
                            "train", inten_normalize=None)
    counts = np.asarray(data["light_count"])
    init_dirs = data["light_dirs"]
    for view in range(3):
        for s in range(8):
            b = sample_stage2_batch(data, view, jax.random.PRNGKey(s),
                                    num_pixels=64, light_bs=4,
                                    sample_in_mask=False, vis_train_num=4,
                                    light_init_dirs=init_dirs)
            lidx = np.asarray(b["lidx"])
            assert (lidx < counts[view]).all(), \
                f"sampled padded light {lidx} (count {counts[view]})"
            assert len(set(lidx.tolist())) == 4  # no replacement
            # l_slt rows stay inside this view's flat-table segment
            lo = data["light_row_offset"][view]
            assert (np.asarray(b["l_slt"]) >= lo).all()
            assert (np.asarray(b["l_slt"]) < lo + counts[view]).all()
            # vis_train pool never includes padded train-light rows: real
            # rows carry the 1.0 fill on out-of-mask pixels (sampled here
            # via sample_in_mask=False); padded rows are all-zero
            vt = np.asarray(b["vis_train_gt"])
            assert (np.abs(vt).max(axis=-1) > 0).all()


def test_ragged_trains_and_evals(ragged_scene, tmp_path_factory):
    from psnerf_tpu.runners.stage2 import Stage2Runner

    wd = str(tmp_path_factory.mktemp("ragged_wd"))
    runner = Stage2Runner(_cfg(ragged_scene), wd, resume=False)
    # light table packs exactly sum over train views of L_v rows
    assert runner.params["light_dirs"].shape[0] == 6 + 5 + 4
    assert runner.light_bs == 4  # min count bounds the light batch
    runner.train(30, log_every=15, ckpt_every=100000)

    out_dir = str(tmp_path_factory.mktemp("ragged_eval"))
    runner.evaluate(out_dir, split="test", tile=256, save_npy=False)
    # the test view renders one png per ITS OWN light count
    test_view = 4  # counts cycle 6,5,4,6 -> view index 3 (1-based view_04)
    rgb_dir = os.path.join(out_dir, "rgb", "img", f"view_{test_view:02d}")
    assert len(os.listdir(rgb_dir)) == 6  # view 3 has 6 lights


def test_compact_render_matches_full(ragged_scene, tmp_path_factory):
    """Mask-compacted eval rendering (gather in-mask pixels, scatter back
    with the reference fill values) must reproduce the full-frame render
    exactly — per-pixel math has no cross-pixel coupling."""
    from psnerf_tpu.runners.stage2 import Stage2Runner

    wd = str(tmp_path_factory.mktemp("compact_wd"))
    runner = Stage2Runner(_cfg(ragged_scene), wd, resume=False)
    data = runner._eval_data("test")
    dirs, ints = runner.trained_lights_for_view(data, 0)

    outs = ("rgb", "rgb_sum", "albedo", "visibility", "normal_pred",
            "sg_weight")
    full = runner.render_view(data, 0, dirs, ints, tile=256, outputs=outs,
                              compact=False)
    comp = runner.render_view(data, 0, dirs, ints, tile=256, outputs=outs,
                              compact=True)
    assert set(full) == set(comp)
    for k in outs:
        np.testing.assert_allclose(
            comp[k], full[k], atol=1e-5,
            err_msg=f"compact mismatch in {k}")
