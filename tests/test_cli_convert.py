import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from psnerf_tpu.cli.main import main


def _torch_stage2_files(tmp_path):
    """Minimal PSNetwork-shaped state_dict + light embeddings on disk."""
    def linears(din, dout, w, depth, skip):
        mods = ([torch.nn.Linear(din, w)]
                + [torch.nn.Linear(w + din if i == skip else w, w)
                   for i in range(depth - 1)]
                + [torch.nn.Linear(w, dout)])
        return mods

    sd = {}
    for net, dout in (("albedo_net", 3), ("rough_net", 27)):
        for i, m in enumerate(linears(10, dout, 16, 3, 1)):
            for k, v in m.state_dict().items():
                sd[f"{net}.linears.{i}.{k}"] = v
    model_path = str(tmp_path / "model.pth")
    torch.save({"model_state_dict": sd}, model_path)
    light_path = str(tmp_path / "lights.pth")
    torch.save({
        "light_state_dict": {"weight": torch.randn(8, 3)},
        "light_inten_state_dict": {"weight": torch.rand(8, 1)},
    }, light_path)
    return model_path, light_path


def test_convert_ckpt_cli_stage2(tmp_path):
    model_path, light_path = _torch_stage2_files(tmp_path)
    out = str(tmp_path / "converted.npz")
    main(["convert-ckpt", "--stage", "stage2", "--model", model_path,
          "--lights", light_path, "--out", out])
    assert os.path.exists(out)
    with np.load(out) as z:
        keys = set(z.files)
    assert any(k.startswith("model/albedo") for k in keys)
    assert "light_dirs" in keys and "light_ints" in keys


def test_patch_sampler(tmp_path):
    from psnerf_tpu.data import load_scene_params, load_stage2_data
    from psnerf_tpu.data.stage2 import sample_stage2_patches
    from psnerf_tpu.data.synthetic import (
        generate_synthetic_scene,
        write_stage1_exports,
    )

    d = str(tmp_path / "scene")
    generate_synthetic_scene(d, n_views=2, n_test=0, n_lights=4, hw=(32, 32))
    write_stage1_exports(d, os.path.join(d, "exports"))
    scene = load_scene_params(d)
    data = load_stage2_data(scene, os.path.join(d, "exports"), "train",
                            inten_normalize=None, vis_plus=False)
    batch = sample_stage2_patches(data, 0, jax.random.PRNGKey(0),
                                  n_patches=8, r_patch=2, light_bs=3)
    n = 8 * 16
    assert batch["uv"].shape == (n, 2)
    assert batch["rgb_gt"].shape == (3, n, 3)
    # each patch is a contiguous 4x4 block: x-coords within a patch span 4
    uv = np.asarray(batch["uv"]).reshape(8, 16, 2)
    for p in uv:
        assert p[:, 0].max() - p[:, 0].min() == 3
        assert p[:, 1].max() - p[:, 1].min() == 3


def test_light_avg_intnorm_sdps(tmp_path):
    from psnerf_tpu.data.synthetic import generate_synthetic_scene
    from psnerf_tpu.preprocess.light_avg import light_average

    d = str(tmp_path / "scene")
    generate_synthetic_scene(d, n_views=2, n_test=0, n_lights=4, hw=(24, 24))
    out = light_average(d, intnorm=True, sdps=True)
    # intensity-normalized per-light images + avg
    assert os.path.exists(os.path.join(out, "view_01", "001.png"))
    assert os.path.exists(os.path.join(out, "avg", "view_01.png"))
    assert out.endswith("img_intnorm_sdps_l4")
