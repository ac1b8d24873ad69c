import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psnerf_tpu.data import (
    decode_imgs,
    load_scene_params,
    load_stage1_data,
    load_stage2_data,
    sample_stage1_batch,
    sample_stage2_batch,
    full_view_batch,
)
from psnerf_tpu.data.synthetic import generate_synthetic_scene, write_stage1_exports


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("scene"))
    generate_synthetic_scene(d, n_views=3, n_test=1, n_lights=6, hw=(48, 48))
    write_stage1_exports(d, os.path.join(d, "exports"))
    return d


def test_scene_params(scene_dir):
    scene = load_scene_params(scene_dir)
    assert scene.n_view == 4
    np.testing.assert_array_equal(scene.view_split("train"), [0, 1, 2])
    np.testing.assert_array_equal(scene.view_split("test"), [3])
    np.testing.assert_array_equal(scene.view_split("all"), [0, 1, 2, 3])
    # OpenCV flip negates columns 1:3 of R
    np.testing.assert_allclose(
        scene.pose_cv[0, :3, 1:3], -scene.pose_gl[0, :3, 1:3]
    )
    dirs, slt = scene.lights_world(np.asarray([0, 1]))
    assert dirs[0].shape == (6, 3)
    # rotation preserves norms
    np.testing.assert_allclose(np.linalg.norm(dirs[0], axis=-1), 1.0, rtol=1e-5)


def test_stage1_load_and_sample(scene_dir):
    scene = load_scene_params(scene_dir)
    data = load_stage1_data(scene, "train", inten_normalize=None)
    assert data["imgs"].shape == (3, 48, 48, 3)
    assert data["normals"].shape == (3, 48, 48, 3)
    # white background applied outside mask
    outside = np.asarray(data["imgs"])[~(np.asarray(data["masks"]) > 0.5)]
    np.testing.assert_allclose(outside, 1.0, atol=1e-2)

    batch = jax.jit(
        lambda v, k: sample_stage1_batch(data, v, k, 128)
    )(0, jax.random.PRNGKey(0))
    assert batch["pixels"].shape == (128, 2)
    assert batch["rgb_gt"].shape == (128, 3)
    # world-frame normal supervision: unit norm inside norm_mask
    m = np.asarray(batch["norm_mask"])
    if m.any():
        nn = np.linalg.norm(np.asarray(batch["normal_gt"])[m], axis=-1)
        np.testing.assert_allclose(nn, 1.0, atol=1e-3)


def test_stage1_normal_world_consistency(scene_dir):
    """The SDPS camera->world rotation must recover the analytic sphere
    normal: at surface pixels, normal_gt == p / r."""
    scene = load_scene_params(scene_dir)
    data = load_stage1_data(scene, "train", inten_normalize=None)
    batch = full_view_batch(data, 0)
    m = np.asarray(batch["norm_mask"]) > 0.5
    n_world = np.asarray(batch["normal_gt"])[m]
    # reconstruct the surface point from the exports
    exports = np.load(os.path.join(scene_dir, "exports", "points", "view_01.npy"))
    hitmask = np.load(os.path.join(scene_dir, "exports", "mask", "view_01.npy"))
    # full_view_batch order is x-major; exports are row-major -> remap
    h = w = 48
    xs, ys = np.meshgrid(np.arange(w), np.arange(h), indexing="ij")
    rowmajor_idx = (ys * w + xs).reshape(-1)
    pts = exports[rowmajor_idx][m]
    expected = pts / np.maximum(np.linalg.norm(pts, axis=-1, keepdims=True), 1e-9)
    dot = np.sum(n_world * expected, axis=-1)
    assert dot.mean() > 0.99


def test_stage2_load_and_sample(scene_dir):
    scene = load_scene_params(scene_dir)
    data = load_stage2_data(
        scene, os.path.join(scene_dir, "exports"), "train",
        inten_normalize=None,
    )
    assert data["imgs"].shape == (3, 6, 48 * 48, 3)
    assert data["visibility"].shape == (3, 6, 48 * 48)
    assert data["vis_plus"].shape[0] == 3
    assert data["n_light_rows"] == 18

    init_dirs = data["light_dirs"]
    batch = sample_stage2_batch(
        data, 0, jax.random.PRNGKey(0), num_pixels=64, light_bs=4,
        vis_train_num=5, light_init_dirs=init_dirs,
    )
    assert batch["rgb_gt"].shape == (4, 64, 3)
    assert batch["visibility"].shape == (4, 64)
    assert batch["light_vis_train"].shape == (5, 3)
    assert batch["vis_train_gt"].shape == (5, 64)
    # sample_in_mask: all sampled pixels inside the object mask
    assert bool(batch["object_mask"].all())
    # global light rows for view 0 are 0..5
    assert set(np.asarray(batch["l_slt"])).issubset(set(range(6)))


def test_stage2_u8_image_store_bitexact(scene_dir):
    """The default "auto" store keeps 8-bit PNG bytes on device; decoding
    must be BIT-identical to the f32 load path (one IEEE /255 either way),
    and sampled batches must match exactly."""
    scene = load_scene_params(scene_dir)
    d8 = load_stage2_data(scene, os.path.join(scene_dir, "exports"), "train",
                          inten_normalize=None)
    df = load_stage2_data(scene, os.path.join(scene_dir, "exports"), "train",
                          inten_normalize=None, image_store="f32")
    assert d8["imgs"].dtype == jnp.uint8
    assert df["imgs"].dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(decode_imgs(d8["imgs"])),
                                  np.asarray(df["imgs"]))
    key = jax.random.PRNGKey(3)
    b8 = sample_stage2_batch(d8, 1, key, num_pixels=64, light_bs=4,
                             vis_train_num=5, light_init_dirs=d8["light_dirs"])
    bf = sample_stage2_batch(df, 1, key, num_pixels=64, light_bs=4,
                             vis_train_num=5, light_init_dirs=df["light_dirs"])
    assert b8["rgb_gt"].dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(b8["rgb_gt"]),
                                  np.asarray(bf["rgb_gt"]))
    # exhaustive: every possible byte decodes exactly as f32(u)/f32(255.0)
    # on whatever backend the suite runs on (pins the lowering as a true
    # division, not reciprocal-multiply)
    np.testing.assert_array_equal(
        np.asarray(decode_imgs(jnp.arange(256, dtype=jnp.uint8))),
        np.arange(256, dtype=np.float32) / np.float32(255.0))


def test_stage2_forced_u8_raises_on_non8bit(scene_dir, monkeypatch):
    """image_store="u8" is a promise about HBM/transfer; a non-8-bit source
    must fail fast instead of silently demoting the stack to f32."""
    from psnerf_tpu.data import stage2 as stage2_mod
    # simulate a non-8-bit source (e.g. 16-bit capture): the u8 loader
    # declines every image, forcing the fallback decision
    monkeypatch.setattr(stage2_mod, "load_image_u8", lambda p: None)
    scene = load_scene_params(scene_dir)
    with pytest.raises(ValueError, match="not an 8-bit"):
        load_stage2_data(scene, os.path.join(scene_dir, "exports"), "train",
                         inten_normalize=None, image_store="u8")
    # "auto" still works via the silent f32 fallback
    d = load_stage2_data(scene, os.path.join(scene_dir, "exports"), "train",
                         inten_normalize=None, image_store="auto")
    assert d["imgs"].dtype == jnp.float32


def test_stage2_shading_consistency(scene_dir):
    """Render the synthetic scene with the ANALYTIC brdf through render_psnet
    inputs (GT geometry + lights): rgb from the data must be reproducible up
    to quantization -> validates light/pose/visibility conventions end-to-end."""
    scene = load_scene_params(scene_dir)
    data = load_stage2_data(scene, os.path.join(scene_dir, "exports"), "train",
                            inten_normalize=None)
    v = 0
    px = np.asarray(data["surface_mask"][v]).nonzero()[0][::7][:200]
    pts = np.asarray(data["points"][v])[px]
    nrm = np.asarray(data["normals"][v])[px]
    ldir = np.asarray(data["light_dirs"][v])  # [L,3] world
    vis = np.asarray(data["visibility"][v])[:, px]
    img = np.asarray(decode_imgs(data["imgs"][v]))[:, px]  # [L,200,3]
    albedo = 0.45 + 0.25 * np.stack(
        [np.sin(4 * pts[:, 0]), np.cos(4 * pts[:, 1]), np.sin(4 * pts[:, 2])], -1)
    cos = np.maximum(np.einsum("li,ni->ln", ldir, nrm), 0)
    pred = np.clip(albedo[None] * 1.2 * cos[..., None], 0, 1) * vis[..., None]
    diff = np.abs(pred - img)
    # specular adds energy; lambert-only should still be within the specular
    # lobe amplitude on most pixels
    assert np.median(diff) < 0.04