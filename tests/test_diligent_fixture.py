"""Miniature hand-built DiLiGenT-MV-format dataset fixture.

The synthetic scenes cover the default params.json surface; the real
released datasets (reference README.md:140-220) additionally use
`view_slt_N` / `light_slt_N` training subsets, GT `light_intensity`
normalization (light_avg.py --light_intnorm), camera-frame GT normals
(`gt_normal_world: false`), and a `norm_mask/` distinct from `mask/`.
This fixture exercises exactly that optional surface — both
`light_is_same` settings — so the loaders are provably day-1 ready for
the downloaded data.
"""

import json
import os

import imageio.v2 as imageio
import numpy as np
import pytest

from psnerf_tpu.data import load_scene_params, load_stage1_data, load_stage2_data
from psnerf_tpu.preprocess.light_avg import light_average

HW = 16
N_VIEW = 4          # 3 train + 1 test
N_LIGHT = 5
LIGHT_SLT_3 = [0, 2, 4]
VIEW_SLT_2 = [0, 2]


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float64)


def _base_img(v):
    """Per-view deterministic base pattern in [0, 0.4]."""
    y, x = np.meshgrid(np.arange(HW), np.arange(HW), indexing="ij")
    g = (x + y * (v + 1)) % HW / (HW - 1)
    return np.stack([g, g[::-1], g.T], -1) * 0.4


def _to8(x):
    return (np.clip(x, 0, 1) * 255).round().astype(np.uint8)


def _build_fixture(d, light_is_same=True):
    os.makedirs(d, exist_ok=True)
    poses = []
    for v in range(N_VIEW):
        R = _rot_y(0.35 * v + 0.1)
        c2w = np.eye(4)
        c2w[:3, :3] = R
        c2w[:3, 3] = R @ [0.0, 0.0, 3.0]
        poses.append(c2w)
    rng = np.random.default_rng(11)
    dirs = rng.normal(size=(N_LIGHT, 3))
    dirs[:, 2] = -np.abs(dirs[:, 2])  # camera-frame, toward the object
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    inten = 0.8 + 0.7 * rng.random((N_LIGHT, 3))

    params = {
        "obj_name": "mini_diligent",
        "n_view": N_VIEW,
        "imhw": [HW, HW],
        "gt_normal_world": False,
        "view_train": [0, 1, 2],
        "view_test": [3],
        "view_slt_2": VIEW_SLT_2,
        "K": np.array([[20.0, 0, 8, 0], [0, 20.0, 8, 0],
                       [0, 0, 1, 0], [0, 0, 0, 1]]).tolist(),
        "pose_c2w": np.asarray(poses).tolist(),
        "light_is_same": light_is_same,
    }
    if light_is_same:
        params["light_direction"] = dirs.tolist()
        params["light_intensity"] = inten.tolist()
        params["light_slt_3"] = LIGHT_SLT_3
        per_view_lights = [np.arange(N_LIGHT)] * N_VIEW
    else:
        # ragged per-view light rigs (different counts per view)
        counts = [4, 3, 5, 3]
        params["light_direction"] = [dirs[:c].tolist() for c in counts]
        params["light_intensity"] = [inten[:c].tolist() for c in counts]
        per_view_lights = [np.arange(c) for c in counts]
    with open(os.path.join(d, "params.json"), "w") as f:
        json.dump(params, f)

    mask = np.zeros((HW, HW), np.uint8)
    mask[4:12, 4:12] = 255
    norm_mask = np.zeros((HW, HW), np.uint8)
    norm_mask[5:11, 5:11] = 255
    os.makedirs(os.path.join(d, "mask"), exist_ok=True)
    os.makedirs(os.path.join(d, "norm_mask"), exist_ok=True)
    os.makedirs(os.path.join(d, "normal", "npy"), exist_ok=True)
    for v in range(N_VIEW):
        name = f"view_{v + 1:02d}"
        imageio.imwrite(os.path.join(d, "mask", name + ".png"), mask)
        imageio.imwrite(os.path.join(d, "norm_mask", name + ".png"),
                        norm_mask)
        # camera-frame GT normals (gt_normal_world=false)
        n = np.stack([np.full((HW, HW), 0.3), np.full((HW, HW), -0.2),
                      np.full((HW, HW), 0.95)], -1)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        np.save(os.path.join(d, "normal", "npy", name + ".npy"),
                (n * (mask[..., None] > 0)).astype(np.float32))
        os.makedirs(os.path.join(d, "img", name), exist_ok=True)
        base = _base_img(v)
        ints = inten if light_is_same else np.asarray(
            params["light_intensity"][v])
        for li in per_view_lights[v]:
            img = base * ints[li][None, None]
            imageio.imwrite(os.path.join(d, "img", name, f"{li + 1:03d}.png"),
                            _to8(img))
    return params, mask, norm_mask


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mini_diligent"))
    _build_fixture(d, light_is_same=True)
    return d


@pytest.fixture(scope="module")
def ragged_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mini_diligent_ragged"))
    _build_fixture(d, light_is_same=False)
    return d


def test_view_slt_and_light_slt(fixture_dir):
    scene = load_scene_params(fixture_dir)
    assert scene.light_is_same and not scene.gt_normal_world
    np.testing.assert_array_equal(
        scene.view_split("train", train_view=2), VIEW_SLT_2)
    # "all" = view_slt_2 + view_test, sorted (reference dataset.py view
    # handling: the slt subset replaces view_train everywhere)
    np.testing.assert_array_equal(
        scene.view_split("all", train_view=2), [0, 2, 3])
    views = scene.view_split("train", train_view=2)
    dirs_w, slt = scene.lights_world(views, train_light=3)
    assert len(dirs_w) == 2
    np.testing.assert_array_equal(slt[0], LIGHT_SLT_3)
    raw = np.asarray(scene.raw["light_direction"], np.float32)[LIGHT_SLT_3]
    for i, v in enumerate(views):
        expect = np.einsum("ij,kj->ki", scene.pose_gl[v, :3, :3], raw)
        np.testing.assert_allclose(dirs_w[i], expect, atol=1e-6)
        np.testing.assert_allclose(
            np.linalg.norm(dirs_w[i], axis=-1), 1.0, atol=1e-5)


def test_img_subdir_and_sdps_naming(fixture_dir):
    scene = load_scene_params(fixture_dir)
    assert scene.img_subdir(None, 3) == ("img", "avg_l3")
    assert scene.img_subdir("gt", 3) == ("img_intnorm_gt", "avg_l3")
    assert scene.img_subdir("sdps", 3) == ("img_intnorm_sdps_l3", "avg")
    assert scene.sdps_dir("gt", 3).endswith("sdps_out_intnorm_gt_l3")


def test_light_avg_gt_intnorm(fixture_dir):
    out = light_average(fixture_dir, train_light=3, intnorm=True)
    assert out.endswith("img_intnorm_gt")
    inten = np.asarray(json.load(
        open(os.path.join(fixture_dir, "params.json")))["light_intensity"])
    # per-light normalized copies + the avg image exist for every view
    for v in range(N_VIEW):
        name = f"view_{v + 1:02d}"
        avg = np.asarray(imageio.imread(
            os.path.join(out, "avg_l3", name + ".png")), np.float64) / 255.0
        # with img_l = base * int_l, normalizing by int_l/int_anchor makes
        # every selected light ≈ base * int_anchor (anchor = first selected
        # light for an explicit train_light — light_avg.py:71)
        base = _base_img(v)
        mask = np.zeros((HW, HW, 1)); mask[4:12, 4:12] = 1.0
        expect = np.clip(base * inten[LIGHT_SLT_3[0]][None, None], 0, 1) * mask
        assert np.abs(avg - expect).max() < 0.02
        for li in LIGHT_SLT_3:
            p = os.path.join(out, name, f"{li + 1:03d}.png")
            assert os.path.exists(p)
        # non-selected lights are not normalized
        assert not os.path.exists(os.path.join(out, name, "002.png"))


def test_stage1_loader_on_fixture(fixture_dir):
    scene = load_scene_params(fixture_dir)
    # SDPS-predicted normals live under sdps_out_intnorm_gt_l3/outnpy
    sd = os.path.join(scene.sdps_dir("gt", 3), "outnpy")
    os.makedirs(sd, exist_ok=True)
    for v in range(N_VIEW):
        n = np.zeros((HW, HW, 3), np.float32)
        n[..., 2] = 1.0
        np.save(os.path.join(sd, f"view_{v + 1:02d}.npy"), n)
    light_average(fixture_dir, train_light=3, intnorm=True)
    data = load_stage1_data(scene, "train", inten_normalize="gt",
                            train_view=2, train_light=3)
    assert data["imgs"].shape == (2, HW, HW, 3)
    np.testing.assert_array_equal(data["views"], VIEW_SLT_2)
    # norm_mask is the SMALLER norm_mask/ file, not mask/
    nm = np.asarray(data["norm_mask"][0])
    assert nm[5:11, 5:11].all() and not nm[4, 4]
    # white background outside the mask
    outside = np.asarray(data["imgs"][0])[~(np.asarray(data["masks"][0]) > 0)]
    np.testing.assert_allclose(outside, 1.0, atol=1e-6)


def test_stage2_loader_world_normal_rotation(fixture_dir):
    """gt_normal_world=false: the loader must rotate the camera-frame GT
    normals to world by the OpenGL pose rotation (stage2 dataset.py:107)."""
    scene = load_scene_params(fixture_dir)
    light_average(fixture_dir, train_light=3, intnorm=True)
    # hand-written stage-1 exports in the shape_extract layout
    exports = os.path.join(fixture_dir, "exports_l3")
    for sub in ("points", "mask", "normal", "visibility", "vis_plus"):
        os.makedirs(os.path.join(exports, sub), exist_ok=True)
    rng = np.random.default_rng(5)
    vp_json = {}
    for v in range(N_VIEW):
        name = f"view_{v + 1:02d}"
        np.save(os.path.join(exports, "points", name + ".npy"),
                rng.normal(size=(HW, HW, 3)).astype(np.float32))
        m = np.zeros((HW, HW), bool); m[4:12, 4:12] = True
        np.save(os.path.join(exports, "mask", name + ".npy"), m)
        nn = rng.normal(size=(HW, HW, 3))
        nn /= np.linalg.norm(nn, axis=-1, keepdims=True)
        np.save(os.path.join(exports, "normal", name + ".npy"),
                nn.astype(np.float32))
        np.save(os.path.join(exports, "visibility", name + ".npy"),
                rng.random((len(LIGHT_SLT_3), HW, HW)).astype(np.float32))
        np.save(os.path.join(exports, "vis_plus", name + ".npy"),
                rng.random((4, HW, HW)).astype(np.float32))
        vd = rng.normal(size=(4, 3))
        vp_json[name] = (vd / np.linalg.norm(vd, -1, keepdims=True)).tolist()
    with open(os.path.join(exports, "vis_plus", "light_dir.json"), "w") as f:
        json.dump(vp_json, f)

    data = load_stage2_data(scene, exports, "train", inten_normalize="gt",
                            train_view=2, train_light=3)
    assert data["imgs"].shape == (2, len(LIGHT_SLT_3), HW * HW, 3)
    assert data["visibility"].shape == (2, len(LIGHT_SLT_3), HW * HW)
    assert data["vis_plus"].shape == (2, 4, HW * HW)
    # GT normal rotated cam->world, masked
    cam_n = np.load(os.path.join(fixture_dir, "normal", "npy",
                                 "view_01.npy")).reshape(-1, 3)
    expect = np.einsum("ij,nj->ni", scene.pose_gl[0, :3, :3], cam_n)
    np.testing.assert_allclose(np.asarray(data["gt_normal"][0]), expect,
                               atol=1e-6)


def test_ragged_fixture(ragged_dir):
    scene = load_scene_params(ragged_dir)
    assert not scene.light_is_same
    views = scene.view_split("train")
    dirs_w, slt = scene.lights_world(views)
    assert [len(d) for d in dirs_w] == [4, 3, 5]
    # GT-intensity normalization on a per-view-rig dataset: avg (no _lN
    # suffix) under img_intnorm_gt, anchored at each view's light 0
    out = light_average(ragged_dir, intnorm=True)
    inten = json.load(
        open(os.path.join(ragged_dir, "params.json")))["light_intensity"]
    for v, c in enumerate([4, 3, 5, 3]):
        name = f"view_{v + 1:02d}"
        avg = np.asarray(imageio.imread(
            os.path.join(out, "avg", name + ".png")), np.float64) / 255.0
        base = _base_img(v)
        mask = np.zeros((HW, HW, 1)); mask[4:12, 4:12] = 1.0
        expect = np.clip(base * np.asarray(inten[v][0])[None, None],
                         0, 1) * mask
        assert np.abs(avg - expect).max() < 0.02
