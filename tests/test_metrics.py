import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psnerf_tpu.eval.metrics import mae, psnr, scale_img, ssim, white_bg
from psnerf_tpu.eval.lpips_jax import alex_features, lpips_distance, _TAP_CHANNELS


def test_psnr_golden():
    a = np.zeros((8, 8, 3))
    b = np.full((8, 8, 3), 0.1)
    np.testing.assert_allclose(psnr(a, b), -10 * np.log10(0.01), rtol=1e-6)
    assert psnr(a, a) == 100.0
    mask = np.zeros((8, 8), bool)
    mask[:4] = True
    b2 = a.copy()
    b2[4:] = 1.0  # error only outside mask
    np.testing.assert_allclose(psnr(a, b2, mask), 100.0)


def test_mae_golden():
    v1 = np.asarray([[0, 0, 1.0], [1.0, 0, 0]])
    v2 = np.asarray([[0, 0, 1.0], [0, 1.0, 0]])
    m, per = mae(v1, v2)
    # the reference divides by (norm + 1e-5), so even identical unit vectors
    # read ~0.36 deg — faithful bias, not a bug (metrics.py:27)
    np.testing.assert_allclose(per, [0.0, 90.0], atol=0.6)
    np.testing.assert_allclose(m, 45.0, atol=0.5)
    # un-normalized vectors get normalized first
    m2, _ = mae(v1 * 3.7, v2 * 0.2)
    np.testing.assert_allclose(m2, 45.0, atol=0.5)


def test_ssim_properties():
    rng = np.random.default_rng(0)
    img = rng.random((32, 32, 3))
    np.testing.assert_allclose(ssim(img, img), 1.0, atol=1e-10)
    noisy1 = np.clip(img + rng.normal(0, 0.05, img.shape), 0, 1)
    noisy2 = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1)
    s1, s2 = ssim(img, noisy1), ssim(img, noisy2)
    assert 0 < s2 < s1 < 1
    # regression pin (drift guard for the skimage-compatible implementation)
    img_a = np.outer(np.linspace(0, 1, 32), np.ones(32))[..., None].repeat(3, -1)
    img_b = img_a**1.5
    np.testing.assert_allclose(ssim(img_a, img_b), 0.892677, atol=2e-4)


def test_scale_img_recovers_brightness():
    rng = np.random.default_rng(1)
    gt = rng.random((16, 16, 3)) * 0.5
    img = gt / 1.7  # uniformly darker prediction
    mask = np.ones((16, 16), bool)
    out = scale_img(img, gt, mask)
    np.testing.assert_allclose(out, gt, atol=1e-6)


def test_white_bg():
    img = np.zeros((4, 4, 3))
    mask = np.zeros((4, 4), bool)
    mask[0, 0] = True
    out = white_bg(img, mask)
    assert out[0, 0].sum() == 0 and out[1, 1].sum() == 3.0


def test_lpips_architecture_shapes():
    """Random weights: verify the conv stack + heads wire up and the distance
    is 0 for identical inputs, > 0 for different ones."""
    rng = np.random.default_rng(0)
    params = {}
    in_ch = 3
    kernels = [11, 5, 3, 3, 3]
    for i, (out_ch, k) in enumerate(zip(_TAP_CHANNELS, kernels)):
        params[f"conv{i}_w"] = jnp.asarray(
            rng.normal(0, 0.05, (out_ch, in_ch, k, k)), jnp.float32)
        params[f"conv{i}_b"] = jnp.zeros((out_ch,), jnp.float32)
        params[f"lin{i}_w"] = jnp.asarray(
            rng.random((1, out_ch, 1, 1)), jnp.float32)
        in_ch = out_ch
    img = jnp.asarray(rng.random((64, 64, 3)), jnp.float32)
    taps = alex_features(params, img.transpose(2, 0, 1)[None])
    assert [t.shape[1] for t in taps] == _TAP_CHANNELS
    d_same = float(lpips_distance(params, img, img))
    np.testing.assert_allclose(d_same, 0.0, atol=1e-6)
    img2 = jnp.asarray(rng.random((64, 64, 3)), jnp.float32)
    assert float(lpips_distance(params, img, img2)) > 0


def test_lpips_npz_export_roundtrip(tmp_path):
    """tools/export_lpips_npz.py converts an lpips-package-style state_dict
    (net.sliceK.N.* conv keys + lin{i}.model.1.weight heads) to the npz that
    LPIPS() loads; the loaded metric runs and matches the direct params."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from export_lpips_npz import export_from_state_dict

    from psnerf_tpu.eval.lpips_jax import LPIPS

    rng = np.random.default_rng(1)
    slice_of_conv = {0: 1, 3: 2, 6: 3, 8: 4, 10: 5}
    kernels = [11, 5, 3, 3, 3]
    sd, params = {}, {}
    in_ch = 3
    for i, (conv_id, k, out_ch) in enumerate(
            zip(slice_of_conv, kernels, _TAP_CHANNELS)):
        w = rng.normal(0, 0.05, (out_ch, in_ch, k, k)).astype(np.float32)
        b = rng.normal(0, 0.01, (out_ch,)).astype(np.float32)
        lin = rng.random((1, out_ch, 1, 1)).astype(np.float32)
        sd[f"net.slice{slice_of_conv[conv_id]}.{conv_id}.weight"] = w
        sd[f"net.slice{slice_of_conv[conv_id]}.{conv_id}.bias"] = b
        sd[f"lin{i}.model.1.weight"] = lin
        params[f"conv{i}_w"] = jnp.asarray(w)
        params[f"conv{i}_b"] = jnp.asarray(b)
        params[f"lin{i}_w"] = jnp.asarray(lin)
        in_ch = out_ch

    out_npz = str(tmp_path / "lpips_alex.npz")
    export_from_state_dict(sd, out_npz)

    metric = LPIPS(weights_path=out_npz)
    assert metric.available
    img1 = rng.random((64, 64, 3)).astype(np.float32)
    img2 = rng.random((64, 64, 3)).astype(np.float32)
    got = metric(img1, img2)
    want = float(lpips_distance(params, jnp.asarray(img1), jnp.asarray(img2)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    np.testing.assert_allclose(metric(img1, img1), 0.0, atol=1e-6)


def test_lpips_unavailable_is_loud(tmp_path, monkeypatch):
    """Without weights the evaluation output must SAY lpips is unavailable,
    not silently omit it."""
    monkeypatch.delenv("LPIPS_WEIGHTS", raising=False)
    from psnerf_tpu.eval.lpips_jax import LPIPS

    metric = LPIPS()
    assert not metric.available and metric(np.zeros((4, 4, 3)),
                                           np.zeros((4, 4, 3))) is None


def test_lpips_status_machine_safe(tmp_path, monkeypatch, scene_and_outputs):
    """evaluate_outputs encodes a missing LPIPS as null + a status string so
    downstream JSON comparison never trips over prose."""
    monkeypatch.delenv("LPIPS_WEIGHTS", raising=False)
    from psnerf_tpu.eval.evaluation import evaluate_outputs

    scene_dir, test_out = scene_and_outputs
    res = evaluate_outputs(scene_dir, test_out)
    assert res["lpips"] is None
    assert res["lpips_status"].startswith("unavailable")


def _random_lpips_npz(path: str, seed: int = 3) -> None:
    """Random-but-valid lpips-alex weights through the REAL export tool."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from export_lpips_npz import export_from_state_dict

    rng = np.random.default_rng(seed)
    slice_of_conv = {0: 1, 3: 2, 6: 3, 8: 4, 10: 5}
    kernels = [11, 5, 3, 3, 3]
    sd = {}
    in_ch = 3
    for i, (conv_id, k, out_ch) in enumerate(
            zip(slice_of_conv, kernels, _TAP_CHANNELS)):
        sd[f"net.slice{slice_of_conv[conv_id]}.{conv_id}.weight"] = \
            rng.normal(0, 0.05, (out_ch, in_ch, k, k)).astype(np.float32)
        sd[f"net.slice{slice_of_conv[conv_id]}.{conv_id}.bias"] = \
            rng.normal(0, 0.01, (out_ch,)).astype(np.float32)
        sd[f"lin{i}.model.1.weight"] = \
            rng.random((1, out_ch, 1, 1)).astype(np.float32)
        in_ch = out_ch
    export_from_state_dict(sd, path)


@pytest.fixture(scope="module")
def scene_and_outputs(tmp_path_factory):
    """A tiny synthetic scene + fabricated stage-2 output tree: predictions =
    GT images + norm_mask + world-rotated GT normals (the eval contract,
    reference evaluation.py:28-97)."""
    import shutil

    from psnerf_tpu.data.synthetic import generate_synthetic_scene

    tmp_path = tmp_path_factory.mktemp("evalscene")
    scene = str(tmp_path / "scene")
    generate_synthetic_scene(scene, n_views=2, n_test=1, n_lights=2,
                             hw=(48, 48), radius=0.6, focal=60.0)
    with open(os.path.join(scene, "params.json")) as f:
        para = json.load(f)
    out = str(tmp_path / "test_out")

    # fabricate a stage-2 output tree for the test views: predictions =
    # GT images + norm_mask + world-rotated GT normals (the eval contract,
    # reference evaluation.py:28-97)
    poses = np.asarray(para["pose_c2w"], np.float32)
    for vi in para["view_test"]:
        name = f"view_{vi + 1:02d}"
        os.makedirs(os.path.join(out, "rgb", "img", name))
        os.makedirs(os.path.join(out, "mask", "img"), exist_ok=True)
        os.makedirs(os.path.join(out, "normal", "npy"), exist_ok=True)
        for li in range(len(para["light_direction"])):
            shutil.copy(
                os.path.join(scene, "img", name, f"{li + 1:03d}.png"),
                os.path.join(out, "rgb", "img", name, f"{li + 1:03d}.png"))
        shutil.copy(os.path.join(scene, "norm_mask", name + ".png"),
                    os.path.join(out, "mask", "img", name + ".png"))
        n_cam = np.load(os.path.join(scene, "normal", "npy", name + ".npy"))
        n_world = np.einsum("ij,hwj->hwi", poses[vi, :3, :3], n_cam)
        np.save(os.path.join(out, "normal", "npy", name + ".npy"), n_world)
    return scene, out


def test_lpips_end_to_end_through_evaluation(tmp_path, monkeypatch,
                                             scene_and_outputs):
    """Full plumbing smoke (VERDICT r3 #8): random-but-valid AlexNet+head
    weights -> tools/export_lpips_npz.py -> LPIPS_WEIGHTS -> the REAL
    evaluation.evaluate_outputs path produces a numeric lpips (meaningless
    value, real execution). Drop real weights at LPIPS_WEIGHTS and the
    published metric lights up with zero code changes."""
    from psnerf_tpu.eval.evaluation import evaluate_outputs

    scene, out = scene_and_outputs
    npz = str(tmp_path / "lpips_alex.npz")
    _random_lpips_npz(npz)
    monkeypatch.setenv("LPIPS_WEIGHTS", npz)
    res = evaluate_outputs(scene, out)
    assert isinstance(res["lpips"], float) and np.isfinite(res["lpips"]), res
    assert res["psnr"] > 40  # predictions are the GT images themselves
