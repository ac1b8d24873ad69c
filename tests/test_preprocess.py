import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psnerf_tpu.preprocess.sdps import (
    class_to_light_ints,
    init_lcnet,
    init_nenet,
    lcnet_forward,
    light_ints_to_class,
    nenet_forward,
    spherical_class_to_dirs,
    spherical_dirs_to_class,
)


def test_codec_roundtrip_dirs():
    """direction -> (azimuth, elevation) classes -> direction must land in the
    same class cell (reference codecs, eval_utils.py:54-91)."""
    rng = np.random.default_rng(0)
    d = rng.normal(size=(64, 3))
    d[:, 2] = np.abs(d[:, 2]) + 0.2  # camera-facing hemisphere
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    az, el = spherical_dirs_to_class(jnp.asarray(d), 36)
    back = spherical_class_to_dirs(az, el, 36)
    az2, el2 = spherical_dirs_to_class(back, 36)
    np.testing.assert_array_equal(np.asarray(az), np.asarray(az2))
    np.testing.assert_array_equal(np.asarray(el), np.asarray(el2))
    # angular error bounded by the class cell size (~5 deg + distortion)
    dot = np.clip(np.sum(np.asarray(back) * d, -1), -1, 1)
    assert np.degrees(np.arccos(dot)).max() < 8.0


def test_codec_roundtrip_ints():
    ints = jnp.asarray([0.2, 0.5, 1.0, 1.5, 2.0])
    cls = light_ints_to_class(ints, 20)
    back = class_to_light_ints(cls, 20)
    assert float(jnp.abs(back - ints).max()) <= 0.045 + 1e-6


def test_lcnet_shapes():
    params = init_lcnet(jax.random.PRNGKey(0))
    l = 4
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (l, 3, 128, 128))
    mask = jnp.ones((1, 128, 128))
    out = lcnet_forward(params, imgs, mask)
    assert out["dirs"].shape == (l, 3)
    assert out["intens"].shape == (l,)
    assert out["dirs_x"].shape == (l, 36)
    assert out["ints"].shape == (l, 20)
    nrm = np.linalg.norm(np.asarray(out["dirs"]), axis=-1)
    np.testing.assert_allclose(nrm, 1.0, rtol=1e-5)
    assert float(out["intens"].min()) >= 0.2
    assert float(out["intens"].max()) <= 2.0


def test_nenet_shapes():
    params = init_nenet(jax.random.PRNGKey(0))
    l, h, w = 4, 32, 48
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (l, 3, h, w))
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (l, 1))
    ints = jnp.ones((l,))
    n = nenet_forward(params, imgs, dirs, ints)
    assert n.shape == (3, h, w)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(n), axis=0), 1.0, rtol=1e-5)


def test_run_sdps_driver(tmp_path):
    """Full driver on a synthetic scene with random-init nets: exercises the
    crop/pad/resize/re-embed plumbing and the output contract."""
    from psnerf_tpu.data.synthetic import generate_synthetic_scene
    from psnerf_tpu.preprocess.runner import run_sdps

    d = str(tmp_path / "scene")
    generate_synthetic_scene(d, n_views=2, n_test=0, n_lights=3, hw=(48, 48))
    lc = init_lcnet(jax.random.PRNGKey(0))
    ne = init_nenet(jax.random.PRNGKey(1))
    out = run_sdps(d, lc, ne, out_dir=str(tmp_path / "sdps_out"))
    dirs = np.load(os.path.join(out, "light_direction_pred.npy"))
    ints = np.load(os.path.join(out, "light_intensity_pred.npy"))
    assert dirs.shape == (2, 3, 3) and ints.shape == (2, 3)
    n = np.load(os.path.join(out, "outnpy", "view_01.npy"))
    assert n.shape == (48, 48, 3)
    # normals only inside the (re-embedded) mask region
    assert np.linalg.norm(n[0, 0]) == 0.0
    assert np.abs(n).sum() > 0
