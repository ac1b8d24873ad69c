import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psnerf_tpu.core import (
    alpha_composite,
    arange_pixels,
    gen_light_xyz,
    get_camera_params,
    get_sphere_intersection,
    image_points_to_ray,
    nerf_embed,
    nerf_embed_dim,
    origin_to_world,
    quat_to_rot,
    stratified_noise,
)
from psnerf_tpu.core.spherical import cart2sph, sph2cart, uniform_sample_sph


def test_nerf_embed_layout():
    # [p, sin(2^0 p), cos(2^0 p), sin(2 p), cos(2 p), ...]
    p = jnp.asarray([[0.3, -0.7, 1.2]])
    out = nerf_embed(p, 2)
    assert out.shape == (1, nerf_embed_dim(3, 2)) == (1, 15)
    np.testing.assert_allclose(out[0, :3], p[0], rtol=1e-6)
    np.testing.assert_allclose(out[0, 3:6], jnp.sin(p[0]), rtol=1e-6)
    np.testing.assert_allclose(out[0, 6:9], jnp.cos(p[0]), rtol=1e-6)
    np.testing.assert_allclose(out[0, 9:12], jnp.sin(2 * p[0]), rtol=1e-6)
    np.testing.assert_allclose(out[0, 12:15], jnp.cos(2 * p[0]), rtol=1e-6)


def test_sphere_intersection_analytic():
    # camera at (0,0,-3) looking +z at a unit sphere: near=2, far=4
    cam = jnp.asarray([0.0, 0.0, -3.0])
    dirs = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]])
    depths, mask = get_sphere_intersection(cam, dirs, r=1.0)
    assert bool(mask[0]) and not bool(mask[1])
    np.testing.assert_allclose(depths[0], [2.0, 4.0], atol=1e-5)
    np.testing.assert_allclose(depths[1], [0.0, 0.0], atol=1e-6)


def test_rays_consistency_stage1_vs_stage2():
    # stage1 (single focal) and stage2 (lift) must agree for fx == fy, no skew
    k = jnp.asarray(
        [[500.0, 0, 256, 0], [0, 500.0, 256, 0], [0, 0, 1, 0], [0, 0, 0, 1.0]]
    )
    pose = jnp.eye(4).at[:3, 3].set(jnp.asarray([1.0, 2.0, -3.0]))
    pix = jnp.asarray([[100.0, 200.0], [256.0, 256.0], [400.0, 50.0]])
    r1 = image_points_to_ray(pix, k, pose)
    r1 = r1 / jnp.linalg.norm(r1, axis=-1, keepdims=True)
    r2, cam_loc = get_camera_params(pix, pose, k)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cam_loc), [1.0, 2.0, -3.0])
    np.testing.assert_allclose(
        np.asarray(origin_to_world(3, pose)), np.tile([[1.0, 2.0, -3.0]], (3, 1))
    )


def test_quat_to_rot_identity():
    r = quat_to_rot(jnp.asarray([[1.0, 0, 0, 0]]))
    np.testing.assert_allclose(np.asarray(r[0]), np.eye(3), atol=1e-6)


def test_alpha_composite_opaque_and_empty():
    # fully transparent: all weights ~0; opaque first sample: weight 1 at 0
    w_empty = alpha_composite(jnp.zeros((4, 5)))
    assert float(jnp.abs(w_empty).max()) < 1e-5
    alpha = jnp.zeros((1, 5)).at[0, 2].set(1.0)
    w = alpha_composite(alpha)
    np.testing.assert_allclose(np.asarray(w[0]), [0, 0, 1, 0, 0], atol=1e-4)


def test_stratified_noise_bounds():
    d = jnp.tile(jnp.linspace(2.0, 3.0, 10), (7, 1))
    out = stratified_noise(d, jax.random.PRNGKey(0))
    assert out.shape == d.shape
    assert float(out.min()) >= 2.0 - 1e-6 and float(out.max()) <= 3.0 + 1e-6
    # monotone cells: each sample stays within its neighbors' midpoints
    assert bool(jnp.all(out[:, 1:] >= out[:, :-1] - 1e-6))


def test_gen_light_xyz_matches_reference_formula():
    xyz, areas = gen_light_xyz(16, 32)
    assert xyz.shape == (16, 32, 3) and areas.shape == (16, 32)
    np.testing.assert_allclose(np.sum(areas), 4 * np.pi, rtol=1e-6)
    np.testing.assert_allclose(
        np.linalg.norm(xyz, axis=-1), 1e2 * np.ones((16, 32)), rtol=1e-6
    )
    # top row is near the north pole (z ~ +r)
    assert np.all(xyz[0, :, 2] > 0) and np.all(xyz[-1, :, 2] < 0)


def test_sph_cart_roundtrip():
    pts = uniform_sample_sph(16)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=-1), 1.0, rtol=1e-6)
    sph = cart2sph(pts)
    back = sph2cart(sph)
    np.testing.assert_allclose(back, pts, atol=1e-10)


def test_arange_pixels_order():
    loc, scaled = arange_pixels((2, 3))  # h=2, w=3
    # x-major order: n = x * h + y
    np.testing.assert_array_equal(
        np.asarray(loc),
        [[0, 0], [0, 1], [1, 0], [1, 1], [2, 0], [2, 1]],
    )
    assert float(scaled.min()) == -1.0 and float(scaled.max()) == 1.0
