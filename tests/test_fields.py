import jax
import jax.numpy as jnp
import numpy as np

from psnerf_tpu.fields import (
    OccFieldConfig,
    init_occupancy_field,
    occ_alpha,
    occ_gradient,
    occ_logit,
    radiance_and_alpha,
    sg_basis,
    microfacet_brdf,
    skip_mlp_init,
    skip_mlp_apply,
    wn_linear_init,
    wn_linear_apply,
)
from psnerf_tpu.fields.mlp import wn_from_dense

CFG = OccFieldConfig(num_layers=4, hidden_dim=64, feat_size=64)
# geometric-init statistics only hold at the shipped architecture size
CFG_FULL = OccFieldConfig()


def test_weight_norm_equals_dense_at_init():
    key = jax.random.PRNGKey(0)
    p = wn_linear_init(key, 8, 16)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 8))
    # at init g = ||v||, so wn == dense with w = v
    np.testing.assert_allclose(
        np.asarray(wn_linear_apply(p, x)), np.asarray(x @ p["v"] + p["b"]), rtol=2e-5
    )
    # scaling g scales the output weight column
    p2 = dict(p, g=p["g"] * 2.0)
    np.testing.assert_allclose(
        np.asarray(wn_linear_apply(p2, x) - p["b"]),
        np.asarray(2 * (x @ p["v"])),
        rtol=2e-5, atol=1e-5,
    )


def test_geometric_init_is_spherical():
    """Geometric init approximates a sphere SDF of radius ~0.6: logit should be
    positive outside, negative inside, alpha ~0 outside / ~1 inside."""
    params = init_occupancy_field(jax.random.PRNGKey(0), CFG_FULL)
    p_out = jnp.asarray([[1.5, 0.0, 0.0], [0.0, -1.4, 0.3]])
    p_in = jnp.asarray([[0.05, 0.0, 0.0], [0.0, 0.1, -0.05]])
    assert bool(jnp.all(occ_logit(params, p_out, CFG_FULL) > 0))
    assert bool(jnp.all(occ_logit(params, p_in, CFG_FULL) < 0))
    assert float(occ_alpha(params, p_out, CFG_FULL).max()) < 0.1
    assert float(occ_alpha(params, p_in, CFG_FULL).min()) > 0.9


def test_occ_gradient_points_outward():
    params = init_occupancy_field(jax.random.PRNGKey(0), CFG_FULL)
    p = jnp.asarray([[0.8, 0.0, 0.0], [0.0, 0.9, 0.0], [0.0, 0.0, -0.7]])
    g = occ_gradient(params, p, CFG_FULL)
    # gradient of an SDF-like sphere field points radially outward
    cos = jnp.sum(g * p, axis=-1) / (
        jnp.linalg.norm(g, axis=-1) * jnp.linalg.norm(p, axis=-1)
    )
    assert float(cos.min()) > 0.9


def test_radiance_shapes_and_range():
    params = init_occupancy_field(jax.random.PRNGKey(0), CFG)
    p = jax.random.normal(jax.random.PRNGKey(1), (4, 7, 3))
    d = jax.random.normal(jax.random.PRNGKey(2), (4, 7, 3))
    rgb, alpha = radiance_and_alpha(params, p, d, CFG)
    assert rgb.shape == (4, 7, 3) and alpha.shape == (4, 7)
    assert float(rgb.min()) >= 0.0 and float(rgb.max()) <= 1.0
    assert float(alpha.min()) >= 0.0 and float(alpha.max()) <= 1.0


def test_skip_mlp_topology():
    key = jax.random.PRNGKey(0)
    layers = skip_mlp_init(key, 10, 3, 32, 4, (2,))
    assert len(layers) == 5
    assert layers[0]["w"].shape == (10, 32)
    assert layers[3]["w"].shape == (32 + 10, 32)  # post-skip layer
    assert layers[4]["w"].shape == (32, 3)
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 10))
    y = skip_mlp_apply(layers, x, (2,), "sigmoid")
    assert y.shape == (6, 3)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0
    # skip_at=-1 means no skip
    layers2 = skip_mlp_init(key, 10, 9, 64, 2, (-1,))
    assert len(layers2) == 3
    assert skip_mlp_apply(layers2, x, (-1,), "none").shape == (6, 9)


def test_sg_basis_analytic():
    """Perfect mirror alignment (h == n): D_i = exp(0) = 1, so specular =
    sum(w); brdf = albedo + specular (sgbasis.py:25-31)."""
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    v = jnp.asarray([[0.0, 0.0, 1.0]])
    l = jnp.asarray([[0.0, 0.0, 1.0]])
    albedo = jnp.asarray([[0.2, 0.3, 0.4]])
    w = jnp.full((1, 9), 0.1)
    brdf, spec = sg_basis(v, n, l, albedo, w)
    np.testing.assert_allclose(float(spec[0, 0]), 0.9, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(brdf[0]), [1.1, 1.2, 1.3], rtol=1e-5)
    # grazing half-vector: specular decays toward 0
    l2 = jnp.asarray([[1.0, 0.0, -0.99]]) / jnp.linalg.norm(
        jnp.asarray([[1.0, 0.0, -0.99]])
    )
    _, spec2 = sg_basis(v, n, l2, albedo, w)
    assert float(spec2[0, 0]) < 2e-3
    # specular_rgb path
    w3 = jnp.full((1, 27), 0.1)
    brdf3, spec3 = sg_basis(v, n, l, albedo, w3, specular_rgb=True)
    assert spec3.shape == (1, 3)
    np.testing.assert_allclose(np.asarray(spec3[0]), [0.9, 0.9, 0.9], rtol=1e-5)


def test_microfacet_lambert_floor():
    l = jnp.asarray([[0.0, 0.0, 1.0]])
    v = jnp.asarray([[0.0, 0.0, 1.0]])
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    albedo = jnp.asarray([[0.5, 0.5, 0.5]])
    rough = jnp.asarray([[0.3]])
    brdf = microfacet_brdf(l, v, n, albedo, rough)
    assert brdf.shape == (1, 3)
    # must exceed the pure-lambert floor and be finite
    assert bool(jnp.all(brdf >= 0.5 / np.pi - 1e-6))
    assert bool(jnp.all(jnp.isfinite(brdf)))
    lam = microfacet_brdf(l, v, n, albedo, rough, lambert_only=True)
    np.testing.assert_allclose(np.asarray(lam[0]), 0.5 / np.pi, rtol=1e-6)
