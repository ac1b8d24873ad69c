"""BRDF models: spherical-Gaussian basis + GGX microfacet.

Pure functions over broadcastable arrays; the light axis is handled by vmap in
the shading layer, not here.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

# 9 fixed SG lobe sharpness values lambda_i = e^i, i in 2..10 (non-trainable;
# stage2/model/sgbasis.py:12). Kept as numpy so importing never touches a
# device backend.
import numpy as _np

SG_LOBES = _np.asarray([math.exp(i) for i in range(2, 11)], dtype=_np.float32)


def _normalize(v, eps=1e-12):
    # torch.F.normalize semantics: v / max(||v||, eps)
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, eps)


def sg_basis(
    v: jnp.ndarray,
    n: jnp.ndarray,
    l: jnp.ndarray,
    albedo: jnp.ndarray,
    weights: jnp.ndarray,
    specular_rgb: bool = False,
    nbasis: int = 9,
):
    """Spherical-Gaussian specular basis BRDF (stage2/model/sgbasis.py:16-32).

    v/n/l: [..., 3] view/normal/light (unit) dirs; albedo: [..., 3];
    weights: [..., nbasis] (or [..., 3*nbasis] when specular_rgb).
    Returns (brdf [..., 3], specular [..., 1 or 3]).
    specular = sum_i w_i * exp(lambda_i * ((h.n) - 1)), clamped >= 0.
    """
    h = _normalize(l + v)
    hn = jnp.sum(h * n, axis=-1, keepdims=True)  # [..., 1]
    d = jnp.exp(SG_LOBES[:nbasis] * (hn - 1.0))  # [..., nbasis]
    if specular_rgb:
        w = weights.reshape(*weights.shape[:-1], 3, nbasis)
        specular = jnp.maximum(jnp.sum(w * d[..., None, :], axis=-1), 0.0)  # [..., 3]
    else:
        specular = jnp.maximum(
            jnp.sum(weights * d, axis=-1, keepdims=True), 0.0
        )  # [..., 1]
    brdf = albedo + jnp.broadcast_to(specular, albedo.shape)
    return brdf, specular


def _divide_no_nan(x, y):
    """x / (y + 1e-6) with inf/nan -> 0 (stage2/model/microfacet.py:20-24)."""
    a = x / (y + 1e-6)
    return jnp.where(jnp.isfinite(a), a, 0.0)


def microfacet_brdf(
    l: jnp.ndarray,
    v: jnp.ndarray,
    n: jnp.ndarray,
    albedo: jnp.ndarray,
    rough: jnp.ndarray,
    f0: float = 0.05,
    lambert_only: bool = False,
):
    """GGX microfacet BRDF (stage2/model/microfacet.py:26-114), single-light
    layout: l/v/n [..., 3], albedo [..., 3], rough [..., 1] -> brdf [..., 3].
    (The reference's NxL layout is recovered by vmapping over the light axis.)
    """
    l = _normalize(l, 1e-6)
    v = _normalize(v, 1e-6)
    n = _normalize(n, 1e-6)
    h = _normalize(l + v, 1e-6)

    # Fresnel (Schlick)
    cos_lh = jnp.sum(l * h, axis=-1)
    f = f0 + (1.0 - f0) * (1.0 - cos_lh) ** 5

    alpha = rough[..., 0] ** 2

    # Distribution (GGX)
    cos_hn = jnp.sum(h * n, axis=-1)
    chi_d = jnp.where(cos_hn > 0, 1.0, 0.0)
    cos_hn_sq = cos_hn**2
    tan_hn_sq = _divide_no_nan(1.0 - cos_hn_sq, cos_hn_sq)
    d = _divide_no_nan(
        alpha**2 * chi_d, math.pi * cos_hn_sq**2 * (alpha**2 + tan_hn_sq) ** 2
    )

    # Geometry (GGX, view term only — as in the reference _get_g)
    cos_vn = jnp.sum(n * v, axis=-1)
    cos_vh = jnp.sum(h * v, axis=-1)
    chi_g = jnp.where(_divide_no_nan(cos_vh, cos_vn) > 0, 1.0, 0.0)
    cos_vn_sq = jnp.clip(cos_vn**2, 0.0, 1.0)
    tan_vn_sq = jnp.maximum(_divide_no_nan(1.0 - cos_vn_sq, cos_vn_sq), 0.0)
    g = _divide_no_nan(chi_g * 2.0, 1.0 + jnp.sqrt(1.0 + alpha**2 * tan_vn_sq))

    l_dot_n = jnp.sum(l * n, axis=-1)
    v_dot_n = jnp.sum(v * n, axis=-1)
    denom = 4.0 * jnp.abs(l_dot_n) * jnp.abs(v_dot_n)
    glossy = _divide_no_nan(f * g * d, denom)[..., None]  # [..., 1]

    diffuse = albedo / math.pi
    if lambert_only:
        return diffuse
    return glossy + diffuse
