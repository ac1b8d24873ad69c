"""Depth sampling helpers (stratified noise, interval linspace).

Reference semantics: stage1/model/rendering.py:131-164 — a uniform linspace of
depths per ray, optionally jittered by stratified noise where each sample moves
uniformly within the half-open cell between its neighbors' midpoints.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linspace_between(lo: jnp.ndarray, hi: jnp.ndarray, steps: int) -> jnp.ndarray:
    """Per-ray linspace: lo/hi [..., ] -> [..., steps]."""
    t = jnp.linspace(0.0, 1.0, steps, dtype=jnp.result_type(lo, hi))
    return lo[..., None] * (1.0 - t) + hi[..., None] * t


def stratified_noise(d: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Jitter sorted depth samples within mid-point cells.

    d: [..., S] sorted depths. Matches stage1/model/rendering.py:135-140:
      di_mid = .5 (d[1:] + d[:-1]); high = [mid, d[-1]]; low = [d[0], mid];
      d' = low + (high - low) * U(0,1).
    """
    mid = 0.5 * (d[..., 1:] + d[..., :-1])
    high = jnp.concatenate([mid, d[..., -1:]], axis=-1)
    low = jnp.concatenate([d[..., :1], mid], axis=-1)
    noise = jax.random.uniform(key, d.shape, dtype=d.dtype)
    return low + (high - low) * noise
