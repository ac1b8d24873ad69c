"""Alpha compositing (UNISURF-style transmittance weights).

Reference: stage1/model/rendering.py:196-197 and :405-406 —
  weights_i = alpha_i * prod_{j<i} (1 - alpha_j + eps)
with a leading implicit 1 in the cumulative product.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-6


def alpha_composite(alpha: jnp.ndarray) -> jnp.ndarray:
    """alpha: [..., S] in [0,1] -> compositing weights [..., S]."""
    trans = jnp.cumprod(1.0 - alpha + EPS, axis=-1)
    trans = jnp.concatenate(
        [jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1
    )
    return alpha * trans
