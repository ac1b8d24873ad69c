"""Positional encodings (both reference flavors), as pure jnp functions.

Two encodings exist in the reference with different layouts:
  * stage1 `PositionalEncoding` (stage1/model/network.py:141-150):
      out = [p, sin(2^0 p), cos(2^0 p), sin(2^1 p), cos(2^1 p), ...]
    i.e. input first, then per-octave (sin, cos) pairs each of width d.
  * stage2 NeRF-style embedder (stage2/model/embedder.py:6-54) with
    include_input=True, log_sampling, freqs 2^0..2^(L-1):
      out = [p, sin(2^0 p), cos(2^0 p), ...]
    Identical layout for the default arguments, so one implementation serves
    both; `nerf_embed` is the canonical entry point.

Shapes: input [..., d] -> output [..., d * (1 + 2L)].
"""

from __future__ import annotations

import jax.numpy as jnp


def nerf_embed(p: jnp.ndarray, n_freqs: int) -> jnp.ndarray:
    """NeRF positional encoding: [p, sin(2^i p), cos(2^i p) for i in 0..L-1]."""
    if n_freqs <= 0:
        return p
    # [..., d] -> [..., 1, d] * [L, 1] -> [..., L, d]
    freqs = (2.0 ** jnp.arange(n_freqs, dtype=p.dtype))  # [L]
    scaled = p[..., None, :] * freqs[:, None]  # [..., L, d]
    sin = jnp.sin(scaled)
    cos = jnp.cos(scaled)
    # interleave per octave: [..., L, 2, d] -> [..., L*2*d]
    enc = jnp.stack([sin, cos], axis=-2).reshape(*p.shape[:-1], -1)
    return jnp.concatenate([p, enc], axis=-1)


# stage1 alias — identical math/layout (stage1/model/network.py:141-150)
positional_encoding = nerf_embed


def nerf_embed_dim(d: int, n_freqs: int) -> int:
    return d * (1 + 2 * n_freqs)
