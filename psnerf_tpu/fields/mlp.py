"""Functional MLP building blocks (param pytrees + pure apply fns).

Weights use the JAX convention w: [din, dout] (y = x @ w + b) so megabatched
point queries hit the MXU directly. Weight-normalized layers store (v, g, b)
with w = g * v / ||v||_col, matching torch.nn.utils.weight_norm on Linear
(norm taken per output unit; stage1/model/network.py:64).

Static architecture info (widths, skip positions) lives OUTSIDE the param
pytrees, in config dataclasses — params hold arrays only, so they pass through
optax / jit / shard without stowaway leaves.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- plain linear

def linear_init(key: jax.Array, din: int, dout: int) -> dict:
    """Torch nn.Linear default init: kaiming_uniform(a=sqrt(5)) weights,
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) bias. Distribution-faithful so converted
    checkpoints and fresh runs share scale."""
    kw, kb = jax.random.split(key)
    bound_w = math.sqrt(1.0 / din)
    w = jax.random.uniform(kw, (din, dout), minval=-bound_w, maxval=bound_w)
    b = jax.random.uniform(kb, (dout,), minval=-bound_w, maxval=bound_w)
    return {"w": w, "b": b}


def linear_apply(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["w"] + p["b"]


# ---------------------------------------------------- weight-normalized linear

def wn_from_dense(w: jnp.ndarray, b: jnp.ndarray) -> dict:
    """Wrap a dense weight in weight-norm parametrization (g = ||w|| per
    output column, v = w); identical function value at init."""
    g = jnp.linalg.norm(w, axis=0)  # [dout]
    return {"v": w, "g": g, "b": b}


def wn_linear_init(key: jax.Array, din: int, dout: int) -> dict:
    p = linear_init(key, din, dout)
    return wn_from_dense(p["w"], p["b"])


def wn_weight(p: dict) -> jnp.ndarray:
    v = p["v"]
    norm = jnp.linalg.norm(v, axis=0, keepdims=True)  # [1, dout]
    return p["g"] * v / norm


def wn_linear_apply(p: dict, x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    """compute_dtype=jnp.bfloat16: run the matmul with bf16 operands and f32
    accumulation. On TPU the DEFAULT matmul precision already truncates f32
    operands to bf16 for the multiply, so this loses almost no precision —
    what it buys is bf16 *storage* of the activations between layers, halving
    the HBM traffic of megabatched forward/backward passes. The weight-norm
    reduction (||v||) and the bias add stay f32."""
    if compute_dtype is None:
        return x @ wn_weight(p) + p["b"]
    w = wn_weight(p).astype(compute_dtype)
    return jnp.dot(x.astype(compute_dtype), w,
                   preferred_element_type=jnp.float32) + p["b"]


# ------------------------------------------------------- stage2-style skip MLP

def skip_mlp_init(
    key: jax.Array, din: int, dout: int, width: int, depth: int,
    skip_at: Sequence[int] = (),
) -> list:
    """Init for the stage2 `Network`/`Normal_Network` topology
    (stage2/model/renderer.py:17-49): layers
      L0: din -> W;  L_i (1..depth-1): (W+din if (i-1) in skip_at else W) -> W;
      L_depth: W -> dout,
    where after activating layer li's output, if li in skip_at the input x is
    concatenated back on (so layer li+1 sees W+din). Returns a list of linear
    param dicts (arrays only)."""
    skips = [s for s in skip_at if s >= 0]
    dims_in = [din] + [width + din if i in skips else width for i in range(depth - 1)] + [width]
    dims_out = [width] * depth + [dout]
    keys = jax.random.split(key, depth + 1)
    return [linear_init(k, di, do) for k, di, do in zip(keys, dims_in, dims_out)]


def skip_mlp_apply(
    layers: list, x: jnp.ndarray, skip_at: Sequence[int] = (),
    final_activation: str = "none", compute_dtype=None,
) -> jnp.ndarray:
    """final_activation: 'none' (Normal_Network) | 'sigmoid' (Network).

    compute_dtype=jnp.bfloat16 runs the matmuls on the MXU's fast path
    (weights/activations bf16, f32 accumulation); the final activation is
    applied in float32.
    """
    skips = [s for s in skip_at if s >= 0]
    n = len(layers)
    if compute_dtype is None:
        y = x
        for li, lyr in enumerate(layers):
            y = linear_apply(lyr, y)
            if li != n - 1:
                y = jax.nn.relu(y)
            elif final_activation == "sigmoid":
                y = jax.nn.sigmoid(y)
            if li in skips:
                y = jnp.concatenate([y, x], axis=-1)
        return y

    xc = x.astype(compute_dtype)
    y = xc
    for li, lyr in enumerate(layers):
        w = lyr["w"].astype(compute_dtype)
        y = jnp.dot(y, w, preferred_element_type=jnp.float32) + lyr["b"]
        if li != n - 1:
            y = jax.nn.relu(y).astype(compute_dtype)
        elif final_activation == "sigmoid":
            y = jax.nn.sigmoid(y)
        if li in skips:
            y = jnp.concatenate([y, xc], axis=-1)
    return y.astype(jnp.float32)
