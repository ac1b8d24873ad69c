"""Fused per-(light, pixel) visibility-MLP kernel (Pallas, TPU).

The stage-2 eval bottleneck is the 8x256 visibility MLP evaluated for every
(light, pixel) pair: 512x512 x 96 lights x 9 linear layers. Under XLA each
layer boundary round-trips [L*N, 256] activations through HBM (~200 GB per
frame) — bandwidth-bound. This kernel keeps the whole trunk in VMEM:

  * grid over pixel tiles; ALL layer weights resident in VMEM (~1 MB bf16);
  * the light-independent parts of layer 0 and of the skip layer are computed
    ONCE per tile (A0 = emb_x @ W0x, B5 = emb_x @ W5x); each light adds only
    its precomputed row r_l (computed outside, [L, 256] — tiny);
  * a fori_loop over lights runs the trunk per light and accumulates the
    output column into a [T, 128] lane-per-light scratch, stored once.

HBM traffic per frame drops to inputs + outputs (~0.5 GB); compute runs in
bf16 on the MXU with f32 accumulation.

Matches psnerf_tpu.fields.mlp.skip_mlp_apply(layers, [PE(x), PE(l)],
skip_at=(4,), 'none') for the reference vis-net topology
(stage2/model/renderer.py:105-108: depth 8, width 256, skip at 4).
Forward-only (eval path); training uses the XLA path (grads + small L).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _pad_rows(w, rows):
    return jnp.pad(w, ((0, rows - w.shape[0]), (0, 0)))


def _vis_kernel(em, r0, r5, w0x, w5x, trunk_w, trunk_b, w8, b8, out,
                acc, *, n_lights, width, n_pre):
    """em [T, 128]; r0/r5 [Lpad, width]; w0x/w5x [128, width];
    trunk_w [6, width, width]; trunk_b [6, width]; w8 [8, width] (row 0 live);
    b8 [1, 1]; out [T, 128]; acc scratch [T, 128] f32."""
    f32 = jnp.float32
    a0 = jnp.dot(em[:], w0x[:], preferred_element_type=f32)  # [T, W]
    b5 = jnp.dot(em[:], w5x[:], preferred_element_type=f32)
    w8row = w8[0, :].astype(f32)  # [W]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)

    def light_body(l, _):
        y = jax.nn.relu(a0 + r0[l, :][None, :])
        # pre-skip trunk layers
        for i in range(n_pre):
            y = jax.nn.relu(
                jnp.dot(y.astype(jnp.bfloat16), trunk_w[i],
                        preferred_element_type=f32) + trunk_b[i][None, :]
            )
        # skip layer — trunk_w[n_pre] is W_h; B5 + r5 carry the skip input
        y = jax.nn.relu(
            jnp.dot(y.astype(jnp.bfloat16), trunk_w[n_pre],
                    preferred_element_type=f32)
            + b5 + r5[l, :][None, :]
        )
        # post-skip trunk layers
        for i in range(n_pre + 1, trunk_w.shape[0]):
            y = jax.nn.relu(
                jnp.dot(y.astype(jnp.bfloat16), trunk_w[i],
                        preferred_element_type=f32) + trunk_b[i][None, :]
            )
        v = jnp.sum(y * w8row[None, :], axis=1, keepdims=True) + b8[0, 0]
        acc[:] = jnp.where(col_ids == l, v, acc[:])
        return 0

    acc[:] = jnp.zeros_like(acc)
    jax.lax.fori_loop(0, n_lights, light_body, 0)
    out[:] = acc[:]


@partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_visibility(
    layers: list,
    point_emb: jnp.ndarray,   # [N, E] PE(x)
    light_emb: jnp.ndarray,   # [L, E] PE(l)
    tile: int = 1024,          # sweep on v5e: 1024 > 256 by ~7%
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns raw vis outputs [L, N] (pre-clip). Requires the reference
    topology: 9 linears, width<=? (width multiple of 128), skip after layer 4,
    E <= 128, L <= 128, N % tile == 0."""
    n, e = point_emb.shape
    l = light_emb.shape[0]
    width = layers[1]["w"].shape[0]
    assert n % tile == 0, f"N={n} not divisible by tile={tile}"
    assert l <= LANES and e <= LANES
    n_linears = len(layers)
    assert n_linears >= 4, "need at least input/skip/out structure"
    skip_idx = None
    for i, lyr in enumerate(layers):
        if i > 0 and lyr["w"].shape[0] > width:
            skip_idx = i
    assert skip_idx is not None, "fused kernel expects a skip layer"

    bf = jnp.bfloat16
    # layer 0 split: point rows / light rows
    w0 = layers[0]["w"]
    w0x = _pad_rows(w0[:e], LANES).astype(bf)
    r0 = (light_emb @ w0[e:]) + layers[0]["b"]  # [L, W] f32

    # skip layer split
    wskip = layers[skip_idx]["w"]  # [W + 2E, W]
    w5h = wskip[:width]
    w5x = _pad_rows(wskip[width:width + e], LANES).astype(bf)
    r5 = (light_emb @ wskip[width + e:]) + layers[skip_idx]["b"]

    # trunk: layers 1..skip-1, then W5h, then skip+1..n-2
    trunk = ([layers[i]["w"] for i in range(1, skip_idx)] + [w5h]
             + [layers[i]["w"] for i in range(skip_idx + 1, n_linears - 1)])
    trunk_b = ([layers[i]["b"] for i in range(1, skip_idx)]
               + [jnp.zeros((width,))]  # skip-layer bias folded into r5
               + [layers[i]["b"] for i in range(skip_idx + 1, n_linears - 1)])
    trunk_w = jnp.stack([w.astype(bf) for w in trunk])      # [nt, W, W]
    trunk_bs = jnp.stack(trunk_b)                            # [nt, W]

    w_out = layers[-1]["w"]  # [W, 1]
    w8 = jnp.zeros((8, width), bf).at[0].set(w_out[:, 0].astype(bf))
    b8 = jnp.asarray(layers[-1]["b"]).reshape(1, 1)

    l_pad = ((l + 7) // 8) * 8
    r0 = jnp.pad(r0, ((0, l_pad - l), (0, 0)))
    r5 = jnp.pad(r5, ((0, l_pad - l), (0, 0)))
    emb_pad = jnp.pad(point_emb, ((0, 0), (0, LANES - e))).astype(bf)

    grid = (n // tile,)
    kernel = partial(_vis_kernel, n_lights=l, width=width, n_pre=skip_idx - 1)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),      # em
            pl.BlockSpec((l_pad, width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),      # r0
            pl.BlockSpec((l_pad, width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),      # r5
            pl.BlockSpec((LANES, width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),      # w0x
            pl.BlockSpec((LANES, width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),      # w5x
            pl.BlockSpec((trunk_w.shape[0], width, width),
                         lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((trunk_bs.shape[0], width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),      # w8
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),      # b8
        ],
        out_specs=pl.BlockSpec((tile, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile, LANES), jnp.float32)],
        interpret=interpret,
    )(emb_pad, r0, r5, w0x, w5x, trunk_w, trunk_bs, w8, b8)
    return out[:, :l].T  # [L, N]
