"""Fused occupancy-logit kernel (Pallas, TPU) for the stage-1 geometry MLP.

Stage-1's hot loops (ray marching at 256-512 samples/ray, per-light
visibility at 128 samples, MISE mesh evaluation) are pure forward passes of
the 8x256 weight-normed geometry MLP (stage1/model/network.py:85-95) over
megabatches of points. Under XLA every layer boundary round-trips [M, 256]
activations through HBM; this kernel keeps the trunk in VMEM:

  * weight-norm folded to dense weights outside the kernel (tiny);
  * the skip concat `cat([x, pe])/sqrt(2)` before layer `skip` folds into a
    row-split of that layer's weights (x part, PE part) with 1/sqrt(2) baked
    in, so the kernel runs a uniform 256-wide trunk;
  * softplus(beta=100) on the VPU; bf16 MXU matmuls, f32 accumulation;
  * only the logit head (channel 0) is produced — exactly what marching,
    visibility, and MISE consume.

Forward-only (these call sites are no-grad in the reference too).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from psnerf_tpu.core.encoding import nerf_embed
from psnerf_tpu.fields.mlp import wn_weight
from psnerf_tpu.fields.occupancy import OccFieldConfig

LANES = 128


def _sp100(x):
    bx = 100.0 * x
    return jnp.where(bx > 20.0, x, jax.nn.softplus(bx) / 100.0)


def _occ_kernel(em, w0, b0, wskip_pe, trunk_w, trunk_b, w8, b8, out, *,
                skip_pos, width, rows_per_tile):
    f32 = jnp.float32
    y = _sp100(jnp.dot(em[:], w0[:], preferred_element_type=f32) + b0[0, :])
    b_pe = jnp.dot(em[:], wskip_pe[:], preferred_element_type=f32)
    for i in range(trunk_w.shape[0]):
        h = jnp.dot(y.astype(jnp.bfloat16), trunk_w[i],
                    preferred_element_type=f32) + trunk_b[i][None, :]
        if i == skip_pos:
            h = h + b_pe
        y = _sp100(h)
    logit = jnp.sum(y.astype(f32) * w8[0, :].astype(f32)[None, :],
                    axis=1) + b8[0, 0]
    out[:] = logit.reshape(rows_per_tile, LANES)


@partial(jax.jit, static_argnames=("cfg", "tile", "interpret"))
def fused_occ_logit(
    params: dict,
    p: jnp.ndarray,          # [N, 3]
    cfg: OccFieldConfig,
    tile: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Raw occupancy logits [N] (inside-negative, as occ_logit). Requires
    N % tile == 0 and tile % 128 == 0; width % 128 == 0; a single skip."""
    n = p.shape[0]
    # out block is (tile/128, 128): compiled Mosaic needs sublanes % 8 == 0
    assert n % tile == 0 and tile % (8 * LANES) == 0, \
        f"tile must be a multiple of {8 * LANES}"
    width = cfg.hidden_dim
    skip = cfg.skips[0]
    e = cfg.dim_embed

    emb = nerf_embed(p / cfg.rescale, cfg.octaves_pe)      # [N, E]
    emb = jnp.pad(emb, ((0, 0), (0, LANES - e))).astype(jnp.bfloat16)

    dense = [
        {"w": wn_weight(lyr), "b": lyr["b"]} for lyr in params["geo"]
    ]
    n_lin = len(dense)
    w0 = jnp.pad(dense[0]["w"], ((0, LANES - e), (0, 0))).astype(jnp.bfloat16)
    b0 = dense[0]["b"].reshape(1, -1)

    inv_s2 = 1.0 / math.sqrt(2.0)
    trunk, tb = [], []
    for li in range(1, n_lin - 1):
        w, b = dense[li]["w"], dense[li]["b"]
        din, dout = w.shape
        if li == skip:
            # input was cat([x_(width-E), pe_E]) / sqrt(2)
            w = w * inv_s2
            w_x = jnp.pad(w[: din - e], ((0, width - (din - e)), (0, 0)))
            w_pe = jnp.pad(w[din - e:], ((0, LANES - e), (0, 0)))
            wskip_pe = w_pe.astype(jnp.bfloat16)
            w = w_x
        w = jnp.pad(w, ((0, width - w.shape[0]), (0, width - w.shape[1])))
        b = jnp.pad(b, (0, width - b.shape[0]))
        trunk.append(w.astype(jnp.bfloat16))
        tb.append(b)
    trunk_w = jnp.stack(trunk)
    trunk_b = jnp.stack(tb)

    w_out = dense[-1]["w"]  # [din, feat+1]; logit head = column 0
    w8 = jnp.zeros((8, width), jnp.bfloat16)
    w8 = w8.at[0, : w_out.shape[0]].set(w_out[:, 0].astype(jnp.bfloat16))
    b8 = dense[-1]["b"][0].reshape(1, 1)

    rows_per_tile = tile // LANES
    kernel = partial(_occ_kernel, skip_pos=skip - 1, width=width,
                     rows_per_tile=rows_per_tile)
    out = pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((trunk_w.shape[0], width, width),
                         lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((trunk_b.shape[0], width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((rows_per_tile, LANES),
                               lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n // LANES, LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(emb, w0, b0, wskip_pe, trunk_w, trunk_b, w8, b8)
    return out.reshape(n)


def make_fused_occ_fn(params: dict, cfg: OccFieldConfig, tile: int = 1024,
                      interpret: bool = False, mesh=None, output="alpha"):
    """occupancy closure p[N,3] -> [N] (pads N to the tile), for marching /
    visibility / mesh evaluation call sites. output="alpha" gives the
    occupancy probability sigmoid(-10 * logit); output="inside_logit" gives
    the inside-POSITIVE raw logit (what extract_mesh thresholds — the
    reference's model(p, return_logits=True), extracting.py:149).

    The kernel is forward-only and all its call sites are no-grad regions
    (the reference wraps them in torch.no_grad); inputs are stop_gradient'd
    so autodiff never attempts to linearize through the pallas_call even when
    `params` are traced inside a surrounding value_and_grad.

    mesh: optional jax.sharding.Mesh with a 'rays' axis. A pallas_call does
    not auto-partition under GSPMD, so under a mesh the kernel runs inside a
    shard_map over the point axis — each device marches its point shard with
    the same VMEM-resident program (points are embarrassingly parallel; no
    collectives)."""
    assert output in ("alpha", "inside_logit")

    def _run(params, p):
        # stop_gradient inside: the kernel is forward-only and its call
        # sites are no-grad regions; keeping it here lets the WHOLE chunk
        # path be one jitted dispatch from host loops (MISE/marching) —
        # the round-3 version ran the param tree_map + pad concat eagerly,
        # ~40 tunnel round trips per chunk (VERDICT r3 #1)
        sg_params = jax.tree_util.tree_map(jax.lax.stop_gradient, params)
        p = jax.lax.stop_gradient(p)
        logit = fused_occ_logit(sg_params, p, cfg, tile=tile,
                                interpret=interpret)
        if output == "inside_logit":
            return -logit
        return jax.nn.sigmoid(-10.0 * logit)

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        from psnerf_tpu.parallel.mesh import RAY_AXIS

        n_dev = mesh.shape[RAY_AXIS]
        run = jax.jit(jax.shard_map(
            _run, mesh=mesh, in_specs=(P(), P(RAY_AXIS)),
            out_specs=P(RAY_AXIS), check_vma=False,
        ))
    else:
        run = jax.jit(_run)

    def occ_fn(p):
        import numpy as np

        n = p.shape[0]
        quantum = tile * (n_dev if mesh is not None else 1)
        pad = (-n) % quantum
        if pad:
            # pad host inputs host-side (one device transfer at the jit
            # boundary); traced/device inputs pad in-graph
            xp = np if isinstance(p, np.ndarray) else jnp
            p = xp.concatenate([p, xp.zeros((pad, 3), p.dtype)])
        out = run(params, p)
        return out if pad == 0 else out[:n]

    return occ_fn
