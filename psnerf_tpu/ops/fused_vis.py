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

from psnerf_tpu.fields.brdf import SG_LOBES

LANES = 128


def _pad_rows(w, rows):
    return jnp.pad(w, ((0, rows - w.shape[0]), (0, 0)))


def _accumulate_vis(em, r0, r5, w0x, w5x, trunk_w, trunk_b, w8, b8, acc,
                    *, n_lights, n_pre, pair=1):
    """Run the visibility trunk for every light, filling the raw (pre-clip)
    MLP output into acc [T, 128] with one light per lane.

    pair: process this many lights per loop iteration by stacking their
    (independent) activations along the row axis — one [pair*T, W] matmul
    chain instead of `pair` dependent [T, W] chains, hiding MXU pipeline
    latency between the trunk's serially-dependent layers."""
    f32 = jnp.float32
    t = em.shape[0]
    a0 = jnp.dot(em[:], w0x[:], preferred_element_type=f32)  # [T, W]
    b5 = jnp.dot(em[:], w5x[:], preferred_element_type=f32)
    w8row = w8[0, :].astype(f32)  # [W]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)

    if pair > 1:
        a0 = jnp.concatenate([a0] * pair, axis=0)            # [p*T, W]
        b5 = jnp.concatenate([b5] * pair, axis=0)
        block = jax.lax.broadcasted_iota(
            jnp.int32, (pair * t, 1), 0) // t                # row -> light slot

    def rows_for(r, l):
        """Per-light row(s) broadcast over the stacked activation rows."""
        if pair == 1:
            return r[l, :][None, :]
        out = r[l, :][None, :]
        for k in range(1, pair):
            out = jnp.where(block == k, r[l + k, :][None, :], out)
        return out

    def light_body(j, _):
        l = j * pair
        y = jax.nn.relu(a0 + rows_for(r0, l))
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
            + b5 + rows_for(r5, l)
        )
        # post-skip trunk layers
        for i in range(n_pre + 1, trunk_w.shape[0]):
            y = jax.nn.relu(
                jnp.dot(y.astype(jnp.bfloat16), trunk_w[i],
                        preferred_element_type=f32) + trunk_b[i][None, :]
            )
        v = jnp.sum(y * w8row[None, :], axis=1, keepdims=True) + b8[0, 0]
        if pair == 1:
            acc[:] = jnp.where(col_ids == l, v, acc[:])
        else:
            a = acc[:]
            for k in range(pair):
                a = jnp.where(col_ids == l + k, v[k * t:(k + 1) * t], a)
            acc[:] = a
        return 0

    acc[:] = jnp.zeros_like(acc)
    n_iter = (n_lights + pair - 1) // pair
    jax.lax.fori_loop(0, n_iter, light_body, 0)


def _vis_kernel(em, r0, r5, w0x, w5x, trunk_w, trunk_b, w8, b8, out,
                acc, *, n_lights, width, n_pre, pair=1):
    """em [T, 128]; r0/r5 [Lpad, width]; w0x/w5x [128, width];
    trunk_w [6, width, width]; trunk_b [6, width]; w8 [8, width] (row 0 live);
    b8 [1, 1]; out [T, 128]; acc scratch [T, 128] f32."""
    _accumulate_vis(em, r0, r5, w0x, w5x, trunk_w, trunk_b, w8, b8, acc,
                    n_lights=n_lights, n_pre=n_pre, pair=pair)
    out[:] = acc[:]


def _prep_vis_operands(layers, point_emb, light_emb, tile):
    """Shared operand packing for the fused vis kernels: fold the skip concat
    into row-splits of layer 0 / the skip layer, precompute the per-light
    rows, pad everything to lane multiples. Returns (operands, dims)."""
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
    ops = dict(emb_pad=emb_pad, r0=r0, r5=r5, w0x=w0x, w5x=w5x,
               trunk_w=trunk_w, trunk_bs=trunk_bs, w8=w8, b8=b8)
    dims = dict(n=n, l=l, l_pad=l_pad, width=width, skip_idx=skip_idx,
                n_trunk=trunk_w.shape[0])
    return ops, dims


def _vis_in_specs(dims, tile):
    l_pad, width = dims["l_pad"], dims["width"]
    return [
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
        pl.BlockSpec((dims["n_trunk"], width, width),
                     lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((dims["n_trunk"], width), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, width), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),      # w8
        pl.BlockSpec((1, 1), lambda i: (0, 0),
                     memory_space=pltpu.SMEM),      # b8
    ]


@partial(jax.jit, static_argnames=("tile", "interpret", "light_pairs"))
def fused_visibility(
    layers: list,
    point_emb: jnp.ndarray,   # [N, E] PE(x)
    light_emb: jnp.ndarray,   # [L, E] PE(l)
    tile: int = 1024,          # sweep on v5e: 1024 > 256 by ~7%
    interpret: bool = False,
    light_pairs: int = 4,      # lights per loop step (hides MXU stalls, ~7%)
) -> jnp.ndarray:
    """Returns raw vis outputs [L, N] (pre-clip). Requires the reference
    topology: 9 linears, width<=? (width multiple of 128), skip after layer 4,
    E <= 128, L <= 128, N % tile == 0."""
    ops, dims = _prep_vis_operands(layers, point_emb, light_emb, tile)
    n, l, l_pad, width, skip_idx = (
        dims["n"], dims["l"], dims["l_pad"], dims["width"], dims["skip_idx"])
    emb_pad, r0, r5, w0x, w5x, trunk_w, trunk_bs, w8, b8 = (
        ops["emb_pad"], ops["r0"], ops["r5"], ops["w0x"], ops["w5x"],
        ops["trunk_w"], ops["trunk_bs"], ops["w8"], ops["b8"])

    grid = (n // tile,)
    kernel = partial(_vis_kernel, n_lights=l, width=width,
                     n_pre=skip_idx - 1, pair=light_pairs)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=_vis_in_specs(dims, tile),
        out_specs=pl.BlockSpec((tile, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile, LANES), jnp.float32)],
        interpret=interpret,
    )(emb_pad, r0, r5, w0x, w5x, trunk_w, trunk_bs, w8, b8)
    return out[:, :l].T  # [L, N]


def _vis_shade_kernel(em, r0, r5, w0x, w5x, trunk_w, trunk_b, w8, b8,
                      nv, lmat, geom, lint, out, acc, *,
                      n_lights, width, n_pre, nbasis, specular_rgb,
                      sum_lights, lobes, pair=1):
    """Visibility trunk + SG shading, all in VMEM (one light per lane).

    Extra operands vs _vis_kernel:
      nv   [T, 128] f32 — cols 0-2 normal, cols 3-5 v (= pts2c)
      lmat [128, 2*128] f32 — cols :128 rows 0-2 = light dirs (for n.l),
                              cols 128: rows 3-5 = light dirs (for v.l)
      geom [T, 128] f32 — col 0 v.n, col 1 mask, cols 2-4 albedo,
                          cols 8.. SG weights (nbasis or 3*nbasis)
      lint [8, 128] f32 — rows 0-2 per-channel light intensity per lane
                          (zero on padded lanes)
      out: [3, T, 128] rgb (light per lane), or [T, 128] light-sum rgb in
           cols 0-2 when sum_lights.
    """
    f32 = jnp.float32
    _accumulate_vis(em, r0, r5, w0x, w5x, trunk_w, trunk_b, w8, b8, acc,
                    n_lights=n_lights, n_pre=n_pre, pair=pair)
    vis = jnp.clip(acc[:], 0.0, 1.0)                       # [T, Lp]

    cl = jnp.dot(nv[:], lmat[:], preferred_element_type=f32)  # [T, 2*Lp]
    cos = cl[:, :LANES]                                    # n . l  [T, Lp]
    lv = cl[:, LANES:]                                     # v . l  [T, Lp]
    vn = geom[:, 0][:, None]
    mask = geom[:, 1][:, None] > 0.5
    # h.n with torch.F.normalize semantics: (l+v).n / max(||l+v||, eps).
    # ||l+v||^2 = 2 + 2 l.v for unit l, v — clamp at 0: f32 rounding pushes
    # l.v slightly below -1 for near-antipodal lights and sqrt(neg) = NaN
    # (the XLA path's sum-of-squares norm can't go negative). Likewise clamp
    # hn <= 1 (true for unit vectors) so exp(lobe*(hn-1)) can't overflow when
    # the normalization degenerates at l ~ -v.
    hn = (cos + vn) / jnp.maximum(
        jnp.sqrt(jnp.maximum(2.0 + 2.0 * lv, 0.0)), 1e-12)
    em1 = jnp.minimum(hn - 1.0, 0.0)
    ds = [jnp.exp(lobes[i] * em1) for i in range(nbasis)]  # shared lobes

    def spec_channel(c):
        s = jnp.zeros_like(hn)
        for i in range(nbasis):
            col = (c * nbasis + i + 8) if specular_rgb else (i + 8)
            s = s + geom[:, col][:, None] * ds[i]
        return jnp.maximum(s, 0.0)

    specs = ([spec_channel(c) for c in range(3)] if specular_rgb
             else [spec_channel(0)] * 3)
    cv = cos * vis
    # non-surface fill is 1.0 on REAL light lanes only (padded lanes must
    # contribute 0 to the light-axis sum, matching a [L, N, 3] ones-fill)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, hn.shape, 1)
    fill = (lane_ids < n_lights).astype(f32)
    sums = []
    for c in range(3):
        albedo_c = geom[:, 2 + c][:, None]
        rgb_c = jnp.clip((albedo_c + specs[c]) * lint[c, :][None, :] * cv,
                         0.0, 1.0)
        rgb_c = jnp.where(mask, rgb_c, fill)
        if sum_lights:
            sums.append(jnp.sum(rgb_c, axis=1))            # [T]
        else:
            out[c, :, :] = rgb_c
    if sum_lights:
        col_ids = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
        out[:] = (sums[0][:, None] * (col_ids == 0)
                  + sums[1][:, None] * (col_ids == 1)
                  + sums[2][:, None] * (col_ids == 2))


@partial(jax.jit, static_argnames=("nbasis", "specular_rgb", "sum_lights",
                                   "tile", "interpret", "layout",
                                   "light_pairs"))
def fused_vis_shade(
    layers: list,
    point_emb: jnp.ndarray,   # [N, E] PE(x)
    light_emb: jnp.ndarray,   # [L, E] PE(l)
    normal: jnp.ndarray,      # [N, 3] unit shading normals
    view: jnp.ndarray,        # [N, 3] unit pts2c (= -ray_dirs)
    albedo: jnp.ndarray,      # [N, 3]
    weights: jnp.ndarray,     # [N, nbasis] or [N, 3*nbasis]
    mask: jnp.ndarray,        # [N] bool surface mask
    light_dirs: jnp.ndarray,  # [L, 3] unit light dirs
    light_ints: jnp.ndarray,  # [L] or [L, 3]
    nbasis: int = 9,
    specular_rgb: bool = True,
    sum_lights: bool = False,
    tile: int = 1024,
    interpret: bool = False,
    layout: str = "lnc",
    light_pairs: int = 4,
) -> jnp.ndarray:
    """SG-shaded multi-light rgb in ONE kernel family: the visibility trunk
    stays in VMEM and the shading epilogue (SGBasis specular + cosine +
    visibility clip + intensity + mask fill, renderer.py:187-204 +
    sgbasis.py:16-32) runs on the VPU before anything touches HBM.

    Returns rgb [L, N, 3] (layout="lnc"), the kernel-natural channel-major
    [3, N, L] (layout="cnl" — skips a ~36 ms/frame minor-dim-3 transpose on
    v5e; hosts assembling per-light images should prefer it), or the
    light-axis sum [N, 3] when sum_lights (envmap relighting integrates over
    lights anyway — the [L, N, 3] megatensor then never exists).
    """
    ops, dims = _prep_vis_operands(layers, point_emb, light_emb, tile)
    n, l, width, skip_idx = (
        dims["n"], dims["l"], dims["width"], dims["skip_idx"])
    nw = nbasis * 3 if specular_rgb else nbasis
    assert weights.shape[-1] == nw, (weights.shape, nw)
    assert 8 + nw <= LANES

    f32 = jnp.float32
    nv = jnp.concatenate(
        [normal.astype(f32), view.astype(f32)], axis=-1)   # [N, 6]
    nv = jnp.pad(nv, ((0, 0), (0, LANES - 6)))
    ld = light_dirs.astype(f32).T                          # [3, L]
    ld = jnp.pad(ld, ((0, 0), (0, LANES - l)))
    lmat = jnp.zeros((LANES, 2 * LANES), f32)
    lmat = lmat.at[0:3, :LANES].set(ld)
    lmat = lmat.at[3:6, LANES:].set(ld)

    vn = jnp.sum(normal * view, axis=-1, keepdims=True).astype(f32)
    geom = jnp.concatenate(
        [vn, mask.astype(f32)[:, None], albedo.astype(f32),
         jnp.zeros((n, 3), f32), weights.astype(f32)], axis=-1)
    geom = jnp.pad(geom, ((0, 0), (0, LANES - geom.shape[-1])))

    li = jnp.asarray(light_ints, f32)
    if li.ndim == 0:
        li = jnp.full((l,), li)
    li3 = jnp.broadcast_to(li[:, None] if li.ndim == 1 else li, (l, 3))
    lint = jnp.zeros((8, LANES), f32).at[0:3, :l].set(li3.T)

    if sum_lights:
        out_shape = jax.ShapeDtypeStruct((n, LANES), f32)
        out_spec = pl.BlockSpec((tile, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((3, n, LANES), f32)
        out_spec = pl.BlockSpec((3, tile, LANES), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)

    kernel = partial(
        _vis_shade_kernel, n_lights=l, width=width, n_pre=skip_idx - 1,
        nbasis=nbasis, specular_rgb=specular_rgb, sum_lights=sum_lights,
        lobes=tuple(float(x) for x in SG_LOBES[:nbasis]), pair=light_pairs,
    )
    extra_specs = [
        pl.BlockSpec((tile, LANES), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),             # nv
        pl.BlockSpec((LANES, 2 * LANES), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),             # lmat
        pl.BlockSpec((tile, LANES), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),             # geom
        pl.BlockSpec((8, LANES), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),             # lint
    ]
    out = pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=_vis_in_specs(dims, tile) + extra_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((tile, LANES), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(ops["emb_pad"], ops["r0"], ops["r5"], ops["w0x"], ops["w5x"],
      ops["trunk_w"], ops["trunk_bs"], ops["w8"], ops["b8"],
      nv, lmat, geom, lint)
    if sum_lights:
        return out[:, :3]                                  # [N, 3]
    if layout == "cnl":
        return out[:, :, :l]                               # [3, N, L]
    return jnp.moveaxis(out[:, :, :l], (0, 1, 2), (2, 1, 0))  # [L, N, 3]
