"""Fused radiance+alpha kernel with a custom (second-order) backward.

The stage-1 train step is dominated by `radiance_and_alpha` over the
integration megabatch (2048 rays x 96 samples at the bear config): geometry
trunk forward, per-point analytic normals (a reverse sweep of the logit wrt
the embedding; reference network.py:108-120 with create_graph=True), and the
appearance MLP consuming those normals. Under XLA autodiff this is ~2 TFLOP
but ~50 GB of HBM traffic per step (every layer boundary of the forward, the
normal sweep, and their backwards round-trips [N, 256] activations through
HBM) — the step is memory-bound.

This module runs the WHOLE thing — forward, normal sweep, appearance, and
the full backward including the Hessian-vector terms the normal path
injects — as two Pallas kernels that keep all activations in VMEM:

  * forward kernel: trunk -> feat/logit, reverse sweep -> g_e, normals
    n = (de/dx)^T g_e, appearance -> pre-tanh rgb. One [T,128] output per
    tile (cols 0-2 rgb_lin, col 3 logit).
  * backward kernel: recomputes the forward in VMEM (residuals = inputs
    only), then ONE doubled reverse sweep through the trunk carrying
    (h_bar, t_bar): h_bar accumulates the first-order cotangents
    (rgb -> appearance -> feat/logit) and t_bar the tangent cotangents of
    the normal path, mixing through softplus'' exactly as torch's
    create_graph=True double backprop does. Weight gradients accumulate in
    revisited VMEM output blocks across the sequential TPU grid.

Weight-norm is folded OUTSIDE the kernel by differentiable packing
(wn_weight + pads/splits), so d(dense)/d(v,g,b) chains automatically; the
final geo layer is split into an aligned feat matrix [W,256] and a separate
logit row so no unaligned lane slicing is ever needed. Gradients w.r.t.
points/ray dirs are NOT produced (the call sites stop-gradient them: sample
positions come from the no-grad marcher).

Softplus(beta=100) derivatives: sp' = sigmoid(100x) (the linear cutover at
100x>20 has sigma(20) ~ 1-2e-9, so no branch), sp'' = 100 s (1-s).
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
APP_OUT = LANES          # rgb (3) padded to one lane group

PACK_ORDER = ["w0", "b0", "wskip_pe", "trunk_w", "trunk_b", "w8f", "b8f",
              "w8l", "b8l", "wp", "wv", "wn", "wf", "ba0", "wa", "bab",
              "wa4", "ba4"]


def _sp(x):
    bx = 100.0 * x
    return jnp.where(bx > 20.0, x, jax.nn.softplus(bx) / 100.0)


def supports(cfg: OccFieldConfig) -> bool:
    """True iff this architecture fits the kernel's layout assumptions
    (the reference bear config does)."""
    return (cfg.hidden_dim % LANES == 0
            and cfg.feat_size == cfg.hidden_dim
            and len(cfg.skips) == 1
            and 1 <= cfg.skips[0] <= cfg.num_layers - 1
            and cfg.dim_embed <= LANES
            and 3 + 2 * 3 * cfg.octaves_pe_views <= LANES)


def _pack(params: dict, cfg: OccFieldConfig, wdt) -> dict:
    """Differentiable fold of the weight-normed params into padded dense
    arrays (layout mirrors ops/fused_occ.py). wdt: matmul operand dtype."""
    width = cfg.hidden_dim
    e = cfg.dim_embed
    skip = cfg.skips[0]
    dense = [{"w": wn_weight(l), "b": l["b"]} for l in params["geo"]]
    n_lin = len(dense)

    w0 = jnp.pad(dense[0]["w"], ((0, LANES - e), (0, 0))).astype(wdt)
    b0 = dense[0]["b"].reshape(1, -1)

    inv_s2 = 1.0 / math.sqrt(2.0)
    trunk, tb = [], []
    wskip_pe = None
    for li in range(1, n_lin - 1):
        w, b = dense[li]["w"], dense[li]["b"]
        din = w.shape[0]
        if li == skip:
            w = w * inv_s2
            w_x = jnp.pad(w[: din - e], ((0, width - (din - e)), (0, 0)))
            wskip_pe = jnp.pad(w[din - e:], ((0, LANES - e), (0, 0))).astype(wdt)
            w = w_x
        w = jnp.pad(w, ((0, width - w.shape[0]), (0, width - w.shape[1])))
        b = jnp.pad(b, (0, width - b.shape[0]))
        trunk.append(w.astype(wdt))
        tb.append(b)

    w_last = dense[-1]["w"]                 # [width, 1 + feat]
    w8f = w_last[:, 1:].astype(wdt)         # [width, feat(=width)]
    b8f = dense[-1]["b"][1:].reshape(1, -1)
    w8l = jnp.zeros((8, width), jnp.float32).at[0].set(w_last[:, 0])
    b8l = dense[-1]["b"][0].reshape(1, 1)

    # appearance: input [p(3), vpe(Ev), n(3), feat(width)]
    adense = [{"w": wn_weight(l), "b": l["b"]} for l in params["app"]]
    ev = 3 + 2 * 3 * cfg.octaves_pe_views
    wa0 = adense[0]["w"]
    wp = jnp.pad(wa0[0:3], ((0, 5), (0, 0)))                     # [8, W]
    wv = jnp.pad(wa0[3:3 + ev], ((0, LANES - ev), (0, 0))).astype(wdt)
    wn_ = jnp.pad(wa0[3 + ev:6 + ev], ((0, 5), (0, 0)))           # [8, W]
    wf = wa0[6 + ev:].astype(wdt)                                 # [W, W]
    ba0 = adense[0]["b"].reshape(1, -1)
    wa = jnp.stack([a["w"] for a in adense[1:-1]]).astype(wdt)    # [3, W, W]
    bab = jnp.stack([a["b"] for a in adense[1:-1]])               # [3, W]
    wa4 = jnp.pad(adense[-1]["w"],
                  ((0, 0), (0, APP_OUT - adense[-1]["w"].shape[1]))).astype(wdt)
    ba4 = jnp.pad(adense[-1]["b"], (0, APP_OUT - adense[-1]["b"].shape[0]))
    return {
        "w0": w0, "b0": b0, "wskip_pe": wskip_pe,
        "trunk_w": jnp.stack(trunk), "trunk_b": jnp.stack(tb),
        "w8f": w8f, "b8f": b8f, "w8l": w8l, "b8l": b8l,
        "wp": wp, "wv": wv, "wn": wn_, "wf": wf, "ba0": ba0,
        "wa": wa, "bab": bab, "wa4": wa4, "ba4": ba4.reshape(1, -1),
    }


def _forward_core(r, em, vpe, p3, dpe3, *, skip_pos, wdt):
    """Shared primal computation for one tile (plain VMEM values)."""
    f32 = jnp.float32
    cast = lambda x: x.astype(wdt)
    dot = lambda x, w: jnp.dot(cast(x), w, preferred_element_type=f32)

    z, a = [], []
    z0 = dot(em, r["w0"]) + r["b0"][0][None, :]
    z.append(z0)
    a.append(_sp(z0))
    b_pe = dot(em, r["wskip_pe"])
    n_trunk = r["trunk_w"].shape[0]
    for i in range(n_trunk):
        zi = dot(a[-1], r["trunk_w"][i]) + r["trunk_b"][i][None, :]
        if i == skip_pos:
            zi = zi + b_pe
        z.append(zi)
        a.append(_sp(zi))
    feat = dot(a[-1], r["w8f"]) + r["b8f"][0][None, :]       # [T, W]
    logit = jnp.sum(a[-1] * r["w8l"][0][None, :], axis=1) + r["b8l"]

    # reverse sweep: g_e = d logit / d em
    sprime = [jax.nn.sigmoid(100.0 * zi) for zi in z]
    g = jnp.broadcast_to(r["w8l"][0].astype(f32)[None, :], a[-1].shape)
    g_z = [None] * len(z)
    for i in range(n_trunk, 0, -1):
        gz = g * sprime[i]
        g_z[i] = gz
        g = jnp.dot(cast(gz), r["trunk_w"][i - 1].T,
                    preferred_element_type=f32)
    g_z[0] = g * sprime[0]
    g_e = jnp.dot(cast(g_z[0]), r["w0"].T, preferred_element_type=f32)
    g_e = g_e + jnp.dot(cast(g_z[skip_pos + 1]), r["wskip_pe"].T,
                        preferred_element_type=f32)

    n3 = [jnp.sum(g_e * dpe3[j], axis=1) for j in range(3)]  # each [T]

    # appearance
    za0 = dot(vpe, r["wv"]) + dot(feat, r["wf"]) + r["ba0"][0][None, :]
    for j in range(3):
        za0 = za0 + p3[:, j][:, None] * r["wp"][j][None, :]
        za0 = za0 + n3[j][:, None] * r["wn"][j][None, :]
    za = [za0]
    aa = [jnp.maximum(za0, 0.0)]
    for j in range(r["wa"].shape[0]):
        zj = dot(aa[-1], r["wa"][j]) + r["bab"][j][None, :]
        za.append(zj)
        aa.append(jnp.maximum(zj, 0.0))
    rgb_pack = dot(aa[-1], r["wa4"]) + r["ba4"][0][None, :]

    return dict(z=z, a=a, sprime=sprime, feat=feat, logit=logit,
                g_e=g_e, n3=n3, za=za, aa=aa, rgb_pack=rgb_pack)


def _read_refs(args):
    # b8l lives in SMEM: compiled Mosaic only loads scalars from SMEM
    return {k: (v[0, 0] if k == "b8l" else v[:])
            for k, v in zip(PACK_ORDER, args)}


def _fwd_kernel(em, vpe, p3, dpe, *args, skip_pos, wdt):
    r = _read_refs(args[:-1])
    out = args[-1]
    dpe3 = [dpe[:, j * LANES:(j + 1) * LANES] for j in range(3)]
    c = _forward_core(r, em[:], vpe[:], p3[:], dpe3,
                      skip_pos=skip_pos, wdt=wdt)
    col = jax.lax.broadcasted_iota(jnp.int32, c["rgb_pack"].shape, 1)
    packed = jnp.where(col < 3, c["rgb_pack"], 0.0)
    packed = packed + jnp.where(col == 3, c["logit"][:, None], 0.0)
    out[:] = packed


def _bwd_kernel(em, vpe, p3, dpe, gup, *args, skip_pos, wdt):
    f32 = jnp.float32
    cast = lambda x: x.astype(wdt)

    def sum0(x, row=0, n_rows=8):
        # column sums of x [T, W] placed into row `row` of an [n_rows, W]
        # result, computed as a row-select matmul — Mosaic rejects plain
        # axis-0 reductions to [1, W] here (replicated-layout relayout bug)
        sel = (jax.lax.broadcasted_iota(jnp.int32, (n_rows, x.shape[0]), 0)
               == row).astype(f32)
        return jnp.dot(sel, x, preferred_element_type=f32)
    n_w = len(PACK_ORDER)
    r = _read_refs(args[:n_w])
    grefs = dict(zip(["d_" + k for k in PACK_ORDER], args[n_w:]))

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for g in grefs.values():
            g[:] = jnp.zeros(g.shape, g.dtype)

    em_, vpe_, p3_ = em[:], vpe[:], p3[:]
    dpe3 = [dpe[:, j * LANES:(j + 1) * LANES] for j in range(3)]
    c = _forward_core(r, em_, vpe_, p3_, dpe3, skip_pos=skip_pos, wdt=wdt)
    z, a, sprime = c["z"], c["a"], c["sprime"]
    width = r["wf"].shape[0]
    n_trunk = r["trunk_w"].shape[0]

    # ---- appearance backward -------------------------------------------
    g_up = gup[:]
    col = jax.lax.broadcasted_iota(jnp.int32, g_up.shape, 1)
    g_rgb = jnp.where(col < 3, g_up, 0.0)                      # [T, APP_OUT]
    g_logit = jnp.sum(jnp.where(col == 3, g_up, 0.0), axis=1)  # [T]

    grefs["d_wa4"][:] += jnp.dot(cast(c["aa"][-1]).T, cast(g_rgb),
                                 preferred_element_type=f32)
    grefs["d_ba4"][:] += sum0(g_rgb)
    gz = jnp.dot(cast(g_rgb), r["wa4"].T, preferred_element_type=f32)
    for j in range(r["wa"].shape[0] - 1, -1, -1):
        gz = gz * (c["za"][j + 1] > 0)
        grefs["d_wa"][j] += jnp.dot(cast(c["aa"][j]).T, cast(gz),
                                    preferred_element_type=f32)
        grefs["d_bab"][j] += sum0(gz)
        gz = jnp.dot(cast(gz), r["wa"][j].T, preferred_element_type=f32)
    gz = gz * (c["za"][0] > 0)                                 # app-L0 z-bar
    grefs["d_wv"][:] += jnp.dot(cast(vpe_).T, cast(gz),
                                preferred_element_type=f32)
    grefs["d_wf"][:] += jnp.dot(cast(c["feat"]).T, cast(gz),
                                preferred_element_type=f32)
    grefs["d_ba0"][:] += sum0(gz)
    g_n = []
    for j in range(3):
        grefs["d_wp"][:] += sum0(p3_[:, j][:, None] * gz, row=j)
        grefs["d_wn"][:] += sum0(c["n3"][j][:, None] * gz, row=j)
        g_n.append(jnp.sum(gz * r["wn"][j][None, :].astype(f32), axis=1))
    g_feat = jnp.dot(cast(gz), r["wf"].T, preferred_element_type=f32)

    # ---- first-order seeds through the split geo head ------------------
    grefs["d_w8f"][:] += jnp.dot(cast(a[-1]).T, cast(g_feat),
                                 preferred_element_type=f32)
    grefs["d_b8f"][:] += sum0(g_feat)
    grefs["d_w8l"][:] += sum0(g_logit[:, None] * a[-1])
    # d_b8l uses an (8, LANES) block (a (1,1) VMEM output block would
    # violate the f32 tiling minimum); only [0, 0] is meaningful
    onecol = (jax.lax.broadcasted_iota(
        jnp.int32, (g_up.shape[0], LANES), 1) == 0).astype(f32)
    grefs["d_b8l"][:] += sum0(g_logit[:, None] * onecol)
    h_bar = (jnp.dot(cast(g_feat), r["w8f"].T, preferred_element_type=f32)
             + g_logit[:, None] * r["w8l"][0][None, :].astype(f32))

    # ---- second-order: tangent forward of the normal path --------------
    c_e = (dpe3[0] * g_n[0][:, None] + dpe3[1] * g_n[1][:, None]
           + dpe3[2] * g_n[2][:, None])
    tz = [None] * len(z)
    tz[0] = jnp.dot(cast(c_e), r["w0"], preferred_element_type=f32)
    t_prev = sprime[0] * tz[0]
    tc_pe = jnp.dot(cast(c_e), r["wskip_pe"], preferred_element_type=f32)
    t_list = [t_prev]
    for i in range(n_trunk):
        tzi = jnp.dot(cast(t_prev), r["trunk_w"][i],
                      preferred_element_type=f32)
        if i == skip_pos:
            tzi = tzi + tc_pe
        tz[i + 1] = tzi
        t_prev = sprime[i + 1] * tzi
        t_list.append(t_prev)
    # s = t_a7 . w8l[0]  (per point), summed into the loss
    grefs["d_w8l"][:] += sum0(t_list[-1])
    t_bar = jnp.broadcast_to(r["w8l"][0].astype(f32)[None, :], a[-1].shape)

    # ---- doubled reverse sweep through the trunk -----------------------
    spp = lambda i: 100.0 * sprime[i] * (1.0 - sprime[i])
    for i in range(n_trunk, 0, -1):       # z index i <-> trunk_w[i-1]
        z_bar = h_bar * sprime[i] + t_bar * spp(i) * tz[i]
        tz_bar = t_bar * sprime[i]
        grefs["d_trunk_w"][i - 1] += (
            jnp.dot(cast(a[i - 1]).T, cast(z_bar), preferred_element_type=f32)
            + jnp.dot(cast(t_list[i - 1]).T, cast(tz_bar),
                      preferred_element_type=f32))
        grefs["d_trunk_b"][i - 1] += sum0(z_bar)
        if i - 1 == skip_pos:
            grefs["d_wskip_pe"][:] += (
                jnp.dot(cast(em_).T, cast(z_bar), preferred_element_type=f32)
                + jnp.dot(cast(c_e).T, cast(tz_bar),
                          preferred_element_type=f32))
        h_bar = jnp.dot(cast(z_bar), r["trunk_w"][i - 1].T,
                        preferred_element_type=f32)
        t_bar = jnp.dot(cast(tz_bar), r["trunk_w"][i - 1].T,
                        preferred_element_type=f32)
    z_bar = h_bar * sprime[0] + t_bar * spp(0) * tz[0]
    tz_bar = t_bar * sprime[0]
    grefs["d_w0"][:] += (
        jnp.dot(cast(em_).T, cast(z_bar), preferred_element_type=f32)
        + jnp.dot(cast(c_e).T, cast(tz_bar), preferred_element_type=f32))
    grefs["d_b0"][:] += sum0(z_bar)


def _w_shapes(cfg: OccFieldConfig):
    width = cfg.hidden_dim
    n_trunk = cfg.num_layers - 1
    n_app_mid = 3
    return {
        "w0": (LANES, width), "b0": (1, width), "wskip_pe": (LANES, width),
        "trunk_w": (n_trunk, width, width), "trunk_b": (n_trunk, width),
        "w8f": (width, width), "b8f": (1, width),
        "w8l": (8, width), "b8l": (1, 1),
        "wp": (8, width), "wv": (LANES, width), "wn": (8, width),
        "wf": (width, width), "ba0": (1, width),
        "wa": (n_app_mid, width, width), "bab": (n_app_mid, width),
        "wa4": (width, APP_OUT), "ba4": (1, APP_OUT),
    }


def _rep(shape, space=pltpu.VMEM):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i, _n=nd: (0,) * _n, memory_space=space)


def _build(cfg: OccFieldConfig, n: int, tile: int, interpret: bool, wdt):
    skip_pos = cfg.skips[0] - 1
    shapes = _w_shapes(cfg)
    wspecs = [_rep(shapes[k], pltpu.SMEM if k == "b8l" else pltpu.VMEM)
              for k in PACK_ORDER]
    tile_spec = lambda lanes: pl.BlockSpec((tile, lanes), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM)

    fwd = pl.pallas_call(
        partial(_fwd_kernel, skip_pos=skip_pos, wdt=wdt),
        grid=(n // tile,),
        in_specs=[tile_spec(LANES), tile_spec(LANES), tile_spec(LANES),
                  tile_spec(3 * LANES)] + wspecs,
        out_specs=tile_spec(APP_OUT),
        out_shape=jax.ShapeDtypeStruct((n, APP_OUT), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )
    # bias/vector grads widen to 8-row blocks (see sum0 in the kernel)
    width = cfg.hidden_dim
    n_trunk = cfg.num_layers - 1
    gshapes = dict(shapes, b8l=(8, LANES), b0=(8, width),
                   trunk_b=(n_trunk, 8, width), b8f=(8, width),
                   ba0=(8, width), bab=(3, 8, width), ba4=(8, APP_OUT))
    bwd = pl.pallas_call(
        partial(_bwd_kernel, skip_pos=skip_pos, wdt=wdt),
        grid=(n // tile,),
        in_specs=[tile_spec(LANES), tile_spec(LANES), tile_spec(LANES),
                  tile_spec(3 * LANES), tile_spec(APP_OUT)] + wspecs,
        out_specs=tuple(_rep(gshapes[k]) for k in PACK_ORDER),
        out_shape=tuple(jax.ShapeDtypeStruct(gshapes[k], jnp.float32)
                        for k in PACK_ORDER),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )
    return fwd, bwd


def _inputs_from_points(p, ray_d, cfg):
    """XLA-side small tensors: PE, its diagonal jacobian blocks, view PE."""
    n = p.shape[0]
    e = cfg.dim_embed
    x = p / cfg.rescale
    em = jnp.pad(nerf_embed(x, cfg.octaves_pe), ((0, 0), (0, LANES - e)))

    L = cfg.octaves_pe
    freqs = 2.0 ** jnp.arange(L, dtype=p.dtype)
    scaled = x[..., None, :] * freqs[:, None]            # [N, L, 3]
    dsin = freqs[:, None] * jnp.cos(scaled)
    dcos = -freqs[:, None] * jnp.sin(scaled)
    de = jnp.concatenate(
        [jnp.ones((n, 3), p.dtype),
         jnp.stack([dsin, dcos], axis=-2).reshape(n, -1)], axis=-1)
    de = de / cfg.rescale                                 # chain of p/rescale
    dims = jnp.tile(jnp.arange(3), e // 3)
    dpe = jnp.concatenate(
        [jnp.pad(jnp.where(dims[None, :] == j, de, 0.0),
                 ((0, 0), (0, LANES - e))) for j in range(3)], axis=1)

    view = ray_d / jnp.linalg.norm(ray_d, axis=-1, keepdims=True)
    vpe_raw = nerf_embed(view, cfg.octaves_pe_views)
    vpe = jnp.pad(vpe_raw, ((0, 0), (0, LANES - vpe_raw.shape[1])))
    p3 = jnp.pad(p, ((0, 0), (0, LANES - 3)))
    return em, vpe, p3, dpe


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _op(packed, em, vpe, p3, dpe, cfg, tile, interpret, compute):
    out, _ = _op_fwd(packed, em, vpe, p3, dpe, cfg, tile, interpret, compute)
    return out


def _op_fwd(packed, em, vpe, p3, dpe, cfg, tile, interpret, compute):
    wdt = jnp.bfloat16 if compute == "bfloat16" else jnp.float32
    fwd, _ = _build(cfg, em.shape[0], tile, interpret, wdt)
    out = fwd(em, vpe, p3, dpe, *[packed[k] for k in PACK_ORDER])
    return out, (packed, em, vpe, p3, dpe)


def _op_bwd(cfg, tile, interpret, compute, res, g_out):
    packed, em, vpe, p3, dpe = res
    wdt = jnp.bfloat16 if compute == "bfloat16" else jnp.float32
    _, bwd = _build(cfg, em.shape[0], tile, interpret, wdt)
    grads = bwd(em, vpe, p3, dpe, g_out, *[packed[k] for k in PACK_ORDER])
    packed_bar = {}
    for k, g in zip(PACK_ORDER, grads):
        # bias grads come back in widened 8-row blocks; row 0 is the value
        if k == "b8l":
            g = g[0:1, 0:1]
        elif k in ("b0", "b8f", "ba0", "ba4"):
            g = g[0:1]
        elif k in ("trunk_b", "bab"):
            g = g[:, 0]
        packed_bar[k] = g.astype(packed[k].dtype)
    z = jnp.zeros_like
    return packed_bar, z(em), z(vpe), z(p3), z(dpe)


_op.defvjp(_op_fwd, _op_bwd)


@partial(jax.jit, static_argnames=("cfg", "tile", "interpret", "compute"))
def fused_radiance_and_alpha(
    params: dict,
    p: jnp.ndarray,          # [N, 3] — stop-gradient'd (marcher output)
    ray_d: jnp.ndarray,      # [N, 3]
    cfg: OccFieldConfig,
    tile: int = 256,
    interpret: bool = False,
    compute: str = "bfloat16",
):
    """Drop-in for fields.occupancy.radiance_and_alpha on the training
    megabatch: returns (rgb [N,3] in [0,1], alpha [N]). Differentiable wrt
    `params` (weight gradients only; p/ray_d receive zeros — the call sites
    stop-gradient them anyway). Flattens leading batch dims."""
    shape = p.shape[:-1]
    p = p.reshape(-1, 3)
    ray_d = ray_d.reshape(-1, 3)
    n = p.shape[0]
    pad = (-n) % tile
    p_in = jax.lax.stop_gradient(
        jnp.concatenate([p, jnp.zeros((pad, 3), p.dtype)]) if pad else p)
    r_in = jax.lax.stop_gradient(
        jnp.concatenate([ray_d, jnp.ones((pad, 3), ray_d.dtype)])
        if pad else ray_d)
    em, vpe, p3, dpe = _inputs_from_points(p_in, r_in, cfg)
    wdt = jnp.bfloat16 if compute == "bfloat16" else jnp.float32
    packed = _pack(params, cfg, wdt)
    out = _op(packed, em, vpe, p3, dpe, cfg, tile, interpret, compute)
    rgb = (jnp.tanh(out[:n, :3]) * 0.5 + 0.5).reshape(*shape, 3)
    alpha = jax.nn.sigmoid(-10.0 * out[:n, 3]).reshape(shape)
    return rgb, alpha
