"""Occupancy-field ray marching: dense sign-scan root finding + secant refine,
and per-light visibility marching.

TPU-native redesign of stage1/model/rendering.py:410-555 and :378-408:
  * static shapes everywhere — every ray computes every step; invalid lanes are
    masked with jnp.where instead of boolean gather/scatter.
  * the reference's randomized step count n_steps ~ U[256, 512) (rendering.py:441)
    would force retraces; we instead keep n_steps fixed and jitter the global
    phase of the proposal grid (same decorrelation effect, one compile).
  * no max_points chunk loops (rendering.py:456-462) — callers megabatch and,
    if memory-bound, wrap in lax.map over fixed tiles.
  * the whole march is a no-grad region (the reference wraps it in no_grad);
    we stop_gradient the result.

Sentinel convention (rendering.py:519-522): returned depth is
  d_pred   where a valid inside-crossing was found,
  +inf     where not,
  0        where the FIRST proposal sample is already occupied.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from psnerf_tpu.core.compositing import alpha_composite
from psnerf_tpu.core.rays import get_sphere_intersection
from psnerf_tpu.core.sampling import linspace_between

TAU = 0.5


def _safe_div(a, b, eps=1e-12):
    return a / jnp.where(jnp.abs(b) < eps, jnp.where(b < 0, -eps, eps), b)


def secant(
    occ_fn,
    f_low: jnp.ndarray,
    f_high: jnp.ndarray,
    d_low: jnp.ndarray,
    d_high: jnp.ndarray,
    ray0: jnp.ndarray,
    ray_dir: jnp.ndarray,
    n_steps: int = 8,
) -> jnp.ndarray:
    """Vectorized secant refinement on [d_low, d_high] (rendering.py:525-555).

    occ_fn: points [N, 3] -> occupancy-minus-tau values [N].
    All of f_low/f_high/d_low/d_high: [N]. Returns refined depths [N].
    """

    def body(_, state):
        f_low, f_high, d_low, d_high, d_pred = state
        p_mid = ray0 + d_pred[..., None] * ray_dir
        f_mid = occ_fn(p_mid)
        ind_low = f_mid < 0
        d_low = jnp.where(ind_low, d_pred, d_low)
        f_low = jnp.where(ind_low, f_mid, f_low)
        d_high = jnp.where(ind_low, d_high, d_pred)
        f_high = jnp.where(ind_low, f_high, f_mid)
        d_pred = -f_low * _safe_div(d_high - d_low, f_high - f_low) + d_low
        return f_low, f_high, d_low, d_high, d_pred

    d_pred = -f_low * _safe_div(d_high - d_low, f_high - f_low) + d_low
    state = (f_low, f_high, d_low, d_high, d_pred)
    state = jax.lax.fori_loop(0, n_steps, body, state)
    return state[-1]


def ray_marching(
    occ_fn,
    ray0: jnp.ndarray,
    ray_dir: jnp.ndarray,
    n_steps: int = 256,
    n_secant_steps: int = 8,
    near: float = 0.0,
    rad: float = 1.0,
    clip_box: bool = False,
    phase_key: jax.Array | None = None,
) -> jnp.ndarray:
    """Find the first inside-crossing depth along each ray.

    occ_fn: [M, 3] -> occupancy probability in [0, 1], [M] (static arg —
      partial-apply your field params).
    ray0/ray_dir: [N, 3], ray_dir unit-norm.
    Returns d [N] with the inf/0 sentinel convention (module docstring).
    Reference: stage1/model/rendering.py:410-523.
    """
    n = ray0.shape[0]
    depth_intersect, _ = get_sphere_intersection(ray0[0], ray_dir, r=rad)
    d_far = depth_intersect[..., 1]  # [N]

    lo = jnp.full((n,), near, dtype=ray0.dtype)
    d_prop = linspace_between(lo, d_far, n_steps)  # [N, S]
    if phase_key is not None:
        # global phase jitter: shift all samples by a shared fraction of one
        # cell (replaces the reference's randomized step count).
        cell = (d_far - near) / (n_steps - 1)
        shift = jax.random.uniform(phase_key, ()) * cell[..., None]
        d_prop = jnp.concatenate(
            [d_prop[..., :1], d_prop[..., 1:-1] + shift, d_prop[..., -1:]], axis=-1
        )

    p_prop = ray0[:, None, :] + ray_dir[:, None, :] * d_prop[..., None]  # [N, S, 3]
    val = occ_fn(p_prop.reshape(-1, 3)).reshape(n, n_steps) - TAU
    if clip_box:
        outside = jnp.any(jnp.abs(p_prop) > 1.0, axis=-1)
        val = jnp.where(outside, -1.0, val)
    val = jax.lax.stop_gradient(val)

    mask_0_not_occupied = val[:, 0] < 0

    # first sign change: cost = sign(v_i * v_{i+1}) * (S - i); min picks the
    # earliest negative product (rendering.py:472-487)
    sign = jnp.sign(val[:, :-1] * val[:, 1:])
    sign = jnp.concatenate([sign, jnp.ones((n, 1), val.dtype)], axis=-1)
    cost = sign * jnp.arange(n_steps, 0, -1, dtype=val.dtype)
    indices = jnp.argmin(cost, axis=-1)  # [N]
    values = jnp.min(cost, axis=-1)
    mask_sign_change = values < 0
    mask_neg_to_pos = jnp.take_along_axis(val, indices[:, None], axis=-1)[:, 0] < 0
    mask = mask_sign_change & mask_neg_to_pos & mask_0_not_occupied

    take = lambda arr, idx: jnp.take_along_axis(arr, idx[:, None], axis=-1)[:, 0]
    d_low = take(d_prop, indices)
    f_low = take(val, indices)
    idx_hi = jnp.minimum(indices + 1, n_steps - 1)
    d_high = take(d_prop, idx_hi)
    f_high = take(val, idx_hi)

    occ_minus_tau = lambda p: occ_fn(p) - TAU
    d_pred = secant(
        occ_minus_tau, f_low, f_high, d_low, d_high, ray0, ray_dir, n_secant_steps
    )

    d_out = jnp.where(mask, d_pred, jnp.inf)
    d_out = jnp.where(mask_0_not_occupied, d_out, 0.0)
    return jax.lax.stop_gradient(d_out)


def occupancy_guide_grid(
    occ_fn,
    res: int = 64,
    box: float = 1.1,
    thresh: float = 0.01,
    dilate: int = 3,
) -> jnp.ndarray:
    """Conservative 'might-be-occupied' voxel grid over [-box, box]^3 for
    guided visibility marching: evaluate the field at every cell center
    (res^3 points — one fused-kernel call, ~0.3 GFLOP at 64^3), threshold
    LOW (anything the march could integrate meaningfully), then dilate by
    `dilate` cells of 3^3 max-pool so rays grazing a surface still see the
    cell. Returns a float {0,1} grid [res, res, res].

    CALIBRATION (must hold or thin occluders can fall between the guided
    march's coarse probes): the dilated occupied slab is >= (2*dilate+1)
    cells = (2*dilate+1)*2*box/res thick, and light_visibility probes at
    spacing <= worst-span/(guide_coarse-1) ~ 2*box*sqrt(3)/(guide_coarse-1).
    Defaults (res=64, dilate=3, guide_coarse=16) give 0.24 slab vs 0.25
    worst-case spacing — matched; the measured Pareto point on a trained
    field (tools/bench_vis_guided_sweep.py: guided-16 here beats
    rescaled-32 on BOTH time and faithful-agreement). dilate=1 at
    guide_coarse=32 under-covers (0.10 slab vs 0.12 spacing) and measurably
    loses agreement (0.992 vs 0.998) — do not ship that combination."""
    half = box / res
    xs = jnp.linspace(-box + half, box - half, res)
    gx, gy, gz = jnp.meshgrid(xs, xs, xs, indexing="ij")
    pts = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
    occ = (occ_fn(pts).reshape(res, res, res) > thresh).astype(jnp.float32)
    for _ in range(dilate):
        occ = jax.lax.reduce_window(
            occ, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1), "SAME")
    return jax.lax.stop_gradient(occ)


def light_visibility(
    occ_fn,
    surf: jnp.ndarray,
    light_dir: jnp.ndarray,
    lnear: float = 0.1,
    lfar: float = 3.5,
    n_steps: int = 128,
    box: float = 1.1,
    rescale: bool = False,
    light_chunk: int = 1,
    guide: jnp.ndarray | None = None,
    guide_coarse: int = 16,
) -> jnp.ndarray:
    """Transmittance toward each light: 1 - integrated occupancy along the
    light ray (stage1/model/rendering.py:378-408).

    surf: [N, 3] surface points; light_dir: [L, 3] unit dirs.
    Returns visibility [L, N] in [0, 1]. The L axis is a lax.map inside ONE
    compiled program (replaces the reference's Python lbatch=96 loop,
    rendering.py:367-372): each light's N x S march is fully parallel, and
    mapping (rather than vmapping) the light axis keeps the working set at
    one light group's samples — a full vmap would materialize [L, N*S, ...]
    at once, which OOMs at export scale (80 lights x 4096 px x 128 steps).

    light_chunk: lights marched per lax.map iteration (padded to a multiple
    with copies of dir 0, sliced back; per-light results unchanged). NOTE —
    measured on v5e (tools/bench_vis_march.py): chunk=1 is FASTEST (95.6
    TFLOP/s ≈ 48% of bf16 peak, vs 83.5 at chunk=8): the fused occ kernel's
    grid already pipelines row tiles, so grouping lights only grows the
    per-iteration HBM working set. The remaining gap to peak is MXU
    pipeline fill across the trunk's serially-dependent layers (the same
    bound as the stage-2 training step; README roofline notes).

    rescale=False (reference-faithful): S samples uniform on [lnear, lfar],
    samples outside the ±box clip zeroed AFTER evaluation — for surface
    points the ray leaves the box within ~1.8 units, so over half the field
    evaluations are spent on samples that are then masked away.
    rescale=True: S samples uniform on [lnear, per-ray box-exit distance]
    (the box is convex, so the inside samples are exactly a prefix of any
    ray) — every evaluation lands inside the clip box, and with S=64 the
    sample spacing is at least as fine as the reference's 128-over-[0.1,3.5]
    grid for every ray whose box exit is within 1.79 units (PARITY.md
    documented delta; A/B'd in tests/test_render.py and on the analytic
    cast-shadow scene).

    guide (implies the rescaled parameterization): a {0,1} voxel grid from
    occupancy_guide_grid over [-box, box]^3. Before the MLP march, each ray
    probes the grid at `guide_coarse` positions on [lnear, box exit]
    (gathers — ~1e-5 of an MLP sample's FLOPs) and shrinks its march
    interval to [lnear, last occupied probe + one coarse step]: the field
    beyond the last occupied voxel cannot contribute occupancy, so the S MLP
    samples concentrate where the object actually is. Typical occupied
    spans are 30-50% of the box span, so S can drop 2-4x below `rescale`'s
    budget at equal-or-finer spacing inside the span (sweep-backed: S=16
    with the default res-64/dilate-3/coarse-16 guide beats rescaled S=32
    on both wall-clock and faithful-protocol agreement,
    tools/bench_vis_guided_sweep.py; probe-spacing calibration rule in
    occupancy_guide_grid's docstring). Rays with NO occupied
    probe collapse to [lnear, lnear+coarse-step]; their samples then sit in
    sub-threshold field (the grid is dilated and thresholded at 0.01), so
    the compositing sum stays near zero as it should.
    """
    n = surf.shape[0]
    if not rescale and guide is None:
        t_shared = jnp.linspace(lnear, lfar, n_steps, dtype=surf.dtype)  # [S]
    if guide is not None:
        res = guide.shape[0]
        guide_flat = guide.reshape(-1)
        frac_c = jnp.linspace(0.0, 1.0, guide_coarse, dtype=surf.dtype)

    frac = jnp.linspace(0.0, 1.0, n_steps, dtype=surf.dtype)  # [S]

    def _box_exit(ldirs):
        # exit distance of x = surf + t*ldir from the [-box, box]^3
        # cube: per axis the positive root of |x_a| = box, then the min
        t_axis = jnp.where(ldirs[:, None, :] > 0,
                           _safe_div(box - surf[None], ldirs[:, None, :]),
                           _safe_div(-box - surf[None],
                                     ldirs[:, None, :]))  # [C, N, 3]
        t_axis = jnp.where(jnp.abs(ldirs)[:, None, :] < 1e-8, jnp.inf,
                           t_axis)
        return jnp.clip(jnp.min(t_axis, axis=-1), lnear + 1e-3, lfar)

    def one_group(ldirs):  # [C, 3] -> [C, N]
        c = ldirs.shape[0]
        if guide is not None:
            t_exit = _box_exit(ldirs)
            # coarse grid probe: where along the ray might occupancy live?
            tc = lnear + (t_exit - lnear)[..., None] * frac_c  # [C, N, Sc]
            pc = surf[None, :, None, :] + ldirs[:, None, None, :] \
                * tc[..., None]
            ijk = jnp.clip(
                jnp.floor((pc + box) * (res / (2.0 * box))).astype(jnp.int32),
                0, res - 1)
            flat = (ijk[..., 0] * res + ijk[..., 1]) * res + ijk[..., 2]
            occ_c = jnp.take(guide_flat, flat)  # [C, N, Sc] in {0, 1}
            sidx = jnp.arange(1, guide_coarse + 1, dtype=jnp.int32)
            last = jnp.max(occ_c.astype(jnp.int32) * sidx, axis=-1)  # [C,N]
            step_c = (t_exit - lnear) / (guide_coarse - 1)
            t_last = jnp.take_along_axis(
                tc, jnp.maximum(last - 1, 0)[..., None], axis=-1)[..., 0]
            t_hi = jnp.where(last > 0,
                             jnp.minimum(t_last + step_c, t_exit),
                             lnear + step_c)
            t = lnear + (t_hi - lnear)[..., None] * frac  # [C, N, S]
        elif not rescale:
            t = jnp.broadcast_to(t_shared[None, None, :], (c, n, n_steps))
        else:
            t_exit = _box_exit(ldirs)
            t = lnear + (t_exit - lnear)[..., None] * frac  # [C, N, S]
        p = surf[None, :, None, :] + ldirs[:, None, None, :] * t[..., None]
        alpha = occ_fn(p.reshape(-1, 3)).reshape(c, n, n_steps)
        inside = jnp.all((p <= box) & (p >= -box), axis=-1)  # [C, N, S]
        alpha = jnp.where(inside, alpha, 0.0)
        acc = jnp.sum(alpha_composite(alpha), axis=-1)
        return 1.0 - acc

    l = light_dir.shape[0]
    chunk = max(1, min(light_chunk, l))
    pad = (-l) % chunk
    if pad:
        light_dir = jnp.concatenate(
            [light_dir, jnp.tile(light_dir[:1], (pad, 1))], axis=0)
    groups = light_dir.reshape(-1, chunk, 3)
    out = jax.lax.map(one_group, groups).reshape(-1, n)[:l]
    return jax.lax.stop_gradient(out)
