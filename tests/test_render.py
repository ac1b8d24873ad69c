import jax
import jax.numpy as jnp
import numpy as np

from psnerf_tpu.fields import (
    OccFieldConfig,
    PSNetConfig,
    init_occupancy_field,
    init_psnet,
    occ_alpha,
)
from psnerf_tpu.render import (
    UnisurfConfig,
    light_visibility,
    ray_marching,
    render_psnet,
    render_shape_extract,
    render_unisurf,
    secant,
)


def sphere_occ(p, r=0.7, sharp=50.0):
    """Analytic occupancy of a sphere: ~1 inside, ~0 outside, smooth edge."""
    d = jnp.linalg.norm(p, axis=-1) - r
    return jax.nn.sigmoid(-sharp * d)


def test_ray_marching_analytic_sphere():
    # camera at z=-3 shooting +z: surface at depth 3 - 0.7 = 2.3
    n = 8
    ray0 = jnp.tile(jnp.asarray([[0.0, 0.0, -3.0]]), (n, 1))
    ys = jnp.linspace(0.0, 1.2, n)  # rays tilt away from the sphere
    dirs = jnp.stack([jnp.zeros(n), ys, jnp.ones(n)], axis=-1)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    d = ray_marching(sphere_occ, ray0, dirs, n_steps=128, near=0.5, rad=2.0)
    d = np.asarray(d)
    # central ray hits at 2.3
    assert abs(d[0] - 2.3) < 0.01
    # steep rays miss -> inf sentinel
    assert np.isinf(d[-1])
    # hit depths are finite and ordered increasing with tilt until miss
    finite = np.isfinite(d)
    assert finite[0] and not finite[-1]
    assert np.all(np.diff(d[finite]) > -1e-3)


def test_ray_marching_zero_sentinel():
    # ray starting inside the object: first sample occupied -> 0 sentinel
    ray0 = jnp.zeros((2, 3))
    dirs = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    d = ray_marching(sphere_occ, ray0, dirs, n_steps=64, near=0.01, rad=2.0)
    np.testing.assert_allclose(np.asarray(d), 0.0)


def test_secant_refines_root():
    # f(d) = occ(ray(d)) - 0.5 crossing at d = 2.3
    ray0 = jnp.asarray([[0.0, 0.0, -3.0]])
    rdir = jnp.asarray([[0.0, 0.0, 1.0]])
    occ_minus = lambda p: sphere_occ(p) - 0.5
    d = secant(
        occ_minus,
        f_low=jnp.asarray([-0.49]), f_high=jnp.asarray([0.49]),
        d_low=jnp.asarray([2.0]), d_high=jnp.asarray([2.6]),
        ray0=ray0, ray_dir=rdir,
    )
    assert abs(float(d[0]) - 2.3) < 1e-4


def test_light_visibility_self_shadow():
    # point on the -z surface of the sphere: light from -z is unoccluded,
    # light from +z passes through the body -> occluded
    surf = jnp.asarray([[0.0, 0.0, -0.7]])
    lights = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0]])
    vis = light_visibility(sphere_occ, surf, lights, lnear=0.05, lfar=3.0)
    assert vis.shape == (2, 1)
    assert float(vis[0, 0]) > 0.85  # smooth analytic edge leaks a little alpha
    assert float(vis[1, 0]) < 0.1


def test_light_visibility_rescaled_matches_fixed():
    """The box-exit-rescaled march (64 steps over [lnear, per-ray exit])
    must agree with the reference-faithful fixed grid (128 over [0.1, 3.5])
    on every decisive ray — it spends the same or finer sample spacing
    inside the clip box while skipping the guaranteed-masked tail."""
    rng = np.random.default_rng(3)
    # points on the sphere surface, nudged outward like the export does
    n = rng.normal(size=(64, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    surf = jnp.asarray(0.72 * n, jnp.float32)
    ldir = rng.normal(size=(12, 3))
    ldir /= np.linalg.norm(ldir, axis=-1, keepdims=True)
    ldir = jnp.asarray(ldir, jnp.float32)

    occ = lambda p: sphere_occ(p, sharp=120.0)  # decisive shell
    vis_fix = np.asarray(light_visibility(
        occ, surf, ldir, lnear=0.05, lfar=3.5, n_steps=128))
    vis_res = np.asarray(light_visibility(
        occ, surf, ldir, lnear=0.05, lfar=3.5, n_steps=64,
        rescale=True))
    # identical binarized occlusion on every decisive ray (borderline rays
    # graze the wide sphere_occ shell, where the compositing sum is
    # legitimately sampling-density-dependent — see the analytic-GT A/B in
    # tests/test_shadows.py for the accuracy ranking)
    decisive = (np.abs(vis_fix - 0.5) > 0.25) & (np.abs(vis_res - 0.5) > 0.25)
    assert decisive.mean() > 0.8
    np.testing.assert_array_equal(vis_fix[decisive] > 0.5,
                                  vis_res[decisive] > 0.5)
    # clear rays (no occupancy anywhere along them) agree closely in value;
    # grazing/occluded rays may differ in softness (denser sampling inside
    # the smooth shell integrates MORE alpha), always toward more decisive
    clear = vis_fix > 0.98
    assert clear.any() and (~clear).any()
    np.testing.assert_allclose(vis_res[clear], vis_fix[clear], atol=0.03)
    assert np.all(vis_res[~clear] <= vis_fix[~clear] + 0.03)


def test_occupancy_guide_grid():
    from psnerf_tpu.render.marching import occupancy_guide_grid

    g = occupancy_guide_grid(lambda p: sphere_occ(p, sharp=120.0),
                             res=32, box=1.1, thresh=0.01, dilate=1)
    g = np.asarray(g)
    assert g.shape == (32, 32, 32) and set(np.unique(g)) <= {0.0, 1.0}
    # cell centers inside the sphere are occupied; far corners are not
    half = 1.1 / 32
    xs = np.linspace(-1.1 + half, 1.1 - half, 32)
    r = np.sqrt(xs[:, None, None] ** 2 + xs[None, :, None] ** 2
                + xs[None, None, :] ** 2)
    cell_diag = 2 * 1.1 / 32 * np.sqrt(3)
    assert g[r < 0.7 - cell_diag].all()          # interior occupied
    assert not g[r > 0.7 + 2.5 * cell_diag].any()  # beyond dilation: empty


def test_light_visibility_guided_matches_fixed():
    """The grid-guided march (S samples over [lnear, last-occupied voxel])
    must reproduce the reference-faithful fixed march's occlusion decisions
    with a QUARTER of the sample budget — the point of the guide is that
    the skipped tail is provably empty field (defaults calibration in
    occupancy_guide_grid's docstring; trained-field Pareto sweep in
    tools/bench_vis_guided_sweep.py)."""
    from psnerf_tpu.render.marching import occupancy_guide_grid

    rng = np.random.default_rng(7)
    n = rng.normal(size=(96, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    surf = jnp.asarray(0.72 * n, jnp.float32)
    ldir = rng.normal(size=(16, 3))
    ldir /= np.linalg.norm(ldir, axis=-1, keepdims=True)
    ldir = jnp.asarray(ldir, jnp.float32)

    # sharp=300 shell: a TRAINED occupancy field is decisive like this (the
    # sharp=120 shell used above is deliberately soft to exercise secant
    # behavior; on soft fields the protocol's values are genuinely sampling-
    # density-dependent — the on-chip trained-field A/B lives in
    # tools/bench_shape_export.py --guided)
    occ = lambda p: sphere_occ(p, sharp=300.0)
    guide = occupancy_guide_grid(occ, res=64, box=1.1)
    vis_fix = np.asarray(light_visibility(
        occ, surf, ldir, lnear=0.05, lfar=3.5, n_steps=128))
    vis_gd = np.asarray(light_visibility(
        occ, surf, ldir, lnear=0.05, lfar=3.5, n_steps=16,
        guide=guide))
    decisive = (np.abs(vis_fix - 0.5) > 0.25) & (np.abs(vis_gd - 0.5) > 0.25)
    assert decisive.mean() > 0.9
    np.testing.assert_array_equal(vis_fix[decisive] > 0.5,
                                  vis_gd[decisive] > 0.5)
    # clear rays stay clearly lit: the guided samples bunch inside the
    # shell (every surface point's own cell is occupied), so they integrate
    # slightly MORE alpha than the coarse fixed grid — bounded and
    # one-directional (toward decisive), like the rescale effect above
    clear = vis_fix > 0.98
    assert clear.any() and (~clear).any()
    assert np.all(vis_gd[clear] > 0.9)
    assert np.all(vis_gd[clear] <= vis_fix[clear] + 0.01)
    # partially-occluded rays: at a quarter of the sample budget the
    # integrated transmittance moves BOTH ways a little (coarser dt inside
    # the occupied span) — bounded, and never enough to flip a decisive ray
    # (the exact-agreement assertion above is the protocol's guarantee)
    assert np.all(np.abs(vis_gd[~clear] - vis_fix[~clear]) <= 0.08)


def test_light_visibility_chunk_invariant():
    """light_chunk batches independent lights per lax.map iteration (an MXU
    pipeline-fill optimization) — per-light results must not change, for
    both march protocols and for L not divisible by the chunk."""
    rng = np.random.default_rng(5)
    n = rng.normal(size=(48, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    surf = jnp.asarray(0.72 * n, jnp.float32)
    ldir = rng.normal(size=(11, 3))  # 11 % 4 != 0: exercises the pad+slice
    ldir /= np.linalg.norm(ldir, axis=-1, keepdims=True)
    ldir = jnp.asarray(ldir, jnp.float32)
    occ = lambda p: sphere_occ(p, sharp=120.0)
    for rescale, steps in [(False, 32), (True, 24)]:
        base = np.asarray(light_visibility(
            occ, surf, ldir, n_steps=steps, rescale=rescale))
        for chunk in (2, 4, 16):  # 16 > L: clamps to L
            got = np.asarray(light_visibility(
                occ, surf, ldir, n_steps=steps, rescale=rescale,
                light_chunk=chunk))
            np.testing.assert_allclose(got, base, atol=1e-6)


FIELD_CFG = OccFieldConfig(num_layers=4, hidden_dim=64, feat_size=64)
RCFG = UnisurfConfig(
    near=1.0, far=5.0, radius=2.0, num_points_in=16, num_points_out=8,
    ray_marching_steps=64,
)


def _camera():
    # camera at (0,0,-3) looking +z (c2w with z column +z)
    pose = jnp.eye(4).at[:3, 3].set(jnp.asarray([0.0, 0.0, -3.0]))
    k = jnp.asarray(
        [[100.0, 0, 32, 0], [0, 100.0, 32, 0], [0, 0, 1, 0], [0, 0, 0, 1.0]]
    )
    return k, pose


def test_render_unisurf_shapes_and_grads():
    params = init_occupancy_field(jax.random.PRNGKey(0), FIELD_CFG)
    k, pose = _camera()
    pix = jnp.asarray([[32.0, 32.0], [10.0, 50.0], [40.0, 28.0]])

    def loss_fn(p):
        out = render_unisurf(
            p, FIELD_CFG, RCFG, pix, k, pose, it=10000.0,
            key=jax.random.PRNGKey(1), use_outside=True, train=True,
        )
        return jnp.sum(out["rgb"]) + jnp.sum(out["diff_norm"])

    out = render_unisurf(
        params, FIELD_CFG, RCFG, pix, k, pose, it=10000.0,
        key=None, use_outside=True, train=False,
    )
    assert out["rgb"].shape == (3, 3)
    assert out["normal_pred"].shape == (3, 3)
    assert out["acc_map"].shape == (3,)
    assert out["mask_pred"].dtype == jnp.bool_
    assert bool(jnp.all(jnp.isfinite(out["rgb"])))

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_render_shape_extract_outputs():
    params = init_occupancy_field(jax.random.PRNGKey(0), FIELD_CFG)
    k, pose = _camera()
    pix = jnp.asarray([[32.0, 32.0], [0.0, 0.0]])
    lights = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    out = render_shape_extract(
        params, FIELD_CFG, RCFG, pix, k, pose, light_dir=lights, n_steps=64
    )
    assert out["points"].shape == (2, 3)
    assert out["normal"].shape == (2, 3)
    assert out["mask"].shape == (2,)
    assert out["visibility"].shape == (3, 2)
    assert float(out["visibility"].min()) >= 0.0
    assert float(out["visibility"].max()) <= 1.0


PS_CFG = PSNetConfig(
    mlp_width=32, sg_mlp_width=16, normal_mlp_width=32, vis_mlp_width=32,
    vis_mlp_depth=4, vis_mlp_skip_at=2,
)


def _ps_inputs(n=6, l=4):
    key = jax.random.PRNGKey(0)
    pts = jax.random.normal(key, (n, 3)) * 0.3
    normals = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    mask = jnp.asarray([True] * (n - 2) + [False, False])
    rays = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (n, 1))
    ldirs = jax.random.normal(jax.random.PRNGKey(1), (l, 3))
    ldirs = ldirs / jnp.linalg.norm(ldirs, axis=-1, keepdims=True)
    lints = jnp.full((l,), 2.0)
    return pts, normals, mask, rays, ldirs, lints


def test_render_psnet_shapes():
    params = init_psnet(jax.random.PRNGKey(0), PS_CFG)
    pts, normals, mask, rays, ldirs, lints = _ps_inputs()
    out = render_psnet(
        params, PS_CFG, pts, normals, mask, rays, ldirs, lints,
        key=jax.random.PRNGKey(2),
        light_vis_train=ldirs[:2],
    )
    n, l = pts.shape[0], ldirs.shape[0]
    assert out["rgb"].shape == (l, n, 3)
    assert out["albedo"].shape == (n, 3)
    assert out["sg_weight"].shape == (n, PS_CFG.n_weights)
    assert out["visibility"].shape == (l, n, 1)
    assert out["normal_pred"].shape == (n, 3)
    assert out["vis_train"].shape == (2, n)
    assert out["albedo_jitter"].shape == (n, 3)
    assert out["rough_jitter"].shape == (n, PS_CFG.n_weights)
    # rgb clamped, masked-out pixels are white (fill = 1)
    assert float(out["rgb"].min()) >= 0.0 and float(out["rgb"].max()) <= 1.0
    np.testing.assert_allclose(np.asarray(out["rgb"][:, -2:, :]), 1.0)
    # normal_pred unit-norm inside mask
    nrm = np.linalg.norm(np.asarray(out["normal_pred"][:4]), axis=-1)
    np.testing.assert_allclose(nrm, 1.0, rtol=1e-5)


def test_render_psnet_albedo_edit():
    params = init_psnet(jax.random.PRNGKey(0), PS_CFG)
    pts, normals, mask, rays, ldirs, lints = _ps_inputs()
    out = render_psnet(
        params, PS_CFG, pts, normals, mask, rays, ldirs, lints,
        albedo_new=jnp.asarray([0.9, 0.1, 0.1]),
    )
    np.testing.assert_allclose(
        np.asarray(out["albedo"][:4]), np.tile([0.9, 0.1, 0.1], (4, 1)), rtol=1e-6
    )
    out2 = render_psnet(
        params, PS_CFG, pts, normals, mask, rays, ldirs, lints, basis_new=3
    )
    w = np.asarray(out2["sg_weight"][:4]).reshape(4, 3, 9)
    np.testing.assert_allclose(w[:, :, 3], 2.0**3 / 100.0, rtol=1e-6)
    assert np.all(w[:, :, [0, 1, 2, 4, 5, 6, 7, 8]] == 0)


def test_render_psnet_microfacet():
    cfg = PSNetConfig(render_model="microfacet", mlp_width=32,
                      normal_mlp=False, visibility=False)
    params = init_psnet(jax.random.PRNGKey(0), cfg)
    pts, normals, mask, rays, ldirs, lints = _ps_inputs()
    out = render_psnet(params, cfg, pts, normals, mask, rays, ldirs, lints)
    assert out["rgb"].shape == (4, 6, 3)
    assert bool(jnp.all(jnp.isfinite(out["rgb"])))
