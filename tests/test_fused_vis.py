import jax
import jax.numpy as jnp
import numpy as np

from psnerf_tpu.core.encoding import nerf_embed
from psnerf_tpu.fields.mlp import skip_mlp_apply, skip_mlp_init
from psnerf_tpu.ops.fused_vis import fused_visibility


def test_fused_visibility_matches_reference_path():
    """Pallas kernel (interpret mode) vs the XLA skip-MLP on the reference
    vis-net topology (width 256, depth 8, skip@4, PE 10 octaves -> E=63)."""
    key = jax.random.PRNGKey(0)
    e = 63
    width, depth, skip = 256, 8, 4
    layers = skip_mlp_init(key, 2 * e, 1, width, depth, (skip,))

    n, l = 512, 12
    pts = jax.random.normal(jax.random.PRNGKey(1), (n, 3)) * 0.3
    ldirs = jax.random.normal(jax.random.PRNGKey(2), (l, 3))
    ldirs = ldirs / jnp.linalg.norm(ldirs, axis=-1, keepdims=True)
    point_emb = nerf_embed(pts, 10)
    light_emb = nerf_embed(ldirs, 10)

    # reference: concat per (light, point)
    def ref_one_light(le):
        x = jnp.concatenate(
            [point_emb, jnp.broadcast_to(le, (n, e))], axis=-1)
        return skip_mlp_apply(layers, x, (skip,), "none")[..., 0]

    ref = jax.vmap(ref_one_light)(light_emb)  # [L, N]

    out = fused_visibility(layers, point_emb, light_emb, tile=256,
                           interpret=True)
    assert out.shape == (l, n)
    # bf16 matmuls: relative tolerance ~1e-2
    err = np.abs(np.asarray(out) - np.asarray(ref))
    rel = err / (np.abs(np.asarray(ref)) + 1e-2)
    assert rel.max() < 0.05, f"max rel err {rel.max():.4f}"
    assert np.corrcoef(np.asarray(out).ravel(),
                       np.asarray(ref).ravel())[0, 1] > 0.999

def _shade_setup(l=12, n=512, specular_rgb=True):
    key = jax.random.PRNGKey(0)
    e = 63
    width, depth, skip = 256, 8, 4
    layers = skip_mlp_init(key, 2 * e, 1, width, depth, (skip,))
    ks = [jax.random.PRNGKey(i) for i in range(1, 9)]
    pts = jax.random.normal(ks[0], (n, 3)) * 0.3
    ldirs = jax.random.normal(ks[1], (l, 3))
    ldirs = ldirs / jnp.linalg.norm(ldirs, axis=-1, keepdims=True)
    normal = jax.random.normal(ks[2], (n, 3))
    normal = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)
    view = jax.random.normal(ks[3], (n, 3))
    view = view / jnp.linalg.norm(view, axis=-1, keepdims=True)
    albedo = jax.nn.sigmoid(jax.random.normal(ks[4], (n, 3)))
    nw = 27 if specular_rgb else 9
    weights = jax.nn.relu(jax.random.normal(ks[5], (n, nw)) * 0.3)
    mask = jax.random.uniform(ks[6], (n,)) > 0.3
    lints = jax.random.uniform(ks[7], (l,)) * 2.0 + 0.5
    return layers, pts, ldirs, normal, view, albedo, weights, mask, lints


def _shade_xla_reference(layers, pts, ldirs, normal, view, albedo, weights,
                         mask, lints, specular_rgb):
    """The exact math of render_psnet's shading branch (f32 XLA)."""
    from psnerf_tpu.fields.brdf import sg_basis

    n = pts.shape[0]
    point_emb = nerf_embed(pts, 10)

    def one_light(ldir, lint):
        lfull = jnp.broadcast_to(ldir, (n, 3))
        brdf, _ = sg_basis(v=view, n=normal, l=lfull, albedo=albedo,
                           weights=weights, specular_rgb=specular_rgb)
        cos = jnp.sum(lfull * normal, axis=-1, keepdims=True)
        light_emb = nerf_embed(lfull, 10)
        x = jnp.concatenate([point_emb, light_emb], axis=-1)
        vis = skip_mlp_apply(layers, x, (4,), "none")
        rgb = jnp.clip(brdf * lint * cos * jnp.clip(vis, 0, 1), 0.0, 1.0)
        return rgb

    rgb = jax.vmap(one_light)(ldirs, lints)          # [L, N, 3]
    return jnp.where(mask[None, :, None], rgb, 1.0)


def test_fused_vis_shade_matches_xla():
    (layers, pts, ldirs, normal, view, albedo,
     weights, mask, lints) = _shade_setup()
    from psnerf_tpu.ops.fused_vis import fused_vis_shade

    ref = _shade_xla_reference(layers, pts, ldirs, normal, view, albedo,
                               weights, mask, lints, True)
    out = fused_vis_shade(
        layers, nerf_embed(pts, 10), nerf_embed(ldirs, 10), normal, view,
        albedo, weights, mask, ldirs, lints,
        specular_rgb=True, tile=256, interpret=True)
    assert out.shape == ref.shape == (12, 512, 3)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    assert err.max() < 2e-2, f"max abs err {err.max():.4f}"
    assert err.mean() < 2e-3


def test_fused_vis_shade_scalar_specular():
    (layers, pts, ldirs, normal, view, albedo,
     weights, mask, lints) = _shade_setup(specular_rgb=False)
    from psnerf_tpu.ops.fused_vis import fused_vis_shade

    ref = _shade_xla_reference(layers, pts, ldirs, normal, view, albedo,
                               weights, mask, lints, False)
    out = fused_vis_shade(
        layers, nerf_embed(pts, 10), nerf_embed(ldirs, 10), normal, view,
        albedo, weights, mask, ldirs, lints,
        specular_rgb=False, tile=256, interpret=True)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    assert err.max() < 2e-2, f"max abs err {err.max():.4f}"


def test_fused_vis_shade_sum_lights():
    """sum_lights must equal the light-axis sum of the full rgb (including
    the ones-fill outside the surface mask counting only real lights)."""
    (layers, pts, ldirs, normal, view, albedo,
     weights, mask, lints) = _shade_setup()
    from psnerf_tpu.ops.fused_vis import fused_vis_shade

    full = fused_vis_shade(
        layers, nerf_embed(pts, 10), nerf_embed(ldirs, 10), normal, view,
        albedo, weights, mask, ldirs, lints,
        specular_rgb=True, tile=256, interpret=True)
    s = fused_vis_shade(
        layers, nerf_embed(pts, 10), nerf_embed(ldirs, 10), normal, view,
        albedo, weights, mask, ldirs, lints,
        specular_rgb=True, sum_lights=True, tile=256, interpret=True)
    np.testing.assert_allclose(np.asarray(s), np.asarray(full).sum(0),
                               rtol=1e-4, atol=1e-4)


def test_fused_vis_shade_per_channel_intensity():
    """[L, 3] per-channel intensities (envmap texels) broadcast correctly."""
    (layers, pts, ldirs, normal, view, albedo,
     weights, mask, lints) = _shade_setup()
    from psnerf_tpu.ops.fused_vis import fused_vis_shade

    lints3 = jnp.stack([lints, lints * 0.5, lints * 0.25], axis=-1)
    out = fused_vis_shade(
        layers, nerf_embed(pts, 10), nerf_embed(ldirs, 10), normal, view,
        albedo, weights, mask, ldirs, lints3,
        specular_rgb=True, tile=256, interpret=True)
    ref = _shade_xla_reference(layers, pts, ldirs, normal, view, albedo,
                               weights, mask, lints3, True)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    assert err.max() < 2e-2, f"max abs err {err.max():.4f}"

def test_frame_renderer_fused_shade_parity():
    """render_frame_stage2(use_fused_vis=True) takes the single-kernel
    vis+shade path for rgb/rgb_sum outputs and matches the streaming XLA
    path (CPU: kernels run interpreted via fused_interpret=True — the
    explicit plumbing, not a monkeypatched partial the call site's own
    kwargs would override)."""
    from psnerf_tpu.eval.frame import render_frame_stage2
    from psnerf_tpu.fields.psnet import PSNetConfig, init_psnet

    cfg = PSNetConfig()
    params = init_psnet(jax.random.PRNGKey(0), cfg)
    n = 512
    ks = [jax.random.PRNGKey(i) for i in range(1, 9)]
    uv = jnp.stack(jnp.meshgrid(jnp.arange(16.0), jnp.arange(32.0),
                                indexing="ij"), -1).reshape(-1, 2)
    pose = jnp.eye(4).at[:3, 3].set(jnp.asarray([0.0, 0.0, -3.0]))
    K = jnp.asarray([[50.0, 0, 8, 0], [0, 50.0, 16, 0],
                     [0, 0, 1, 0], [0, 0, 0, 1.0]])
    pts = jax.random.normal(ks[0], (n, 3)) * 0.3
    nrm = jax.random.normal(ks[1], (n, 3))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    mask = jax.random.uniform(ks[2], (n,)) > 0.3
    ldirs = jax.random.normal(ks[3], (5, 3))
    ldirs = ldirs / jnp.linalg.norm(ldirs, axis=-1, keepdims=True)
    lints = jnp.full((5,), 1.7)

    args = (params, cfg, uv, pose, K, pts, nrm, mask, ldirs, lints)
    outs = ("rgb", "rgb_sum", "albedo", "normal_pred")
    ref = render_frame_stage2(*args, tile=256, outputs=outs,
                              use_fused_vis=False)
    got = render_frame_stage2(*args, tile=256, outputs=outs,
                              use_fused_vis=True, fused_interpret=True)
    assert set(got) == set(ref)
    assert got["rgb"].shape == ref["rgb"].shape == (5, n, 3)
    err = np.abs(np.asarray(got["rgb"]) - np.asarray(ref["rgb"]))
    assert err.max() < 2e-2, f"rgb max err {err.max():.4f}"
    np.testing.assert_allclose(np.asarray(got["rgb_sum"]),
                               np.asarray(got["rgb"]).sum(0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got["albedo"]),
                               np.asarray(ref["albedo"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["normal_pred"]),
                               np.asarray(ref["normal_pred"]), atol=1e-5)

def test_frame_renderer_rgb_cnl_layouts():
    """rgb_cnl is rgb in channel-major [3, N, L] layout — identical values —
    from both the fused-shade path and the streaming path."""
    from psnerf_tpu.eval.frame import render_frame_stage2
    from psnerf_tpu.fields.psnet import PSNetConfig, init_psnet

    cfg = PSNetConfig()
    params = init_psnet(jax.random.PRNGKey(0), cfg)
    n = 512
    ks = [jax.random.PRNGKey(i) for i in range(1, 9)]
    uv = jnp.stack(jnp.meshgrid(jnp.arange(16.0), jnp.arange(32.0),
                                indexing="ij"), -1).reshape(-1, 2)
    pose = jnp.eye(4).at[:3, 3].set(jnp.asarray([0.0, 0.0, -3.0]))
    K = jnp.asarray([[50.0, 0, 8, 0], [0, 50.0, 16, 0],
                     [0, 0, 1, 0], [0, 0, 0, 1.0]])
    pts = jax.random.normal(ks[0], (n, 3)) * 0.3
    nrm = jax.random.normal(ks[1], (n, 3))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    mask = jax.random.uniform(ks[2], (n,)) > 0.3
    ldirs = jax.random.normal(ks[3], (5, 3))
    ldirs = ldirs / jnp.linalg.norm(ldirs, axis=-1, keepdims=True)
    lints = jnp.full((5,), 1.7)
    args = (params, cfg, uv, pose, K, pts, nrm, mask, ldirs, lints)

    fused = render_frame_stage2(*args, tile=256, outputs=("rgb_cnl", "rgb_sum"),
                                use_fused_vis=True, fused_interpret=True)
    stream = render_frame_stage2(*args, tile=256,
                                 outputs=("rgb", "rgb_cnl", "rgb_sum"),
                                 use_fused_vis=False)
    assert fused["rgb_cnl"].shape == (3, n, 5)
    # cnl == moveaxis(rgb) on the streaming path (exact)
    np.testing.assert_allclose(
        np.asarray(stream["rgb_cnl"]),
        np.moveaxis(np.asarray(stream["rgb"]), (0, 1, 2), (2, 1, 0)))
    # fused vs streaming values agree to bf16 tolerance
    err = np.abs(np.asarray(fused["rgb_cnl"]) - np.asarray(stream["rgb_cnl"]))
    assert err.max() < 2e-2
    np.testing.assert_allclose(
        np.asarray(fused["rgb_sum"]),
        np.asarray(fused["rgb_cnl"]).sum(-1).T, atol=1e-4)

def test_fused_vis_shade_single_light():
    """L=1 with light_pairs=4: the pairing loop reads only padded rows past
    row 0; the real lane must still be exact."""
    (layers, pts, ldirs, normal, view, albedo,
     weights, mask, lints) = _shade_setup(l=1)
    from psnerf_tpu.ops.fused_vis import fused_vis_shade

    ref = _shade_xla_reference(layers, pts, ldirs, normal, view, albedo,
                               weights, mask, lints, True)
    out = fused_vis_shade(
        layers, nerf_embed(pts, 10), nerf_embed(ldirs, 10), normal, view,
        albedo, weights, mask, ldirs, lints,
        specular_rgb=True, tile=256, interpret=True)
    assert out.shape == (1, 512, 3)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    assert err.max() < 2e-2, f"max abs err {err.max():.4f}"

def test_fused_vis_shade_antipodal_lights_finite():
    """Envmap relighting feeds lights from EVERY direction, including ones
    nearly antipodal to the view vector, where l.v rounds below -1 and a
    naive sqrt(2 + 2 l.v) is NaN (this rendered as black speckle on TPU).
    The kernel must stay finite and match XLA away from the degeneracy."""
    (layers, pts, ldirs, normal, view, albedo,
     weights, mask, lints) = _shade_setup(l=8)
    from psnerf_tpu.ops.fused_vis import fused_vis_shade

    # make light 0 exactly antipodal to every view vector is impossible for
    # varying v; instead aim it against the mean view dir and ALSO test the
    # exact per-point antipode by constant v
    view_const = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0]), view.shape)
    ldirs = ldirs.at[0].set(jnp.asarray([0.0, 0.0, -1.0]))  # l = -v exactly

    out = fused_vis_shade(
        layers, nerf_embed(pts, 10), nerf_embed(ldirs, 10), normal,
        view_const, albedo, weights, mask, ldirs, lints,
        specular_rgb=True, tile=256, interpret=True)
    assert np.isfinite(np.asarray(out)).all(), "NaN/inf in fused rgb"
    s = fused_vis_shade(
        layers, nerf_embed(pts, 10), nerf_embed(ldirs, 10), normal,
        view_const, albedo, weights, mask, ldirs, lints,
        specular_rgb=True, sum_lights=True, tile=256, interpret=True)
    assert np.isfinite(np.asarray(s)).all(), "NaN/inf in fused rgb_sum"
    # non-degenerate lights still match the XLA reference
    ref = _shade_xla_reference(layers, pts, ldirs, normal, view_const,
                               albedo, weights, mask, lints, True)
    err = np.abs(np.asarray(out)[1:] - np.asarray(ref)[1:])
    assert err.max() < 2e-2, f"max abs err {err.max():.4f}"
