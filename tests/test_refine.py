import jax
import jax.numpy as jnp
import numpy as np

from psnerf_tpu.mesh import (
    extract_mesh,
    make_mask_carver,
    refine_mesh,
    surface_distance,
)


def sphere_occ_jnp(p, r=0.6, sharp=30.0):
    return jax.nn.sigmoid(-sharp * (jnp.linalg.norm(p, axis=-1) - r))


def test_refine_mesh_pulls_to_surface():
    """Extract at coarse resolution (vertices off the true surface), refine
    against the smooth analytic occupancy -> vertex radii tighten around r."""
    v, t = extract_mesh(lambda p: 0.6 - np.linalg.norm(p, axis=-1),
                        resolution0=8, upsampling_steps=0, padding=0.4)
    # perturb vertices so there is something to recover
    rng = np.random.default_rng(0)
    v_noisy = v + rng.normal(0, 0.02, v.shape)
    before = np.abs(np.linalg.norm(v_noisy, axis=-1) - 0.6).mean()
    v_ref = refine_mesh(sphere_occ_jnp, v_noisy, t, steps=150,
                        faces_per_step=2048, lr=3e-4)
    after = np.abs(np.linalg.norm(v_ref, axis=-1) - 0.6).mean()
    assert after < before * 0.6, (before, after)


def test_surface_distance():
    v1, t1 = extract_mesh(lambda p: 0.6 - np.linalg.norm(p, axis=-1),
                          resolution0=16, upsampling_steps=1)
    v2, t2 = extract_mesh(lambda p: 0.5 - np.linalg.norm(p, axis=-1),
                          resolution0=16, upsampling_steps=1)
    np.testing.assert_allclose(surface_distance(v1, t1, v2, t2, 2000), 0.1,
                               atol=0.01)


def test_mask_carver_keeps_visible_region():
    """One camera looking +z at the origin: points inside the projected mask
    disc survive; points far off-axis are carved."""
    h = w = 64
    mask = np.zeros((h, w), np.float32)
    ys, xs = np.mgrid[0:h, 0:w]
    mask[(ys - 32) ** 2 + (xs - 32) ** 2 < 12**2] = 1.0

    # screen convention: proj = K @ w2c @ p normalized to [-1, 1]
    # build K mapping camera coords to [-1,1]: x_ndc = fx * X/Z
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 2.0  # f chosen so +-0.5 world maps inside
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 3.0  # camera at z=-3 looking +z

    carve = make_mask_carver(mask[None], K[None], w2c[None], dilate_radius=2)
    pts = np.asarray([
        [0.0, 0.0, 0.0],     # center: inside mask
        [0.05, 0.0, 0.0],    # near center
        [1.2, 0.0, 0.0],     # off-axis: outside the mask disc
    ], np.float32)
    keep = carve(pts)
    assert keep[0] and keep[1] and not keep[2]


def test_mask_carver_pixel_intrinsics():
    """pixel_to_ndc_camera folds a pixel-space K into the carver's [-1,1]
    convention: with a real perspective camera (f=1.6*W, principal point at
    the image center — the synthetic-scene rig) points on the observed
    sphere survive and points outside every silhouette are carved. Guards
    the extract_mesh_to(mask_carve=True) path, which passes the dataset's
    pixel K (regression: the raw pixel K projected everything outside
    [-1,1], carving the whole grid to empty)."""
    from psnerf_tpu.mesh.refine import pixel_to_ndc_camera

    h = w = 96
    f, c = 1.6 * w, (w - 1) / 2.0
    K = np.asarray([[f, 0, c], [0, f, c], [0, 0, 1]], np.float32)
    # camera at z=-2.5 (CV: +z forward into the scene), looking at origin
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 2.5
    # silhouette of a radius-0.3 sphere at the origin: project a point grid
    ys, xs = np.mgrid[0:h, 0:w]
    r_px = f * 0.3 / 2.5  # small-angle silhouette radius in pixels
    mask = (((ys - c) ** 2 + (xs - c) ** 2) < r_px**2).astype(np.float32)

    carve = make_mask_carver(mask[None], pixel_to_ndc_camera(K, h, w)[None],
                             w2c[None], dilate_radius=2)
    rng = np.random.default_rng(1)
    on = rng.normal(size=(500, 3))
    on = (0.28 * on / np.linalg.norm(on, axis=1, keepdims=True)).astype(
        np.float32)
    assert carve(on).all()
    # off-axis points outside the silhouette cone (a point BETWEEN sphere
    # and camera on the axis is inside the cone and rightly survives —
    # silhouette carving is a visual hull)
    off = np.asarray([[0.8, 0.0, 0.0], [0.0, -0.9, 0.2], [0.0, 0.5, 0.5]],
                     np.float32)
    assert not carve(off).any()


def test_extract_mesh_carve_removes_offaxis_floater():
    """End-to-end extract_mesh(mask_carve=...): a field with the real
    surface plus a spurious blob outside the camera frustum extracts WITH
    the blob uncarved and WITHOUT it carved, and the carved surface matches
    the analytic radius (the reference's extracting.py:120-126 semantics:
    carved grid cells are driven to -30 before marching)."""
    from psnerf_tpu.mesh.refine import pixel_to_ndc_camera

    def field(p):
        d_sphere = 0.35 - np.linalg.norm(p, axis=-1)
        d_blob = 0.12 - np.linalg.norm(
            p - np.asarray([0.9, 0.0, 0.0]), axis=-1)
        return np.maximum(d_sphere, d_blob)

    h = w = 128
    f, c = 1.6 * w, (w - 1) / 2.0
    K = np.asarray([[f, 0, c], [0, f, c], [0, 0, 1]], np.float32)
    ys, xs = np.mgrid[0:h, 0:w]
    r_px = f * 0.35 / 2.5
    mask = (((ys - c) ** 2 + (xs - c) ** 2) < r_px**2).astype(np.float32)
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 2.5
    carver = make_mask_carver(mask[None], pixel_to_ndc_camera(K, h, w)[None],
                              w2c[None], dilate_radius=3)

    v0, _ = extract_mesh(field, resolution0=24, upsampling_steps=1)
    assert v0[:, 0].max() > 0.8  # blob surfaces without carving
    v1, _ = extract_mesh(field, resolution0=24, upsampling_steps=1,
                         mask_carve=carver)
    assert v1[:, 0].max() < 0.5  # blob carved away
    r = np.linalg.norm(v1, axis=1)
    np.testing.assert_allclose(r.mean(), 0.35, atol=0.02)


def test_carve_dense_grid_matches_points_interface():
    """carve_dense_grid (device-generated grid coords, packed-bit fetch) must
    agree with the points interface everywhere except 1-ulp pixel-truncation
    boundaries (the device generates grid coords in f32; host linspace rounds
    through f64 — coordinate deltas are <= 1 ulp, so only points whose
    projection lands exactly on a pixel boundary may flip)."""
    import numpy as np

    from psnerf_tpu.mesh.refine import make_mask_carver, pixel_to_ndc_camera

    h = w = 64
    mask = np.zeros((h, w), np.float32)
    mask[16:48, 20:44] = 1
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 60
    K[0, 2] = K[1, 2] = 32
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 3.0
    carver = make_mask_carver(mask[None], pixel_to_ndc_camera(K, h, w)[None],
                              w2c[None], dilate_radius=2)
    n, box = 33, 2.4
    lin = np.linspace(-0.5, 0.5, n)
    g = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1)
    pts = (box * g).reshape(-1, 3).astype(np.float32)
    a = carver(pts).reshape(n, n, n)
    b = carver.carve_dense_grid(n, box)
    mismatch = (a != b).mean()
    assert mismatch < 2e-3, f"grid/points carve disagree on {mismatch:.2%}"
