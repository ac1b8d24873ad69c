"""Cast-shadow coverage on a NON-convex scene (VERDICT round-1 item 3).

The pipeline's signature feature is shadow-aware inverse rendering
(stage1/model/rendering.py:378-408 visibility marching; stage-2 visibility
supervision, stage2/trainer.py:384-392). The snowman scene (two overlapping
spheres) has analytic cast shadows; these tests verify:
  1. the scene generator actually produces cast-shadowed pixels,
  2. marched `light_visibility` matches analytic ray-traced occlusion over a
     full image (< 5% disagreement),
  3. a short stage-2 training run LEARNS the cast shadows through the
     visibility MLP from the exported supervision.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psnerf_tpu.data.synthetic import (
    SNOWMAN_SPHERES,
    _trace_spheres,
    analytic_visibility,
    generate_synthetic_scene,
    write_stage1_exports,
)

HW = (48, 48)
N_LIGHTS = 6


def _snowman_spheres():
    return [(np.asarray(c, np.float64), r) for c, r in SNOWMAN_SPHERES]


def _snowman_occ(sharp=80.0):
    """Smooth occupancy of the sphere union: ~1 inside, ~0 outside."""
    centers = jnp.asarray([c for c, _ in SNOWMAN_SPHERES])
    radii = jnp.asarray([r for _, r in SNOWMAN_SPHERES])

    def occ(p):
        d = jnp.linalg.norm(p[:, None, :] - centers[None], axis=-1) - radii
        return jax.nn.sigmoid(-sharp * jnp.min(d, axis=-1))

    return occ


def _camera_and_surface(az=0.7, el=0.5, dist=3.0, focal=45.0):
    from psnerf_tpu.data.synthetic import _look_at

    eye = dist * np.asarray(
        [np.cos(az) * np.cos(el), np.sin(az) * np.cos(el), np.sin(el)]
    )
    pose_gl = _look_at(eye)
    pose_cv = pose_gl.copy()
    pose_cv[:3, 1:3] *= -1.0
    h, w = HW
    K = np.asarray(
        [[focal, 0, w / 2, 0], [0, focal, h / 2, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        np.float64,
    )
    hit, pts, nrm, _, sid = _trace_spheres(pose_cv, K, HW, _snowman_spheres())
    return hit, pts, nrm, sid


# steep downward/side lights that drive the top sphere's shadow onto the
# bottom sphere
SHADOW_LIGHTS = np.asarray(
    [
        [0.0, 0.0, 1.0],
        [0.4, 0.0, 0.9],
        [-0.3, 0.3, 0.9],
        [0.7, 0.1, 0.7],
    ]
)
SHADOW_LIGHTS /= np.linalg.norm(SHADOW_LIGHTS, axis=-1, keepdims=True)


def test_snowman_scene_has_cast_shadows():
    """Cast shadow := l . n > 0 (lit if convex) yet occluded by the OTHER
    sphere. The snowman must produce a meaningful number of such pixels."""
    hit, pts, nrm, sid = _camera_and_surface()
    vis = analytic_visibility(pts, nrm, sid, SHADOW_LIGHTS, _snowman_spheres())
    cos = np.einsum("li,hwi->lhw", SHADOW_LIGHTS, nrm)
    cast = (cos > 0.1) & (vis < 0.5) & hit[None]
    assert cast.sum() > 50, f"only {cast.sum()} cast-shadow pixels"
    # and plenty of lit pixels too
    lit = (cos > 0.1) & (vis > 0.5) & hit[None]
    assert lit.sum() > 200


def test_marched_visibility_matches_analytic_cast_shadows():
    """Full-image march through the occupancy union vs exact ray-traced
    occlusion: < 5% disagreement on surface pixels, and the marched values
    must be decisive (mostly near 0/1, not mid-gray)."""
    from psnerf_tpu.render import light_visibility

    sharp = 120.0
    hit, pts, nrm, sid = _camera_and_surface()
    vis_gt = analytic_visibility(pts, nrm, sid, SHADOW_LIGHTS, _snowman_spheres())
    surf_raw, nrm_h, sid_h = pts[hit], nrm[hit], sid[hit]

    # start marching slightly off the surface (the smooth occupancy edge has
    # finite alpha at the surface itself)
    surf = jnp.asarray(surf_raw, jnp.float32) + 0.02 * jnp.asarray(nrm_h, jnp.float32)
    vis_marched = np.asarray(
        jax.jit(
            lambda s: light_visibility(
                _snowman_occ(sharp), s, jnp.asarray(SHADOW_LIGHTS, jnp.float32),
                lnear=0.05, lfar=3.0, n_steps=320,
            )
        )(surf)
    )  # [L, Nsurf]

    gt = vis_gt[:, hit]  # [L, Nsurf]
    pred = (vis_marched > 0.5).astype(np.float32)
    disagree = np.mean(pred != gt)
    assert disagree < 0.05, f"marched-vs-analytic disagreement {disagree:.3%}"

    # Binary GT is undefined inside the smooth shell: a shadow ray passing
    # within ~3/sharp of the occluder legitimately absorbs. Pixels with clear
    # geometric margin — |shadow-ray clearance to every other sphere| > shell
    # width AND away from the terminator — must agree essentially perfectly;
    # disagreement there would be a real marching bug.
    clearance = np.full_like(gt, np.inf)
    for i, (c, r) in enumerate(_snowman_spheres()):
        oc = surf_raw - c  # [N, 3]
        for li, l in enumerate(SHADOW_LIGHTS):
            t_star = np.maximum(-(oc @ l), 0.0)
            dist = np.linalg.norm(oc + t_star[:, None] * l, axis=-1) - r
            dist = np.where(sid_h == i, np.inf, dist)
            clearance[li] = np.minimum(clearance[li], dist)
    cos = np.einsum("li,ni->ln", SHADOW_LIGHTS, nrm_h)
    clear = (np.abs(clearance) > 0.04) & (np.abs(cos) > 0.1)
    assert clear.mean() > 0.7  # the scene is mostly away from boundaries
    clear_disagree = np.mean(pred[clear] != gt[clear])
    assert clear_disagree < 0.005, (
        f"disagreement on clear-margin pixels {clear_disagree:.3%}"
    )

    # decisive: cast-shadowed pixels should march to ~0 transmittance
    cos = np.einsum("li,ni->ln", SHADOW_LIGHTS, nrm[hit])
    cast = (cos > 0.1) & (gt < 0.5)
    assert cast.sum() > 30
    assert np.median(vis_marched[cast]) < 0.1


def test_rescaled_visibility_march_cast_shadow_accuracy():
    """The export's half-cost visibility mode (64 steps rescaled to the
    per-ray box exit, marching.py light_visibility rescale=True) must match
    analytic CAST-shadow occlusion at least as well as the
    reference-faithful 128-step fixed grid it replaces."""
    from psnerf_tpu.render import light_visibility

    sharp = 120.0
    hit, pts, nrm, sid = _camera_and_surface()
    vis_gt = analytic_visibility(pts, nrm, sid, SHADOW_LIGHTS,
                                 _snowman_spheres())
    surf = jnp.asarray(pts[hit], jnp.float32) + 0.02 * jnp.asarray(
        nrm[hit], jnp.float32)
    ldir = jnp.asarray(SHADOW_LIGHTS, jnp.float32)
    gt = vis_gt[:, hit]

    err = {}
    for tag, kw in [("fixed128", dict(n_steps=128)),
                    ("rescaled64", dict(n_steps=64, rescale=True))]:
        vis = np.asarray(jax.jit(
            lambda s, kw=kw: light_visibility(
                _snowman_occ(sharp), s, ldir, lnear=0.05, lfar=3.5, **kw)
        )(surf))
        err[tag] = np.mean((vis > 0.5).astype(np.float32) != gt)
    # absolute errors here are dominated by the analytic shell's smooth
    # boundary band (binary GT is undefined inside it — see the clearance
    # analysis in the test above); what matters is the RANKING: the
    # half-cost rescaled march must be at least as accurate as the fixed
    # grid it replaces. Measured: fixed128 7.8%, rescaled64 6.6%
    # (rescaled128 4.3% beats even fixed320's 5.5%).
    assert err["fixed128"] < 0.09
    assert err["rescaled64"] <= err["fixed128"], err


@pytest.fixture(scope="module")
def snowman_scene(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("snowman"))
    generate_synthetic_scene(d, n_views=3, n_test=0, n_lights=N_LIGHTS, hw=HW,
                             focal=45.0, spheres=SNOWMAN_SPHERES, seed=5,
                             light_spread=0.9)
    write_stage1_exports(d, os.path.join(d, "exports"), n_vis_plus=8)
    return d


def test_snowman_exports_have_cast_shadows(snowman_scene):
    """The stage-1 export contract must carry the cast shadows into stage-2's
    supervision arrays."""
    vis = np.load(os.path.join(snowman_scene, "exports", "visibility",
                               "view_01.npy"))
    nrm = np.load(os.path.join(snowman_scene, "exports", "normal",
                               "view_01.npy"))
    mask = np.load(os.path.join(snowman_scene, "exports", "mask",
                                "view_01.npy"))
    import json

    with open(os.path.join(snowman_scene, "params.json")) as f:
        params = json.load(f)
    pose = np.asarray(params["pose_c2w"][0])
    l_world = np.einsum("ij,kj->ki", pose[:3, :3],
                        np.asarray(params["light_direction"]))
    cos = np.einsum("ki,ni->kn", l_world, nrm)
    cast = (cos > 0.1) & (vis.reshape(N_LIGHTS, -1) < 0.5) & mask[None]
    assert cast.sum() > 30, "exports carry no cast shadows"


def test_stage2_learns_cast_shadows(snowman_scene, tmp_path_factory):
    """Short stage-2 run with visibility supervision: the visibility MLP must
    separate cast-shadowed from lit surface points on a train view."""
    from psnerf_tpu.config import Stage2Config
    from psnerf_tpu.fields.psnet import PSNetConfig
    from psnerf_tpu.render import render_psnet
    from psnerf_tpu.runners.stage2 import Stage2Runner
    from psnerf_tpu.train.losses import Stage2LossWeights
    from psnerf_tpu.train.stage2 import Stage2TrainConfig

    cfg = Stage2Config(
        net=PSNetConfig(mlp_width=48, sg_mlp_width=16, normal_mlp_width=48,
                        vis_mlp_width=64, vis_mlp_depth=4, vis_mlp_skip_at=2,
                        n_freqs_xyz=6, normal_n_freqs_xyz=6,
                        light_int=1.2, xyz_jitter_std=0.01),
        train=Stage2TrainConfig(
            sg_learning_rate=2e-3, light_learning_rate=5e-4,
            train_order=True, warmup_iters=700,
            weights=Stage2LossWeights(vis_weight=1.0),
        ),
        data_dir=snowman_scene,
        stage1_shape_path=os.path.join(snowman_scene, "exports"),
        inten_normalize=None,
        light_bs=4, vis_train_num=4,
        num_pixels=1024, train_all_pixels=False,
        ckpt_freq=100000,
    )
    wd = str(tmp_path_factory.mktemp("snowman_wd"))
    runner = Stage2Runner(cfg, wd, resume=False)
    runner.train(800, log_every=400, ckpt_every=100000)

    # evaluate the trained visibility MLP on view-0 surface points under the
    # scene's own (world-frame) training lights
    d = runner.data
    pts = np.asarray(d["points"][0])
    nrm = np.asarray(d["normals"][0])
    mask = np.asarray(d["surface_mask"][0]).astype(bool)
    vis_gt = np.asarray(d["visibility"][0])  # [L, N]
    l_world = np.asarray(d["light_dirs"][0])  # [L, 3]

    out = render_psnet(
        runner.params["model"], cfg.net,
        jnp.asarray(pts), jnp.asarray(nrm), jnp.asarray(mask),
        jnp.asarray(np.zeros_like(pts)),  # rays only affect specular, not vis
        jnp.asarray(l_world), jnp.ones((len(l_world),)),
    )
    vis_pred = np.asarray(out["visibility"])[..., 0]  # [L, N]

    cos = np.einsum("li,ni->ln", l_world, nrm)
    cast = (cos > 0.15) & (vis_gt < 0.5) & mask[None]
    lit = (cos > 0.15) & (vis_gt > 0.5) & mask[None]
    assert cast.sum() > 30 and lit.sum() > 200

    acc_cast = np.mean(vis_pred[cast] < 0.5)
    acc_lit = np.mean(vis_pred[lit] > 0.5)
    assert acc_cast > 0.75, f"cast-shadow accuracy {acc_cast:.2%}"
    assert acc_lit > 0.85, f"lit accuracy {acc_lit:.2%}"
    # and the two populations must be separated in value, not just thresholded
    assert np.mean(vis_pred[lit]) - np.mean(vis_pred[cast]) > 0.3
