"""Synthetic dataset generator emitting the reference's on-disk contract
(README.md:172-220): params.json, img/<view>/<light>.png, mask/, norm_mask/,
normal/npy/, sdps_out*/ (outnpy normals + light preds), img*/avg*/ averages.

Scene: a Lambertian+specular sphere of radius R at the origin, ray-traced
analytically. Used by tests and pipeline smoke-runs — no external downloads.
"""

from __future__ import annotations

import json
import os

import imageio.v2 as imageio
import numpy as np


def _look_at(eye: np.ndarray) -> np.ndarray:
    """OpenGL c2w pose: camera at eye, looking at the origin (z-axis points
    AWAY from the target, x right, y up)."""
    fwd = eye / np.linalg.norm(eye)          # OpenGL: -z is view dir
    up = np.asarray([0.0, 0.0, 1.0])
    if abs(fwd @ up) > 0.99:
        up = np.asarray([0.0, 1.0, 0.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 0] = right
    pose[:3, 1] = up
    pose[:3, 2] = fwd
    pose[:3, 3] = eye
    return pose


def _trace_sphere(pose_cv, K, hw, radius):
    """Ray-trace the sphere: returns (hit mask [H,W], points [H,W,3],
    normals_world [H,W,3], depth)."""
    h, w = hw
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    d_cam = np.stack([(xs - cx) / fx, (ys - cy) / fy, np.ones_like(xs)], -1)
    d_world = np.einsum("ij,hwj->hwi", pose_cv[:3, :3], d_cam)
    d_world /= np.linalg.norm(d_world, axis=-1, keepdims=True)
    o = pose_cv[:3, 3]
    b = np.einsum("hwi,i->hw", d_world, o)
    c = o @ o - radius**2
    disc = b**2 - c
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0))
    hit &= t > 0
    pts = o[None, None] + d_world * t[..., None]
    nrm = pts / radius
    return hit, pts, nrm, d_world


def generate_synthetic_scene(
    outdir: str,
    n_views: int = 4,
    n_test: int = 1,
    n_lights: int = 8,
    hw: tuple = (64, 64),
    radius: float = 0.6,
    cam_dist: float = 3.0,
    focal: float = 80.0,
    light_int: float = 1.2,
    seed: int = 0,
    specular: float = 0.3,
) -> dict:
    """Writes the dataset; returns the params dict."""
    rng = np.random.default_rng(seed)
    h, w = hw
    total = n_views + n_test
    K = np.asarray(
        [[focal, 0, w / 2, 0], [0, focal, h / 2, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        np.float32,
    )

    # camera ring with elevation jitter
    poses_gl = []
    for i in range(total):
        az = 2 * np.pi * i / total
        el = 0.35 + 0.15 * np.sin(2.1 * i)
        eye = cam_dist * np.asarray(
            [np.cos(az) * np.cos(el), np.sin(az) * np.cos(el), np.sin(el)]
        )
        poses_gl.append(_look_at(eye))
    poses_gl = np.asarray(poses_gl)

    # shared per-view light directions in CAMERA frame (light_is_same=True),
    # pointing from surface toward the light, biased toward the camera (-z in
    # OpenGL camera coords means "behind the camera" is +z... lights roughly
    # along the optical axis with offsets)
    lights_cam = rng.normal(size=(n_lights, 3)) * 0.35 + np.asarray([0, 0, 1.0])
    lights_cam /= np.linalg.norm(lights_cam, axis=-1, keepdims=True)

    params = {
        "n_view": total,
        "view_train": list(range(n_views)),
        "view_test": list(range(n_views, total)),
        "K": K.tolist(),
        "pose_c2w": poses_gl.tolist(),
        "imhw": [h, w],
        "light_is_same": True,
        "light_direction": lights_cam.tolist(),
        "gt_normal_world": False,
        "obj_name": "synth_sphere",
    }

    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "params.json"), "w") as f:
        json.dump(params, f)

    for sub in ["mask", "norm_mask", "normal/npy",
                f"sdps_out_l{n_lights}/outnpy"]:
        os.makedirs(os.path.join(outdir, sub), exist_ok=True)

    sdps = f"sdps_out_l{n_lights}"
    to8 = lambda x: (np.clip(x, 0, 1) * 255).astype(np.uint8)

    for vi in range(total):
        pose_gl = poses_gl[vi]
        pose_cv = pose_gl.copy()
        pose_cv[:3, 1:3] *= -1.0
        hit, pts, nrm, view_dir = _trace_sphere(pose_cv, K, hw, radius)

        imageio.imwrite(os.path.join(outdir, "mask", f"view_{vi + 1:02d}.png"),
                        to8(hit.astype(np.float64)))
        imageio.imwrite(os.path.join(outdir, "norm_mask", f"view_{vi + 1:02d}.png"),
                        to8(hit.astype(np.float64)))

        # normals: camera-frame (OpenGL rotation transpose), gt_normal_world=False
        n_cam = np.einsum("ji,hwj->hwi", pose_gl[:3, :3], nrm)
        np.save(os.path.join(outdir, "normal", "npy", f"view_{vi + 1:02d}.npy"),
                (n_cam * hit[..., None]).astype(np.float32))
        # SDPS "predictions" = GT normals (+ small noise)
        np.save(os.path.join(outdir, sdps, "outnpy", f"view_{vi + 1:02d}.npy"),
                (n_cam * hit[..., None]).astype(np.float32))

        # albedo pattern on the sphere
        albedo = 0.45 + 0.25 * np.stack(
            [np.sin(4 * pts[..., 0]), np.cos(4 * pts[..., 1]),
             np.sin(4 * pts[..., 2])], -1)

        img_dir = os.path.join(outdir, "img", f"view_{vi + 1:02d}")
        avg_dir = os.path.join(outdir, "img", f"avg_l{n_lights}")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(avg_dir, exist_ok=True)
        acc = np.zeros((h, w, 3))
        l_world = np.einsum("ij,kj->ki", pose_gl[:3, :3], lights_cam)
        for li in range(n_lights):
            cos = np.maximum(np.einsum("hwi,i->hw", nrm, l_world[li]), 0.0)
            half = l_world[li][None, None] - view_dir
            half /= np.maximum(np.linalg.norm(half, axis=-1, keepdims=True), 1e-9)
            spec = specular * np.maximum(
                np.einsum("hwi,hwi->hw", half, nrm), 0.0) ** 32
            rgb = (albedo + spec[..., None]) * light_int * cos[..., None]
            rgb = np.clip(rgb, 0, 1) * hit[..., None]
            imageio.imwrite(os.path.join(img_dir, f"{li + 1:03d}.png"), to8(rgb))
            acc += rgb
        avg = acc / n_lights + (1.0 - hit[..., None])  # white background average
        imageio.imwrite(os.path.join(avg_dir, f"view_{vi + 1:02d}.png"), to8(avg))

    # SDPS light predictions: camera-frame dirs + intensities per view
    np.save(os.path.join(outdir, sdps, "light_direction_pred.npy"),
            np.tile(lights_cam[None], (total, 1, 1)).astype(np.float32))
    np.save(os.path.join(outdir, sdps, "light_intensity_pred.npy"),
            np.full((total, n_lights), light_int, np.float32))
    return params


def write_stage1_exports(
    scene_dir: str,
    export_dir: str,
    n_vis_plus: int = 8,
    seed: int = 1,
) -> None:
    """Emit analytic ground-truth versions of the stage-1 shape exports
    (points/normal/mask/visibility/vis_plus per view; the contract of
    stage1/shape_extract.py:148-163) so stage-2 can run standalone.

    Visibility uses the convex-body closed form: a surface point sees a
    light direction iff l . n >= 0.
    """
    rng = np.random.default_rng(seed)
    with open(os.path.join(scene_dir, "params.json")) as f:
        params = json.load(f)
    K = np.asarray(params["K"], np.float32)
    poses_gl = np.asarray(params["pose_c2w"], np.float32)
    h, w = params["imhw"]
    lights_cam = np.asarray(params["light_direction"], np.float32)
    radius = 0.6

    for sub in ["points", "normal", "mask", "visibility", "vis_plus"]:
        os.makedirs(os.path.join(export_dir, sub), exist_ok=True)

    vp_json = {}
    for vi in range(params["n_view"]):
        pose_gl = poses_gl[vi]
        pose_cv = pose_gl.copy()
        pose_cv[:3, 1:3] *= -1.0
        hit, pts, nrm, _ = _trace_sphere(pose_cv, K, (h, w), radius)
        pts_flat = (pts * hit[..., None]).reshape(-1, 3).astype(np.float32)
        nrm_flat = (nrm * hit[..., None]).reshape(-1, 3).astype(np.float32)
        np.save(os.path.join(export_dir, "points", f"view_{vi + 1:02d}.npy"), pts_flat)
        np.save(os.path.join(export_dir, "normal", f"view_{vi + 1:02d}.npy"), nrm_flat)
        np.save(os.path.join(export_dir, "mask", f"view_{vi + 1:02d}.npy"),
                hit.reshape(-1))
        l_world = np.einsum("ij,kj->ki", pose_gl[:3, :3], lights_cam)
        vis = (np.einsum("ki,ni->kn", l_world, nrm_flat) >= 0).astype(np.float32)
        np.save(os.path.join(export_dir, "visibility", f"view_{vi + 1:02d}.npy"), vis)

        vp = rng.normal(size=(n_vis_plus, 3))
        vp /= np.linalg.norm(vp, axis=-1, keepdims=True)
        vp_json[f"view_{vi + 1:02d}"] = vp.tolist()
        vis_p = (np.einsum("ki,ni->kn", vp, nrm_flat) >= 0).astype(np.float32)
        np.save(os.path.join(export_dir, "vis_plus", f"view_{vi + 1:02d}.npy"), vis_p)

    with open(os.path.join(export_dir, "vis_plus", "light_dir.json"), "w") as f:
        json.dump(vp_json, f)
