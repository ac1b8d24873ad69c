"""Mesh vertex refinement + multi-view silhouette carving.

refine_mesh: RMSprop on vertex positions pulling random face samples onto the
occupancy iso-level while aligning face normals with field gradients
(reference stage1/model/extracting.py:237-323). JAX-native: one jitted step,
faces subsampled per step with a fixed batch.

mask_carver: multi-view projection test with dilated masks for carving the
occupancy grid before marching (extracting.py:326-377).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage


def refine_mesh(
    occ_fn: Callable,          # [M,3] -> occupancy prob in [0,1] (differentiable)
    vertices: np.ndarray,
    faces: np.ndarray,
    steps: int = 100,
    faces_per_step: int = 10_000,
    lr: float = 1e-5,
    threshold: float = 0.5,
    normal_weight: float = 0.01,
    seed: int = 0,
) -> np.ndarray:
    """Returns refined vertices. Loss per sampled face point p (Dirichlet
    barycentric sample): (occ(p) - tau)^2 + w * ||n_face - n_field||^2."""
    v = jnp.asarray(vertices, jnp.float32)
    f = jnp.asarray(faces, jnp.int32)
    n_faces = f.shape[0]
    fb = min(faces_per_step, n_faces)

    def loss_fn(v, key):
        kf, kb = jax.random.split(key)
        idx = jax.random.choice(kf, n_faces, (fb,), replace=n_faces < fb)
        tri = v[f[idx]]  # [fb, 3, 3]
        eps = jax.random.dirichlet(kb, jnp.full((3,), 0.5), (fb,))
        p = jnp.sum(tri * eps[:, :, None], axis=1)  # [fb, 3]

        face_n = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 1])
        face_n = face_n / (jnp.linalg.norm(face_n, axis=-1, keepdims=True) + 1e-10)

        # per-point field gradient for the normal target (extracting.py:300)
        g = jax.vmap(jax.grad(lambda q: occ_fn(q[None])[0]))(p)
        target_n = -g / (jnp.linalg.norm(g, axis=-1, keepdims=True) + 1e-10)

        occ_vals = occ_fn(p)
        loss_t = jnp.mean((occ_vals - threshold) ** 2)
        loss_n = jnp.mean(jnp.sum((face_n - target_n) ** 2, axis=-1))
        return loss_t + normal_weight * loss_n

    @jax.jit
    def step(v, ms, key):
        g = jax.grad(loss_fn)(v, key)
        ms = 0.99 * ms + 0.01 * g * g            # RMSprop (torch alpha=0.99)
        v = v - lr * g / (jnp.sqrt(ms) + 1e-8)
        return v, ms

    ms = jnp.zeros_like(v)
    key = jax.random.PRNGKey(seed)
    for i in range(steps):
        key, k = jax.random.split(key)
        v, ms = step(v, ms, k)
    return np.asarray(v)


def make_mask_carver(
    masks: np.ndarray,          # [V, H, W] float 0/1
    camera_mats: np.ndarray,    # [V, 4, 4] intrinsics
    world_mats: np.ndarray,     # [V, 4, 4] world->camera ... see note
    dilate_radius: int = 12,
):
    """Returns points[N,3] -> keep[N] bool: a point survives iff it projects
    inside every view's dilated mask and inside at least one image
    (extracting.py:326-377). Projection: proj = K @ w2c @ p, normalized by
    row 2 to the reference's [-1, 1] screen convention."""
    struct = _disk(dilate_radius)
    dil = np.stack([
        ndimage.binary_dilation(m > 0.5, structure=struct) for m in masks
    ]).astype(np.float32)
    h, w = masks.shape[1:]

    # fold K @ w2c once per view; dense-grid carving (512^3 = 134M points)
    # runs chunked in float32 so per-view temporaries stay small instead of
    # materializing a dozen full-grid arrays per view
    proj_mats = np.stack([
        (camera_mats[vi] @ world_mats[vi]).astype(np.float32)
        for vi in range(len(masks))])
    chunk = 1 << 22

    def carve(points: np.ndarray) -> np.ndarray:
        n = points.shape[0]
        out = np.empty((n,), bool)
        for s in range(0, n, chunk):
            pts = np.asarray(points[s:s + chunk], np.float32)
            keep = np.ones((len(pts),), bool)
            inside_any = np.zeros((len(pts),), bool)
            for vi in range(len(dil)):
                pm = proj_mats[vi]
                proj = pts @ pm[:3, :3].T + pm[:3, 3]
                xy = proj[:, :2] / proj[:, 2:3]    # [-1, 1] convention
                inside = ((xy[:, 0] >= -1) & (xy[:, 0] <= 1)
                          & (xy[:, 1] >= -1) & (xy[:, 1] <= 1))
                inside_any |= inside
                px = ((xy[:, 0] + 1) * (w - 1) * 0.5).astype(np.int64)
                py = ((xy[:, 1] + 1) * (h - 1) * 0.5).astype(np.int64)
                occ = dil[vi][py.clip(0, h - 1), px.clip(0, w - 1)]
                keep &= np.where(inside, occ >= 0.5, True)
            out[s:s + chunk] = inside_any & keep
        return out

    return carve


def pixel_to_ndc_camera(K: np.ndarray, h: int, w: int) -> np.ndarray:
    """Fold the pixel->[-1,1] screen map into a pixel-space intrinsics matrix
    so it can be used as `camera_mats` in make_mask_carver (the carver's
    projection is the reference's NDC convention, extracting.py:350-368;
    its inverse pixel map is px = (x + 1)(w - 1) / 2)."""
    ndc = np.eye(4, dtype=np.float32)
    ndc[0, 0], ndc[0, 2] = 2.0 / (w - 1), -1.0
    ndc[1, 1], ndc[1, 2] = 2.0 / (h - 1), -1.0
    k44 = np.eye(4, dtype=np.float32)
    k44[:3, :3] = np.asarray(K, np.float32)[:3, :3]
    return ndc @ k44


def _disk(r: int) -> np.ndarray:
    y, x = np.mgrid[-r:r + 1, -r:r + 1]
    return (x * x + y * y <= r * r)
