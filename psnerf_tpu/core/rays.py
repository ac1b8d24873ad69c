"""Camera / ray math. Pure jnp, fully vmappable.

Conventions (ported as tested utilities per SURVEY.md §7 "conventions minefield"):
  * stage1 pixel->ray: p_trans = (pix - c) / f; ray = R_c2w @ [p_trans, 1]
    (stage1/model/common.py:210-226). Camera origin = world_mat[:3, 3]
    (common.py:205-207).
  * stage2 pixel->ray: lift through full intrinsics (fx, fy, cx, cy), rotate by
    pose[:3,:3], L2-normalize (stage2/utils/rend_util.py:90-147). Poses are
    OpenCV-convention c2w (the dataset flips OpenGL -> OpenCV by negating
    columns 1:3 of the rotation, stage2/datasets/dataset.py:53).
  * sphere intersection returns (near, far) depths clamped to >= 0 and an
    intersect mask (stage1/model/rendering.py:576-595).
"""

from __future__ import annotations

import jax.numpy as jnp


def origin_to_world(n_points: int, world_mat: jnp.ndarray) -> jnp.ndarray:
    """Camera origin broadcast over rays. world_mat: [4,4] c2w. -> [n_points, 3].

    Reference: stage1/model/common.py:205-207.
    """
    return jnp.broadcast_to(world_mat[:3, -1], (n_points, 3))


def image_points_to_ray(
    image_points: jnp.ndarray, camera_mat: jnp.ndarray, world_mat: jnp.ndarray
) -> jnp.ndarray:
    """Pixel coordinates -> un-normalized world ray directions.

    image_points: [N, 2] (x, y) pixels; camera_mat: [3|4, 3|4] intrinsics
    (single focal f = K[0,0], principal point K[:2,2]); world_mat: [4,4] c2w.
    Reference: stage1/model/common.py:210-226.
    """
    p = (image_points - camera_mat[:2, 2]) / camera_mat[0, 0]  # [N, 2]
    p = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)  # [N, 3]
    return jnp.einsum("ij,nj->ni", world_mat[:3, :3], p)


def lift(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray, intrinsics: jnp.ndarray):
    """Pixel -> camera-space homogeneous point (stage2/utils/rend_util.py:132-147)."""
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    x_lift = (x - cx) / fx * z
    y_lift = (y - cy) / fy * z
    return jnp.stack([x_lift, y_lift, z, jnp.ones_like(z)], axis=-1)


def get_camera_params(uv: jnp.ndarray, pose: jnp.ndarray, intrinsics: jnp.ndarray):
    """Unit ray directions + camera location from pixel coords.

    uv: [N, 2]; pose: [4,4] c2w (OpenCV) or [7] quaternion+translation;
    intrinsics: [3|4, 3|4]. Returns (ray_dirs [N,3] unit-norm, cam_loc [3]).
    Reference: stage2/utils/rend_util.py:90-120.
    """
    pose = pose_to_matrix(pose)
    cam_loc = pose[:3, 3]
    z = jnp.ones_like(uv[..., 0])
    pix_cam = lift(uv[..., 0], uv[..., 1], z, intrinsics)  # [N, 4]
    ray_dirs = jnp.einsum("ij,nj->ni", pose[:3, :3], pix_cam[..., :3])
    ray_dirs = ray_dirs / jnp.linalg.norm(ray_dirs, axis=-1, keepdims=True)
    return ray_dirs, cam_loc


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [*, 4] (w, x, y, z) -> rotation matrix [*, 3, 3].

    Reference: stage2/utils/rend_util.py:149-166.
    """
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    qr, qi, qj, qk = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (qj**2 + qk**2), 2 * (qj * qi - qk * qr), 2 * (qi * qk + qr * qj),
            2 * (qj * qi + qk * qr), 1 - 2 * (qi**2 + qk**2), 2 * (qj * qk - qi * qr),
            2 * (qk * qi - qj * qr), 2 * (qj * qk + qi * qr), 1 - 2 * (qi**2 + qj**2),
        ],
        axis=-1,
    )
    return r.reshape(*q.shape[:-1], 3, 3)


def get_sphere_intersection(
    cam_loc: jnp.ndarray, ray_directions: jnp.ndarray, r: float = 1.0
):
    """Ray-sphere intersection depths, clamped to >= 0.

    cam_loc: [3]; ray_directions: [N, 3] (unit); returns
    (depths [N, 2] = (near, far), mask_intersect [N] bool).
    Non-intersecting rays get (0, 0), matching the reference's zero-init
    (stage1/model/rendering.py:576-595).
    """
    ray_cam_dot = jnp.einsum("ni,i->n", ray_directions, cam_loc)  # [N]
    under_sqrt = ray_cam_dot**2 - (jnp.sum(cam_loc**2) - r**2)
    mask = under_sqrt > 0
    sqrt_val = jnp.sqrt(jnp.maximum(under_sqrt, 0.0))
    near = -sqrt_val - ray_cam_dot
    far = sqrt_val - ray_cam_dot
    depths = jnp.stack([near, far], axis=-1)
    depths = jnp.where(mask[..., None], depths, 0.0)
    depths = jnp.maximum(depths, 0.0)
    return depths, mask


def arange_pixels(resolution, image_range=(-1.0, 1.0)):
    """All pixel locations for a (h, w) image, in the reference's (x-major)
    traversal order, plus scaled float coordinates.

    Returns (pixel_locations [h*w, 2] int32, pixel_scaled [h*w, 2] float32).
    NOTE the reference iterates meshgrid(arange(w), arange(h)) with default
    (ij) indexing, so the flattened order is x-major: index n = x * h + y
    (stage1/model/common.py:55-93); `to_hw` later undoes this by reshaping to
    (w, h) and transposing (stage1/model/training.py:18).
    """
    h, w = resolution
    xs, ys = jnp.meshgrid(jnp.arange(w), jnp.arange(h), indexing="ij")
    loc = jnp.stack([xs, ys], axis=-1).reshape(-1, 2)  # [w*h, 2], x-major
    scale = image_range[1] - image_range[0]
    offset = scale / 2.0
    scaled = loc.astype(jnp.float32)
    scaled = scaled.at[:, 0].set(scale * scaled[:, 0] / (w - 1) - offset)
    scaled = scaled.at[:, 1].set(scale * scaled[:, 1] / (h - 1) - offset)
    return loc.astype(jnp.int32), scaled


def factorize_P(P: "np.ndarray"):
    """RQ-factorize a 3x4 projection matrix into (K, R, t) with positive
    intrinsic diagonal and det(R)=1 (stage2/utils/rend_util.py:31-70).
    Host-side numpy/scipy."""
    import numpy as np
    from scipy import linalg

    P = np.asarray(P, np.float64)[:3, :4].copy()
    K, R = linalg.rq(P[:3, :3])
    neg = int(K[0, 0] < 0) + int(K[1, 1] < 0) + int(K[2, 2] < 0)
    if neg in (1, 3):
        K, R = -K, -R
    fix = np.diag((1.0, 1.0, 1.0))
    if K[0, 0] < 0 and K[1, 1] < 0:
        fix = np.diag((-1.0, -1.0, 1.0))
    elif K[0, 0] < 0 and K[2, 2] < 0:
        fix = np.diag((-1.0, 1.0, -1.0))
    elif K[1, 1] < 0 and K[2, 2] < 0:
        fix = np.diag((1.0, -1.0, -1.0))
    K = K @ fix
    R = fix @ R
    scale = K[2, 2]
    K = K / scale
    P = P / scale
    if np.linalg.det(R) < 0:
        R = -R
        P = -P
    t = linalg.lstsq(K, P[:3, 3:4])[0]
    return K, R, t


def load_K_Rt_from_P(P: "np.ndarray"):
    """Projection matrix -> (intrinsics [4,4], c2w pose [4,4])
    (stage2/utils/rend_util.py:73-88)."""
    import numpy as np

    K, R, t = factorize_P(P)
    intrinsics = np.eye(4, dtype=np.float32)
    intrinsics[:3, :3] = K.astype(np.float32)
    w2c = np.eye(4)
    w2c[:3, :4] = np.hstack((R, t))
    pose = np.linalg.inv(w2c).astype(np.float32)
    return intrinsics, pose


def pose_to_matrix(pose: jnp.ndarray) -> jnp.ndarray:
    """Accept either a [4,4] c2w matrix or a [7] quaternion+translation
    (w,x,y,z,tx,ty,tz) and return [4,4] (stage2/utils/rend_util.py:91-99)."""
    if pose.shape[-1] == 7:
        r = quat_to_rot(pose[..., :4])
        m = jnp.eye(4, dtype=pose.dtype)
        m = m.at[:3, :3].set(r)
        m = m.at[:3, 3].set(pose[..., 4:])
        return m
    return pose


def get_depth(points: jnp.ndarray, pose: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame depth of world points (stage2/utils/rend_util.py:211-228).
    points [N,3], pose [4,4] c2w -> depth [N]."""
    pose = pose_to_matrix(pose)
    w2c = jnp.linalg.inv(pose)
    cam = jnp.einsum("ij,nj->ni", w2c[:3, :3], points) + w2c[:3, 3]
    return cam[:, 2]
