"""Stage-1 data: light-averaged images + SDPS normals, preloaded to device.

Replaces the reference DataLoader machinery (stage1/dataloading/dataset.py):
datasets are tiny (<= ~20 views), so everything lives in device memory as
stacked arrays and a jitted sampler gathers per-step ray batches — no host
workers, no collate.
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from psnerf_tpu.data.scene import SceneParams, load_image, load_mask


def load_stage1_data(
    scene: SceneParams,
    split: str = "train",
    inten_normalize: str | None = "sdps",
    train_view: int | None = None,
    train_light: int | None = None,
    all_view: bool = False,
    white_background: bool = True,
    normal_loss: bool = True,
    mask_valid: bool = True,
    mask_black: bool = False,
) -> dict:
    """Returns device-resident dict:
      imgs [V,H,W,3], masks [V,H,W], norm_mask [V,H,W] bool,
      normals [V,H,W,3] (SDPS camera-frame), mask_valid [V,H,W] bool,
      poses [V,4,4] (OpenCV c2w), K [4,4], views (original indices).
    Reference: stage1/dataloading/dataset.py:28-122.
    """
    views = scene.view_split(split, train_view, all_view)
    im_sub, im_type = scene.img_subdir(inten_normalize, train_light)
    sdps_dir = scene.sdps_dir(inten_normalize, train_light)

    imgs, masks, norm_masks, normals, valids = [], [], [], [], []
    for vi in views:
        imgs.append(load_image(os.path.join(
            scene.basedir, im_sub, im_type, f"view_{vi + 1:02d}.png")))
        mask = load_mask(os.path.join(scene.basedir, "mask", f"view_{vi + 1:02d}.png"))
        masks.append(mask)
        nm_path = os.path.join(scene.basedir, "norm_mask", f"view_{vi + 1:02d}.png")
        norm_masks.append(
            load_mask(nm_path) if os.path.exists(nm_path) else mask.copy()
        )
        if normal_loss:
            normals.append(np.load(os.path.join(
                sdps_dir, "outnpy", f"view_{vi + 1:02d}.npy")))
        if mask_valid:
            d = ndimage.binary_dilation(mask, iterations=2)
            e = ndimage.binary_erosion(mask, iterations=2)
            valids.append(~np.logical_xor(d, e))

    imgs = np.asarray(imgs, np.float32)
    masks = np.asarray(masks, np.float32)
    norm_mask = np.asarray(norm_masks, np.float32) > 0  # any-nonzero, as the reference
    if mask_black and normal_loss:
        norm_mask &= ~(imgs < 0.1).all(-1)
    if white_background:
        imgs = imgs * masks[..., None] + (1.0 - masks[..., None])

    out = {
        "imgs": jnp.asarray(imgs),
        "masks": jnp.asarray(masks),
        "norm_mask": jnp.asarray(norm_mask),
        "poses": jnp.asarray(scene.pose_cv[views]),
        "K": jnp.asarray(scene.K),
        "views": np.asarray(views),
    }
    if normal_loss:
        out["normals"] = jnp.asarray(np.asarray(normals, np.float32))
    if mask_valid:
        out["mask_valid"] = jnp.asarray(np.asarray(valids))
    return out


def sample_stage1_batch(
    data: dict,
    view: jnp.ndarray,      # scalar int view index (into the split)
    key: jax.Array,
    n_points: int,
    normal_angle: float | None = 65.0,
) -> dict:
    """Jittable per-step ray batch: random integer pixels of one view with
    rgb/mask/normal gathers, the normal-angle cone gate, and the SDPS
    camera->world normal rotation (stage1/model/training.py:159-191).
    """
    h, w = data["imgs"].shape[1:3]
    kx, ky = jax.random.split(key)
    px = jax.random.randint(kx, (n_points,), 0, w)
    py = jax.random.randint(ky, (n_points,), 0, h)

    img = data["imgs"][view]
    pose = data["poses"][view]

    batch = {
        "pixels": jnp.stack([px, py], axis=-1).astype(jnp.float32),
        "rgb_gt": img[py, px],
        "camera_mat": data["K"],
        "world_mat": pose,
        "mask_gt": data["masks"][view][py, px],
    }
    if "mask_valid" in data:
        batch["mask_valid"] = data["mask_valid"][view][py, px]
    else:
        batch["mask_valid"] = jnp.ones((n_points,), bool)
    if "normals" in data:
        n_cam = data["normals"][view][py, px]  # SDPS camera frame
        nm = data["norm_mask"][view][py, px]
        if normal_angle is not None:
            # cone gate on the camera-frame z component (training.py:190)
            nm = nm & (n_cam[..., -1] >= math.cos(math.radians(normal_angle)))
        # rotate to world: R * diag(1,-1,-1) (training.py:191)
        flip = jnp.asarray([1.0, -1.0, -1.0])
        batch["normal_gt"] = jnp.einsum(
            "ij,nj->ni", pose[:3, :3] * flip[None, :], n_cam
        )
        batch["norm_mask"] = nm
    else:
        batch["norm_mask"] = jnp.zeros((n_points,), bool)
        batch["normal_gt"] = jnp.zeros((n_points, 3))
    return batch


def full_view_batch(data: dict, view: int) -> dict:
    """All pixels of one view in the x-major order used by eval/vis
    (reference arange_pixels; reshape back via [W,H]->transpose)."""
    h, w = data["imgs"].shape[1:3]
    xs, ys = jnp.meshgrid(jnp.arange(w), jnp.arange(h), indexing="ij")
    px = xs.reshape(-1)
    py = ys.reshape(-1)
    img = data["imgs"][view]
    pose = data["poses"][view]
    batch = {
        "pixels": jnp.stack([px, py], -1).astype(jnp.float32),
        "rgb_gt": img[py, px],
        "camera_mat": data["K"],
        "world_mat": pose,
        "mask_gt": data["masks"][view][py, px],
    }
    if "normals" in data:
        flip = jnp.asarray([1.0, -1.0, -1.0])
        n_cam = data["normals"][view][py, px]
        batch["normal_gt"] = jnp.einsum(
            "ij,nj->ni", pose[:3, :3] * flip[None, :], n_cam
        )
        batch["norm_mask"] = data["norm_mask"][view][py, px]
    return batch
