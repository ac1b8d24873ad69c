"""Stage-2 data: multi-light images + stage-1 pre-extracted geometry.

Replaces stage2/datasets/dataset.py:9-254. All views' light stacks and the
stage-1 exports (points/normals/masks/visibility) preload to device; a
jittable sampler gathers (view, light subset, pixel subset) batches.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from psnerf_tpu.data.scene import SceneParams, load_image, load_image_u8, load_mask


def decode_imgs(x):
    """uint8-stored images → float32 in [0,1]; float images pass through.

    The u8 store is bit-exact vs loading as float (one IEEE division by
    255.0 either way), so callers never see a numeric difference."""
    if x.dtype == jnp.uint8 or x.dtype == np.uint8:
        return x.astype(jnp.float32) / 255.0
    return x


def load_stage2_data(
    scene: SceneParams,
    stage1_shape_path: str,
    split: str = "train",
    inten_normalize: str | None = "sdps",
    train_view: int | None = None,
    train_light: int | None = None,
    all_view: bool = False,
    vis_loss: bool = True,
    vis_plus: bool = True,
    multi_light: bool = True,
    image_store: str = "auto",
) -> dict:
    """Returns host/device dict:
      imgs [V,L,H*W,3] (masked; uint8 when image_store resolves to "u8" —
        decode with decode_imgs, bit-exact at 1/4 the HBM/transfer),
      object_masks [V,H*W] bool,
      points/normals [V,H*W,3], surface_mask [V,H*W] (stage-1 exports),
      visibility [V,L,H*W], gt_normal [V,H*W,3],
      light_dirs [V,L,3] world (json dirs rotated), light_slt [V,L],
      poses [V,4,4] OpenCV, pose_gl [V,4,4], K,
      vis_plus_dirs [V,Lp,3] + vis_plus [V,Lp,H*W] (when vis_plus).
    """
    views = scene.view_split(split, train_view, all_view)
    im_sub, _ = scene.img_subdir(inten_normalize, train_light)
    light_dirs, light_slt = scene.lights_world(views, train_light)
    if image_store not in ("auto", "u8", "f32"):
        raise ValueError(f"image_store must be auto|u8|f32, got {image_store!r}")
    # "auto"/"u8": keep the raw 8-bit bytes on device (4x less tunnel
    # transfer + HBM; decode_imgs reproduces the f32 path bit-exactly);
    # any non-8-bit source demotes the whole stack to f32.
    use_u8 = image_store != "f32"

    masks, points, normals, smasks, gt_normals = [], [], [], [], []
    imgs, vis = [], []
    for v0, vi in enumerate(views):
        mask = load_mask(os.path.join(scene.basedir, "mask", f"view_{vi + 1:02d}.png"))
        masks.append(mask)
        h, w = mask.shape
        gt_path = os.path.join(scene.basedir, "normal", "npy", f"view_{vi + 1:02d}.npy")
        if os.path.exists(gt_path):
            g = np.load(gt_path)
            if not scene.gt_normal_world:
                g = np.einsum("ij,hwj->hwi", scene.pose_gl[vi, :3, :3], g)
            # reference bool-izes masks as "any nonzero" (dataset.py:107)
            gt_normals.append(g * (mask[..., None] > 0))
        else:
            gt_normals.append(np.zeros((h, w, 3), np.float32))
        points.append(np.load(os.path.join(stage1_shape_path, "points", f"view_{vi + 1:02d}.npy")))
        smasks.append(np.load(os.path.join(stage1_shape_path, "mask", f"view_{vi + 1:02d}.npy")))
        normals.append(np.load(os.path.join(stage1_shape_path, "normal", f"view_{vi + 1:02d}.npy")))

        img_v = []
        for li in light_slt[v0]:
            p = os.path.join(
                scene.basedir, im_sub, f"view_{vi + 1:02d}", f"{li + 1:03d}.png")
            img = load_image_u8(p) if use_u8 else None
            if img is None:
                if use_u8:  # non-8-bit source: demote everything to f32
                    if image_store == "u8":
                        # the caller forced u8 to bound HBM/transfer; a
                        # silent 4x regression is worse than failing fast
                        raise ValueError(
                            f"image_store='u8' but {p!r} is not an 8-bit "
                            "image; use image_store='auto' to allow the "
                            "f32 fallback")
                    use_u8 = False
                    imgs = [a.astype(np.float32) / 255.0 for a in imgs]
                    img_v = [a.astype(np.float32) / 255.0 for a in img_v]
                img = load_image(p)
            img_v.append(img.reshape(-1, 3) * (mask.reshape(-1, 1) > 0))
        imgs.append(np.asarray(img_v, np.uint8 if use_u8 else np.float32))
        if vis_loss:
            vv = np.load(os.path.join(
                stage1_shape_path, "visibility", f"view_{vi + 1:02d}.npy"))
            vis.append(vv.reshape(vv.shape[0], -1).astype(np.float32))

    masks = np.asarray(masks, np.float32)
    v = len(views)
    # ragged per-view light counts (light_is_same=false datasets,
    # stage2/datasets/dataset.py:117-151): pad the light axis to the max
    # count; light_count/light_mask let samplers avoid the padding
    llen = [len(s) for s in light_slt]
    l_max = max(llen)

    def pad_lights(arrs, fill=0.0, dtype=np.float32):
        """list of [L_v, ...] -> [V, l_max, ...] (padded with `fill`)."""
        out_arr = np.full((v, l_max) + tuple(np.shape(arrs[0])[1:]), fill,
                          dtype)
        for i, a in enumerate(arrs):
            out_arr[i, : len(a)] = a
        return out_arr

    light_mask = np.zeros((v, l_max), bool)
    for i, n_l in enumerate(llen):
        light_mask[i, :n_l] = True
    # pad direction rows with +z so normalization downstream stays finite
    ld_pad = pad_lights(light_dirs)
    ld_pad[~light_mask] = (0.0, 0.0, 1.0)
    slt_pad = np.full((v, l_max), -1, np.int64)
    for i, s in enumerate(light_slt):
        slt_pad[i, : len(s)] = s

    out = {
        "imgs": jnp.asarray(pad_lights(
            imgs, dtype=np.uint8 if use_u8 else np.float32)),
        "object_masks": jnp.asarray(masks.reshape(v, -1) > 0),
        "gt_normal": jnp.asarray(np.asarray(gt_normals, np.float32).reshape(v, -1, 3)),
        "points": jnp.asarray(np.asarray(points, np.float32).reshape(v, -1, 3)),
        "normals": jnp.asarray(np.asarray(normals, np.float32).reshape(v, -1, 3)),
        "surface_mask": jnp.asarray(np.asarray(smasks).reshape(v, -1).astype(bool)),
        "light_dirs": jnp.asarray(ld_pad),
        "light_slt": slt_pad,
        "light_count": np.asarray(llen),
        "light_mask": jnp.asarray(light_mask),
        "poses": jnp.asarray(scene.pose_cv[views]),
        "pose_gl": scene.pose_gl[views],
        "K": jnp.asarray(scene.K),
        "views": np.asarray(views),
        "img_res": masks.shape[-2:],
    }
    if vis_loss:
        out["visibility"] = jnp.asarray(pad_lights(vis))
    if vis_loss and vis_plus:
        vp_dir = os.path.join(stage1_shape_path, "vis_plus")
        with open(os.path.join(vp_dir, "light_dir.json")) as f:
            vp_lights = json.load(f)
        vpd, vpv = [], []
        for vi in views:
            vpd.append(np.asarray(vp_lights[f"view_{vi + 1:02d}"], np.float32))
            arr = np.load(os.path.join(vp_dir, f"view_{vi + 1:02d}.npy"))
            vpv.append(arr.reshape(len(vpd[-1]), -1).astype(np.float32))
        out["vis_plus_dirs"] = jnp.asarray(np.asarray(vpd))
        out["vis_plus"] = jnp.asarray(np.asarray(vpv))
    # global row offsets of each view's lights in the flat light table
    llen = [len(s) for s in light_slt]
    out["light_row_offset"] = np.concatenate([[0], np.cumsum(llen)[:-1]])
    out["n_light_rows"] = int(np.sum(llen))
    return out


def sample_stage2_batch(
    data: dict,
    view: int,
    key: jax.Array,
    num_pixels: int,
    light_bs: int,
    sample_in_mask: bool = True,
    vis_train_num: int = 16,
    light_init_dirs: jnp.ndarray | None = None,  # [V,L,3] SDPS init (vis input)
) -> dict:
    """One train batch: random light subset + random pixel subset of a view.

    Static view index (per-view shapes can differ only when light counts do;
    DiLiGenT-MV has uniform counts). Reference: dataset.py:137-199 +
    trainer.py:364-392.
    """
    k_l, k_p, k_v = jax.random.split(key, 3)
    n_lights = data["imgs"].shape[1]
    total_px = data["imgs"].shape[2]

    lmask = data.get("light_mask")
    if lmask is not None:
        # ragged light counts: sample only this view's real lights
        lp = lmask[view].astype(jnp.float32)
        lidx = jax.random.choice(k_l, n_lights, (light_bs,), replace=False,
                                 p=lp / lp.sum())
    else:
        lidx = jax.random.choice(k_l, n_lights, (light_bs,), replace=False)
    if sample_in_mask:
        mask = data["object_masks"][view]
        probs = mask.astype(jnp.float32) / jnp.maximum(mask.sum(), 1)
        pix = jax.random.choice(k_p, total_px, (num_pixels,), replace=False, p=probs)
    else:
        pix = jax.random.choice(k_p, total_px, (num_pixels,), replace=False)

    h, w = data["img_res"]
    uv = jnp.stack([pix % w, pix // w], axis=-1).astype(jnp.float32)

    batch = {
        "uv": uv,
        "pose": data["poses"][view],
        "intrinsics": data["K"],
        "object_mask": data["object_masks"][view][pix],
        "points": data["points"][view][pix],
        "normal": data["normals"][view][pix],
        "surface_mask": data["surface_mask"][view][pix],
        "rgb_gt": decode_imgs(data["imgs"][view][lidx][:, pix]),
        # jnp.asarray: the row-offset table is a small host array, but `view`
        # may be a traced index (the megastep samples inside a scan)
        "l_slt": jnp.asarray(data["light_row_offset"])[view] + lidx,
        "lidx": lidx,
        "pix": pix,
    }
    if "visibility" in data:
        batch["visibility"] = data["visibility"][view][lidx][:, pix]
    if "vis_plus" in data and light_init_dirs is not None:
        # vis_plus pool = FPS lights + this view's train lights (trainer.py:384-392)
        pool_dirs = jnp.concatenate(
            [data["vis_plus_dirs"][view], light_init_dirs[view]], axis=0
        )
        pool_vis = jnp.concatenate(
            [data["vis_plus"][view], data["visibility"][view]], axis=0
        )
        if lmask is not None:
            # exclude the view's padded (non-existent) train-light rows
            pool_mask = jnp.concatenate([
                jnp.ones((data["vis_plus_dirs"].shape[1],)),
                lmask[view].astype(jnp.float32),
            ])
            sidx = jax.random.choice(
                k_v, pool_dirs.shape[0], (vis_train_num,), replace=False,
                p=pool_mask / pool_mask.sum())
        else:
            sidx = jax.random.choice(k_v, pool_dirs.shape[0],
                                     (vis_train_num,), replace=False)
        batch["light_vis_train"] = pool_dirs[sidx]
        batch["vis_train_gt"] = pool_vis[sidx][:, pix]
    return batch


def sample_stage2_patches(
    data: dict,
    view: int,
    key: jax.Array,
    n_patches: int,
    r_patch: int = 1,
    light_bs: int = 10,
    light_init_dirs: jnp.ndarray | None = None,
    vis_train_num: int = 16,
) -> dict:
    """Patch-based pixel sampling: (2r)x(2r) blocks around random centers
    (stage2/datasets/dataset.py:226-253) — enables patch-structured losses.
    Returns the same batch contract as sample_stage2_batch with
    num_pixels = n_patches * (2r)^2."""
    h, w = data["img_res"]
    k_c, k_rest = jax.random.split(key)
    u, v = jnp.meshgrid(jnp.arange(-r_patch, r_patch),
                        jnp.arange(-r_patch, r_patch), indexing="xy")
    offsets = (v * w + u).reshape(-1)  # [(2r)^2]
    cx = jax.random.randint(k_c, (n_patches,), r_patch, w - r_patch)
    cy = jax.random.randint(k_c, (n_patches,), r_patch, h - r_patch)
    centers = cy * w + cx
    pix = (centers[:, None] + offsets[None, :]).reshape(-1)

    batch = sample_stage2_batch(
        data, view, k_rest, num_pixels=pix.shape[0], light_bs=light_bs,
        sample_in_mask=False, vis_train_num=vis_train_num,
        light_init_dirs=light_init_dirs,
    )
    # overwrite the pixel selection with the patch layout
    uv = jnp.stack([pix % w, pix // w], axis=-1).astype(jnp.float32)
    lidx = batch["lidx"]
    batch.update({
        "uv": uv,
        "pix": pix,
        "object_mask": data["object_masks"][view][pix],
        "points": data["points"][view][pix],
        "normal": data["normals"][view][pix],
        "surface_mask": data["surface_mask"][view][pix],
        "rgb_gt": decode_imgs(data["imgs"][view][lidx][:, pix]),
    })
    if "visibility" in data:
        batch["visibility"] = data["visibility"][view][lidx][:, pix]
    return batch
