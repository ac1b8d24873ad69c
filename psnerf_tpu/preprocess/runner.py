"""SDPS-Net inference driver: dataset -> sdps_out* directory.

Reference: preprocessing/test.py + test_utils.py:18-92 +
datasets/UPS_Custom_Dataset.py:26-107. Per view: mask-crop (15px pad, then
pad to a multiple of 4), LCNet at the 128x128 canonical resolution for light
estimation, NENet at the cropped resolution for normals, re-embed outputs
into the full frame, save outnpy/view_XX.npy + light_direction_pred.npy +
light_intensity_pred.npy.
"""

from __future__ import annotations

import json
import os

import imageio.v2 as imageio
import jax
import jax.numpy as jnp
import numpy as np

from psnerf_tpu.preprocess.sdps import lcnet_forward, nenet_forward


def resize_bilinear_align(img: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Bilinear resize with align_corners=True (torch interpolate semantics
    used by LCNet.prepareInputs, LCNet.py:88). img: [H, W, C]."""
    h, w = img.shape[:2]
    ys = np.linspace(0, h - 1, th)
    xs = np.linspace(0, w - 1, tw)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    a = img[y0][:, x0]
    b = img[y0][:, x1]
    c = img[y1][:, x0]
    d = img[y1][:, x1]
    return (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx
            + c * fy * (1 - fx) + d * fy * fx)


def _crop_and_pad(img, mask, pad=15, k=4):
    h, w = mask.shape
    mi, mj = np.where(mask > 0.5)
    crop = (max(0, mi.min() - pad), max(0, mj.min() - pad),
            min(h, mi.max() + pad), min(w, mj.max() + pad))
    img = img[crop[0]:crop[2], crop[1]:crop[3]]
    mask = mask[crop[0]:crop[2], crop[1]:crop[3]]
    # Mirror pms_transforms.imgSizeToFactorOfK (pms_transforms.py:24-30)
    # exactly, including its quirk: when EITHER dim is unaligned, BOTH are
    # padded by k - dim % k — so an already-aligned dim gains a full extra
    # k rows/cols. The padding feeds LCNet's 128x128 rescale, so matching
    # it bit-for-bit is required for light-estimate parity.
    if img.shape[0] % k or img.shape[1] % k:
        ph = k - img.shape[0] % k
        pw = k - img.shape[1] % k
        img = np.pad(img, ((0, ph), (0, pw), (0, 0)))
        mask = np.pad(mask, ((0, ph), (0, pw)))
    return img, mask, crop


def run_sdps(
    data_dir: str,
    lcnet_params: dict,
    nenet_params: dict,
    out_dir: str | None = None,
    train_light: int | None = None,
    light_intnorm_gt: bool = False,
    test_hw: tuple = (128, 128),
) -> str:
    with open(os.path.join(data_dir, "params.json")) as f:
        para = json.load(f)
    n_view = para["n_view"]
    light_is_same = para["light_is_same"]

    if out_dir is None:
        sub = "sdps_out"
        if light_intnorm_gt:
            sub += "_intnorm_gt"
        if light_is_same:
            n_l = (train_light if train_light is not None
                   else len(para["light_direction"]))
            sub += f"_l{n_l}"
        out_dir = os.path.join(data_dir, sub)
    os.makedirs(os.path.join(out_dir, "outnpy"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "outimg"), exist_ok=True)

    img_root = "img_intnorm_gt" if light_intnorm_gt else "img"
    lc_jit = jax.jit(lambda im, m: lcnet_forward(lcnet_params, im, m))
    ne_jit = jax.jit(lambda im, d, it: nenet_forward(nenet_params, im, d, it))

    all_dirs, all_ints = [], []
    for vi in range(n_view):
        view = f"view_{vi + 1:02d}"
        img_files = sorted(
            os.listdir(os.path.join(data_dir, img_root, view)))
        if light_is_same and train_light is not None:
            lslt = para[f"light_slt_{train_light}"]
            img_files = [img_files[li] for li in lslt]
        imgs = np.stack([
            np.asarray(imageio.imread(
                os.path.join(data_dir, img_root, view, f)), np.float32)[..., :3]
            / 255.0
            for f in img_files
        ])  # [L, H, W, 3]
        mask = np.asarray(imageio.imread(
            os.path.join(data_dir, "norm_mask", f"{view}.png")), np.float32)
        if mask.ndim == 3:
            mask = mask[..., 0]
        mask = mask / 255.0
        h0, w0 = mask.shape
        imgs = imgs * (mask[None, ..., None] > 0.5)

        # crop + pad each light image identically
        cropped, cmask, crop = None, None, None
        per_light = []
        for li in range(imgs.shape[0]):
            ci, cm, crop = _crop_and_pad(imgs[li], mask)
            per_light.append(ci)
            cmask = cm
        cropped = np.stack(per_light)  # [L, h, w, 3]

        # LCNet at canonical res
        th, tw = test_hw
        imgs_lc = np.stack(
            [resize_bilinear_align(im, th, tw) for im in cropped])
        mask_lc = resize_bilinear_align(cmask[..., None], th, tw)[..., 0]
        pred_c = lc_jit(
            jnp.asarray(imgs_lc.transpose(0, 3, 1, 2)),
            jnp.asarray(mask_lc[None]),
        )
        dirs = np.asarray(pred_c["dirs"])       # [L, 3] camera frame
        intens = np.asarray(pred_c["intens"])   # [L]

        # NENet at cropped res
        normal = ne_jit(
            jnp.asarray(cropped.transpose(0, 3, 1, 2)),
            jnp.asarray(dirs), jnp.asarray(intens),
        )
        normal = np.asarray(normal).transpose(1, 2, 0) * cmask[..., None]

        # re-embed into the full frame (test_utils.py:56-67)
        norm0 = np.zeros((h0, w0, 3), np.float32)
        ch = crop[2] - crop[0]
        cw = crop[3] - crop[1]
        norm0[crop[0]:crop[0] + ch, crop[1]:crop[1] + cw] = \
            normal[:ch, :cw]
        np.save(os.path.join(out_dir, "outnpy", f"{view}.npy"), norm0)
        vis = ((norm0 / 2 + 0.5) * 255).clip(0, 255).astype(np.uint8)
        imageio.imwrite(os.path.join(out_dir, "outimg", f"{view}.png"), vis)

        all_dirs.append(dirs)
        all_ints.append(intens)

    np.save(os.path.join(out_dir, "light_direction_pred.npy"),
            np.asarray(all_dirs, dtype=object if not light_is_same else None)
            if not light_is_same else np.stack(all_dirs))
    np.save(os.path.join(out_dir, "light_intensity_pred.npy"),
            np.stack(all_ints) if light_is_same
            else np.asarray(all_ints, dtype=object))
    return out_dir
