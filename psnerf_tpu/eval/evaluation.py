"""Top-level quality evaluation: recompute PSNR/SSIM/LPIPS/normal-MAE from a
stage-2 eval output directory against dataset GT (reference evaluation.py:
28-97): white-background compositing under mask_pred & norm_mask, optional
per-channel least-squares rescale for SDPS-normalized runs."""

from __future__ import annotations

import json
import os
from collections import defaultdict

import imageio.v2 as imageio
import numpy as np

from psnerf_tpu.eval.lpips_jax import LPIPS
from psnerf_tpu.eval.metrics import mae, psnr, scale_img, ssim, white_bg


def evaluate_outputs(
    data_path: str,
    test_out_path: str,
    inten_normalize: str | None = None,
    train_all_view: bool = False,
    train_light: int | None = None,
    lpips_weights: str | None = None,
) -> dict:
    with open(os.path.join(data_path, "params.json")) as f:
        para = json.load(f)
    test_slt = (np.arange(para["n_view"]) if train_all_view
                else np.asarray(para["view_test"]))
    poses = np.asarray(para["pose_c2w"], np.float32)
    im_sub = "img_intnorm_gt" if inten_normalize is not None else "img"

    if para["light_is_same"]:
        n_light = len(para["light_direction"])
        if train_all_view and train_light is not None:
            n_light = train_light
        light_slt = [np.arange(n_light)] * len(test_slt)
    else:
        light_slt = [np.arange(len(para["light_direction"][vi]))
                     for vi in test_slt]

    lpips_fn = LPIPS(lpips_weights)
    img_data = defaultdict(list)
    normal_data = []
    for vidx, vi in enumerate(test_slt):
        mask_gt = np.asarray(imageio.imread(os.path.join(
            data_path, f"norm_mask/view_{vi + 1:02d}.png"))).astype(bool)
        if mask_gt.ndim == 3:
            mask_gt = mask_gt[..., 0]
        mask_pred = np.asarray(imageio.imread(os.path.join(
            test_out_path, f"mask/img/view_{vi + 1:02d}.png"))).astype(bool)
        mask = mask_pred & mask_gt

        gt_normal_dir = os.path.join(data_path, "normal")
        if os.path.exists(gt_normal_dir):
            normal_gt = np.load(os.path.join(
                gt_normal_dir, f"npy/view_{vi + 1:02d}.npy"))
            if not para["gt_normal_world"]:
                normal_gt = np.einsum("ij,hwj->hwi", poses[vi, :3, :3], normal_gt)
            normal_pred = np.load(os.path.join(
                test_out_path, f"normal/npy/view_{vi + 1:02d}.npy"))
            normal_data.append(mae(normal_pred, normal_gt, mask)[0])

        for li in light_slt[vidx]:
            img_gt = np.asarray(imageio.imread(os.path.join(
                data_path, im_sub, f"view_{vi + 1:02d}", f"{li + 1:03d}.png"
            )), np.float32)[..., :3] / 255.0
            img_gt = white_bg(img_gt, mask_gt)
            img_pred = np.asarray(imageio.imread(os.path.join(
                test_out_path, "rgb", "img", f"view_{vi + 1:02d}",
                f"{li + 1:03d}.png")), np.float32)[..., :3] / 255.0
            if inten_normalize == "sdps":
                img_pred = scale_img(img_pred, img_gt, mask)
            a, b = white_bg(img_pred, mask), white_bg(img_gt, mask)
            img_data["psnr"].append(psnr(a, b, mask))
            img_data["ssim"].append(ssim(a, b))
            if lpips_fn.available:
                img_data["lpips"].append(lpips_fn(a, b))

    out = {k: float(np.mean(v)) for k, v in img_data.items()}
    if "lpips" in out:
        out["lpips"] *= 100
        out["lpips_status"] = "computed"
    else:
        # machine-safe encoding: null value + a status string, so downstream
        # JSON comparison never trips over prose (reference metric:
        # stage2/utils/metrics.py:64-76; weights via tools/export_lpips_npz.py
        # + LPIPS_WEIGHTS)
        out["lpips"] = None
        out["lpips_status"] = ("unavailable: set LPIPS_WEIGHTS "
                               "(see tools/export_lpips_npz.py)")
    if normal_data:
        out["normal_mae"] = float(np.mean(normal_data))
    return out
