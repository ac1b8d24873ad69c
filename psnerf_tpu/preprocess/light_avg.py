"""Light-averaged / intensity-normalized image generation
(reference light_avg.py:14-67): per view, mean over the (optionally
intensity-normalized) light images -> `img*/avg*/view_XX.png`; normalized
per-light copies -> `img_intnorm_*/view_XX/NNN.png`."""

from __future__ import annotations

import json
import os

import imageio.v2 as imageio
import numpy as np


def light_average(
    obj_dir: str,
    train_light: int | None = None,
    intnorm: bool = False,
    sdps: bool = False,
) -> str:
    with open(os.path.join(obj_dir, "params.json")) as f:
        para = json.load(f)
    n_view = para["n_view"]
    light_is_same = para["light_is_same"]
    explicit_train_light = train_light is not None

    if train_light is None:
        if light_is_same:
            train_light = len(para["light_direction"])
            light_slt = [np.arange(train_light)] * n_view
            avgdir = f"avg_l{train_light}"
        else:
            light_slt = [np.arange(len(ll)) for ll in para["light_direction"]]
            avgdir = "avg"
    else:
        assert light_is_same
        light_slt = [np.asarray(para[f"light_slt_{train_light}"])] * n_view
        avgdir = f"avg_l{train_light}"

    if intnorm:
        if sdps:
            sub = (f"sdps_out_l{train_light}" if light_is_same else "sdps_out")
            light_int = np.load(os.path.join(obj_dir, sub,
                                             "light_intensity_pred.npy"),
                                allow_pickle=True)
            normalizedir = os.path.join(
                obj_dir,
                f"img_intnorm_sdps_l{train_light}" if light_is_same
                else "img_intnorm_sdps")
            avgdir = "avg"
        else:
            assert "light_intensity" in para
            if light_is_same:
                light_int = [np.asarray(para["light_intensity"])[light_slt[0]]
                             ] * n_view
            else:
                light_int = [np.asarray(ll) for ll in para["light_intensity"]]
            normalizedir = os.path.join(obj_dir, "img_intnorm_gt")
    else:
        normalizedir = os.path.join(obj_dir, "img")

    os.makedirs(os.path.join(normalizedir, avgdir), exist_ok=True)
    to8 = lambda x: (np.clip(x, 0, 1) * 255).round().astype(np.uint8)
    for vi in range(n_view):
        mask = np.asarray(imageio.imread(os.path.join(
            obj_dir, "mask", f"view_{vi + 1:02d}.png"))).astype(bool)
        if mask.ndim == 3:
            mask = mask[..., 0]
        if intnorm:
            # anchor: light 3 for the full same-light set, light 0 otherwise
            anchor = 3 if (light_is_same and not explicit_train_light) else 0
            relat = np.asarray(light_int[vi]) / np.asarray(light_int[vi])[anchor]
            os.makedirs(os.path.join(normalizedir, f"view_{vi + 1:02d}"),
                        exist_ok=True)
        acc = []
        for idx, li in enumerate(light_slt[vi]):
            img = np.asarray(imageio.imread(os.path.join(
                obj_dir, "img", f"view_{vi + 1:02d}", f"{li + 1:03d}.png"
            )), np.float64)[..., :3] / 255.0
            img = img * mask[..., None]
            if intnorm:
                img = img / relat[idx]
                imageio.imwrite(os.path.join(
                    normalizedir, f"view_{vi + 1:02d}", f"{li + 1:03d}.png"),
                    to8(img))
            acc.append(img)
        imageio.imwrite(
            os.path.join(normalizedir, avgdir, f"view_{vi + 1:02d}.png"),
            to8(np.mean(acc, axis=0)))
    return normalizedir
