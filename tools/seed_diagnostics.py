"""Seed-spread geometry diagnostics over tpu_pipeline_demo workdirs.

For each workdir (a sphere-scene pipeline run), measures from the SAVED
stage-1 exports (no device needed): surface-point radial statistics vs the
analytic 0.6-radius sphere, exported-normal error vs the analytic normal,
silhouette area, terminal stage-1 losses, and the stage-2 terminal
light-direction error. This is the tooling behind the seed-0 outlier
root-cause (docs/stage1_quality.md).

Usage: python tools/seed_diagnostics.py --workdirs /tmp/a /tmp/b ...
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def diagnose(wd: str, gt_radius: float = 0.6) -> dict:
    out = {"workdir": wd}
    rs, nerr, mareas = [], [], []
    for f in sorted(glob.glob(os.path.join(wd, "exports/points/*.npy"))):
        name = os.path.basename(f)
        pts = np.load(f)
        msk = np.load(os.path.join(wd, "exports/mask", name))
        nrm = np.load(os.path.join(wd, "exports/normal", name))
        p = pts[msk]
        r = np.linalg.norm(p, axis=-1)
        rs.append(r)
        n_gt = p / np.maximum(r[:, None], 1e-9)
        n_pred = nrm[msk]
        n_pred = n_pred / np.maximum(
            np.linalg.norm(n_pred, axis=-1, keepdims=True), 1e-9)
        cos = np.clip((n_gt * n_pred).sum(-1), -1, 1)
        nerr.append(np.degrees(np.arccos(cos)))
        mareas.append(msk.mean())
    if rs:
        r = np.concatenate(rs)
        ne = np.concatenate(nerr)
        out.update(
            surf_r_mean=round(float(r.mean()), 4),
            surf_r_std=round(float(r.std()), 4),
            surf_abs_err_mm_mean=round(
                float(np.abs(r - gt_radius).mean()) * 1000, 2),
            surf_abs_err_mm_p99=round(
                float(np.percentile(np.abs(r - gt_radius), 99)) * 1000, 2),
            normal_err_deg_mean=round(float(ne.mean()), 2),
            mask_area_mean=round(float(np.mean(mareas)), 4),
        )

    s1m = os.path.join(wd, "stage1/metrics.jsonl")
    if os.path.exists(s1m):
        rows = [json.loads(l) for l in open(s1m)]
        out["stage1_loss_final"] = round(rows[-1].get("loss", float("nan")), 4)
        out["stage1_mask_loss_final"] = round(
            rows[-1].get("mask_loss", float("nan")), 4)
        losses = [x.get("loss") for x in rows if "loss" in x]
        out["stage1_loss_min"] = round(min(losses), 4)
    s2m = os.path.join(wd, "stage2/metrics.jsonl")
    if os.path.exists(s2m):
        rows = [json.loads(l) for l in open(s2m)]
        if "light_direction_error" in rows[-1]:
            out["stage2_light_err_deg"] = round(
                rows[-1]["light_direction_error"], 3)
    ev = os.path.join(wd, "stage1_eval/metrics.json")
    if os.path.exists(ev):
        m = json.load(open(ev))
        if isinstance(m, list) and m:
            out["stage1_eval_psnr"] = round(
                float(np.mean([x["psnr"] for x in m])), 2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdirs", nargs="+", required=True)
    ap.add_argument("--gt-radius", type=float, default=0.6)
    args = ap.parse_args()
    for wd in args.workdirs:
        print(json.dumps(diagnose(wd, args.gt_radius)))


if __name__ == "__main__":
    main()
