import pytest
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from psnerf_tpu.core.rays import (
    factorize_P,
    get_camera_params,
    get_depth,
    load_K_Rt_from_P,
    pose_to_matrix,
)
from psnerf_tpu.core.spherical import vis_light_probe
from psnerf_tpu.ops.fps import farthest_point_sampling
from psnerf_tpu.train.logging import MetricLogger, stage1_vis_strip
from psnerf_tpu.utils.profiling import PhaseTimer


def test_factorize_roundtrip():
    """P = K [R | t] must factorize back to (K, R, t)."""
    rng = np.random.default_rng(0)
    K = np.asarray([[500.0, 0, 256], [0, 480.0, 240], [0, 0, 1.0]])
    # random rotation via QR
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    t = rng.normal(size=(3, 1))
    P = K @ np.hstack([q, t])
    K2, R2, t2 = factorize_P(P)
    np.testing.assert_allclose(K2, K, atol=1e-8)
    np.testing.assert_allclose(R2, q, atol=1e-8)
    np.testing.assert_allclose(t2, t, atol=1e-8)
    intr, pose = load_K_Rt_from_P(P)
    # pose is c2w: R_pose == R^T, t_pose == camera center
    np.testing.assert_allclose(pose[:3, :3], q.T, atol=1e-5)
    np.testing.assert_allclose(pose[:3, 3:], -q.T @ t, atol=1e-4)


def test_quaternion_pose_rays():
    # identity quaternion + translation == matrix pose
    quat_pose = jnp.asarray([1.0, 0, 0, 0, 1.0, 2.0, -3.0])
    mat_pose = jnp.eye(4).at[:3, 3].set(jnp.asarray([1.0, 2.0, -3.0]))
    K = jnp.asarray([[100.0, 0, 32, 0], [0, 100.0, 32, 0],
                     [0, 0, 1, 0], [0, 0, 0, 1.0]])
    uv = jnp.asarray([[10.0, 20.0], [32.0, 32.0]])
    r1, c1 = get_camera_params(uv, quat_pose, K)
    r2, c2 = get_camera_params(uv, mat_pose, K)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2))
    assert pose_to_matrix(mat_pose).shape == (4, 4)


def test_get_depth():
    pose = jnp.eye(4).at[:3, 3].set(jnp.asarray([0.0, 0.0, -3.0]))
    pts = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    d = get_depth(pts, pose)
    np.testing.assert_allclose(np.asarray(d), [3.0, 4.0], atol=1e-6)


def test_fps_spreads_points():
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(500, 3)))
    pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    idx = farthest_point_sampling(pts, 16)
    sel = np.asarray(pts[idx])
    assert len(set(np.asarray(idx).tolist())) == 16
    # min pairwise distance of FPS selection >> random selection
    def min_pair(x):
        d = np.linalg.norm(x[:, None] - x[None], axis=-1)
        return d[~np.eye(len(x), dtype=bool)].min()
    rand = np.asarray(pts[:16])
    assert min_pair(sel) > min_pair(rand)


def test_fps_np_matches_jax():
    """The host FPS (production shape_extract path) selects the same indices
    as the jitted device version for the export's exact workload shape."""
    from psnerf_tpu.ops.fps import farthest_point_sampling_np

    rng = np.random.default_rng(3)
    pts = rng.normal(size=(2000, 3))
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    for start in (0, 7, 1999):
        idx_np = farthest_point_sampling_np(pts, 64, start=start)
        idx_jax = np.asarray(
            farthest_point_sampling(jnp.asarray(pts), 64, start=start))
        np.testing.assert_array_equal(idx_np, idx_jax)


def test_metric_logger_and_strip(tmp_path):
    path = str(tmp_path / "m.jsonl")
    log = MetricLogger(path)
    log.log(10, {"loss": 1.5, "skipme": None, "lr": jnp.asarray(0.1)})
    log.log(20, {"loss": 1.0})
    log.close()
    recs = [json.loads(l) for l in open(path)]
    assert recs[0]["it"] == 10 and recs[0]["loss"] == 1.5
    assert "skipme" not in recs[0] and abs(recs[0]["lr"] - 0.1) < 1e-6

    h = w = 8
    render = {
        "rgb": np.random.rand(h, w, 3),
        "normal": np.random.rand(h, w, 3) * 2 - 1,
        "mask": np.random.rand(h, w) > 0.5,
        "acc": np.random.rand(h, w),
        "phong": np.random.rand(h, w, 3),
    }
    strip = stage1_vis_strip(render, np.random.rand(h, w, 3),
                             np.random.rand(h, w, 3) * 2 - 1,
                             np.ones((h, w)))
    assert strip.shape == (h, w * 8, 3) and strip.dtype == np.uint8


def test_plot_metrics_cli(tmp_path):
    path = str(tmp_path / "m.jsonl")
    with open(path, "w") as f:
        for i in range(5):
            f.write(json.dumps({"it": i, "wall": i * 0.1, "loss": 1.0 / (i + 1),
                                "lr": 0.1}) + "\n")
    from psnerf_tpu.cli.plot_metrics import main

    out = str(tmp_path / "m.png")
    main([path, out])
    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_phase_timer():
    t = PhaseTimer(sync=False)
    t.mark("a")
    t.mark("b", jnp.ones(3))
    s = t.summary()
    assert set(s) == {"a", "b"} and all(v >= 0 for v in s.values())


def test_vis_light_probe():
    env = np.random.rand(16, 32, 3).astype(np.float32)
    img = vis_light_probe(env, 128)
    assert img.shape == (128, 256, 3) and img.dtype == np.uint8


def test_load_envmap_exr_and_png(tmp_path):
    import cv2
    import imageio.v2 as imageio

    from psnerf_tpu.runners.stage2 import load_envmap

    env = (np.random.rand(64, 128, 3) * 3).astype(np.float32)
    # HDR (Radiance RGBE) — this opencv build has no EXR codec
    hdr = str(tmp_path / "e.hdr")
    assert cv2.imwrite(hdr, env[..., ::-1])  # cv2 writes BGR
    loaded = load_envmap(hdr, light_h=16)
    assert loaded.shape == (16, 32, 3)
    assert loaded.max() > 1.0  # HDR values preserved
    # raw npy
    npy = str(tmp_path / "e.npy")
    np.save(npy, env)
    loaded = load_envmap(npy, light_h=16)
    assert loaded.shape == (16, 32, 3) and loaded.max() > 1.0
    png = str(tmp_path / "e.png")
    imageio.imwrite(png, (np.clip(env / 3, 0, 1) * 255).astype(np.uint8))
    loaded = load_envmap(png, light_h=16)
    assert loaded.shape == (16, 32, 3)
    assert 0.0 <= loaded.min() and loaded.max() <= 1.0


def test_metric_logger_tensorboard_mirror(tmp_path):
    """Scalars mirror to TensorBoard event files when tb_dir is given
    (reference workflow: tensorboard --logdir, stage2/trainer.py:89)."""
    pytest.importorskip("tensorboard")
    import glob

    path = str(tmp_path / "m.jsonl")
    log = MetricLogger(path, tb_dir=str(tmp_path / "tb"))
    log.log(5, {"loss": 2.0})
    log.log(10, {"loss": 1.0, "psnr": 30.0})
    log.close()
    assert glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(str(tmp_path / "tb"))
    acc.Reload()
    assert sorted(acc.Tags()["scalars"]) == ["loss", "psnr"]
    assert [(s.step, s.value) for s in acc.Scalars("loss")] == [(5, 2.0), (10, 1.0)]
