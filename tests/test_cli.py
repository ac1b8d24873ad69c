"""End-to-end CLI smoke: drive the unified CLI through config files on a
synthetic scene — the exact user workflow (stage1-train -> shape-extract ->
extract-mesh -> stage2-train -> stage2-eval -> evaluation)."""

import json
import os

import numpy as np
import pytest

from psnerf_tpu.cli.main import main
from psnerf_tpu.data.synthetic import generate_synthetic_scene


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_ws")
    scene = root / "scene"
    generate_synthetic_scene(str(scene), n_views=2, n_test=1, n_lights=4,
                             hw=(32, 32), radius=0.6, focal=50.0)

    (root / "s1.yaml").write_text(f"""
model:
  num_layers: 6
  hidden_dim: 128
  octaves_pe: 4
  octaves_pe_views: 2
  skips: [4]
  geometric_init: True
  feat_size: 128
  rescale: 1.0
rendering:
  type: unisurf
  n_max_network_queries: 64000
  white_background: True
  near: 1.2
  far: 5.0
  radius: 1.2
  interval_start: 0.6
  interval_end: 0.05
  interval_decay: 0.001
  num_points_in: 16
  num_points_out: 8
  ray_marching_steps: 48
dataloading:
  obj_name: synth
  data_dir: {scene}
  inten_normalize: null
training:
  type: unisurf
  out_dir: {root}/s1_out
  normal_loss: True
  normal_after: 0
  normal_angle: 65
  lambda_normloss: 0.05
  est_norm: True
  mask_loss: True
  lambda_mask: 1.0
  mask_valid: True
  n_training_points: 192
  learning_rate: 0.001
  scheduler_milestones: []
  scheduler_gamma: 0.5
  visualize_every: 100000
  print_every: 50
  backup_every: 100000
  checkpoint_every: 100
  lambda_l1_rgb: 1.0
  lambda_normals: 0.005
extraction:
  refinement_step: 0
  upsampling_steps: 1
  resolution: 12
""")

    (root / "s2.conf").write_text(f"""
dataset{{
    obj_name = synth
    data_dir = {scene}
}}
train{{
    expname = cli_test
    light_train = True
    multi_light = True
    light_bs = 3
    light_init = pred
    light_inten_train = True
    light_inten_init = pred
    light_learning_rate = 5e-4
    light_inten_lr = 1e-3
    light_decay = True
    render_model = sgbasis
    nbasis = 9
    specular_rgb = True
    visibility = True
    vis_loss = True
    vis_plus = True
    vis_train_num = 3
    light_vis_detach = True
    vis_rgb_detach = True
    normal_mlp = True
    normal_joint = True
    shape_pregen = True
    stage1_shape_path = {root}/s1_out/shape_out
    train_order = True
    sample_in_mask = True
    plot_freq = 100000
    ckpt_freq = 100000
    num_pixels = 128
    train_all_pixels = False
    sg_learning_rate = 1e-3
    sg_sched_milestones = []
    sg_sched_factor = 0.5
}}
loss{{
    sg_rgb_weight = 1.0
    loss_type = L1
    albedo_smooth_weight = 0.05
    rough_smooth_weight = 0.01
    vis_weight = 1
}}
brdf{{
    net{{
        n_freqs_xyz = 6
        mlp_width = 32
        mlp_depth = 4
        mlp_skip_at = 2
        xyz_jitter_std = 0.01
    }}
    sgnet{{
        mlp_width = 16
        mlp_depth = 2
        mlp_skip_at = -1
    }}
    fresnel_f0 = 0.05
    light_intensity = 1.2
}}
normal{{
    net{{
        n_freqs_xyz = 6
        mlp_width = 32
        mlp_depth = 4
        mlp_skip_at = 2
        xyz_jitter_std = 0.0
    }}
    loss{{
        normal_weight = 1
        normal_smooth_weight = 0.05
    }}
}}
visibility{{
    net{{
        n_freqs_xyz = 6
        mlp_width = 32
        mlp_depth = 4
        mlp_skip_at = 2
    }}
}}
""")
    return root


def test_cli_full_workflow(workspace, capsys):
    root = str(workspace)
    scene = os.path.join(root, "scene")

    main(["stage1-train", f"{root}/s1.yaml", "--max-iters", "60",
          "--workdir", f"{root}/s1_out"])
    assert os.path.exists(f"{root}/s1_out/checkpoints/model.npz")

    main(["shape-extract", f"{root}/s1.yaml", "--workdir", f"{root}/s1_out",
          "--vis_plus", "--vis_plus_num", "4"])
    assert os.path.exists(f"{root}/s1_out/shape_out/points/view_01.npy")
    assert os.path.exists(f"{root}/s1_out/shape_out/vis_plus/light_dir.json")

    main(["extract-mesh", f"{root}/s1.yaml", "--workdir", f"{root}/s1_out",
          "--resolution0", "12", "--upsampling", "1"])
    assert os.path.exists(f"{root}/s1_out/mesh.ply")

    main(["stage2-train", "--conf", f"{root}/s2.conf", "--max-iters", "50",
          "--workdir", f"{root}/s2_out"])
    assert os.path.exists(f"{root}/s2_out/checkpoints/model.npz")

    main(["stage2-eval", "--conf", f"{root}/s2.conf",
          "--workdir", f"{root}/s2_out", "--out", f"{root}/test_out"])
    assert os.path.exists(f"{root}/test_out/rgb/img/view_03/001.png")

    main(["evaluation", "--data_path", scene,
          "--test_out_path", f"{root}/test_out"])
    out = capsys.readouterr().out
    res = json.loads("{" + out.rsplit("{", 1)[1])
    assert "psnr" in res and np.isfinite(res["psnr"])

    # material edit + envmap relight through the CLI
    envmap = os.path.join(root, "env.npy")
    env = np.full((16, 32, 3), 0.002, np.float32)
    env[4:8, 10:16] = 0.03
    np.save(envmap, env)
    main(["stage2-eval", "--conf", f"{root}/s2.conf",
          "--workdir", f"{root}/s2_out", "--out", f"{root}/relight",
          "--render_envmap", "--envmap_path", envmap])
    assert os.path.exists(f"{root}/relight/rgb/img/view_03.png")
    assert os.path.exists(f"{root}/relight/light_probe.png")

    main(["stage2-eval", "--conf", f"{root}/s2.conf",
          "--workdir", f"{root}/s2_out", "--out", f"{root}/edit",
          "--edit_albedo", "--color", "#cc2010", "--edit_specular",
          "--basis", "3"])
    assert os.path.exists(f"{root}/edit/rgb/img/view_03/001.png")


def test_cli_mesh_devices_training(workspace):
    """--mesh-devices N trains data-parallel over an N-device mesh through
    the CLI (the runner-level parity is pinned in test_parallel.py)."""
    root = str(workspace)
    main(["stage1-train", f"{root}/s1.yaml", "--max-iters", "4",
          "--workdir", f"{root}/s1_mesh", "--no-resume",
          "--mesh-devices", "8"])
    assert os.path.exists(f"{root}/s1_mesh/checkpoints/model.npz")
