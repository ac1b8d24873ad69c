import textwrap

import numpy as np

from psnerf_tpu.config import (
    load_yaml_config,
    parse_hocon,
    hocon_get,
    stage1_config_from_yaml,
    stage2_config_from_conf,
    milestones_epochs_to_iters,
)


def test_parse_hocon_reference_subset():
    conf = parse_hocon(textwrap.dedent("""
        dataset{
            obj_name = bear
            data_dir = ../dataset/bear   # trailing comment
            inten_normalize = sdps
        }
        train{
            light_train = True
            light_bs = 10
            sg_learning_rate = 5e-4
            sg_sched_milestones = [200,400,600,800,1000]
            nested{
                deep = 3
            }
        }
        loss{
            sg_rgb_weight = 1.0
        }
    """))
    assert conf["dataset"]["obj_name"] == "bear"
    assert conf["train"]["light_train"] is True
    assert conf["train"]["light_bs"] == 10
    assert conf["train"]["sg_learning_rate"] == 5e-4
    assert conf["train"]["sg_sched_milestones"] == [200, 400, 600, 800, 1000]
    assert conf["train"]["nested"]["deep"] == 3
    assert hocon_get(conf, "loss.sg_rgb_weight") == 1.0
    assert hocon_get(conf, "missing.key", 42) == 42


def test_reference_bear_conf_parses():
    cfg = stage2_config_from_conf("/root/reference/stage2/confs/bear.conf")
    assert cfg.obj_name == "bear"
    assert cfg.net.render_model == "sgbasis"
    assert cfg.net.nbasis == 9 and cfg.net.specular_rgb
    assert cfg.net.visibility and cfg.net.light_vis_detach and cfg.net.vis_rgb_detach
    assert cfg.net.vis_mlp_width == 256 and cfg.net.vis_mlp_depth == 8
    assert cfg.net.xyz_jitter_std == 0.01
    assert cfg.train.light_train and cfg.train.light_inten_lr == 1e-3
    assert cfg.train.weights.albedo_smooth_weight == 0.05
    assert cfg.train.weights.normal_smooth_weight == 0.05
    assert cfg.light_bs == 10 and cfg.vis_plus and cfg.vis_train_num == 8
    assert cfg.sched_milestones_epochs == (200, 400, 600, 800, 1000)
    assert cfg.normal_train


def test_reference_bear_yaml_parses():
    cfg = stage1_config_from_yaml("/root/reference/stage1/configs/bear.yaml")
    assert cfg.field.num_layers == 8 and cfg.field.hidden_dim == 256
    assert cfg.field.octaves_pe == 6 and cfg.field.skips == (4,)
    assert cfg.render.near == 28 and cfg.render.far == 35
    assert cfg.render.ray_marching_steps == 256
    assert cfg.train.weights.lambda_smooth == 0.005
    assert cfg.train.weights.lambda_normal == 0.05
    assert cfg.train.n_training_points == 2048
    assert cfg.train.milestone_iters == (4000, 8000)  # epochs at parse time
    assert milestones_epochs_to_iters(cfg.train.milestone_iters, 15) == (60000, 120000)
    assert cfg.inten_normalize == "sdps"
    assert cfg.extraction_resolution == 64 and cfg.extraction_upsampling == 3


def test_yaml_inherit_from(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("a:\n  x: 1\n  y: 2\nb: 3\n")
    child = tmp_path / "child.yaml"
    child.write_text(f"inherit_from: {base}\na:\n  y: 20\nc: 4\n")
    cfg = load_yaml_config(str(child))
    assert cfg["a"]["x"] == 1 and cfg["a"]["y"] == 20
    assert cfg["b"] == 3 and cfg["c"] == 4


def test_shipped_configs_parse():
    """The configs/ directory ships ready-to-run configs for every benchmark
    object; all must parse into typed configs."""
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    objs = ["bear", "buddha", "cow", "pot2", "reading", "bunny", "armadillo"]
    cwd = os.getcwd()
    os.chdir(root)  # inherit_from paths are repo-relative
    try:
        for obj in objs:
            c1 = stage1_config_from_yaml(f"configs/stage1/{obj}.yaml")
            assert c1.obj_name == obj and c1.field.hidden_dim == 256
            c2 = stage2_config_from_conf(f"configs/stage2/{obj}.conf")
            assert c2.obj_name == obj and c2.net.specular_rgb
            assert c2.stage1_shape_path.endswith("shape_out")
    finally:
        os.chdir(cwd)


def test_hocon_single_line_blocks_and_separators():
    """pyhocon-style one-liners (stage2/trainer.py:25 accepts these) parse
    identically to their multi-line form."""
    from psnerf_tpu.config import parse_hocon

    multi = parse_hocon("""
train {
    lr = 5e-4
    flag = true
}
net { width = 256 }
""")
    single = parse_hocon(
        "train { lr = 5e-4, flag = true }\nnet { width = 256 }")
    assert single == multi
    assert single["train"]["lr"] == 5e-4
    assert single["net"]["width"] == 256

    nested = parse_hocon("a { b { c = 1 } d = [1, 2, 3] }")
    assert nested == {"a": {"b": {"c": 1}, "d": [1, 2, 3]}}

    # colon separator + quoted strings with comment chars inside
    colon = parse_hocon('k : "a # not-a-comment" // trailing\nm = x.y.Z')
    assert colon == {"k": "a # not-a-comment", "m": "x.y.Z"}

    # duplicate blocks merge (HOCON semantics)
    merged = parse_hocon("a { x = 1 }\na { y = 2 }")
    assert merged == {"a": {"x": 1, "y": 2}}


def test_hocon_rejects_unparsable_syntax():
    import pytest as _pytest

    from psnerf_tpu.config import parse_hocon

    for bad in ["a { b = 1", "a }", "= 3", "key", "a { b }"]:
        with _pytest.raises(ValueError):
            parse_hocon(bad)
