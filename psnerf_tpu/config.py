"""Unified typed configuration.

One dataclass tree per stage (SURVEY.md §5.6 calls for unifying the
reference's three config systems). Loaders accept:
  * stage-1 YAML with recursive `inherit_from` merge
    (stage1/dataloading/configloading.py:3-47)
  * stage-2 HOCON `.conf` files via a minimal built-in reader (pyhocon is not
    in this image; the reference confs use only `key = value`, nested blocks,
    lists, comments — confs/bear.conf)
"""

from __future__ import annotations

import dataclasses
import os
import re
from typing import Any

import yaml

from psnerf_tpu.fields.occupancy import OccFieldConfig
from psnerf_tpu.fields.psnet import PSNetConfig
from psnerf_tpu.render.unisurf import UnisurfConfig
from psnerf_tpu.train.losses import Stage1LossWeights, Stage2LossWeights
from psnerf_tpu.train.stage1 import Stage1TrainConfig
from psnerf_tpu.train.stage2 import Stage2TrainConfig


# --------------------------------------------------------------- yaml loading

def load_yaml_config(path: str) -> dict:
    """YAML with recursive inherit_from merge (configloading.py:3-47)."""
    with open(path) as f:
        cfg_special = yaml.safe_load(f)
    inherit_from = cfg_special.get("inherit_from")
    if inherit_from is not None:
        cfg = load_yaml_config(inherit_from)
    else:
        cfg = {}
    _update_recursive(cfg, cfg_special)
    return cfg


def _update_recursive(dict1: dict, dict2: dict) -> None:
    for k, v in dict2.items():
        if k not in dict1:
            dict1[k] = {}
        if isinstance(v, dict):
            _update_recursive(dict1[k], v)
        else:
            dict1[k] = v


# --------------------------------------------------------- mini-HOCON loading

def load_hocon(path: str) -> dict:
    with open(path) as f:
        text = f.read()
    return parse_hocon(text)


def _strip_hocon_comments(text: str) -> str:
    """Remove `#` / `//` comments outside double quotes, line by line."""
    out_lines = []
    for line in text.splitlines():
        in_q = False
        cut = len(line)
        i = 0
        while i < len(line):
            c = line[i]
            if c == '"':
                in_q = not in_q
            elif not in_q and (c == "#" or line[i:i + 2] == "//"):
                cut = i
                break
            i += 1
        out_lines.append(line[:cut])
    return "\n".join(out_lines)


def parse_hocon(text: str) -> dict:
    """Parse the HOCON subset used by the reference confs (pyhocon at
    stage2/trainer.py:25): nested `name { ... }` blocks — multi-line OR
    single-line, `key = value` / `key : value`, `,` or newline separators,
    `#`/`//` comments, bools/ints/floats/lists/strings (unquoted strings
    allowed). Unsupported syntax raises ValueError instead of silently
    misparsing."""
    src = _strip_hocon_comments(text)
    pos = 0
    n = len(src)

    def err(msg):
        line = src.count("\n", 0, pos) + 1
        raise ValueError(f"HOCON parse error at line {line}: {msg}")

    def skip_ws(include_sep=True):
        nonlocal pos
        seps = " \t\r\n," if include_sep else " \t"
        while pos < n and src[pos] in seps:
            pos += 1

    def read_key():
        nonlocal pos
        start = pos
        while pos < n and src[pos] not in "=:{}\n":
            pos += 1
        key = src[start:pos].strip()
        if not key:
            err("expected a key")
        if pos >= n or src[pos] == "\n" or src[pos] == "}":
            err(f"key {key!r} has no value or block")
        return key

    def read_balanced(open_c, close_c):
        nonlocal pos
        start = pos
        depth = 0
        while pos < n:
            c = src[pos]
            if c == '"':
                pos += 1
                while pos < n and src[pos] != '"':
                    pos += 1
            elif c == open_c:
                depth += 1
            elif c == close_c:
                depth -= 1
                if depth == 0:
                    pos += 1
                    return src[start:pos]
            pos += 1
        err(f"unbalanced {open_c}{close_c}")

    def read_value():
        nonlocal pos
        skip_ws(include_sep=False)
        if pos >= n:
            err("expected a value")
        c = src[pos]
        if c == "{":
            pos += 1
            return read_object(stop_at_brace=True)
        if c == "[":
            return _hocon_value(" ".join(read_balanced("[", "]").split()))
        if c == '"':
            start = pos
            pos += 1
            while pos < n and src[pos] != '"':
                pos += 1
            if pos >= n:
                err("unterminated string")
            pos += 1
            return src[start + 1:pos - 1]
        start = pos
        while pos < n and src[pos] not in "\n,}":
            pos += 1
        v = src[start:pos].strip()
        if not v:
            err("empty value")
        return _hocon_value(v)

    def read_object(stop_at_brace: bool) -> dict:
        nonlocal pos
        obj: dict = {}
        while True:
            skip_ws()
            if pos >= n:
                if stop_at_brace:
                    err("unbalanced braces")
                return obj
            if src[pos] == "}":
                if not stop_at_brace:
                    err("unbalanced braces")
                pos += 1
                return obj
            key = read_key()
            if src[pos] == "{":
                pos += 1
                child = read_object(stop_at_brace=True)
            else:
                pos += 1  # '=' or ':'
                child = read_value()
            if isinstance(child, dict) and isinstance(obj.get(key), dict):
                _update_recursive(obj[key], child)
            else:
                obj[key] = child

    return read_object(stop_at_brace=False)


def _hocon_value(v: str) -> Any:
    if v.startswith("[") and v.endswith("]"):
        inner = v[1:-1].strip()
        return [] if not inner else [_hocon_value(x.strip()) for x in inner.split(",")]
    if v.startswith('"') and v.endswith('"'):
        return v[1:-1]
    low = v.lower()
    if low in ("true", "false"):
        return low == "true"
    if re.fullmatch(r"[+-]?\d+", v):
        return int(v)
    try:
        return float(v)
    except ValueError:
        return v


def hocon_get(conf: dict, dotted: str, default=None):
    cur = conf
    for part in dotted.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return default
        cur = cur[part]
    return cur


# ------------------------------------------------------------- typed configs

@dataclasses.dataclass(frozen=True)
class Stage1Config:
    field: OccFieldConfig
    render: UnisurfConfig
    train: Stage1TrainConfig
    data_dir: str = ""
    obj_name: str = ""
    out_dir: str = "out"
    inten_normalize: str | None = "sdps"
    train_view: int | None = None
    train_light: int | None = None
    all_view: bool = False
    mask_black: bool = False
    est_norm: bool = True
    visualize_every: int = 10000
    print_every: int = 200
    backup_every: int = 10000
    checkpoint_every: int = 5000
    max_iters: int = 100000
    extraction_resolution: int = 64
    extraction_upsampling: int = 3
    extraction_refinement: int = 0


def stage1_config_from_yaml(path: str) -> Stage1Config:
    cfg = load_yaml_config(path)
    m, r, t, d = cfg["model"], cfg["rendering"], cfg["training"], cfg["dataloading"]
    e = cfg.get("extraction", {})
    field = OccFieldConfig(
        num_layers=m["num_layers"], hidden_dim=m["hidden_dim"],
        octaves_pe=m["octaves_pe"], octaves_pe_views=m["octaves_pe_views"],
        skips=tuple(m["skips"]), feat_size=m["feat_size"],
        rescale=m["rescale"], geometric_init=m["geometric_init"],
        compute_dtype=m.get("compute_dtype", "float32"),
    )
    render = UnisurfConfig(
        near=r["near"], far=r["far"], radius=r["radius"],
        interval_start=r["interval_start"], interval_end=r["interval_end"],
        interval_decay=r["interval_decay"], num_points_in=r["num_points_in"],
        num_points_out=r["num_points_out"],
        ray_marching_steps=r["ray_marching_steps"],
        white_background=r["white_background"],
    )
    weights = Stage1LossWeights(
        lambda_rgb=t.get("lambda_l1_rgb", 1.0),
        lambda_smooth=t.get("lambda_normals", 0.005),
        lambda_normal=t.get("lambda_normloss", 1.0),
        lambda_mask=t.get("lambda_mask", 1.0),
        use_mask_loss=t.get("mask_loss", False),
    )
    # reference milestones are EPOCHS (scheduler stepped per epoch,
    # stage1/train.py:135); convert to iterations via views-per-epoch later —
    # callers pass dataset length through `milestones_epochs_to_iters`.
    train = Stage1TrainConfig(
        learning_rate=t.get("learning_rate", 1e-4),
        weight_decay=t.get("weight_decay", 0.0),
        milestone_iters=tuple(t.get("scheduler_milestones", [])),
        gamma=t.get("scheduler_gamma", 0.5),
        n_training_points=t.get("n_training_points", 2048),
        normal_after=t.get("normal_after", 1000),
        weights=weights,
    )
    return Stage1Config(
        field=field, render=render, train=train,
        data_dir=d["data_dir"], obj_name=d.get("obj_name", ""),
        out_dir=t.get("out_dir", "out"),
        inten_normalize=d.get("inten_normalize"),
        train_view=d.get("train_view"), train_light=d.get("train_light"),
        all_view=d.get("all_view", False),
        mask_black=t.get("mask_black", False),
        est_norm=t.get("est_norm", True),
        visualize_every=t.get("visualize_every", 10000),
        print_every=t.get("print_every", 200),
        backup_every=t.get("backup_every", 10000),
        checkpoint_every=t.get("checkpoint_every", 5000),
        extraction_resolution=e.get("resolution", 64),
        extraction_upsampling=e.get("upsampling_steps", 3),
        extraction_refinement=e.get("refinement_step", 0),
    )


def milestones_epochs_to_iters(milestones, views_per_epoch: int):
    return tuple(int(m) * int(views_per_epoch) for m in milestones)


@dataclasses.dataclass(frozen=True)
class Stage2Config:
    net: PSNetConfig
    train: Stage2TrainConfig
    data_dir: str = ""
    obj_name: str = ""
    expname: str = "default"
    stage1_shape_path: str = ""
    inten_normalize: str | None = "sdps"
    train_view: int | None = None
    train_light: int | None = None
    all_view: bool = False
    multi_light: bool = True
    light_bs: int = 10
    light_init: str = "pred"
    light_inten_init: str = "same"
    num_pixels: int = 8192
    train_all_pixels: bool = True
    sample_in_mask: bool = True
    vis_loss: bool = True
    vis_plus: bool = True
    vis_train_num: int = 8
    # on-device image store: "auto" keeps 8-bit PNG bytes (bit-exact after
    # the on-device /255, 4x less transfer+HBM), "f32" forces float
    image_store: str = "auto"
    normal_train: bool = True
    plot_freq: int = 1000
    ckpt_freq: int = 1000
    nepochs: int = 20000
    sched_milestones_epochs: tuple = ()


def stage2_config_from_conf(path: str) -> Stage2Config:
    c = load_hocon(path)
    g = lambda k, d=None: hocon_get(c, k, d)
    net = PSNetConfig(
        render_model=g("train.render_model", "sgbasis"),
        nbasis=g("train.nbasis", 9),
        specular_rgb=g("train.specular_rgb", False),
        fresnel_f0=g("brdf.fresnel_f0", 0.05),
        light_int=g("brdf.light_intensity", 4.0),
        n_freqs_xyz=g("brdf.net.n_freqs_xyz", 10),
        mlp_width=g("brdf.net.mlp_width", 128),
        mlp_depth=g("brdf.net.mlp_depth", 4),
        mlp_skip_at=g("brdf.net.mlp_skip_at", 2),
        xyz_jitter_std=g("brdf.net.xyz_jitter_std", 0.0),
        sg_mlp_width=g("brdf.sgnet.mlp_width", 64),
        sg_mlp_depth=g("brdf.sgnet.mlp_depth", 2),
        sg_mlp_skip_at=g("brdf.sgnet.mlp_skip_at", -1),
        normal_mlp=g("train.normal_mlp", False),
        normal_joint=g("train.normal_joint", False),
        normal_n_freqs_xyz=g("normal.net.n_freqs_xyz", 10),
        normal_mlp_width=g("normal.net.mlp_width", 128),
        normal_mlp_depth=g("normal.net.mlp_depth", 4),
        normal_mlp_skip_at=g("normal.net.mlp_skip_at", 2),
        normal_jitter_std=g("normal.net.xyz_jitter_std", 0.0),
        visibility=g("train.visibility", False),
        light_vis_detach=g("train.light_vis_detach", False),
        vis_rgb_detach=g("train.vis_rgb_detach", False),
        vis_mlp_width=g("visibility.net.mlp_width", 256),
        vis_mlp_depth=g("visibility.net.mlp_depth", 8),
        vis_mlp_skip_at=g("visibility.net.mlp_skip_at", 4),
    )
    weights = Stage2LossWeights(
        sg_rgb_weight=g("loss.sg_rgb_weight", 1.0),
        loss_type=g("loss.loss_type", "L1"),
        albedo_smooth_weight=g("loss.albedo_smooth_weight", 0.0),
        rough_smooth_weight=g("loss.rough_smooth_weight", 0.0),
        vis_weight=g("loss.vis_weight", 1.0),
        normal_weight=g("normal.loss.normal_weight", 1.0),
        normal_smooth_weight=g("normal.loss.normal_smooth_weight", 0.0),
    )
    train = Stage2TrainConfig(
        sg_learning_rate=g("train.sg_learning_rate", 5e-4),
        light_learning_rate=g("train.light_learning_rate", 5e-4),
        light_inten_lr=g("train.light_inten_lr",
                         g("train.light_learning_rate", 5e-4)),
        gamma=g("train.sg_sched_factor", 0.5),
        light_train=g("train.light_train", False),
        light_inten_train=g("train.light_inten_train", False),
        light_decay=g("train.light_decay", False),
        train_order=g("train.train_order", False),
        ana_fixlight=g("train.ana_fixlight", False),
        weights=weights,
    )
    return Stage2Config(
        net=net, train=train,
        data_dir=g("dataset.data_dir", ""),
        obj_name=g("dataset.obj_name", ""),
        expname=g("train.expname", "default"),
        stage1_shape_path=g("train.stage1_shape_path", ""),
        inten_normalize=g("dataset.inten_normalize"),
        train_view=g("dataset.train_view"),
        train_light=g("dataset.train_light"),
        all_view=g("dataset.all_view", False),
        multi_light=g("train.multi_light", False),
        light_bs=g("train.light_bs", 32),
        light_init=g("train.light_init", "pred"),
        light_inten_init=g("train.light_inten_init", "same"),
        num_pixels=g("train.num_pixels", 8192),
        train_all_pixels=g("train.train_all_pixels", False),
        sample_in_mask=g("train.sample_in_mask", False),
        vis_loss=g("train.vis_loss", False),
        vis_plus=g("train.vis_plus", False),
        vis_train_num=g("train.vis_train_num", 16),
        normal_train=g("train.normal_mlp", False) and g("train.normal_joint", False),
        plot_freq=g("train.plot_freq", 1000),
        ckpt_freq=g("train.ckpt_freq", 1000),
        sched_milestones_epochs=tuple(g("train.sg_sched_milestones", []) or []),
    )
