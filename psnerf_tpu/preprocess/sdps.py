"""SDPS-Net (uncalibrated photometric stereo preprocessing) in JAX.

Two stages (reference preprocessing/models/):
  * LCNet (LCNet.py:63-159): per-image conv feature extractor shared across
    the L light images, max-fusion over the light axis, 4-conv classifier +
    three 1x1-conv heads -> light direction as two 36-way (azimuth,
    elevation) classifications + intensity as a 20-way classification.
  * NENet (NENet.py:53-108): images normalized by predicted intensity,
    predicted light dir concatenated as 3 extra channels, conv-deconv
    extractor, max-fusion, regressor -> L2-normalized per-pixel normals.

TPU-native: the per-light Python loops become vmap over a leading light
axis; fusion is one jnp.max. Weight layout is torch's (OIHW convs,
IOHW deconvs) so released `.pth.tar` checkpoints convert 1:1
(load_lcnet_torch / load_nenet_torch).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

LEAK = 0.1


# ------------------------------------------------------------ layer helpers

def _kaiming(key, shape):
    # torch kaiming_normal_: std = sqrt(2 / fan_in), fan_in = cin * kh * kw
    fan_in = shape[1] * shape[2] * shape[3]
    return jax.random.normal(key, shape) * math.sqrt(2.0 / fan_in)


def conv_init(key, cin, cout, k, bias=True):
    p = {"w": _kaiming(key, (cout, cin, k, k))}
    if bias:
        p["b"] = jnp.zeros((cout,))
    return p


def deconv_init(key, cin, cout, k=4):
    # torch ConvTranspose2d weight: [cin, cout, kh, kw]
    fan_in = cin * k * k
    w = jax.random.normal(key, (cin, cout, k, k)) * math.sqrt(2.0 / fan_in)
    return {"w": w}


def conv2d(p, x, stride=1, pad=1):
    out = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if "b" in p:
        out = out + p["b"][None, :, None, None]
    return out


def deconv2d(p, x, stride=2, pad=1):
    """ConvTranspose2d(k=4, s=2, p=1) -> output = input * 2. Implemented as
    the equivalent fractionally-strided conv: spatially-flipped kernel,
    lhs_dilation = stride, padding k-1-p. Weight keeps torch's
    [cin, cout, kh, kw] layout for checkpoint conversion."""
    w = jnp.swapaxes(p["w"], 0, 1)[:, :, ::-1, ::-1]  # -> OIHW, flipped
    k = w.shape[2]
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(k - 1 - pad, k - 1 - pad)] * 2,
        lhs_dilation=(stride, stride),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def lrelu(x):
    return jax.nn.leaky_relu(x, LEAK)


# ------------------------------------------------------------------- codecs
# class <-> direction / intensity (preprocessing/utils/eval_utils.py:54-91)

def spherical_dirs_to_class(dirs, cls_num=36):
    theta = jnp.arctan(dirs[:, 0] / (dirs[:, 2] + 1e-8)) / jnp.pi * 180
    denom = jnp.sqrt(dirs[:, 0] ** 2 + dirs[:, 2] ** 2)
    phi = jnp.arctan(dirs[:, 1] / (denom + 1e-8)) / jnp.pi * 180
    az = jnp.clip(((theta + 90.0) / 180 * cls_num), 0, cls_num - 1).astype(int)
    el = jnp.clip(((phi + 90.0) / 180 * cls_num), 0, cls_num - 1).astype(int)
    return az, el


def spherical_class_to_dirs(x_cls, y_cls, cls_num=36):
    theta = (x_cls.astype(jnp.float32) + 0.5) / cls_num * 180 - 90
    phi = (y_cls.astype(jnp.float32) + 0.5) / cls_num * 180 - 90
    neg_y = phi < 0
    theta = jnp.clip(theta, -90, 90) / 180.0 * jnp.pi
    phi = jnp.clip(phi, -90, 90) / 180.0 * jnp.pi
    tan2_phi = jnp.tan(phi) ** 2
    tan2_theta = jnp.tan(theta) ** 2
    y = jnp.sqrt(tan2_phi / (1 + tan2_phi))
    y = jnp.where(neg_y, -y, y)
    z = jnp.sqrt((1 - y * y) / (1 + tan2_theta))
    x = z * jnp.tan(theta)
    dirs = jnp.stack([x, y, z], 1)
    return dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)


def light_ints_to_class(ints, cls_num=20):
    return jnp.clip(((ints - 0.2) / 1.8 * cls_num), 0, cls_num - 1).astype(int)


def class_to_light_ints(cls, cls_num=20):
    return jnp.clip((cls.astype(jnp.float32) + 0.5) / cls_num * 1.8 + 0.2,
                    0.2, 2.0)


# -------------------------------------------------------------------- LCNet

LCNET_FEAT = [  # (cin_key, cout, stride); cin of conv1 set by c_in
    (64, 2), (128, 2), (128, 1), (128, 2), (128, 1), (256, 2), (256, 1)
]
LCNET_CLS = [(256, 1), (256, 2), (256, 2), (256, 2)]


def init_lcnet(key, c_in=4, dirs_cls=36, ints_cls=20):
    keys = iter(jax.random.split(key, 32))
    feat = []
    cin = c_in
    for cout, _ in LCNET_FEAT:
        feat.append(conv_init(next(keys), cin, cout, 3))
        cin = cout
    cls = []
    cin = 512  # feats[i] ++ fused
    for cout, _ in LCNET_CLS:
        cls.append(conv_init(next(keys), cin, cout, 3))
        cin = cout
    heads = {}
    for name, ncls in (("dir_x", dirs_cls), ("dir_y", dirs_cls),
                       ("ints", ints_cls)):
        heads[name] = [conv_init(next(keys), 256, 64, 1),
                       conv_init(next(keys), 64, ncls, 1)]
    return {"feat": feat, "cls": cls, "heads": heads}


def _lcnet_feat(params, x):
    for p, (_, stride) in zip(params["feat"], LCNET_FEAT):
        x = lrelu(conv2d(p, x, stride=stride, pad=1))
    return x


def _lcnet_classify(params, x):
    for p, (_, stride) in zip(params["cls"], LCNET_CLS):
        x = lrelu(conv2d(p, x, stride=stride, pad=1))
    out = {}
    for name, head in params["heads"].items():
        h = lrelu(conv2d(head[0], x, stride=1, pad=0))
        out[name] = conv2d(head[1], h, stride=1, pad=0)
    return out


def lcnet_forward(params, imgs, mask, dirs_cls=36, ints_cls=20):
    """imgs [L, 3, H, W] (H=W=128 canonical), mask [1, H, W].
    Returns dict with dirs [L, 3] (camera frame), intens [L],
    logits dirs_x/dirs_y [L, dirs_cls], ints [L, ints_cls].
    Reference: LCNet.py:126-159 (in_mask=True, in_light=False)."""
    l = imgs.shape[0]
    x = jnp.concatenate(
        [imgs, jnp.broadcast_to(mask[None], (l, 1, *mask.shape[1:]))], axis=1
    )  # [L, 4, H, W]
    feats = jax.vmap(lambda xi: _lcnet_feat(params, xi[None])[0])(x)  # [L,256,h,w]
    fused = jnp.max(feats, axis=0)  # max-fusion over lights (LCNet.py:106-111)

    def classify(fi):
        inp = jnp.concatenate([fi, fused], axis=0)[None]  # [1, 512, h, w]
        return _lcnet_classify(params, inp)

    outs = jax.vmap(classify)(feats)
    dirs_x = outs["dir_x"].reshape(l, -1)
    dirs_y = outs["dir_y"].reshape(l, -1)
    ints = outs["ints"].reshape(l, -1)
    x_idx = jnp.argmax(dirs_x, axis=1)
    y_idx = jnp.argmax(dirs_y, axis=1)
    dirs = spherical_class_to_dirs(x_idx, y_idx, dirs_cls)
    intens = class_to_light_ints(jnp.argmax(ints, axis=1), ints_cls)
    return {"dirs": dirs, "intens": intens, "dirs_x": dirs_x,
            "dirs_y": dirs_y, "ints": ints}


# -------------------------------------------------------------------- NENet

NENET_FEAT = [(64, 1), (128, 2), (128, 1), (256, 2), (256, 1)]


def init_nenet(key, c_in=6):
    keys = iter(jax.random.split(key, 16))
    feat = []
    cin = c_in
    for cout, _ in NENET_FEAT:
        feat.append(conv_init(next(keys), cin, cout, 3))
        cin = cout
    feat_deconv = deconv_init(next(keys), 256, 128)
    feat_out = conv_init(next(keys), 128, 128, 3)
    reg = [conv_init(next(keys), 128, 128, 3),
           conv_init(next(keys), 128, 128, 3)]
    reg_deconv = deconv_init(next(keys), 128, 64)
    est_normal = conv_init(next(keys), 64, 3, 3, bias=False)
    return {"feat": feat, "feat_deconv": feat_deconv, "feat_out": feat_out,
            "reg": reg, "reg_deconv": reg_deconv, "est_normal": est_normal}


def _nenet_feat(params, x):
    for p, (_, stride) in zip(params["feat"], NENET_FEAT):
        x = lrelu(conv2d(p, x, stride=stride, pad=1))
    x = lrelu(deconv2d(params["feat_deconv"], x))
    x = lrelu(conv2d(params["feat_out"], x, stride=1, pad=1))
    return x


def nenet_forward(params, imgs, dirs, intens):
    """imgs [L, 3, H, W] (H, W % 4 == 0); dirs [L, 3]; intens [L] or [L, 3].
    Returns per-pixel normals [3, H, W], unit-norm. Reference:
    NENet.py:71-108 (intensity division :83-85, dir concat :86)."""
    intens = jnp.asarray(intens)
    if intens.ndim == 1:
        intens = jnp.repeat(intens[:, None], 3, axis=1)  # [L, 3]
    norm_imgs = imgs / (intens[:, :, None, None] + 1e-8)
    l, _, h, w = imgs.shape
    x = jnp.concatenate(
        [norm_imgs, jnp.broadcast_to(dirs[:, :, None, None], (l, 3, h, w))],
        axis=1,
    )
    feats = jax.vmap(lambda xi: _nenet_feat(params, xi[None])[0])(x)
    fused = jnp.max(feats, axis=0)[None]  # [1, 128, h/2, w/2]
    y = lrelu(conv2d(params["reg"][0], fused, 1, 1))
    y = lrelu(conv2d(params["reg"][1], y, 1, 1))
    y = lrelu(deconv2d(params["reg_deconv"], y))
    n = conv2d(params["est_normal"], y, 1, 1)[0]  # [3, H, W]
    return n / jnp.maximum(jnp.linalg.norm(n, axis=0, keepdims=True), 1e-12)


# -------------------------------------------------- torch weight conversion

def _t(a):
    return jnp.asarray(np.asarray(a))


def load_lcnet_torch(state_dict: dict, c_in=4, dirs_cls=36, ints_cls=20):
    """Convert the released LCNet checkpoint (state_dict with
    featExtractor.convN.0.* / classifier.convN.0.* / classifier.<head>.N.0.*)."""
    g = lambda k: _t(state_dict[k])
    feat = [{"w": g(f"featExtractor.conv{i+1}.0.weight"),
             "b": g(f"featExtractor.conv{i+1}.0.bias")} for i in range(7)]
    cls = [{"w": g(f"classifier.conv{i+1}.0.weight"),
            "b": g(f"classifier.conv{i+1}.0.bias")} for i in range(4)]
    heads = {}
    for name, key in (("dir_x", "dir_x_est"), ("dir_y", "dir_y_est"),
                      ("ints", "int_est")):
        heads[name] = [
            {"w": g(f"classifier.{key}.0.0.weight"),
             "b": g(f"classifier.{key}.0.0.bias")},
            {"w": g(f"classifier.{key}.1.0.weight"),
             "b": g(f"classifier.{key}.1.0.bias")},
        ]
    return {"feat": feat, "cls": cls, "heads": heads}


def load_nenet_torch(state_dict: dict):
    g = lambda k: _t(state_dict[k])
    feat = [{"w": g(f"extractor.conv{i+1}.0.weight"),
             "b": g(f"extractor.conv{i+1}.0.bias")} for i in range(5)]
    return {
        "feat": feat,
        "feat_deconv": {"w": g("extractor.conv6.0.weight")},
        "feat_out": {"w": g("extractor.conv7.0.weight"),
                     "b": g("extractor.conv7.0.bias")},
        "reg": [{"w": g("regressor.deconv1.0.weight"),
                 "b": g("regressor.deconv1.0.bias")},
                {"w": g("regressor.deconv2.0.weight"),
                 "b": g("regressor.deconv2.0.bias")}],
        "reg_deconv": {"w": g("regressor.deconv3.0.weight")},
        "est_normal": {"w": g("regressor.est_normal.0.weight")},
    }
