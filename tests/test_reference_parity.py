"""Direct numerical parity against the ACTUAL reference implementation.

Unlike tests/test_convert.py (which re-derives the reference math in torch to
validate the converter), this file imports /root/reference's own modules —
stage1.model.network.NeuralNetwork, the stage1 unisurf Renderer,
stage2.model.renderer.PSNetwork, SGBasis, Microfacet, MainLoss/NormalLoss,
stage1 Loss — drives them and the psnerf_tpu equivalents with converted
weights and identical inputs, and asserts numerical agreement.

Reference anchors: stage1/model/network.py:14-138,
stage1/model/rendering.py:50-226, stage2/model/renderer.py:110-266,
stage2/model/sgbasis.py:7-32, stage2/model/microfacet.py:26-114,
stage2/model/loss.py:6-141, stage1/model/losses.py:6-70.

All randomized paths are disabled (add_noise=False / eval_ / jitter std 0),
so the comparisons are deterministic. torch runs on CPU.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from psnerf_tpu.convert import stage1_params_from_torch, stage2_params_from_torch
from psnerf_tpu.fields import (
    OccFieldConfig,
    PSNetConfig,
    init_psnet,
    microfacet_brdf,
    occ_alpha,
    occ_gradient,
    sg_basis,
)
from psnerf_tpu.fields.occupancy import occ_logit, radiance_and_alpha
from psnerf_tpu.render import UnisurfConfig, render_psnet, render_unisurf
from psnerf_tpu.train.losses import (
    Stage1LossWeights,
    Stage2LossWeights,
    stage1_loss,
    stage2_loss,
)

REF_STAGE1 = "/root/reference/stage1"
REF_STAGE2 = "/root/reference/stage2"

_REF_CACHE: dict = {}


def _purge_ref_modules():
    for name in list(sys.modules):
        if name in ("model", "utils") or name.startswith(("model.", "utils.")):
            del sys.modules[name]


def _ref(stage: str) -> dict:
    """Import the reference modules of one stage, isolated from the other
    stage's identically-named top-level packages."""
    if stage in _REF_CACHE:
        return _REF_CACHE[stage]

    # loss.py calls .cuda() unconditionally; there is no GPU here.
    if not getattr(torch.Tensor, "_psnerf_cuda_patched", False):
        torch.Tensor.cuda = lambda self, *a, **k: self
        torch.Tensor._psnerf_cuda_patched = True
    # stage2/utils/rend_util.py downloads a freeimage plugin at import time
    # (zero-egress here).
    try:
        import imageio

        imageio.plugins.freeimage.download = lambda *a, **k: None
    except Exception:
        pass
    # rend_util.py imports skimage (not installed here) but never uses it on
    # the get_camera_params path PSNetwork needs.
    if "skimage" not in sys.modules:
        import types

        sys.modules["skimage"] = types.ModuleType("skimage")

    root = REF_STAGE1 if stage == "stage1" else REF_STAGE2
    _purge_ref_modules()
    sys.path.insert(0, root)
    try:
        if stage == "stage1":
            from model.losses import Loss
            from model.network import NeuralNetwork
            from model.rendering import Renderer

            mods = {"NeuralNetwork": NeuralNetwork, "Renderer": Renderer,
                    "Loss": Loss}
        else:
            from model.loss import MainLoss, NormalLoss
            from model.microfacet import Microfacet
            from model.renderer import PSNetwork
            from model.sgbasis import SGBasis

            mods = {
                "PSNetwork": PSNetwork, "SGBasis": SGBasis,
                "Microfacet": Microfacet, "MainLoss": MainLoss,
                "NormalLoss": NormalLoss,
            }
    finally:
        sys.path.remove(root)
        _purge_ref_modules()
    _REF_CACHE[stage] = mods
    return mods


def _t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def _n(x):
    return x.detach().cpu().numpy()


# --------------------------------------------------------------- stage1 field

S1_CFG_ALL = {
    "model": {
        "num_layers": 4, "hidden_dim": 64, "octaves_pe": 6,
        "octaves_pe_views": 4, "skips": [2], "geometric_init": True,
        "feat_size": 64, "rescale": 1.0,
    }
}
S1_FIELD_CFG = OccFieldConfig(
    num_layers=4, hidden_dim=64, octaves_pe=6, octaves_pe_views=4,
    skips=(2,), feat_size=64, rescale=1.0,
)


@pytest.fixture(scope="module")
def stage1_pair():
    ref = _ref("stage1")
    torch.manual_seed(0)
    net = ref["NeuralNetwork"](S1_CFG_ALL).eval()
    params = stage1_params_from_torch(net.state_dict())
    return net, params


def test_stage1_network_occupancy_parity(stage1_pair):
    """network.py:85-95 / :125 — occupancy logits + probability."""
    net, params = stage1_pair
    rng = np.random.default_rng(1)
    p = rng.uniform(-1.1, 1.1, size=(257, 3)).astype(np.float32)

    ref_occ = _n(net(_t(p), only_occupancy=True))[:, 0]
    got_occ = np.asarray(occ_alpha(params, jnp.asarray(p), S1_FIELD_CFG))
    np.testing.assert_allclose(got_occ, ref_occ, atol=2e-6, rtol=0)

    ref_logit = _n(net(_t(p), return_logits=True))[:, 0]  # -1 * raw logit
    got_logit = -np.asarray(occ_logit(params, jnp.asarray(p), S1_FIELD_CFG))
    np.testing.assert_allclose(got_logit, ref_logit, atol=2e-6, rtol=0)


def test_stage1_network_rgb_parity(stage1_pair):
    """network.py:126-136 — appearance head with autograd normals."""
    net, params = stage1_pair
    rng = np.random.default_rng(2)
    p = rng.uniform(-0.9, 0.9, size=(131, 3)).astype(np.float32)
    rd = rng.normal(size=(131, 3)).astype(np.float32)

    ref_rgb, ref_alpha = net(_t(p), ray_d=_t(rd), return_addocc=True)
    got_rgb, got_alpha = radiance_and_alpha(
        params, jnp.asarray(p), jnp.asarray(rd), S1_FIELD_CFG
    )
    np.testing.assert_allclose(np.asarray(got_rgb), _n(ref_rgb), atol=1e-5, rtol=0)
    np.testing.assert_allclose(
        np.asarray(got_alpha), _n(ref_alpha)[:, 0], atol=2e-6, rtol=0
    )


def test_stage1_network_gradient_parity(stage1_pair):
    """network.py:108-120 — autograd occupancy gradient vs jax.grad."""
    net, params = stage1_pair
    rng = np.random.default_rng(3)
    p = rng.uniform(-0.9, 0.9, size=(97, 3)).astype(np.float32)

    ref_g = _n(net.gradient(_t(p), tflag=False))[:, 0, :]
    got_g = np.asarray(occ_gradient(params, jnp.asarray(p), S1_FIELD_CFG))
    np.testing.assert_allclose(got_g, ref_g, atol=1e-4, rtol=1e-4)


# ------------------------------------------------------------- stage1 renderer

S1_RENDER_CFG = {
    "near": 1.0, "far": 5.0, "radius": 2.0,
    "interval_start": 2.0, "interval_end": 0.1, "interval_decay": 1.5e-5,
    "num_points_in": 32, "num_points_out": 16, "ray_marching_steps": 128,
    "n_max_network_queries": 64000, "white_background": True,
}
S1_RCFG = UnisurfConfig(
    near=1.0, far=5.0, radius=2.0, interval_start=2.0, interval_end=0.1,
    interval_decay=1.5e-5, num_points_in=32, num_points_out=16,
    ray_marching_steps=128, white_background=True,
)


def _camera():
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.0, 0.0, -3.0]
    k = np.asarray(
        [[100.0, 0, 16, 0], [0, 100.0, 16, 0], [0, 0, 1, 0], [0, 0, 0, 1.0]],
        dtype=np.float32,
    )
    return k, pose


def test_stage1_unisurf_render_parity(stage1_pair):
    """Full deterministic unisurf eval render (rendering.py:50-226):
    identical camera, converted weights, noise off, same step grids."""
    net, params = stage1_pair
    ref = _ref("stage1")
    renderer = ref["Renderer"](net, {"rendering": S1_RENDER_CFG}, device=None)

    k, pose = _camera()
    w = h = 32
    xs, ys = np.meshgrid(
        np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32),
        indexing="ij",
    )
    pix = np.stack([xs.ravel(), ys.ravel()], -1) + 0.5  # [N, 2]

    it = 100000
    with torch.no_grad():
        ref_out = renderer(
            _t(pix)[None], _t(k)[None], _t(pose)[None], None,
            "unisurf", add_noise=False, eval_=True, it=it,
        )

    got = render_unisurf(
        params, S1_FIELD_CFG, S1_RCFG, jnp.asarray(pix), jnp.asarray(k),
        jnp.asarray(pose), it=float(it), key=None, use_outside=True,
        train=False,
    )

    ref_mask = _n(ref_out["mask_pred"]).astype(bool).ravel()
    got_mask = np.asarray(got["mask_pred"])
    np.testing.assert_array_equal(got_mask, ref_mask)
    assert ref_mask.sum() > 50  # the geometric-init sphere is visible

    ref_rgb = _n(ref_out["rgb"])[0]
    got_rgb = np.asarray(got["rgb"])
    np.testing.assert_allclose(got_rgb, ref_rgb, atol=5e-4, rtol=0)

    ref_acc = _n(ref_out["acc_map"])[0]
    np.testing.assert_allclose(np.asarray(got["acc_map"]), ref_acc,
                               atol=5e-4, rtol=0)

    # normals agree in angle on surface rays (secant float noise shifts the
    # surface point by <1e-4, so compare directions, not raw components)
    ref_nrm = _n(ref_out["normal_pred"])[0][ref_mask]
    got_nrm = np.asarray(got["normal_pred"])[got_mask]
    cos = np.sum(ref_nrm * got_nrm, -1) / (
        np.linalg.norm(ref_nrm, axis=-1) * np.linalg.norm(got_nrm, axis=-1)
    )
    assert np.all(cos > 1.0 - 1e-6)


# --------------------------------------------------------------- stage2 BRDFs


def test_sgbasis_parity():
    """sgbasis.py:7-32, both weight layouts."""
    ref = _ref("stage2")
    rng = np.random.default_rng(4)
    n = 211
    l = rng.normal(size=(n, 3)).astype(np.float32)
    v = rng.normal(size=(n, 3)).astype(np.float32)
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    albedo = rng.uniform(size=(n, 3)).astype(np.float32)

    for specular_rgb in (False, True):
        nw = 27 if specular_rgb else 9
        w = rng.uniform(-0.5, 2.0, size=(n, nw)).astype(np.float32)
        sg = ref["SGBasis"](nbasis=9, specular_rgb=specular_rgb)
        ref_brdf, ref_spec = sg(
            v=_t(v), n=_t(nrm), l=_t(l), albedo=_t(albedo), weights=_t(w)
        )
        got_brdf, got_spec = sg_basis(
            v=jnp.asarray(v), n=jnp.asarray(nrm), l=jnp.asarray(l),
            albedo=jnp.asarray(albedo), weights=jnp.asarray(w),
            specular_rgb=specular_rgb, nbasis=9,
        )
        np.testing.assert_allclose(np.asarray(got_brdf), _n(ref_brdf),
                                   atol=1e-5, rtol=0)
        np.testing.assert_allclose(np.asarray(got_spec), _n(ref_spec),
                                   atol=1e-5, rtol=0)


def test_microfacet_parity():
    """microfacet.py:26-114 — GGX D/G, Schlick F, divide_no_nan guards."""
    ref = _ref("stage2")
    rng = np.random.default_rng(5)
    n, lnum = 101, 7
    pts2l = rng.normal(size=(n, lnum, 3)).astype(np.float32)
    pts2c = rng.normal(size=(n, 3)).astype(np.float32)
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    albedo = rng.uniform(size=(n, 3)).astype(np.float32)
    rough = rng.uniform(0.05, 1.0, size=(n, 1)).astype(np.float32)

    mf = ref["Microfacet"](f0=0.05)
    ref_brdf = mf(_t(pts2l), _t(pts2c), _t(nrm), albedo=_t(albedo),
                  rough=_t(rough))  # [N, L, 3]

    got = jax.vmap(
        lambda l: microfacet_brdf(
            l=l, v=jnp.asarray(pts2c), n=jnp.asarray(nrm),
            albedo=jnp.asarray(albedo), rough=jnp.asarray(rough), f0=0.05,
        )
    )(jnp.asarray(np.transpose(pts2l, (1, 0, 2))))  # [L, N, 3]
    got = np.transpose(np.asarray(got), (1, 0, 2))
    np.testing.assert_allclose(got, _n(ref_brdf), atol=1e-4, rtol=1e-4)


# ------------------------------------------------------------ stage2 PSNetwork


class _Conf:
    """pyhocon-shaped shim over a flat dict (PSNetwork only uses typed
    getters with dotted keys, trainer.py:34-52 style)."""

    _SENTINEL = object()

    def __init__(self, d):
        self._d = d

    def _get(self, key, default):
        if key in self._d:
            return self._d[key]
        if default is self._SENTINEL:
            raise KeyError(key)
        return default

    def get_string(self, key, default=_SENTINEL):
        return str(self._get(key, default))

    def get_int(self, key, default=_SENTINEL):
        return int(self._get(key, default))

    def get_float(self, key, default=_SENTINEL):
        return float(self._get(key, default))

    def get_bool(self, key, default=_SENTINEL):
        return bool(self._get(key, default))


PSNET_CONF = {
    "train.render_model": "sgbasis",
    "train.nbasis": 9,
    "train.specular_rgb": True,
    "brdf.net.n_freqs_xyz": 10,
    "brdf.net.mlp_width": 64,
    "brdf.net.mlp_depth": 4,
    "brdf.net.mlp_skip_at": 2,
    "brdf.sgnet.mlp_width": 32,
    "brdf.sgnet.mlp_depth": 2,
    "brdf.sgnet.mlp_skip_at": -1,
    "brdf.light_intensity": 2.0,
    "brdf.net.xyz_jitter_std": 0.0,
    "train.shape_pregen": True,
    "train.normal_mlp": True,
    "train.normal_joint": True,
    "normal.net.n_freqs_xyz": 10,
    "normal.net.mlp_width": 64,
    "normal.net.mlp_depth": 4,
    "normal.net.mlp_skip_at": 2,
    "normal.net.xyz_jitter_std": 0.0,
    "train.visibility": True,
    "train.light_vis_detach": True,
    "train.vis_rgb_detach": True,
    "visibility.net.mlp_width": 64,
    "visibility.net.mlp_depth": 4,
    "visibility.net.mlp_skip_at": 2,
}
PSNET_CFG = PSNetConfig(
    render_model="sgbasis", nbasis=9, specular_rgb=True, light_int=2.0,
    n_freqs_xyz=10, mlp_width=64, mlp_depth=4, mlp_skip_at=2,
    xyz_jitter_std=0.0, sg_mlp_width=32, sg_mlp_depth=2, sg_mlp_skip_at=-1,
    normal_mlp=True, normal_joint=True, normal_n_freqs_xyz=10,
    normal_mlp_width=64, normal_mlp_depth=4, normal_mlp_skip_at=2,
    normal_jitter_std=0.0, visibility=True, light_vis_detach=True,
    vis_rgb_detach=True, vis_mlp_width=64, vis_mlp_depth=4, vis_mlp_skip_at=2,
)


@pytest.fixture(scope="module")
def psnet_pair():
    ref = _ref("stage2")
    torch.manual_seed(7)
    net = ref["PSNetwork"](_Conf(PSNET_CONF)).eval()
    params = {"model": stage2_params_from_torch(net.state_dict())["model"]}
    return net, params


def _psnet_inputs(n=97, lnum=5, lv=3, seed=8):
    rng = np.random.default_rng(seed)
    uv = rng.uniform(2, 30, size=(1, n, 2)).astype(np.float32)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.1, -0.2, -3.0]
    intr = np.asarray(
        [[90.0, 0, 16, 0], [0, 85.0, 16, 0], [0, 0, 1, 0], [0, 0, 0, 1.0]],
        dtype=np.float32,
    )
    points = (rng.normal(size=(1, n, 3)) * 0.3).astype(np.float32)
    normal = rng.normal(size=(1, n, 3)).astype(np.float32)
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
    surface_mask = rng.uniform(size=(1, n)) > 0.25
    surface_mask[0, :4] = [True, False, True, False]
    object_mask = rng.uniform(size=(1, n)) > 0.15
    ldir = rng.normal(size=(lnum, 3)).astype(np.float32)
    ldir /= np.linalg.norm(ldir, axis=-1, keepdims=True)
    lint = rng.uniform(1.5, 2.5, size=(lnum, 1)).astype(np.float32)
    lvt = rng.normal(size=(lv, 3)).astype(np.float32)
    lvt /= np.linalg.norm(lvt, axis=-1, keepdims=True)
    return dict(uv=uv, pose=pose, intrinsics=intr, points=points,
                normal=normal, surface_mask=surface_mask,
                object_mask=object_mask, ldir=ldir, lint=lint, lvt=lvt)


def _run_ref_psnet(net, d):
    model_input = {
        "uv": _t(d["uv"]),
        "pose": _t(d["pose"])[None],
        "intrinsics": _t(d["intrinsics"])[None],
        "object_mask": torch.from_numpy(d["object_mask"]),
        "points": _t(d["points"]),
        "normal": _t(d["normal"]),
        "surface_mask": torch.from_numpy(d["surface_mask"]),
        "light_direction": _t(d["ldir"]),
        "light_intensity": _t(d["lint"]),
        "light_vis_train": _t(d["lvt"]),
        "vis_train_gt": torch.ones(d["lvt"].shape[0], d["uv"].shape[1]),
    }
    with torch.no_grad():
        return net(model_input), model_input


def _run_my_psnet(params, d):
    from psnerf_tpu.core.rays import get_camera_params

    uv = jnp.asarray(d["uv"][0])
    rays, _ = get_camera_params(uv, jnp.asarray(d["pose"]),
                                jnp.asarray(d["intrinsics"]))
    return render_psnet(
        params["model"], PSNET_CFG,
        jnp.asarray(d["points"][0]), jnp.asarray(d["normal"][0]),
        jnp.asarray(d["surface_mask"][0]), rays,
        jnp.asarray(d["ldir"]), jnp.asarray(d["lint"][:, 0]),
        key=None, light_vis_train=jnp.asarray(d["lvt"]),
    )


def test_psnetwork_forward_parity(psnet_pair):
    """renderer.py:110-266 vs render_psnet: rgb / albedo / sg specular /
    normals / visibility / vis_train, multi-light, with masked-out pixels."""
    net, params = psnet_pair
    d = _psnet_inputs()
    ref_out, _ = _run_ref_psnet(net, d)
    got = _run_my_psnet(params, d)

    n = d["uv"].shape[1]
    lnum = d["ldir"].shape[0]

    ref_rgb = _n(ref_out["sg_rgb_values"])  # [L, N, 3]
    got_rgb = np.asarray(got["rgb"])
    assert got_rgb.shape == (lnum, n, 3)
    np.testing.assert_allclose(got_rgb, ref_rgb, atol=1e-5, rtol=0)

    np.testing.assert_allclose(
        np.asarray(got["albedo"]), _n(ref_out["sg_diffuse_albedo_values"])[0],
        atol=1e-5, rtol=0,
    )
    np.testing.assert_allclose(
        np.asarray(got["rough"]), _n(ref_out["sg_specular_rgb_values"]),
        atol=1e-5, rtol=0,
    )
    np.testing.assert_allclose(
        np.asarray(got["sg_weight"]), _n(ref_out["sg_weight"])[0],
        atol=1e-5, rtol=0,
    )
    np.testing.assert_allclose(
        np.asarray(got["normal_pred"]), _n(ref_out["normal_pred"])[0],
        atol=1e-5, rtol=0,
    )
    # reference visibility fills masked-out pixels with ones and expands the
    # raw (unclamped) MLP output to 3 channels; mine keeps [L, N, 1]
    np.testing.assert_allclose(
        np.asarray(got["visibility"])[..., 0], _n(ref_out["visibility"])[..., 0],
        atol=1e-5, rtol=0,
    )
    np.testing.assert_allclose(
        np.asarray(got["vis_train"]), _n(ref_out["vis_train"])[..., 0],
        atol=1e-5, rtol=0,
    )


def test_psnetwork_edit_hooks_parity(psnet_pair):
    """renderer.py:167-181 — albedo_new / basis_new material edits."""
    net, params = psnet_pair
    d = _psnet_inputs(seed=9)

    albedo_new = np.asarray([0.8, 0.2, 0.1], dtype=np.float32)
    model_input = _run_ref_psnet(net, d)[1]
    with torch.no_grad():
        ref_out = net(model_input, albedo_new=albedo_new)
    got = render_psnet(
        params["model"], PSNET_CFG,
        jnp.asarray(d["points"][0]), jnp.asarray(d["normal"][0]),
        jnp.asarray(d["surface_mask"][0]),
        _my_rays(d), jnp.asarray(d["ldir"]), jnp.asarray(d["lint"][:, 0]),
        albedo_new=jnp.asarray(albedo_new),
    )
    np.testing.assert_allclose(
        np.asarray(got["rgb"]), _n(ref_out["sg_rgb_values"]), atol=1e-5, rtol=0
    )

    with torch.no_grad():
        ref_out = net(model_input, basis_new=4)
    got = render_psnet(
        params["model"], PSNET_CFG,
        jnp.asarray(d["points"][0]), jnp.asarray(d["normal"][0]),
        jnp.asarray(d["surface_mask"][0]),
        _my_rays(d), jnp.asarray(d["ldir"]), jnp.asarray(d["lint"][:, 0]),
        basis_new=4,
    )
    np.testing.assert_allclose(
        np.asarray(got["rgb"]), _n(ref_out["sg_rgb_values"]), atol=1e-5, rtol=0
    )


def _my_rays(d):
    from psnerf_tpu.core.rays import get_camera_params

    rays, _ = get_camera_params(
        jnp.asarray(d["uv"][0]), jnp.asarray(d["pose"]),
        jnp.asarray(d["intrinsics"])
    )
    return rays


# --------------------------------------------------------------- stage2 losses


def test_stage2_losses_parity(psnet_pair):
    """MainLoss + NormalLoss (loss.py:6-141) on real PSNetwork outputs,
    vs stage2_loss on render_psnet outputs."""
    ref = _ref("stage2")
    net, params = psnet_pair
    d = _psnet_inputs(seed=10)
    ref_out, model_input = _run_ref_psnet(net, d)
    got = _run_my_psnet(params, d)

    rng = np.random.default_rng(11)
    lnum, n = d["ldir"].shape[0], d["uv"].shape[1]
    lv = d["lvt"].shape[0]
    rgb_gt = rng.uniform(size=(lnum, n, 3)).astype(np.float32)
    vis_gt = rng.uniform(size=(lnum, n)).astype(np.float32)
    vis_train_gt = rng.uniform(size=(lv, n)).astype(np.float32)

    main = ref["MainLoss"](sg_rgb_weight=1.0, loss_type="L1",
                           albedo_smooth_weight=0.05, rough_smooth_weight=0.01,
                           vis_weight=1.0)
    normal = ref["NormalLoss"](normal_weight=1.0, normal_smooth_weight=0.05)

    ref_out["object_mask"] = model_input["object_mask"]
    model_input["visibility"] = _t(vis_gt)
    model_input["vis_train_gt"] = _t(vis_train_gt)
    ref_main = main(ref_out, {"rgb": _t(rgb_gt)}, model_input)
    ref_normal = normal(ref_out)

    w = Stage2LossWeights(sg_rgb_weight=1.0, loss_type="L1",
                          albedo_smooth_weight=0.05, rough_smooth_weight=0.01,
                          vis_weight=1.0, normal_weight=1.0,
                          normal_smooth_weight=0.05)
    got_terms = stage2_loss(
        got, jnp.asarray(rgb_gt), jnp.asarray(d["object_mask"][0]), w,
        vis_gt=jnp.asarray(vis_gt), vis_train_gt=jnp.asarray(vis_train_gt),
    )

    np.testing.assert_allclose(
        float(got_terms["sg_rgb_loss"]), float(ref_main["sg_rgb_loss"]),
        atol=1e-5, rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(got_terms["vis_loss"]), float(ref_main["vis_loss"]),
        atol=1e-5, rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(got_terms["normal_loss"]), float(ref_normal["normal_loss"]),
        atol=1e-5, rtol=1e-5,
    )
    # no jitter (std 0) => no smoothness terms on either side
    assert "albedo_smooth_loss" not in got_terms
    assert ref_main["albedo_smooth_loss"] is None


# --------------------------------------------------------------- stage1 losses


def test_stage1_loss_parity(stage1_pair):
    """stage1/model/losses.py:30-70 vs stage1_loss on identical arrays."""
    ref = _ref("stage1")
    rng = np.random.default_rng(12)
    n = 64
    rgb = rng.uniform(size=(1, n, 3)).astype(np.float32)
    rgb_gt = rng.uniform(size=(1, n, 3)).astype(np.float32)
    diff_norm = rng.uniform(size=(n // 2,)).astype(np.float32)
    normal_pred = rng.normal(size=(1, n, 3)).astype(np.float32)
    normal_gt = rng.normal(size=(1, n, 3)).astype(np.float32)
    norm_mask = rng.uniform(size=(1, n)) > 0.4

    loss_fn = ref["Loss"](full_weight=1.0, grad_weight=0.005, norm_weight=0.05)
    ref_terms = loss_fn(
        {"rgb": _t(rgb), "diff_norm": _t(diff_norm),
         "normal_pred": _t(normal_pred)},
        _t(rgb_gt), normal_gt=_t(normal_gt),
        norm_mask=torch.from_numpy(norm_mask),
    )

    w = Stage1LossWeights(lambda_rgb=1.0, lambda_smooth=0.005,
                          lambda_normal=0.05)
    got_terms = stage1_loss(
        {"rgb": jnp.asarray(rgb[0]), "diff_norm": jnp.asarray(diff_norm),
         "normal_pred": jnp.asarray(normal_pred[0])},
        jnp.asarray(rgb_gt[0]), w,
        normal_gt=jnp.asarray(normal_gt[0]),
        norm_mask=jnp.asarray(norm_mask[0]),
    )

    for key in ("fullrgb_loss", "grad_loss", "normal_loss", "loss"):
        np.testing.assert_allclose(
            float(got_terms[key]), float(ref_terms[key]), atol=1e-5, rtol=1e-5
        )


# ------------------------------------------------- envmap relighting (summed)
def test_envmap_relight_sum_parity(psnet_pair):
    """The sum-over-512-lights envmap path (stage2/eval.py:173-231): drive
    the reference PSNetwork through its 64-light chunk loop with per-channel
    texel intensities, sum + clip; vs our fused frame path (rgb_sum through
    the in-kernel per-light clip + padded-lane fill, chunked at 128 lights).
    The per-light path has elementwise parity coverage above; this pins the
    INTEGRATED image."""
    from psnerf_tpu.core.spherical import gen_light_xyz
    from psnerf_tpu.eval.frame import render_frame_stage2

    net, params = psnet_pair
    light_h = 16
    lxyz, _ = gen_light_xyz(light_h, 2 * light_h, envmap_radius=1.0)
    dirs = lxyz.reshape(-1, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rng = np.random.default_rng(11)
    # texels scaled so the summed image actually exercises the clip
    texels = (rng.uniform(size=(dirs.shape[0], 3)) * 0.02).astype(np.float32)

    n = 256
    uv = rng.uniform(2, 30, size=(1, n, 2)).astype(np.float32)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.1, -0.2, -3.0]
    intr = np.asarray(
        [[90.0, 0, 16, 0], [0, 85.0, 16, 0], [0, 0, 1, 0], [0, 0, 0, 1.0]],
        dtype=np.float32,
    )
    points = (rng.normal(size=(1, n, 3)) * 0.3).astype(np.float32)
    normal = np.ones((1, n, 3), np.float32)     # eval.py:188 (unused w/ pregen)
    surface_mask = rng.uniform(size=(1, n)) > 0.25

    # ---- reference: 64-light chunks, sum over the light axis, clip -------
    rgb_chunks = []
    for s in range(0, len(dirs), 64):
        model_input = {
            "uv": _t(uv),
            "pose": _t(pose)[None],
            "intrinsics": _t(intr)[None],
            "object_mask": torch.ones(1, n),
            "points": _t(points),
            "normal": _t(normal),
            "surface_mask": torch.from_numpy(surface_mask),
            "light_direction": _t(dirs[s:s + 64]),
            "light_intensity": _t(texels[s:s + 64]),
        }
        with torch.no_grad():
            out = net(model_input)
        rgb_chunks.append(_n(out["sg_rgb_values"]))
    ref_img = np.concatenate(rgb_chunks, 0).sum(0).clip(0, 1)

    # ---- ours: fused vis+shade kernel (interpret), 128-light chunks ------
    acc = 0.0
    for s in range(0, len(dirs), 128):
        out = render_frame_stage2(
            params["model"], PSNET_CFG,
            jnp.asarray(uv[0]), jnp.asarray(pose), jnp.asarray(intr),
            jnp.asarray(points[0]), jnp.asarray(normal[0]),
            jnp.asarray(surface_mask[0]),
            jnp.asarray(dirs[s:s + 128]), jnp.asarray(texels[s:s + 128]),
            tile=256, outputs=("rgb_sum",),
            use_fused_vis=True, fused_interpret=True,
        )
        acc = acc + np.asarray(out["rgb_sum"])
    got_img = np.clip(acc, 0, 1)

    assert np.abs(got_img - ref_img).max() < 5e-3
    assert np.abs(got_img - ref_img).mean() < 5e-4
    # masked-out pixels: each light contributes the white fill, so the summed
    # image saturates to exactly 1 after the clip on both sides
    np.testing.assert_allclose(got_img[~surface_mask[0]], 1.0)
    np.testing.assert_allclose(ref_img[~surface_mask[0]], 1.0)
