"""Checkpoint conversion parity: build torch modules implementing the
reference math (weight-norm linear chain / plain skip MLP), convert their
state_dicts, and check our functional apply reproduces torch outputs."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from psnerf_tpu.convert import stage1_params_from_torch, stage2_params_from_torch
from psnerf_tpu.fields.mlp import skip_mlp_apply, wn_linear_apply
from psnerf_tpu.fields.occupancy import OccFieldConfig, occ_logits_and_feat


def test_wn_linear_conversion_matches_torch():
    torch.manual_seed(0)
    lin = torch.nn.utils.weight_norm(torch.nn.Linear(7, 5))
    sd = {f"lin0.{k}": v for k, v in lin.state_dict().items()}
    x = torch.randn(11, 7)
    with torch.no_grad():
        ref = lin(x).numpy()

    from psnerf_tpu.convert import _wn_linear_from_torch

    p = _wn_linear_from_torch(sd, "lin0")
    out = wn_linear_apply(p, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def _torch_geo_net(cfg: OccFieldConfig):
    """The reference geometry MLP (stage1/model/network.py:36-95) built in
    torch for parity testing (same math, independent implementation)."""
    dims = cfg.dims_geo
    layers = {}
    n = len(dims) - 1
    for l in range(n):
        dout = dims[l + 1] - dims[0] if (l + 1) in cfg.skips else dims[l + 1]
        lin = torch.nn.utils.weight_norm(torch.nn.Linear(dims[l], dout))
        layers[l] = lin

    def forward(pe):
        sp = torch.nn.Softplus(beta=100)
        x = pe
        for l in range(n):
            if l in cfg.skips:
                x = torch.cat([x, pe], -1) / np.sqrt(2)
            x = layers[l](x)
            if l < n - 1:
                x = sp(x)
        return x

    sd = {}
    for l, lin in layers.items():
        for k, v in lin.state_dict().items():
            sd[f"lin{l}.{k}"] = v
    return forward, sd


def test_stage1_geo_conversion_matches_torch():
    cfg = OccFieldConfig(num_layers=3, hidden_dim=32, feat_size=16,
                         octaves_pe=2, octaves_pe_views=2, skips=(2,))
    torch.manual_seed(1)
    fwd, sd = _torch_geo_net(cfg)
    # appearance layers so the converter finds them (content checked via geo)
    for l in range(2):
        lina = torch.nn.utils.weight_norm(torch.nn.Linear(8, 8))
        for k, v in lina.state_dict().items():
            sd[f"lina{l}.{k}"] = v

    params = stage1_params_from_torch(sd)
    assert len(params["geo"]) == 4 and len(params["app"]) == 2

    p = np.random.default_rng(0).normal(size=(9, 3)).astype(np.float32)
    from psnerf_tpu.core.encoding import nerf_embed

    pe = np.asarray(nerf_embed(jnp.asarray(p), cfg.octaves_pe))
    with torch.no_grad():
        ref = fwd(torch.from_numpy(pe)).numpy()
    ours = occ_logits_and_feat(params, jnp.asarray(p), cfg)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-5)


def test_stage2_conversion_matches_torch():
    """Reference Network topology (stage2/model/renderer.py:34-49) in torch
    vs converted params through skip_mlp_apply."""
    torch.manual_seed(2)
    din, dout, w, depth, skip = 10, 3, 16, 4, 2
    linears = torch.nn.ModuleList(
        [torch.nn.Linear(din, w)]
        + [torch.nn.Linear(w + din if i == skip else w, w)
           for i in range(depth - 1)]
        + [torch.nn.Linear(w, dout)]
    )

    def fwd(x):
        y = x
        for li, lyr in enumerate(linears):
            y = lyr(y)
            y = torch.relu(y) if li != len(linears) - 1 else torch.sigmoid(y)
            if li == skip:
                y = torch.cat([y, x], -1)
        return y

    sd = {}
    for i, lyr in enumerate(linears):
        for k, v in lyr.state_dict().items():
            sd[f"albedo_net.linears.{i}.{k}"] = v
            sd[f"rough_net.linears.{i}.{k}"] = v

    light_sd = {
        "light_state_dict": {"weight": torch.randn(12, 3)},
        "light_inten_state_dict": {"weight": torch.rand(12, 1)},
    }
    params = stage2_params_from_torch(sd, light_sd)
    assert params["light_dirs"].shape == (12, 3)
    assert params["light_ints"].shape == (12, 1)

    x = torch.randn(7, din)
    with torch.no_grad():
        ref = fwd(x).numpy()
    ours = skip_mlp_apply(params["model"]["albedo"], jnp.asarray(x.numpy()),
                          (skip,), "sigmoid")
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)
