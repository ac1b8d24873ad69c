"""Stage-1 occupancy + appearance field (UNISURF-style).

Re-implements the reference `NeuralNetwork` (stage1/model/network.py:7-138)
as pure functions over a param pytree:

  * geometry MLP: softplus(beta=100), hidden 256, skip at layer 4 (input re-
    concatenated, divided by sqrt(2)), weight-norm on every layer, geometric
    init to a sphere of radius ~0.6 (network.py:47-64). Emits 1 occupancy
    logit + `feat_size` feature channels.
  * appearance MLP: 4 hidden ReLU layers on [p, PE(view), normal, feat],
    output tanh(x) * 0.5 + 0.5 (network.py:97-106).
  * occupancy probability alpha = sigmoid(-10 * logit) (network.py:125).
  * analytic normals = grad of the raw logit wrt position (network.py:108-120),
    via jax.grad — no double-backprop machinery needed; the smoothness loss
    differentiates straight through it.

All apply fns take points shaped [..., 3] and broadcast over leading axes.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp

from psnerf_tpu.core.encoding import nerf_embed, nerf_embed_dim
from psnerf_tpu.fields.mlp import wn_from_dense, wn_linear_apply


@dataclasses.dataclass(frozen=True)
class OccFieldConfig:
    num_layers: int = 8          # hidden layers in the geometry MLP
    hidden_dim: int = 256
    octaves_pe: int = 6          # position PE octaves (stage1/configs/bear.yaml:4)
    octaves_pe_views: int = 4    # view-direction PE octaves
    skips: Sequence[int] = (4,)
    feat_size: int = 256
    rescale: float = 1.0
    geometric_init: bool = True
    sphere_bias: float = 0.6     # radius of the init sphere (network.py:28)
    # 'float32' | 'bfloat16': storage dtype of inter-layer activations in the
    # megabatched forward/backward (params and accumulation stay f32). On TPU
    # the default matmul precision already multiplies in bf16, so 'bfloat16'
    # mostly halves HBM traffic rather than changing numerics; the training
    # step is memory-bound, making this ~free throughput.
    compute_dtype: str = "float32"

    @property
    def _cdt(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else None

    @property
    def dim_embed(self) -> int:
        return nerf_embed_dim(3, self.octaves_pe)

    @property
    def dim_embed_view(self) -> int:
        # [p(3), PE(view), normal(3), feat]; PE(view) includes the raw view.
        return 3 + nerf_embed_dim(3, self.octaves_pe_views) + 3 + self.feat_size

    @property
    def dims_geo(self) -> list:
        # [dim_embed, hidden * num_layers, feat+1] (network.py:37)
        return [self.dim_embed] + [self.hidden_dim] * self.num_layers + [self.feat_size + 1]


def init_occupancy_field(key: jax.Array, cfg: OccFieldConfig) -> dict:
    """Build the param pytree {geo: [wn-linear...], app: [wn-linear...]}."""
    dims_geo = cfg.dims_geo
    n_geo = len(dims_geo) - 1  # number of linear layers
    keys = jax.random.split(key, n_geo + 5)

    geo = []
    for l in range(n_geo):
        din = dims_geo[l]
        if l + 1 in cfg.skips:
            dout = dims_geo[l + 1] - dims_geo[0]
        else:
            dout = dims_geo[l + 1]

        if cfg.geometric_init:
            # SAL geometric init (network.py:47-61), adapted to [din, dout]
            # weight layout (reference torch layout is [dout, din]).
            if l == n_geo - 1:
                # NOTE: dtype pinned — jnp.full with a python float yields a
                # weak-typed array, which flips to strong after one optimizer
                # update and forces a jit recompile
                w = jnp.full((din, dout), math.sqrt(math.pi) / math.sqrt(din),
                             dtype=jnp.float32)
                w = w + 1e-4 * jax.random.normal(keys[l], (din, dout))
                b = jnp.full((dout,), -cfg.sphere_bias, dtype=jnp.float32)
            elif cfg.octaves_pe > 0 and l == 0:
                w = jnp.zeros((din, dout))
                w = w.at[:3, :].set(
                    math.sqrt(2) / math.sqrt(dout)
                    * jax.random.normal(keys[l], (3, dout))
                )
                b = jnp.zeros((dout,))
            elif cfg.octaves_pe > 0 and l in cfg.skips:
                w = math.sqrt(2) / math.sqrt(dout) * jax.random.normal(keys[l], (din, dout))
                # zero the PE rows of the re-concatenated input (all but xyz)
                w = w.at[-(dims_geo[0] - 3):, :].set(0.0)
                b = jnp.zeros((dout,))
            else:
                w = math.sqrt(2) / math.sqrt(dout) * jax.random.normal(keys[l], (din, dout))
                b = jnp.zeros((dout,))
        else:
            bound = math.sqrt(1.0 / din)
            w = jax.random.uniform(keys[l], (din, dout), minval=-bound, maxval=bound)
            b = jax.random.uniform(keys[n_geo + 4], (dout,), minval=-bound, maxval=bound)
        geo.append(wn_from_dense(w, b))

    # appearance: [dim_embed_view, 256, 256, 256, 256, 3], default torch init
    dims_view = [cfg.dim_embed_view] + [cfg.hidden_dim] * 4 + [3]
    app = []
    akeys = jax.random.split(keys[n_geo], len(dims_view) - 1)
    for l in range(len(dims_view) - 1):
        din, dout = dims_view[l], dims_view[l + 1]
        bound = math.sqrt(1.0 / din)
        kw, kb = jax.random.split(akeys[l])
        w = jax.random.uniform(kw, (din, dout), minval=-bound, maxval=bound)
        b = jax.random.uniform(kb, (dout,), minval=-bound, maxval=bound)
        app.append(wn_from_dense(w, b))

    return {"geo": geo, "app": app}


def _softplus100(x: jnp.ndarray) -> jnp.ndarray:
    """softplus with beta=100 (network.py:68): log(1 + e^(100 x)) / 100,
    linear above the numerically-safe threshold (matches torch's cutover at
    beta*x > 20)."""
    bx = 100.0 * x
    return jnp.where(bx > 20.0, x, jax.nn.softplus(bx) / 100.0)


def occ_logits_and_feat(params: dict, p: jnp.ndarray, cfg: OccFieldConfig) -> jnp.ndarray:
    """Geometry MLP: points [..., 3] -> [..., 1 + feat_size].

    Channel 0 is the raw occupancy logit (positive outside at init);
    reference `infer_occ` (network.py:85-95).
    """
    cdt = cfg._cdt
    pe = nerf_embed(p / cfg.rescale, cfg.octaves_pe)
    if cdt is not None:
        pe = pe.astype(cdt)
    x = pe
    n = len(params["geo"])
    for l, lyr in enumerate(params["geo"]):
        if l in cfg.skips:
            x = jnp.concatenate([x.astype(pe.dtype), pe], axis=-1) / math.sqrt(2)
        x = wn_linear_apply(lyr, x, compute_dtype=cdt)
        if l < n - 1:
            x = _softplus100(x)
            if cdt is not None:
                x = x.astype(cdt)
    return x


def occ_logit(params: dict, p: jnp.ndarray, cfg: OccFieldConfig) -> jnp.ndarray:
    """Raw logit only: [..., 3] -> [...]."""
    return occ_logits_and_feat(params, p, cfg)[..., 0]


def occ_alpha(params: dict, p: jnp.ndarray, cfg: OccFieldConfig) -> jnp.ndarray:
    """Occupancy probability alpha = sigmoid(-10 * logit) (network.py:125)."""
    return jax.nn.sigmoid(-10.0 * occ_logit(params, p, cfg))


def occ_gradient(params: dict, p: jnp.ndarray, cfg: OccFieldConfig) -> jnp.ndarray:
    """Spatial gradient of the raw logit (normals direction), [..., 3].

    Replaces the reference's autograd double-backprop (network.py:108-120);
    jax.grad composes with outer grads for the smoothness loss.
    """
    flat = p.reshape(-1, 3)
    g = jax.vmap(jax.grad(lambda q: occ_logit(params, q, cfg)))(flat)
    return g.reshape(p.shape)


def appearance(
    params: dict,
    p: jnp.ndarray,
    normals: jnp.ndarray,
    view_dirs: jnp.ndarray,
    feat: jnp.ndarray,
    cfg: OccFieldConfig,
) -> jnp.ndarray:
    """Appearance MLP -> rgb in [0, 1]. view_dirs must already be PE-encoded
    unit directions as in the reference forward (network.py:128-132)."""
    cdt = cfg._cdt
    x = jnp.concatenate([p, view_dirs, normals, feat], axis=-1)
    if cdt is not None:
        x = x.astype(cdt)
    n = len(params["app"])
    for l, lyr in enumerate(params["app"]):
        x = wn_linear_apply(lyr, x, compute_dtype=cdt)
        if l < n - 1:
            x = jax.nn.relu(x)
            if cdt is not None:
                x = x.astype(cdt)
    return jnp.tanh(x) * 0.5 + 0.5


def radiance_and_alpha(
    params: dict, p: jnp.ndarray, ray_d: jnp.ndarray, cfg: OccFieldConfig
):
    """Full forward (reference network.py:122-136 with ray_d + return_addocc):
    returns (rgb [..., 3], alpha [...]). Normals flow with gradients, matching
    the reference's create_graph=True path."""
    out = occ_logits_and_feat(params, p, cfg)
    logit, feat = out[..., 0], out[..., 1:]
    view = ray_d / jnp.linalg.norm(ray_d, axis=-1, keepdims=True)
    view_pe = nerf_embed(view, cfg.octaves_pe_views)
    normals = occ_gradient(params, p, cfg)
    rgb = appearance(params, p, normals, view_pe, feat, cfg)
    return rgb, jax.nn.sigmoid(-10.0 * logit)
