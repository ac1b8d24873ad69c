"""LPIPS (AlexNet variant) in JAX.

Reimplements the `lpips.LPIPS(net='alex')` metric used by the reference
(stage2/utils/metrics.py:64-76): inputs in [-1, 1], ImageNet-stat shift/scale,
AlexNet conv features at the 5 ReLU taps, unit-normalize each channel map,
squared difference, learned 1x1 linear head per tap, spatial average, sum.

Pretrained weights CANNOT be downloaded in this environment (zero egress, no
torchvision/lpips packages). `load_weights_from_torch` converts a state_dict
containing the torchvision AlexNet features plus the lpips `lin*.model.1`
heads; point LPIPS_WEIGHTS at such a file (torch .pt/.pth or a .npz export)
to enable the metric. Without weights, `lpips() -> None` and the evaluation
CLI reports LPIPS as unavailable rather than wrong.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# AlexNet feature stack: (out_ch, kernel, stride, padding); M = maxpool 3/2
_ALEX = [
    (64, 11, 4, 2), "M",
    (192, 5, 1, 2), "M",
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_TAP_CHANNELS = [64, 192, 384, 256, 256]

_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b, stride, pad):
    # x [N,C,H,W]; w [O,I,kh,kw] (torch layout)
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out + b[None, :, None, None]


def _maxpool(x, k=3, s=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, s, s), "VALID"
    )


def alex_features(params: dict, x: jnp.ndarray) -> list:
    """x [N,3,H,W] normalized; returns the 5 ReLU feature maps."""
    taps = []
    ci = 0
    for spec in _ALEX:
        if spec == "M":
            x = _maxpool(x)
            continue
        _, _, stride, pad = spec
        x = _conv(x, params[f"conv{ci}_w"], params[f"conv{ci}_b"], stride, pad)
        x = jax.nn.relu(x)
        taps.append(x)
        ci += 1
    return taps


def lpips_distance(params: dict, img1: jnp.ndarray, img2: jnp.ndarray):
    """img* [H,W,3] in [0,1] -> scalar LPIPS."""
    def prep(im):
        x = im.transpose(2, 0, 1)[None] * 2.0 - 1.0  # lpips input convention
        return (x - _SHIFT[None, :, None, None]) / _SCALE[None, :, None, None]

    f1 = alex_features(params, prep(img1))
    f2 = alex_features(params, prep(img2))
    total = 0.0
    for i, (a, b) in enumerate(zip(f1, f2)):
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=1, keepdims=True), 1e-10)
        b = b / jnp.maximum(jnp.linalg.norm(b, axis=1, keepdims=True), 1e-10)
        d = (a - b) ** 2
        w = params[f"lin{i}_w"]  # [1, C, 1, 1]
        total = total + jnp.mean(jnp.sum(d * w, axis=1), axis=(1, 2))[0]
    return total


class LPIPS:
    """Callable matching the reference interface; None if weights missing."""

    def __init__(self, weights_path: Optional[str] = None):
        self.params = None
        path = weights_path or os.environ.get("LPIPS_WEIGHTS")
        if path and os.path.exists(path):
            self.params = load_weights(path)
            self._fn = jax.jit(lambda a, b: lpips_distance(self.params, a, b))

    @property
    def available(self) -> bool:
        return self.params is not None

    def __call__(self, img1: np.ndarray, img2: np.ndarray, mask=None):
        if self.params is None:
            return None
        return float(self._fn(jnp.asarray(img1, jnp.float32),
                              jnp.asarray(img2, jnp.float32)))


def load_weights(path: str) -> dict:
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: jnp.asarray(z[k]) for k in z.files}
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return load_weights_from_torch(sd)


def load_weights_from_torch(sd: dict) -> dict:
    """Accepts a merged state_dict with torchvision AlexNet `features.N.*`
    keys (N in 0,3,6,8,10) and lpips `lin{i}.model.1.weight` heads."""
    conv_ids = [0, 3, 6, 8, 10]
    params = {}
    for ci, n in enumerate(conv_ids):
        for cand in (f"features.{n}.weight", f"net.slice{ci+1}.{n}.weight",
                     f"alex.features.{n}.weight"):
            if cand in sd:
                params[f"conv{ci}_w"] = jnp.asarray(np.asarray(sd[cand]))
                params[f"conv{ci}_b"] = jnp.asarray(
                    np.asarray(sd[cand.replace("weight", "bias")])
                )
                break
        else:
            raise KeyError(f"AlexNet conv {ci} weights not found")
    for i in range(5):
        for cand in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if cand in sd:
                params[f"lin{i}_w"] = jnp.asarray(np.asarray(sd[cand]))
                break
        else:
            raise KeyError(f"lpips linear head {i} not found")
    return params
