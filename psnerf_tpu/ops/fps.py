"""Farthest-point sampling in JAX (replaces the reference's external
torch_cluster.fps CUDA dependency, used to pick well-spread extra light
directions for visibility supervision; stage1/shape_extract.py:98-129)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def farthest_point_sampling_np(points, n_samples: int,
                               start: int = 0) -> np.ndarray:
    """Greedy FPS on the host: points [N, D] -> indices [n_samples].

    Same selection as `farthest_point_sampling` (argmin-distance greedy,
    deterministic given `start`). The shape-export use case picks 256 of
    10,000 host-resident candidate directions — ~8 MFLOP of sequential
    greedy work with no batch parallelism for the MXU, i.e. a host-scale
    problem: ~10 ms here with zero device dispatches, vs an H2D + a
    255-step compiled loop + D2H on the accelerator (and on the tunneled
    test backend, any first tiny-op dispatch can additionally absorb a
    minutes-long cold-compile stall — see shape_extract's poses_np note)."""
    pts = np.asarray(points, np.float64)
    sel = np.empty((n_samples,), np.int64)
    sel[0] = start
    d2 = ((pts - pts[start]) ** 2).sum(-1)
    for i in range(1, n_samples):
        nxt = int(d2.argmax())
        sel[i] = nxt
        np.minimum(d2, ((pts - pts[nxt]) ** 2).sum(-1), out=d2)
    return sel


@partial(jax.jit, static_argnums=(1,))
def farthest_point_sampling(points: jnp.ndarray, n_samples: int,
                            start: int = 0) -> jnp.ndarray:
    """Greedy FPS: points [N, D] -> indices [n_samples].

    Deterministic given `start` (the first selected index). lax.fori_loop
    over the selection count; O(n_samples * N) distance updates, fully
    vectorized per step.
    """
    n = points.shape[0]

    def body(i, state):
        min_d2, selected = state
        prev = points[selected[i - 1]]
        d2 = jnp.sum((points - prev) ** 2, axis=-1)
        min_d2 = jnp.minimum(min_d2, d2)
        nxt = jnp.argmax(min_d2)
        return min_d2, selected.at[i].set(nxt)

    selected = jnp.zeros((n_samples,), jnp.int32).at[0].set(start)
    min_d2 = jnp.full((n,), jnp.inf)
    _, selected = jax.lax.fori_loop(1, n_samples, body, (min_d2, selected))
    return selected
