"""Profiling & timing utilities.

The reference's observability is ad-hoc wall-clock prints (SURVEY.md §5.1);
here: a jax.profiler trace context (view with TensorBoard/Perfetto) and a
per-phase timer with device synchronization.
"""

from __future__ import annotations

import contextlib
import os
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str | None):
    """Capture a device trace under `logdir` (no-op when logdir is None):

        with profiling.trace("out/trace"):
            step(...)
    """
    if logdir is None:
        yield
        return
    with jax.profiler.trace(logdir):
        yield


class PhaseTimer:
    """Accumulates per-phase wall time with optional device sync — the
    TPU-native replacement for the reference's Timer/AverageMeter
    (preprocessing/utils/time_utils.py:5-49)."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.times: dict[str, list] = {}
        self._t = time.perf_counter()

    def mark(self, phase: str, result=None):
        if self.sync and result is not None:
            # block_until_ready is unreliable on tunneled backends; force a
            # scalar readback of one leaf
            leaves = jax.tree_util.tree_leaves(result)
            if leaves:
                np.asarray(jax.device_get(leaves[0])).reshape(-1)[:1]
        now = time.perf_counter()
        self.times.setdefault(phase, []).append(now - self._t)
        self._t = now

    def summary(self) -> dict:
        return {k: float(np.mean(v)) for k, v in self.times.items()}


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache: the big stage-1 train-step program
    takes ~100 s to compile on the TPU backend; caching makes every later
    process start instantly. Called by the CLI and runners."""
    import jax

    path = path or os.path.expanduser("~/.cache/psnerf_tpu_xla")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs
