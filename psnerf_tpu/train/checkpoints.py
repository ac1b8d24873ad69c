"""Checkpoint I/O: param/optimizer pytrees + scalars to a single .npz.

Preserves the reference's resume semantics (SURVEY.md §5.4): rolling
`latest` + immutable per-iteration backups, implicit resume on startup.
Format: flattened pytree with path-joined keys — portable, inspectable,
no framework state.
"""

from __future__ import annotations

import json
import os
import re

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    paths_leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in paths_leaves:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        out[key] = np.asarray(leaf)
    return out


def save_checkpoint(path: str, tree, scalars: dict | None = None) -> None:
    flat = _flatten(tree)
    if scalars:
        flat["__scalars__"] = np.frombuffer(
            json.dumps(scalars).encode(), dtype=np.uint8
        )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def load_checkpoint(path: str, tree_like):
    """Restore arrays into the structure of `tree_like`; returns
    (tree, scalars)."""
    with np.load(path) as data:
        scalars = {}
        if "__scalars__" in data:
            scalars = json.loads(bytes(data["__scalars__"]).decode())
        flat = {k: data[k] for k in data.files if k != "__scalars__"}
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(tree_like)
    leaves = []
    for path, leaf in paths_leaves:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = flat[key]
        if tuple(arr.shape) != tuple(np.shape(leaf)):
            raise ValueError(
                f"shape mismatch for {key!r}: ckpt {arr.shape} vs model "
                f"{np.shape(leaf)}"
            )
        leaves.append(jax.numpy.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves), scalars


def latest_checkpoint(ckpt_dir: str, prefix: str = "model"):
    """Path of the newest checkpoint: `<prefix>.npz` if present, else the
    highest-numbered `<prefix>_<it>.npz`."""
    rolling = os.path.join(ckpt_dir, f"{prefix}.npz")
    if os.path.exists(rolling):
        return rolling
    if not os.path.isdir(ckpt_dir):
        return None
    best, best_it = None, -1
    pat = re.compile(rf"{re.escape(prefix)}_(\d+)\.npz$")
    for f in os.listdir(ckpt_dir):
        m = pat.match(f)
        if m and int(m.group(1)) > best_it:
            best_it = int(m.group(1))
            best = os.path.join(ckpt_dir, f)
    return best
