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
import urllib.error
import urllib.parse
import urllib.request

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
    (tree, scalars). `path` may be an http(s)/file URL — fetched once into
    the cache like the reference's model_zoo loads
    (stage1/model/checkpoints.py:85-95)."""
    path = resolve_checkpoint_source(path)
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


def is_url(path_or_url: str) -> bool:
    """True for strings the loader should fetch rather than open
    (reference stage1/model/checkpoints.py:102-104 `is_url`; `file://`
    included so the fetch path is testable offline)."""
    scheme = urllib.parse.urlparse(path_or_url).scheme
    return scheme in ("http", "https", "file")


def resolve_checkpoint_source(path_or_url: str,
                              cache_dir: str | None = None) -> str:
    """Return a local path for a checkpoint path-or-URL, downloading URLs
    into a content cache keyed by basename — the npz counterpart of the
    reference's `CheckpointIO.load` / `load_url`
    (stage1/model/checkpoints.py:55-95, torch model_zoo semantics:
    cached download, reuse on hit). Offline environments get a clear
    error instead of a hung socket."""
    if not is_url(path_or_url):
        return path_or_url
    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "psnerf_tpu", "checkpoints")
    os.makedirs(cache_dir, exist_ok=True)
    name = os.path.basename(urllib.parse.urlparse(path_or_url).path)
    if not name:
        raise ValueError(f"checkpoint URL has no filename: {path_or_url!r}")
    local = os.path.join(cache_dir, name)
    if os.path.exists(local):
        return local
    print(f"=> Loading checkpoint from url... {path_or_url}")
    tmp = local + ".tmp"
    try:
        with urllib.request.urlopen(path_or_url, timeout=60) as r, \
                open(tmp, "wb") as f:
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
    except (urllib.error.URLError, OSError) as e:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise RuntimeError(
            f"could not fetch checkpoint {path_or_url!r} ({e}); this "
            "environment may have no network egress — download it "
            "elsewhere and pass the local path instead") from e
    os.replace(tmp, local)
    return local


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
