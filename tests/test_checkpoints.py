import os

import jax.numpy as jnp
import numpy as np
import pytest

from psnerf_tpu.train.checkpoints import (
    is_url,
    latest_checkpoint,
    load_checkpoint,
    resolve_checkpoint_source,
    save_checkpoint,
)


def test_roundtrip_with_scalars(tmp_path):
    tree = {
        "a": [{"w": jnp.ones((3, 2)), "b": jnp.zeros(2)}],
        "x": jnp.arange(5.0),
    }
    path = str(tmp_path / "model.npz")
    save_checkpoint(path, tree, {"it": 123, "loss": 0.5})
    t2, sc = load_checkpoint(path, tree)
    assert sc == {"it": 123, "loss": 0.5}
    np.testing.assert_array_equal(np.asarray(t2["a"][0]["w"]), 1.0)
    np.testing.assert_array_equal(np.asarray(t2["x"]), np.arange(5.0))


def test_shape_mismatch_rejected(tmp_path):
    path = str(tmp_path / "m.npz")
    save_checkpoint(path, {"w": jnp.ones((3,))})
    with pytest.raises(ValueError):
        load_checkpoint(path, {"w": jnp.ones((4,))})
    with pytest.raises(KeyError):
        load_checkpoint(path, {"w2": jnp.ones((3,))})


def test_load_checkpoint_from_url(tmp_path):
    """URL loads fetch-once into a cache then read the npz — the model_zoo
    counterpart (reference stage1/model/checkpoints.py:55-95). file://
    exercises the real fetch path without network egress."""
    assert is_url("https://x.test/m.npz") and is_url("file:///tmp/m.npz")
    assert not is_url("/abs/path/m.npz") and not is_url("rel/m.npz")

    tree = {"w": jnp.arange(6.0).reshape(2, 3)}
    src = str(tmp_path / "remote" / "model.npz")
    save_checkpoint(src, tree, {"it": 7})
    cache = str(tmp_path / "cache")
    url = "file://" + src

    local = resolve_checkpoint_source(url, cache_dir=cache)
    assert local == os.path.join(cache, "model.npz")
    t2, sc = load_checkpoint(local, tree)
    assert sc == {"it": 7}
    np.testing.assert_array_equal(np.asarray(t2["w"]),
                                  np.arange(6.0).reshape(2, 3))

    # cache hit: the source can disappear and the resolve still succeeds
    os.remove(src)
    assert resolve_checkpoint_source(url, cache_dir=cache) == local

    # offline/unreachable URLs fail loudly, not with a hung socket
    os.remove(local)
    with pytest.raises(RuntimeError, match="egress"):
        resolve_checkpoint_source("file://" + src, cache_dir=cache)


def test_latest_checkpoint(tmp_path):
    d = str(tmp_path)
    assert latest_checkpoint(d) is None
    save_checkpoint(os.path.join(d, "model_100.npz"), {"w": jnp.ones(2)})
    save_checkpoint(os.path.join(d, "model_5000.npz"), {"w": jnp.ones(2)})
    assert latest_checkpoint(d).endswith("model_5000.npz")
    save_checkpoint(os.path.join(d, "model.npz"), {"w": jnp.ones(2)})
    assert latest_checkpoint(d).endswith("model.npz")
