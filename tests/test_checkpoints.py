import os

import jax.numpy as jnp
import numpy as np
import pytest

from psnerf_tpu.train.checkpoints import (
    latest_checkpoint,
    load_checkpoint,
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


def test_latest_checkpoint(tmp_path):
    d = str(tmp_path)
    assert latest_checkpoint(d) is None
    save_checkpoint(os.path.join(d, "model_100.npz"), {"w": jnp.ones(2)})
    save_checkpoint(os.path.join(d, "model_5000.npz"), {"w": jnp.ones(2)})
    assert latest_checkpoint(d).endswith("model_5000.npz")
    save_checkpoint(os.path.join(d, "model.npz"), {"w": jnp.ones(2)})
    assert latest_checkpoint(d).endswith("model.npz")
