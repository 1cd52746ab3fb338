"""Checkpoint save/restore round-trips (npz and orbax)."""

import numpy as np
import pytest

import jax

from tests import conftest as C  # noqa: F401
from vit_grid_model_tpu.core.checkpoint import restore_params, save_params
from vit_grid_model_tpu.core.config import MetNet3Config
from vit_grid_model_tpu.models.metnet3 import metnet3_init


def _params():
    cfg = MetNet3Config(window_size=2, n_variables=24, n_start_channels=8,
                        end_lead_time=2, n_heads=2, dim_head=4)
    return metnet3_init(jax.random.PRNGKey(3), cfg)


def _assert_tree_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_npz_roundtrip(tmp_path):
    params = _params()
    path = save_params(str(tmp_path / "m.npz"), params)
    restored = restore_params(path, jax.tree.map(lambda x: x * 0, params))
    _assert_tree_equal(params, restored)


def test_npz_key_mismatch_raises(tmp_path):
    params = _params()
    path = save_params(str(tmp_path / "m.npz"), params)
    wrong = {"different": np.zeros(3)}
    with pytest.raises(ValueError, match="key mismatch"):
        restore_params(path, wrong)


def test_orbax_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    params = _params()
    path = save_params(str(tmp_path / "ckpt"), params)
    restored = restore_params(path, jax.tree.map(lambda x: x * 0, params))
    _assert_tree_equal(params, restored)


def test_npz_bf16_roundtrip_no_warning(tmp_path):
    """bf16 leaves are widened to f32 on disk; restoring into the original
    bf16 pytree closes the round trip exactly and silently."""
    import warnings

    import jax.numpy as jnp

    params = {"w": jnp.asarray([1.5, -2.25, 3.0], jnp.bfloat16),
              "b": jnp.asarray([0.5], jnp.float32)}
    path = save_params(str(tmp_path / "bf16.npz"), params)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        restored = restore_params(path, jax.tree.map(lambda x: x * 0, params))
    assert restored["w"].dtype == jnp.bfloat16
    _assert_tree_equal(params, restored)


def test_npz_lossy_restore_warns(tmp_path):
    """A genuine f32 checkpoint restored into a bf16-typed pytree is a
    precision-losing cast and must warn (round-2 advisor finding)."""
    import jax.numpy as jnp

    params = {"w": jnp.asarray([1.0000001, 2.0], jnp.float32)}
    path = save_params(str(tmp_path / "f32.npz"), params)
    like = {"w": jnp.zeros((2,), jnp.bfloat16)}
    with pytest.warns(UserWarning, match="lossy"):
        restored = restore_params(path, like)
    assert restored["w"].dtype == jnp.bfloat16
