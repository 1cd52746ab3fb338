"""utils/ smoke tests: profiling timer and numerics guards."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests import conftest as C  # noqa: F401
from vit_grid_model_tpu.utils import debug, profiling


def test_step_timer():
    t = profiling.StepTimer(warmup=1)
    for i in range(4):
        with t.step() as out:
            out["result"] = jnp.ones((8, 8)) * i
    assert len(t.times) == 3
    assert t.mean() > 0


def test_check_numerics():
    debug.check_numerics(np.ones(4), "ok")
    with pytest.raises(debug.NumericsError, match="1 NaN"):
        debug.check_numerics(np.asarray([1.0, np.nan]), "bad")
    with pytest.raises(debug.NumericsError, match="Inf"):
        debug.check_numerics(np.asarray([np.inf]), "bad")


def test_tree_stats():
    stats = debug.tree_stats({"a": np.asarray([1.0, np.nan]),
                              "b": {"c": np.zeros((2, 3))}})
    assert stats["a"]["nan"] == 1
    assert stats["b/c"]["shape"] == (2, 3)
