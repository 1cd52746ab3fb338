"""Pure-JAX invariants of the window partition ops (no torch needed)."""

import numpy as np
import jax
import jax.numpy as jnp

from vit_grid_model_tpu.ops import window as W


def test_block_roundtrip():
    x = jnp.arange(2 * 14 * 21 * 3, dtype=jnp.float32).reshape(2, 14, 21, 3)
    xw, dims = W.block_partition(x, 7)
    assert xw.shape == (2 * 2 * 3, 49, 3)
    np.testing.assert_array_equal(np.asarray(W.block_reverse(xw, 7, dims)),
                                  np.asarray(x))


def test_grid_roundtrip():
    x = jnp.arange(2 * 14 * 21 * 3, dtype=jnp.float32).reshape(2, 14, 21, 3)
    xw, dims = W.grid_partition(x, 7)
    assert xw.shape == (2 * 2 * 3, 49, 3)
    np.testing.assert_array_equal(np.asarray(W.grid_reverse(xw, 7, dims)),
                                  np.asarray(x))


def test_grid_partition_is_strided():
    """Token (i, j) of grid window (x, y) sits at pixel (i*nx + x, j*ny + y)
    — the outer factor is the window coordinate (``maxvit.py:322``)."""
    h, w, win = 14, 21, 7
    nx, ny = h // win, w // win
    x = jnp.arange(h * w, dtype=jnp.float32).reshape(1, h, w, 1)
    xw, _ = W.grid_partition(x, win)
    for wx in range(nx):
        for wy in range(ny):
            window = np.asarray(xw[wx * ny + wy, :, 0]).reshape(win, win)
            expect = np.asarray(x[0, :, :, 0])[wx::nx, wy::ny]
            np.testing.assert_array_equal(window, expect)


def test_relative_position_indices_properties():
    idx = np.asarray(W.relative_position_indices(7, 4))
    assert idx.shape == (53, 53)
    sentinel = (2 * 7 - 1) ** 2
    # register rows/cols all read the sentinel embedding row
    assert (idx[:4, :] == sentinel).all() and (idx[:, :4] == sentinel).all()
    # the window block is a valid dense index set centred at (w-1, w-1)
    core = idx[4:, 4:]
    assert core.min() >= 0 and core.max() < sentinel
    assert core[0, 0] == (7 - 1) * 13 + (7 - 1)   # zero offset id
    # relative-position antisymmetry: idx[i, j] + idx[j, i] == 2 * center_id
    center = (7 - 1) * 13 + (7 - 1)
    np.testing.assert_array_equal(core + core.T, 2 * center)


def test_padding_roundtrip():
    from vit_grid_model_tpu.models.metnet3 import pad_hw, unpad_hw, pad_values

    assert pad_values(82, 67, 14) == (1, 2, 1, 1)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 82, 67, 3))
    xp, pv = pad_hw(x, 14)
    assert xp.shape == (2, 84, 70, 3)
    np.testing.assert_array_equal(np.asarray(unpad_hw(xp, pv)), np.asarray(x))
