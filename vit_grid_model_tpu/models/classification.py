"""Class <-> value mapping (reference ``classification.py:4-32``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def categorical_to_continuous(categorical: Array,
                              class_boundaries) -> Array:
    """Boundary-midpoint decoding of categorical PM classes: class 0 ->
    half the first boundary, interior classes -> midpoint of their
    boundaries, last class -> the last boundary value."""
    b = jnp.asarray(class_boundaries, jnp.float32)
    n_classes = b.shape[0] + 1
    midpoints = (b[:-1] + b[1:]) / 2.0
    # value table indexed by class id
    table = jnp.concatenate([b[:1] / 2.0, midpoints, b[-1:]])
    assert table.shape[0] == n_classes
    return jnp.take(table, jnp.clip(categorical, 0, n_classes - 1))
