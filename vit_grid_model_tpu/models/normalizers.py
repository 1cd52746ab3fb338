"""Normalization components: RevIN, DishTS, TimeEncode.

Functional re-designs of the reference modules (``model.py:11-144``, RevIN
duplicated at ``metnet3.py:14-83``).  The torch versions store statistics on
``self`` between calls; here statistics are explicit values threaded through
the caller — jit-pure and shardable.

Parity quirks preserved:

* RevIN statistics: the plain (NaN-propagating) mean over the reduce axes
  with the NaN-masked variance; any slice containing a NaN falls back to the
  defaults for BOTH stats, and zero-stdev slices fall back too
  (``model.py:43-57``);
* denorm divides by ``weight + eps^2`` (not +eps, ``model.py:68``);
* ``denorm2`` slices the stats/affine to the output's trailing dim
  (``model.py:73-80``);
* DishTS ``norm`` ignores ``prev`` entirely — statistics come from the
  input itself; ``denorm`` reuses the phih/xih of the LAST norm call
  (``model.py:116-144``), so ``norm`` returns them for the caller to pass
  back in;
* TimeEncode's learned frequencies init ``1/alpha**linspace(0, alpha-1, d)``
  with ``alpha = int(sqrt(d))`` (``model.py:88-90``).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


Array = jax.Array


# ---------------------------------------------------------------------------
# RevIN
# ---------------------------------------------------------------------------

def revin_init(num_features: int, affine: bool = True, dtype=jnp.float32):
    if not affine:
        return {}
    return {"affine_weight": jnp.ones((num_features,), dtype),
            "affine_bias": jnp.zeros((num_features,), dtype)}


class RevINStats(NamedTuple):
    mean: Array     # (..., 1, C) keepdims over the reduce axes
    stdev: Array


def revin_statistics(x: Array, *, default_mean: float, default_std: float,
                     eps: float = 1e-5) -> RevINStats:
    """NaN-aware stats over all axes but first/last (``model.py:43-57``)."""
    axes = tuple(range(1, x.ndim - 1))
    mask = ~jnp.isnan(x)
    counts = jnp.sum(mask, axis=axes, keepdims=True)
    mean = jnp.mean(x, axis=axes, keepdims=True)      # NaN-propagating
    sq = jnp.where(mask, jnp.square(x - mean), 0.0)
    var = jnp.sum(sq, axis=axes, keepdims=True) / counts
    stdev = jnp.sqrt(var + eps)
    mean = jnp.where(jnp.isnan(mean), default_mean, mean)
    stdev = jnp.where(jnp.isnan(stdev), default_std, stdev)
    stdev = jnp.where(stdev == 0, default_std, stdev)
    return RevINStats(mean, stdev)


def revin_norm(p, stats: RevINStats, x: Array) -> Array:
    x = (x - stats.mean) / stats.stdev
    if "affine_weight" in p:
        x = x * p["affine_weight"] + p["affine_bias"]
    return x


def revin_denorm(p, stats: RevINStats, x: Array, *, eps: float = 1e-5) -> Array:
    if "affine_weight" in p:
        x = (x - p["affine_bias"]) / (p["affine_weight"] + eps * eps)
    return x * stats.stdev + stats.mean


def revin_denorm2(p, stats: RevINStats, x: Array, *, eps: float = 1e-5) -> Array:
    """Stats and affine sliced to the output's trailing width
    (``model.py:73-80``)."""
    k = x.shape[2]
    if "affine_weight" in p:
        x = (x - p["affine_bias"][:k]) / (p["affine_weight"][:k] + eps * eps)
    return x * stats.stdev[:, :, :k] + stats.mean[:, :, :k]


# ---------------------------------------------------------------------------
# DishTS
# ---------------------------------------------------------------------------

def dishts_init(stn_num: int, prev_len: int, dtype=jnp.float32):
    """'standard' init (``model.py:107-113``)."""
    return {
        "reduce_mlayer": jnp.ones((stn_num, prev_len, 2), dtype) / prev_len,
        "gamma": jnp.ones((stn_num,), dtype),
        "beta": jnp.zeros((stn_num,), dtype),
    }


class DishTSStats(NamedTuple):
    phil: Array
    phih: Array
    xil: Array
    xih: Array


def dishts_preget(p, x: Array) -> DishTSStats:
    """x (B, L, C) with L == the layer's lookback (``model.py:128-135``)."""
    xt = jnp.transpose(x, (2, 0, 1))                     # (C, B, L)
    theta = jnp.einsum("cbl,clk->cbk", xt, p["reduce_mlayer"],
                       preferred_element_type=jnp.float32)
    theta = jnp.transpose(theta, (1, 2, 0))              # (B, 2, C)
    theta = jax.nn.gelu(theta, approximate=False)
    phil, phih = theta[:, :1, :], theta[:, 1:, :]
    xil = jnp.sum(jnp.square(x - phil), axis=1, keepdims=True) / (x.shape[1] - 1)
    xih = jnp.sum(jnp.square(x - phih), axis=1, keepdims=True) / (x.shape[1] - 1)
    return DishTSStats(phil, phih, xil, xih)


def dishts_norm(p, x: Array) -> Tuple[Array, DishTSStats]:
    stats = dishts_preget(p, x)
    y = (x - stats.phil) / jnp.sqrt(stats.xil + 1e-8)
    return y * p["gamma"] + p["beta"], stats


def dishts_denorm(p, stats: DishTSStats, x: Array) -> Array:
    return ((x - p["beta"]) / p["gamma"]) * jnp.sqrt(stats.xih + 1e-8) \
        + stats.phih


# ---------------------------------------------------------------------------
# TimeEncode
# ---------------------------------------------------------------------------

def time_encode_init(dim: int, dtype=jnp.float32):
    alpha = int(dim ** 0.5)
    freqs = 1.0 / alpha ** np.linspace(0, alpha - 1, dim)
    return {"w": jnp.asarray(freqs, dtype).reshape(dim, 1),
            "b": jnp.zeros((dim,), dtype)}


def time_encode(p, t: Array) -> Array:
    """t any shape -> (t.size, 2*dim): [sin(wt+b), cos(wt+b)]
    (``model.py:92-96``)."""
    z = t.reshape(-1, 1) @ p["w"].T + p["b"]
    return jnp.concatenate([jnp.sin(z), jnp.cos(z)], axis=1)
