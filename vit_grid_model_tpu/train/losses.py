"""Training objectives.

The reference ships NO training loop; its README names **Focal-R** as the
regression loss (``README.md:16`` — no implementation anywhere in the repo,
SURVEY.md §0), and the commented-out block at ``metnet3.py:432-490``
documents the earlier class-based supervision (bucketized cross-entropy +
optional regional MSE, NaN targets masked with -100).  This module provides
all of them, NaN-aware and jit-friendly.

Focal-R (Yang et al., Delving into Deep Imbalanced Regression, ICML 2021):
continuous analogue of the focal loss — scale each example's L1/L2 error by
a focusing factor in [0, 1) that vanishes as the error -> 0, so easy
(small-error) examples are down-weighted and the rare high-PM events
dominate the gradient.  The canonical factor (the authors' released
implementation) is ``(2 * sigma(beta * |e|) - 1) ** gamma``: exactly 0 at
e = 0, monotone in |e|, -> 1 for large errors.  The paper's in-text formula
(``sigma(|beta e|) ** gamma``, which lives in [0.5, 1) and therefore never
down-weights below half) is kept flag-gated as ``focusing="sigmoid"`` for
reproducibility of earlier runs.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

Array = jax.Array


def _masked_mean(values: Array, mask: Optional[Array]) -> Array:
    if mask is None:
        return jnp.mean(values)
    mask = mask.astype(values.dtype)
    return jnp.sum(values * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def _nan_mask(targets: Array, mask: Optional[Array]) -> tuple:
    finite = jnp.isfinite(targets)
    targets = jnp.where(finite, targets, 0.0)
    m = finite if mask is None else (finite & mask.astype(bool))
    return targets, m


def focal_r_weight(err: Array, *, beta: float = 0.2, gamma: float = 1.0,
                   focusing: str = "canonical") -> Array:
    """The Focal-R focusing factor on a signed error.

    ``canonical`` (default): ``(2*sigma(beta*|e|) - 1)^gamma`` — range
    [0, 1), zero at e=0, so easy examples vanish from the gradient.
    ``sigmoid`` (legacy, the paper's ambiguous in-text form):
    ``sigma(|beta*e|)^gamma`` — range [0.5, 1), down-weights at most 2x.
    """
    ae = jnp.abs(beta * err)
    if focusing == "canonical":
        # 2*sigmoid(x) - 1 == tanh(x/2): use tanh for one fewer op and
        # better numerics near zero
        w = jnp.tanh(0.5 * ae)
    elif focusing == "sigmoid":
        w = jax.nn.sigmoid(ae)
    else:
        raise ValueError(f"unknown focal focusing form: {focusing!r}")
    return w ** gamma


def focal_r_loss(preds: Array, targets: Array, *,
                 mask: Optional[Array] = None, beta: float = 0.2,
                 gamma: float = 1.0, base: str = "l1",
                 focusing: str = "canonical") -> Array:
    """Focal-R: focusing factor times ``|e|^p`` averaged over valid cells;
    ``base`` selects L1 (p=1) or MSE (p=2); see :func:`focal_r_weight` for
    the two focusing forms."""
    targets, m = _nan_mask(targets, mask)
    err = preds - targets
    weight = focal_r_weight(err, beta=beta, gamma=gamma, focusing=focusing)
    core = jnp.abs(err) if base == "l1" else jnp.square(err)
    return _masked_mean(weight * core, m)


def mse_loss(preds: Array, targets: Array,
             mask: Optional[Array] = None) -> Array:
    targets, m = _nan_mask(targets, mask)
    return _masked_mean(jnp.square(preds - targets), m)


def mae_loss(preds: Array, targets: Array,
             mask: Optional[Array] = None) -> Array:
    targets, m = _nan_mask(targets, mask)
    return _masked_mean(jnp.abs(preds - targets), m)


def huber_loss(preds: Array, targets: Array, *, delta: float = 10.0,
               mask: Optional[Array] = None) -> Array:
    targets, m = _nan_mask(targets, mask)
    err = jnp.abs(preds - targets)
    quad = jnp.minimum(err, delta)
    return _masked_mean(0.5 * quad ** 2 + delta * (err - quad), m)


def pm_class_cross_entropy(logits: Array, targets: Array,
                           boundaries: Sequence[float]) -> Array:
    """The reference's intended classification head loss
    (``metnet3.py:436-441``): bucketize continuous PM targets by the class
    boundaries, cross-entropy on per-cell logits, NaN targets ignored.

    logits: (B, n_classes, ...) or (B, ..., n_classes) — channel-last here.
    targets: (B, ...) continuous values.
    """
    b = jnp.asarray(boundaries, dtype=targets.dtype)
    labels = jnp.sum(targets[..., None] > b, axis=-1)       # bucketize right
    valid = jnp.isfinite(targets)
    labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return _masked_mean(nll, valid)


def regional_mse_loss(region_preds: Array, region_targets: Array) -> Array:
    """Regional regression head loss (``metnet3.py:448-459``): MSE over
    non-NaN regional targets."""
    return mse_loss(region_preds, region_targets)


def make_loss(name: str, **kw):
    table = {
        "focal_r": lambda p, t, m=None: focal_r_loss(p, t, mask=m, **kw),
        "mse": lambda p, t, m=None: mse_loss(p, t, m),
        "mae": lambda p, t, m=None: mae_loss(p, t, m),
        "huber": lambda p, t, m=None: huber_loss(p, t, mask=m, **kw),
    }
    return table[name]
