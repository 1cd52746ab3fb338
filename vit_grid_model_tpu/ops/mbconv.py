"""MBConv inverted-bottleneck block (reference ``maxvit.py:75-102``).

Structure: 1x1 expand -> BN -> GELU -> depthwise 3x3 -> BN -> GELU ->
squeeze-excite -> 1x1 project -> BN, with a residual (plus stochastic
dropsample) only when ``dim_in == dim_out and not downsample``.

Parity notes:
* ``stride = 1 if downsample else 1`` — both branches are 1 in the
  reference (``maxvit.py:85``), so MBConv NEVER changes spatial size;
  ``downsample=True`` only disables the residual.  Reproduced verbatim.
* hidden width = ``expansion_rate * dim_out`` (not dim_in).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vit_grid_model_tpu.ops import nn as vnn

Array = jax.Array


def mbconv_init(key, dim_in: int, dim_out: int, *, downsample: bool,
                expansion_rate: int = 4, shrinkage_rate: float = 0.25,
                dtype=jnp.float32):
    hidden = int(expansion_rate * dim_out)
    keys = jax.random.split(key, 4)
    return {
        "expand": vnn.conv_init(keys[0], 1, 1, dim_in, hidden, dtype=dtype),
        "bn1": vnn.batch_norm_init(hidden, dtype),
        "dw": vnn.conv_init(keys[1], 3, 3, hidden, hidden, groups=hidden,
                            dtype=dtype),
        "bn2": vnn.batch_norm_init(hidden, dtype),
        "se": vnn.squeeze_excite_init(keys[2], hidden, shrinkage_rate, dtype),
        "project": vnn.conv_init(keys[3], 1, 1, hidden, dim_out, dtype=dtype),
        "bn3": vnn.batch_norm_init(dim_out, dtype),
    }


def mbconv(p, x: Array, *, dim_in: int, dim_out: int, downsample: bool,
           dropout_rate: float = 0.0, training: bool = False,
           dropout_key: Optional[Array] = None,
           fold_bn: bool = False) -> Array:
    """Inference-mode MBConv (running BN stats).  For training-mode BN see
    ``mbconv_train`` which also returns updated statistics.

    ``fold_bn`` (inference only): fold each BatchNorm into its preceding
    conv's weights (``vnn.fold_bn_into_conv``) so the three separate
    elementwise BN passes disappear — equivalent up to one float
    re-association per channel (tested); flag-gated because the parity
    contract keeps the reference's separate-BN numerics bit-stable."""
    if fold_bn and not training:
        h = vnn.conv2d(vnn.fold_bn_into_conv(p["expand"], p["bn1"]), x,
                       padding="VALID")
        h = vnn.gelu(h)
        h = vnn.depthwise_conv2d(vnn.fold_bn_into_conv(p["dw"], p["bn2"]),
                                 h, padding=1)
        h = vnn.gelu(h)
        h = vnn.squeeze_excite(p["se"], h)
        h = vnn.conv2d(vnn.fold_bn_into_conv(p["project"], p["bn3"]), h,
                       padding="VALID")
    else:
        h = vnn.conv2d(p["expand"], x, padding="VALID")
        h = vnn.gelu(vnn.batch_norm(p["bn1"], h))
        h = vnn.depthwise_conv2d(p["dw"], h, padding=1)
        h = vnn.gelu(vnn.batch_norm(p["bn2"], h))
        h = vnn.squeeze_excite(p["se"], h)
        h = vnn.conv2d(p["project"], h, padding="VALID")
        h = vnn.batch_norm(p["bn3"], h)
    if dim_in == dim_out and not downsample:
        h = vnn.drop_sample(dropout_key, h, dropout_rate, training)
        h = h + x
    return h


def mbconv_train(p, x: Array, *, dim_in: int, dim_out: int, downsample: bool,
                 dropout_rate: float = 0.0,
                 dropout_key: Optional[Array] = None):
    """Training-mode MBConv: batch statistics + running-stat updates.
    Returns (y, new_bn_stats_pytree)."""
    h = vnn.conv2d(p["expand"], x, padding="VALID")
    h, s1 = vnn.batch_norm(p["bn1"], h, training=True)
    h = vnn.gelu(h)
    h = vnn.depthwise_conv2d(p["dw"], h, padding=1)
    h, s2 = vnn.batch_norm(p["bn2"], h, training=True)
    h = vnn.gelu(h)
    h = vnn.squeeze_excite(p["se"], h)
    h = vnn.conv2d(p["project"], h, padding="VALID")
    h, s3 = vnn.batch_norm(p["bn3"], h, training=True)
    if dim_in == dim_out and not downsample:
        h = vnn.drop_sample(dropout_key, h, dropout_rate, training=True)
        h = h + x
    return h, {"bn1": s1, "bn2": s2, "bn3": s3}
