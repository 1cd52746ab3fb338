"""SimVP-family conv blocks (reference ``modules.py:4-65``).

NHWC functional counterparts of BasicConv2d / ConvSC / GroupConv2d /
Inception.  Parity notes:

* BasicConv2d transpose mode uses ``output_padding = stride // 2``
  (``modules.py:11``), i.e. stride-2 transposed 3x3 with output_padding 1 —
  expressed here as the gradient-conv with explicit padding;
* GroupConv2d falls back to groups=1 when channels don't divide
  (``modules.py:39-40``);
* Inception SUMS its per-kernel-size branches (``modules.py:61-65``).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

from vit_grid_model_tpu.ops import nn as vnn

Array = jax.Array


def basic_conv2d_init(key, c_in: int, c_out: int, kernel: int,
                      transpose: bool = False, dtype=jnp.float32):
    if transpose:
        # torch ConvTranspose2d weight (in, out, k, k); converter flips +
        # transposes to HWIO(in->out); same init bound as conv
        p = vnn.conv_init(key, kernel, kernel, c_in, c_out, dtype=dtype)
    else:
        p = vnn.conv_init(key, kernel, kernel, c_in, c_out, dtype=dtype)
    return {"conv": p, "norm": vnn.group_norm_init(c_out, dtype)}


def basic_conv2d(p, x: Array, *, stride: int, padding: int,
                 transpose: bool = False, output_padding: int = 0,
                 act_norm: bool = False, groups_for_norm: int = 2) -> Array:
    if not transpose:
        y = vnn.conv2d(p["conv"], x, stride=stride, padding=padding)
    else:
        # torch ConvTranspose2d(k, stride, padding, output_padding):
        # out = (in-1)*s - 2*pad + k + output_padding.  lax.conv_transpose
        # VALID gives (in-1)*s + k; trim pad from both sides and add
        # output_padding on the bottom/right.
        y = lax.conv_transpose(
            x, p["conv"]["w"], strides=(stride, stride), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if "b" in p["conv"]:
            y = y + p["conv"]["b"]
        # out = (in-1)*s - 2*pad + k + output_padding; with
        # output_padding <= padding (all ConvSC configs) the slice below is
        # always in-bounds of the VALID conv_transpose result
        assert output_padding <= padding, (output_padding, padding)
        h, w = y.shape[1], y.shape[2]
        y = y[:, padding:h - padding + output_padding,
              padding:w - padding + output_padding, :]
    if act_norm:
        y = vnn.leaky_relu(vnn.group_norm(p["norm"], y,
                                          groups=groups_for_norm))
    return y


def conv_sc_init(key, c_in: int, c_out: int, dtype=jnp.float32):
    return basic_conv2d_init(key, c_in, c_out, 3, dtype=dtype)


def conv_sc(p, x: Array, *, stride: int, transpose: bool = False,
            act_norm: bool = True) -> Array:
    """ConvSC (``modules.py:22-32``): 3x3, padding 1; stride==1 forces
    non-transpose."""
    if stride == 1:
        transpose = False
    return basic_conv2d(p, x, stride=stride, padding=1, transpose=transpose,
                        output_padding=stride // 2 if transpose else 0,
                        act_norm=act_norm)


def effective_groups(c_in: int, groups: int) -> int:
    """GroupConv2d falls back to groups=1 on non-divisible channels
    (``modules.py:39-40``)."""
    return groups if c_in % groups == 0 else 1


def group_conv2d_init(key, c_in: int, c_out: int, kernel: int, groups: int,
                      dtype=jnp.float32):
    groups = effective_groups(c_in, groups)
    p = vnn.conv_init(key, kernel, kernel, c_in, c_out, groups=groups,
                      dtype=dtype)
    return {"conv": p, "norm": vnn.group_norm_init(c_out, dtype)}


def group_conv2d(p, x: Array, *, kernel: int, groups: int,
                 act_norm: bool = True) -> Array:
    groups = effective_groups(x.shape[-1], groups)
    y = vnn.conv2d(p["conv"], x, stride=1, padding=kernel // 2,
                   groups=groups)
    if act_norm:
        y = vnn.leaky_relu(vnn.group_norm(p["norm"], y, groups=groups))
    return y


def inception_init(key, c_in: int, c_hid: int, c_out: int,
                   incep_ker: Sequence[int] = (3, 5, 7, 11),
                   groups: int = 8, dtype=jnp.float32):
    keys = jax.random.split(key, len(incep_ker) + 1)
    return {
        "conv1": vnn.conv_init(keys[0], 1, 1, c_in, c_hid, dtype=dtype),
        "layers": [group_conv2d_init(keys[i + 1], c_hid, c_out, k, groups,
                                     dtype)
                   for i, k in enumerate(incep_ker)],
    }


def inception(p, x: Array, *, incep_ker: Sequence[int] = (3, 5, 7, 11),
              groups: int = 8) -> Array:
    x = vnn.conv2d(p["conv1"], x, padding="VALID")
    y = 0.0
    for layer_p, k in zip(p["layers"], incep_ker):
        y = y + group_conv2d(layer_p, x, kernel=k, groups=groups,
                             act_norm=True)
    return y
