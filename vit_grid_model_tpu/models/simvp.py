"""SimVP video-prediction stack (reference ``model.py:146-249``).

Encoder (strided ConvSC pyramid) -> Mid_Xnet (Inception U-net over the
time-folded channel axis) -> Decoder (transposed ConvSC pyramid with a skip
from the first encoder layer).  Strides alternate [1, 2, 1, 2, ...]
(``stride_generator``, ``model.py:146-149``).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from vit_grid_model_tpu.ops import convblocks as CB
from vit_grid_model_tpu.ops import nn as vnn

Array = jax.Array


def stride_generator(n: int, reverse: bool = False):
    strides = [1, 2] * 10
    return list(reversed(strides[:n])) if reverse else strides[:n]


@dataclasses.dataclass(frozen=True)
class SimVPSpec:
    shape_in: Tuple[int, int, int, int]    # (T, C, H, W)
    hid_s: int = 16
    hid_t: int = 256
    n_s: int = 4
    n_t: int = 8
    incep_ker: Tuple[int, ...] = (3, 5, 7, 11)
    groups: int = 8


def encoder_init(key, c_in: int, c_hid: int, n_s: int, dtype=jnp.float32):
    strides = stride_generator(n_s)
    keys = jax.random.split(key, n_s)
    layers = [CB.conv_sc_init(keys[0], c_in, c_hid, dtype)]
    layers += [CB.conv_sc_init(k, c_hid, c_hid, dtype) for k in keys[1:]]
    return {"enc": layers}


def encoder_apply(p, x: Array, *, n_s: int):
    strides = stride_generator(n_s)
    enc1 = CB.conv_sc(p["enc"][0], x, stride=strides[0])
    latent = enc1
    for layer, s in zip(p["enc"][1:], strides[1:]):
        latent = CB.conv_sc(layer, latent, stride=s)
    return latent, enc1


def decoder_init(key, c_hid: int, c_out: int, n_s: int, dtype=jnp.float32):
    strides = stride_generator(n_s, reverse=True)
    keys = jax.random.split(key, n_s + 1)
    layers = [CB.conv_sc_init(k, c_hid, c_hid, dtype)
              for k in keys[:n_s - 1]]
    layers.append(CB.conv_sc_init(keys[n_s - 1], 2 * c_hid, c_hid, dtype))
    return {"dec": layers,
            "readout": vnn.conv_init(keys[n_s], 1, 1, c_hid, c_out,
                                     dtype=dtype)}


def decoder_apply(p, hid: Array, enc1: Array, *, n_s: int) -> Array:
    strides = stride_generator(n_s, reverse=True)
    for layer, s in zip(p["dec"][:-1], strides[:-1]):
        hid = CB.conv_sc(layer, hid, stride=s, transpose=True)
    y = CB.conv_sc(p["dec"][-1], jnp.concatenate([hid, enc1], axis=-1),
                   stride=strides[-1], transpose=True)
    return vnn.conv2d(p["readout"], y, padding="VALID")


def mid_xnet_init(key, channel_in: int, channel_hid: int, n_t: int,
                  incep_ker=(3, 5, 7, 11), groups=8, dtype=jnp.float32):
    keys = jax.random.split(key, 2 * n_t)
    enc = [CB.inception_init(keys[0], channel_in, channel_hid // 2,
                             channel_hid, incep_ker, groups, dtype)]
    for i in range(1, n_t):
        enc.append(CB.inception_init(keys[i], channel_hid, channel_hid // 2,
                                     channel_hid, incep_ker, groups, dtype))
    dec = [CB.inception_init(keys[n_t], channel_hid, channel_hid // 2,
                             channel_hid, incep_ker, groups, dtype)]
    for i in range(1, n_t - 1):
        dec.append(CB.inception_init(
            keys[n_t + i], 2 * channel_hid, channel_hid // 2, channel_hid,
            incep_ker, groups, dtype))
    dec.append(CB.inception_init(
        keys[2 * n_t - 1], 2 * channel_hid, channel_hid // 2, channel_in,
        incep_ker, groups, dtype))
    return {"enc": enc, "dec": dec}


def mid_xnet_apply(p, x: Array, *, n_t: int,
                   incep_ker=(3, 5, 7, 11), groups: int = 8) -> Array:
    """x (B, T, H, W, C) NHWC-per-frame -> same shape."""
    b, t, h, w, c = x.shape
    # fold time into channels (``model.py:208``): NHWC layout keeps
    # channels last, so the fold is (B, H, W, T*C) with t-major channels
    z = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(b, h, w, t * c)
    kw = dict(incep_ker=incep_ker, groups=groups)
    skips = []
    for i in range(n_t):
        z = CB.inception(p["enc"][i], z, **kw)
        if i < n_t - 1:
            skips.append(z)
    z = CB.inception(p["dec"][0], z, **kw)
    for i in range(1, n_t):
        z = CB.inception(p["dec"][i],
                         jnp.concatenate([z, skips[-i]], axis=-1), **kw)
    z = z.reshape(b, h, w, t, c)
    return jnp.transpose(z, (0, 3, 1, 2, 4))


def simvp_init(key, spec: SimVPSpec, dtype=jnp.float32):
    t, c, _, _ = spec.shape_in
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "enc": encoder_init(k1, c, spec.hid_s, spec.n_s, dtype),
        "hid": mid_xnet_init(k2, t * spec.hid_s, spec.hid_t, spec.n_t,
                             spec.incep_ker, spec.groups, dtype),
        "dec": decoder_init(k3, spec.hid_s, c, spec.n_s, dtype),
    }


def simvp_apply(p, spec: SimVPSpec, x: Array) -> Array:
    """x (B, T, C, H, W) like the reference -> (B, T, C, H, W)."""
    b, t, c, h, w = x.shape
    xf = x.reshape(b * t, c, h, w).transpose(0, 2, 3, 1)   # NHWC frames
    embed, skip = encoder_apply(p["enc"], xf, n_s=spec.n_s)
    hc = embed.shape[-1]
    hh, ww = embed.shape[1], embed.shape[2]
    z = embed.reshape(b, t, hh, ww, hc)
    hid = mid_xnet_apply(p["hid"], z, n_t=spec.n_t,
                         incep_ker=spec.incep_ker, groups=spec.groups)
    hid = hid.reshape(b * t, hh, ww, hc)
    y = decoder_apply(p["dec"], hid, skip, n_s=spec.n_s)
    return y.transpose(0, 3, 1, 2).reshape(b, t, c, h, w)
