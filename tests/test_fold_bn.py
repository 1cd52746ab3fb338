"""Eval-time BN folding (``fold_bn_eval``): equivalence vs separate BNs.

The reference keeps MBConv's three BatchNorms as separate elementwise passes
at eval (``maxvit.py:87-97``); folding them into the adjacent conv weights is
a pure param transform that must match up to one float re-association per
channel.  Flag-gated — these tests pin the equivalence.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_grid_model_tpu.core.config import MetNet3Config
from vit_grid_model_tpu.models.metnet3 import metnet3_apply, metnet3_init
from vit_grid_model_tpu.ops import nn as vnn
from vit_grid_model_tpu.ops.mbconv import mbconv, mbconv_init


def _perturbed_mbconv_params(key, dim_in, dim_out, downsample):
    """MBConv params with non-trivial running BN stats (init gives mean=0,
    var=1, under which folding is nearly a no-op and the test would be
    vacuous)."""
    p = mbconv_init(key, dim_in, dim_out, downsample=downsample)
    rng = np.random.default_rng(0)
    for bn in ("bn1", "bn2", "bn3"):
        c = p[bn]["mean"].shape[0]
        p[bn]["mean"] = jnp.asarray(rng.normal(0.3, 1.0, c), jnp.float32)
        p[bn]["var"] = jnp.asarray(rng.uniform(0.2, 3.0, c), jnp.float32)
        p[bn]["scale"] = jnp.asarray(rng.normal(1.0, 0.2, c), jnp.float32)
        p[bn]["bias"] = jnp.asarray(rng.normal(0.0, 0.3, c), jnp.float32)
    return p


@pytest.mark.parametrize("downsample", [False, True])
def test_mbconv_fold_bn_equivalence(downsample):
    key = jax.random.PRNGKey(3)
    p = _perturbed_mbconv_params(key, 32, 32, downsample)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 14, 14, 32))
    kw = dict(dim_in=32, dim_out=32, downsample=downsample)
    with jax.default_matmul_precision("highest"):
        y0 = mbconv(p, x, **kw)
        y1 = mbconv(p, x, fold_bn=True, **kw)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-5, atol=2e-5)


def test_fold_bn_into_conv_depthwise():
    """Depthwise conv: per-group output channel is still the last HWIO axis,
    so the same fold applies."""
    key = jax.random.PRNGKey(5)
    c = 24
    p = vnn.conv_init(key, 3, 3, c, c, groups=c)
    bn = vnn.batch_norm_init(c)
    rng = np.random.default_rng(1)
    bn["mean"] = jnp.asarray(rng.normal(0, 1, c), jnp.float32)
    bn["var"] = jnp.asarray(rng.uniform(0.5, 2.0, c), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 10, 10, c))
    with jax.default_matmul_precision("highest"):
        y0 = vnn.batch_norm(bn, vnn.depthwise_conv2d(p, x, padding=1))
        y1 = vnn.depthwise_conv2d(vnn.fold_bn_into_conv(p, bn), x, padding=1)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-5, atol=2e-5)


def test_metnet3_fold_bn_eval_flag():
    """Model-level: fold_bn_eval=True == False on the full forward (f32)."""
    cfg = MetNet3Config(window_size=4, n_variables=6, n_start_channels=16,
                        end_lead_time=2, pm25_mean=20.0, pm25_std=10.0,
                        n_heads=4, dim_head=8,
                        pm25_channel_indices=(1, 2, 3, 4))
    params = metnet3_init(jax.random.PRNGKey(0), cfg)
    # perturb the vit layer's BN stats so the fold is non-trivial
    rng = np.random.default_rng(2)
    for layer in params["vit"]["layers"]:
        for bn in ("bn1", "bn2", "bn3"):
            c = layer["conv"][bn]["mean"].shape[0]
            layer["conv"][bn]["mean"] = jnp.asarray(
                rng.normal(0.2, 0.8, c), jnp.float32)
            layer["conv"][bn]["var"] = jnp.asarray(
                rng.uniform(0.3, 2.5, c), jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 4, 6, 82, 67)) * 50
    ts = jnp.tile(jnp.asarray([2023., 1., 15., 6.]), (2, 4, 1))
    cfg_fold = dataclasses.replace(cfg, fold_bn_eval=True)
    with jax.default_matmul_precision("highest"):
        y0 = jax.jit(lambda p, a, b: metnet3_apply(p, a, b, cfg))(
            params, x, ts)
        y1 = jax.jit(lambda p, a, b: metnet3_apply(p, a, b, cfg_fold))(
            params, x, ts)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=5e-5, atol=5e-4)
