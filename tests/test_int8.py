"""int8 PTQ of the resnet 3x3 convs (``ops/quantize.py``): calibration,
sidecar attachment, accuracy vs the float path, and flag gating."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_grid_model_tpu.core.config import MetNet3Config
from vit_grid_model_tpu.models.metnet3 import metnet3_apply, metnet3_init
from vit_grid_model_tpu.ops import nn as vnn
from vit_grid_model_tpu.ops.quantize import (conv2d_int8, quantize_conv,
                                             quantize_metnet3_int8)


def test_conv2d_int8_matches_float_within_quant_error():
    key = jax.random.PRNGKey(0)
    p = vnn.conv_init(key, 3, 3, 32, 32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 12, 32))
    qp = quantize_conv(p, act_amax=float(jnp.max(jnp.abs(x))))
    with jax.default_matmul_precision("highest"):
        y0 = np.asarray(vnn.conv2d(p, x, padding=1))
        y1 = np.asarray(conv2d_int8(qp, x, padding=1))
    # symmetric 8-bit over a 288-summand conv: ~1% worst-case of the output
    # scale (measured 1.05%), RMS ~0.2%
    denom = np.maximum(np.abs(y0).max(), 1e-6)
    assert np.max(np.abs(y1 - y0)) / denom < 0.02
    assert np.sqrt(np.mean((y1 - y0) ** 2)) / denom < 0.005


def _cfg(**over):
    base = dict(window_size=4, n_variables=6, n_start_channels=16,
                end_lead_time=2, pm25_mean=20.0, pm25_std=10.0, n_heads=4,
                dim_head=8, pm25_channel_indices=(1, 2, 3, 4))
    base.update(over)
    return MetNet3Config(**base)


@pytest.mark.parametrize("fuse_stem", [False, True])
def test_metnet3_int8_accuracy(fuse_stem):
    """Full-forward int8 output stays close to the float forward, and the
    flag alone (no sidecars) changes nothing."""
    cfg = _cfg(fuse_lead_stem=fuse_stem)
    params = metnet3_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 4, 6, 82, 67)) * 50
    ts = jnp.tile(jnp.asarray([2023., 1., 15., 6.]), (2, 4, 1))
    cfg_q = dataclasses.replace(cfg, int8_convs=True)

    with jax.default_matmul_precision("highest"):
        y0 = np.asarray(jax.jit(
            lambda p, a, b: metnet3_apply(p, a, b, cfg))(params, x, ts))
        # flag on, no sidecars: bitwise the float path
        y_nosc = np.asarray(jax.jit(
            lambda p, a, b: metnet3_apply(p, a, b, cfg_q))(params, x, ts))
        np.testing.assert_array_equal(y_nosc, y0)

        qparams = quantize_metnet3_int8(params, cfg, [(x, ts)])
        y1 = np.asarray(jax.jit(
            lambda p, a, b: metnet3_apply(p, a, b, cfg_q))(qparams, x, ts))
        # quantized params under int8_convs=False: float path, bit-equal
        y_off = np.asarray(jax.jit(
            lambda p, a, b: metnet3_apply(p, a, b, cfg))(qparams, x, ts))
        np.testing.assert_array_equal(y_off, y0)

    # de-standardized PM2.5 fields: a fraction of 1 ug/m3 of quant noise
    rmse = float(np.sqrt(np.mean((y1 - y0) ** 2)))
    assert rmse < 0.5, rmse
    assert np.max(np.abs(y1 - y0)) < 5.0


def test_quantize_sidecar_sites():
    """Default skip leaves the raw-input conv unquantized; all other Block
    convs get sidecars."""
    cfg = _cfg()
    params = metnet3_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 4, 6, 82, 67)) * 50
    ts = jnp.tile(jnp.asarray([2023., 1., 15., 6.]), (1, 4, 1))
    q = quantize_metnet3_int8(params, cfg, [(x, ts)])
    assert "proj_q" not in q["resnet1"]["blocks"][0]["block1"]
    assert "proj_q" in q["resnet1"]["blocks"][0]["block2"]
    for stage in ("resnet1", "resnet2"):
        for b, blk in enumerate(q[stage]["blocks"]):
            if (stage, b) == ("resnet1", 0):
                continue
            assert "proj_q" in blk["block1"], (stage, b)
            assert "proj_q" in blk["block2"], (stage, b)
    # sidecar dtypes: int8 weights, f32 scales
    sc = q["resnet2"]["blocks"][0]["block1"]["proj_q"]
    assert sc["wq"].dtype == jnp.int8
    assert sc["sw"].dtype == jnp.float32 and sc["sx"].dtype == jnp.float32
