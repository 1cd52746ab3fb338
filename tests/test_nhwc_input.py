"""Host-prepared NHWC input staging (``MetNet3Config.nhwc_input``).

The contract under test: staging the assembled channels-last stack
directly into the device layout (``sim_stack_to_nhwc_input``) and running
the model with ``nhwc_input=True`` is BIT-EXACT vs the standard path fed
the same compute-dtype-staged (B, T, C, H, W) tensor — the on-chip
relayout it removes is a pure permutation, and the in-forward PM
standardization applies the identical ``(x - mean) / std`` ops to the
identical interior lanes (``standardize_pm_channels_nhwc``).
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_grid_model_tpu.core.config import MetNet3Config
from vit_grid_model_tpu.data.assembly import (sim_stack_to_model_input,
                                              sim_stack_to_nhwc_input)
from vit_grid_model_tpu.models.metnet3 import (metnet3_apply, metnet3_init,
                                               pad_values)

B, T, C, H, W = 2, 5, 8, 18, 17
BC = C + 4          # assembled stack has 4 lead channels per step


def _cfg(**kw):
    base = dict(window_size=T, n_variables=C, n_start_channels=32,
                end_lead_time=3, input_height=H, input_width=W,
                pm25_mean=22.5, pm25_std=15.5, n_heads=4, dim_head=8,
                pm25_channel_indices=(4,), fuse_lead_stem=True)
    base.update(kw)
    return MetNet3Config(**base)


def _stack(seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((B, H, W, T * BC)) * 30).astype(np.float32)


def _prepared_vs_standard(sim, cfg):
    """Run both staging+model paths from the same assembled stack."""
    ts = np.tile(np.asarray([2023., 1., 15., 6.], np.float32), (B, T, 1))
    params = metnet3_init(jax.random.PRNGKey(0), cfg)
    dtype = jnp.dtype(cfg.compute_dtype)

    x_std = jnp.asarray(np.asarray(
        sim_stack_to_model_input(sim, T, out_dtype=dtype)))
    y_std = jax.jit(lambda p, a, b: metnet3_apply(p, a, b, cfg))(
        params, x_std, ts)

    cfg_n = dataclasses.replace(cfg, nhwc_input=True)
    xp = jnp.asarray(np.asarray(
        sim_stack_to_nhwc_input(sim, T, cfg.pad_multiple, dtype)))
    y_n = jax.jit(lambda p, a, b: metnet3_apply(p, a, b, cfg_n))(
        params, xp, ts)
    return np.asarray(y_std), np.asarray(y_n)


@pytest.mark.parametrize("compute_dtype", ["bfloat16", "float32"])
def test_nhwc_path_bit_equals_standard(compute_dtype):
    y_std, y_n = _prepared_vs_standard(
        _stack(), _cfg(compute_dtype=compute_dtype))
    assert y_std.shape == y_n.shape
    assert (y_std == y_n).all()


def test_nhwc_staging_numpy_native_parity():
    """The native vg_repack_nhwc and the numpy fallback are byte-identical
    (both dtypes), and the pad split matches models.metnet3.pad_values."""
    from vit_grid_model_tpu.data import native

    sim = _stack(3)
    for dtype in (np.float32, jnp.bfloat16):
        out = np.asarray(sim_stack_to_nhwc_input(sim, T, 14, dtype)).copy()
        # hand-built reference with the model's own pad split
        l, r, t, b = pad_values(H, W, 14)
        ref = np.zeros((B, H + t + b, W + l + r, T * C), np.float32)
        ref[:, t:t + H, l:l + W] = (
            sim.reshape(B, H, W, T, BC)[..., :C].reshape(B, H, W, -1))
        assert out.shape == ref.shape
        assert (out == ref.astype(dtype)).all()
        if native.available():
            # force the numpy fallback via a non-contiguous source view
            sim_nc = np.asfortranarray(sim)
            assert not native.repack_nhwc_native(
                sim_nc, T, (l, t, H + t + b, W + l + r),
                np.zeros_like(out))


@pytest.mark.parametrize("compute_dtype", ["bfloat16", "float32"])
def test_nhwc_path_covers_stn_img_variant(compute_dtype):
    """The fast path covers MetNet3_with_stn_imgs (round-4 verdict item 5):
    a (B, T, C+1, H, W) input with the station-image channel staged via
    ``model_input_to_nhwc`` is bit-exact vs the standard path — incl. the
    in-forward standardization of the extra channel (``metnet3.py:701``)."""
    from vit_grid_model_tpu.data.assembly import model_input_to_nhwc

    Cs = C + 1
    cfg = _cfg(compute_dtype=compute_dtype, n_variables=Cs,
               stn_img_channel=Cs - 1)
    params = metnet3_init(jax.random.PRNGKey(0), cfg)
    ts = np.tile(np.asarray([2023., 1., 15., 6.], np.float32), (B, T, 1))
    rng = np.random.default_rng(11)
    x = (rng.standard_normal((B, T, Cs, H, W)) * 30).astype(np.float32)
    dtype = jnp.dtype(cfg.compute_dtype)

    y_std = jax.jit(lambda p, a, b: metnet3_apply(p, a, b, cfg))(
        params, jnp.asarray(x.astype(dtype)), ts)
    cfg_n = dataclasses.replace(cfg, nhwc_input=True)
    xp = jnp.asarray(np.asarray(
        model_input_to_nhwc(x, cfg.pad_multiple, dtype)))
    y_n = jax.jit(lambda p, a, b: metnet3_apply(p, a, b, cfg_n))(
        params, xp, ts)
    assert y_std.shape == y_n.shape
    assert (np.asarray(y_std) == np.asarray(y_n)).all()


def test_nhwc_rejects_wrong_geometry():
    cfg = dataclasses.replace(_cfg(compute_dtype="bfloat16"),
                              nhwc_input=True)
    params = metnet3_init(jax.random.PRNGKey(0), cfg)
    ts = np.tile(np.asarray([2023., 1., 15., 6.], np.float32), (B, T, 1))
    bad = jnp.zeros((B, H, W, T * C), jnp.bfloat16)   # unpadded
    with pytest.raises(ValueError, match="nhwc_input expects"):
        metnet3_apply(params, bad, ts, cfg)
