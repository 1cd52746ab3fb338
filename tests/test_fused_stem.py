"""The lead-factorized stem must match the reference path numerically."""

import numpy as np

import jax
import jax.numpy as jnp

from tests import conftest as C  # noqa: F401
from vit_grid_model_tpu.core.config import MetNet3Config
from vit_grid_model_tpu.models.metnet3 import metnet3_apply, metnet3_init


def test_fused_lead_stem_matches_reference_path():
    cfg = MetNet3Config(window_size=3, n_variables=24, n_start_channels=16,
                        end_lead_time=3, pm25_mean=22.5, pm25_std=15.5,
                        n_heads=4, dim_head=4)
    cfg_fused = MetNet3Config(**{**cfg.__dict__, "fuse_lead_stem": True})
    params = metnet3_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 3, 24, 82, 67), dtype=np.float32) * 50)
    ts = jnp.tile(jnp.asarray([2023.0, 3.0, 7.0, 11.0]), (2, 7, 1))

    y_ref = jax.jit(lambda p, a, b: metnet3_apply(p, a, b, cfg))(params, x, ts)
    y_fused = jax.jit(lambda p, a, b: metnet3_apply(p, a, b, cfg_fused))(
        params, x, ts)
    rel = np.abs(np.asarray(y_fused) - np.asarray(y_ref)).max() / (
        np.abs(np.asarray(y_ref)).max())
    assert rel < 1e-5, rel


def test_fused_lead_stem_training_loss_curve():
    """Gradients flow correctly through the factorized stem: a short train
    run matches the reference-path loss curve (train --fast enables it)."""
    from vit_grid_model_tpu.core.config import TrainConfig
    from vit_grid_model_tpu.train.trainer import (build_train_step,
                                                  init_train_state)

    base = dict(window_size=3, n_variables=24, n_start_channels=16,
                end_lead_time=2, pm25_mean=22.5, pm25_std=15.5,
                n_heads=4, dim_head=4, dropout=0.0)
    tc = TrainConfig(learning_rate=1e-3, total_steps=4, warmup_steps=1,
                     batch_size=2)
    rng = np.random.default_rng(0)
    batches = [{
        "x": rng.random((2, 3, 24, 82, 67), dtype=np.float32) * 50,
        "timestamps": np.tile(np.asarray([2023., 1., 15., 6.], np.float32),
                              (2, 7, 1)),
        "targets": rng.random((2, 2, 82, 67), dtype=np.float32) * 60,
    } for _ in range(3)]

    def run2(fused):
        cfg = MetNet3Config(**base, fuse_lead_stem=fused)
        params = metnet3_init(jax.random.PRNGKey(0), cfg)
        state = init_train_state(jax.tree.map(jnp.array, params), tc)
        step = build_train_step(cfg, tc)
        losses = []
        for b in batches:
            state, m = step(state, b)
            losses.append(float(m["loss"]))
        return losses

    np.testing.assert_allclose(run2(True), run2(False), rtol=1e-4)
