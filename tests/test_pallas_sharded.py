"""Multi-chip Pallas attention: the shard_map wrapper must reproduce the
single-device kernels exactly (GSPMD cannot partition pallas_call, so the
window axis is sharded manually — `window_attention_pallas_sharded`).

Runs on the 8-virtual-CPU-device mesh in TPU interpret mode.  The
single-device baselines are computed BEFORE the mesh is made ambient:
`jax.set_mesh` changes how the internally-jitted kernels are partitioned,
and interpret-mode pallas (io_callback-based) cannot run under plain GSPMD
— which is exactly why the shard_map wrapper exists."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from tests import conftest as C  # noqa: F401
from vit_grid_model_tpu.ops.attention import attention_init
from vit_grid_model_tpu.ops.window import relative_position_indices


def _inputs():
    p = attention_init(jax.random.PRNGKey(0), 32, cond_dim=2, heads=4,
                       dim_head=8, window_size=7, num_registers=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (12, 53, 32))
    cond = jax.random.normal(jax.random.PRNGKey(2), (4, 2))
    bias_idx = relative_position_indices(7, 4)
    return p, x, cond, bias_idx


def test_sharded_matches_single_device_fwd_and_grad():
    from jax.experimental.pallas import tpu as pltpu

    from vit_grid_model_tpu.ops.pallas.attention import (
        window_attention_pallas_fused, window_attention_pallas_sharded)

    p, x, cond, bias_idx = _inputs()

    def loss_single(pp, xx):
        return jnp.sum(window_attention_pallas_fused(
            pp, xx, cond, bias_idx, None, None, 4, 3, 8, 0.0) ** 2)

    with pltpu.force_tpu_interpret_mode():
        y1 = np.asarray(window_attention_pallas_fused(
            p, x, cond, bias_idx, None, None, 4, 3, 8, 0.0))
        g1 = jax.tree.map(np.asarray, jax.jit(
            jax.grad(loss_single, argnums=(0, 1)))(p, x))

    mesh = jax.make_mesh((4,), ("data",))
    with jax.set_mesh(mesh):
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        conds = jax.device_put(cond, NamedSharding(mesh, P("data")))

        def loss_sharded(pp, xx):
            return jnp.sum(window_attention_pallas_sharded(
                pp, xx, conds, bias_idx, None, None, 4, 3, 8, 0.0,
                "data") ** 2)

        with pltpu.force_tpu_interpret_mode():
            y2 = jax.jit(lambda pp, xx: window_attention_pallas_sharded(
                pp, xx, conds, bias_idx, None, None, 4, 3, 8, 0.0,
                "data"))(p, xs)
            np.testing.assert_allclose(np.asarray(y2), y1, rtol=2e-5,
                                       atol=1e-6)
            g2 = jax.jit(jax.grad(loss_sharded, argnums=(0, 1)))(p, xs)
        # replicated-param grads are psum'd by the shard_map transpose;
        # only f32 reduction-order noise is allowed (global-scale metric:
        # per-element rtol trips on near-cancelling sums)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            b = np.asarray(b)
            rel = np.abs(b - a).max() / (np.abs(a).max() + 1e-9)
            assert rel < 1e-5, rel


def test_sharded_in_kernel_dropout_decorrelated():
    """Per-shard seed folding: shard 0 (raw seed) matches the unsharded
    run; later shards (folded seeds) must differ — otherwise every chip
    would sample the SAME keep-mask, correlating dropout across the
    data-parallel batch."""
    from jax.experimental.pallas import tpu as pltpu

    from vit_grid_model_tpu.ops.pallas.attention import (
        window_attention_pallas_fused, window_attention_pallas_sharded)

    p, x, cond, bias_idx = _inputs()
    seed = jnp.asarray([7], jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        y_un = np.asarray(window_attention_pallas_fused(
            p, x, cond, bias_idx, None, seed, 4, 3, 8, 0.25))

    mesh = jax.make_mesh((4,), ("data",))
    with jax.set_mesh(mesh):
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        conds = jax.device_put(cond, NamedSharding(mesh, P("data")))
        with pltpu.force_tpu_interpret_mode():
            y_sh = jax.jit(lambda pp, xx: window_attention_pallas_sharded(
                pp, xx, conds, bias_idx, None, seed, 4, 3, 8, 0.25,
                "data"))(p, xs)
    y_sh = np.asarray(y_sh)
    assert np.isfinite(y_sh).all()
    n_local = x.shape[0] // 4
    np.testing.assert_allclose(y_sh[:n_local], y_un[:n_local], rtol=2e-5,
                               atol=1e-6)
    assert np.abs(y_sh[n_local:] - y_un[n_local:]).max() > 1e-3


def test_full_train_step_sharded_matches_single_device():
    """One Focal-R train step of the full model with the shard_mapped
    Pallas kernels (fwd + fused bwd) on a 4-device data mesh equals the
    single-device step (dropout 0 => deterministic).  Tiny 28x28 spatial
    grid keeps interpret mode fast; the window geometry (2x2 block windows
    of 53 tokens, 49 grid windows of 8 tokens) still exercises both
    attention shapes."""
    from jax.experimental.pallas import tpu as pltpu

    from vit_grid_model_tpu.core.config import (MeshConfig, MetNet3Config,
                                                TrainConfig)
    from vit_grid_model_tpu.models.metnet3 import metnet3_init
    from vit_grid_model_tpu.parallel import mesh as meshlib
    from vit_grid_model_tpu.train.trainer import (build_train_step,
                                                  init_train_state)

    base = dict(window_size=3, n_variables=24, n_start_channels=16,
                end_lead_time=2, pm25_mean=22.5, pm25_std=15.5,
                n_heads=4, dim_head=4, dropout=0.0,
                use_pallas_attention=True, use_pallas_attention_bwd=True)
    tc = TrainConfig(learning_rate=1e-3, total_steps=2, warmup_steps=1,
                     batch_size=4)
    rng = np.random.default_rng(0)
    batch = {
        "x": rng.random((4, 3, 24, 28, 28), dtype=np.float32) * 50,
        "timestamps": np.tile(np.asarray([2023., 1., 15., 6.], np.float32),
                              (4, 5, 1)),
        "targets": rng.random((4, 2, 28, 28), dtype=np.float32) * 60,
    }
    params = metnet3_init(jax.random.PRNGKey(0), MetNet3Config(**base))

    state0 = init_train_state(jax.tree.map(jnp.array, params), tc)
    step0 = build_train_step(MetNet3Config(**base), tc)
    with pltpu.force_tpu_interpret_mode():
        s1, m1 = step0(state0, batch)
    loss1 = float(m1["loss"])
    p1 = jax.tree.map(np.asarray, s1.params)

    mesh = meshlib.make_mesh(MeshConfig(data=4, model=1),
                             devices=jax.devices()[:4])
    with jax.set_mesh(mesh):
        cfg = MetNet3Config(**base, pallas_shard_axis="data")
        state = init_train_state(jax.tree.map(jnp.array, params), tc)
        state = jax.device_put(state, meshlib.replicated(mesh))
        sb = meshlib.shard_batch(mesh, batch)
        step = build_train_step(cfg, tc)
        with pltpu.force_tpu_interpret_mode():
            s2, m2 = step(state, sb)
        loss2 = float(m2["loss"])
        assert abs(loss1 - loss2) / abs(loss1) < 1e-5, (loss1, loss2)
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(s2.params)):
            b = np.asarray(b, np.float32)
            a = np.asarray(a, np.float32)
            rel = np.abs(b - a).max() / (np.abs(a).max() + 1e-9)
            assert rel < 1e-4, rel


def test_sharded_forward_only_kernel_matches_single_device():
    """The eval configuration shard_maps the forward-only kernel
    (fused=False, XLA-recompute VJP) — the path `evaluation_vit --fast
    --data_parallel N` takes."""
    from jax.experimental.pallas import tpu as pltpu

    from vit_grid_model_tpu.ops.pallas.attention import (
        window_attention_pallas, window_attention_pallas_sharded)

    p, x, cond, bias_idx = _inputs()
    with pltpu.force_tpu_interpret_mode():
        y1 = np.asarray(window_attention_pallas(
            p, x, cond, bias_idx, None, 4, 3))

    mesh = jax.make_mesh((4,), ("data",))
    with jax.set_mesh(mesh):
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        conds = jax.device_put(cond, NamedSharding(mesh, P("data")))
        with pltpu.force_tpu_interpret_mode():
            y2 = jax.jit(lambda pp, xx: window_attention_pallas_sharded(
                pp, xx, conds, bias_idx, None, None, 4, 3, 8, 0.0, "data",
                fused=False))(p, xs)
    np.testing.assert_allclose(np.asarray(y2), y1, rtol=2e-5, atol=1e-6)
