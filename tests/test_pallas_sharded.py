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
