"""The fused Pallas window-attention kernel must match the XLA reference
implementation (interpret mode on CPU; compiled on TPU via the bench)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests import conftest as C  # noqa: F401
from vit_grid_model_tpu.ops.attention import attention, attention_init
from vit_grid_model_tpu.ops.window import relative_position_indices


def _run_pallas_interpret(p, x, cond, bias_idx, heads, wps):
    from jax.experimental.pallas import tpu as pltpu

    from vit_grid_model_tpu.ops.pallas.attention import window_attention_pallas

    with pltpu.force_tpu_interpret_mode():
        return window_attention_pallas(p, x, cond, bias_idx, None, heads,
                                       wps)


@pytest.mark.parametrize("n,heads,dim_head,dim", [
    (53, 4, 8, 32),          # eval token geometry, small heads
    (53, 32, 32, 128),       # shipped 12hr geometry
])
def test_pallas_matches_xla(n, heads, dim_head, dim):
    key = jax.random.PRNGKey(0)
    p = attention_init(key, dim, cond_dim=2, heads=heads, dim_head=dim_head,
                       window_size=7, num_registers=4)
    bw, wps = 12, 6
    x = jax.random.normal(jax.random.PRNGKey(1), (bw, n, dim))
    cond = jax.random.normal(jax.random.PRNGKey(2), (bw // wps, 2))
    bias_idx = relative_position_indices(7, 4)

    ref = attention(p, x, cond, bias_idx, heads=heads,
                    windows_per_sample=wps)
    ours = _run_pallas_interpret(p, x, cond, bias_idx, heads, wps)
    rel = np.abs(np.asarray(ours) - np.asarray(ref)).max() / (
        np.abs(np.asarray(ref)).max() + 1e-9)
    assert rel < 2e-5, rel


def test_pallas_gradients_match_xla():
    """custom_vjp: grads of the Pallas path equal grads of the XLA path."""
    import jax
    from jax.experimental.pallas import tpu as pltpu

    from vit_grid_model_tpu.ops.pallas.attention import window_attention_pallas

    key = jax.random.PRNGKey(0)
    p = attention_init(key, 32, cond_dim=2, heads=4, dim_head=8,
                       window_size=7, num_registers=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 53, 32))
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, 2))
    bias_idx = relative_position_indices(7, 4)

    def loss_xla(pp, xx):
        return jnp.sum(attention(pp, xx, cond, bias_idx, heads=4,
                                 windows_per_sample=3) ** 2)

    def loss_pl(pp, xx):
        return jnp.sum(window_attention_pallas(pp, xx, cond, bias_idx,
                                               None, 4, 3) ** 2)

    g_ref = jax.grad(loss_xla, argnums=(0, 1))(p, x)
    with pltpu.force_tpu_interpret_mode():
        g_pl = jax.grad(loss_pl, argnums=(0, 1))(p, x)
    for a, b in zip(jax.tree.leaves(g_pl), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def test_pallas_gradients_match_xla_bf16():
    """Gradient parity in the throughput dtype: bf16 activations through the
    Pallas forward must backprop (XLA-recompute VJP) to the same grads as
    the pure-XLA bf16 path."""
    from jax.experimental.pallas import tpu as pltpu

    from vit_grid_model_tpu.ops.pallas.attention import window_attention_pallas

    key = jax.random.PRNGKey(0)
    p = attention_init(key, 32, cond_dim=2, heads=4, dim_head=8,
                       window_size=7, num_registers=4)
    # bf16 mode casts params AND activations (as the model does), so both
    # paths produce bf16 outputs and the VJP signatures line up
    p = jax.tree.map(lambda t: t.astype(jnp.bfloat16)
                     if t.dtype == jnp.float32 else t, p)
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 53, 32)
                          ).astype(jnp.bfloat16)
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, 2)
                             ).astype(jnp.bfloat16)
    bias_idx = relative_position_indices(7, 4)

    # compare VJPs under the SAME cotangent: this isolates the custom_vjp
    # wiring (residuals, dtypes, shapes) from forward bf16 rounding, which
    # the forward-equivalence tests already bound
    g = jax.random.normal(jax.random.PRNGKey(3), (6, 53, 32)
                          ).astype(jnp.bfloat16)

    _, vjp_ref = jax.vjp(
        lambda pp, xx: attention(pp, xx, cond, bias_idx, heads=4,
                                 windows_per_sample=3), p, x)
    g_ref = vjp_ref(g)
    with pltpu.force_tpu_interpret_mode():
        _, vjp_pl = jax.vjp(
            lambda pp, xx: window_attention_pallas(pp, xx, cond, bias_idx,
                                                   None, 4, 3), p, x)
        g_pl = vjp_pl(g)
    for a, b in zip(jax.tree.leaves(g_pl), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-5, atol=1e-6)


def test_short_train_pallas_matches_xla_loss_curve():
    """Train 3 steps of the full model with use_pallas_attention=True
    (dropout=0 so the kernel is active in training) and assert the loss
    curve matches the XLA-attention run."""
    from jax.experimental.pallas import tpu as pltpu

    from vit_grid_model_tpu.core.config import MetNet3Config, TrainConfig
    from vit_grid_model_tpu.models.metnet3 import metnet3_init
    from vit_grid_model_tpu.train.trainer import (build_train_step,
                                                  init_train_state)

    base = dict(window_size=3, n_variables=24, n_start_channels=16,
                end_lead_time=2, pm25_mean=22.5, pm25_std=15.5,
                n_heads=4, dim_head=4, dropout=0.0)
    tc = TrainConfig(learning_rate=1e-3, total_steps=4, warmup_steps=1,
                     batch_size=1)
    rng = np.random.default_rng(0)
    batches = [{
        "x": rng.random((1, 3, 24, 82, 67), dtype=np.float32) * 50,
        "timestamps": np.tile(np.asarray([2023., 1., 15., 6.], np.float32),
                              (1, 7, 1)),
        "targets": rng.random((1, 2, 82, 67), dtype=np.float32) * 60,
    } for _ in range(3)]

    def run(use_pallas):
        cfg = MetNet3Config(**base, use_pallas_attention=use_pallas)
        params = metnet3_init(jax.random.PRNGKey(0), cfg)
        state = init_train_state(jax.tree.map(jnp.array, params), tc)
        step = build_train_step(cfg, tc)
        losses = []
        for b in batches:
            state, m = step(state, b)
            losses.append(float(m["loss"]))
        return losses

    ref = run(False)
    with pltpu.force_tpu_interpret_mode():
        got = run(True)
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_pallas_dropout_mask_matches_xla():
    """Attention dropout in the kernel: an externally-sampled pre-scaled
    keep mask gives the same forward AND gradients as the masked XLA path
    (the mask is shared, so the XLA-recompute backward is consistent)."""
    from jax.experimental.pallas import tpu as pltpu

    from vit_grid_model_tpu.ops.pallas.attention import window_attention_pallas

    key = jax.random.PRNGKey(0)
    p = attention_init(key, 32, cond_dim=2, heads=4, dim_head=8,
                       window_size=7, num_registers=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 53, 32))
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, 2))
    bias_idx = relative_position_indices(7, 4)
    rate = 0.25
    keep = jax.random.bernoulli(jax.random.PRNGKey(3), 1 - rate,
                                (6, 4, 53, 53))
    dmask = keep.astype(jnp.float32) / (1 - rate)

    ref = attention(p, x, cond, bias_idx, heads=4, windows_per_sample=3,
                    dropout_mask=dmask)
    with pltpu.force_tpu_interpret_mode():
        ours = window_attention_pallas(p, x, cond, bias_idx, dmask, 4, 3)
    rel = np.abs(np.asarray(ours) - np.asarray(ref)).max() / (
        np.abs(np.asarray(ref)).max() + 1e-9)
    assert rel < 2e-5, rel

    def loss_xla(pp, xx):
        return jnp.sum(attention(pp, xx, cond, bias_idx, heads=4,
                                 windows_per_sample=3,
                                 dropout_mask=dmask) ** 2)

    def loss_pl(pp, xx):
        return jnp.sum(window_attention_pallas(pp, xx, cond, bias_idx,
                                               dmask, 4, 3) ** 2)

    g_ref = jax.grad(loss_xla, argnums=(0, 1))(p, x)
    with pltpu.force_tpu_interpret_mode():
        g_pl = jax.grad(loss_pl, argnums=(0, 1))(p, x)
    for a, b in zip(jax.tree.leaves(g_pl), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


@pytest.mark.parametrize("fused_bwd", [False, True])
def test_train_step_pallas_with_dropout_runs(fused_bwd):
    """With dropout > 0 the training path keeps the Pallas kernel: one step
    runs and produces a finite loss.  fused_bwd=False samples the mask
    outside (XLA-recompute VJP); fused_bwd=True samples it in-kernel with
    the counter-based hash PRNG — exercised here through the FULL model,
    i.e. at both the block-attention (53-token) and grid-attention
    (34-token) window geometries."""
    from jax.experimental.pallas import tpu as pltpu

    from vit_grid_model_tpu.core.config import MetNet3Config, TrainConfig
    from vit_grid_model_tpu.models.metnet3 import metnet3_init
    from vit_grid_model_tpu.train.trainer import (build_train_step,
                                                  init_train_state)

    cfg = MetNet3Config(window_size=3, n_variables=24, n_start_channels=16,
                        end_lead_time=2, pm25_mean=22.5, pm25_std=15.5,
                        n_heads=4, dim_head=4, dropout=0.1,
                        use_pallas_attention=True,
                        use_pallas_attention_bwd=fused_bwd)
    tc = TrainConfig(learning_rate=1e-3, total_steps=2, warmup_steps=1,
                     batch_size=1)
    rng = np.random.default_rng(0)
    batch = {
        "x": rng.random((1, 3, 24, 82, 67), dtype=np.float32) * 50,
        "timestamps": np.tile(np.asarray([2023., 1., 15., 6.], np.float32),
                              (1, 7, 1)),
        "targets": rng.random((1, 2, 82, 67), dtype=np.float32) * 60,
    }
    params = metnet3_init(jax.random.PRNGKey(0), cfg)
    state = init_train_state(params, tc)
    step = build_train_step(cfg, tc)
    with pltpu.force_tpu_interpret_mode():
        state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 1


def _fused_grad_compare(p, x, cond, dmask, heads, wps, rtol, atol=1e-5):
    from jax.experimental.pallas import tpu as pltpu

    from vit_grid_model_tpu.ops.pallas.attention import (
        window_attention_pallas_fused)

    bias_idx = relative_position_indices(7, 4)

    def loss_xla(pp, xx):
        return jnp.sum(attention(pp, xx, cond, bias_idx, heads=heads,
                                 windows_per_sample=wps,
                                 dropout_mask=dmask) ** 2)

    def loss_pl(pp, xx):
        return jnp.sum(window_attention_pallas_fused(
            pp, xx, cond, bias_idx, dmask, None, heads, wps, 8, 0.0) ** 2)

    g_ref = jax.grad(loss_xla, argnums=(0, 1))(p, x)
    with pltpu.force_tpu_interpret_mode():
        g_pl = jax.grad(loss_pl, argnums=(0, 1))(p, x)
    for a, b in zip(jax.tree.leaves(g_pl), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=rtol, atol=atol)


def test_pallas_fused_bwd_gradients_match_xla():
    """The fused Pallas BACKWARD kernel (flash-style in-VMEM recompute)
    produces the same grads as the XLA path — every param leaf, x and
    cond."""
    p = attention_init(jax.random.PRNGKey(0), 32, cond_dim=2, heads=4,
                       dim_head=8, window_size=7, num_registers=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 53, 32))
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, 2))
    _fused_grad_compare(p, x, cond, None, 4, 3, rtol=5e-4)


def test_pallas_fused_bwd_dropout_mask():
    """Fused backward with an externally-sampled attention-dropout mask."""
    p = attention_init(jax.random.PRNGKey(0), 32, cond_dim=2, heads=4,
                       dim_head=8, window_size=7, num_registers=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 53, 32))
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, 2))
    keep = jax.random.bernoulli(jax.random.PRNGKey(3), 0.75, (6, 4, 53, 53))
    dmask = keep.astype(jnp.float32) / 0.75
    _fused_grad_compare(p, x, cond, dmask, 4, 3, rtol=5e-4)


def test_pallas_fused_bwd_unconditioned_affine():
    """Fused backward routes LN-affine grads correctly when there is no
    FiLM conditioning (g/b ride the FiLM slot in the kernel)."""
    p = attention_init(jax.random.PRNGKey(0), 32, cond_dim=None, heads=4,
                       dim_head=8, window_size=7, num_registers=4)
    p["norm"]["g"] = p["norm"]["g"] * 1.7 + 0.1
    p["norm"]["b"] = p["norm"]["b"] + 0.3
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 53, 32))
    _fused_grad_compare(p, x, None, None, 4, 3, rtol=5e-4)


def test_pallas_fused_bwd_bf16_close():
    """bf16 fused-backward grads land within bf16 rounding of the XLA bf16
    path (both paths round at different points, so the bound is ~bf16 eps,
    not the f32 5e-4)."""
    from jax.experimental.pallas import tpu as pltpu

    from vit_grid_model_tpu.ops.pallas.attention import (
        window_attention_pallas_fused)

    p = attention_init(jax.random.PRNGKey(0), 32, cond_dim=2, heads=4,
                       dim_head=8, window_size=7, num_registers=4)
    p = jax.tree.map(lambda t: t.astype(jnp.bfloat16)
                     if t.dtype == jnp.float32 else t, p)
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 53, 32)
                          ).astype(jnp.bfloat16)
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, 2)
                             ).astype(jnp.bfloat16)
    bias_idx = relative_position_indices(7, 4)

    def loss_xla(pp, xx):
        return jnp.sum(attention(pp, xx, cond, bias_idx, heads=4,
                                 windows_per_sample=3
                                 ).astype(jnp.float32) ** 2)

    def loss_pl(pp, xx):
        return jnp.sum(window_attention_pallas_fused(
            pp, xx, cond, bias_idx, None, None, 4, 3, 8, 0.0
            ).astype(jnp.float32) ** 2)

    g_ref = jax.grad(loss_xla, argnums=(0, 1))(p, x)
    with pltpu.force_tpu_interpret_mode():
        g_pl = jax.grad(loss_pl, argnums=(0, 1))(p, x)
    for a, b in zip(jax.tree.leaves(g_pl), jax.tree.leaves(g_ref)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = np.abs(b).max() + 1e-9
        assert np.abs(a - b).max() / denom < 6e-2


def test_pallas_in_kernel_dropout_matches_xla_with_extracted_mask():
    """Hardware-PRNG dropout: the forward kernel's output equals the XLA
    path applied with the mask the kernel actually sampled (extracted via
    the emit_mask test hook), and the fused backward — which REGENERATES
    the mask from the same seed — produces the XLA grads for that mask."""
    from jax.experimental.pallas import tpu as pltpu

    from vit_grid_model_tpu.ops.pallas.attention import (
        _window_attention_fwd_impl, window_attention_pallas_fused)

    p = attention_init(jax.random.PRNGKey(0), 32, cond_dim=2, heads=4,
                       dim_head=8, window_size=7, num_registers=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 53, 32))
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, 2))
    bias_idx = relative_position_indices(7, 4)
    seed = jnp.asarray([1234], jnp.int32)
    rate = 0.25

    with pltpu.force_tpu_interpret_mode():
        out_k, mask = _window_attention_fwd_impl(
            p, x, cond, bias_idx, None, 4, 3, 8, seed, rate, True)
    # sampled keep-mask is pre-scaled {0, 1/(1-rate)} with ~rate zeros
    m = np.asarray(mask)
    assert np.all((m == 0.0) | np.isclose(m, 1.0 / (1.0 - rate), rtol=1e-6))
    frac_dropped = float((np.asarray(mask) == 0).mean())
    assert abs(frac_dropped - rate) < 0.02
    # hash decorrelation: every head and every window draws a distinct
    # mask (the index mix covers (window, head, row, col)), and the drop
    # fraction holds per head, not just globally
    for h in range(mask.shape[1]):
        assert abs(float((m[:, h] == 0).mean()) - rate) < 0.05, h
    assert not np.array_equal(m[:, 0], m[:, 1])
    assert not np.array_equal(m[0], m[1])

    ref = attention(p, x, cond, bias_idx, heads=4, windows_per_sample=3,
                    dropout_mask=mask)
    rel = np.abs(np.asarray(out_k) - np.asarray(ref)).max() / (
        np.abs(np.asarray(ref)).max() + 1e-9)
    assert rel < 2e-5, rel

    def loss_xla(pp, xx):
        return jnp.sum(attention(pp, xx, cond, bias_idx, heads=4,
                                 windows_per_sample=3,
                                 dropout_mask=mask) ** 2)

    def loss_pl(pp, xx):
        return jnp.sum(window_attention_pallas_fused(
            pp, xx, cond, bias_idx, None, seed, 4, 3, 8, rate) ** 2)

    g_ref = jax.grad(loss_xla, argnums=(0, 1))(p, x)
    with pltpu.force_tpu_interpret_mode():
        g_pl = jax.grad(loss_pl, argnums=(0, 1))(p, x)
    for a, b in zip(jax.tree.leaves(g_pl), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def test_short_train_fused_bwd_matches_xla_loss_curve():
    """3 train steps of the full model with the fused Pallas backward match
    the XLA-attention loss curve."""
    from jax.experimental.pallas import tpu as pltpu

    from vit_grid_model_tpu.core.config import MetNet3Config, TrainConfig
    from vit_grid_model_tpu.models.metnet3 import metnet3_init
    from vit_grid_model_tpu.train.trainer import (build_train_step,
                                                  init_train_state)

    base = dict(window_size=3, n_variables=24, n_start_channels=16,
                end_lead_time=2, pm25_mean=22.5, pm25_std=15.5,
                n_heads=4, dim_head=4, dropout=0.0)
    tc = TrainConfig(learning_rate=1e-3, total_steps=4, warmup_steps=1,
                     batch_size=1)
    rng = np.random.default_rng(0)
    batches = [{
        "x": rng.random((1, 3, 24, 82, 67), dtype=np.float32) * 50,
        "timestamps": np.tile(np.asarray([2023., 1., 15., 6.], np.float32),
                              (1, 7, 1)),
        "targets": rng.random((1, 2, 82, 67), dtype=np.float32) * 60,
    } for _ in range(3)]

    def run(use_pallas, use_bwd):
        cfg = MetNet3Config(**base, use_pallas_attention=use_pallas,
                            use_pallas_attention_bwd=use_bwd)
        params = metnet3_init(jax.random.PRNGKey(0), cfg)
        state = init_train_state(jax.tree.map(jnp.array, params), tc)
        step = build_train_step(cfg, tc)
        losses = []
        for b in batches:
            state, m = step(state, b)
            losses.append(float(m["loss"]))
        return losses

    ref = run(False, False)
    with pltpu.force_tpu_interpret_mode():
        got = run(True, True)
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_pallas_unconditioned_ln_affine():
    """Without FiLM, the LN affine params must still apply (review fix)."""
    key = jax.random.PRNGKey(0)
    p = attention_init(key, 32, cond_dim=None, heads=4, dim_head=8,
                       window_size=7, num_registers=4)
    p["norm"]["g"] = p["norm"]["g"] * 1.7 + 0.1
    p["norm"]["b"] = p["norm"]["b"] + 0.3
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 53, 32))
    bias_idx = relative_position_indices(7, 4)
    ref = attention(p, x, None, bias_idx, heads=4, windows_per_sample=3)
    ours = _run_pallas_interpret(p, x, None, bias_idx, 4, 3)
    rel = np.abs(np.asarray(ours) - np.asarray(ref)).max() / (
        np.abs(np.asarray(ref)).max() + 1e-9)
    assert rel < 2e-5, rel


def test_dropout_mask_and_seed_mutually_exclusive():
    """Passing both an external dropout_mask and an in-kernel (seed, rate)
    pair must raise — the seed branch would silently win (round-2 advisor
    finding)."""
    import jax.numpy as jnp

    from vit_grid_model_tpu.ops.pallas.attention import (
        _window_attention_bwd_impl, _window_attention_fwd_impl)

    key = jax.random.PRNGKey(0)
    p = attention_init(key, 32, cond_dim=None, heads=4, dim_head=8,
                       window_size=7, num_registers=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 53, 32))
    bias_idx = relative_position_indices(7, 4)
    mask = jnp.ones((2, 4, 53, 53))
    seed = jnp.zeros((1,), jnp.int32)
    with pytest.raises(ValueError, match="not both"):
        _window_attention_fwd_impl(p, x, None, bias_idx, mask, 4, 1, 8,
                                   seed, 0.1, False)
    with pytest.raises(ValueError, match="not both"):
        _window_attention_bwd_impl(p, x, None, bias_idx, mask,
                                   jnp.zeros_like(x), 4, 1, 8, seed, 0.1)
