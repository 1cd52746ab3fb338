"""Forward/step decomposition + serving latency on one TPU chip.

Three numbers that frame the training-step economics (docs/RESULTS.md):

* eval-mode forward at the train geometry — the irreducible forward;
* training-mode forward (+ in-kernel dropout sampling + BN-stat
  collection) — the delta is the cost of training-mode extras;
* B=1 serving latency at the shipped 12hr config (fast mode) — the
  latency floor for one full 12-lead forecast.

(The full train step is measured by benchmarks/train_step.py; together:
fwd 54.5 -> train-fwd 62.4 -> step 91.1 ms at B=4, i.e. the fused Pallas
backward + AdamW add only ~29 ms.)

Axon-rig hazards handled per docs/RESULTS.md (warmup discard, scalar
host readback to close each timing window).

Usage:  PYTHONPATH=. python benchmarks/forward_profile.py
"""
from __future__ import annotations

import dataclasses
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from vit_grid_model_tpu.core.config import (MetNet3Config,
                                            shipped_12hr_model_config)
from vit_grid_model_tpu.models.metnet3 import metnet3_apply, metnet3_init


def timeit(fn, iters=20, warm=6):
    for _ in range(warm):
        r = fn()
    _ = float(jnp.sum(r.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
        _ = float(jnp.sum(r.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    out = {"metric": "forward_profile_ms"}

    # train geometry (13 -> 12, hidden 128), --fast kernels, B=4
    cfg = MetNet3Config(
        window_size=13, n_variables=24, n_start_channels=128,
        end_lead_time=12, pm25_mean=22.5, pm25_std=15.5, dropout=0.1,
        compute_dtype="bfloat16", fuse_lead_stem=True,
        use_pallas_attention=True, use_pallas_attention_bwd=True)
    params = metnet3_init(jax.random.PRNGKey(0), cfg)
    x = jax.device_put(rng.random((4, 13, 24, 82, 67),
                                  dtype=np.float32) * 50)
    ts = jax.device_put(np.tile(np.asarray([2023., 1., 15., 6.],
                                           np.float32), (4, 25, 1)))
    _ = float(x.sum())
    efwd = jax.jit(lambda p, a, b: metnet3_apply(p, a, b, cfg))
    out["eval_fwd_b4_train_geom"] = round(
        timeit(lambda: efwd(params, x, ts)), 2)

    key = jax.random.PRNGKey(1)

    @jax.jit
    def tfwd(p, a, b):
        preds = metnet3_apply(p, a, b, cfg, training=True, rng=key)
        if isinstance(preds, tuple):
            preds = preds[0]
        return preds

    out["train_fwd_b4"] = round(timeit(lambda: tfwd(params, x, ts)), 2)

    # serving latency: shipped 12hr config, fast mode, B=1
    scfg = dataclasses.replace(
        shipped_12hr_model_config(pm25_mean=22.5, pm25_std=12.3),
        compute_dtype="bfloat16", fuse_lead_stem=True,
        use_pallas_attention=True)
    sp = metnet3_init(jax.random.PRNGKey(0), scfg)
    x1 = jax.device_put(rng.random((1, 25, 24, 82, 67),
                                   dtype=np.float32) * 50)
    ts1 = jax.device_put(np.tile(np.asarray([2023., 1., 15., 6.],
                                            np.float32), (1, 25, 1)))
    _ = float(x1.sum())
    sfwd = jax.jit(lambda p, a, b: metnet3_apply(p, a, b, scfg))
    out["serving_b1_12leads"] = round(timeit(lambda: sfwd(sp, x1, ts1)), 2)

    # the Forecaster path: params pre-cast on device (no in-trace tree
    # cast), donated input buffer
    sp_bf16 = jax.device_put(jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, sp))
    dfwd = jax.jit(lambda p, a, b: metnet3_apply(p, a, b, scfg),
                   donate_argnums=(1,))
    x1h = np.asarray(rng.random((1, 25, 24, 82, 67),
                                dtype=np.float32) * 50, dtype=jnp.bfloat16)

    def serve_once():
        xd = jax.device_put(x1h)         # fresh buffer (donated each call)
        return dfwd(sp_bf16, xd, ts1)

    out["serving_b1_precast_donated"] = round(timeit(serve_once), 2)

    # ---- chip-honest B=1 latency: chain N forwards on device per host
    # sync.  The per-call numbers above include this rig's ~30ms tunnel
    # round-trip in EVERY iteration (timeit closes each window with a host
    # readback); chaining amortizes it away and measures the chip.  The
    # input is perturbed per iteration or XLA CSE-hoists the body
    # (docs/RESULTS.md hazard).  On real PCIe hardware the per-call and
    # chained numbers converge.
    N = 50

    @jax.jit
    def chain(p, a, b):
        def body(i, acc):
            o = metnet3_apply(p, a + i.astype(a.dtype) * 1e-3, b, scfg)
            return acc + o.mean()
        return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))

    x1d = jax.device_put(np.asarray(x1h))
    float(chain(sp_bf16, x1d, ts1))
    for _ in range(5):
        float(chain(sp_bf16, x1d, ts1))
    t0 = time.perf_counter()
    for _ in range(3):
        float(chain(sp_bf16, x1d, ts1))
    out["serving_b1_onchip_chained"] = round(
        (time.perf_counter() - t0) / (3 * N) * 1e3, 2)

    # ---- B=1 stage breakdown (round-2 verdict item 6) ----
    # partial pipelines through the model's own stage functions; successive
    # differences isolate each stage.  Chip-resident timing via timeit's
    # host readback per iteration.
    from vit_grid_model_tpu.models.metnet3 import (_condition_time,
                                                   _fused_lead_stem,
                                                   _vit_spec,
                                                   standardize_pm_channels)
    from vit_grid_model_tpu.models.maxvit import maxvit_apply
    from vit_grid_model_tpu.models.metnet3 import pad_hw, unpad_hw
    from vit_grid_model_tpu.ops import nn as vnn
    from vit_grid_model_tpu.models.metnet3 import resnet_blocks_apply

    def through(stage):
        cfgl = scfg

        def fn(p, xx, tt):
            B, T, C, H, Wd = xx.shape
            L = cfgl.end_lead_time
            p = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, p)
            xx = standardize_pm_channels(xx, cfgl)
            lead_times = jnp.tile(jnp.arange(1, L + 1), B)
            cond = vnn.embedding(p["condition_lead_time"], lead_times)
            xx = xx.reshape(B, T * C, H, Wd).transpose(0, 2, 3, 1)
            xx, pv = pad_hw(xx, cfgl.pad_multiple)
            ts6 = jnp.repeat(tt[:, 6, :], L, axis=0)
            ts6 = jnp.concatenate(
                [ts6, lead_times[:, None].astype(ts6.dtype)], axis=-1)
            tf = _condition_time(p, cfgl, ts6, B * L)
            xx = xx.astype(jnp.bfloat16)
            cond = cond.astype(jnp.bfloat16)
            o = _fused_lead_stem(p, cfgl, xx, tf.astype(xx.dtype), cond,
                                 B, L)
            o = vnn.max_pool_2x(o)
            if stage == "stem":
                return o
            o = maxvit_apply(p["vit"], o, cond, _vit_spec(cfgl))
            if stage == "vit":
                return o
            o = vnn.conv2d_transpose(p["up"], o, stride=2)
            o = resnet_blocks_apply(p["resnet2"], o, cond)
            o = unpad_hw(o, pv)
            if stage == "resnet2":
                return o
            preds = vnn.conv2d(p["classifier_pm25"], o, padding="VALID")
            preds = preds[..., 0].reshape(B, L, H, Wd).astype(jnp.float32)
            return preds * cfgl.pm25_std + cfgl.pm25_mean

        return jax.jit(fn)

    x1b = jax.device_put(np.asarray(
        rng.random((1, 25, 24, 82, 67), dtype=np.float32) * 50))
    _ = float(x1b.sum())
    stage_ms = {}
    for stage in ("stem", "vit", "resnet2", "full"):
        f = through(stage)
        stage_ms[stage] = timeit(lambda: f(sp, x1b, ts1))
    # NOTE: every stage_ms includes one ~30ms tunnel RTT (host readback per
    # iteration); successive DIFFERENCES are clean, but the absolute "stem"
    # number carries the RTT constant.  The honest per-stage split is
    # obtained by scaling the differences to serving_b1_onchip_chained.
    out["b1_stage_stem"] = round(stage_ms["stem"], 2)
    out["b1_stage_vit"] = round(stage_ms["vit"] - stage_ms["stem"], 2)
    out["b1_stage_resnet2_up"] = round(
        stage_ms["resnet2"] - stage_ms["vit"], 2)
    out["b1_stage_heads"] = round(stage_ms["full"] - stage_ms["resnet2"], 2)
    out["b1_stage_total"] = round(stage_ms["full"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
