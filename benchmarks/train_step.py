"""Flagship train-step benchmark: XLA vs Pallas-forward vs Pallas fused-bwd.

Measures the steady-state training step (hidden 128, 13 -> 12 leads, bf16,
dropout 0.1 — the shipped 12hr architecture with the reconstructed Focal-R
trainer, SURVEY.md §3.5) under the three attention configurations.  Axon-rig
hazards handled per docs/RESULTS.md: the batch is staged on device first,
the first ~6 post-compile executions are discarded (lazy-upload warmup), and
the timing window is closed by a host readback of the loss (data-dependent
on every step, so no per-step sync is needed).

Usage:  PYTHONPATH=. python benchmarks/train_step.py [--batch 4] [--steps 20]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from vit_grid_model_tpu.core.config import MetNet3Config, TrainConfig
from vit_grid_model_tpu.models.metnet3 import metnet3_init
from vit_grid_model_tpu.train.trainer import build_train_step, init_train_state

MODES = ("xla", "pallas_fwd", "pallas_fused_bwd", "fast", "fast_nhwc")

# TPU v5e bf16 peak (bench.py's constant)
V5E_PEAK_BF16_TFLOPS = 197.0


def train_step_flops(batch_size: int) -> float:
    """HLO flop count of one full train step (fwd + bwd + AdamW), lowered on
    the CPU backend with abstract shapes — the same currency bench.py uses
    for inference MFU (the axon backend exposes no cost model).  Pallas off:
    the kernels hide their flops behind a custom call; the XLA lowering of
    the identical math is the honest count."""
    import dataclasses

    cfg = MetNet3Config(
        window_size=13, n_variables=24, n_start_channels=128,
        end_lead_time=12, pm25_mean=22.5, pm25_std=15.5, dropout=0.1,
        compute_dtype="bfloat16")
    tc = TrainConfig(learning_rate=1e-4, total_steps=1000, warmup_steps=10,
                     batch_size=batch_size)
    with jax.default_device(jax.devices("cpu")[0]):
        state = jax.eval_shape(
            lambda k: init_train_state(metnet3_init(k, cfg), tc),
            jax.ShapeDtypeStruct((2,), jnp.uint32))
        batch = {
            "x": jax.ShapeDtypeStruct((batch_size, 13, 24, 82, 67),
                                      jnp.float32),
            "timestamps": jax.ShapeDtypeStruct((batch_size, 25, 4),
                                               jnp.float32),
            "targets": jax.ShapeDtypeStruct((batch_size, 12, 82, 67),
                                            jnp.float32),
        }
        step = build_train_step(cfg, tc)
        cost = step.lower(state, batch).cost_analysis()
    return float(cost.get("flops", 0.0))


def run(batch_size: int, steps: int, warmup: int = 6, modes=MODES):
    rng = np.random.default_rng(0)
    batch_host = {
        "x": rng.random((batch_size, 13, 24, 82, 67), dtype=np.float32) * 50,
        "timestamps": np.tile(
            np.asarray([2023.0, 1.0, 15.0, 6.0], np.float32),
            (batch_size, 25, 1)),
        "targets": rng.random((batch_size, 12, 82, 67), dtype=np.float32) * 60,
    }
    # fast_nhwc: the production --fast staging — host-prepared device
    # layout in bf16 (train CLI), so the step neither relayouts nor casts
    from vit_grid_model_tpu.models.metnet3 import pad_values
    le, ri, to, bo = pad_values(82, 67, 14)
    xp = np.zeros((batch_size, 82 + to + bo, 67 + le + ri, 13 * 24),
                  np.float32)
    xp[:, to:to + 82, le:le + 67] = (
        batch_host["x"].reshape(batch_size, 13 * 24, 82, 67)
        .transpose(0, 2, 3, 1))
    batch_nhwc_host = dict(batch_host, x=jnp.asarray(xp, jnp.bfloat16))

    results = {}
    for mode in modes:
        nhwc = mode == "fast_nhwc"
        cfg = MetNet3Config(
            window_size=13, n_variables=24, n_start_channels=128,
            end_lead_time=12, pm25_mean=22.5, pm25_std=15.5, dropout=0.1,
            compute_dtype="bfloat16",
            fuse_lead_stem=(mode in ("fast", "fast_nhwc")),
            use_pallas_attention=(mode != "xla"),
            use_pallas_attention_bwd=(
                mode in ("pallas_fused_bwd", "fast", "fast_nhwc")),
            nhwc_input=nhwc)
        tc = TrainConfig(learning_rate=1e-4, total_steps=1000,
                         warmup_steps=10, batch_size=batch_size)
        params = metnet3_init(jax.random.PRNGKey(0), cfg)
        state = init_train_state(jax.tree.map(jnp.asarray, params), tc)
        step = build_train_step(cfg, tc)
        batch = jax.device_put(batch_nhwc_host if nhwc else batch_host)
        jax.block_until_ready(batch)
        _ = float(batch["x"].sum())  # force the upload through the tunnel

        for _ in range(warmup):
            state, m = step(state, batch)
        _ = float(m["loss"])

        t0 = time.perf_counter()
        for _ in range(steps):
            state, m = step(state, batch)
        loss = float(m["loss"])
        ms = (time.perf_counter() - t0) / steps * 1e3
        results[mode] = ms
        print(f"{mode:18s}: {ms:7.1f} ms/step "
              f"({batch_size / (ms / 1e3):5.1f} samples/s)  loss={loss:.4f}",
              flush=True)
    out = {"metric": "train_ms_per_step", "batch": batch_size,
           **{k: round(v, 1) for k, v in results.items()}}
    if "xla" in results:
        for k in ("pallas_fused_bwd", "fast", "fast_nhwc"):
            if k in results:
                out[f"{k}_speedup_vs_xla"] = round(results["xla"]
                                                   / results[k], 3)
    # train-step MFU, same HLO-flop currency as bench.py's inference MFU
    # (round-2 verdict item 7)
    flops = train_step_flops(batch_size)
    out["train_step_tflop"] = round(flops / 1e12, 3)
    for k, ms in results.items():
        tflops_s = flops / (ms / 1e3) / 1e12
        out[f"{k}_mfu"] = round(tflops_s / V5E_PEAK_BF16_TFLOPS, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--modes", type=str, default=",".join(MODES),
                    help="comma-separated subset of %s" % (MODES,))
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)
    run(args.batch, args.steps, modes=tuple(args.modes.split(",")))
