"""HBM envelope: max batch per mode on the 16 GB v5e (verdict r3 item 7).

Sweeps the flagship 12hr inference forward and the ``--fast`` train step
upward in batch size until the chip reports RESOURCE_EXHAUSTED, and prints
the largest batch that runs plus the failure batch.  Results are recorded
in docs/RESULTS.md; the runtime guard that turns the raw allocator dump
into an actionable message lives in ``utils/hbm.py`` (used by the CLIs).

Usage: PYTHONPATH=. python benchmarks/hbm_envelope.py [--mode infer|train]
"""
from __future__ import annotations

import argparse
import json

import numpy as np

import jax
import jax.numpy as jnp

from vit_grid_model_tpu.core.config import MetNet3Config
from vit_grid_model_tpu.models.metnet3 import metnet3_apply, metnet3_init
from vit_grid_model_tpu.utils.hbm import is_oom_error


def try_infer(B: int) -> bool:
    cfg = MetNet3Config(
        window_size=25, n_variables=24, n_start_channels=128,
        end_lead_time=12, pm25_mean=22.5, pm25_std=15.5,
        compute_dtype="bfloat16", fuse_lead_stem=True,
        use_pallas_attention=True)
    params = metnet3_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(0).random(
        (B, 25, 24, 82, 67), dtype=np.float32) * 50, jnp.bfloat16)
    ts = jnp.tile(jnp.asarray([2023., 1., 15., 6.]), (B, 25, 1))
    try:
        y = jax.jit(lambda p, a, b: metnet3_apply(p, a, b, cfg))(
            params, x, ts)
        _ = float(y.sum())
        return True
    except Exception as e:                      # noqa: BLE001
        if is_oom_error(e):
            return False
        raise


def try_train(B: int) -> bool:
    from vit_grid_model_tpu.core.config import TrainConfig
    from vit_grid_model_tpu.train.trainer import (build_train_step,
                                                  init_train_state)

    cfg = MetNet3Config(
        window_size=25, n_variables=24, n_start_channels=128,
        end_lead_time=12, pm25_mean=22.5, pm25_std=15.5, dropout=0.1,
        compute_dtype="bfloat16", fuse_lead_stem=True,
        use_pallas_attention=True, use_pallas_attention_bwd=True)
    tc = TrainConfig()
    params = metnet3_init(jax.random.PRNGKey(0), cfg)
    state = init_train_state(params, tc)
    step = build_train_step(cfg, tc)
    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.random((B, 25, 24, 82, 67), np.float32) * 50,
                         jnp.bfloat16),
        "timestamps": jnp.tile(jnp.asarray([2023., 1., 15., 6.]),
                               (B, 25, 1)),
        "targets": jnp.asarray(rng.random((B, 12, 82, 67), np.float32) * 40),
    }
    try:
        state2, metrics = step(state, batch)
        _ = float(metrics["loss"])
        return True
    except Exception as e:                      # noqa: BLE001
        if is_oom_error(e):
            return False
        raise


def sweep(fn, batches):
    last_ok, first_fail = None, None
    for B in batches:
        ok = fn(B)
        print(f"# B={B}: {'ok' if ok else 'OOM'}", flush=True)
        if ok:
            last_ok = B
        else:
            first_fail = B
            break
    return last_ok, first_fail


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("infer", "train", "both"),
                    default="both")
    args = ap.parse_args()
    out = {"metric": "hbm_envelope_16gb_v5e"}
    if args.mode in ("infer", "both"):
        ok, fail = sweep(try_infer, (32, 64, 96, 128, 192, 256, 384))
        out["infer_max_batch"], out["infer_oom_batch"] = ok, fail
    if args.mode in ("train", "both"):
        ok, fail = sweep(try_train, (4, 8, 16, 24, 32, 48, 64))
        out["train_fast_max_batch"], out["train_fast_oom_batch"] = ok, fail
    print(json.dumps(out))


if __name__ == "__main__":
    main()
