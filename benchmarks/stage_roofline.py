"""Stage-level roofline of the shipped 12hr inference at the bench config.

Times chained partial pipelines (``metnet3_apply(..., stop_after=...)``)
on-chip — N forwards per host sync, input perturbed per iteration to defeat
CSE (docs/RESULTS.md hazard) — and reports each stage as the successive
difference, with per-stage MFU from the CPU-lowered HLO flop count of the
same prefixes (Pallas off for counting: the kernel computes identical math
but hides its FLOPs behind a custom call).

Stages: stem (standardize + fused lead stem + pool) | mbconv | block-attn |
grid-attn | up+resnet2 | heads.

Usage:  PYTHONPATH=. python benchmarks/stage_roofline.py [--batch 32]
        [--fold-bn] [--iters 8]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from vit_grid_model_tpu.core.config import MetNet3Config
from vit_grid_model_tpu.models.metnet3 import metnet3_apply, metnet3_init

V5E_PEAK_BF16_TFLOPS = 197.0

# prefix order; None = full forward (incl. head + de-standardization)
STAGES = ("input", "stem", "vit_mbconv", "vit_block", "vit", "resnet2", None)
LABELS = ("input_prep", "stem+pool", "mbconv", "block_attn", "grid_attn",
          "up+resnet2", "heads")


def prefix_flops(cfg: MetNet3Config, B: int) -> dict:
    """HLO flop count of each prefix, CPU-lowered with Pallas off."""
    cfg_xla = dataclasses.replace(cfg, use_pallas_attention=False,
                                  nhwc_input=False)
    flops = {}
    with jax.default_device(jax.devices("cpu")[0]):
        params = jax.eval_shape(
            lambda k: metnet3_init(k, cfg_xla),
            jax.ShapeDtypeStruct((2,), jnp.uint32))
        x = jax.ShapeDtypeStruct((B, 25, 24, 82, 67), jnp.float32)
        ts = jax.ShapeDtypeStruct((B, 25, 4), jnp.float32)
        for stage in STAGES:
            fn = jax.jit(lambda p, a, b, s=stage: metnet3_apply(
                p, a, b, cfg_xla, stop_after=s))
            cost = fn.lower(params, x, ts).cost_analysis()
            flops[stage] = float(cost.get("flops", 0.0))
    return flops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)   # bench.py geometry
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--fold-bn", action="store_true")
    ap.add_argument("--nhwc", action="store_true",
                    help="host-prepared NHWC staging (the shipping fast "
                         "config, bench.py default): input_prep then "
                         "measures only the interior-masked standardize")
    args = ap.parse_args()

    cfg = MetNet3Config(
        window_size=25, n_variables=24, n_start_channels=128,
        end_lead_time=12, pm25_mean=22.5, pm25_std=15.5,
        compute_dtype="bfloat16", fuse_lead_stem=True,
        use_pallas_attention=True, fold_bn_eval=args.fold_bn,
        nhwc_input=args.nhwc)
    B, N = args.batch, args.iters
    params = metnet3_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, 25, 24, 82, 67)) * 50
    ts = jnp.tile(jnp.asarray([2023., 1., 15., 6.]), (B, 25, 1))
    if args.nhwc:
        import numpy as np

        from vit_grid_model_tpu.models.metnet3 import pad_values
        H, W = cfg.input_height, cfg.input_width
        le, ri, to, bo = pad_values(H, W, cfg.pad_multiple)
        xp = np.zeros((B, H + to + bo, W + le + ri, 25 * 24), np.float32)
        xp[:, to:to + H, le:le + W] = (
            np.asarray(x, np.float32).reshape(B, 25 * 24, H, W)
            .transpose(0, 2, 3, 1))
        x = jnp.asarray(xp, jnp.bfloat16)
    _ = float(x.sum())       # stage inputs in HBM before timing

    def chained(stage):
        @jax.jit
        def chain(p, xx, tt):
            def body(i, acc):
                o = metnet3_apply(p, xx + i.astype(xx.dtype) * 1e-3, tt,
                                  cfg, stop_after=stage)
                return acc + o.astype(jnp.float32).mean()
            return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))
        return chain

    cum_ms = {}
    for stage in STAGES:
        fn = chained(stage)
        float(fn(params, x, ts))                   # compile
        for _ in range(2):
            float(fn(params, x, ts))               # warm (axon hazard)
        t0 = time.perf_counter()
        for _ in range(3):
            float(fn(params, x, ts))
        cum_ms[stage] = (time.perf_counter() - t0) / (3 * N) * 1e3
        print(f"# cumulative through {stage or 'full'}: "
              f"{cum_ms[stage]:.2f} ms", flush=True)

    flops = prefix_flops(cfg, B)
    out = {"metric": "stage_roofline_ms", "batch": B,
           "fold_bn": args.fold_bn, "stages": {}}
    prev_ms, prev_fl = 0.0, 0.0
    for stage, label in zip(STAGES, LABELS):
        d_ms = cum_ms[stage] - prev_ms
        d_fl = flops[stage] - prev_fl
        mfu = d_fl / max(d_ms, 1e-9) / 1e9 / V5E_PEAK_BF16_TFLOPS
        out["stages"][label] = {
            "ms": round(d_ms, 2), "gflop": round(d_fl / 1e9, 1),
            "mfu": round(mfu, 4)}
        prev_ms, prev_fl = cum_ms[stage], flops[stage]
    out["total_ms"] = round(cum_ms[None], 2)
    out["fields_per_sec"] = round(
        B * cfg.end_lead_time / (cum_ms[None] / 1e3), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
