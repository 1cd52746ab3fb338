"""Is int8 faster than bf16 on this chip/toolchain?  (verdict r3 item 6)

v5e peaks 394 TOPS int8 vs 197 TFLOP/s bf16.  Before building per-channel
PTQ into the model, measure the raw speed of the exact hot geometries:

* the stem/resnet2 3x3 convs (the two highest-MFU stages of the forward,
  benchmarks/stage_roofline.py: 28.6% / 50.8% bf16 MFU);
* the attention-projection GEMM shape.

int8 conv support on TPU goes through the same MXU int8 path as
dot_general; if XLA on this backend lowers either to a dequantize+bf16
fallback, the timing exposes it and the PTQ feature is moot.

Usage: PYTHONPATH=. python benchmarks/int8_conv.py
"""
from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def timeit_chain(make_step, n=30, reps=3):
    """Time an on-device fori_loop chain; input perturbed per iteration
    (CSE hazard, docs/RESULTS.md)."""
    chain = make_step(n)
    float(chain())                    # compile
    for _ in range(4):
        float(chain())                # warm (axon hazard)
    t0 = time.perf_counter()
    for _ in range(reps):
        float(chain())
    return (time.perf_counter() - t0) / (reps * n) * 1e3


def conv_case(B, H, W, Cin, Cout, kh, kw, name, out):
    rng = np.random.default_rng(0)
    xf = jax.device_put(rng.standard_normal((B, H, W, Cin),
                                            dtype=np.float32))
    wf = jax.device_put(rng.standard_normal((kh, kw, Cin, Cout),
                                            dtype=np.float32) * 0.05)
    _ = float(xf.sum())
    dn = ("NHWC", "HWIO", "NHWC")
    pad = "SAME" if kh > 1 else "VALID"

    def bf16_chain(n):
        xb = xf.astype(jnp.bfloat16)
        wb = wf.astype(jnp.bfloat16)

        @jax.jit
        def run(x, w):
            def body(i, acc):
                y = lax.conv_general_dilated(
                    x + i.astype(x.dtype) * 1e-3, w, (1, 1), pad,
                    dimension_numbers=dn,
                    preferred_element_type=jnp.float32)
                return acc + y.mean()
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        return lambda: run(xb, wb)

    def int8_chain(n):
        xq = jnp.clip(jnp.round(xf * 10.0), -127, 127).astype(jnp.int8)
        wq = jnp.clip(jnp.round(wf * 100.0), -127, 127).astype(jnp.int8)

        @jax.jit
        def run(x, w):
            def body(i, acc):
                # perturb via int roll (keeps operands int8)
                xs = jnp.roll(x, i, axis=1)
                y = lax.conv_general_dilated(
                    xs, w, (1, 1), pad, dimension_numbers=dn,
                    preferred_element_type=jnp.int32)
                return acc + y.astype(jnp.float32).mean() * 1e-4
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        return lambda: run(xq, wq)

    ms_bf16 = timeit_chain(bf16_chain)
    ms_int8 = timeit_chain(int8_chain)
    gflop = 2.0 * B * H * W * Cin * Cout * kh * kw / 1e9
    out[name] = {
        "bf16_ms": round(ms_bf16, 3), "int8_ms": round(ms_int8, 3),
        "speedup": round(ms_bf16 / ms_int8, 2),
        "bf16_tflops": round(gflop / ms_bf16, 1),
        "int8_tops": round(gflop / ms_int8, 1)}
    print(f"# {name}: bf16 {ms_bf16:.3f} ms ({gflop/ms_bf16:.0f} TF/s) "
          f"vs int8 {ms_int8:.3f} ms ({gflop/ms_int8:.0f} TOP/s) "
          f"-> {ms_bf16/ms_int8:.2f}x", flush=True)


def gemm_case(M, K, N, name, out):
    rng = np.random.default_rng(1)
    af = jax.device_put(rng.standard_normal((M, K), dtype=np.float32))
    bf = jax.device_put(rng.standard_normal((K, N), dtype=np.float32) * .05)
    _ = float(af.sum())

    def bf16_chain(n):
        a = af.astype(jnp.bfloat16)
        b = bf.astype(jnp.bfloat16)

        @jax.jit
        def run(a, b):
            def body(i, acc):
                y = jnp.dot(a + i.astype(a.dtype) * 1e-3, b,
                            preferred_element_type=jnp.float32)
                return acc + y.mean()
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        return lambda: run(a, b)

    def int8_chain(n):
        a = jnp.clip(jnp.round(af * 10), -127, 127).astype(jnp.int8)
        b = jnp.clip(jnp.round(bf * 100), -127, 127).astype(jnp.int8)

        @jax.jit
        def run(a, b):
            def body(i, acc):
                y = jnp.dot(jnp.roll(a, i, axis=0), b,
                            preferred_element_type=jnp.int32)
                return acc + y.astype(jnp.float32).mean() * 1e-4
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        return lambda: run(a, b)

    ms_bf16 = timeit_chain(bf16_chain)
    ms_int8 = timeit_chain(int8_chain)
    gflop = 2.0 * M * K * N / 1e9
    out[name] = {
        "bf16_ms": round(ms_bf16, 3), "int8_ms": round(ms_int8, 3),
        "speedup": round(ms_bf16 / ms_int8, 2),
        "bf16_tflops": round(gflop / ms_bf16, 1),
        "int8_tops": round(gflop / ms_int8, 1)}
    print(f"# {name}: bf16 {ms_bf16:.3f} ms ({gflop/ms_bf16:.0f} TF/s) "
          f"vs int8 {ms_int8:.3f} ms ({gflop/ms_int8:.0f} TOP/s) "
          f"-> {ms_bf16/ms_int8:.2f}x", flush=True)


def main():
    out = {"metric": "int8_vs_bf16"}
    BL = 384                               # B=32 x 12 leads (bench geometry)
    # stem block1 shared conv runs at B=32 (lead-factorized), 317ch padded
    conv_case(32, 84, 70, 320, 128, 3, 3, "stem_conv_b32_320to128", out)
    # resnet2 conv at full B*L
    conv_case(BL, 84, 70, 128, 128, 3, 3, "resnet2_conv_bl384_128", out)
    # 1x1 conv (mbconv expand geometry, 42x35)
    conv_case(BL, 42, 35, 128, 512, 1, 1, "mbconv_expand_1x1", out)
    # attention qkv projection as one wide GEMM (windows*tokens, dim)
    gemm_case(13824 * 56 // 8, 128, 3 * 1024, "qkv_gemm_shape", out)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
