"""Staged head-major attention: qkv GEMM + QK-norm in XLA, core in Pallas.

The opposite decomposition to the shipping fused kernel: accept the qkv HBM
round-trip (the fused kernel's raison d'etre) but lay q/k/v out HEAD-MAJOR
(heads, windows, n, d) in XLA, so the Pallas core indexes each head through
an untiled leading ref dim (``q_ref[h]``) and performs ZERO lane slices and
ZERO in-kernel GEMM-output reshapes — the two costs docs/RESULTS.md
attributes the per-program relayout floor to.

Arithmetic of the trade at eval geometry (bf16 staging): qkv write+read
~990MB x2 + head-major out ~330MB x2 over ~819GB/s = ~3.2ms of extra HBM
traffic + ~1.3ms of XLA GEMM, against the fused kernel's measured ~14
ms/call of which only ~10us/program is math.  If the relayout floor is
real and removable, the staged core should run near memory/issue speed and
the total should land well under the fused kernel.

Run: PYTHONPATH=. python benchmarks/mosaic_repros/repro_staged_headmajor.py
"""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from benchmarks.mosaic_repros import common as C


def core_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, heads, blk):
    """Score + softmax + aggregate for one window tile, all heads.

    Refs are head-major: q/k/v (heads, blk, n_pad, d); no slicing, no
    reshapes — each head is a contiguous leading-dim load."""
    for h in range(heads):
        q = q_ref[h]                                  # (blk, n_pad, d)
        k = k_ref[h]
        sim = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        sim = sim + bias_ref[h][None]
        m = jnp.max(sim, -1, keepdims=True)
        e = jnp.exp(sim - m)
        attn = e / jnp.sum(e, -1, keepdims=True)
        o_ref[h] = jax.lax.dot_general(
            attn.astype(v_ref.dtype), v_ref[h], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def build(blk=C.BLK, vmem_mb=64):
    kwargs = {}
    if vmem_mb:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024)
    hm_spec = pl.BlockSpec((C.HEADS, blk, C.N_PAD, C.DIM_HEAD),
                           lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM)

    def fn(x, wqkv, bias):
        # XLA stage: qkv GEMM (f32 accum), QK-RMSNorm, head-major layout
        qkv = jnp.einsum("wnc,cf->wnf", x, wqkv,
                         preferred_element_type=jnp.float32)
        qkv = qkv.reshape(C.BW, C.N_PAD, 3, C.HEADS, C.DIM_HEAD)
        q, k, v = (qkv[:, :, j].transpose(2, 0, 1, 3) for j in range(3))
        qn = q * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(q * q, -1, keepdims=True), 1e-24))
        kn = k * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(k * k, -1, keepdims=True), 1e-24))
        out_hm = pl.pallas_call(
            functools.partial(core_kernel, heads=C.HEADS, blk=blk),
            grid=(C.BW // blk,),
            in_specs=[hm_spec, hm_spec, hm_spec,
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=hm_spec,
            out_shape=jax.ShapeDtypeStruct(
                (C.HEADS, C.BW, C.N_PAD, C.DIM_HEAD), x.dtype),
            **kwargs,
        )(qn.astype(x.dtype), kn.astype(x.dtype), v.astype(x.dtype), bias)
        # back to the baseline's (BW, n_pad, heads*dim_head) concat layout
        return out_hm.transpose(1, 2, 0, 3).reshape(
            C.BW, C.N_PAD, C.HEADS * C.DIM_HEAD)
    return fn


if __name__ == "__main__":
    x, wqkv, bias = C.inputs()
    C.run_repro("staged head-major (XLA qkv + Pallas core, blk=8)", build(),
                x, wqkv, bias)
