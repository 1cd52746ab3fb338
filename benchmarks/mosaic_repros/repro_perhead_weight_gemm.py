"""Per-head WEIGHT-sliced qkv GEMMs: no lane-slicing of activations.

The shipping kernel computes one big (R, dim) @ (dim, 3*h*d) qkv GEMM and
then takes 96 static lane slices (q/k/v x 32 heads) of the result — the
relayout cost docs/RESULTS.md attributes the per-program floor to.  This
variant moves the head split to the WEIGHTS instead: wqkv is pre-reshaped
outside the kernel to (3, heads, dim, dim_head) and the kernel runs 96
small (R, dim) @ (dim, dim_head) GEMMs, indexing the weight by its untiled
leading dims (``ref[j, h]`` — the same mechanism the megakernel repro
proved lowers).  Identical FLOPs; the question is whether 96 small-GEMM
issues cost less than 96 lane-slice relayouts.

Run: PYTHONPATH=. python benchmarks/mosaic_repros/repro_perhead_weight_gemm.py
"""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from benchmarks.mosaic_repros import common as C


def kernel(x_ref, wqkv_ref, bias_ref, o_ref, *, heads, dim_head, blk, n_pad):
    x = x_ref[...]
    dim = x.shape[-1]
    x2d = x.reshape(blk * n_pad, dim)
    outs = []
    for h in range(heads):
        q = jnp.dot(x2d, wqkv_ref[0, h],
                    preferred_element_type=jnp.float32
                    ).reshape(blk, n_pad, dim_head)
        k = jnp.dot(x2d, wqkv_ref[1, h],
                    preferred_element_type=jnp.float32
                    ).reshape(blk, n_pad, dim_head)
        v = jnp.dot(x2d, wqkv_ref[2, h],
                    preferred_element_type=jnp.float32
                    ).reshape(blk, n_pad, dim_head)
        qn = q * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(q * q, -1, keepdims=True), 1e-24))
        kn = k * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(k * k, -1, keepdims=True), 1e-24))
        sim = jax.lax.dot_general(qn, kn, (((2,), (2,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        sim = sim + bias_ref[h][None]
        m = jnp.max(sim, -1, keepdims=True)
        e = jnp.exp(sim - m)
        attn = e / jnp.sum(e, -1, keepdims=True)
        outs.append(jax.lax.dot_general(
            attn, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
    o_ref[...] = jnp.concatenate(outs, -1).astype(o_ref.dtype)


def build(blk=C.BLK, vmem_mb=64):
    kwargs = {}
    if vmem_mb:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024)

    def fn(x, wqkv, bias):
        # (dim, 3*h*d) -> (3, heads, dim, dim_head): split the OUTPUT
        # features by (qkv, head) and make dim the sublane axis per slice
        w4 = wqkv.reshape(C.DIM, 3, C.HEADS, C.DIM_HEAD).transpose(1, 2, 0, 3)
        return pl.pallas_call(
            functools.partial(kernel, heads=C.HEADS, dim_head=C.DIM_HEAD,
                              blk=blk, n_pad=C.N_PAD),
            grid=(C.BW // blk,),
            in_specs=[
                pl.BlockSpec((blk, C.N_PAD, C.DIM), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((blk, C.N_PAD, C.HEADS * C.DIM_HEAD),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (C.BW, C.N_PAD, C.HEADS * C.DIM_HEAD), x.dtype),
            **kwargs,
        )(x, w4, bias)
    return fn


if __name__ == "__main__":
    x, wqkv, bias = C.inputs()
    C.run_repro("per-head weight-sliced qkv GEMMs (blk=8)", build(),
                x, wqkv, bias)
