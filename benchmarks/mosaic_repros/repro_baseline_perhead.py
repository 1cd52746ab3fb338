"""Baseline: the shipping kernel's per-head structure, minimal form.

96 lane-slices of the packed (R, 3*h*d) qkv GEMM output (q/k/v per head) +
per-head (blk, n, n) score/softmax/aggregate ops.  This is the structure
docs/RESULTS.md attributes the ~12 ms/call relayout floor to; every other
repro is a restructuring attempting to remove those slices.

Run: PYTHONPATH=. python benchmarks/mosaic_repros/repro_baseline_perhead.py
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
    qkv = jnp.dot(x.reshape(blk * n_pad, dim), wqkv_ref[...],
                  preferred_element_type=jnp.float32)
    dim_inner = heads * dim_head
    outs = []
    for h in range(heads):
        q = qkv[:, h * dim_head:(h + 1) * dim_head].reshape(blk, n_pad,
                                                            dim_head)
        k = qkv[:, dim_inner + h * dim_head:
                dim_inner + (h + 1) * dim_head].reshape(blk, n_pad, dim_head)
        v = qkv[:, 2 * dim_inner + h * dim_head:
                2 * dim_inner + (h + 1) * dim_head].reshape(blk, n_pad,
                                                            dim_head)
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


def build(blk=C.BLK, vmem_mb=None):
    kwargs = {}
    if vmem_mb:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024)

    def fn(x, wqkv, bias):
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
        )(x, wqkv, bias)
    return fn


if __name__ == "__main__":
    x, wqkv, bias = C.inputs()
    C.run_repro("baseline per-head loop (blk=8)", build(), x, wqkv, bias)
