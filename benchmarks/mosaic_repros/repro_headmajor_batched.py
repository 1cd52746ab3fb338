"""New lever (round-3): head-major qkv layout + fully batched head math.

Instead of 96 per-head lane-slices of the packed (R, 3hd) qkv, do ONE
relayout to head-major (heads*blk, n, d) per q/k/v, then run the RMSNorm,
score dot, softmax and aggregation as single head-batched ops, and ONE
relayout back.  Trades Mosaic's many-small-slice overhead for two big
transposes.

Run: PYTHONPATH=. python benchmarks/mosaic_repros/repro_headmajor_batched.py
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
    R = blk * n_pad
    qkv = jnp.dot(x.reshape(R, dim), wqkv_ref[...],
                  preferred_element_type=jnp.float32)      # (R, 3*h*d)
    # ONE relayout: (R, 3hd) -> (3h, R, d); per-head rows become sublane
    # (cheap) slices afterwards.  Mosaic's tpu.matmul supports at most ONE
    # batch dim, so heads and windows fold into a single (h*blk) batch axis.
    qkv_hm = qkv.reshape(R, 3 * heads, dim_head).transpose(1, 0, 2)
    hb = heads * blk
    q = qkv_hm[:heads].reshape(hb, n_pad, dim_head)
    k = qkv_hm[heads:2 * heads].reshape(hb, n_pad, dim_head)
    v = qkv_hm[2 * heads:].reshape(hb, n_pad, dim_head)

    # batched RMSNorm over all heads at once
    qn = q * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(q * q, -1, keepdims=True), 1e-24))
    kn = k * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(k * k, -1, keepdims=True), 1e-24))

    # single-batch-dim score dot over all (head, window) pairs
    sim = jax.lax.dot_general(
        qn, kn, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                # (h*blk, n, n)
    bias = jnp.repeat(bias_ref[...], blk, axis=0)          # (h*blk, n, n)
    sim = sim + bias
    m = jnp.max(sim, -1, keepdims=True)
    e = jnp.exp(sim - m)
    attn = e / jnp.sum(e, -1, keepdims=True)
    o = jax.lax.dot_general(
        attn, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                # (h*blk, n, d)
    # ONE relayout back: (h, blk, n, d) -> (blk, n, h*d)
    o_ref[...] = o.reshape(heads, blk, n_pad, dim_head).transpose(
        1, 2, 0, 3).reshape(blk, n_pad, heads * dim_head).astype(o_ref.dtype)


def build(blk=C.BLK):
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
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(x, wqkv, bias)
    return fn


if __name__ == "__main__":
    x, wqkv, bias = C.inputs()
    C.run_repro("head-major qkv + batched head ops", build(), x, wqkv, bias)
