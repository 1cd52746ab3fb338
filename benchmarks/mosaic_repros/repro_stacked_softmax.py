"""Round-2 crash repro: ONE stacked softmax over all heads.

Restructuring: keep the per-head score dots, but concatenate the 32 per-head
(blk, n, n) score arrays into one (heads*blk, n, n) array and run a single
max/exp/sum softmax over it — one big VPU pass instead of 32 small ones.
Round 2 reported this crashes the Mosaic compiler.

Run: PYTHONPATH=. python benchmarks/mosaic_repros/repro_stacked_softmax.py
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
    sims = []
    vs = []
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
        sims.append(sim + bias_ref[h][None])
        vs.append(v)

    # the restructuring under test: one (heads*blk, n, n) softmax
    stacked = jnp.concatenate(sims, axis=0)
    m = jnp.max(stacked, -1, keepdims=True)
    e = jnp.exp(stacked - m)
    attn_all = e / jnp.sum(e, -1, keepdims=True)

    outs = []
    for h in range(heads):
        attn = attn_all[h * blk:(h + 1) * blk]
        outs.append(jax.lax.dot_general(
            attn, vs[h], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
    o_ref[...] = jnp.concatenate(outs, -1).astype(o_ref.dtype)


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
    C.run_repro("stacked single softmax over (heads*blk, n, n)", build(),
                x, wqkv, bias)
