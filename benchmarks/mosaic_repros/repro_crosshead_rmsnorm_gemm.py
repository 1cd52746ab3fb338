"""Round-2 crash repro: cross-head vectorized RMSNorm via block-indicator GEMMs.

Restructuring: compute ALL heads' q/k RMSNorm denominators in one shot on
the packed (R, 3*h*d) qkv layout — per-head sum-of-squares via a GEMM with
a (3hd, 3h) block-indicator matrix, then broadcast the rsqrt back through
the transposed indicator — eliminating the 96 per-head lane slices for the
norm stage.  Round 2 reported this crashes the Mosaic compiler.

Run: PYTHONPATH=. python benchmarks/mosaic_repros/repro_crosshead_rmsnorm_gemm.py
"""
import functools
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from benchmarks.mosaic_repros import common as C


def kernel(x_ref, wqkv_ref, bias_ref, ind_ref, o_ref, *, heads, dim_head,
           blk, n_pad):
    x = x_ref[...]
    dim = x.shape[-1]
    qkv = jnp.dot(x.reshape(blk * n_pad, dim), wqkv_ref[...],
                  preferred_element_type=jnp.float32)          # (R, 3hd)
    # cross-head norm: sq @ indicator -> (R, 3h) per-head sum-of-squares;
    # rsqrt; broadcast back via indicator^T -> (R, 3hd); one multiply
    ind = ind_ref[...]                                          # (3hd, 3h)
    ss = jnp.dot(qkv * qkv, ind, preferred_element_type=jnp.float32)
    inv = jax.lax.rsqrt(jnp.maximum(ss, 1e-24))                 # (R, 3h)
    qkv_n = qkv * jnp.dot(inv, ind.T,
                          preferred_element_type=jnp.float32)   # (R, 3hd)

    dim_inner = heads * dim_head
    outs = []
    for h in range(heads):
        qn = qkv_n[:, h * dim_head:(h + 1) * dim_head].reshape(
            blk, n_pad, dim_head)
        kn = qkv_n[:, dim_inner + h * dim_head:
                   dim_inner + (h + 1) * dim_head].reshape(blk, n_pad,
                                                           dim_head)
        v = qkv[:, 2 * dim_inner + h * dim_head:
                2 * dim_inner + (h + 1) * dim_head].reshape(blk, n_pad,
                                                            dim_head)
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


def build(blk=C.BLK):
    ind = np.zeros((3 * C.HEADS * C.DIM_HEAD, 3 * C.HEADS), np.float32)
    for g in range(3 * C.HEADS):
        ind[g * C.DIM_HEAD:(g + 1) * C.DIM_HEAD, g] = 1.0
    ind = jnp.asarray(ind)

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
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((blk, C.N_PAD, C.HEADS * C.DIM_HEAD),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (C.BW, C.N_PAD, C.HEADS * C.DIM_HEAD), x.dtype),
        )(x, wqkv, bias, ind)
    return fn


if __name__ == "__main__":
    x, wqkv, bias = C.inputs()
    C.run_repro("cross-head RMSNorm via block-indicator GEMMs", build(),
                x, wqkv, bias)
