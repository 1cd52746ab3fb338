"""Head-QUAD lane packing: generalize the pair packing to K=4 heads/group.

The shipped pair packing (repro_headpair_lanepack.py, +10.9% kernel)
leaves two known slacks at dim_head=32:

* the paired qkv GEMMs are (R, 128) @ (128, 64) — only 64 of the MXU's
  128 output lanes live; K=4 makes them (R, 128) @ (128, 128), the
  canonical full-width MXU shape;
* every (n, K*d) elementwise op (q*q, k*k, masked rsqrt scaling) runs
  one 128-lane register per K heads — K=4 halves that VPU work again
  vs K=2 (the n^2 ops are lane-tile-neutral: (56, 224) pads to two
  128-lane tiles per 4 heads, same per-head cost as (56, 112)->128 per
  2 heads).

The price doubles the score/agg MXU waste: the block-diagonal dots run
K^2 blocks with K live (4x zeros at K=4 vs 2x at K=2).  The pair repro
already showed this phase is VPU/latency-bound, so the waste should
stay hidden — this repro measures whether it does.

Run: PYTHONPATH=. python benchmarks/mosaic_repros/repro_headquad_lanepack.py
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
from benchmarks.mosaic_repros.repro_headpair_lanepack import (
    build as build_pair, xla_reference)

OUT_DIM = C.DIM
EPS2 = 1e-24


def _lane_mask(shape, lo, hi):
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    return ((lane >= lo) & (lane < hi)).astype(jnp.float32)


def group_kernel(x_ref, wqkv_ref, bias_ref, wout_ref, o_ref, *, dim_head,
                 k_pack, groups, blk, n_pad, two_pass):
    x = x_ref[...]
    dim = x.shape[-1]
    dk = k_pack * dim_head
    x2d = x.reshape(blk * n_pad, dim)

    md = [_lane_mask((1, 1, dk), s * dim_head, (s + 1) * dim_head)
          for s in range(k_pack)]
    mn = [_lane_mask((1, 1, k_pack * n_pad), s * n_pad, (s + 1) * n_pad)
          for s in range(k_pack)]

    def seg_rsqrt(sq):
        out = jnp.zeros_like(md[0])
        for s in range(k_pack):
            ssum = jnp.sum(sq * md[s], -1, keepdims=True)
            out = out + jax.lax.rsqrt(jnp.maximum(ssum, EPS2)) * md[s]
        return out

    def qkv_group(g):
        q = jnp.dot(x2d, wqkv_ref[0, g], preferred_element_type=jnp.float32
                    ).reshape(blk, n_pad, dk)
        k = jnp.dot(x2d, wqkv_ref[1, g], preferred_element_type=jnp.float32
                    ).reshape(blk, n_pad, dk)
        v = jnp.dot(x2d, wqkv_ref[2, g], preferred_element_type=jnp.float32
                    ).reshape(blk, n_pad, dk)
        qn = q * seg_rsqrt(q * q)
        kn = k * seg_rsqrt(k * k)
        kn_bd = jnp.concatenate([kn * md[s] for s in range(k_pack)], axis=1)
        sim = jax.lax.dot_general(
            qn, kn_bd, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)   # (blk, n, K*n) packed
        return sim + bias_ref[g][None], v

    def soft_agg(sim, v):
        m = jnp.max(sim, -1, keepdims=True)       # joint group max: exact
        e = jnp.exp(sim - m)
        den = jnp.zeros_like(mn[0])
        for s in range(k_pack):
            den = den + jnp.sum(e * mn[s], -1, keepdims=True) * mn[s]
        attn = e / den
        v_bd = jnp.concatenate([v * md[s] for s in range(k_pack)], axis=1)
        return jax.lax.dot_general(
            attn, v_bd, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)   # (blk, n, K*d) = [o0|..]

    if two_pass:
        svs = [qkv_group(g) for g in range(groups)]
        outs = [soft_agg(s, v) for s, v in svs]
    else:
        outs = []
        for g in range(groups):
            s, v = qkv_group(g)
            outs.append(soft_agg(s, v))

    acc = jnp.zeros((blk * n_pad, OUT_DIM), jnp.float32)
    for g in range(groups):
        acc = acc + jnp.dot(
            outs[g].astype(x.dtype).reshape(blk * n_pad, dk),
            wout_ref[g], preferred_element_type=jnp.float32)
    o_ref[...] = acc.reshape(blk, n_pad, OUT_DIM).astype(o_ref.dtype)


def group_weights(wqkv, wout, k_pack):
    h, d = C.HEADS, C.DIM_HEAD
    g = h // k_pack
    w4 = wqkv.reshape(C.DIM, 3, h, d).transpose(1, 2, 0, 3)   # (3,h,dim,d)
    wq = (w4.reshape(3, g, k_pack, C.DIM, d).transpose(0, 1, 3, 2, 4)
          .reshape(3, g, C.DIM, k_pack * d))
    wo = wout.reshape(g, k_pack * d, OUT_DIM)
    return wq, wo


def group_bias(bias, k_pack):
    h, n = C.HEADS, C.N_PAD
    g = h // k_pack
    return bias.reshape(g, k_pack, n, n).transpose(0, 2, 1, 3) \
        .reshape(g, n, k_pack * n)


def build(k_pack, two_pass, blk=C.BLK, vmem_mb=96):
    def fn(x, wqkv, bias, wout):
        wq, wo = group_weights(wqkv, wout, k_pack)
        return pl.pallas_call(
            functools.partial(group_kernel, dim_head=C.DIM_HEAD,
                              k_pack=k_pack, groups=C.HEADS // k_pack,
                              blk=blk, n_pad=C.N_PAD, two_pass=two_pass),
            grid=(C.BW // blk,),
            in_specs=[pl.BlockSpec((blk, C.N_PAD, C.DIM),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec((blk, C.N_PAD, OUT_DIM),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C.BW, C.N_PAD, OUT_DIM),
                                           jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_mb * 1024 * 1024),
        )(x, wq, group_bias(bias, k_pack), wo)
    return fn


if __name__ == "__main__":
    x, wqkv, bias = C.inputs()
    wout = (jax.random.normal(jax.random.PRNGKey(7),
                              (C.HEADS, C.DIM_HEAD, OUT_DIM), jnp.bfloat16)
            * 0.05)
    ref = None
    for name, fn in [
        ("headpair 2pass, blk=8 (shipping)", build_pair(True)),
        ("headquad 2pass, blk=8", build(4, True)),
        ("headquad 1pass, blk=8", build(4, False)),
        ("headquad 2pass, blk=16", build(4, True, blk=16)),
        ("headoct  2pass, blk=8", build(8, True)),
    ]:
        ms = C.run_repro(name, fn, x, wqkv, bias, wout)
        if ms is not None:
            got = np.asarray(fn(x, wqkv, bias, wout), np.float32)
            if ref is None:
                ref = np.asarray(
                    jax.jit(xla_reference)(x, wqkv, bias, wout), np.float32)
            rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
            print(f"    max rel vs XLA per-head reference: {rel:.2e}")
