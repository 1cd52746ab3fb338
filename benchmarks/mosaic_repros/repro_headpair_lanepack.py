"""Head-pair lane packing: run the n^2 softmax work at 112/128 lanes.

The shipping kernel's per-head score/softmax arrays are (blk, 56, 56)
f32 — only 56 of the 128 VPU lanes are live for every n^2 elementwise op
(bias add, max, exp-sub, divide), i.e. the VPU-bound phase the two-pass
split exists to hide runs at 44% lane utilization.  This repro packs TWO
heads side-by-side along the lane axis (56 + 56 = 112 lanes) using only
the mechanisms this toolchain is known to lower well:

* paired qkv GEMMs: (R, dim) @ (dim, 2*dim_head) — the pair's q/k/v land
  lane-concatenated for free (the head split stays in the WEIGHTS, pair
  layout precomputed in XLA);
* segmented QK-RMSNorm via lane masks (broadcasted-iota compares), no
  lane slices;
* block-diagonal K/V operands built from masked copies + SUBLANE concat
  (rows, not lanes): kn_bd = [[k0|0], [0|k1]] (blk, 112, 64), so
  sim_pair = qn_pair @ kn_bd^T is (blk, 56, 112) with both heads' score
  matrices packed in lanes;
* JOINT row max across the pair for the stable-softmax shift (any value
  >= the row max is valid: softmax(s - m) is exactly softmax(s)), and
  segmented sums via two masked lane reduces;
* aggregation against v_bd = [[v0|0], [0|v1]] gives o_pair = [o0|o1]
  (blk, 56, 64), which the paired out-projection (64, dim) consumes
  directly — the f32 accumulation over pairs equals the per-head sum.

Zero Mosaic lane slices and zero lane concats anywhere; the price is 2x
MXU FLOPs in the score/agg dots (the zero blocks), which the bf16-operand
repro showed are hidden behind the VPU work this halves.

Run: PYTHONPATH=. python benchmarks/mosaic_repros/repro_headpair_lanepack.py
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

OUT_DIM = C.DIM
EPS2 = 1e-24


def _lane_mask(shape, lo, hi):
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    return ((lane >= lo) & (lane < hi)).astype(jnp.float32)


def pair_kernel(x_ref, wqkv_ref, bias_ref, wout_ref, o_ref, *, dim_head,
                pairs, blk, n_pad, two_pass):
    x = x_ref[...]
    dim = x.shape[-1]
    d2 = 2 * dim_head
    x2d = x.reshape(blk * n_pad, dim)

    mlo32 = _lane_mask((1, 1, d2), 0, dim_head)
    mhi32 = _lane_mask((1, 1, d2), dim_head, d2)
    mlo56 = _lane_mask((1, 1, 2 * n_pad), 0, n_pad)
    mhi56 = _lane_mask((1, 1, 2 * n_pad), n_pad, 2 * n_pad)

    def seg_rsqrt(sq):
        # per-head-segment rsqrt of lane-segment sums, re-broadcast
        s_lo = jnp.sum(sq * mlo32, -1, keepdims=True)
        s_hi = jnp.sum(sq * mhi32, -1, keepdims=True)
        return (jax.lax.rsqrt(jnp.maximum(s_lo, EPS2)) * mlo32
                + jax.lax.rsqrt(jnp.maximum(s_hi, EPS2)) * mhi32)

    def qkv_pair(hp):
        q = jnp.dot(x2d, wqkv_ref[0, hp], preferred_element_type=jnp.float32
                    ).reshape(blk, n_pad, d2)
        k = jnp.dot(x2d, wqkv_ref[1, hp], preferred_element_type=jnp.float32
                    ).reshape(blk, n_pad, d2)
        v = jnp.dot(x2d, wqkv_ref[2, hp], preferred_element_type=jnp.float32
                    ).reshape(blk, n_pad, d2)
        qn = q * seg_rsqrt(q * q)
        kn = k * seg_rsqrt(k * k)
        # block-diag keys: rows 0:n = [k0|0], rows n:2n = [0|k1]
        kn_bd = jnp.concatenate([kn * mlo32, kn * mhi32], axis=1)
        sim = jax.lax.dot_general(
            qn, kn_bd, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)   # (blk, n, 2n) packed
        return sim + bias_ref[hp][None], v

    def soft_agg(sim, v):
        # joint max across the packed pair: exact softmax, shared shift
        m = jnp.max(sim, -1, keepdims=True)
        e = jnp.exp(sim - m)
        s_lo = jnp.sum(e * mlo56, -1, keepdims=True)
        s_hi = jnp.sum(e * mhi56, -1, keepdims=True)
        attn = e / (s_lo * mlo56 + s_hi * mhi56)
        v_bd = jnp.concatenate([v * mlo32, v * mhi32], axis=1)
        return jax.lax.dot_general(
            attn, v_bd, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)   # (blk, n, 2d) = [o0|o1]

    if two_pass:
        svs = [qkv_pair(hp) for hp in range(pairs)]
        outs = [soft_agg(s, v) for s, v in svs]
    else:
        outs = []
        for hp in range(pairs):
            s, v = qkv_pair(hp)
            outs.append(soft_agg(s, v))

    acc = jnp.zeros((blk * n_pad, OUT_DIM), jnp.float32)
    for hp in range(pairs):
        acc = acc + jnp.dot(
            outs[hp].astype(x.dtype).reshape(blk * n_pad, 2 * dim_head),
            wout_ref[hp], preferred_element_type=jnp.float32)
    o_ref[...] = acc.reshape(blk, n_pad, OUT_DIM).astype(o_ref.dtype)


def pair_weights(wqkv, wout):
    """(dim, 3*h*d) / (h, d, dim) -> paired layouts, adjacent heads packed
    in lanes: wqkv_pair (3, h/2, dim, 2d), wout_pair (h/2, 2d, dim)."""
    h, d = C.HEADS, C.DIM_HEAD
    w4 = wqkv.reshape(C.DIM, 3, h, d).transpose(1, 2, 0, 3)   # (3,h,dim,d)
    wq = (w4.reshape(3, h // 2, 2, C.DIM, d).transpose(0, 1, 3, 2, 4)
          .reshape(3, h // 2, C.DIM, 2 * d))
    wo = wout.reshape(h // 2, 2 * d, OUT_DIM)
    return wq, wo


def pair_bias(bias):
    """(h, n, n) -> (h/2, n, 2n): adjacent heads' bias packed in lanes."""
    h, n = C.HEADS, C.N_PAD
    return bias.reshape(h // 2, 2, n, n).transpose(0, 2, 1, 3) \
        .reshape(h // 2, n, 2 * n)


def build(two_pass, blk=C.BLK, vmem_mb=64):
    def fn(x, wqkv, bias, wout):
        wq, wo = pair_weights(wqkv, wout)
        return pl.pallas_call(
            functools.partial(pair_kernel, dim_head=C.DIM_HEAD,
                              pairs=C.HEADS // 2, blk=blk, n_pad=C.N_PAD,
                              two_pass=two_pass),
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
        )(x, wq, pair_bias(bias), wo)
    return fn


def xla_reference(x, wqkv, bias, wout):
    """Per-head reference math (the shipping kernel's semantics)."""
    bw, n, dim = x.shape
    h, d = C.HEADS, C.DIM_HEAD
    qkv = jnp.dot(x.reshape(bw * n, dim).astype(jnp.float32),
                  wqkv.astype(jnp.float32))
    q, k, v = [t.reshape(bw, n, h, d).transpose(0, 2, 1, 3)
               for t in jnp.split(qkv, 3, -1)]
    qn = q * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(q * q, -1, keepdims=True), EPS2))
    kn = k * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(k * k, -1, keepdims=True), EPS2))
    sim = jnp.einsum("bhid,bhjd->bhij", qn, kn) + bias[None]
    attn = jax.nn.softmax(sim, -1)
    o = jnp.einsum("bhij,bhjd->bhid", attn, v)
    o = o.transpose(0, 2, 1, 3).reshape(bw * n, h * d)
    return jnp.dot(o, wout.reshape(h * d, OUT_DIM).astype(jnp.float32)
                   ).reshape(bw, n, OUT_DIM)


if __name__ == "__main__":
    x, wqkv, bias = C.inputs()
    wout = (jax.random.normal(jax.random.PRNGKey(7),
                              (C.HEADS, C.DIM_HEAD, OUT_DIM), jnp.bfloat16)
            * 0.05)
    # shipping structure at the same n_pad, for the controlled baseline
    from benchmarks.mosaic_repros.repro_weightsliced_variants import (
        build as build_ws)
    ref = None
    for name, fn in [
        ("ws_2pass_pwout blk=8 (shipping structure)", build_ws(
            "ws_2pass_pwout")),
        ("headpair lanepack, 2pass, blk=8", build(True)),
        ("headpair lanepack, 1pass, blk=8", build(False)),
        ("headpair lanepack, 2pass, blk=16", build(True, blk=16)),
        ("ws_2pass_pwout blk=16", build_ws("ws_2pass_pwout", blk=16)),
    ]:
        ms = C.run_repro(name, fn, x, wqkv, bias, wout)
        if ms is not None:
            got = np.asarray(fn(x, wqkv, bias, wout), np.float32)
            if ref is None:
                ref = np.asarray(
                    jax.jit(xla_reference)(x, wqkv, bias, wout), np.float32)
            rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
            print(f"    max rel vs XLA per-head reference: {rel:.2e}")
