"""Fused Pallas TPU kernels for MaxViT window attention (forward + backward).

One forward kernel fuses the whole attention block for a tile of windows:
LayerNorm -> FiLM -> qkv projection -> QK-RMSNorm -> scores + relative
position bias -> softmax -> (dropout) -> value aggregation -> output
projection.

Why fuse: the XLA path materializes the (windows, tokens, 3*heads*dim_head)
qkv tensor in HBM (~1GB per attention call at eval batch sizes); keeping it
in VMEM removes that round-trip, which on a v5e (~800GB/s HBM) costs more
than the attention math itself.  The projections are WEIGHT-SLICED per
head: wqkv/wout ride in as (3, heads, dim, dim_head) / (heads, dim_head,
dim) and each head runs small GEMMs indexed through untiled leading ref
dims — zero Mosaic lane slices of GEMM outputs, the relayout cost that
set the kernel's round-2 floor (1.62x over the big-GEMM + 96-lane-slice
structure; benchmarks/mosaic_repros/README.md has the design matrix).

Geometry (eval config): 53 tokens (49 window + 4 registers) padded to 56
sublanes, dim 128, 32 heads x 32 dim_head.  Padded token rows are masked out
of the softmax with a -inf bias column block.

Training has two kernel-side extras:

* a fused BACKWARD kernel (``_attention_bwd_kernel``): flash-style in-VMEM
  recompute of the forward internals plus every gradient contraction in the
  same program, with weight/bias grads accumulated across the sequential TPU
  grid — measured 1.70x over the pure-XLA train step at flagship config
  (84.7 vs 143.8 ms with the weight-sliced layout; the XLA-recompute VJP of
  the forward-only kernel is a net LOSS there — current numbers live in
  docs/RESULTS.md "Train-step MFU");
* in-kernel attention dropout via a stateless counter-based hash PRNG
  (lowbias32-style integer mix of the global (window, head, row, col)
  index with a scalar seed, all VPU ops): the forward and backward kernels
  regenerate the identical keep-mask from the shared seed — identity holds
  by construction (a pure function of indices), not by draw-order
  discipline — removing the threefry sampling and the
  (windows, heads, n, n) mask HBM round-trips of the externally-sampled
  path.  (The TPU hardware PRNG was rejected: this jax build's TPU
  interpret mode stubs ``prng_random_bits`` to zeros, making that path
  untestable on CPU and silently all-dropping there.)

Semantics match ``ops.attention.attention`` exactly (same quirks: no extra
q scale, RMSNorm-only scaling); equivalence is tested in
tests/test_pallas_attention.py.  Select with
``MetNet3Config.use_pallas_attention`` (+ ``use_pallas_attention_bwd`` for
the training configuration) or call directly.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_grid_model_tpu.ops import nn as vnn

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _hash_keep(idx, seed, rate):
    """lowbias32-style integer hash of a global element index mixed with the
    scalar seed -> pre-scaled keep value.  Shared by the per-head and the
    head-pair mask builders so both address schemes produce bit-identical
    masks for the same (window, head, row, col)."""
    x = idx ^ (seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
    x = (x ^ (x >> jnp.uint32(16))) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> jnp.uint32(15))) * jnp.uint32(0x846CA68B)
    x = x ^ (x >> jnp.uint32(16))
    # Mosaic has no uint32->f32 cast; after >>8 the top bits are zero, so
    # a bitcast to int32 is value-preserving and int32->f32 lowers fine
    u24 = jax.lax.bitcast_convert_type(x >> jnp.uint32(8), jnp.int32)
    u = u24.astype(jnp.float32) * (2.0 ** -24)
    return (u >= rate).astype(jnp.float32) / (1.0 - rate)


def _keep_mask(seed, pid, h, heads, blk, n_pad, rate):
    """Pre-scaled dropout keep-mask for one head of one program's tile.

    A stateless counter-based PRNG: lowbias32-style integer hash of the
    global (window, head, row, col) index mixed with the scalar seed.
    Pure function of indices => the forward and backward kernels regenerate
    bit-identical masks with no cross-kernel draw-order coupling, and it
    runs identically under the TPU interpret mode (whose hardware-PRNG stub
    returns zeros).  ~6 VPU integer ops per element — noise next to the
    attention matmuls, and no (windows, heads, n, n) HBM traffic.
    """
    shape = (blk, n_pad, n_pad)
    win = (pid * blk).astype(jnp.uint32) + jax.lax.broadcasted_iota(
        jnp.uint32, shape, 0)
    row = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    col = jax.lax.broadcasted_iota(jnp.uint32, shape, 2)
    idx = ((win * jnp.uint32(heads) + jnp.uint32(h)) * jnp.uint32(n_pad)
           + row) * jnp.uint32(n_pad) + col
    return _hash_keep(idx, seed, rate)


def _keep_mask_pair(seed, pid, hp, heads, blk, n_pad, rate):
    """``_keep_mask`` for the head-PAIR packed layout: one (blk, n_pad,
    2*n_pad) tile whose lanes [0:n_pad] belong to head 2*hp and lanes
    [n_pad:2*n_pad] to head 2*hp+1.  The global element index is identical
    to the per-head builder's, so the (per-head) backward kernel
    regenerates the exact same mask values."""
    shape = (blk, n_pad, 2 * n_pad)
    win = (pid * blk).astype(jnp.uint32) + jax.lax.broadcasted_iota(
        jnp.uint32, shape, 0)
    row = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    lane = jax.lax.broadcasted_iota(jnp.uint32, shape, 2)
    hi = (lane >= jnp.uint32(n_pad)).astype(jnp.uint32)
    head = jnp.uint32(2 * hp) + hi
    col = lane - hi * jnp.uint32(n_pad)
    idx = ((win * jnp.uint32(heads) + head) * jnp.uint32(n_pad)
           + row) * jnp.uint32(n_pad) + col
    return _hash_keep(idx, seed, rate)


# Scoped-VMEM budget for the forward kernel.  Unified at 64MB: the
# external-dropout-mask variant needs >16MB (its mask block alone busts the
# Mosaic default), and raising the budget for the mask-free eval program is
# neutral end-to-end (controlled A/B on the flagship bench: 1901 vs 1907
# fields/s at 16 vs 64MB — noise).  The backward kernel runs at 96MB below.
_VMEM_LIMIT = 64 * 1024 * 1024


def _lane_mask(shape, lo, hi):
    """f32 0/1 mask over the lane (last) axis, built from an iota compare —
    the Mosaic-friendly way to address lane segments (no lane slices)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    return ((lane >= lo) & (lane < hi)).astype(jnp.float32)


def _attention_kernel(x_ref, gamma_ref, beta_ref, wqkv_ref, qg_ref, kg_ref,
                      wout_ref, bias_ref, *rest, heads: int,
                      dim_head: int, n_pad: int, blk: int,
                      has_film: bool, paired: bool = False,
                      dropout_rate: float = 0.0,
                      emit_mask: bool = False, ln_eps: float = 1e-5,
                      rms_eps: float = 1e-12):
    """One program: BLK windows of (n_pad, dim) tokens.

    With ``paired=True`` (any even head count) adjacent heads are packed
    side-by-side along the LANE axis: qkv land lane-concatenated straight
    out of paired weight GEMMs ((dim, 2*dim_head) slices), K/V become
    block-diagonal via lane masks + a sublane concat, and every n^2
    elementwise op (bias add, max, exp, divide) runs on (blk, n_pad,
    2*n_pad) tiles at 112/128 live lanes instead of 56/128.  The softmax
    shift uses the JOINT row max of the pair — softmax(s - m) is exactly
    softmax(s) for any m, so the semantics are unchanged.  Measured 10.9%
    faster per call at the flagship geometry
    (benchmarks/mosaic_repros/repro_headpair_lanepack.py: 7.43 vs 8.34 ms,
    identical max-rel vs the XLA reference); the price — 2x MXU FLOPs in
    the score/agg dots from the zero blocks — hides behind the VPU work
    the packing halves, as the bf16-operand repro predicted.

    ``rest`` layout (all optional slots resolved statically):
    ``[seed_ref (SMEM, iff dropout_rate > 0)] + [mask_ref (iff an external
    pre-scaled keep mask rides along)] + [o_ref] + [mask_out_ref (iff
    emit_mask — test hook exposing the in-kernel-sampled mask)]``."""
    refs = list(rest)
    seed_ref = refs.pop(0) if dropout_rate > 0.0 else None
    mask_out_ref = refs.pop() if emit_mask else None
    mask_ref = refs.pop(0) if len(refs) == 2 else None
    o_ref = refs[0]

    in_dtype = x_ref.dtype
    x = x_ref[...].astype(jnp.float32)            # (blk, n_pad, dim)
    dim = x.shape[-1]

    # LayerNorm (no affine under conditioning) + FiLM — in f32: the VPU has
    # no bf16 rsqrt on this target
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + ln_eps)
    if has_film:
        xn = (xn * gamma_ref[...].astype(jnp.float32)[:, None, :]
              + beta_ref[...].astype(jnp.float32)[:, None, :])

    # Per-head WEIGHT-sliced qkv projections: wqkv rides in as
    # (3, heads, dim, dim_head) and each head runs a small
    # (blk*n_pad, dim) @ (dim, dim_head) GEMM indexed through untiled
    # leading ref dims — identical FLOPs to the single big GEMM, but ZERO
    # Mosaic lane slices of the GEMM output.  The 96 lane slices of the
    # former (blk*n_pad, 3*h*d) layout were the kernel's relayout floor:
    # this restructuring measures 1.62x over it at eval geometry
    # (benchmarks/mosaic_repros/repro_weightsliced_variants.py: 7.89 vs
    # 12.76 ms/call incl. the out-projection).
    xn_c = xn.astype(in_dtype).reshape(blk * n_pad, dim)

    scale = dim_head ** 0.5
    if paired:
        pairs = heads // 2
        d2 = 2 * dim_head
        n2 = 2 * n_pad
        mlo_d = _lane_mask((1, 1, d2), 0, dim_head)
        mhi_d = _lane_mask((1, 1, d2), dim_head, d2)
        mlo_n = _lane_mask((1, 1, n2), 0, n_pad)
        mhi_n = _lane_mask((1, 1, n2), n_pad, n2)

        def seg_rsqrt(sq):
            s_lo = jnp.sum(sq * mlo_d, -1, keepdims=True)
            s_hi = jnp.sum(sq * mhi_d, -1, keepdims=True)
            return (jax.lax.rsqrt(jnp.maximum(s_lo, rms_eps ** 2)) * mlo_d
                    + jax.lax.rsqrt(jnp.maximum(s_hi, rms_eps ** 2)) * mhi_d)

        # pass 1 (per pair): paired qkv GEMMs, segmented RMSNorm,
        # block-diagonal score dot, packed bias
        sims, vs = [], []
        for hp in range(pairs):
            q = jnp.dot(xn_c, wqkv_ref[0, hp],
                        preferred_element_type=jnp.float32
                        ).reshape(blk, n_pad, d2)
            k = jnp.dot(xn_c, wqkv_ref[1, hp],
                        preferred_element_type=jnp.float32
                        ).reshape(blk, n_pad, d2)
            v = jnp.dot(xn_c, wqkv_ref[2, hp],
                        preferred_element_type=jnp.float32
                        ).reshape(blk, n_pad, d2)
            qn = q * seg_rsqrt(q * q) * (scale * qg_ref[hp])
            kn = k * seg_rsqrt(k * k) * (scale * kg_ref[hp])
            kn_bd = jnp.concatenate([kn * mlo_d, kn * mhi_d], axis=1)
            sim = jax.lax.dot_general(
                qn, kn_bd, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # (blk, n_pad, n2)
            sims.append(sim + bias_ref[hp][None])
            vs.append(v)

        # pass 2 (per pair): packed softmax, dropout, block-diag agg
        y = jnp.zeros((blk * n_pad, dim), jnp.float32)
        for hp in range(pairs):
            sim = sims[hp]
            m = jnp.max(sim, axis=-1, keepdims=True)   # joint pair max
            e = jnp.exp(sim - m)
            s_lo = jnp.sum(e * mlo_n, -1, keepdims=True)
            s_hi = jnp.sum(e * mhi_n, -1, keepdims=True)
            attn = e / (s_lo * mlo_n + s_hi * mhi_n)
            if seed_ref is not None:
                keep = _keep_mask_pair(seed_ref[0], pl.program_id(0), hp,
                                       heads, blk, n_pad, dropout_rate)
                attn = attn * keep
                if mask_out_ref is not None:
                    mask_out_ref[:, hp] = keep.astype(mask_out_ref.dtype)
            elif mask_ref is not None:
                attn = attn * mask_ref[:, hp].astype(jnp.float32)
            v_bd = jnp.concatenate([vs[hp] * mlo_d, vs[hp] * mhi_d], axis=1)
            o_hp = jax.lax.dot_general(
                attn, v_bd, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)    # (blk, n_pad, d2)
            y = y + jnp.dot(
                o_hp.astype(in_dtype).reshape(blk * n_pad, d2),
                wout_ref[hp], preferred_element_type=jnp.float32)
        o_ref[...] = y.reshape(blk, n_pad, dim).astype(o_ref.dtype)
        return

    # pass 1 (per head): qkv GEMMs, RMSNorm, score dot, bias
    sims, vs = [], []
    for h in range(heads):
        q = jnp.dot(xn_c, wqkv_ref[0, h], preferred_element_type=jnp.float32
                    ).reshape(blk, n_pad, dim_head)
        k = jnp.dot(xn_c, wqkv_ref[1, h], preferred_element_type=jnp.float32
                    ).reshape(blk, n_pad, dim_head)
        v = jnp.dot(xn_c, wqkv_ref[2, h], preferred_element_type=jnp.float32
                    ).reshape(blk, n_pad, dim_head)
        # QK-RMSNorm: l2-normalize * sqrt(d) * gamma_h
        qn = q * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(q * q, -1, keepdims=True), rms_eps ** 2))
        kn = k * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(k * k, -1, keepdims=True), rms_eps ** 2))
        qn = qn * (scale * qg_ref[h])             # fold per-head gamma
        kn = kn * (scale * kg_ref[h])
        sim = jax.lax.dot_general(
            qn, kn, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)   # (blk, n_pad, n_pad)
        sims.append(sim + bias_ref[h][None])
        vs.append(v)

    # pass 2 (per head): softmax, dropout, aggregation.  Splitting the head
    # loop into score and softmax/aggregate passes lets Mosaic overlap the
    # VPU softmax of head h with the MXU dots of other heads: +2.3% on the
    # flagship bench vs the single fused loop (1901 vs 1859 fields/s,
    # controlled A/B).  A fully stacked all-heads softmax is NEUTRAL on
    # top of this split — see benchmarks/mosaic_repros/README.md.
    # The output projection is also weight-sliced: wout rides in as
    # (heads, dim_head, dim) and each head's (blk*n_pad, d) @ (d, dim)
    # partial product accumulates in f32 — no 32-way lane concat of the
    # head outputs (the other relayout the old layout paid).
    y = jnp.zeros((blk * n_pad, dim), jnp.float32)
    for h in range(heads):
        sim = sims[h]
        m = jnp.max(sim, axis=-1, keepdims=True)
        e = jnp.exp(sim - m)
        attn = e / jnp.sum(e, axis=-1, keepdims=True)
        if seed_ref is not None:
            # counter-based dropout: keep prob 1-rate, pre-scaled.  The
            # backward kernel evaluates the same hash of the same indices,
            # so it regenerates this exact mask.
            keep = _keep_mask(seed_ref[0], pl.program_id(0), h, heads,
                              blk, n_pad, dropout_rate)
            attn = attn * keep
            if mask_out_ref is not None:
                mask_out_ref[:, h] = keep.astype(mask_out_ref.dtype)
        elif mask_ref is not None:
            attn = attn * mask_ref[:, h].astype(jnp.float32)
        o_h = jax.lax.dot_general(
            attn, vs[h], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)   # (blk, n_pad, d)
        y = y + jnp.dot(
            o_h.astype(in_dtype).reshape(blk * n_pad, dim_head),
            wout_ref[h], preferred_element_type=jnp.float32)
    o_ref[...] = y.reshape(blk, n_pad, dim).astype(o_ref.dtype)


def _prep_gamma_beta(p, cond, x, bw, dim, windows_per_sample):
    """The LN-affine/FiLM slot shared by the forward and backward wrappers.
    Conditioned layers have no LN affine (``maxvit.py:137``); for
    unconditioned layers the affine g/b ride the FiLM slot instead."""
    if "film" in p and cond is not None:
        gamma, beta = vnn.film(p["film"], cond)
        gamma = jnp.repeat(gamma, windows_per_sample, axis=0)
        beta = jnp.repeat(beta, windows_per_sample, axis=0)
        return gamma, beta, True
    if "g" in p["norm"]:
        gamma = jnp.broadcast_to(p["norm"]["g"], (bw, dim))
        beta = jnp.broadcast_to(p["norm"]["b"], (bw, dim))
        return gamma, beta, True
    return (jnp.ones((bw, dim), x.dtype), jnp.zeros((bw, dim), x.dtype),
            False)


def _prep_bias(p, bias_indices, n, n_pad):
    bias = vnn.embedding(p["rel_pos_bias"], bias_indices)   # (n, n, h)
    bias = bias.transpose(2, 0, 1).astype(jnp.float32)      # (h, n, n)
    # pad: -inf on padded KEY columns so they never receive weight;
    # padded query rows produce garbage and are sliced off by the caller
    return jnp.pad(bias, ((0, 0), (0, n_pad - n), (0, n_pad - n)),
                   constant_values=-1e30)


def _pick_blk(bw: int, block_windows: int) -> int:
    blk = block_windows
    while bw % blk != 0:
        blk //= 2
    # Mosaic needs the sublane dim of 2-D (blk, dim) blocks divisible by 8
    # (or the whole array): small/odd window counts fall back to one program
    if blk % 8 != 0 and blk != bw:
        blk = bw
    return blk


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def window_attention_pallas(p, x: Array, cond: Optional[Array],
                            bias_indices: Array,
                            dropout_mask: Optional[Array] = None,
                            heads: int = 32,
                            windows_per_sample: int = 1,
                            block_windows: int = 8) -> Array:
    """Drop-in replacement for ``ops.attention.attention``.

    x: (Bw, n, dim) sample-major windows; cond (B_cond, cond_dim) or None;
    dropout_mask: optional pre-scaled keep mask (Bw, heads, n, n) sampled
    OUTSIDE the kernel so the XLA-recompute backward applies the identical
    mask (training with attention dropout; for current measured speedups of
    every kernel configuration see docs/RESULTS.md — prefer the fused
    backward for training, this external-mask path is the fallback).

    Differentiable: the backward pass is the VJP of the (numerically
    equivalent) XLA implementation, recomputed from the saved inputs — the
    standard remat-style trade (the forward's HBM savings are what the
    kernel is for; the backward recompute uses fusion-friendly XLA ops).
    For the fused Pallas backward, use ``window_attention_pallas_fused``.
    """
    return _window_attention_fwd_impl(p, x, cond, bias_indices, dropout_mask,
                                      heads, windows_per_sample,
                                      block_windows, None, 0.0, False)


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 9, 10))
def _window_attention_fwd_impl(p, x, cond, bias_indices, dropout_mask,
                               heads, windows_per_sample, block_windows,
                               seed, dropout_rate, emit_mask):
    if emit_mask and dropout_rate <= 0.0:
        # the mask output block is only written on the dropout branch;
        # without it the second output would be uninitialized VMEM
        raise ValueError("emit_mask requires dropout_rate > 0")
    if dropout_mask is not None and dropout_rate > 0.0:
        # the two dropout contracts are mutually exclusive: with a seed the
        # in-kernel hash PRNG wins and an external mask would be silently
        # ignored
        raise ValueError(
            "pass either an external dropout_mask or an in-kernel "
            "(seed, dropout_rate) pair, not both")
    bw, n, dim = x.shape
    dim_head = p["q_norm"]["gamma"].shape[-1]
    # pad tokens to 8 sublanes (53 -> 56).  Mosaic accepts 8-row-aligned
    # blocks for bf16 too (masked packing); rounding to the full 16-row
    # bf16 tile (53 -> 64) costs +31% on every n^2 term and measured 14%
    # slower at the flagship geometry (9.57 vs 8.20 ms/call,
    # benchmarks/mosaic_repros/repro_npad_and_kfold.py).
    n_pad = _round_up(n, 8)

    # host-side (jit-traced, fused by XLA) precomputation of small pieces
    gamma, beta, has_film = _prep_gamma_beta(p, cond, x, bw, dim,
                                             windows_per_sample)
    bias = _prep_bias(p, bias_indices, n, n_pad)
    blk = _pick_blk(bw, block_windows)
    x_pad = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))

    grid = (bw // blk,)
    in_specs = [
        pl.BlockSpec((blk, n_pad, dim), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((blk, dim), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((blk, dim), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),   # wqkv
        pl.BlockSpec(memory_space=pltpu.VMEM),   # q gamma
        pl.BlockSpec(memory_space=pltpu.VMEM),   # k gamma
        pl.BlockSpec(memory_space=pltpu.VMEM),   # wout
        pl.BlockSpec(memory_space=pltpu.VMEM),   # bias
    ]
    # weight layouts for the weight-sliced kernel: the head split lives in
    # the WEIGHTS ((3, heads, dim, dim_head) / (heads, dim_head, dim)) and
    # the kernel indexes them through untiled leading ref dims — no lane
    # slicing of GEMM outputs (see _attention_kernel).  The relayout is
    # traced per call rather than cached in the param tree: ~1.5MB of HBM
    # traffic (dim x 3*heads*dim_head bf16) against the call's ~100MB of
    # activation traffic, i.e. bounded at well under 1% — kept inline so
    # the torch converters, checkpoints and the XLA path all share the
    # canonical (dim, 3*inner) parameter layout.
    wqkv4 = (p["to_qkv"]["w"].astype(x.dtype)
             .reshape(dim, 3, heads, dim_head).transpose(1, 2, 0, 3))
    wout3 = (p["to_out"]["w"].astype(x.dtype)
             .reshape(heads, dim_head, dim))
    qg = p["q_norm"]["gamma"][:, 0, :].astype(jnp.float32)
    kg = p["k_norm"]["gamma"][:, 0, :].astype(jnp.float32)
    # head-PAIR lane packing (see _attention_kernel): adjacent heads ride
    # side-by-side in the lane axis of every per-head operand
    paired = heads % 2 == 0
    if paired:
        pairs, d2 = heads // 2, 2 * dim_head
        wqkv4 = (wqkv4.reshape(3, pairs, 2, dim, dim_head)
                 .transpose(0, 1, 3, 2, 4).reshape(3, pairs, dim, d2))
        wout3 = wout3.reshape(pairs, d2, dim)
        qg = qg.reshape(pairs, d2)
        kg = kg.reshape(pairs, d2)
        bias = (bias.reshape(pairs, 2, n_pad, n_pad)
                .transpose(0, 2, 1, 3).reshape(pairs, n_pad, 2 * n_pad))
    operands = [
        x_pad, gamma.astype(x.dtype), beta.astype(x.dtype),
        wqkv4, qg, kg, wout3, bias,
    ]
    kwargs = {}
    if dropout_rate > 0.0:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(seed.astype(jnp.int32))
    if dropout_mask is not None:
        # padded key columns already get zero attention via the -inf bias;
        # mask padding values are therefore irrelevant (pad with zeros)
        mask_pad = jnp.pad(dropout_mask,
                           ((0, 0), (0, 0), (0, n_pad - n), (0, n_pad - n)))
        if paired:
            mask_pad = (mask_pad.reshape(bw, pairs, 2, n_pad, n_pad)
                        .transpose(0, 1, 3, 2, 4)
                        .reshape(bw, pairs, n_pad, 2 * n_pad))
            in_specs.append(pl.BlockSpec((blk, pairs, n_pad, 2 * n_pad),
                                         lambda i: (i, 0, 0, 0),
                                         memory_space=pltpu.VMEM))
        else:
            in_specs.append(pl.BlockSpec((blk, heads, n_pad, n_pad),
                                         lambda i: (i, 0, 0, 0),
                                         memory_space=pltpu.VMEM))
        operands.append(mask_pad.astype(x.dtype))
    out_shape = jax.ShapeDtypeStruct((bw, n_pad, dim), x.dtype)
    out_specs = pl.BlockSpec((blk, n_pad, dim), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    if emit_mask:
        mshape = ((bw, pairs, n_pad, 2 * n_pad) if paired
                  else (bw, heads, n_pad, n_pad))
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct(mshape, jnp.float32)]
        out_specs = [out_specs,
                     pl.BlockSpec((blk,) + mshape[1:],
                                  lambda i: (i, 0, 0, 0),
                                  memory_space=pltpu.VMEM)]
    kwargs["compiler_params"] = pltpu.CompilerParams(
        vmem_limit_bytes=_VMEM_LIMIT)
    out = pl.pallas_call(
        functools.partial(
            _attention_kernel, heads=heads, dim_head=dim_head,
            n_pad=n_pad, blk=blk, has_film=has_film, paired=paired,
            dropout_rate=dropout_rate, emit_mask=emit_mask),
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        **kwargs,
    )(*operands)
    if emit_mask:
        mask_out = out[1]
        if paired:
            mask_out = (mask_out.reshape(bw, pairs, n_pad, 2, n_pad)
                        .transpose(0, 1, 3, 2, 4)
                        .reshape(bw, heads, n_pad, n_pad))
        return out[0][:, :n, :], mask_out[:, :, :n, :n]
    return out[:, :n, :]


def _attention_bwd_ln_film(dxf, xn0, gamma_ref, has_film, r_ln,
                           dx_ref, dgamma_ref, dbeta_ref):
    """Shared tail of the backward kernel: FiLM grads + LayerNorm VJP
    (biased variance), from the attention-input cotangent ``dxf``."""
    if has_film:
        gam = gamma_ref[...].astype(jnp.float32)[:, None, :]
        dgamma_ref[...] = jnp.sum(dxf * xn0, axis=1).astype(dgamma_ref.dtype)
        dbeta_ref[...] = jnp.sum(dxf, axis=1).astype(dbeta_ref.dtype)
        dxn0 = dxf * gam
    else:
        dgamma_ref[...] = jnp.zeros_like(dgamma_ref)
        dbeta_ref[...] = jnp.zeros_like(dbeta_ref)
        dxn0 = dxf
    mean_d = jnp.mean(dxn0, axis=-1, keepdims=True)
    mean_dx = jnp.mean(dxn0 * xn0, axis=-1, keepdims=True)
    dx = r_ln * (dxn0 - mean_d - xn0 * mean_dx)
    dx_ref[...] = dx.astype(dx_ref.dtype)


def _attention_bwd_kernel(x_ref, gamma_ref, beta_ref, wqkv_ref, qg_ref,
                          kg_ref, wout_ref, bias_ref, dy_ref, *rest,
                          heads: int, dim_head: int, n_pad: int, blk: int,
                          has_film: bool, paired: bool = False,
                          dropout_rate: float = 0.0,
                          ln_eps: float = 1e-5, rms_eps: float = 1e-12):
    """Fused VJP of ``_attention_kernel`` for one tile of BLK windows.

    Flash-style backward: recomputes the forward internals (LN -> FiLM ->
    qkv GEMM -> QK-RMSNorm -> softmax [-> PRNG dropout]) in VMEM from the
    primal inputs, then runs all gradient contractions in the same
    program — the qkv/probs tensors never round-trip through HBM, which is
    what makes the XLA recompute backward lose.

    With ``paired=True`` (even head counts) the same head-pair lane
    packing as the forward kernel applies: every operand and every weight
    grad rides in the paired layout ((3, pairs, dim, 2d) wqkv,
    (pairs, 2d, dim) wout, (pairs, 2d) q/k gammas, (pairs, n_pad,
    2*n_pad) bias), the n^2 tensors (p, dpm, ds) are (blk, n_pad,
    2*n_pad) at 112/128 live lanes, and the two contractions whose packed
    result interleaves cross-head garbage blocks (dv, dkn) mask it off
    with the same iota lane masks.  The in-kernel dropout hash indexes by
    (window, head, row, col) in both layouts, so paired fwd + paired bwd
    regenerate bit-identical masks (and match the per-head kernels).

    ``rest`` = ([seed_ref iff dropout_rate > 0], [mask_ref iff external
    mask], dx_ref, dgamma_ref, dbeta_ref, dwqkv_ref, dwout_ref, dqg_ref,
    dkg_ref, dbias_ref).  The weight/bias grads use constant-index output
    blocks accumulated across the sequential TPU grid.
    """
    refs = list(rest)
    seed_ref = refs.pop(0) if dropout_rate > 0.0 else None
    mask_ref = refs.pop(0) if len(refs) == 9 else None
    (dx_ref, dgamma_ref, dbeta_ref, dwqkv_ref, dwout_ref, dqg_ref, dkg_ref,
     dbias_ref) = refs

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dwout_ref[...] = jnp.zeros_like(dwout_ref)
        dqg_ref[...] = jnp.zeros_like(dqg_ref)
        dkg_ref[...] = jnp.zeros_like(dkg_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    in_dtype = x_ref.dtype
    x = x_ref[...].astype(jnp.float32)                 # (blk, n_pad, dim)
    dim = x.shape[-1]

    # ---- recompute forward up to the normalized input ----
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    r_ln = jax.lax.rsqrt(var + ln_eps)
    xn0 = (x - mean) * r_ln
    if has_film:
        gam = gamma_ref[...].astype(jnp.float32)[:, None, :]
        xf = xn0 * gam + beta_ref[...].astype(jnp.float32)[:, None, :]
    else:
        xf = xn0
    xf_c = xf.astype(in_dtype).reshape(blk * n_pad, dim)

    scale = dim_head ** 0.5
    dy = dy_ref[...].astype(jnp.float32)
    dy2 = dy.reshape(blk * n_pad, dim).astype(in_dtype)

    if paired:
        pairs = heads // 2
        d2 = 2 * dim_head
        mlo_d = _lane_mask((1, 1, d2), 0, dim_head)
        mhi_d = _lane_mask((1, 1, d2), dim_head, d2)
        mlo_n = _lane_mask((1, 1, 2 * n_pad), 0, n_pad)
        mhi_n = _lane_mask((1, 1, 2 * n_pad), n_pad, 2 * n_pad)

        def seg_sums(t):
            return (jnp.sum(t * mlo_d, -1, keepdims=True),
                    jnp.sum(t * mhi_d, -1, keepdims=True))

        dxf2 = jnp.zeros((blk * n_pad, dim), jnp.float32)
        dqg_parts, dkg_parts, dbias_parts = [], [], []
        for hp in range(pairs):
            # ---- recompute the paired forward internals ----
            q = jnp.dot(xf_c, wqkv_ref[0, hp],
                        preferred_element_type=jnp.float32
                        ).reshape(blk, n_pad, d2)
            k = jnp.dot(xf_c, wqkv_ref[1, hp],
                        preferred_element_type=jnp.float32
                        ).reshape(blk, n_pad, d2)
            v = jnp.dot(xf_c, wqkv_ref[2, hp],
                        preferred_element_type=jnp.float32
                        ).reshape(blk, n_pad, d2)
            qq_lo, qq_hi = seg_sums(q * q)
            kk_lo, kk_hi = seg_sums(k * k)
            r_q = (jax.lax.rsqrt(jnp.maximum(qq_lo, rms_eps ** 2)) * mlo_d
                   + jax.lax.rsqrt(jnp.maximum(qq_hi, rms_eps ** 2)) * mhi_d)
            r_k = (jax.lax.rsqrt(jnp.maximum(kk_lo, rms_eps ** 2)) * mlo_d
                   + jax.lax.rsqrt(jnp.maximum(kk_hi, rms_eps ** 2)) * mhi_d)
            u_q, u_k = q * r_q, k * r_k
            s_q, s_k = scale * qg_ref[hp], scale * kg_ref[hp]
            qn, kn = u_q * s_q, u_k * s_k
            kn_bd = jnp.concatenate([kn * mlo_d, kn * mhi_d], axis=1)
            sim = jax.lax.dot_general(
                qn, kn_bd, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) + bias_ref[hp][None]
            m = jnp.max(sim, axis=-1, keepdims=True)   # joint pair max
            e = jnp.exp(sim - m)
            s_lo = jnp.sum(e * mlo_n, -1, keepdims=True)
            s_hi = jnp.sum(e * mhi_n, -1, keepdims=True)
            p = e / (s_lo * mlo_n + s_hi * mhi_n)      # (blk, n, 2n)
            if seed_ref is not None:
                mask_h = _keep_mask_pair(seed_ref[0], pl.program_id(0), hp,
                                         heads, blk, n_pad, dropout_rate)
            elif mask_ref is not None:
                mask_h = mask_ref[:, hp].astype(jnp.float32)
            else:
                mask_h = None
            pm = p * mask_h if mask_h is not None else p
            v_bd = jnp.concatenate([v * mlo_d, v * mhi_d], axis=1)

            # ---- gradients ----
            do_p = jax.lax.dot_general(
                dy2, wout_ref[hp], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32
                ).reshape(blk, n_pad, d2)
            o_p = jax.lax.dot_general(
                pm, v_bd, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)    # (blk, n, d2)
            dwout_ref[hp] += jax.lax.dot_general(
                o_p.reshape(blk * n_pad, d2).astype(in_dtype), dy2,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # (d2, dim)

            # packed dv carries cross-head blocks in the off-segments;
            # fold the two sublane halves back with the lane masks
            dv_full = jax.lax.dot_general(
                pm, do_p, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)    # (blk, 2n, d2)
            dv = (dv_full[:, :n_pad] * mlo_d
                  + dv_full[:, n_pad:] * mhi_d)        # (blk, n, d2)
            dpm = jax.lax.dot_general(
                do_p, v_bd, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)    # (blk, n, 2n)
            dp = dpm * mask_h if mask_h is not None else dpm
            dpp = dp * p
            row = (jnp.sum(dpp * mlo_n, -1, keepdims=True) * mlo_n
                   + jnp.sum(dpp * mhi_n, -1, keepdims=True) * mhi_n)
            ds = p * (dp - row)
            dbias_parts.append(jnp.sum(ds, axis=0, keepdims=True))

            dqn = jax.lax.dot_general(
                ds, kn_bd, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)    # (blk, n, d2)
            dkn_full = jax.lax.dot_general(
                ds, qn, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)    # (blk, 2n, d2)
            dkn = (dkn_full[:, :n_pad] * mlo_d
                   + dkn_full[:, n_pad:] * mhi_d)
            dqg_parts.append(scale * jnp.sum(
                (dqn * u_q).reshape(blk * n_pad, d2), 0, keepdims=True))
            dkg_parts.append(scale * jnp.sum(
                (dkn * u_k).reshape(blk * n_pad, d2), 0, keepdims=True))
            # segmented l2-normalize backward (projection term vanishes on
            # the clamped branch, per lane segment)
            dUq, dUk = dqn * s_q, dkn * s_k
            pq_lo, pq_hi = seg_sums(dUq * u_q)
            pk_lo, pk_hi = seg_sums(dUk * u_k)
            proj_q = (jnp.where(qq_lo > rms_eps ** 2, pq_lo, 0.0) * mlo_d
                      + jnp.where(qq_hi > rms_eps ** 2, pq_hi, 0.0) * mhi_d)
            proj_k = (jnp.where(kk_lo > rms_eps ** 2, pk_lo, 0.0) * mlo_d
                      + jnp.where(kk_hi > rms_eps ** 2, pk_hi, 0.0) * mhi_d)
            dq_p = (r_q * (dUq - u_q * proj_q)
                    ).reshape(blk * n_pad, d2).astype(in_dtype)
            dk_p = (r_k * (dUk - u_k * proj_k)
                    ).reshape(blk * n_pad, d2).astype(in_dtype)
            dv_p = dv.reshape(blk * n_pad, d2).astype(in_dtype)
            dwqkv_ref[0, hp] += jax.lax.dot_general(
                xf_c, dq_p, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # (dim, d2)
            dwqkv_ref[1, hp] += jax.lax.dot_general(
                xf_c, dk_p, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dwqkv_ref[2, hp] += jax.lax.dot_general(
                xf_c, dv_p, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dxf2 = dxf2 + jax.lax.dot_general(
                dq_p, wqkv_ref[0, hp], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dxf2 = dxf2 + jax.lax.dot_general(
                dk_p, wqkv_ref[1, hp], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dxf2 = dxf2 + jax.lax.dot_general(
                dv_p, wqkv_ref[2, hp], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        dqg_ref[...] += jnp.concatenate(dqg_parts, axis=0)
        dkg_ref[...] += jnp.concatenate(dkg_parts, axis=0)
        dbias_ref[...] += jnp.concatenate(dbias_parts, axis=0)
        _attention_bwd_ln_film(dxf2.reshape(blk, n_pad, dim), xn0,
                               gamma_ref, has_film, r_ln,
                               dx_ref, dgamma_ref, dbeta_ref)
        return

    # Weight-sliced per-head structure, mirroring the forward kernel:
    # wqkv rides in as (3, heads, dim, dim_head), wout as (heads,
    # dim_head, dim), and every per-head tensor (q/k/v, dout, the weight
    # grads) is produced by a small GEMM or an indexed ref store instead
    # of a Mosaic lane slice / 32-way concat — the same restructuring
    # that bought the forward 1.62x (benchmarks/mosaic_repros/README.md).
    dxf2 = jnp.zeros((blk * n_pad, dim), jnp.float32)
    dqg_parts, dkg_parts, dbias_parts = [], [], []
    for h in range(heads):
        q = jnp.dot(xf_c, wqkv_ref[0, h], preferred_element_type=jnp.float32
                    ).reshape(blk, n_pad, dim_head)
        k = jnp.dot(xf_c, wqkv_ref[1, h], preferred_element_type=jnp.float32
                    ).reshape(blk, n_pad, dim_head)
        v = jnp.dot(xf_c, wqkv_ref[2, h], preferred_element_type=jnp.float32
                    ).reshape(blk, n_pad, dim_head)
        qq = jnp.maximum(jnp.sum(q * q, -1, keepdims=True), rms_eps ** 2)
        kk = jnp.maximum(jnp.sum(k * k, -1, keepdims=True), rms_eps ** 2)
        r_q, r_k = jax.lax.rsqrt(qq), jax.lax.rsqrt(kk)
        u_q, u_k = q * r_q, k * r_k                   # unit rows
        s_q, s_k = scale * qg_ref[h], scale * kg_ref[h]
        qn, kn = u_q * s_q, u_k * s_k
        sim = jax.lax.dot_general(
            qn, kn, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) + bias_ref[h][None]
        m = jnp.max(sim, axis=-1, keepdims=True)
        e = jnp.exp(sim - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)    # (blk, n_q, n_k)
        if seed_ref is not None:
            mask_h = _keep_mask(seed_ref[0], pl.program_id(0), h, heads,
                                blk, n_pad, dropout_rate)
        elif mask_ref is not None:
            mask_h = mask_ref[:, h].astype(jnp.float32)
        else:
            mask_h = None
        pm = p * mask_h if mask_h is not None else p

        # dout_h = dy @ wout_h^T  (contract the model dim per head)
        do_h = jax.lax.dot_general(
            dy2, wout_ref[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32
            ).reshape(blk, n_pad, dim_head)
        # o_h = pm @ v feeds the out-projection weight grad
        o_h = jax.lax.dot_general(
            pm, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dwout_ref[h] += jax.lax.dot_general(
            o_h.reshape(blk * n_pad, dim_head).astype(in_dtype), dy2,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (d, dim)

        dv = jax.lax.dot_general(
            pm, do_h, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # (blk, n_k, d)
        dpm = jax.lax.dot_general(
            do_h, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # (blk, n_q, n_k)
        dp = dpm * mask_h if mask_h is not None else dpm
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dbias_parts.append(jnp.sum(ds, axis=0, keepdims=True))  # (1, n, n)

        dqn = jax.lax.dot_general(
            ds, kn, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # (blk, n_q, d)
        dkn = jax.lax.dot_general(
            ds, qn, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # (blk, n_k, d)
        dqg_parts.append(scale * jnp.sum(
            (dqn * u_q).reshape(blk * n_pad, dim_head), 0, keepdims=True))
        dkg_parts.append(scale * jnp.sum(
            (dkn * u_k).reshape(blk * n_pad, dim_head), 0, keepdims=True))
        # l2-normalize backward (through the max(||x||, eps) clamp: the
        # projection term vanishes on the clamped branch)
        dUq, dUk = dqn * s_q, dkn * s_k
        proj_q = jnp.where(qq > rms_eps ** 2,
                           jnp.sum(dUq * u_q, -1, keepdims=True), 0.0)
        proj_k = jnp.where(kk > rms_eps ** 2,
                           jnp.sum(dUk * u_k, -1, keepdims=True), 0.0)
        dq_h = (r_q * (dUq - u_q * proj_q)
                ).reshape(blk * n_pad, dim_head).astype(in_dtype)
        dk_h = (r_k * (dUk - u_k * proj_k)
                ).reshape(blk * n_pad, dim_head).astype(in_dtype)
        dv_h = dv.reshape(blk * n_pad, dim_head).astype(in_dtype)
        # per-head weight grads + input-grad accumulation (no dqkv concat)
        dwqkv_ref[0, h] += jax.lax.dot_general(
            xf_c, dq_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (dim, d)
        dwqkv_ref[1, h] += jax.lax.dot_general(
            xf_c, dk_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dwqkv_ref[2, h] += jax.lax.dot_general(
            xf_c, dv_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dxf2 = dxf2 + jax.lax.dot_general(
            dq_h, wqkv_ref[0, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dxf2 = dxf2 + jax.lax.dot_general(
            dk_h, wqkv_ref[1, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dxf2 = dxf2 + jax.lax.dot_general(
            dv_h, wqkv_ref[2, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    dqg_ref[...] += jnp.concatenate(dqg_parts, axis=0)
    dkg_ref[...] += jnp.concatenate(dkg_parts, axis=0)
    dbias_ref[...] += jnp.concatenate(dbias_parts, axis=0)
    _attention_bwd_ln_film(dxf2.reshape(blk, n_pad, dim), xn0,
                           gamma_ref, has_film, r_ln,
                           dx_ref, dgamma_ref, dbeta_ref)


@functools.partial(jax.jit, static_argnums=(6, 7, 8, 10))
def _window_attention_bwd_impl(p, x, cond, bias_indices, dropout_mask, g,
                               heads, windows_per_sample, block_windows,
                               seed, dropout_rate):
    """Run the fused backward kernel and assemble (dp, dx, dcond)."""
    if dropout_mask is not None and dropout_rate > 0.0:
        raise ValueError(
            "pass either an external dropout_mask or an in-kernel "
            "(seed, dropout_rate) pair, not both")
    bw, n, dim = x.shape
    dim_head = p["q_norm"]["gamma"].shape[-1]
    dim_inner = heads * dim_head
    # 8-sublane token padding, matching the forward kernel (53 -> 56; the
    # full bf16 tile rounding measured 14% slower — see the forward impl)
    n_pad = _round_up(n, 8)

    film_vjp = None
    if "film" in p and cond is not None:
        (fg, fb), film_vjp = jax.vjp(
            lambda fp, cc: vnn.film(fp, cc), p["film"], cond)
    gamma, beta, has_film = _prep_gamma_beta(p, cond, x, bw, dim,
                                             windows_per_sample)
    bias = _prep_bias(p, bias_indices, n, n_pad)
    blk = _pick_blk(bw, block_windows)
    x_pad = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
    g_pad = jnp.pad(g, ((0, 0), (0, n_pad - n), (0, 0)))

    grid = (bw // blk,)
    blk_spec = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, {2: lambda i: (i, 0), 3: lambda i: (i, 0, 0),
                4: lambda i: (i, 0, 0, 0)}[len(shape)],
        memory_space=pltpu.VMEM)
    const_spec = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    in_specs = [
        blk_spec(blk, n_pad, dim),
        blk_spec(blk, dim),
        blk_spec(blk, dim),
        pl.BlockSpec(memory_space=pltpu.VMEM),   # wqkv
        pl.BlockSpec(memory_space=pltpu.VMEM),   # q gamma
        pl.BlockSpec(memory_space=pltpu.VMEM),   # k gamma
        pl.BlockSpec(memory_space=pltpu.VMEM),   # wout
        pl.BlockSpec(memory_space=pltpu.VMEM),   # bias
        blk_spec(blk, n_pad, dim),               # dy
    ]
    # same weight-sliced layouts as the forward kernel
    wqkv4 = (p["to_qkv"]["w"].astype(x.dtype)
             .reshape(dim, 3, heads, dim_head).transpose(1, 2, 0, 3))
    wout3 = (p["to_out"]["w"].astype(x.dtype)
             .reshape(heads, dim_head, dim))
    qg = p["q_norm"]["gamma"][:, 0, :].astype(jnp.float32)
    kg = p["k_norm"]["gamma"][:, 0, :].astype(jnp.float32)
    # head-PAIR lane packing, mirroring the forward kernel (weight grads
    # come back in the paired layout and are unpacked below)
    paired = heads % 2 == 0
    if paired:
        pairs, d2 = heads // 2, 2 * dim_head
        wqkv4 = (wqkv4.reshape(3, pairs, 2, dim, dim_head)
                 .transpose(0, 1, 3, 2, 4).reshape(3, pairs, dim, d2))
        wout3 = wout3.reshape(pairs, d2, dim)
        qg = qg.reshape(pairs, d2)
        kg = kg.reshape(pairs, d2)
        bias = (bias.reshape(pairs, 2, n_pad, n_pad)
                .transpose(0, 2, 1, 3).reshape(pairs, n_pad, 2 * n_pad))
    operands = [
        x_pad, gamma.astype(x.dtype), beta.astype(x.dtype),
        wqkv4, qg, kg, wout3, bias,
        g_pad,
    ]
    if dropout_rate > 0.0:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(seed.astype(jnp.int32))
    if dropout_mask is not None:
        mask_pad = jnp.pad(dropout_mask,
                           ((0, 0), (0, 0), (0, n_pad - n), (0, n_pad - n)))
        if paired:
            mask_pad = (mask_pad.reshape(bw, pairs, 2, n_pad, n_pad)
                        .transpose(0, 1, 3, 2, 4)
                        .reshape(bw, pairs, n_pad, 2 * n_pad))
            in_specs.append(blk_spec(blk, pairs, n_pad, 2 * n_pad))
        else:
            in_specs.append(blk_spec(blk, heads, n_pad, n_pad))
        operands.append(mask_pad.astype(x.dtype))

    if paired:
        wq_shape = (3, pairs, dim, d2)
        wo_shape = (pairs, d2, dim)
        qg_shape = (pairs, d2)
        bias_shape = (pairs, n_pad, 2 * n_pad)
    else:
        wq_shape = (3, heads, dim, dim_head)
        wo_shape = (heads, dim_head, dim)
        qg_shape = (heads, dim_head)
        bias_shape = (heads, n_pad, n_pad)
    out_shapes = [
        jax.ShapeDtypeStruct((bw, n_pad, dim), x.dtype),          # dx
        jax.ShapeDtypeStruct((bw, dim), jnp.float32),             # dgamma_w
        jax.ShapeDtypeStruct((bw, dim), jnp.float32),             # dbeta_w
        jax.ShapeDtypeStruct(wq_shape, jnp.float32),              # dwqkv
        jax.ShapeDtypeStruct(wo_shape, jnp.float32),              # dwout
        jax.ShapeDtypeStruct(qg_shape, jnp.float32),              # dqg
        jax.ShapeDtypeStruct(qg_shape, jnp.float32),              # dkg
        jax.ShapeDtypeStruct(bias_shape, jnp.float32),            # dbias
    ]
    out_specs = [
        blk_spec(blk, n_pad, dim),
        blk_spec(blk, dim),
        blk_spec(blk, dim),
        const_spec(*wq_shape),
        const_spec(*wo_shape),
        const_spec(*qg_shape),
        const_spec(*qg_shape),
        const_spec(*bias_shape),
    ]
    (dx_p, dgw, dbw_, dwqkv, dwout, dqg, dkg, dbias_k) = pl.pallas_call(
        functools.partial(
            _attention_bwd_kernel, heads=heads, dim_head=dim_head,
            n_pad=n_pad, blk=blk, has_film=has_film, paired=paired,
            dropout_rate=dropout_rate),
        out_shape=out_shapes,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(*operands)

    dx = dx_p[:, :n, :]
    if paired:
        # paired layouts back to per-head
        dwqkv = (dwqkv.reshape(3, pairs, dim, 2, dim_head)
                 .transpose(0, 1, 3, 2, 4).reshape(3, heads, dim, dim_head))
        dwout = dwout.reshape(heads, dim_head, dim)
        dqg = dqg.reshape(heads, dim_head)
        dkg = dkg.reshape(heads, dim_head)
        dbias_k = (dbias_k.reshape(pairs, n_pad, 2, n_pad)
                   .transpose(0, 2, 1, 3).reshape(heads, n_pad, n_pad))
    # weight grads back to the parameter layouts
    dwqkv = dwqkv.transpose(2, 0, 1, 3).reshape(dim, 3 * dim_inner)
    dwout = dwout.reshape(dim_inner, dim)

    # rel-pos bias table grad: scatter-add of the (n, n, h) cotangent
    table = p["rel_pos_bias"]["table"]
    dtable = jnp.zeros_like(table).at[bias_indices].add(
        dbias_k[:, :n, :n].transpose(1, 2, 0).astype(table.dtype))

    def _like(ref, val):
        return val.astype(ref.dtype)

    dp = {
        "to_qkv": {"w": _like(p["to_qkv"]["w"], dwqkv)},
        "to_out": {"w": _like(p["to_out"]["w"], dwout)},
        "q_norm": {"gamma": _like(p["q_norm"]["gamma"],
                                  dqg[:, None, :])},
        "k_norm": {"gamma": _like(p["k_norm"]["gamma"],
                                  dkg[:, None, :])},
        "rel_pos_bias": {"table": dtable},
    }
    dcond = None
    if "film" in p and cond is not None:
        ng = windows_per_sample
        dfg = dgw.reshape(-1, ng, dim).sum(1)
        dfb = dbw_.reshape(-1, ng, dim).sum(1)
        dfilm, dcond = film_vjp((dfg.astype(fg.dtype), dfb.astype(fb.dtype)))
        dp["film"] = dfilm
        dp["norm"] = {}
    elif "g" in p["norm"]:
        dp["norm"] = {"g": _like(p["norm"]["g"], dgw.sum(0)),
                      "b": _like(p["norm"]["b"], dbw_.sum(0))}
        if "film" in p:
            dp["film"] = jax.tree.map(jnp.zeros_like, p["film"])
    else:
        dp["norm"] = {}
        if "film" in p:
            dp["film"] = jax.tree.map(jnp.zeros_like, p["film"])
    return dp, dx, dcond


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def window_attention_pallas_fused(p, x: Array, cond: Optional[Array],
                                  bias_indices: Array,
                                  dropout_mask: Optional[Array],
                                  seed: Optional[Array],
                                  heads: int = 32,
                                  windows_per_sample: int = 1,
                                  block_windows: int = 8,
                                  dropout_rate: float = 0.0) -> Array:
    """``window_attention_pallas`` with a fused Pallas BACKWARD kernel.

    Same forward as ``window_attention_pallas``; the VJP runs
    ``_attention_bwd_kernel`` (flash-style in-VMEM recompute) instead of
    re-deriving the XLA forward from saved inputs — the training
    configuration (``MetNet3Config.use_pallas_attention_bwd``).

    Attention dropout: pass ``seed`` (int32 (1,)) + static ``dropout_rate``
    to sample the keep-mask inside BOTH kernels with the stateless
    counter-based hash PRNG (a pure function of (seed, window, head, row,
    col) => identical masks by construction), instead of materializing a
    (Bw, heads, n, n) mask in HBM (``dropout_mask`` stays supported for the
    externally-sampled contract).  Gradient numerics: all contractions
    accumulate in f32; bf16 activations see the same MXU rounding as the
    XLA path (parity tests bound both dtypes).
    """
    return _window_attention_fwd_impl(p, x, cond, bias_indices, dropout_mask,
                                      heads, windows_per_sample,
                                      block_windows, seed, dropout_rate,
                                      False)


def _wap_fused_fwd(p, x, cond, bias_indices, dropout_mask, seed, heads,
                   windows_per_sample, block_windows, dropout_rate):
    out = _window_attention_fwd_impl(p, x, cond, bias_indices, dropout_mask,
                                     heads, windows_per_sample,
                                     block_windows, seed, dropout_rate,
                                     False)
    return out, (p, x, cond, bias_indices, dropout_mask, seed)


def _wap_fused_bwd(heads, windows_per_sample, block_windows, dropout_rate,
                   residuals, g):
    p, x, cond, bias_indices, dropout_mask, seed = residuals
    dp, dx, dcond = _window_attention_bwd_impl(
        p, x, cond, bias_indices, dropout_mask, g, heads,
        windows_per_sample, block_windows, seed, dropout_rate)
    dbias = jnp.zeros(bias_indices.shape, dtype=jax.dtypes.float0)
    dmask = (None if dropout_mask is None
             else jnp.zeros_like(dropout_mask))
    dseed = (None if seed is None
             else jnp.zeros(seed.shape, dtype=jax.dtypes.float0))
    return dp, dx, dcond, dbias, dmask, dseed


window_attention_pallas_fused.defvjp(_wap_fused_fwd, _wap_fused_bwd)


def window_attention_pallas_sharded(p, x: Array, cond: Optional[Array],
                                    bias_indices: Array,
                                    dropout_mask: Optional[Array],
                                    seed: Optional[Array],
                                    heads: int,
                                    windows_per_sample: int,
                                    block_windows: int,
                                    dropout_rate: float,
                                    axis: str,
                                    fused: bool = True) -> Array:
    """Multi-chip wrapper: ``shard_map`` the Pallas kernels over the window
    axis of the ambient device mesh (set by the caller via ``jax.set_mesh``).

    GSPMD has no partitioning rule for ``pallas_call`` — under a plain
    ``jit`` over a >1-device mesh the kernel's operands would be
    all-gathered and every chip would run every window.  The windows are
    embarrassingly parallel (SURVEY §5), so manual sharding is trivial:

    * ``x`` (Bw, n, dim) and ``dropout_mask`` shard on dim 0 — sample-major
      window order means contiguous shards hold whole samples as long as
      the sample batch divides the mesh axis (the callers' batch padding
      guarantees this);
    * ``cond`` shards on dim 0 with the same alignment;
    * params and ``bias_indices`` are replicated — the ``shard_map``
      transpose inserts the gradient ``psum`` automatically (verified by
      tests/test_pallas_attention.py sharded-vs-single gradient equality);
    * the dropout ``seed`` is replicated but decorrelated per shard by
      folding in ``lax.axis_index`` — otherwise every chip would sample
      the SAME keep-mask for its local windows, correlating dropout
      across the data-parallel batch.
    """
    from jax.sharding import PartitionSpec as P

    def body(p_, x_, cond_, bias_, mask_, seed_):
        if seed_ is not None:
            seed_ = seed_ + jax.lax.axis_index(axis).astype(jnp.int32) \
                * jnp.int32(0x3C6EF35F)
        if fused:
            return window_attention_pallas_fused(
                p_, x_, cond_, bias_, mask_, seed_, heads,
                windows_per_sample, block_windows, dropout_rate)
        return window_attention_pallas(
            p_, x_, cond_, bias_, mask_, heads, windows_per_sample,
            block_windows)

    in_specs = (jax.tree.map(lambda _: P(), p), P(axis),
                P() if cond is None else P(axis), P(),
                P() if dropout_mask is None else P(axis), P())
    return jax.shard_map(body, in_specs=in_specs, out_specs=P(axis),
                         check_vma=False)(
        p, x, cond, bias_indices, dropout_mask, seed)


def _xla_equivalent(p, x, cond, bias_indices, dropout_mask, heads,
                    windows_per_sample):
    from vit_grid_model_tpu.ops.attention import attention

    return attention(p, x, cond, bias_indices, heads=heads,
                     windows_per_sample=windows_per_sample,
                     dropout_mask=dropout_mask)


def _wap_fwd(p, x, cond, bias_indices, dropout_mask, heads,
             windows_per_sample, block_windows):
    # custom_vjp fwd keeps the primal signature (nondiff args in place)
    out = _window_attention_fwd_impl(p, x, cond, bias_indices, dropout_mask,
                                     heads, windows_per_sample,
                                     block_windows, None, 0.0, False)
    return out, (p, x, cond, bias_indices, dropout_mask)


def _wap_bwd(heads, windows_per_sample, block_windows, residuals, g):
    p, x, cond, bias_indices, dropout_mask = residuals
    # the recompute applies the SAME externally-sampled dropout mask the
    # kernel used, so forward/backward randomness is consistent
    _, vjp = jax.vjp(
        lambda pp, xx, cc: _xla_equivalent(pp, xx, cc, bias_indices,
                                           dropout_mask, heads,
                                           windows_per_sample), p, x, cond)
    dp, dx, dcond = vjp(g)
    # integer bias indices carry a float0 cotangent
    dbias = jnp.zeros(bias_indices.shape, dtype=jax.dtypes.float0)
    dmask = (None if dropout_mask is None
             else jnp.zeros_like(dropout_mask))
    return dp, dx, dcond, dbias, dmask


window_attention_pallas.defvjp(_wap_fwd, _wap_bwd)
