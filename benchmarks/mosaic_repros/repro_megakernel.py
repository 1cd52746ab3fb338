"""Round-3 probe: block + grid attention of one MaxViT layer as ONE kernel.

One sample-lead's ENTIRE feature map (42x35x128 bf16 = 376KB) fits in VMEM,
so one program can run: block-partition -> block attention (+residual) ->
register mean -> block-reverse -> grid-partition -> grid attention
(+residual) -> grid-reverse — with NO HBM round-trip between the two
attentions, no XLA repartition glue, and 96 programs instead of 720
(2 calls x 360 tiles).  The per-head work also amortizes over 1920-row
arrays instead of 512-row tiles.

Semantics mirror `_attention_kernel` + `models/maxvit.py::_attend_windows`
for one layer (LN -> FiLM -> qkv -> QK-RMSNorm -> bias -> softmax -> agg ->
out-proj, registers ++ window tokens, residual outside the attention,
register mean between block and grid).  Numerics are checked against the
shipping two-call path in this script.

Geometry: the flagship 12hr eval forward — 96 sample-leads (B=8 x 12
leads), 42x35 map, w=7 (30 windows x 49 tokens + 4 registers, padded to
64), 32 heads x 32 dim_head, dim 128.

Run: PYTHONPATH=. python benchmarks/mosaic_repros/repro_megakernel.py
"""
import functools
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from benchmarks.mosaic_repros import common as C  # noqa: E402
from vit_grid_model_tpu.ops.attention import attention_init  # noqa: E402
from vit_grid_model_tpu.ops import nn as vnn  # noqa: E402
from vit_grid_model_tpu.ops import window as W  # noqa: E402
from vit_grid_model_tpu.ops.pallas.attention import (  # noqa: E402
    window_attention_pallas, _prep_bias)

S = 96            # sample-leads (B=8 x 12 leads)
H, Wd = 42, 35    # post-stem map
WIN = 7
NX, NY = H // WIN, Wd // WIN          # 6, 5
NWIN = NX * NY                        # 30
NR = 4
N = WIN * WIN + NR                    # 53
N_PAD = 64
DIM = 128
HEADS = 32
DIM_HEAD = 32
COND = 32
LN_EPS = 1e-5
RMS_EPS = 1e-12


ONE_PASS = "--one-pass" in sys.argv   # fallback: halves live VMEM (no
                                      # all-heads sims list) if the
                                      # two-pass body hangs the compiler
FORI = "--fori" in sys.argv           # fallback: fori_loop over head CHUNKS
                                      # with per-chunk LEADING-axis weight
                                      # tensors (no dynamic lane slicing,
                                      # which Mosaic cannot do) — shrinks
                                      # the unrolled 64-head-block program
                                      # that hangs the compiler by
                                      # HEADS/CHUNK per attention
# heads unrolled per fori iteration; 1 = fully serial (measured 0.63x:
# rank-32 out-projections starve the MXU), 8 = the sweet spot candidate
CHUNK = (int(sys.argv[sys.argv.index("--chunk") + 1])
         if "--chunk" in sys.argv else 8)


def _attn_inner(tokens, gamma, beta, wqkv, qg, kg, wout, bias, in_dtype):
    """Two-pass per-head attention over (NWIN, N_PAD, DIM) f32 tokens —
    the shipping kernel's math at the mega tile size.

    ``wqkv``/``qg``/``kg``/``wout``/``bias`` are passed as REFS: the FORI
    branch indexes them with the loop head index (a dynamic leading-dim
    VMEM load — the only dynamic indexing Mosaic supports), the unrolled
    branches load them whole."""
    mean = jnp.mean(tokens, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(tokens - mean), axis=-1, keepdims=True)
    xn = (tokens - mean) * jax.lax.rsqrt(var + LN_EPS)
    xn = xn * gamma[None, None, :] + beta[None, None, :]
    scale = DIM_HEAD ** 0.5

    if FORI:
        # fori_loop over head CHUNKS: weights arrive as per-chunk
        # LEADING-axis tensors (wqkv (NC, DIM, 3*CH*DH), wout
        # (NC, CH*DH, DIM), qg/kg (NC, 1, CH*DH), bias
        # (NC, CH, N_PAD, N_PAD)) and are indexed as REFS — `ref[c]` on
        # an untiled leading dim lowers to a dynamic VMEM load, whereas
        # dynamic_slice on a loaded array has no Mosaic lowering at all
        # ("Unimplemented primitive ... dynamic_slice").  Within a chunk
        # the CH heads are unrolled with STATIC lane slices, keeping the
        # qkv and out-projection GEMMs MXU-sized; the per-chunk partial
        # sums into y replace the all-heads concat + one projection
        # (identical math, different float-add order).
        xf = xn.astype(in_dtype).reshape(NWIN * N_PAD, DIM)
        nc = HEADS // CHUNK
        cd = CHUNK * DIM_HEAD

        def body(c, y):
            qkv = jnp.dot(xf, wqkv[c], preferred_element_type=jnp.float32)
            qg_c, kg_c, bias_c = qg[c], kg[c], bias[c]
            outs = []
            for j in range(CHUNK):
                s = j * DIM_HEAD
                q = qkv[:, s:s + DIM_HEAD].reshape(NWIN, N_PAD, DIM_HEAD)
                k = qkv[:, cd + s:cd + s + DIM_HEAD
                        ].reshape(NWIN, N_PAD, DIM_HEAD)
                v = qkv[:, 2 * cd + s:2 * cd + s + DIM_HEAD
                        ].reshape(NWIN, N_PAD, DIM_HEAD)
                qn = q * jax.lax.rsqrt(jnp.maximum(
                    jnp.sum(q * q, -1, keepdims=True), RMS_EPS ** 2))
                kn = k * jax.lax.rsqrt(jnp.maximum(
                    jnp.sum(k * k, -1, keepdims=True), RMS_EPS ** 2))
                qn = qn * (scale * qg_c[0, s:s + DIM_HEAD])
                kn = kn * (scale * kg_c[0, s:s + DIM_HEAD])
                sim = jax.lax.dot_general(
                    qn, kn, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                sim = sim + bias_c[j][None]
                m = jnp.max(sim, axis=-1, keepdims=True)
                e = jnp.exp(sim - m)
                attn = e / jnp.sum(e, axis=-1, keepdims=True)
                outs.append(jax.lax.dot_general(
                    attn, v, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32))
            oc = jnp.concatenate(outs, axis=-1).astype(in_dtype)
            return y + jnp.dot(oc.reshape(NWIN * N_PAD, cd), wout[c],
                               preferred_element_type=jnp.float32)

        y = jax.lax.fori_loop(
            0, nc, body, jnp.zeros((NWIN * N_PAD, DIM), jnp.float32))
        return y.reshape(NWIN, N_PAD, DIM)

    wqkv, qg, kg = wqkv[...], qg[...], kg[...]
    wout, bias = wout[...], bias[...]
    qkv = jnp.dot(xn.astype(in_dtype).reshape(NWIN * N_PAD, DIM), wqkv,
                  preferred_element_type=jnp.float32)
    dim_inner = HEADS * DIM_HEAD
    def head_qkv(h):
        q = qkv[:, h * DIM_HEAD:(h + 1) * DIM_HEAD
                ].reshape(NWIN, N_PAD, DIM_HEAD)
        k = qkv[:, dim_inner + h * DIM_HEAD:
                dim_inner + (h + 1) * DIM_HEAD].reshape(NWIN, N_PAD, DIM_HEAD)
        v = qkv[:, 2 * dim_inner + h * DIM_HEAD:
                2 * dim_inner + (h + 1) * DIM_HEAD
                ].reshape(NWIN, N_PAD, DIM_HEAD)
        return q, k, v

    def head_sim(h, q, k):
        qn = q * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(q * q, -1, keepdims=True), RMS_EPS ** 2))
        kn = k * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(k * k, -1, keepdims=True), RMS_EPS ** 2))
        qn = qn * (scale * qg[h])
        kn = kn * (scale * kg[h])
        sim = jax.lax.dot_general(
            qn, kn, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return sim + bias[h][None]

    def head_agg(sim, v):
        m = jnp.max(sim, axis=-1, keepdims=True)
        e = jnp.exp(sim - m)
        attn = e / jnp.sum(e, axis=-1, keepdims=True)
        return jax.lax.dot_general(
            attn, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    if ONE_PASS:
        outs = []
        for h in range(HEADS):
            q, k, v = head_qkv(h)
            outs.append(head_agg(head_sim(h, q, k), v))
    else:
        sims, vs = [], []
        for h in range(HEADS):
            q, k, v = head_qkv(h)
            sims.append(head_sim(h, q, k))
            vs.append(v)
        outs = [head_agg(sims[h], vs[h]) for h in range(HEADS)]
    out = jnp.concatenate(outs, axis=-1)
    y = jnp.dot(out.astype(in_dtype).reshape(NWIN * N_PAD, HEADS * DIM_HEAD),
                wout, preferred_element_type=jnp.float32)
    return y.reshape(NWIN, N_PAD, DIM)


def kernel(x_ref, reg_ref, g1_ref, b1_ref, wqkv1_ref, qg1_ref, kg1_ref,
           wout1_ref, bias1_ref, g2_ref, b2_ref, wqkv2_ref, qg2_ref,
           kg2_ref, wout2_ref, bias2_ref, o_ref):
    in_dtype = x_ref.dtype
    xm = x_ref[0].astype(jnp.float32)                      # (H, Wd, DIM)

    # ---- block partition (b nx w1 ny w2 c -> windows) ----
    xb = xm.reshape(NX, WIN, NY, WIN, DIM).transpose(0, 2, 1, 3, 4)
    xb = xb.reshape(NWIN, WIN * WIN, DIM)
    reg = jnp.broadcast_to(reg_ref[...].astype(jnp.float32),
                           (NWIN, NR, DIM))
    tokens = jnp.concatenate([reg, xb], axis=1)            # (NWIN, N, DIM)
    tokens = jnp.pad(tokens, ((0, 0), (0, N_PAD - N), (0, 0)))

    y = _attn_inner(tokens, g1_ref[0, 0].astype(jnp.float32),
                    b1_ref[0, 0].astype(jnp.float32), wqkv1_ref,
                    qg1_ref, kg1_ref, wout1_ref, bias1_ref, in_dtype)
    tokens = y + tokens                                    # residual

    # ---- register mean across this sample-lead's windows ----
    reg2 = jnp.mean(tokens[:, :NR, :], axis=0)             # (NR, DIM)

    # ---- block reverse -> map -> grid partition ----
    xm2 = tokens[:, NR:N, :].reshape(NX, NY, WIN, WIN, DIM)
    xm2 = xm2.transpose(0, 2, 1, 3, 4).reshape(H, Wd, DIM)
    xg = xm2.reshape(WIN, NX, WIN, NY, DIM).transpose(1, 3, 0, 2, 4)
    xg = xg.reshape(NWIN, WIN * WIN, DIM)
    tokens2 = jnp.concatenate(
        [jnp.broadcast_to(reg2, (NWIN, NR, DIM)), xg], axis=1)
    tokens2 = jnp.pad(tokens2, ((0, 0), (0, N_PAD - N), (0, 0)))

    y2 = _attn_inner(tokens2, g2_ref[0, 0].astype(jnp.float32),
                     b2_ref[0, 0].astype(jnp.float32), wqkv2_ref,
                     qg2_ref, kg2_ref, wout2_ref, bias2_ref, in_dtype)
    tokens2 = y2 + tokens2

    # ---- grid reverse ----
    xm3 = tokens2[:, NR:N, :].reshape(NX, NY, WIN, WIN, DIM)
    xm3 = xm3.transpose(2, 0, 3, 1, 4).reshape(H, Wd, DIM)
    o_ref[0] = xm3.astype(o_ref.dtype)


def build(pb, pg, regs, cond, vmem_mb=110):
    """Return fn(x_maps) running the mega kernel over all S sample-leads."""
    g1, b1 = vnn.film(pb["film"], cond)
    g2, b2 = vnn.film(pg["film"], cond)
    bias_idx = W.relative_position_indices(WIN, NR)
    bias1 = _prep_bias(pb, bias_idx, N, N_PAD)
    bias2 = _prep_bias(pg, bias_idx, N, N_PAD)
    if FORI:   # per-chunk leading axis, indexed bias_ref[c] in-kernel
        bias1 = bias1.reshape(HEADS // CHUNK, CHUNK, N_PAD, N_PAD)
        bias2 = bias2.reshape(HEADS // CHUNK, CHUNK, N_PAD, N_PAD)
    dt = jnp.bfloat16

    def per_attn_ops(p, g, b):
        # (S, 1, DIM): Mosaic needs the last two block dims divisible by
        # (8, 128) or equal to the array dims — (1, DIM) blocks of an
        # (S, DIM) array violate the sublane rule, (1, 1, DIM) of
        # (S, 1, DIM) satisfies it
        if FORI:
            # per-chunk leading-axis layouts (see _attn_inner FORI branch)
            di = HEADS * DIM_HEAD
            nc, cd = HEADS // CHUNK, CHUNK * DIM_HEAD
            w = p["to_qkv"]["w"]
            wq, wk, wv = (w[:, i * di:(i + 1) * di].reshape(DIM, nc, cd)
                          for i in range(3))
            w3 = jnp.concatenate([wq, wk, wv], -1).transpose(1, 0, 2)
            wo = p["to_out"]["w"].reshape(nc, cd, DIM)
            return [g.astype(dt)[:, None, :], b.astype(dt)[:, None, :],
                    w3.astype(dt),
                    p["q_norm"]["gamma"].reshape(nc, 1, cd
                                                 ).astype(jnp.float32),
                    p["k_norm"]["gamma"].reshape(nc, 1, cd
                                                 ).astype(jnp.float32),
                    wo.astype(dt)]
        return [g.astype(dt)[:, None, :], b.astype(dt)[:, None, :],
                p["to_qkv"]["w"].astype(dt),
                p["q_norm"]["gamma"][:, 0, :].astype(jnp.float32),
                p["k_norm"]["gamma"][:, 0, :].astype(jnp.float32),
                p["to_out"]["w"].astype(dt)]

    sm = pl.BlockSpec((1, 1, DIM), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec((1, H, Wd, DIM), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM), full,
                sm, sm, full, full, full, full, full,
                sm, sm, full, full, full, full, full]
    operands = ([regs.astype(dt)] + per_attn_ops(pb, g1, b1) + [bias1]
                + per_attn_ops(pg, g2, b2) + [bias2])

    def fn(x):
        return pl.pallas_call(
            kernel,
            grid=(S,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, H, Wd, DIM), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, H, Wd, DIM), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_mb * 1024 * 1024),
            interpret="--interpret" in sys.argv,
        )(x, *operands)
    return fn


def build_baseline(pb, pg, regs, cond):
    """The shipping path: two `window_attention_pallas` calls + XLA glue."""
    bias_idx = W.relative_position_indices(WIN, NR)

    def fn(x):
        xw, dims = W.block_partition(x, WIN)
        r = jnp.broadcast_to(regs.astype(x.dtype), (xw.shape[0], NR, DIM))
        tokens = jnp.concatenate([r, xw], axis=1)
        out = window_attention_pallas(pb, tokens, cond, bias_idx, None,
                                      HEADS, NWIN)
        tokens = out + tokens
        x2 = W.block_reverse(tokens[:, NR:], WIN, dims)
        r2 = tokens[:, :NR].reshape(S, NWIN, NR, DIM).mean(axis=1)
        xg, dims = W.grid_partition(x2, WIN)
        r2 = jnp.repeat(r2, NWIN, axis=0)
        tokens2 = jnp.concatenate([r2, xg], axis=1)
        out2 = window_attention_pallas(pg, tokens2, cond, bias_idx, None,
                                       HEADS, NWIN)
        tokens2 = out2 + tokens2
        return W.grid_reverse(tokens2[:, NR:], WIN, dims)
    return fn


if __name__ == "__main__":
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    pb = attention_init(ks[0], DIM, cond_dim=COND, heads=HEADS,
                        dim_head=DIM_HEAD, window_size=WIN,
                        num_registers=NR)
    pg = attention_init(ks[1], DIM, cond_dim=COND, heads=HEADS,
                        dim_head=DIM_HEAD, window_size=WIN,
                        num_registers=NR)
    regs = jax.random.normal(ks[2], (NR, DIM))
    cond = jax.random.normal(ks[3], (S, COND))
    x = (jax.random.normal(ks[4], (S, H, Wd, DIM)) * 0.5).astype(jnp.bfloat16)

    t_base = C.run_repro("baseline: 2 pallas calls + XLA repartition",
                         build_baseline(pb, pg, regs, cond), x)
    t_mega = C.run_repro("mega kernel: one program per sample-lead",
                         build(pb, pg, regs, cond), x)
    if t_base and t_mega:
        yb = jax.jit(build_baseline(pb, pg, regs, cond))(x)
        ym = jax.jit(build(pb, pg, regs, cond))(x)
        d = float(jnp.max(jnp.abs(yb.astype(jnp.float32)
                                  - ym.astype(jnp.float32))))
        ref = float(jnp.max(jnp.abs(yb.astype(jnp.float32))))
        print(f"numerics: max abs diff {d:.3e} (max |baseline| {ref:.3e})")
        print(f"speedup: {t_base / t_mega:.2f}x")
