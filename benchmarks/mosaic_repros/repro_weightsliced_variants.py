"""Weight-sliced qkv kernel: the full integration design matrix.

``repro_perhead_weight_gemm`` proved that moving the head split from the
qkv GEMM *output* (96 Mosaic lane slices) to the *weights* (96 small
(R, dim) @ (dim, dim_head) GEMMs indexed via untiled leading ref dims)
beats the shipping structure 10.8 vs 13.6 ms/call.  Before integrating
into the shipping kernel this script measures the remaining decisions at
the same flagship geometry, WITH the output projection included (the
repros above omit it; the shipping kernel ends in a (R, h*d) @ (h*d, dim)
GEMM fed by a 32-way lane concat that the weight-sliced layout could also
eliminate):

* head loop: one pass vs two passes (scores first, then softmax/agg —
  the shipping kernel's +2.3% restructuring);
* output projection: concat head outs + one big GEMM vs per-head
  (R, d) @ (d, dim) GEMMs accumulated in f32 (kills the 32-way concat
  relayout at the cost of 32 small-GEMM issues).

Run: PYTHONPATH=. python benchmarks/mosaic_repros/repro_weightsliced_variants.py
"""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from benchmarks.mosaic_repros import common as C

OUT_DIM = C.DIM


def kernel(x_ref, wqkv_ref, bias_ref, wout_ref, o_ref, *, heads, dim_head,
           blk, n_pad, two_pass, perhead_wout):
    x = x_ref[...]
    dim = x.shape[-1]
    x2d = x.reshape(blk * n_pad, dim)

    def qkv_h(h):
        q = jnp.dot(x2d, wqkv_ref[0, h], preferred_element_type=jnp.float32
                    ).reshape(blk, n_pad, dim_head)
        k = jnp.dot(x2d, wqkv_ref[1, h], preferred_element_type=jnp.float32
                    ).reshape(blk, n_pad, dim_head)
        v = jnp.dot(x2d, wqkv_ref[2, h], preferred_element_type=jnp.float32
                    ).reshape(blk, n_pad, dim_head)
        qn = q * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(q * q, -1, keepdims=True), 1e-24))
        kn = k * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(k * k, -1, keepdims=True), 1e-24))
        sim = jax.lax.dot_general(qn, kn, (((2,), (2,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        return sim + bias_ref[h][None], v

    def soft_agg(sim, v):
        m = jnp.max(sim, -1, keepdims=True)
        e = jnp.exp(sim - m)
        attn = e / jnp.sum(e, -1, keepdims=True)
        return jax.lax.dot_general(
            attn, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    if two_pass:
        svs = [qkv_h(h) for h in range(heads)]
        outs = [soft_agg(s, v) for s, v in svs]
    else:
        outs = []
        for h in range(heads):
            s, v = qkv_h(h)
            outs.append(soft_agg(s, v))

    if perhead_wout:
        acc = jnp.zeros((blk * n_pad, OUT_DIM), jnp.float32)
        for h in range(heads):
            acc = acc + jnp.dot(
                outs[h].astype(x.dtype).reshape(blk * n_pad, dim_head),
                wout_ref[h], preferred_element_type=jnp.float32)
        y = acc
    else:
        cat = jnp.concatenate(outs, -1).astype(x.dtype)
        y = jnp.dot(cat.reshape(blk * n_pad, heads * dim_head),
                    wout_ref[...].reshape(heads * dim_head, OUT_DIM),
                    preferred_element_type=jnp.float32)
    o_ref[...] = y.reshape(blk, n_pad, OUT_DIM).astype(o_ref.dtype)


def baseline_kernel(x_ref, wqkv_ref, bias_ref, wout_ref, o_ref, *, heads,
                    dim_head, blk, n_pad):
    """The shipping structure incl. wout: big qkv GEMM + 96 lane slices,
    two-pass head loop, concat + big out GEMM."""
    x = x_ref[...]
    dim = x.shape[-1]
    qkv = jnp.dot(x.reshape(blk * n_pad, dim), wqkv_ref[...],
                  preferred_element_type=jnp.float32)
    dim_inner = heads * dim_head
    sims, vs = [], []
    for h in range(heads):
        q = qkv[:, h * dim_head:(h + 1) * dim_head
                ].reshape(blk, n_pad, dim_head)
        k = qkv[:, dim_inner + h * dim_head:
                dim_inner + (h + 1) * dim_head].reshape(blk, n_pad, dim_head)
        v = qkv[:, 2 * dim_inner + h * dim_head:
                2 * dim_inner + (h + 1) * dim_head
                ].reshape(blk, n_pad, dim_head)
        qn = q * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(q * q, -1, keepdims=True), 1e-24))
        kn = k * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(k * k, -1, keepdims=True), 1e-24))
        sim = jax.lax.dot_general(qn, kn, (((2,), (2,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        sims.append(sim + bias_ref[h][None])
        vs.append(v)
    outs = []
    for h in range(heads):
        m = jnp.max(sims[h], -1, keepdims=True)
        e = jnp.exp(sims[h] - m)
        attn = e / jnp.sum(e, -1, keepdims=True)
        outs.append(jax.lax.dot_general(
            attn, vs[h], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
    cat = jnp.concatenate(outs, -1).astype(x.dtype)
    y = jnp.dot(cat.reshape(blk * n_pad, heads * dim_head),
                wout_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = y.reshape(blk, n_pad, OUT_DIM).astype(o_ref.dtype)


def build(variant, blk=C.BLK, vmem_mb=64):
    kwargs = {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=vmem_mb * 1024 * 1024)}
    out_spec = pl.BlockSpec((blk, C.N_PAD, OUT_DIM), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((C.BW, C.N_PAD, OUT_DIM), jnp.bfloat16)
    x_spec = pl.BlockSpec((blk, C.N_PAD, C.DIM), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    if variant == "baseline":
        def fn(x, wqkv, bias, wout):
            return pl.pallas_call(
                functools.partial(baseline_kernel, heads=C.HEADS,
                                  dim_head=C.DIM_HEAD, blk=blk,
                                  n_pad=C.N_PAD),
                grid=(C.BW // blk,),
                in_specs=[x_spec, full, full, full],
                out_specs=out_spec, out_shape=out_shape, **kwargs,
            )(x, wqkv, bias, wout.reshape(C.HEADS * C.DIM_HEAD, OUT_DIM))
        return fn

    two_pass = "2pass" in variant
    perhead_wout = "pwout" in variant

    def fn(x, wqkv, bias, wout):
        w4 = wqkv.reshape(C.DIM, 3, C.HEADS, C.DIM_HEAD).transpose(1, 2, 0, 3)
        return pl.pallas_call(
            functools.partial(kernel, heads=C.HEADS, dim_head=C.DIM_HEAD,
                              blk=blk, n_pad=C.N_PAD, two_pass=two_pass,
                              perhead_wout=perhead_wout),
            grid=(C.BW // blk,),
            in_specs=[x_spec, full, full, full],
            out_specs=out_spec, out_shape=out_shape, **kwargs,
        )(x, w4, bias,
          wout if perhead_wout
          else wout.reshape(C.HEADS * C.DIM_HEAD, OUT_DIM))
    return fn


if __name__ == "__main__":
    x, wqkv, bias = C.inputs()
    wout = (jax.random.normal(jax.random.PRNGKey(7),
                              (C.HEADS, C.DIM_HEAD, OUT_DIM), jnp.bfloat16)
            * 0.05)
    for variant in ["baseline", "ws_1pass", "ws_2pass",
                    "ws_1pass_pwout", "ws_2pass_pwout"]:
        C.run_repro(f"{variant} (blk=8, wout incl.)", build(variant),
                    x, wqkv, bias, wout)
