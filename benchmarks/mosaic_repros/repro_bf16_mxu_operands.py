"""Score/aggregation dot operand dtype: f32 vs bf16 on the MXU.

The shipping weight-sliced kernel (ops/pallas/attention.py) runs its four
per-head dots with these operand dtypes:

* qkv GEMMs:      bf16 @ bf16 -> f32   (full MXU rate)
* score dot:      f32(qn) @ f32(kn)    <- RMSNorm output stays f32
* aggregation:    f32(attn) @ f32(v)   <- softmax output stays f32
* out projection: bf16 @ bf16 -> f32

f32 MXU operands decompose into multiple bf16 passes on this hardware, so
the two middle dots (~20% of the kernel's FLOPs) may be paying a 3-6x rate
penalty.  The XLA path feeds bf16 into BOTH of those dots
(ops/attention.py:92-105 — q/k are bf16 after qk_rms_norm and
``attn = softmax(sim).astype(v.dtype)``), so casting the kernel's operands
to the input dtype also moves the kernel CLOSER to XLA-path numerics.

Variants at the flagship eval geometry (2880x56x32x32, ws_2pass_pwout
structure == shipping):

* f32_dots       — shipping behavior
* bf16_score     — qn/kn cast to in_dtype before the score dot
* bf16_agg       — attn/v cast to in_dtype before the aggregation dot
* bf16_both      — both casts

Run: PYTHONPATH=. python benchmarks/mosaic_repros/repro_bf16_mxu_operands.py
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
           blk, n_pad, bf16_score, bf16_agg):
    x = x_ref[...]
    in_dtype = x.dtype
    dim = x.shape[-1]
    x2d = x.reshape(blk * n_pad, dim)

    sims, vs = [], []
    for h in range(heads):
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
        if bf16_score:
            qn, kn = qn.astype(in_dtype), kn.astype(in_dtype)
        sim = jax.lax.dot_general(qn, kn, (((2,), (2,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        sims.append(sim + bias_ref[h][None])
        vs.append(v.astype(in_dtype) if bf16_agg else v)

    acc = jnp.zeros((blk * n_pad, OUT_DIM), jnp.float32)
    for h in range(heads):
        m = jnp.max(sims[h], -1, keepdims=True)
        e = jnp.exp(sims[h] - m)
        attn = e / jnp.sum(e, -1, keepdims=True)
        if bf16_agg:
            attn = attn.astype(in_dtype)
        o_h = jax.lax.dot_general(
            attn, vs[h], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(
            o_h.astype(in_dtype).reshape(blk * n_pad, dim_head),
            wout_ref[h], preferred_element_type=jnp.float32)
    o_ref[...] = acc.reshape(blk, n_pad, OUT_DIM).astype(o_ref.dtype)


def build(bf16_score, bf16_agg, blk=C.BLK):
    out_spec = pl.BlockSpec((blk, C.N_PAD, OUT_DIM), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((C.BW, C.N_PAD, OUT_DIM), jnp.bfloat16)
    x_spec = pl.BlockSpec((blk, C.N_PAD, C.DIM), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    def fn(x, wqkv, bias, wout):
        w4 = wqkv.reshape(C.DIM, 3, C.HEADS, C.DIM_HEAD).transpose(1, 2, 0, 3)
        return pl.pallas_call(
            functools.partial(kernel, heads=C.HEADS, dim_head=C.DIM_HEAD,
                              blk=blk, n_pad=C.N_PAD, bf16_score=bf16_score,
                              bf16_agg=bf16_agg),
            grid=(C.BW // blk,),
            in_specs=[x_spec, full, full, full],
            out_specs=out_spec, out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(x, w4, bias, wout)
    return fn


if __name__ == "__main__":
    x, wqkv, bias = C.inputs()
    wout = (jax.random.normal(jax.random.PRNGKey(7),
                              (C.HEADS, C.DIM_HEAD, OUT_DIM), jnp.bfloat16)
            * 0.05)
    for name, (s, a) in [("f32_dots (shipping)", (False, False)),
                         ("bf16_score", (True, False)),
                         ("bf16_agg", (False, True)),
                         ("bf16_both", (True, True))]:
        C.run_repro(name, build(s, a), x, wqkv, bias, wout)
