"""Shared harness for the Mosaic-ceiling repro scripts.

Each repro builds a minimal pallas kernel embodying ONE restructuring of the
window-attention kernel that round 2 reported as crashing (or untried) on
this Mosaic toolchain, runs it at the flagship eval geometry, and prints
either OK + a per-call time or the captured compiler error — so the ~16%
MFU "practical ceiling" claim (docs/RESULTS.md) is re-testable by anyone,
including on future toolchains.

Geometry: 2880 windows x 56 padded tokens x 32 heads x 32 dim_head,
dim 128 (the shipped 12hr eval batch, ops/pallas/attention.py).
"""

from __future__ import annotations

import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp

BW = 2880          # windows per attention call (eval B=8)
N_PAD = 56         # padded tokens per window
DIM = 128
HEADS = 32
DIM_HEAD = 32
BLK = 8            # windows per program (shipping kernel)


def inputs(blk=BLK, dtype=jnp.bfloat16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = jax.random.normal(ks[0], (BW, N_PAD, DIM), dtype)
    wqkv = jax.random.normal(ks[1], (DIM, 3 * HEADS * DIM_HEAD), dtype) * 0.05
    bias = jax.random.normal(ks[2], (HEADS, N_PAD, N_PAD), jnp.float32)
    return x, wqkv, bias


def run_repro(name: str, fn, *args, steps: int = 20, warmup: int = 6):
    """Compile + time `fn(*args)`; print OK/CRASH with the captured error.

    Returns True when the variant compiles and runs.  Timing uses a host
    readback (the axon relay's block_until_ready does not synchronize) and
    discards the lazy-upload warmup executions (docs/RESULTS.md hazard).
    """
    print(f"=== {name} ===", flush=True)
    try:
        jfn = jax.jit(fn)
        out = jfn(*args)
        _ = float(jnp.sum(out.astype(jnp.float32)))
        for _ in range(warmup):
            out = jfn(*args)
        _ = float(jnp.sum(out.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(steps):
            out = jfn(*args)
        _ = float(jnp.sum(out.astype(jnp.float32)))
        ms = (time.perf_counter() - t0) / steps * 1e3
        print(f"OK: {ms:.2f} ms/call  out={tuple(out.shape)} "
              f"finite={bool(np.isfinite(np.asarray(out, np.float32)).all())}",
              flush=True)
        return ms
    except Exception:
        print("CRASH:\n" + traceback.format_exc(limit=4), flush=True)
        return None
