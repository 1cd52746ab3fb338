"""resnet2-stage conv: XLA conv lowering vs an explicit 9-shift GEMM.

With the attention kernel at 7.9 ms/call, the conditioned resnet2 stage
(two FiLM resnet blocks = four 3x3 SAME convs of 128->128 channels at
84x70, B*L=96) is the next-largest forward stage (10.6 ms at 34% MFU,
docs/RESULTS.md).  A 3x3 conv over 128 channels is arithmetically nine
(R, 128) @ (128, 128) GEMMs — exactly the MXU tile — accumulated over
shifted views.  This repro A/Bs XLA's conv_general_dilated lowering
against that explicit shift-GEMM formulation (as XLA ops, padded once and
statically sliced, so XLA can fuse the shifts) to see whether the conv
lowering leaves MXU throughput on the table at this geometry.

Run: PYTHONPATH=. python benchmarks/mosaic_repros/repro_conv_vs_shiftgemm.py
"""
import sys

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")
from benchmarks.mosaic_repros import common as C

B, H, W, CH = 96, 84, 70, 128   # resnet2 geometry (B*L, padded grid, dim)


def conv_xla(x, w):
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_shiftgemm(x, w):
    """y[n,i,j,o] = sum_{di,dj} x_pad[n,i+di,j+dj,:] @ w[di,dj,:,:]."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jnp.zeros((B, H, W, CH), jnp.float32)
    for di in range(3):
        for dj in range(3):
            xs = lax.slice(xp, (0, di, dj, 0), (B, di + H, dj + W, CH))
            y = y + jnp.dot(xs.reshape(B * H * W, CH), w[di, dj],
                            preferred_element_type=jnp.float32
                            ).reshape(B, H, W, CH)
    return y.astype(x.dtype)


if __name__ == "__main__":
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    x = jax.random.normal(ks[0], (B, H, W, CH), jnp.bfloat16)
    w = jax.random.normal(ks[1], (3, 3, CH, CH), jnp.bfloat16) * 0.05

    import numpy as np
    ya = jax.jit(conv_xla)(x, w)
    yb = jax.jit(conv_shiftgemm)(x, w)
    rel = float(np.abs(np.asarray(ya, np.float32) - np.asarray(yb, np.float32)
                       ).max() / (np.abs(np.asarray(ya, np.float32)).max()
                                  + 1e-9))
    print(f"agreement rel={rel:.2e}")

    C.run_repro("XLA conv_general_dilated (resnet2 geom)", conv_xla, x, w)
    C.run_repro("explicit 9-shift GEMM (resnet2 geom)", conv_shiftgemm, x, w)
