"""Window / grid partitioning for MaxViT block- and grid-attention.

The reference implements these as einops rearranges over NCHW tensors
(``maxvit.py:298,322``).  Here they are pure reshape/transpose ops over NHWC
tensors; XLA fuses them into the surrounding kernels, and because every
window is independent, the (batch, window) axes can be sharded over a device
mesh with zero halo exchange (SURVEY.md §5).

Block partition: 'b (x w1) (y w2) d -> (b x y) (w1 w2) d'  — local windows.
Grid partition:  'b (w1 x) (w2 y) d -> (b x y) (w1 w2) d'  — strided windows
(the outer factor is the window coordinate), giving dilated global mixing.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def block_partition(x: Array, w: int) -> Tuple[Array, Tuple[int, int, int]]:
    """(B, H, W, C) -> ((B*nx*ny), w*w, C) local windows."""
    b, h, wd, c = x.shape
    nx, ny = h // w, wd // w
    x = x.reshape(b, nx, w, ny, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)          # b nx ny w1 w2 c
    return x.reshape(b * nx * ny, w * w, c), (b, nx, ny)


def block_reverse(x: Array, w: int, dims: Tuple[int, int, int]) -> Array:
    b, nx, ny = dims
    c = x.shape[-1]
    x = x.reshape(b, nx, ny, w, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)          # b nx w1 ny w2 c
    return x.reshape(b, nx * w, ny * w, c)


def grid_partition(x: Array, w: int) -> Tuple[Array, Tuple[int, int, int]]:
    """(B, H, W, C) -> ((B*nx*ny), w*w, C) strided (dilated) windows.

    H = w1 * nx with w1 outer (reference ``maxvit.py:322``): token (i, j) of
    window (x, y) sits at pixel (i*nx + x, j*ny + y).
    """
    b, h, wd, c = x.shape
    nx, ny = h // w, wd // w
    x = x.reshape(b, w, nx, w, ny, c)          # b w1 nx w2 ny c
    x = x.transpose(0, 2, 4, 1, 3, 5)          # b nx ny w1 w2 c
    return x.reshape(b * nx * ny, w * w, c), (b, nx, ny)


def grid_reverse(x: Array, w: int, dims: Tuple[int, int, int]) -> Array:
    b, nx, ny = dims
    c = x.shape[-1]
    x = x.reshape(b, nx, ny, w, w, c)
    x = x.transpose(0, 3, 1, 4, 2, 5)          # b w1 nx w2 ny c
    return x.reshape(b, w * nx, w * ny, c)


def relative_position_indices(window_size: int, num_registers: int) -> jnp.ndarray:
    """Relative-position bias lookup table indices for one (registers +
    window) token block, matching ``maxvit.py:160-167``: pairwise 2-D offsets
    mapped to ``(2w-1)^2`` ids, padded on the register rows/cols with the
    sentinel id ``(2w-1)^2`` (one-past-the-end embedding row)."""
    w = window_size
    pos = jnp.arange(w)
    gy, gx = jnp.meshgrid(pos, pos, indexing="ij")
    grid = jnp.stack([gy.reshape(-1), gx.reshape(-1)], axis=-1)  # (w*w, 2)
    rel = grid[:, None, :] - grid[None, :, :] + (w - 1)
    idx = rel[..., 0] * (2 * w - 1) + rel[..., 1]
    sentinel = (2 * w - 1) ** 2
    n = w * w + num_registers
    full = jnp.full((n, n), sentinel, dtype=jnp.int32)
    full = full.at[num_registers:, num_registers:].set(idx.astype(jnp.int32))
    return full
