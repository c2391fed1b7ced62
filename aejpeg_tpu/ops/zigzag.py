"""Zigzag coefficient ordering.

Index tables are generated host-side once per block size (reference
algorithm: src/jpeg/jpeg.py:726-766) and applied on device as static gathers,
which XLA fuses into the surrounding quantize/pack kernels.
"""

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def zigzag_indices(size: int) -> np.ndarray:
    """Indices that flatten a size x size block in zigzag order.

    Walks the standard JPEG zigzag: up-right diagonals from (0,0), bouncing
    off the edges (matches src/jpeg/jpeg.py:726-766 bit-for-bit).
    """
    if not isinstance(size, int) or size < 0:
        raise ValueError("Block size must be a non-negative integer")
    out = np.empty(size * size, dtype=np.int32)
    row = col = 0
    for i in range(size * size):
        out[i] = row * size + col
        if (row + col) % 2 == 0:  # moving up-right
            if col == size - 1:
                row += 1
            elif row == 0:
                col += 1
            else:
                row -= 1
                col += 1
        else:  # moving down-left
            if row == size - 1:
                col += 1
            elif col == 0:
                row += 1
            else:
                row += 1
                col -= 1
    return out


@functools.lru_cache(maxsize=None)
def inverse_zigzag_indices(size: int) -> np.ndarray:
    """Permutation that scatters a zigzag vector back to raster order."""
    zz = zigzag_indices(size)
    inv = np.empty_like(zz)
    inv[zz] = np.arange(size * size, dtype=np.int32)
    return inv


def zigzag_gather(blocks: jnp.ndarray) -> jnp.ndarray:
    """(N, s, s) -> (N, s*s) in zigzag order (device-side static gather)."""
    n, s, _ = blocks.shape
    idx = jnp.asarray(zigzag_indices(s))
    return blocks.reshape(n, s * s)[:, idx]


def zigzag_scatter(vectors: jnp.ndarray, size: int) -> jnp.ndarray:
    """(N, s*s) zigzag vectors -> (N, s, s) raster blocks."""
    n = vectors.shape[0]
    idx = jnp.asarray(inverse_zigzag_indices(size))
    return vectors[:, idx].reshape(n, size, size)


def zigzag_gather_flat(flat: jnp.ndarray, size: int) -> jnp.ndarray:
    """(N, s*s) row-major raster -> (N, s*s) zigzag (stays 2-D: small-minor
    3-D tensors pad up to 32x under TPU tiling)."""
    return flat[:, jnp.asarray(zigzag_indices(size))]


def zigzag_scatter_flat(vectors: jnp.ndarray, size: int) -> jnp.ndarray:
    """(N, s*s) zigzag -> (N, s*s) row-major raster, staying 2-D."""
    return vectors[:, jnp.asarray(inverse_zigzag_indices(size))]


@functools.lru_cache(maxsize=None)
def row_zigzag_indices(size: int, grid_w: int) -> np.ndarray:
    """Fused block-transpose + zigzag index vector (encode direction).

    For a quantized plane row viewed as (gh, s * gw * s) — i.e. the
    (p, gh, s, gw, s) dense-DCT layout flattened over its last three axes —
    one static gather with this (s * gw * s,) vector produces the
    (gh, gw * s * s) layout whose cell c holds that block's s*s zigzag
    coefficients:

        out[c * s*s + k] = in[i(k) * gw*s + c * s + j(k)]

    This replaces the production chain's 5-D transpose PLUS per-row zigzag
    gather (two full relayout passes, the measured stage-B binder) with a
    single wide gather (last axis >= s * gw * s — healthy lane counts on
    TPU).  Bitwise-identical output (pure data movement).
    """
    zz = zigzag_indices(size)
    i_k = (zz // size).astype(np.int64)
    j_k = (zz % size).astype(np.int64)
    c = np.arange(grid_w, dtype=np.int64)
    return (i_k[None, :] * (grid_w * size) + c[:, None] * size
            + j_k[None, :]).reshape(-1).astype(np.int32)


@functools.lru_cache(maxsize=None)
def row_inverse_zigzag_indices(size: int, grid_w: int) -> np.ndarray:
    """Fused inverse-zigzag + block de-transpose (decode direction).

    For a zigzag table row viewed as (gh, gw * s * s), one static gather
    with this (s * gw * s,) vector produces the (gh, s * gw * s) raster
    layout the dense inverse DCT consumes:

        out[i * gw*s + c * s + j] = in[c * s*s + inv(i, j)]
    """
    inv2 = inverse_zigzag_indices(size).reshape(size, size).astype(np.int64)
    c = np.arange(grid_w, dtype=np.int64)
    return (c[None, :, None] * (size * size)
            + inv2[:, None, :]).reshape(-1).astype(np.int32)
