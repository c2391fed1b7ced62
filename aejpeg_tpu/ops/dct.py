"""DCT-II / DCT-III as dense matmuls (the MXU hot path).

The reference calls cv.dct/cv.idct per block in a Python loop
(src/jpeg/jpeg.py:461-483).  Here each same-size bucket of blocks becomes one
batched einsum `D @ X @ D^T` that XLA maps straight onto the MXU.  The
orthonormal DCT matrix matches OpenCV's definition:
    D[k, n] = a_k * cos(pi * (2n + 1) * k / (2N)),
    a_0 = sqrt(1/N), a_k = sqrt(2/N).
Matrices are computed in float64 on host and cast once, and matmuls run at
HIGHEST precision so f32 accuracy survives the MXU.
"""

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def dct_matrix(size: int) -> np.ndarray:
    n = np.arange(size, dtype=np.float64)
    k = n[:, None]
    d = np.cos(np.pi * (2 * n[None, :] + 1) * k / (2 * size))
    d *= np.sqrt(2.0 / size)
    d[0, :] = np.sqrt(1.0 / size)
    return d.astype(np.float32)


# Up to this block size the 2-D DCT runs as ONE (n, s^2) @ (s^2, s^2)
# matmul with the Kronecker-product matrix: small-minor-dim (n, s, s)
# tensors tile to (8, 128) on TPU with up to 32x memory padding, so the
# flat form is both the fast and the memory-sane layout.  Above it the
# s^4 kron FLOPs and the (s^2)^2 matrix stop paying for themselves and
# the separable two-matmul form is used ((s, s) >= the native tile).
KRON_MAX = 32


@functools.lru_cache(maxsize=None)
def _kron_matrix(size: int, inverse: bool) -> np.ndarray:
    """K such that vec(DCT2(X)) = vec(X) @ K (row-major vec), in f64."""
    d = np.arange(size, dtype=np.float64)
    k = d[:, None]
    m = np.cos(np.pi * (2 * d[None, :] + 1) * k / (2 * size))
    m *= np.sqrt(2.0 / size)
    m[0, :] = np.sqrt(1.0 / size)
    # forward: Y = D X D^T -> vec(Y)[k*s+l] = sum_ij X[i,j] D[k,i] D[l,j]
    #   -> K = kron(D, D)^T;  inverse: X = D^T C D -> K = kron(D, D)
    kron = np.kron(m, m)
    return (kron if inverse else kron.T).astype(np.float32)


TILE = 8  # shared space-to-depth tile: every quadtree leaf >= 8 is a
          # whole multiple of it, and 4x4 sibling quads fill one tile


@functools.lru_cache(maxsize=None)
def tiled_zigzag_matrix(size: int) -> np.ndarray:
    """((size/8)^2 * 64, size^2) f32 mapping a size-s block — given as its
    raster-ordered 8x8 subtiles, each subtile flattened row-major (the
    shared space-to-depth layout) — straight to its ZIGZAG-ordered DCT-II.

    This folds three steps (subtile->raster permutation, Kronecker 2-D DCT,
    zigzag gather) into one MXU matmul, so a bucket never materializes the
    raster layout and never runs a per-lane zigzag gather."""
    from .zigzag import zigzag_indices
    assert size % TILE == 0
    k = size // TILE
    m = _kron_matrix(size, inverse=False)            # rows = raster pos
    p = np.arange(size * size)
    t, within = p // 64, p % 64
    r = (t // k) * 8 + within // 8
    c = (t % k) * 8 + within % 8
    return np.ascontiguousarray(m[r * size + c][:, zigzag_indices(size)])


@functools.lru_cache(maxsize=None)
def quad4_zigzag_matrix() -> np.ndarray:
    """(64, 64) f32 mapping one raster-flattened 8x8 tile to the
    concatenated zigzag-ordered 4x4 DCT-IIs of its TL,TR,BL,BR quadrants —
    the preorder coefficient layout of a fully-split sibling quad of 4x4
    leaves (4x4 leaves always come in such quads away from the image
    boundary: a split 8-node's children cannot split further)."""
    from .zigzag import zigzag_indices
    k4 = _kron_matrix(4, inverse=False)              # (16, 16)
    zz = zigzag_indices(4)
    out = np.zeros((64, 64), np.float32)
    for q, (qr, qc) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        i = np.arange(4)
        inpos = ((qr * 4 + i)[:, None] * 8 + (qc * 4 + i)[None, :]).ravel()
        out[inpos, q * 16:(q + 1) * 16] = k4[:, zz]
    return out


def dct2_flat(vectors: jnp.ndarray, size: int) -> jnp.ndarray:
    """Forward 2-D DCT on row-major flattened blocks: (n, s*s) -> (n, s*s)."""
    k = jnp.asarray(_kron_matrix(size, inverse=False))
    return jnp.einsum("nk,kl->nl", vectors, k, precision="highest")


def idct2_flat(vectors: jnp.ndarray, size: int) -> jnp.ndarray:
    """Inverse 2-D DCT on row-major flattened blocks."""
    k = jnp.asarray(_kron_matrix(size, inverse=True))
    return jnp.einsum("nk,kl->nl", vectors, k, precision="highest")


def dct2(blocks: jnp.ndarray) -> jnp.ndarray:
    """Forward 2-D DCT-II over a batch: (..., s, s) -> (..., s, s)."""
    s = blocks.shape[-1]
    if s <= KRON_MAX:
        flat = blocks.reshape(blocks.shape[:-2] + (s * s,))
        return dct2_flat(flat, s).reshape(blocks.shape)
    d = jnp.asarray(dct_matrix(s))
    y = jnp.einsum("km,...mn->...kn", d, blocks, precision="highest")
    return jnp.einsum("...kn,ln->...kl", y, d, precision="highest")


def idct2(coeffs: jnp.ndarray) -> jnp.ndarray:
    """Inverse 2-D DCT (DCT-III with orthonormal scaling)."""
    s = coeffs.shape[-1]
    if s <= KRON_MAX:
        flat = coeffs.reshape(coeffs.shape[:-2] + (s * s,))
        return idct2_flat(flat, s).reshape(coeffs.shape)
    d = jnp.asarray(dct_matrix(s))
    y = jnp.einsum("mk,...mn->...kn", d, coeffs, precision="highest")
    return jnp.einsum("...kn,nl->...kl", y, d, precision="highest")
