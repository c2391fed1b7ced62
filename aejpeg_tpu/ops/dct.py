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


def dct2(blocks: jnp.ndarray) -> jnp.ndarray:
    """Forward 2-D DCT-II over a batch: (..., s, s) -> (..., s, s)."""
    d = jnp.asarray(dct_matrix(blocks.shape[-1]))
    y = jnp.einsum("km,...mn->...kn", d, blocks, precision="highest")
    return jnp.einsum("...kn,ln->...kl", y, d, precision="highest")


def idct2(coeffs: jnp.ndarray) -> jnp.ndarray:
    """Inverse 2-D DCT (DCT-III with orthonormal scaling)."""
    d = jnp.asarray(dct_matrix(coeffs.shape[-1]))
    y = jnp.einsum("mk,...mn->...kn", d, coeffs, precision="highest")
    return jnp.einsum("...kn,nl->...kl", y, d, precision="highest")
