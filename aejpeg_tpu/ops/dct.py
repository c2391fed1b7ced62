"""DCT-II / DCT-III as dense separable matmuls (the MXU hot path).

The reference calls cv.dct/cv.idct per block in a Python loop
(src/jpeg/jpeg.py:461-483).  Here blocks become batched einsums
`D @ X @ D^T` that XLA maps straight onto the MXU.  The orthonormal DCT
matrix matches OpenCV's definition:
    D[k, n] = a_k * cos(pi * (2n + 1) * k / (2N)),
    a_0 = sqrt(1/N), a_k = sqrt(2/N).
Matrices are computed in float64 on host and cast once, and matmuls run at
HIGHEST precision so f32 accuracy survives the MXU.  (Round 4 measured the
bf16x3 "high" alternative: it saves only ~1.5 ms of the 17 ms stage-B wall
on a 42-image batch — the stage is layout/bandwidth-bound, not
matmul-bound — and the dense (p,gh,s,gw,s) and per-block (N,s,s) layouts
STOP being bit-identical to each other at X3 on TPU, which would break the
batch-vs-single container byte-identity guarantee.  Not worth it.)

The separable two-matmul form is used for EVERY size and layout: it is
bit-identical between the per-block (N, s, s) layout and the dense
plane-tiled (P, gh, s, gw, s) layout on both CPU and TPU (verified
exhaustively in tests), which is what lets the batched dense pipeline and
the per-image codec produce byte-identical containers.  (An earlier
Kronecker-matrix fast path produced ~1e-4-different coefficients and
s^4-FLOP matrices up to 64 MB; see ADVICE.md round 1.)
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
    s = blocks.shape[-1]
    d = jnp.asarray(dct_matrix(s))
    y = jnp.einsum("km,...mn->...kn", d, blocks, precision="highest")
    return jnp.einsum("...kn,ln->...kl", y, d, precision="highest")


def idct2(coeffs: jnp.ndarray) -> jnp.ndarray:
    """Inverse 2-D DCT (DCT-III with orthonormal scaling)."""
    s = coeffs.shape[-1]
    d = jnp.asarray(dct_matrix(s))
    y = jnp.einsum("mk,...mn->...kn", d, coeffs, precision="highest")
    return jnp.einsum("...kn,nl->...kl", y, d, precision="highest")


def dct2_dense(planes: jnp.ndarray, size: int) -> jnp.ndarray:
    """Forward 2-D DCT of every size-aligned block of (P, ph, pw) planes,
    without materializing a block batch: (P, ph, pw) -> (P, gh, s, gw, s)
    with DCT coefficients in block-raster position.  Bit-identical to
    dct2 on the gathered (N, s, s) blocks."""
    p, ph, pw = planes.shape
    gh, gw = ph // size, pw // size
    d = jnp.asarray(dct_matrix(size))
    x = planes.reshape(p, gh, size, gw, size)
    y = jnp.einsum("km,pgmhn->pgkhn", d, x, precision="highest")
    return jnp.einsum("pgkhn,ln->pgkhl", y, d, precision="highest")


def idct2_dense(blocks6: jnp.ndarray) -> jnp.ndarray:
    """Inverse of dct2_dense on the (..., gh, s, gw, s) layout: contracts
    the per-block row axis (-3) and column axis (-1) with the DCT-III."""
    s = blocks6.shape[-1]
    d = jnp.asarray(dct_matrix(s))
    y = jnp.einsum("mk,...gmhn->...gkhn", d, blocks6, precision="highest")
    return jnp.einsum("...gkhn,nl->...gkhl", y, d, precision="highest")
