"""Resizes as precomputed 1-D weight matrices -> MXU matmuls.

The reference's chroma subsampling uses cv.resize INTER_AREA (down,
src/jpeg/jpeg.py:336) and INTER_LINEAR (up, src/jpeg/jpeg.py:352), and the
quantization-table scaling uses INTER_LINEAR on an 8x8 float matrix
(src/jpeg/jpeg.py:722).  All of these are separable linear maps, so we
precompute the exact OpenCV row/column weights host-side (float64) and apply
them on device as two dense matmuls: `W_h @ X @ W_w^T` — a shape that XLA
tiles directly onto the MXU instead of a gather-heavy interpolation kernel.
"""

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def linear_weights(src: int, dst: int) -> np.ndarray:
    """(dst, src) bilinear weight matrix matching cv.resize INTER_LINEAR for
    float images: src_x = (dst_x + 0.5) * scale - 0.5 with edge clamping."""
    w = np.zeros((dst, src), dtype=np.float64)
    if src == 1:
        w[:, 0] = 1.0
        return w
    scale = src / dst
    for dx in range(dst):
        fx = (dx + 0.5) * scale - 0.5
        sx = int(np.floor(fx))
        fx -= sx
        if sx < 0:
            sx, fx = 0, 0.0
        if sx >= src - 1:
            sx, fx = src - 2, 1.0
        w[dx, sx] += 1.0 - fx
        w[dx, sx + 1] += fx
    return w


@functools.lru_cache(maxsize=None)
def area_weights(src: int, dst: int) -> np.ndarray:
    """(dst, src) averaging weights matching cv.resize INTER_AREA for
    true downscale (scale >= 1): each dst pixel averages the src cells
    overlapping [dx*scale, (dx+1)*scale) with fractional boundary weights."""
    if dst > src:
        raise ValueError("area_weights is for downscaling only")
    w = np.zeros((dst, src), dtype=np.float64)
    scale = src / dst
    inv = 1.0 / scale
    for dx in range(dst):
        lo = dx * scale
        hi = lo + scale
        cell = int(np.floor(lo))
        x = lo
        while x < hi - 1e-12 and cell < src:
            right = min(cell + 1.0, hi)
            w[dx, cell] += (right - max(x, cell)) * inv
            x = right
            cell += 1
    return w


def resize2d(img: jnp.ndarray, dst_hw, kind: str) -> jnp.ndarray:
    """Resize the last two dims of `img` to dst_hw.

    kind: 'area' (OpenCV INTER_AREA downscale) or 'linear' (INTER_LINEAR).
    """
    h, w = img.shape[-2], img.shape[-1]
    dh, dw = dst_hw
    fn = area_weights if kind == "area" else linear_weights
    if (dh, dw) == (h, w):
        return img
    wh = jnp.asarray(fn(h, dh).astype(np.float32))
    ww = jnp.asarray(fn(w, dw).astype(np.float32))
    y = jnp.einsum("ij,...jk->...ik", wh, img, precision="highest")
    return jnp.einsum("...ik,lk->...il", y, ww, precision="highest")


def resize2d_host(img: np.ndarray, dst_hw, kind: str) -> np.ndarray:
    """Host (numpy, float64 accumulate) version, for table precompute."""
    h, w = img.shape[-2], img.shape[-1]
    dh, dw = dst_hw
    fn = area_weights if kind == "area" else linear_weights
    wh = fn(h, dh)
    ww = fn(w, dw)
    return np.einsum("ij,...jk,lk->...il", wh, img.astype(np.float64), ww)
