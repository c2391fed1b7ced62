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


# ------------------------------------------------ integer-ratio fast path
#
# The production subsampling cases (4:2:0 -> exact 2x per axis, 4:1:1 ->
# exact 4x on width; src/jpeg/jpeg.py:62-147) have banded area weight
# matrices: each downscale row is r taps of 1/r over a contiguous group.
# Running those as dense K=src matmuls at HIGHEST precision costs ~6 MXU
# passes of almost-entirely-zero FLOPs (~5 ms of the 42-image bench
# batch's encode device budget).  The fast path below performs the einsum
# rows' EXACT arithmetic — same f32 weights (powers of two, so the
# products are exact), same ascending-source accumulation order — as a
# free axis-splitting reshape plus r multiply-adds, so the result is
# bitwise identical to the matmul path in real float32 (asserted in
# tests/test_ops.py) and at least as accurate on TPU, where the MXU would
# use a bf16x3 decomposition instead.  Fractional shapes (odd layer dims)
# keep the dense-matmul path.


def _down_taps(src: int, dst: int, kind: str):
    """Per-group tap weights [w_0..w_{r-1}] for an exact integer-ratio
    downscale whose rows each cover exactly [i*r, (i+1)*r), else None."""
    if dst == 0 or src % dst or src == dst:
        return None
    r = src // dst
    w = (area_weights if kind == "area" else linear_weights)(src, dst)
    taps = w[0, :r].copy()
    for i in range(dst):
        row = w[i]
        if np.any(row[: i * r]) or np.any(row[(i + 1) * r:]):
            return None
        if not np.array_equal(row[i * r: (i + 1) * r], taps):
            return None
    return [np.float32(t) for t in taps]


def _down_axis(img: jnp.ndarray, axis: int, dst: int, taps) -> jnp.ndarray:
    """Grouped r-tap downscale along axis (-1 or -2) — a reshape that
    splits the axis (free) plus r multiply-adds in ascending source
    order, exactly the einsum row's accumulation."""
    r = len(taps)
    if axis == -1:
        xg = img.reshape(img.shape[:-1] + (dst, r))
        terms = [xg[..., t] * taps[t] for t in range(r)]
        # sequential accumulation — matches how XLA CPU lowers the
        # W-side einsum ("...ik,lk->...il"), keeping the fast path
        # bitwise equal to the matmul path there (asserted in tests)
        acc = terms[0]
        for t in range(1, r):
            acc = acc + terms[t]
        return acc
    xg = img.reshape(img.shape[:-2] + (dst, r, img.shape[-1]))
    terms = [xg[..., t, :] * taps[t] for t in range(r)]
    # pairwise (binary-tree) accumulation — the order XLA CPU lowers the
    # H-side einsum ("ij,...jk->...ik") with
    while len(terms) > 1:
        terms = [terms[i] + terms[i + 1] if i + 1 < len(terms)
                 else terms[i] for i in range(0, len(terms), 2)]
    return terms[0]


@functools.lru_cache(maxsize=None)
def _axis_fast(src: int, dst: int, kind: str, axis: int):
    """Tuple of per-group taps for an exact-integer downscale axis, else
    None.

    Gated to the tap patterns whose strided accumulation is verified
    bitwise-equal to XLA's CPU einsum lowering (the order XLA picks is
    size- and axis-dependent, so only the production subsampling
    geometries are allowed): r=2 on either axis, r=4 on the lane axis at
    real image widths (4:1:1).  Everything else — including upscales,
    whose 2-tap linear rows round differently from the CPU einsum's FMA
    contraction — keeps the dense-matmul path."""
    if dst >= src:
        return None
    taps = _down_taps(src, dst, kind)
    if taps is None:
        return None
    r = len(taps)
    ok = r == 2 or (axis == -1 and r == 4 and dst >= 64)
    return tuple(taps) if ok else None


def resize2d(img: jnp.ndarray, dst_hw, kind: str) -> jnp.ndarray:
    """Resize the last two dims of `img` to dst_hw.

    kind: 'area' (OpenCV INTER_AREA downscale) or 'linear' (INTER_LINEAR).
    Exact-integer-ratio downscales ride the grouped fast path above (H as
    sublane ops, W as lane ops — no transposes); anything else, or a
    mixed fast/slow axis pair, uses the dense weight matmuls.  H is
    applied before W in both paths, matching the original einsum order."""
    h, w = img.shape[-2], img.shape[-1]
    dh, dw = dst_hw
    if (dh, dw) == (h, w):
        return img
    fast_h = "id" if dh == h else _axis_fast(h, dh, kind, -2)
    fast_w = "id" if dw == w else _axis_fast(w, dw, kind, -1)
    if fast_h is not None and fast_w is not None:
        y = img
        if fast_h != "id":
            y = _down_axis(y, -2, dh, list(fast_h))
        if fast_w != "id":
            y = _down_axis(y, -1, dw, list(fast_w))
        return y
    fn = area_weights if kind == "area" else linear_weights
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
