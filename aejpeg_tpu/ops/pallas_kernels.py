"""Pallas TPU kernels for the codec's hot ops.

Currently: 256-bin histograms (CLAHE tiles + Canny percentile thresholds).
XLA alternatives are pathological on TPU: scatter-add serializes updates and
a one-hot compare materializes (tiles, N, 256) in HBM.  The kernel keeps a
tile in VMEM and reduces 256 compare-sums on the VPU — one HBM read of the
data, no gathers/scatters.

Falls back to interpret mode off-TPU so unit tests run on the CPU backend.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


_CHUNK = 128


def _hist_kernel(vals_ref, sel_ref, bins_ref, out_ref):
    """(T, N/8, 8) int32 values (whole array in VMEM) -> (T, 128, 128) f32
    packed radix pair-counts (diagonal 16x16 blocks hold the histograms).

    Radix-16 MXU counting: value v = hi*16 + lo, so
    hist[a*16+b] = sum_i [hi_i == a][lo_i == b] — an outer-product
    contraction the MXU can do.  To use full 128-wide tiles, 8 values pack
    per row with block-diagonal one-hots A2[g, e*16+a] = [hi(g,e) == a]
    (and B2 for lo): R = A2^T B2 then counts for element slot e live in
    R[e*16+a, e*16+b]; cross-blocks (e != f) are discarded by the caller.
    In-kernel lane reshapes are unlowerable, so the 8->128 replication
    rides a tiny selector matmul (sel[e, c] = [c >> 4 == e], values <= 255
    exact in bf16) and the one-hot compare runs against bins[c] = c & 15.
    VPU work drops from 256 compares+adds per value (the one-hot
    compare-sum this replaces) to ~32 compare-lanes; the adds ride the MXU
    at full tile utilization.  f32 accumulation is exact (counts < 2^24).
    The -1 padding never counts: its hi replica is -1, matching no bin."""
    sel = sel_ref[:]                    # (8, 128) bf16 block selector
    bins = bins_ref[:]                  # (1, 128) f32: c & 15
    row = vals_ref[0]                   # (N/8, 8) int32
    hi = (row >> 4).astype(jnp.bfloat16)
    lo = (row & 15).astype(jnp.bfloat16)
    rep_hi = jax.lax.dot_general(hi, sel, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    rep_lo = jax.lax.dot_general(lo, sel, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    a2 = (rep_hi == bins).astype(jnp.bfloat16)         # (N/8, 128)
    b2 = (rep_lo == bins).astype(jnp.bfloat16)
    out_ref[0] = jax.lax.dot_general(
        a2, b2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.lru_cache(maxsize=1)
def _diag_mask():
    """(8, 1, 8, 1) selector of the diagonal element-slot blocks."""
    return np.eye(8, dtype=np.float32).reshape(8, 1, 8, 1)


@functools.lru_cache(maxsize=1)
def _hist_consts():
    c = np.arange(128)
    sel = (c[None, :] >> 4 == np.arange(8)[:, None]).astype(np.float32)
    bins = (c & 15).astype(np.float32).reshape(1, 128)
    return sel.astype(np.dtype("bfloat16") if hasattr(np, "bfloat16")
                      else np.float32), bins


def histogram256(values: jnp.ndarray) -> jnp.ndarray:
    """(T, N) int32 values in [0, 255] -> (T, 256) int32 histograms.
    N is padded to a chunk multiple with -1 (never counted)."""
    t, n = values.shape
    pad = (-n) % _CHUNK
    if pad:
        values = jnp.pad(values, ((0, 0), (0, pad)), constant_values=-1)
    n += pad
    sel_np, bins_np = _hist_consts()
    sel = jnp.asarray(sel_np, jnp.bfloat16)
    bins = jnp.asarray(bins_np, jnp.float32)
    pairs = pl.pallas_call(
        _hist_kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, n // 8, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 128, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, 128, 128), jnp.float32),
        interpret=_interpret(),
    )(values.reshape(t, n // 8, 8), sel, bins)
    r4 = pairs.reshape(t, 8, 16, 8, 16)
    hist = (r4 * jnp.asarray(_diag_mask())).sum(axis=(1, 3))
    return hist.reshape(t, 256).astype(jnp.int32)


_LUT_ROWS = 8
_LUT_COLS = 512


def _lut_apply_kernel(img_ref, lut_ref, wts_ref, out_ref):
    """img (bh, bw) int32 in [0,255]; lut (256, T) bf16 (values <= 255,
    exact); wts (bh, bw, T) f32 -> out (bh, bw) f32 = sum_t wts*lut[img, t].

    The one-hot (bh, bw, 256) tensor lives only in VMEM here — the XLA
    formulation materializes it in HBM (~512 bytes of traffic per pixel),
    which made LUT application the most expensive CLAHE stage."""
    bh, bw = img_ref.shape
    bins = jax.lax.broadcasted_iota(jnp.int32, (bh, bw, 256), 2)
    oh = (img_ref[:][:, :, None] == bins).astype(jnp.bfloat16)
    contrib = jax.lax.dot_general(
        oh, lut_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (bh, bw, T)
    out_ref[:] = (wts_ref[:] * contrib).sum(axis=-1)


def clahe_lut_apply(img: jnp.ndarray, lut: jnp.ndarray,
                    wts: jnp.ndarray) -> jnp.ndarray:
    """(H, W) int32 pixel values, (256, T) bf16 per-tile LUTs, (H, W, T)
    f32 bilinear tile weights -> (H, W) f32 interpolated LUT output.

    2-D grid (rows x columns): the per-step VMEM footprint is a fixed
    (8 * 512, 256) one-hot (~2 MB bf16) regardless of image width — wide
    layers no longer blow VMEM (ADVICE r1: the row-only tiling grew
    linearly with W and would fail Mosaic allocation around W ~ 2000)."""
    h, w = img.shape
    t = lut.shape[1]
    pad_h = (-h) % _LUT_ROWS
    pad_w = (-w) % _LUT_COLS
    if pad_h or pad_w:
        img = jnp.pad(img, ((0, pad_h), (0, pad_w)))
        wts = jnp.pad(wts, ((0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    out = pl.pallas_call(
        _lut_apply_kernel,
        grid=(hp // _LUT_ROWS, wp // _LUT_COLS),
        in_specs=[
            pl.BlockSpec((_LUT_ROWS, _LUT_COLS), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, t), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_LUT_ROWS, _LUT_COLS, t), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_LUT_ROWS, _LUT_COLS), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        interpret=_interpret(),
    )(img, lut, wts)
    return out[:h, :w]
