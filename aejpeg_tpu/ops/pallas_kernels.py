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


def _hist_kernel(vals_ref, hist_ref):
    """(T, N) int32 values (whole array in VMEM) -> (T, 256) histograms.

    Chunked one-hot compare-sums: each fori step broadcasts a (T, 128) value
    chunk against all 256 bins in registers and accumulates — no gathers, no
    scatters, no dynamic stores (Mosaic requires 128-aligned dynamic column
    indices, so per-bin column writes are not lowerable)."""
    t, n = vals_ref.shape
    bins = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 256), 2)

    def body(i, acc):
        chunk = vals_ref[:, pl.ds(i * _CHUNK, _CHUNK)]       # (T, C)
        eq = (chunk[:, :, None] == bins).astype(jnp.int32)   # (T, C, 256)
        return acc + jnp.sum(eq, axis=1)

    hist = jax.lax.fori_loop(0, n // _CHUNK, body,
                             jnp.zeros((t, 256), jnp.int32))
    hist_ref[:] = hist


def histogram256(values: jnp.ndarray) -> jnp.ndarray:
    """(T, N) int32 values in [0, 255] -> (T, 256) int32 histograms.
    N is padded to a chunk multiple with -1 (never counted)."""
    t, n = values.shape
    pad = (-n) % _CHUNK
    if pad:
        values = jnp.pad(values, ((0, 0), (0, pad)), constant_values=-1)
    return pl.pallas_call(
        _hist_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, 256), jnp.int32),
        interpret=_interpret(),
    )(values)


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
