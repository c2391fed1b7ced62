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


def _hist_kernel(vals_ref, bins_ref, rep_ref, out_ref):
    """(T, N/128, 128) int32 values (natural lane layout) -> (T, 128, 128)
    int32 packed radix pair-counts (diagonal 16x16 blocks hold the
    histograms).

    Radix-16 MXU counting: value v = hi*16 + lo, so
    hist[a*16+b] = sum_i [hi_i == a][lo_i == b] — an outer-product
    contraction the MXU can do.  To use full 128-wide tiles, 8 values pack
    per contraction row with block-diagonal one-hots
    A2[g, e*16+a] = [hi(g,e) == a] (and B2 for lo): R = A2^T B2, counts for
    element slot e live in R[e*16+a, e*16+b]; cross-blocks (e != f) are
    discarded by the caller.  The 8-values-per-row replication rides
    Mosaic's 128-lane dynamic gather on the NATURAL (R, 128) value layout
    (an earlier revision stored values as (N/8, 8), whose 8-wide lane dim
    pads 16x in VMEM — the load waste dominated the kernel): 16 gathers
    with lane index (c >> 4) + 8i concatenate to the (16R, 128) replicated
    view.  One-hots are int8 and accumulate in int32 on the MXU — counts
    are exact for any row length (the f32-accumulating revision was only
    exact below 2^24 per bin; ADVICE r3).  The -1 padding never counts:
    its hi replica is -1, matching no bin."""
    bins = bins_ref[:]                   # (1, 128) int32: c & 15
    v = vals_ref[0]                      # (R, 128) int32
    r = v.shape[0]
    idx = jnp.broadcast_to(rep_ref[:], (r, 128))   # c >> 4
    rep = jnp.concatenate(
        [jnp.take_along_axis(v, idx + 8 * i, axis=1) for i in range(16)],
        axis=0)                          # (16R, 128)
    a2 = ((rep >> 4) == bins).astype(jnp.int8)
    b2 = ((rep & 15) == bins).astype(jnp.int8)
    out_ref[0] = jax.lax.dot_general(
        a2, b2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


@functools.lru_cache(maxsize=1)
def _diag_mask():
    """(8, 1, 8, 1) selector of the diagonal element-slot blocks."""
    return np.eye(8, dtype=np.int32).reshape(8, 1, 8, 1)


@functools.lru_cache(maxsize=1)
def _hist_consts():
    c = np.arange(128)
    bins = (c & 15).astype(np.int32).reshape(1, 128)
    rep = (c >> 4).astype(np.int32).reshape(1, 128)
    return bins, rep


def histogram256(values: jnp.ndarray) -> jnp.ndarray:
    """(T, N) int32 values in [0, 255] -> (T, 256) int32 histograms.
    N is padded to a chunk multiple with -1 (never counted)."""
    t, n = values.shape
    pad = (-n) % _CHUNK
    if pad:
        values = jnp.pad(values, ((0, 0), (0, pad)), constant_values=-1)
    n += pad
    bins_np, rep_np = _hist_consts()
    bins = jnp.asarray(bins_np)
    rep = jnp.asarray(rep_np)
    pairs = pl.pallas_call(
        _hist_kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, n // 128, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 128, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, 128, 128), jnp.int32),
        interpret=_interpret(),
    )(values.reshape(t, n // 128, 128), bins, rep)
    r4 = pairs.reshape(t, 8, 16, 8, 16)
    hist = (r4 * jnp.asarray(_diag_mask())).sum(axis=(1, 3))
    return hist.reshape(t, 256)


_LUT_ROWS = 8
_LUT_COLS = 512


# ------------------------------------------------------------ exact u8 LUT
#
# uint8 -> float32/255 conversion, bit-identical to the host loader's
# x.astype(f32)/255 for all 256 inputs.  The round-2/3 double-float32 trick
# (x*hi + x*lo with a compensated reciprocal) is defeated on this harness:
# the terminal forces --xla_allow_excess_precision=true, under which XLA
# contracts the two products and 126/256 values come out 1 ulp off —
# exactly the naive-divide error the trick existed to fix.  A 256-entry
# table of the host-computed values gathered per pixel is exact by
# construction and runs at VPU speed (2 gathers + select per element).


def _u8_lut_kernel(vals_ref, tab_ref, out_ref):
    v = vals_ref[:].astype(jnp.int32)     # (bh, 128) uint8 in
    bh = v.shape[0]
    lo_mask = v < 128
    vl = jnp.where(lo_mask, v, v - 128)
    t_lo = jnp.broadcast_to(tab_ref[0, :, :128], (bh, 128))
    t_hi = jnp.broadcast_to(tab_ref[0, :, 128:], (bh, 128))
    g_lo = jnp.take_along_axis(t_lo, vl, axis=1)
    g_hi = jnp.take_along_axis(t_hi, vl, axis=1)
    out_ref[:] = jnp.where(lo_mask, g_lo, g_hi)


@functools.lru_cache(maxsize=1)
def _u8_unit_table() -> np.ndarray:
    return (np.arange(256).astype(np.float32) / 255.0).reshape(1, 1, 256)


_U8_ROWS = 64


def _u8_lut_2d(flat2d: jnp.ndarray) -> jnp.ndarray:
    rows, cols = flat2d.shape
    tab = jnp.asarray(_u8_unit_table())
    return pl.pallas_call(
        _u8_lut_kernel,
        grid=(rows // _U8_ROWS, cols // 128),
        in_specs=[
            pl.BlockSpec((_U8_ROWS, 128), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 256), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_U8_ROWS, 128), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        interpret=_interpret(),
    )(flat2d, tab)


def u8_to_unit_exact(batch_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 array (any shape) -> float32 x/255, bit-equal to numpy's
    x.astype(np.float32)/255 for all 256 inputs — closed-form integer
    construction, no gather, no Pallas, immune to excess-precision.

    Derivation: for v in [1,255],  v/255 = v * (2^-8 + 2^-16 + 2^-24 + ...)
    so r = v * 0x01010101 (fits u32 exactly; 255*0x01010101 = 2^32-1)
    holds the first 32 fraction bits of v/255, and the discarded tail is
    v/255 in ulp-of-r units — strictly in (0,1), so there is NEVER a
    round-to-even tie: round-up iff the first discarded bit of r is set.
    The MSB of r sits at bit 24+q with q = floor(log2 v) (extracted from
    the exact u8->f32 convert's exponent field), giving mantissa
    mant = r >> (q+1) in [2^23, 2^24).  Assembling
    bits = ((q+119) << 23) + mant + round_bit - 2^23 even handles the
    mantissa-overflow carry (v=255 -> exactly 1.0f) for free.
    Exhaustive 256-value equality vs the host loader is pinned on CPU
    (tests/test_pallas_kernels.py) and on the real chip
    (tests/tpu/test_identity.py).

    Replaces the round-4 Pallas 256-entry LUT gather (kept below as
    u8_to_unit_lut): measured 9.9 ms for a 48M-element batch vs ~1 ms for
    this ~12-int-op elementwise chain, which XLA fuses freely into the
    surrounding stage-A graph."""
    v = batch_u8.astype(jnp.uint32)
    r = v * jnp.uint32(0x01010101)
    vf = (v | jnp.uint32(1)).astype(jnp.float32)      # exact; |1 guards v=0
    q = (jax.lax.bitcast_convert_type(vf, jnp.uint32) >> 23) - jnp.uint32(127)
    mant = r >> (q + jnp.uint32(1))
    rnd = (r >> q) & jnp.uint32(1)
    bits = ((q + jnp.uint32(119)) << 23) + mant + rnd - jnp.uint32(1 << 23)
    out = jax.lax.bitcast_convert_type(bits, jnp.float32)
    return jnp.where(batch_u8 == 0, jnp.float32(0.0), out)


def u8_to_unit_lut(batch_u8: jnp.ndarray) -> jnp.ndarray:
    """Round-4 Pallas LUT-gather implementation of the exact u8 -> f32
    x/255 conversion (superseded by the closed-form u8_to_unit_exact;
    kept as an independent oracle for the equality tests).

    Layout: the kernel wants a 2-D (64k, 128m) view with a 2-D grid —
    measured 9.9 ms for a 48M-element batch, where BOTH a tall-skinny
    (N/128, 128) 1-D-grid layout and any formulation that pads/slices the
    flattened 1-D array cost 54-76 ms (XLA's giant-1-D pad and slice are
    pathological on TPU).  So: find a suffix-product column count that
    divides 128 (free reshape, e.g. W*3 = 2304 for RGB images), pad only
    rows (2-D pad), and fall back to the padded 1-D path for small or
    odd-shaped inputs where its cost is irrelevant."""
    shape = batch_u8.shape
    n = int(np.prod(shape)) if shape else 1
    # smallest trailing-dims product divisible by 128
    cols = 0
    acc = 1
    for d in reversed(shape):
        acc *= int(d)
        if acc % 128 == 0:
            cols = acc
            break
    if cols and n >= (1 << 16):
        rows = n // cols
        flat = batch_u8.reshape(rows, cols)
        rpad = (-rows) % _U8_ROWS
        if rpad:
            flat = jnp.pad(flat, ((0, rpad), (0, 0)))
        out = _u8_lut_2d(flat)
        if rpad:
            out = out[:rows]
        return out.reshape(shape)
    # small/odd fallback
    flat = batch_u8.reshape(-1)
    rows = -(-n // 128)
    rpad = (-rows) % _U8_ROWS
    pad = rows * 128 - n + rpad * 128
    if pad:
        flat = jnp.pad(flat, (0, pad))
    out = _u8_lut_2d(flat.reshape(rows + rpad, 128))
    return out.reshape(-1)[:n].reshape(shape)


# ------------------------------------------------------- CLAHE gather apply
#
# Round-4 kernel: the one-hot MXU formulation below (clahe_lut_apply) costs
# ~4096 effective MACs per pixel at 12.5% MXU utilization (N=16) — 21 ms for
# a 42-image 512x768 batch.  Mosaic's 128-lane dynamic gather
# (take_along_axis on a (rows,128) table) makes LUT application a VPU
# problem instead: pack the 4 tile-column LUTs of one tile ROW into int32
# words (one byte per tile column), gather the word per pixel (2 gathers +
# select for the 256-entry range), extract the left/right tile bytes with
# per-lane shifts, and apply OpenCV's own interpolation association
# (imgproc clahe.cpp):
#     res = (TL[v]*xa1 + TR[v]*xa)*ya1 + (BL[v]*xa1 + BR[v]*xa)*ya
# ~25 VPU ops/pixel: 3.8 ms for the same batch (5.5x), and closer to cv2
# (mismatch rate 3e-4 vs 5e-3, still <=1 LSB) because the association and
# the tile-row clamping match OpenCV's exactly.
#
# Grid: (row-bands, W/128).  Band height = tile_h/2, which makes the
# (clamped) top/bottom tile-row indices CONSTANT per band, so the two
# tile-row word banks are selected by BlockSpec index maps — no per-pixel
# bank arithmetic.  Callers fall back to clahe_lut_apply when the shape
# can't band evenly (odd tile height, tiny layers).


def _clahe_gather_kernel(img_ref, wtop_ref, wbot_ref, ix0_ref, ix1_ref,
                         xa_ref, xa1_ref, ya_ref, ya1_ref, out_ref):
    bh = img_ref.shape[0]
    v = img_ref[:]                              # (bh, 128) int32 in [0,256)
    lo_mask = v < 128
    vl = jnp.where(lo_mask, v, v - 128)

    def bank(ref):
        w_lo = jnp.broadcast_to(ref[0, :, :128], (bh, 128))
        w_hi = jnp.broadcast_to(ref[0, :, 128:], (bh, 128))
        g_lo = jnp.take_along_axis(w_lo, vl, axis=1)
        g_hi = jnp.take_along_axis(w_hi, vl, axis=1)
        return jnp.where(lo_mask, g_lo, g_hi)   # packed words per pixel

    wt = bank(wtop_ref)
    wb = bank(wbot_ref)
    sh0 = ix0_ref[:] * 8
    sh1 = ix1_ref[:] * 8
    tl = ((wt >> sh0) & 255).astype(jnp.float32)
    tr = ((wt >> sh1) & 255).astype(jnp.float32)
    bl = ((wb >> sh0) & 255).astype(jnp.float32)
    br = ((wb >> sh1) & 255).astype(jnp.float32)
    xa = xa_ref[:]
    xa1 = xa1_ref[:]
    out_ref[:] = ((tl * xa1 + tr * xa) * ya1_ref[:]
                  + (bl * xa1 + br * xa) * ya_ref[:])


def clahe_gather_supported(h: int, w: int, th: int, gh: int, gw: int) -> bool:
    """Fast path needs 4 packable tile columns, an even tile height whose
    half is a sublane multiple (the band height), and bands that cover the
    (possibly padded) image within the 2*gh tile-row pattern."""
    return gw == 4 and th % 2 == 0 and (th // 2) % 8 == 0


def clahe_apply_gather(img: jnp.ndarray, words: jnp.ndarray,
                       ix0, ix1, xa, xa1, ya, ya1,
                       th: int, gh: int) -> jnp.ndarray:
    """(H, W) int32 pixels, (gh, 256) int32 packed LUT words, per-column
    index/weight vectors (1, W), per-row weight vectors (H, 1) ->
    (H, W) f32 bilinear-interpolated LUT output (pre-rounding)."""
    h, w = img.shape
    bh = th // 2
    pad_h = (-h) % bh
    pad_w = (-w) % 128
    if pad_h or pad_w:
        img = jnp.pad(img, ((0, pad_h), (0, pad_w)))
        ix0 = jnp.pad(ix0, ((0, 0), (0, pad_w)))
        ix1 = jnp.pad(ix1, ((0, 0), (0, pad_w)))
        xa = jnp.pad(xa, ((0, 0), (0, pad_w)))
        xa1 = jnp.pad(xa1, ((0, 0), (0, pad_w)))
        ya = jnp.pad(ya, ((0, pad_h), (0, 0)))
        ya1 = jnp.pad(ya1, ((0, pad_h), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    top_map = lambda k, j: (jnp.maximum(k - 1, 0) // 2, 0, 0)
    bot_map = lambda k, j: (jnp.minimum((k + 1) // 2, gh - 1), 0, 0)
    col = lambda k, j: (0, j)
    row = lambda k, j: (k, 0)
    w3 = words.reshape(gh, 1, 256)
    out = pl.pallas_call(
        _clahe_gather_kernel,
        grid=(hp // bh, wp // 128),
        in_specs=[
            pl.BlockSpec((bh, 128), lambda k, j: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 256), top_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 256), bot_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, 1), row, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bh, 128), lambda k, j: (k, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        interpret=_interpret(),
    )(img, w3, w3, ix0, ix1, xa, xa1, ya, ya1)
    return out[:h, :w]


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
