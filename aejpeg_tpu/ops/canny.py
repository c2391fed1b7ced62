"""Edge detection stack (CLAHE -> Gaussian -> bilateral -> Canny).

Replicates the reference preprocessing + Canny pipeline
(src/jpeg/edge_detection.py:28-86) as fused jnp ops:

  1. scale x255 -> uint8 (wrapping cast parity: negative chroma wraps)
  2. CLAHE, clip 0.75, 4x4 tiles
  3. 3x3 Gaussian blur (sigma auto), uint8 rounding
  4. bilateral filter d=5, sigma_color=75, sigma_space=75, uint8 rounding
  5. thresholds = 10th/30th percentile of blurred image
  6. Canny: Sobel aperture 3, L2 gradient, NMS, hysteresis

Output is float32 {0, 1}.  Each stage is golden-tested against OpenCV in
tests/test_canny.py; stage semantics follow OpenCV's uint8 implementations
(fixed-point rounding where OpenCV uses it).
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------- uint8 cast
def to_uint8(img: jnp.ndarray) -> jnp.ndarray:
    """(img * 255).astype(np.uint8) with C-cast wrap-around parity: numpy's
    float->uint8 cast truncates toward zero and wraps negatives
    (src/jpeg/edge_detection.py:70 feeds chroma layers that go negative)."""
    scaled = img * 255.0
    trunc = jnp.trunc(scaled)
    wrapped = trunc.astype(jnp.int32).astype(jnp.uint8)
    return wrapped


# -------------------------------------------------------------------- CLAHE
def _clahe_luts(padded: jnp.ndarray, th: int, tw: int, gh: int, gw: int,
                clip_limit: float) -> jnp.ndarray:
    """Per-tile LUTs, OpenCV semantics: histogram clip + redistribution
    (residual spread with step = histSize/residual), then scaled cumsum with
    round-half-away rounding."""
    tiles = padded.reshape(gh, th, gw, tw).transpose(0, 2, 1, 3)
    tiles = tiles.reshape(gh * gw, th * tw)
    # 256-bin histograms per tile (Pallas: VMEM-resident compare-sums)
    from .pallas_kernels import histogram256
    hist = histogram256(tiles.astype(jnp.int32))            # (T, 256)

    tile_area = th * tw
    clip = max(int(clip_limit * tile_area / 256), 1)
    clipped = jnp.minimum(hist, clip)
    excess = (hist - clipped).sum(axis=1)                    # (T,)
    batch = excess // 256
    residual = excess - batch * 256
    h2 = clipped + batch[:, None]
    # residual distribution: bins 0, step, 2*step, ... get +1, where
    # step = max(256 // residual, 1) (OpenCV clahe.cpp)
    step = jnp.maximum(jnp.where(residual > 0, 256 // jnp.maximum(residual, 1),
                                 256), 1)
    idx = jnp.arange(256, dtype=jnp.int32)[None, :]
    gets_one = (idx % step[:, None] == 0) & (
        idx // step[:, None] < residual[:, None])
    h3 = h2 + gets_one.astype(jnp.int32)

    lut_scale = 255.0 / tile_area
    csum = jnp.cumsum(h3, axis=1)
    # OpenCV: saturate_cast<uchar>(sum * lutScale) with round-half-away
    lut = jnp.clip(jnp.floor(csum * lut_scale + 0.5), 0, 255)
    return lut.reshape(gh, gw, 256).astype(jnp.float32)


@functools.lru_cache(maxsize=None)
def _clahe_tile_weights(h: int, w: int, th: int, tw: int, gh: int,
                        gw: int) -> np.ndarray:
    """(h, w, gh*gw) float32 bilinear weights of each tile LUT per pixel
    (4 nonzero per pixel).  Host-precomputed per shape."""
    ty = np.arange(h, dtype=np.float64) / th - 0.5
    tx = np.arange(w, dtype=np.float64) / tw - 0.5
    y0 = np.floor(ty).astype(np.int64)
    x0 = np.floor(tx).astype(np.int64)
    fy = ty - y0
    fx = tx - x0
    wts = np.zeros((h, w, gh * gw), np.float64)
    yy = np.arange(h)
    xx = np.arange(w)
    for dy, wy in ((0, 1 - fy), (1, fy)):
        yc = np.clip(y0 + dy, 0, gh - 1)
        for dx, wx in ((0, 1 - fx), (1, fx)):
            xc = np.clip(x0 + dx, 0, gw - 1)
            t = yc[:, None] * gw + xc[None, :]
            np.add.at(wts, (yy[:, None], xx[None, :], t),
                      wy[:, None] * wx[None, :])
    return wts.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _clahe_interp_vectors(h: int, w: int, th: int, tw: int, gh: int,
                          gw: int):
    """Per-axis interpolation vectors for the gather kernel, same f64->f32
    derivation as _clahe_tile_weights: clamped left/right tile-column
    indices + fractional weights per x, fractional weights per y."""
    tx = np.arange(w, dtype=np.float64) / tw - 0.5
    x0f = np.floor(tx).astype(np.int64)
    xa = (tx - x0f).astype(np.float32)
    ix0 = np.clip(x0f, 0, gw - 1).astype(np.int32).reshape(1, w)
    ix1 = np.clip(x0f + 1, 0, gw - 1).astype(np.int32).reshape(1, w)
    ty = np.arange(h, dtype=np.float64) / th - 0.5
    ya = (ty - np.floor(ty)).astype(np.float32).reshape(h, 1)
    return (ix0, ix1, xa.reshape(1, w), (1 - xa).reshape(1, w),
            ya, (1 - ya).astype(np.float32))


def clahe(img_u8: jnp.ndarray, clip_limit: float = 0.75,
          grid=(4, 4)) -> jnp.ndarray:
    """OpenCV-style CLAHE on uint8: pad to tile multiple (BORDER_REFLECT_101),
    per-tile clipped-histogram LUTs, bilinear LUT interpolation.

    TPU path: the 4 tile-column LUTs of each tile row pack into int32 words
    (one byte per column) and the per-pixel lookup rides Mosaic's 128-lane
    dynamic gather — ~25 VPU ops/pixel, no MXU (pallas_kernels
    clahe_apply_gather; 5.5x the one-hot matmul kernel it replaces, which
    remains the fallback for shapes that can't band by half-tiles).
    Rounding is cvRound (half-to-even), matching OpenCV's saturate_cast."""
    from .pallas_kernels import (clahe_apply_gather, clahe_gather_supported,
                                 clahe_lut_apply)
    h, w = img_u8.shape
    gh, gw = grid
    th = -(-h // gh)
    tw = -(-w // gw)
    ph, pw = th * gh - h, tw * gw - w
    padded = _reflect101_pad(img_u8, 0, ph, 0, pw)
    luts = _clahe_luts(padded, th, tw, gh, gw, clip_limit)   # (gh, gw, 256)

    if clahe_gather_supported(h, w, th, gh, gw):
        li = luts.astype(jnp.int32)
        words = (li[:, 0] | (li[:, 1] << 8) | (li[:, 2] << 16)
                 | (li[:, 3] << 24))                          # (gh, 256)
        vecs = [jnp.asarray(a)
                for a in _clahe_interp_vectors(h, w, th, tw, gh, gw)]
        out = clahe_apply_gather(img_u8.astype(jnp.int32), words, *vecs,
                                 th=th, gh=gh)
        return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)

    lut_mat = luts.reshape(gh * gw, 256).T.astype(jnp.bfloat16)  # exact <=255
    wts = jnp.asarray(_clahe_tile_weights(h, w, th, tw, gh, gw))
    out = clahe_lut_apply(img_u8.astype(jnp.int32), lut_mat, wts)
    return jnp.clip(jnp.floor(out + 0.5), 0, 255).astype(jnp.uint8)


# ------------------------------------------------------------------ padding
def _reflect101_pad(img: jnp.ndarray, top: int, bottom: int, left: int,
                    right: int) -> jnp.ndarray:
    """OpenCV BORDER_REFLECT_101 padding (edge pixel not duplicated)."""
    if top or bottom:
        h = img.shape[0]
        idx = _reflect101_indices(h, top, bottom)
        img = img[idx, :]
    if left or right:
        w = img.shape[1]
        idx = _reflect101_indices(w, left, right)
        img = img[:, idx]
    return img


def _reflect101_indices(n: int, before: int, after: int) -> np.ndarray:
    base = np.arange(-before, n + after)
    if n == 1:
        return np.zeros_like(base)
    period = 2 * n - 2
    m = np.mod(base, period)
    return np.where(m < n, m, period - m)


# ------------------------------------------------------------ gaussian blur
# OpenCV getGaussianKernel uses these fixed tables for ksize <= 7, sigma <= 0
# (smoothing's "small_gaussian_tab") — NOT the sigma formula.
_SMALL_GAUSSIAN = {
    1: [1.0],
    3: [0.25, 0.5, 0.25],
    5: [0.0625, 0.25, 0.375, 0.25, 0.0625],
    7: [0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125],
}


@functools.lru_cache(maxsize=None)
def _gaussian_kernel_u8(ksize: int) -> np.ndarray:
    """Fixed-point (x256) Gaussian coefficients as OpenCV uses for uint8."""
    if ksize in _SMALL_GAUSSIAN:
        k = np.asarray(_SMALL_GAUSSIAN[ksize], np.float64)
    else:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
        x = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
        k = np.exp(-(x * x) / (2 * sigma * sigma))
        k /= k.sum()
    return np.round(k * 256).astype(np.int32)


def gaussian_blur_u8(img_u8: jnp.ndarray, ksize: int = 3) -> jnp.ndarray:
    """3x3 Gaussian on uint8 with OpenCV's 8-bit fixed-point arithmetic and
    BORDER_REFLECT_101."""
    kf = _gaussian_kernel_u8(ksize)  # int32, sums to 256
    r = ksize // 2
    padded = _reflect101_pad(img_u8.astype(jnp.int32), r, r, r, r)
    # separable: rows then cols in integer arithmetic, divide once by 2^16
    h = img_u8.shape[0]
    w = img_u8.shape[1]
    rowsum = jnp.zeros((h + 2 * r, w), jnp.int32)
    for j in range(ksize):
        rowsum = rowsum + int(kf[j]) * jax.lax.dynamic_slice(
            padded, (0, j), (h + 2 * r, w))
    out = jnp.zeros((h, w), jnp.int32)
    for i in range(ksize):
        out = out + int(kf[i]) * jax.lax.dynamic_slice(
            rowsum, (i, 0), (h, w))
    # OpenCV rounds with (x + (1<<15)) >> 16
    out = (out + (1 << 15)) >> 16
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


# ---------------------------------------------------------- bilateral filter
def bilateral_u8(img_u8: jnp.ndarray, d: int = 5, sigma_color: float = 75.0,
                 sigma_space: float = 75.0) -> jnp.ndarray:
    """OpenCV bilateralFilter for uint8 single-channel: radius = d//2,
    space weights exp(-r^2/(2 sc^2)) over the disk r <= radius, color weights
    exp(-diff^2/(2 scol^2)), float accumulation, round-half-away."""
    radius = d // 2
    gauss_color_coeff = -0.5 / (sigma_color * sigma_color)
    gauss_space_coeff = -0.5 / (sigma_space * sigma_space)

    offs = []
    sw = []
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            rr = math.sqrt(dy * dy + dx * dx)
            if rr > radius:
                continue
            offs.append((dy, dx))
            sw.append(math.exp(rr * rr * gauss_space_coeff))

    h, w = img_u8.shape
    padded = _reflect101_pad(img_u8, radius, radius, radius, radius)
    center = img_u8.astype(jnp.float32)
    num = jnp.zeros((h, w), jnp.float32)
    den = jnp.zeros((h, w), jnp.float32)
    # Color weights computed arithmetically on the VPU: a 256-entry LUT
    # gather per tap is ~50x slower on TPU than exp (transcendental ops are
    # cheap, per-lane gathers are not).
    cc = np.float32(gauss_color_coeff)
    for (dy, dx), s_w in zip(offs, sw):
        nb = jax.lax.dynamic_slice(padded, (dy + radius, dx + radius),
                                   (h, w)).astype(jnp.float32)
        d = nb - center
        wgt = np.float32(s_w) * jnp.exp(d * d * cc)
        num = num + wgt * nb
        den = den + wgt
    out = num / den
    return jnp.clip(jnp.floor(out + 0.5), 0, 255).astype(jnp.uint8)


# ------------------------------------------------------------------- sobel
def sobel_xy(img_u8: jnp.ndarray):
    """Sobel dx, dy (aperture 3) on uint8 -> int32, BORDER_REFLECT_101
    (OpenCV Canny's internal gradients)."""
    p = _reflect101_pad(img_u8.astype(jnp.int32), 1, 1, 1, 1)
    h, w = img_u8.shape

    def sl(dy, dx):
        return jax.lax.dynamic_slice(p, (dy + 1, dx + 1), (h, w))

    # dx kernel [[-1,0,1],[-2,0,2],[-1,0,1]]
    gx = (sl(-1, 1) - sl(-1, -1)) + 2 * (sl(0, 1) - sl(0, -1)) + \
         (sl(1, 1) - sl(1, -1))
    # dy kernel [[-1,-2,-1],[0,0,0],[1,2,1]]
    gy = (sl(1, -1) - sl(-1, -1)) + 2 * (sl(1, 0) - sl(-1, 0)) + \
         (sl(1, 1) - sl(-1, 1))
    return gx, gy


# ------------------------------------------------------------------- canny
def _canny_from_gradients(gx: jnp.ndarray, gy: jnp.ndarray,
                          low: jnp.ndarray, high: jnp.ndarray,
                          l2: bool = True) -> jnp.ndarray:
    """NMS + hysteresis, OpenCV semantics.

    OpenCV L2 path: magnitude m = gx^2 + gy^2 (int), thresholds squared.
    Sector logic uses |gy| * 2^15 compared against tan(22.5)/tan(67.5)
    fixed-point multiples of |gx|.
    """
    mag = (gx * gx + gy * gy).astype(jnp.float32) if l2 else \
        (jnp.abs(gx) + jnp.abs(gy)).astype(jnp.float32)

    # sector selection in int32 (values exceed f32's exact-integer range)
    ax = jnp.abs(gx)
    ay = jnp.abs(gy) << 15
    tg22 = np.int32(13573)  # round(tan(22.5deg) * 2^15) per OpenCV
    tg67x = ax * np.int32(3 << 15)  # tan(67.5) = 2 + tan(22.5)

    # neighbor magnitudes (border -> 0 so borders never survive NMS against
    # missing neighbors; OpenCV pads the magnitude map with zeros)
    def shift(m, dy, dx):
        pm = jnp.pad(m, 1)
        return jax.lax.dynamic_slice(pm, (1 + dy, 1 + dx), m.shape)

    m0 = mag
    horiz = (m0 > shift(m0, 0, -1)) & (m0 >= shift(m0, 0, 1))
    vert = (m0 > shift(m0, -1, 0)) & (m0 >= shift(m0, 1, 0))
    diag1 = (m0 > shift(m0, -1, -1)) & (m0 >= shift(m0, 1, 1))   # 135 deg
    diag2 = (m0 > shift(m0, -1, 1)) & (m0 >= shift(m0, 1, -1))   # 45 deg

    sector_h = ay < tg22 * ax                       # near-horizontal gradient
    sector_v = ay > tg67x + tg22 * ax               # near-vertical
    s_xor = (gx ^ gy) < 0                            # sign disagreement
    nms = jnp.where(sector_h, horiz,
                    jnp.where(sector_v, vert,
                              jnp.where(s_xor, diag2, diag1)))

    strong = nms & (mag > high)
    weak = nms & (mag > low)
    return _hysteresis(strong, weak).astype(jnp.float32)


def _pack_bits(mask: jnp.ndarray) -> jnp.ndarray:
    """(H, W) bool -> (H, ceil(W/32)) uint32, bit i of word w = column
    w*32+i (LSB = smallest x)."""
    h, w = mask.shape
    pad = (-w) % 32
    if pad:
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    u = mask.reshape(h, -1, 32).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    return (u * weights).sum(axis=-1, dtype=jnp.uint32)


def _unpack_bits(packed: jnp.ndarray, w: int) -> jnp.ndarray:
    h = packed.shape[0]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (packed[:, :, None] >> shifts) & jnp.uint32(1)
    return bits.reshape(h, -1)[:, :w].astype(jnp.bool_)


def _hysteresis(strong: jnp.ndarray, weak: jnp.ndarray) -> jnp.ndarray:
    """Propagate strong through weak (8-connected) to fixpoint.

    The naive formulation dilates (H, W) bool maps one pixel per iteration:
    at ~1 px/step a long weak chain costs hundreds of full-image passes.
    Bit-packing 32 columns per uint32 word cuts the per-iteration memory
    traffic 32x (the VPU does the shifts as word ops).  Two accelerations
    on top (any correct fixpoint algorithm yields the identical edge map):

    - in-word horizontal CLOSURE by mask doubling: with mJ = the
      "J consecutive weak pixels to my left" masks (prefix-AND chain),
      s |= (s << J) & mJ for J = 1,2,4,8,16 saturates every within-word
      horizontal run in 5 shift-ANDs, so one iteration crosses a whole
      horizontal chain instead of one pixel;
    - 2 propagation sub-steps per while_loop body: the `any` convergence
      reduction + loop round-trip costs as much as a sub-step, so halving
      the iteration count nearly halves the wall time.
    """
    h, w = strong.shape
    s = _pack_bits(strong)
    k = _pack_bits(weak)

    # mask-doubling chains for left (<<) and right (>>) in-word closure
    m1l = k
    m2l = m1l & (m1l << 1)
    m4l = m2l & (m2l << 2)
    m8l = m4l & (m4l << 4)
    m16l = m8l & (m8l << 8)
    m1r = k
    m2r = m1r & (m1r >> 1)
    m4r = m2r & (m2r >> 2)
    m8r = m4r & (m4r >> 4)
    m16r = m8r & (m8r >> 8)

    def hclose(p):
        # saturate horizontal weak runs within each 32-px word
        p |= (p << 1) & m1l
        p |= (p << 2) & m2l
        p |= (p << 4) & m4l
        p |= (p << 8) & m8l
        p |= (p << 16) & m16l
        p |= (p >> 1) & m1r
        p |= (p >> 2) & m2r
        p |= (p >> 4) & m4r
        p |= (p >> 8) & m8r
        p |= (p >> 16) & m16r
        return p

    def hshift(p):
        # pixel-space left/right neighbors within and across words
        left = (p << 1) | jnp.pad(p, ((0, 0), (1, 0)))[:, :-1] >> 31
        right = (p >> 1) | jnp.pad(p, ((0, 0), (0, 1)))[:, 1:] << 31
        return p | left | right

    def step(cur):
        row = hshift(cur)
        grown = row | jnp.pad(row, ((1, 0), (0, 0)))[:-1] \
            | jnp.pad(row, ((0, 1), (0, 0)))[1:]
        return hclose((k & grown) | cur)

    def body(state):
        cur, _ = state
        new = step(step(cur))
        return new, jnp.any(new != cur)

    final, _ = jax.lax.while_loop(lambda st: st[1], body,
                                  (hclose(s) & ~s | s, jnp.asarray(True)))
    return _unpack_bits(final, w)


def _percentile_from_hist(csum: jnp.ndarray, n: int, q: float) -> jnp.ndarray:
    pos = jnp.float32(q / 100.0 * (n - 1))
    k = jnp.floor(pos).astype(jnp.int32)
    frac = pos - k
    # value at sorted index i = searchsorted(csum, i+1)
    v0 = jnp.searchsorted(csum, k + 1, side="left")
    v1 = jnp.searchsorted(csum, k + 2, side="left")
    v1 = jnp.where(k + 1 < n, v1, v0)
    return v0.astype(jnp.float32) * (1 - frac) + v1.astype(jnp.float32) * frac


def percentiles_u8(img_u8: jnp.ndarray, qs) -> tuple:
    """np.percentile for several q's from ONE 256-bin histogram pass
    (the binary-search form costs 8 full-image reductions per rank — one
    Pallas histogram serves every threshold; ADVICE r1)."""
    from .pallas_kernels import histogram256
    n = img_u8.size
    flat = img_u8.astype(jnp.int32).reshape(-1)
    pad = (-n) % 8
    if pad:
        flat = jnp.pad(flat, (0, pad), constant_values=-1)
    # 8 rows keep the kernel's (T, 128, 256) compare-sum lanes busy
    hist = histogram256(flat.reshape(8, -1)).sum(axis=0)
    csum = jnp.cumsum(hist)
    return tuple(_percentile_from_hist(csum, n, q) for q in qs)


@jax.jit
def canny(layer: jnp.ndarray) -> jnp.ndarray:
    """Full reference edge stack on one float32 layer -> {0,1} float32
    (src/jpeg/edge_detection.py:64-86)."""
    u8 = to_uint8(layer)
    eq = clahe(u8, 0.75, (4, 4))
    blur = gaussian_blur_u8(eq, 3)
    blur = bilateral_u8(blur, 5, 75.0, 75.0)
    low, high = percentiles_u8(blur, (10.0, 30.0))
    gx, gy = sobel_xy(blur)
    # OpenCV L2gradient squares the thresholds
    return _canny_from_gradients(gx, gy, low * low, high * high, l2=True)
