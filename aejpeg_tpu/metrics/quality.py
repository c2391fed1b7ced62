"""PSNR / SSIM / MS-SSIM in JAX, matching the reference's metric semantics.

The reference uses piq (torch) — piq.psnr on RGB floats with data_range 1.0,
piq.ssim on OpenCV-grayscale uint8 with data_range 255, piq.multi_scale_ssim
on RGB floats (src/image/evaluation_metrics.py:50-109).  This module
re-implements those definitions:

 - gaussian window 11, sigma 1.5, k1=0.01, k2=0.03, valid-mode convolution
 - piq's input downsampling: f = max(1, round(min(H, W) / 256)) average pool
   before SSIM
 - MS-SSIM: Wang et al. 5-scale weights, relu'd cs terms
 - the grayscale quirk: cv2 RGB2GRAY uint8 fixed-point rounding
   (y = (4899 R + 9617 G + 1868 B + 8192) >> 14)

LPIPS lives in metrics/lpips.py (weights must be supplied; no hub access).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

MS_SSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def psnr(x, y, data_range: float = 1.0) -> jnp.ndarray:
    """PSNR over all pixels/channels (piq.psnr semantics, reduction=mean
    over the batch; here inputs are single images (H, W, C) or (H, W))."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    mse = jnp.mean((x - y) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def rgb_to_gray_u8(rgb_u8: jnp.ndarray) -> jnp.ndarray:
    """OpenCV cvtColor(RGB2GRAY) on uint8: BT.601 weights in Q15 fixed point
    with round-half-up — matches the installed cv2 (5.0) exactly.  (Older
    OpenCV used Q14 / 4899,9617,1868, which differs on ~0.2% of pixels by
    1 LSB.)"""
    r = rgb_u8[..., 0].astype(jnp.int32)
    g = rgb_u8[..., 1].astype(jnp.int32)
    b = rgb_u8[..., 2].astype(jnp.int32)
    y = (9798 * r + 19235 * g + 3735 * b + (1 << 14)) >> 15
    return y.astype(jnp.uint8)


@functools.lru_cache(maxsize=None)
def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    k /= k.sum()
    return k.astype(np.float32)


def _filter_valid(img: jnp.ndarray, k: np.ndarray) -> jnp.ndarray:
    """Separable valid-mode filtering over the last two dims of (C, H, W)."""
    kj = jnp.asarray(k)
    n = k.shape[0]
    # rows
    out = jnp.zeros(img[..., : img.shape[-2] - n + 1, :].shape, jnp.float32)
    for i in range(n):
        out = out + kj[i] * img[..., i:img.shape[-2] - n + 1 + i, :]
    img = out
    out = jnp.zeros(img[..., :, : img.shape[-1] - n + 1].shape, jnp.float32)
    for i in range(n):
        out = out + kj[i] * img[..., :, i:img.shape[-1] - n + 1 + i]
    return out


def _avg_pool(img: jnp.ndarray, f: int) -> jnp.ndarray:
    """(C, H, W) average pool with stride f (floor sizes, piq/torch
    F.avg_pool2d semantics)."""
    c, h, w = img.shape
    hh, ww = h // f, w // f
    img = img[:, :hh * f, :ww * f]
    return img.reshape(c, hh, f, ww, f).mean(axis=(2, 4))


def _ssim_components(x: jnp.ndarray, y: jnp.ndarray, data_range: float,
                     k1=0.01, k2=0.03):
    """(C, H, W) inputs -> (mean ssim, mean cs) over the valid map."""
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    k = _gaussian_window()
    mu_x = _filter_valid(x, k)
    mu_y = _filter_valid(y, k)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_x = _filter_valid(x * x, k) - mu_xx
    sigma_y = _filter_valid(y * y, k) - mu_yy
    sigma_xy = _filter_valid(x * y, k) - mu_xy
    cs = (2 * sigma_xy + c2) / (sigma_x + sigma_y + c2)
    ssim_map = ((2 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs
    return jnp.mean(ssim_map), jnp.mean(cs)


def _to_chw(img) -> jnp.ndarray:
    img = jnp.asarray(img, jnp.float32)
    if img.ndim == 2:
        return img[None]
    return jnp.transpose(img, (2, 0, 1))


def ssim(x, y, data_range: float = 1.0,
         downsample: bool = True) -> jnp.ndarray:
    """SSIM (piq semantics incl. the initial f = round(min(H,W)/256)
    average-pool downsample)."""
    xc, yc = _to_chw(x), _to_chw(y)
    if downsample:
        f = max(1, round(min(xc.shape[-2], xc.shape[-1]) / 256))
        if f > 1:
            xc = _avg_pool(xc, f)
            yc = _avg_pool(yc, f)
    s, _ = _ssim_components(xc, yc, data_range)
    return s


def ms_ssim(x, y, data_range: float = 1.0,
            weights=MS_SSIM_WEIGHTS) -> jnp.ndarray:
    """Multi-scale SSIM (Wang et al.; piq.multi_scale_ssim semantics with
    relu'd components)."""
    xc, yc = _to_chw(x), _to_chw(y)
    levels = len(weights)
    min_side = (11 - 1) * 2 ** (levels - 1) + 1
    if min(xc.shape[-2:]) < min_side:
        raise ValueError(
            f"ms_ssim requires images of at least {min_side}px per side "
            f"(got {xc.shape[-2:]}); piq imposes the same bound")
    vals = []
    for i in range(levels):
        s, cs = _ssim_components(xc, yc, data_range)
        vals.append(s if i == levels - 1 else cs)
        if i < levels - 1:
            xc = _avg_pool(xc, 2)
            yc = _avg_pool(yc, 2)
    vals = [jnp.maximum(v, 0.0) for v in vals]
    out = jnp.ones(())
    for v, wgt in zip(vals, weights):
        out = out * v ** wgt
    return out


class EvaluationMetrics:
    """API-parity wrapper (reference EvaluationMetrics,
    src/image/evaluation_metrics.py:31-139): psnr / ssim / ms_ssim / lpips
    on a pair of ImageData-likes (float32 [0,1] HWC)."""

    def __init__(self, original, compressed,
                 lpips_weights: Optional[str] = None):
        self._a = np.asarray(getattr(original, "data", original), np.float32)
        self._b = np.asarray(getattr(compressed, "data", compressed),
                             np.float32)
        self._lpips_weights = lpips_weights

    def psnr(self) -> float:
        return float(psnr(self._a, self._b, data_range=1.0))

    def ssim(self) -> float:
        ga = rgb_to_gray_u8(jnp.asarray((self._a * 255).astype(np.uint8)))
        gb = rgb_to_gray_u8(jnp.asarray((self._b * 255).astype(np.uint8)))
        return float(ssim(ga.astype(jnp.float32), gb.astype(jnp.float32),
                          data_range=255.0))

    def ms_ssim(self) -> float:
        return float(ms_ssim(self._a, self._b, data_range=1.0))

    def lpips(self) -> float:
        from .lpips import lpips_distance
        return float(lpips_distance(self._a, self._b,
                                    weights_path=self._lpips_weights))
