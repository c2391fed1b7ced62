"""Edge-stack golden tests vs OpenCV.

Each stage of ops/canny.py is compared against the exact cv2 call used by
the reference (src/jpeg/edge_detection.py:64-86).  Stage tolerances:
integer stages must match exactly or within 1 LSB (documented per stage);
the end-to-end edge map is compared by pixel agreement rate, since a
single-LSB threshold difference can flip individual edge pixels without
changing tree behavior materially.
"""

import cv2 as cv
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aejpeg_tpu.ops import canny as cn


@pytest.fixture(scope="module")
def luma():
    """Natural-image-like luminance in [0,1]: lena's luma layer."""
    img = cv.imread("/root/reference/test_images/lena.png")
    rgb = cv.cvtColor(img, cv.COLOR_BGR2RGB).astype(np.float32) / 255.0
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    return y.astype(np.float32)


@pytest.fixture(scope="module")
def chroma():
    """Chroma-like layer with negative values (uint8 wrap parity)."""
    img = cv.imread("/root/reference/test_images/peppers.tiff")
    rgb = cv.cvtColor(img, cv.COLOR_BGR2RGB).astype(np.float32) / 255.0
    co = 0.5 * rgb[..., 0] - 0.5 * rgb[..., 2]
    return cv.resize(co, (128, 128), interpolation=cv.INTER_AREA)


def test_to_uint8_wrap(chroma):
    want = (chroma * 255).astype(np.uint8)
    got = np.asarray(jax.jit(cn.to_uint8)(chroma))
    np.testing.assert_array_equal(got, want)


def test_clahe_matches_opencv(luma):
    u8 = (luma * 255).astype(np.uint8)
    ref = cv.createCLAHE(clipLimit=0.75, tileGridSize=(4, 4)).apply(u8)
    got = np.asarray(jax.jit(cn.clahe)(u8))
    diff = np.abs(got.astype(int) - ref.astype(int))
    assert (diff > 1).mean() == 0, f">1 LSB at {(diff > 1).mean():.4f}"
    assert (diff > 0).mean() < 0.02, f"1-LSB rate {(diff > 0).mean():.4f}"


def test_gaussian_matches_opencv(luma):
    u8 = (luma * 255).astype(np.uint8)
    ref = cv.GaussianBlur(u8, (3, 3), 0)
    got = np.asarray(jax.jit(cn.gaussian_blur_u8)(u8))
    np.testing.assert_array_equal(got, ref)


def test_bilateral_matches_opencv(luma):
    """cv2 5.0's bilateral takes a SIMD/IPP path whose rounding differs from
    the textbook algorithm by 1 LSB on ~half the pixels (a plain numpy spec
    implementation shows the same gap), so exact match is not achievable
    portably — assert the 1-LSB bound."""
    u8 = (luma * 255).astype(np.uint8)
    blur = cv.GaussianBlur(u8, (3, 3), 0)
    ref = cv.bilateralFilter(blur, 5, 75, 75)
    got = np.asarray(jax.jit(cn.bilateral_u8)(blur))
    diff = np.abs(got.astype(int) - ref.astype(int))
    assert diff.max() <= 1


def test_percentiles_match_numpy(luma):
    u8 = (luma * 255).astype(np.uint8)
    qs = (10.0, 30.0, 50.0, 99.5)
    got = jax.jit(cn.percentiles_u8, static_argnums=1)(u8, qs)
    for q, g in zip(qs, got):
        want = np.percentile(u8, q)
        assert abs(float(g) - want) < 1e-4, (q, float(g), want)


def test_sobel_matches_opencv(luma):
    u8 = (luma * 255).astype(np.uint8)
    wx = cv.Sobel(u8, cv.CV_32F, 1, 0, ksize=3)
    wy = cv.Sobel(u8, cv.CV_32F, 0, 1, ksize=3)
    gx, gy = jax.jit(cn.sobel_xy)(u8)
    np.testing.assert_array_equal(np.asarray(gx, np.float32), wx)
    np.testing.assert_array_equal(np.asarray(gy, np.float32), wy)


def test_canny_core_matches_opencv(luma):
    """NMS + hysteresis on identical gradients and thresholds."""
    u8 = (luma * 255).astype(np.uint8)
    blur = cv.bilateralFilter(cv.GaussianBlur(u8, (3, 3), 0), 5, 75, 75)
    low = np.percentile(blur, 10)
    high = np.percentile(blur, 30)
    ref = cv.Canny(blur, low, high, apertureSize=3, L2gradient=True) / 255.0

    gx, gy = cn.sobel_xy(blur)
    got = np.asarray(cn._canny_from_gradients(
        gx, gy, jnp.float32(low * low), jnp.float32(high * high)))
    agree = (got == ref).mean()
    assert agree > 0.995, f"edge agreement {agree:.4f}"


def test_full_stack_agreement(luma):
    """Whole pipeline vs the reference's cv2 pipeline: edge maps must agree
    on the overwhelming majority of pixels (single-LSB threshold flips are
    tolerated; the tree serialization stores states explicitly so decode
    correctness never depends on this)."""
    scaled = (luma * 255).astype(np.uint8)
    eq = cv.createCLAHE(clipLimit=0.75, tileGridSize=(4, 4)).apply(scaled)
    blur = cv.GaussianBlur(eq, (3, 3), 0)
    blur = cv.bilateralFilter(blur, 5, 75, 75)
    lo = np.percentile(blur, 10)
    hi = np.percentile(blur, 30)
    ref = cv.Canny(blur, lo, hi, apertureSize=3, L2gradient=True) / 255.0

    got = np.asarray(jax.jit(cn.canny)(luma))
    agree = (got == ref).mean()
    assert agree > 0.98, f"full-stack agreement {agree:.4f}"
