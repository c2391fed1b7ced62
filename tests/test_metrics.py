"""Metric tests: cv2 grayscale parity, SSIM/MS-SSIM sanity + known values,
LPIPS architecture shape checks with synthetic weights."""

import cv2 as cv
import jax.numpy as jnp
import numpy as np
import pytest

from aejpeg_tpu.metrics import (psnr, ssim, ms_ssim, rgb_to_gray_u8,
                                EvaluationMetrics)


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(0)
    small = rng.random((32, 32, 3), np.float32)
    a = cv.resize(small, (256, 256), interpolation=cv.INTER_CUBIC)
    a = np.clip(a, 0, 1).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.02, a.shape).astype(np.float32), 0, 1)
    return a, b


def test_psnr_known_value():
    a = np.zeros((16, 16, 3), np.float32)
    b = np.full((16, 16, 3), 0.1, np.float32)
    assert abs(float(psnr(a, b)) - 20.0) < 1e-4


def test_gray_matches_cv2(pair):
    a = (pair[0] * 255).astype(np.uint8)
    want = cv.cvtColor(a, cv.COLOR_RGB2GRAY)
    got = np.asarray(rgb_to_gray_u8(jnp.asarray(a)))
    np.testing.assert_array_equal(got, want)


def test_ssim_bounds_and_identity(pair):
    a, b = pair
    assert abs(float(ssim(a, a)) - 1.0) < 1e-6
    v = float(ssim(a, b))
    assert 0.5 < v < 1.0
    # more distortion -> lower ssim
    c = np.clip(a + 0.1 * np.random.default_rng(1).standard_normal(
        a.shape).astype(np.float32), 0, 1)
    assert float(ssim(a, c)) < v


def test_ms_ssim_bounds(pair):
    a, b = pair
    assert abs(float(ms_ssim(a, a)) - 1.0) < 1e-5
    v = float(ms_ssim(a, b))
    assert 0.6 < v < 1.0
    assert v > float(ssim(a, b)) - 0.2


def test_evaluation_metrics_wrapper(pair):
    m = EvaluationMetrics(pair[0], pair[1])
    assert m.psnr() > 25
    assert 0 < m.ssim() <= 1
    assert 0 < m.ms_ssim() <= 1


def test_lpips_architecture(tmp_path):
    """Synthetic weights: checks shapes/flow, not calibration."""
    from aejpeg_tpu.metrics import lpips as L
    rng = np.random.default_rng(0)
    arrays = {}
    in_ch = 3
    for i, (out_ch, k, s, p) in enumerate(L._ALEX_CONVS):
        arrays[f"conv{i}_w"] = rng.normal(
            0, 0.05, (out_ch, in_ch, k, k)).astype(np.float32)
        arrays[f"conv{i}_b"] = np.zeros(out_ch, np.float32)
        arrays[f"lin{i}_w"] = np.abs(rng.normal(
            0, 0.01, (1, out_ch, 1, 1))).astype(np.float32)
        in_ch = out_ch
    path = tmp_path / "fake_lpips.npz"
    np.savez(path, **arrays)

    a = rng.random((64, 64, 3)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.standard_normal(a.shape).astype(np.float32),
                0, 1)
    d_same = float(L.lpips_distance(a, a, weights_path=str(path)))
    d_diff = float(L.lpips_distance(a, b, weights_path=str(path)))
    assert d_same < 1e-6
    assert d_diff > d_same
