"""Transform-op golden tests against OpenCV (the reference's native
substrate: cv.dct / cv.resize INTER_AREA / INTER_LINEAR)."""

import cv2 as cv
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aejpeg_tpu.ops import dct, quant, resize, zigzag
from aejpeg_tpu.config import LUMA_QUANT, CHROMA_QUANT
from aejpeg_tpu.utils import quality_factor

SIZES = [4, 8, 16, 32, 64, 128]


# ------------------------------------------------------------------- zigzag
def test_zigzag_8_known():
    zz = zigzag.zigzag_indices(8)
    # canonical first/last entries of the JPEG zigzag for 8x8
    assert list(zz[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert zz[-1] == 63


@pytest.mark.parametrize("s", SIZES)
def test_zigzag_roundtrip(s):
    blocks = np.random.default_rng(s).integers(
        -500, 500, size=(3, s, s)).astype(np.int32)
    vecs = np.asarray(zigzag.zigzag_gather(jnp.asarray(blocks)))
    back = np.asarray(zigzag.zigzag_scatter(jnp.asarray(vecs), s))
    np.testing.assert_array_equal(back, blocks)
    # zigzag of a block equals block.ravel()[indices] (reference semantics,
    # src/jpeg/jpeg.py:584)
    np.testing.assert_array_equal(
        vecs[0], blocks[0].ravel()[zigzag.zigzag_indices(s)])


# ---------------------------------------------------------------------- DCT
@pytest.mark.parametrize("s", SIZES)
def test_dct_matches_opencv(s):
    rng = np.random.default_rng(s)
    x = (rng.random((4, s, s), np.float32) - 0.5) * 254
    want = np.stack([cv.dct(b) for b in x])
    got = np.asarray(jax.jit(dct.dct2)(x))
    tol = 2e-3 * s / 8  # f32 matmul vs OpenCV's internal path
    assert np.abs(got - want).max() < tol
    # inverse round-trips to the input
    back = np.asarray(jax.jit(dct.idct2)(got))
    assert np.abs(back - x).max() < tol


def test_dct_orthonormal():
    for s in SIZES:
        d = dct.dct_matrix(s).astype(np.float64)
        np.testing.assert_allclose(d @ d.T, np.eye(s), atol=1e-6)


# ------------------------------------------------------------------- resize
@pytest.mark.parametrize("shape,dst", [
    ((512, 512), (256, 256)),   # 4:2:0 even
    ((511, 513), (255, 256)),   # odd sizes, integer-division shapes
    ((512, 512), (512, 128)),   # 4:1:1
    ((333, 77), (333, 19)),     # 4:1:1 odd
])
def test_area_downsample_matches_opencv(shape, dst):
    rng = np.random.default_rng(0)
    img = rng.random(shape, np.float32) * 2 - 0.5
    want = cv.resize(img, (dst[1], dst[0]), interpolation=cv.INTER_AREA)
    got = np.asarray(jax.jit(
        lambda x: resize.resize2d(x, dst, "area"))(img))
    assert np.abs(got - want).max() < 1e-5


@pytest.mark.parametrize("shape,dst", [
    ((4, 512, 768), (256, 384)),    # 4:2:0 (bench geometry)
    ((4, 512, 768), (512, 192)),    # 4:1:1 width r=4
    ((2, 720, 480), (360, 240)),
    ((2, 16, 16), (4, 4)),          # outside the gate -> fallback
    ((2, 505, 632), (252, 316)),    # fractional -> fallback
])
def test_area_fast_path_bitwise_vs_matmul(shape, dst):
    """The integer-ratio strided fast path must be BITWISE equal to the
    dense-matmul formulation on CPU (same weights, same accumulation
    order); shapes outside the verified gate must fall back to the
    matmul itself, so equality holds for every input shape."""
    rng = np.random.default_rng(11)
    img = (rng.standard_normal(shape) * 120).astype(np.float32)
    h, w = shape[-2:]
    wh = jnp.asarray(resize.area_weights(h, dst[0]).astype(np.float32))
    ww = jnp.asarray(resize.area_weights(w, dst[1]).astype(np.float32))
    want = np.asarray(jax.jit(lambda x: jnp.einsum(
        "...ik,lk->...il",
        jnp.einsum("ij,...jk->...ik", wh, x, precision="highest"),
        ww, precision="highest"))(img))
    got = np.asarray(jax.jit(
        lambda x: resize.resize2d(x, dst, "area"))(img))
    assert np.array_equal(got.view(np.uint32), want.view(np.uint32))


@pytest.mark.parametrize("shape,dst", [
    ((256, 256), (512, 512)),
    ((255, 256), (511, 513)),
    ((512, 128), (512, 512)),
    ((333, 19), (333, 77)),
])
def test_linear_upsample_matches_opencv(shape, dst):
    rng = np.random.default_rng(1)
    img = rng.random(shape, np.float32) * 2 - 0.5
    want = cv.resize(img, (dst[1], dst[0]), interpolation=cv.INTER_LINEAR)
    got = np.asarray(jax.jit(
        lambda x: resize.resize2d(x, dst, "linear"))(img))
    assert np.abs(got - want).max() < 1e-5


# -------------------------------------------------------------------- quant
@pytest.mark.parametrize("base", [LUMA_QUANT, CHROMA_QUANT],
                         ids=["luma", "chroma"])
@pytest.mark.parametrize("quality", [1, 10, 25, 40, 50, 60, 75, 90, 99])
@pytest.mark.parametrize("s", SIZES)
def test_quant_matrix_matches_reference_rule(base, quality, s):
    """Re-derive the reference's exact table: floor-scale then OpenCV
    INTER_LINEAR resize then clip>=1 (src/jpeg/jpeg.py:707-724)."""
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    scaled = np.floor((scale * base.astype(np.float64) + 50) / 100)
    want = cv.resize(scaled, (s, s), interpolation=cv.INTER_LINEAR)
    want = np.clip(want, 1, None).astype(np.int32)
    got = quant.quantization_matrix(base, s, quality)
    np.testing.assert_array_equal(got, want)


def test_quality_factor_interpolation():
    # verified values from the reference rule (src/jpeg/jpeg.py:688-705)
    assert quality_factor(4, (4, 64), (20, 80)) == 80
    assert quality_factor(64, (4, 64), (20, 80)) == 20
    assert quality_factor(8, (8, 8), (20, 80)) == 50
    assert quality_factor(16, (4, 64), (20, 80)) == 50


@pytest.mark.parametrize("s", [8, 32])
def test_quantize_dequantize(s):
    rng = np.random.default_rng(7)
    q = quant.quantization_matrix(LUMA_QUANT, s, 50)
    x = (rng.random((5, s, s), np.float32) - 0.5) * 2000
    hi, lo = quant.reciprocal_table(q)
    levels = np.asarray(jax.jit(quant.quantize)(x, hi, lo))
    want = np.round(x.astype(np.float64) / q).astype(np.int32)
    np.testing.assert_array_equal(levels, want)
    deq = np.asarray(jax.jit(quant.dequantize)(jnp.asarray(levels),
                                               jnp.asarray(q)))
    np.testing.assert_array_equal(deq, (levels * q).astype(np.float32))
