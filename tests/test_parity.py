"""Codec-vs-reference-oracle parity tests (BASELINE configs #1-#3 shapes).

Targets from BASELINE.json: container structure identical; coefficients
bit-equal except rare DCT rounding ties; decoded PSNR within 0.1 dB of the
oracle at identical settings.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from aejpeg_tpu import CodecConfig
from aejpeg_tpu.codec.pipeline import Codec
from aejpeg_tpu.io.image import ImageData
from aejpeg_tpu.io.container import ContainerReader

from reference_model import OracleCodec, edge_cv2


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(1.0 / mse) if mse > 0 else np.inf


@pytest.fixture(scope="module")
def lena():
    return ImageData.load("/root/reference/test_images/lena.png")


def _cv2_edge_fn(layer):
    """Adapter: oracle edge stack on a device layer (tree-shape parity)."""
    return jnp.asarray(edge_cv2(np.asarray(layer)))


@pytest.mark.parametrize("space", ["YCbCr", "YCoCg"])
def test_uniform_grid_parity(lena, space):
    """Config #1: lena, q50, uniform 8x8 — structure identical, coefficients
    near-bit-exact, PSNR within 0.1 dB."""
    cfg = CodecConfig(space, (50, 50), (8, 8))
    mine = Codec(cfg, edge_fn=_cv2_edge_fn).compress(lena)
    oracle = OracleCodec(space, (50, 50), (8, 8)).compress(lena.data)

    r_m, r_o = ContainerReader(mine), ContainerReader(oracle)
    assert r_m.metadata == r_o.metadata
    total = agree = 0
    for lm, lo in zip(r_m.read_layers(), r_o.read_layers()):
        assert lm.bits_len == lo.bits_len
        assert lm.root_size == lo.root_size
        assert lm.states_bytes == lo.states_bytes
        assert lm.coeffs.shape == lo.coeffs.shape
        total += lm.coeffs.size
        agree += int((lm.coeffs == lo.coeffs).sum())
    assert agree / total > 0.9999, f"coeff agreement {agree / total:.6f}"

    out_m = Codec().decompress(mine).data
    out_o = OracleCodec().decompress(oracle)
    p_m = _psnr(lena.data, out_m)
    p_o = _psnr(lena.data, out_o)
    assert abs(p_m - p_o) < 0.1, f"PSNR {p_m:.3f} vs oracle {p_o:.3f}"


def test_quadtree_parity_same_edges(lena):
    """Config #2 shape: quadtree active (q20-80, blocks 8-32).  With the
    oracle's own edge maps injected, trees must serialize identically and
    PSNR must be within 0.1 dB."""
    cfg = CodecConfig("YCbCr", (20, 80), (8, 32))
    mine = Codec(cfg, edge_fn=_cv2_edge_fn).compress(lena)
    oracle = OracleCodec("YCbCr", (20, 80), (8, 32)).compress(lena.data)

    r_m, r_o = ContainerReader(mine), ContainerReader(oracle)
    for lm, lo in zip(r_m.read_layers(), r_o.read_layers()):
        assert lm.states_bytes == lo.states_bytes
        assert lm.coeffs.shape == lo.coeffs.shape
        agree = (lm.coeffs == lo.coeffs).mean()
        assert agree > 0.9999, f"coeff agreement {agree:.6f}"

    p_m = _psnr(lena.data, Codec().decompress(mine).data)
    p_o = _psnr(lena.data, OracleCodec().decompress(oracle))
    assert abs(p_m - p_o) < 0.1, f"PSNR {p_m:.3f} vs oracle {p_o:.3f}"


def test_cross_decode(lena):
    """My decoder must decode oracle bitstreams and vice versa."""
    cfg = CodecConfig("OKLAB", (30, 70), (4, 32))
    mine = Codec(cfg, edge_fn=_cv2_edge_fn).compress(lena)
    oracle_blob = OracleCodec("OKLAB", (30, 70), (4, 32)).compress(lena.data)

    out_cross1 = Codec().decompress(oracle_blob).data     # mine on oracle's
    out_cross2 = OracleCodec().decompress(mine)           # oracle on mine
    assert _psnr(lena.data, out_cross1) > 25
    assert _psnr(lena.data, out_cross2) > 25
    # decoding the same blob both ways must agree almost exactly
    out_same_m = Codec().decompress(oracle_blob).data
    out_same_o = OracleCodec().decompress(oracle_blob)
    assert np.abs(out_same_m - out_same_o).max() < 2e-3


def test_own_canny_quality_close_to_oracle(lena):
    """With MY Canny stack (not cv2), tree shapes may differ slightly;
    rate/quality must stay close to the oracle's (edge maps only steer the
    partition, never decode correctness)."""
    cfg = CodecConfig("YCoCg", (20, 80), (4, 64))
    mine = Codec(cfg).compress(lena)       # default edge_fn = our canny
    oracle_blob = OracleCodec("YCoCg", (20, 80), (4, 64)).compress(lena.data)

    p_m = _psnr(lena.data, Codec().decompress(mine).data)
    p_o = _psnr(lena.data, OracleCodec().decompress(oracle_blob))
    assert abs(p_m - p_o) < 0.35, f"PSNR {p_m:.3f} vs {p_o:.3f}"
    assert abs(len(mine) - len(oracle_blob)) / len(oracle_blob) < 0.05
