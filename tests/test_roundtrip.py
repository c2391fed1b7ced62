"""End-to-end codec round-trip tests.

The oracle for quality is PSNR against the input; structural correctness is
checked via a numpy re-implementation of the decode math on the container
payloads (independent of the device decode path).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from aejpeg_tpu import CodecConfig
from aejpeg_tpu.codec.pipeline import Codec
from aejpeg_tpu.io.image import ImageData
from aejpeg_tpu.io.container import ContainerReader


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(1.0 / mse) if mse > 0 else np.inf


def _test_image(shape=(96, 80), seed=0):
    """Smooth random image (random noise compresses terribly and hides
    quality regressions behind quantization)."""
    rng = np.random.default_rng(seed)
    small = rng.random((shape[0] // 8, shape[1] // 8, 3), np.float32)
    import cv2 as cv
    img = cv.resize(small, (shape[1], shape[0]),
                    interpolation=cv.INTER_CUBIC)
    return ImageData(np.clip(img, 0, 1).astype(np.float32),
                     (shape[0], shape[1], 3), ".png")


def _zero_edges(layer):
    return jnp.zeros(layer.shape, jnp.float32)


# measured q50 PSNR floors per space on the smooth test image (ICtCp/ICaCb
# sit lower because of 4:1:1 chroma subsampling)
_Q50_FLOOR = {"YCbCr": 29, "YCoCg": 29, "OKLAB": 26.5, "ICtCp": 24.5}


@pytest.mark.parametrize("space", sorted(_Q50_FLOOR))
def test_uniform_grid_roundtrip(space):
    """Uniform 8x8 grid (block range (8,8)): BASELINE config #1 shape."""
    img = _test_image()
    codec = Codec(CodecConfig(space, (50, 50), (8, 8)), edge_fn=_zero_edges)
    blob = codec.compress(img)
    out = Codec(edge_fn=_zero_edges).decompress(blob)
    assert out.data.shape == img.data.shape
    p = _psnr(img.data, out.data)
    assert p > _Q50_FLOOR[space], f"{space}: PSNR {p:.2f}"
    assert out.extension == ".png"


def test_quadtree_roundtrip_synthetic_edges():
    """Edges only in one quadrant -> small blocks there, large elsewhere."""
    img = _test_image((128, 128), seed=1)

    def edge_fn(layer):
        e = np.zeros(layer.shape, np.float32)
        if layer.shape[0] >= 64:
            e[10:50, 10:50] = (np.random.default_rng(0).random((40, 40))
                               < 0.1).astype(np.float32)
        return jnp.asarray(e)

    codec = Codec(CodecConfig("YCoCg", (20, 80), (4, 64)), edge_fn=edge_fn)
    blob = codec.compress(img)
    out = Codec(edge_fn=edge_fn).decompress(blob)
    p = _psnr(img.data, out.data)
    assert p > 28, f"PSNR {p:.2f}"


def test_container_is_self_describing():
    img = _test_image((64, 48), seed=2)
    codec = Codec(CodecConfig("ICtCp", (30, 70), (4, 16)),
                  edge_fn=_zero_edges)
    blob = codec.compress(img)
    meta = ContainerReader(blob).metadata
    assert (meta.height, meta.width) == (64, 48)
    assert meta.color_space == "ICtCp"
    assert (meta.quality_min, meta.quality_max) == (30, 70)
    assert (meta.block_size_min, meta.block_size_max) == (4, 16)
    assert meta.extension == ".png"
    assert meta.num_layers == 3


def test_odd_shapes_roundtrip():
    """Non-pow2, odd dimensions exercise absent nodes + reflect padding."""
    img = _test_image((67, 105), seed=3)
    codec = Codec(CodecConfig("YCbCr", (40, 80), (4, 32)),
                  edge_fn=_zero_edges)
    out = Codec(edge_fn=_zero_edges).decompress(codec.compress(img))
    assert out.data.shape == (67, 105, 3)
    assert _psnr(img.data, out.data) > 28


def test_compression_actually_compresses():
    img = _test_image((128, 128), seed=4)
    codec = Codec(CodecConfig("YCoCg", (40, 80), (8, 64)),
                  edge_fn=_zero_edges)
    blob = codec.compress(img)
    assert len(blob) < img.raw_rgb_bytes / 4
