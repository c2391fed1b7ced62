"""TPU acceptance: batch-vs-single container BYTE identity on real
hardware.

The CPU suite asserts this identity on the virtual backend
(tests/test_batch_encode.py), but the TPU compiles different programs for
the batched and per-image shapes, and through round 3 the identity
silently failed there: under --xla_allow_excess_precision=true (forced by
the harness) the double-float32 u8->f32 conversion contracted to a naive
multiply, putting 126/256 pixel values 1 ulp off the host loader and
flipping rare CLAHE/Canny decisions on the chroma layers.  The exact
256-entry LUT gather (ops/pallas_kernels.py u8_to_unit_exact) fixed it;
this test pins the guarantee to the hardware.

Run: AEJPEG_TEST_TPU=1 python -m pytest tests/tpu/test_identity.py -q
"""

import glob

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="TPU acceptance test (AEJPEG_TEST_TPU=1 + real chip)")

LIVE = ("/root/reference/test_images/"
        "LIVE_image_quality_assessment_database")


def _load(n):
    import imageio.v3 as iio
    from aejpeg_tpu.io.image import ImageData
    out = []
    for p in sorted(glob.glob(f"{LIVE}/*.bmp")):
        im = iio.imread(p)
        if im.shape == (512, 768, 3):
            out.append(ImageData(im.astype(np.float32) / 255.0, im.shape,
                                 ".bmp"))
        if len(out) == n:
            break
    return out


def test_u8_conversion_exact_on_tpu():
    from aejpeg_tpu.ops.pallas_kernels import u8_to_unit_exact
    u8 = np.arange(256, dtype=np.uint8).reshape(2, 8, 16)
    got = np.asarray(u8_to_unit_exact(jax.numpy.asarray(u8)))
    np.testing.assert_array_equal(got, u8.astype(np.float32) / 255.0)


def test_batch_vs_single_bytes_on_tpu():
    from aejpeg_tpu.codec.batch_encode import encode_batch
    from aejpeg_tpu.codec.pipeline import Codec
    from aejpeg_tpu.config import CodecConfig
    imgs = _load(3)
    cfg = CodecConfig("YCoCg", (20, 80), (4, 64))
    blobs = encode_batch(imgs, cfg)
    for im, blob in zip(imgs, blobs):
        assert Codec(cfg).compress(im) == blob
