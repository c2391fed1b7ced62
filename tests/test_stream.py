"""Continuous-batching stream API: mixed shapes/settings, input order."""

import numpy as np
import pytest

from aejpeg_tpu import CodecConfig
from aejpeg_tpu.codec.pipeline import Codec
from aejpeg_tpu.codec.stream import (batches_by_shape, decode_stream,
                                     encode_stream)
from aejpeg_tpu.io.image import ImageData


@pytest.fixture(scope="module")
def mixed_images():
    import cv2 as cv
    rng = np.random.default_rng(5)
    shapes = [(64, 96), (64, 96), (96, 64), (64, 96), (48, 48)]
    out = []
    for h, w in shapes:
        small = rng.random((8, 10, 3), np.float32)
        img = np.clip(cv.resize(small, (w, h),
                                interpolation=cv.INTER_CUBIC), 0, 1)
        out.append(ImageData.from_array(img.astype(np.float32),
                                        extension=".png"))
    return out


def test_batches_by_shape_order_and_bound(mixed_images):
    batches = batches_by_shape(mixed_images, batch_size=2)
    covered = sorted(i for b in batches for i in b)
    assert covered == list(range(len(mixed_images)))
    for b in batches:
        assert len(b) <= 2
        shapes = {mixed_images[i].original_shape[:2] for i in b}
        assert len(shapes) == 1
    # order preserved within a shape group
    same = [i for b in batches for i in b
            if mixed_images[i].original_shape[:2] == (64, 96)]
    assert same == sorted(same)


def test_encode_stream_matches_per_image(mixed_images):
    cfg = CodecConfig("YCoCg", (30, 70), (4, 16))
    blobs = encode_stream(mixed_images, cfg, batch_size=2, lookahead=2)
    for img, blob in zip(mixed_images, blobs):
        assert blob == Codec(cfg).compress(img)


def test_decode_stream_roundtrip(mixed_images):
    cfg = CodecConfig("YCoCg", (30, 70), (4, 16))
    blobs = encode_stream(mixed_images, cfg, batch_size=3)
    outs = decode_stream(blobs, batch_size=2)
    for img, out in zip(mixed_images, outs):
        assert out.data.shape == img.data.shape
        mse = np.mean((out.data - img.data) ** 2)
        assert 10 * np.log10(1 / mse) > 25


def test_decode_stream_mixed_settings(mixed_images):
    a = encode_stream(mixed_images[:2], CodecConfig("YCoCg", (30, 70),
                                                    (4, 16)))
    b = encode_stream(mixed_images[2:3], CodecConfig("YCbCr", (50, 50),
                                                     (8, 8)))
    outs = decode_stream(a + b)
    assert [o.data.shape for o in outs] == [
        i.data.shape for i in mixed_images[:3]]
