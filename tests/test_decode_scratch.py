"""Scratch-arena reuse in decode_batch must not leak stale coefficients.

The dense tables come from per-thread UNINITIALIZED scratch (see
codec/batch_decode.py); zero coefficients inside leaf rows are only
defined because the C++ scatter memsets each leaf row on entry
(entropy.cpp TableScatter::next_leaf).  The first decode in a fresh
process gets kernel-zeroed pages, so this failure mode is invisible to
single-call tests — this one poisons the arena with a different batch in
between and asserts bit-stable output.
"""

import numpy as np
import pytest

from aejpeg_tpu import CodecConfig
from aejpeg_tpu.codec.batch_decode import decode_batch
from aejpeg_tpu.codec.batch_encode import encode_batch
from aejpeg_tpu.io.image import ImageData


def _images(seed, n=2, h=96, w=128):
    import cv2 as cv
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        small = rng.random((12, 16, 3), np.float32)
        img = np.clip(cv.resize(small, (w, h),
                                interpolation=cv.INTER_CUBIC), 0, 1)
        out.append(ImageData.from_array(img.astype(np.float32),
                                        extension=".png"))
    return out


@pytest.mark.parametrize("level", [-1, 9], ids=["sparse", "zlib"])
def test_decode_scratch_reuse_is_bit_stable(level):
    cfg = CodecConfig("YCoCg", (20, 80), (4, 32), entropy_level=level)
    blobs_a = encode_batch(_images(1), cfg)
    blobs_b = encode_batch(_images(2), cfg)

    first = [np.asarray(im.data) for im in decode_batch(blobs_b)]
    # poison the thread's scratch arenas with a different batch
    decode_batch(blobs_a)
    again = [np.asarray(im.data) for im in decode_batch(blobs_b)]

    for x, y in zip(first, again):
        np.testing.assert_array_equal(x, y)
