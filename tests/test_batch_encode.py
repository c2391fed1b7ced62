"""Batched encoder must produce payload-identical containers to the
per-image Codec (states, root sizes, coefficient streams)."""

import numpy as np
import pytest

from aejpeg_tpu import CodecConfig
from aejpeg_tpu.codec.pipeline import Codec
from aejpeg_tpu.codec.batch_encode import encode_batch
from aejpeg_tpu.io.container import ContainerReader
from aejpeg_tpu.io.image import ImageData


@pytest.fixture(scope="module")
def images():
    import cv2 as cv
    rng = np.random.default_rng(0)
    out = []
    for i in range(3):
        small = rng.random((12, 16, 3), np.float32)
        img = np.clip(cv.resize(small, (128, 96),
                                interpolation=cv.INTER_CUBIC), 0, 1)
        out.append(ImageData.from_array(img.astype(np.float32),
                                        extension=".png"))
    return out


def _payloads(blob):
    r = ContainerReader(blob)
    return r.metadata, r.read_layers()


@pytest.mark.parametrize("cfg", [
    CodecConfig("YCoCg", (20, 80), (4, 32)),
    CodecConfig("YCbCr", (50, 50), (8, 8)),
    CodecConfig("ICtCp", (30, 70), (4, 16)),
], ids=["quadtree", "uniform", "ictcp"])
def test_batch_matches_single(images, cfg):
    blobs = encode_batch(images, cfg)
    assert len(blobs) == len(images)
    for img, blob in zip(images, blobs):
        single = Codec(cfg).compress(img)
        meta_b, layers_b = _payloads(blob)
        meta_s, layers_s = _payloads(single)
        assert meta_b == meta_s
        for lb, ls in zip(layers_b, layers_s):
            assert lb.bits_len == ls.bits_len
            assert lb.root_size == ls.root_size
            assert lb.states_bytes == ls.states_bytes
            np.testing.assert_array_equal(lb.coeffs, ls.coeffs)


def test_batch_decodes(images):
    cfg = CodecConfig("YCoCg", (20, 80), (4, 32))
    blobs = encode_batch(images, cfg)
    for img, blob in zip(images, blobs):
        out = Codec().decompress(blob)
        mse = np.mean((out.data - img.data) ** 2)
        assert 10 * np.log10(1 / mse) > 25


def test_uint8_source_matches_float_path(images):
    """Images that are exactly uint8-sourced take the uint8 upload path;
    containers must be identical to the float path (and to the per-image
    Codec)."""
    cfg = CodecConfig("YCoCg", (20, 80), (4, 32))
    u8_imgs = [ImageData.from_array(
        (np.round(im.data * 255).astype(np.uint8).astype(np.float32) / 255.0),
        extension=".png") for im in images]
    blobs = encode_batch(u8_imgs, cfg)
    for img, blob in zip(u8_imgs, blobs):
        single = Codec(cfg).compress(img)
        meta_b, layers_b = _payloads(blob)
        meta_s, layers_s = _payloads(single)
        assert meta_b == meta_s
        for lb, ls in zip(layers_b, layers_s):
            assert lb.states_bytes == ls.states_bytes
            np.testing.assert_array_equal(lb.coeffs, ls.coeffs)


def test_u8_to_unit_float_exhaustive():
    """Device uint8->f32/255 must be bit-identical to the host loader for
    every possible input value (XLA's compiled divide is not correctly
    rounded, hence the df32 formulation)."""
    import jax.numpy as jnp
    from aejpeg_tpu.codec.batch_encode import _u8_to_unit_float
    u8 = np.arange(256, dtype=np.uint8)
    host = u8.astype(np.float32) / 255.0
    np.testing.assert_array_equal(np.asarray(_u8_to_unit_float(
        jnp.asarray(u8))), host)


def test_u8_closed_form_matches_lut_oracle():
    """The round-5 closed-form integer u8->f32 construction must agree
    bit-for-bit with the round-4 Pallas LUT gather (independent oracle)
    on a production-shaped batch, including every value and odd shapes."""
    import jax.numpy as jnp
    from aejpeg_tpu.ops.pallas_kernels import u8_to_unit_exact, u8_to_unit_lut
    rng = np.random.default_rng(5)
    for shape in [(2, 64, 96, 3), (256,), (7, 13)]:
        x = rng.integers(0, 256, size=shape, dtype=np.uint8)
        a = np.asarray(u8_to_unit_exact(jnp.asarray(x)))
        b = np.asarray(u8_to_unit_lut(jnp.asarray(x)))
        assert np.array_equal(a.view(np.uint32), b.view(np.uint32))
        host = x.astype(np.float32) / 255.0
        assert np.array_equal(a.view(np.uint32), host.view(np.uint32))


@pytest.mark.parametrize("shape", [(100, 120), (94, 50)],
                         ids=["mild-overhang", "deep-reflect"])
def test_batch_boundary_blocks_match_single(shape):
    """Shapes not divisible by the block sizes force the boundary bucket
    (per-block reflect padding, incl. periodic wrap when a block is more
    than twice as large as its available region)."""
    import cv2 as cv
    rng = np.random.default_rng(7)
    h, w = shape
    imgs = []
    for _ in range(2):
        small = rng.random((10, 12, 3), np.float32)
        img = np.clip(cv.resize(small, (w, h),
                                interpolation=cv.INTER_CUBIC), 0, 1)
        imgs.append(ImageData.from_array(img.astype(np.float32),
                                         extension=".png"))
    cfg = CodecConfig("YCoCg", (20, 80), (4, 64))
    blobs = encode_batch(imgs, cfg)
    for img, blob in zip(imgs, blobs):
        single = Codec(cfg).compress(img)
        meta_b, layers_b = _payloads(blob)
        meta_s, layers_s = _payloads(single)
        assert meta_b == meta_s
        for lb, ls in zip(layers_b, layers_s):
            assert lb.states_bytes == ls.states_bytes
            np.testing.assert_array_equal(lb.coeffs, ls.coeffs)


def test_batch_shape_mismatch_raises(images):
    bad = ImageData.from_array(np.zeros((64, 64, 3), np.float32))
    with pytest.raises(ValueError):
        encode_batch(images + [bad], CodecConfig())


# ---------------------------------------------------------------- decoder

def test_decode_batch_matches_single(images):
    from aejpeg_tpu.codec.batch_decode import decode_batch
    cfg = CodecConfig("YCoCg", (20, 80), (4, 32))
    blobs = encode_batch(images, cfg)
    outs = decode_batch(blobs)
    assert len(outs) == len(images)
    for img, blob, out in zip(images, blobs, outs):
        single = Codec().decompress(blob)
        # identical jnp ops, but XLA batched matmuls may reassociate vs the
        # single-image shapes: allow 1-2 ulp
        np.testing.assert_allclose(out.data, single.data, rtol=0, atol=3e-6)
        assert out.extension == single.extension
        mse = np.mean((out.data - img.data) ** 2)
        assert 10 * np.log10(1 / mse) > 25


@pytest.mark.parametrize("shape", [(100, 120), (94, 50)],
                         ids=["mild-overhang", "deep-reflect"])
def test_decode_batch_boundary_shapes(shape):
    import cv2 as cv
    from aejpeg_tpu.codec.batch_decode import decode_batch
    rng = np.random.default_rng(11)
    h, w = shape
    imgs = []
    for _ in range(2):
        small = rng.random((8, 9, 3), np.float32)
        img = np.clip(cv.resize(small, (w, h),
                                interpolation=cv.INTER_CUBIC), 0, 1)
        imgs.append(ImageData.from_array(img.astype(np.float32)))
    cfg = CodecConfig("YCbCr", (30, 70), (4, 64))
    blobs = encode_batch(imgs, cfg)
    for blob, out in zip(blobs, decode_batch(blobs)):
        single = Codec().decompress(blob)
        np.testing.assert_allclose(out.data, single.data, rtol=0, atol=3e-6)


def test_decode_batch_rejects_mixed_settings(images):
    from aejpeg_tpu.codec.batch_decode import decode_batch
    a = encode_batch(images[:1], CodecConfig("YCoCg", (20, 80), (4, 32)))
    b = encode_batch(images[:1], CodecConfig("YCbCr", (20, 80), (4, 32)))
    with pytest.raises(ValueError):
        decode_batch(a + b)


def test_native_replay_matches_python(images):
    """The C++ stack replay must reproduce the Python replay exactly."""
    from aejpeg_tpu.codec import quadtree as qt
    from aejpeg_tpu.io.container import ContainerReader
    cfg = CodecConfig("YCoCg", (20, 80), (4, 32))
    blob = encode_batch(images[:1], cfg)[0]
    for payload in ContainerReader(blob).read_layers():
        states = qt.unpack_states(payload.states_bytes, payload.bits_len)
        # force the pure-Python path by replaying inline
        sizes_p, ys_p, xs_p = [], [], []
        stack = [(0, 0, payload.root_size)]
        idx = 0
        while stack and idx < len(states):
            x, y, size = stack.pop()
            st = states[idx]
            idx += 1
            if st == qt.STATE_LEAF:
                sizes_p.append(size); ys_p.append(y); xs_p.append(x)
            elif st == qt.STATE_SPLIT:
                half = size // 2
                stack.extend([(x + half, y + half, half),
                              (x, y + half, half),
                              (x + half, y, half), (x, y, half)])
        sizes_n, ys_n, xs_n = qt.replay_positions(
            states, payload.root_size, 0, 0)
        np.testing.assert_array_equal(sizes_n, np.asarray(sizes_p))
        np.testing.assert_array_equal(ys_n, np.asarray(ys_p))
        np.testing.assert_array_equal(xs_n, np.asarray(xs_p))
