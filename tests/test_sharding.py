"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from aejpeg_tpu.parallel.mesh import make_mesh


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_dense_encode_mesh_byte_identical():
    """The production quadtree-active encoder sharded over a (4, 2) mesh
    must emit byte-identical containers to the single-device path (pure
    data parallelism: each device encodes whole images; shard outputs
    concatenate in bi-major order)."""
    import cv2 as cv
    from aejpeg_tpu import CodecConfig
    from aejpeg_tpu.codec.batch_encode import encode_batch
    from aejpeg_tpu.io.image import ImageData
    rng = np.random.default_rng(3)
    imgs = []
    for _ in range(8):
        small = rng.random((10, 12, 3), np.float32)
        img = np.clip(cv.resize(small, (120, 100),
                                interpolation=cv.INTER_CUBIC), 0, 1)
        imgs.append(ImageData.from_array(img.astype(np.float32),
                                         extension=".png"))
    cfg = CodecConfig("YCoCg", (20, 80), (4, 32))
    single = encode_batch(imgs, cfg)
    mesh = make_mesh((4, 2))
    sharded = encode_batch(imgs, cfg, mesh=mesh)
    assert sharded == single


def test_dense_encode_mesh_uniform_and_divisibility():
    from aejpeg_tpu import CodecConfig
    from aejpeg_tpu.codec.batch_encode import encode_batch
    from aejpeg_tpu.io.image import ImageData
    rng = np.random.default_rng(4)
    imgs = [ImageData.from_array(rng.random((64, 64, 3)).astype(np.float32))
            for _ in range(8)]
    cfg = CodecConfig("YCbCr", (50, 50), (8, 8))
    mesh = make_mesh((4, 2))
    assert encode_batch(imgs, cfg, mesh=mesh) == encode_batch(imgs, cfg)
    with pytest.raises(ValueError):
        encode_batch(imgs[:3], cfg, mesh=mesh)


def test_dryrun_multichip_entrypoint():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    coeffs, edges = out
    assert len(coeffs) == 3 and len(edges) == 3
    assert coeffs[0].shape == (4096, 64)


def test_dense_decode_mesh_matches_single_device():
    """Batched decode sharded over a (4, 2) mesh must reproduce the
    single-device decode exactly (same table slices -> same XLA program per
    shard; only the batch dim is split)."""
    import cv2 as cv
    from aejpeg_tpu import CodecConfig
    from aejpeg_tpu.codec.batch_encode import encode_batch
    from aejpeg_tpu.codec.batch_decode import decode_batch
    from aejpeg_tpu.io.image import ImageData
    rng = np.random.default_rng(5)
    imgs = []
    for _ in range(8):
        small = rng.random((10, 12, 3), np.float32)
        img = np.clip(cv.resize(small, (120, 100),
                                interpolation=cv.INTER_CUBIC), 0, 1)
        imgs.append(ImageData.from_array(img.astype(np.float32),
                                         extension=".png"))
    cfg = CodecConfig("YCoCg", (20, 80), (4, 32))
    blobs = encode_batch(imgs, cfg)
    single = decode_batch(blobs)
    mesh = make_mesh((4, 2))
    sharded = decode_batch(blobs, mesh=mesh)
    assert len(sharded) == len(single)
    for a, b in zip(sharded, single):
        np.testing.assert_allclose(a.data, b.data, rtol=0, atol=3e-6)
    with pytest.raises(ValueError):
        decode_batch(blobs[:3], mesh=mesh)
