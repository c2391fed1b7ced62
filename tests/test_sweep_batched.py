"""Batched sweep vs the per-image Codec path: metrics and ratios must
agree (the device masked-reconstruction is the decoder's math modulo fp
reassociation; containers are byte-identical by construction)."""

import csv

import numpy as np
import pytest

cv = pytest.importorskip("cv2")

from aejpeg_tpu.codec.pipeline import Codec
from aejpeg_tpu.config import CodecConfig
from aejpeg_tpu.harness.sweep_batched import BatchedMetricsSweep
from aejpeg_tpu.io.image import ImageData
from aejpeg_tpu.metrics import EvaluationMetrics


@pytest.fixture(scope="module")
def image_files(tmp_path_factory):
    root = tmp_path_factory.mktemp("sweepimgs")
    rng = np.random.default_rng(21)
    paths = []
    for i in range(2):
        small = rng.random((12, 14, 3), np.float32)
        # min side must be >= 11 * 2**4 = 176 so the 5th MS-SSIM scale
        # still fits the 11-tap window (LIVE images are all >= 438)
        img = np.clip(cv.resize(small, (300, 272),
                                interpolation=cv.INTER_CUBIC), 0, 1)
        u8 = (img * 255).astype(np.uint8)
        p = root / f"img{i}.png"
        import imageio.v3 as iio
        iio.imwrite(p, u8)
        paths.append(p)
    return paths


def test_batched_sweep_matches_codec_path(image_files, tmp_path):
    qrs = [(20, 80), (50, 50)]
    brs = [(4, 32), (8, 8)]
    out_csv = tmp_path / "sweep.csv"
    sweep = BatchedMetricsSweep(image_files, out_csv,
                                color_spaces=("YCoCg",),
                                quality_ranges=qrs, block_size_ranges=brs,
                                entropy_level=-1)
    sweep.run()
    assert not sweep.errors, sweep.errors

    with open(out_csv) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == len(image_files) * len(qrs) * len(brs)

    from aejpeg_tpu.codec.batch_encode import encode_batch
    from aejpeg_tpu.codec.batch_decode import decode_batch

    by_key = {(r["image_name"], r["min_quality"], r["max_quality"],
               r["min_block_size"], r["max_block_size"]): r for r in rows}
    imgs = [ImageData.load(str(p)) for p in image_files]
    for qr in qrs:
        for br in brs:
            cfg = CodecConfig("YCoCg", qr, br, entropy_level=-1)
            # CR truth: the batched production path (the sweep's blobs are
            # byte-identical to encode_batch by construction)
            blobs = encode_batch(imgs, cfg)
            decs = decode_batch(blobs)
            for p, img, blob, dec in zip(image_files, imgs, blobs, decs):
                ev = EvaluationMetrics(img, dec)
                row = by_key[(str(p), str(qr[0]), str(qr[1]),
                              str(br[0]), str(br[1]))]
                want_ratio = img.raw_rgb_bytes / len(blob)
                assert abs(float(row["compression_ratio"])
                           - want_ratio) < 1e-3, (qr, br)
                assert abs(float(row["psnr"]) - ev.psnr()) < 2e-2, (qr, br)
                assert abs(float(row["ssim"]) - ev.ssim()) < 2e-3, (qr, br)
                assert abs(float(row["ms_ssim"])
                           - ev.ms_ssim()) < 2e-3, (qr, br)
                assert row["lpips"] == ""
                # per-image Codec sizes agree within a few % (its
                # byte-domain tokenizer makes slightly different run
                # choices than the batch path's coefficient-domain one;
                # both emit spec-valid zlib of the same coefficients)
                single = Codec(cfg).compress(img)
                assert abs(len(single) - len(blob)) < 0.04 * len(blob)


def test_batched_sweep_resume(image_files, tmp_path):
    out_csv = tmp_path / "sweep.csv"
    kw = dict(color_spaces=("YCoCg",), quality_ranges=[(50, 50)],
              block_size_ranges=[(8, 8)], entropy_level=-1)
    BatchedMetricsSweep(image_files, out_csv, **kw).run()
    with open(out_csv) as f:
        first = f.read()
    BatchedMetricsSweep(image_files, out_csv, **kw).run()
    with open(out_csv) as f:
        again = f.read()
    assert first == again  # resume skipped everything, no duplicates

def test_batched_sweep_lpips_with_weights(image_files, tmp_path):
    """With a weights .npz present, the lpips column is filled and matches
    the per-image metrics.lpips.lpips_distance on the decoded output."""
    from aejpeg_tpu.metrics import lpips as L
    from aejpeg_tpu.codec.batch_encode import encode_batch
    from aejpeg_tpu.codec.batch_decode import decode_batch

    rng = np.random.default_rng(7)
    arrays = {}
    chans_in = 3
    for i, (out_ch, k, _, _) in enumerate(L._ALEX_CONVS):
        arrays[f"conv{i}_w"] = rng.normal(
            0, 0.05, (out_ch, chans_in, k, k)).astype(np.float32)
        arrays[f"conv{i}_b"] = rng.normal(0, 0.01, out_ch).astype(np.float32)
        arrays[f"lin{i}_w"] = np.abs(rng.normal(
            0, 0.1, (1, out_ch, 1, 1))).astype(np.float32)
        chans_in = out_ch
    wpath = tmp_path / "lpips_rand.npz"
    np.savez(wpath, **arrays)

    out_csv = tmp_path / "sweep.csv"
    sweep = BatchedMetricsSweep(image_files, out_csv,
                                color_spaces=("YCoCg",),
                                quality_ranges=[(50, 50)],
                                block_size_ranges=[(8, 8)],
                                entropy_level=-1,
                                with_lpips=True, lpips_weights=str(wpath))
    sweep.run()
    assert not sweep.errors, sweep.errors

    with open(out_csv) as f:
        rows = {r["image_name"]: r for r in csv.DictReader(f)}
    cfg = CodecConfig("YCoCg", (50, 50), (8, 8), entropy_level=-1)
    imgs = [ImageData.load(str(p)) for p in image_files]
    decs = decode_batch(encode_batch(imgs, cfg))
    for p, img, dec in zip(image_files, imgs, decs):
        want = float(L.lpips_distance(img.data, dec.data,
                                      weights_path=str(wpath)))
        got = float(rows[str(p)]["lpips"])
        assert abs(got - want) < 5e-4, (got, want)
