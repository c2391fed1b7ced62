"""Harness + CLI smoke/behavior tests."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from aejpeg_tpu.harness.sweep import MetricsSweep
from aejpeg_tpu.harness.compare import (MetricsComparison,
                                        extract_subsampling,
                                        STANDARD_JPEG_RESULTS)
from aejpeg_tpu.io.image import ImageData


@pytest.fixture(scope="module")
def small_images(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    import cv2 as cv
    for i in range(2):
        small = rng.random((12, 12, 3), np.float32)
        img = np.clip(cv.resize(small, (192, 192),
                                interpolation=cv.INTER_CUBIC), 0, 1)
        ImageData.from_array(img.astype(np.float32)).save(
            str(d / f"img{i}.png"))
    return d


def test_sweep_produces_reference_schema(small_images, tmp_path):
    out = tmp_path / "cr_YCbCr_420.csv"
    sweep = MetricsSweep(sorted(small_images.glob("*.png")), out,
                         color_spaces=["YCbCr"],
                         quality_ranges=[(50, 50), (25, 75)],
                         block_size_ranges=[(8, 8), (8, 32)])
    df = sweep.run()
    assert list(df.columns) == [
        "image_name", "color_space", "min_quality", "max_quality",
        "min_block_size", "max_block_size", "psnr", "ssim", "ms_ssim",
        "lpips", "compression_ratio"]
    assert len(df) == 2 * 4
    assert not sweep.errors
    assert float(df["psnr"].iloc[0]) > 20


def test_compare_pipeline(small_images, tmp_path):
    out = tmp_path / "cr_YCbCr_420.csv"
    MetricsSweep(sorted(small_images.glob("*.png")), out,
                 color_spaces=["YCbCr"],
                 quality_ranges=[(90, 90)],
                 block_size_ranges=[(8, 8)]).run()
    df = pd.read_csv(out)
    # fill lpips with a plausible constant so ratios are computable
    df["lpips"] = 0.05
    df.to_csv(out, index=False)

    cmp_ = MetricsComparison(input_dir=str(tmp_path))
    outputs = cmp_.run()
    avg = pd.read_csv(tmp_path / "cr_YCbCr_420_avg.csv")
    assert "subsampling" in avg.columns
    assert avg["subsampling"].iloc[0] == "4:2:0"
    # every anchor x config pair evaluated
    assert len(cmp_.better_compression) + len(cmp_.better_quality) >= 0
    for name, path in outputs.items():
        assert Path(path).exists()


def test_compare_without_lpips_renormalizes(tmp_path):
    # a weight-less sweep leaves lpips empty: the composite must
    # renormalize over psnr/ssim/ms-ssim, not go NaN (which would make
    # every better_* selection silently impossible)
    rows = []
    for img in ("a.png", "b.png"):
        rows.append({
            "image_name": img, "color_space": "YCbCr",
            "min_quality": 90, "max_quality": 90,
            "min_block_size": 8, "max_block_size": 8,
            "psnr": 40.0, "ssim": 0.999, "ms_ssim": 0.999,
            "lpips": float("nan"), "compression_ratio": 30.0})
    out = tmp_path / "cr_YCbCr_420.csv"
    pd.DataFrame(rows).to_csv(out, index=False)
    cmp_ = MetricsComparison(input_dir=str(tmp_path))
    cmp_.run()
    # vs the q10 anchor (PSNR 25.69, CR 26.39) this config is strictly
    # better on compression and quality -> must be selected despite NaN
    assert cmp_.better_compression
    scores = [r["composite_score"] for r in cmp_.better_compression]
    assert all(s == s and s > 1.0 for s in scores)


def test_extract_subsampling():
    assert extract_subsampling("cr_YCbCr_420.csv") == "4:2:0"
    assert extract_subsampling("cr_ICtCp_411.csv") == "4:1:1"
    assert extract_subsampling("oops.csv") == "unknown"


def test_anchor_table_matches_reference():
    assert STANDARD_JPEG_RESULTS[0]["psnr"] == 25.6922
    assert STANDARD_JPEG_RESULTS[-1]["compression_ratio"] == 4.5639


def test_cli_roundtrip(small_images, tmp_path):
    env = {"JAX_PLATFORMS": "cpu"}
    import os
    full_env = dict(os.environ, **env)
    img = str(sorted(small_images.glob("*.png"))[0])
    r = subprocess.run(
        [sys.executable, "-m", "aejpeg_tpu.cli", "compress", img,
         "-o", str(tmp_path), "--quality", "50", "50", "--blocks", "8", "8"],
        capture_output=True, text=True, env=full_env, cwd="/root/repo",
        timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    ajpg = tmp_path / (Path(img).stem + ".ajpg")
    assert ajpg.exists()

    r = subprocess.run(
        [sys.executable, "-m", "aejpeg_tpu.cli", "info", str(ajpg)],
        capture_output=True, text=True, env=full_env, cwd="/root/repo",
        timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    meta = json.loads(r.stdout)
    assert meta["color_space"] == "YCoCg"
    assert meta["quality"] == [50, 50]

    r = subprocess.run(
        [sys.executable, "-m", "aejpeg_tpu.cli", "decompress", str(ajpg),
         "-o", str(tmp_path)],
        capture_output=True, text=True, env=full_env, cwd="/root/repo",
        timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / (Path(img).stem + "_decompressed.png")).exists()


def test_visualizer(small_images, tmp_path):
    from aejpeg_tpu.harness.visualize import visualize
    from aejpeg_tpu.config import CodecConfig
    img = str(sorted(small_images.glob("*.png"))[0])
    t = visualize(img, str(tmp_path), CodecConfig("YCoCg", (40, 80), (4, 16)))
    assert (tmp_path / "luminance_quadtree.png").exists()
    assert t["luminance_leaves"] > 0


def test_speed_table_runs(tmp_path):
    """Speed harness (reference test_compression_speed.py equivalent):
    returns one row per block size with sane fields."""
    import imageio.v3 as iio
    import cv2 as cv
    rng = np.random.default_rng(0)
    small = rng.random((8, 8, 3), np.float32)
    img = np.clip(cv.resize(small, (64, 64),
                            interpolation=cv.INTER_CUBIC), 0, 1)
    p = tmp_path / "img.png"
    iio.imwrite(p, (img * 255).astype(np.uint8))
    from aejpeg_tpu.harness.speed import run_speed_table
    rows = run_speed_table(str(p), iters=1, block_sizes=[8, 16])
    assert [r["block"] for r in rows] == [8, 16]
    for r in rows:
        assert r["compress_s"] > 0 and r["decompress_s"] > 0
        assert r["bytes"] > 0
