"""Native parallel deflate tests."""

import zlib

import numpy as np
import pytest

from aejpeg_tpu.native import entropy as ne


@pytest.fixture(scope="module")
def payload():
    rng = np.random.default_rng(0)
    coeffs = (rng.standard_normal(3_000_000) * 2).astype(np.int32)
    coeffs[rng.random(coeffs.size) < 0.7] = 0
    return coeffs.astype("<i4").tobytes()


def test_native_builds():
    assert ne.native_available(), "native entropy library failed to build"


def test_parallel_stream_is_valid_zlib(payload):
    for threads in (1, 2, 4):
        comp = ne.deflate_parallel(payload, level=6, threads=threads)
        assert zlib.decompress(comp) == payload


def test_single_chunk_matches_zlib_bytes(payload):
    """threads=1 + chunk >= len must be byte-identical to zlib.compress
    (reference byte parity mode)."""
    comp = ne.deflate_parallel(payload, level=9, threads=1,
                               chunk_size=len(payload) + 1)
    assert comp == zlib.compress(payload, level=9)


def test_ratio_within_tolerance(payload):
    ref = len(zlib.compress(payload, level=6))
    par = len(ne.deflate_parallel(payload, level=6, threads=4,
                                  chunk_size=1 << 20))
    assert par < ref * 1.02


def test_inflate(payload):
    comp = zlib.compress(payload, level=6)
    assert ne.inflate(comp, len(payload)) == payload


def test_empty_and_small():
    for data in (b"", b"x", b"hello" * 10):
        comp = ne.deflate_parallel(data, level=9, threads=2)
        assert zlib.decompress(comp) == data


# ------------------------------------------------- sparse encoder (level -1)

def test_sparse_roundtrip(payload):
    for threads in (1, 2, 4):
        comp = ne.deflate_parallel(payload, level=-1, threads=threads)
        assert zlib.decompress(comp) == payload


def test_sparse_ratio_sane(payload):
    """The specialized encoder must stay within ~25% of zlib-6 output on
    coefficient-like data (it trades ratio for ~5-10x throughput)."""
    ref = len(zlib.compress(payload, level=6))
    sp = len(ne.deflate_parallel(payload, level=-1, threads=2))
    assert sp < ref * 1.25


def test_sparse_edge_cases():
    rng = np.random.default_rng(3)
    payloads = [
        b"",
        b"x",
        b"ab" * 3,
        bytes(10_000_000),                      # one giant zero run
        rng.bytes(500_000),                     # incompressible -> stored
        bytes(range(256)) * 4,                  # all literals
        (np.arange(100_000, dtype=np.int32) % 7 - 3).tobytes(),  # dist-4
        b"\xff" * 3 + b"\x01" + b"\xff" * 3,    # short runs only
    ]
    for data in payloads:
        comp = ne.deflate_parallel(data, level=-1, threads=3)
        assert zlib.decompress(comp) == data


def test_sparse_huffman_depth_limit():
    """Exponentially skewed frequencies force the depth-15 clamp path."""
    parts = []
    f = 1
    for b in range(20):
        parts.append(bytes([b]) * f)
        f = min(f * 3, 2_000_000)
    data = b"".join(parts)
    comp = ne.deflate_parallel(data, level=-1, threads=1)
    assert zlib.decompress(comp) == data
