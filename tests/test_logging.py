"""Structured logging (utils/log.py) wired into the stream API.

The reference's only observability is bare prints (e.g. the sweep
progress monitor, test/analysis/metrics_computation.py:63-135); the
stream pipelines emit per-batch JSON records instead.
"""

import json

import numpy as np

from aejpeg_tpu.codec.stream import decode_stream, encode_stream
from aejpeg_tpu.config import CodecConfig
from aejpeg_tpu.io.image import ImageData
from aejpeg_tpu.utils import log as aej_log


def _images(n=3, h=40, w=56):
    rng = np.random.default_rng(7)
    return [ImageData(rng.random((h, w, 3), np.float32).astype(np.float32),
                      (h, w, 3), ".png") for _ in range(n)]


def test_stream_emits_structured_records(tmp_path):
    path = tmp_path / "events.jsonl"
    aej_log.configure(str(path))
    try:
        cfg = CodecConfig("YCbCr", (50, 50), (8, 8))
        blobs = encode_stream(_images(), cfg, batch_size=2)
        decode_stream(blobs, batch_size=2)
    finally:
        aej_log.configure(None)

    records = [json.loads(line) for line in path.read_text().splitlines()]
    kinds = [r["event"] for r in records]
    assert kinds.count("encode_batch") == 2          # 3 images, batch 2
    assert kinds.count("decode_batch") == 2
    assert "encode_stream" in kinds and "decode_stream" in kinds
    for r in records:
        assert r["logger"] == "aejpeg"
        assert r["mpix_per_s"] > 0
        if r["event"] in ("encode_batch", "decode_batch"):
            assert r["images"] in (1, 2)
            assert isinstance(r["stages"], dict) and r["stages"]
    enc = next(r for r in records if r["event"] == "encode_stream")
    assert enc["images"] == 3 and enc["batches"] == 2


def test_logger_disabled_is_quiet(capsys):
    aej_log.configure(None)
    aej_log.get_logger().event("noop", x=1)
    out = capsys.readouterr()
    assert out.out == "" and out.err == ""
