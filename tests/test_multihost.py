"""Two-process multi-host correctness on CPU (VERDICT r1 task 4).

Launches two REAL processes that rendezvous through
jax.distributed.initialize (local coordinator), each encodes its shard of
a shared deterministic image list, and the union must equal the
single-process encode byte-for-byte."""

import os
import pickle
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, pickle, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %(repo)r)
from aejpeg_tpu.parallel import multihost as mh
mh.initialize(%(coord)r, 2, %(pid)d)
assert jax.process_count() == 2, jax.process_count()
import numpy as np
from aejpeg_tpu.config import CodecConfig
from aejpeg_tpu.io.image import ImageData
yy, xx = np.mgrid[0:96, 0:64] / 16.0
images = []
for i in range(5):
    img = np.stack([0.5 + 0.4 * np.sin(yy * (1 + 0.1 * i) + c)
                    * np.cos(xx + c) for c in range(3)], axis=-1)
    images.append(ImageData.from_array(img.astype(np.float32),
                                       extension=".png"))
cfg = CodecConfig("YCoCg", (20, 80), (4, 32))
idxs, blobs = mh.encode_stream_sharded(images, cfg, batch_size=4)
with open(%(out)r, "wb") as f:
    pickle.dump((jax.process_index(), idxs, blobs), f)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_encode_matches_single(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    procs = []
    outs = []
    for pid in range(2):
        out = str(tmp_path / f"shard{pid}.pkl")
        outs.append(out)
        code = _WORKER % {"repo": REPO, "coord": coord, "pid": pid,
                          "out": out}
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen([sys.executable, "-c", code],
                                      env=env, stdout=subprocess.PIPE,
                                      stderr=subprocess.PIPE))
    errs = []
    for p in procs:
        try:
            _, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            pytest.fail("multihost worker hung")
        errs.append(err.decode(errors="replace"))
        if p.returncode != 0:
            pytest.fail(f"worker failed:\n{errs[-1][-2000:]}")

    merged = {}
    for out in outs:
        with open(out, "rb") as f:
            pid, idxs, blobs = pickle.load(f)
        for i, blob in zip(idxs, blobs):
            merged[i] = blob
    assert sorted(merged) == list(range(5))

    # single-process truth
    from aejpeg_tpu.config import CodecConfig
    from aejpeg_tpu.codec.stream import encode_stream
    from aejpeg_tpu.io.image import ImageData
    yy, xx = np.mgrid[0:96, 0:64] / 16.0
    images = []
    for i in range(5):
        img = np.stack([0.5 + 0.4 * np.sin(yy * (1 + 0.1 * i) + c)
                        * np.cos(xx + c) for c in range(3)], axis=-1)
        images.append(ImageData.from_array(img.astype(np.float32),
                                           extension=".png"))
    single = encode_stream(images, CodecConfig("YCoCg", (20, 80), (4, 32)),
                           batch_size=4)
    assert [merged[i] for i in range(5)] == single


def test_process_shard_partition():
    from aejpeg_tpu.parallel.multihost import process_shard
    for n in (0, 1, 5, 16, 17):
        for np_ in (1, 2, 3, 8):
            slices = [process_shard(n, np_, p) for p in range(np_)]
            items = [i for s in slices for i in range(s.start, s.stop)]
            assert items == list(range(n))
