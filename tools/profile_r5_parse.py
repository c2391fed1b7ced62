"""Round-5 decode 'parse' stage profiler (VERDICT r4 #3).

Splits the decode host stage (BENCH r4: 129 ms/batch, parse-bound) into
its real components on this host:

  read    - ContainerReader metadata + read_layer_raw byte slicing (Python)
  scratch - dense-table scratch views + mask zeroing
  native  - aej_decode_batch (C++ pool: replay + inflate-scatter)

and scans the native pool size, so the "parse shrinks with cores like
assemble" claim is a measured table instead of an assertion.

Blobs come from a CPU encode of the bench batch (cached to /tmp) —
pure-host work, safe to run while the TPU is busy elsewhere.
"""

import glob
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

from aejpeg_tpu.codec import batch_decode as bd
from aejpeg_tpu.config import CodecConfig
from aejpeg_tpu.io.container import ContainerReader
from aejpeg_tpu.native import entropy as native_entropy

LIVE = "/root/reference/test_images/LIVE_image_quality_assessment_database"
SPACE = "YCoCg"
QUALITY = (20, 80)
BLOCKS = tuple(int(x) for x in
               os.environ.get("AEJ_BENCH_BLOCKS", "4,128").split(","))
BATCH, REPLICATE = 14, 3
CACHE = f"/tmp/r5_blobs_{BLOCKS[0]}_{BLOCKS[1]}.pkl"
REPS = int(os.environ.get("REPS", 9))


def get_blobs():
    if os.path.exists(CACHE):
        with open(CACHE, "rb") as f:
            return pickle.load(f)
    import imageio.v3 as iio
    from aejpeg_tpu.codec.batch_encode import encode_batch
    from aejpeg_tpu.io.image import ImageData
    imgs = []
    for p in sorted(glob.glob(f"{LIVE}/*.bmp")):
        im = iio.imread(p)
        if im.shape == (512, 768, 3):
            imgs.append(ImageData(im.astype(np.float32) / 255.0,
                                  im.shape, ".bmp"))
        if len(imgs) == BATCH:
            break
    imgs = (imgs * REPLICATE)[:BATCH * REPLICATE]
    cfg = CodecConfig(SPACE, QUALITY, BLOCKS, entropy_level=-1)
    print("encoding bench batch on CPU (one-time)...", file=sys.stderr)
    blobs = encode_batch(imgs, cfg)
    with open(CACHE, "wb") as f:
        pickle.dump(blobs, f)
    return blobs


def main():
    blobs = get_blobs()
    b = len(blobs)
    meta = ContainerReader(blobs[0]).metadata
    cfg = CodecConfig(meta.color_space, (meta.quality_min, meta.quality_max),
                      (meta.block_size_min, meta.block_size_max))
    h, w = meta.height, meta.width
    from aejpeg_tpu.codec.dense import batch_spec
    spec = batch_spec(cfg.layer_shapes((h, w)), *cfg.block_size_range)
    print(f"batch: {b} blobs, {h}x{w}, blocks {cfg.block_size_range}, "
          f"total {sum(len(x) for x in blobs) / 1e6:.1f} MB", file=sys.stderr)

    def scratch():
        tables, masks = [], []
        for gi, g in enumerate(spec.groups):
            per, mper = [], []
            for s in g.sizes:
                gh, gw = g.ph // s, g.pw // s
                per.append(native_entropy.scratch_view(
                    f"p5_tbl_{gi}_{s}", (b * g.n_l, gh * gw, s * s),
                    np.int16))
                m = native_entropy.scratch_view(
                    f"p5_msk_{gi}_{s}", (b * g.n_l, gh * gw), np.uint8)
                m[:] = 0
                mper.append(m)
            tables.append(per)
            masks.append(mper)
        return tables, masks

    def read():
        readers = [ContainerReader(bl) for bl in blobs]
        return [[r.read_layer_raw() for _ in range(3)] for r in readers]

    # warm
    tables, masks = scratch()
    payloads = read()
    bd.parse_native_into_tables(payloads, spec, tables, masks, b)

    rows = {}
    for name, fn in [("read", read), ("scratch", scratch)]:
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        rows[name] = sorted(ts)[len(ts) // 2]

    import aejpeg_tpu.native.entropy as ne
    for threads in (1, 2, 3, 4):
        orig = ne.decode_batch_native

        def with_threads(*a, **k):
            k["threads"] = threads
            return orig(*a, **k)

        ne.decode_batch_native = with_threads
        try:
            ts = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                bd.parse_native_into_tables(payloads, spec, tables, masks, b)
                ts.append(time.perf_counter() - t0)
            rows[f"native_t{threads}"] = sorted(ts)[len(ts) // 2]
        finally:
            ne.decode_batch_native = orig

    # ---- single-thread split: replay vs pure-inflate vs (scatter = rest)
    import ctypes
    lib = native_entropy._load()
    lib.aej_bench_inflate_count.restype = ctypes.c_int64
    lib.aej_bench_inflate_count.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int64]

    from aejpeg_tpu.codec import quadtree as qt
    flat = [p for per in payloads for p in per]
    totals = []
    for p in flat:
        states = qt.unpack_states(p.states_bytes, p.bits_len)
        sizes, _, _ = qt.replay_positions(states, p.root_size, 0, 0)
        totals.append(int((sizes.astype(np.int64) ** 2).sum()))

    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        for p, tot in zip(flat, totals):
            rc = lib.aej_bench_inflate_count(p.compressed,
                                             len(p.compressed), 4 * tot)
            assert rc == 4 * tot, rc
        ts.append(time.perf_counter() - t0)
    rows["inflate_t1"] = sorted(ts)[len(ts) // 2]

    for k, v in rows.items():
        print(f"{k:>12}: {v * 1e3:7.1f} ms")
    total2 = rows["read"] + rows["scratch"] + rows["native_t2"]
    print(f"  => parse stage @2 threads ~ {total2 * 1e3:.1f} ms")
    scat = rows["native_t1"] - rows["inflate_t1"]
    print(f"  => t1 split: pure-inflate {rows['inflate_t1'] * 1e3:.1f} + "
          f"replay/scatter/leaf/memset ~{scat * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
