"""Host-stage thread-scaling table (VERDICT r4 #4).

Measures the two host pipeline stages of the bench workload at pool sizes
1..4 on THIS machine and prints the table committed to
results/host_scaling.md:

  encode assemble  - quadtree planning DFS + C++ container assembly/entropy
  decode parse     - container read + C++ replay/inflate/scatter

The ">=N cores makes the pipeline device-bound" claims must cite these
measured numbers and the measured pool efficiency, not pool arithmetic.
Run on an otherwise-idle machine (the 2-core harness fluctuates ±25%
under load).

Inputs come from a CPU encode of the bench batch (cached; pure host work).
"""

import glob
import math
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

LIVE = "/root/reference/test_images/LIVE_image_quality_assessment_database"
SPACE = "YCoCg"
QUALITY = (20, 80)
BLOCKS = tuple(int(x) for x in
               os.environ.get("AEJ_BENCH_BLOCKS", "4,128").split(","))
BATCH, REPLICATE = 14, 3
REPS = int(os.environ.get("REPS", 9))
CACHE = f"/tmp/r5_hostscale_{BLOCKS[0]}_{BLOCKS[1]}.pkl"


def load_images():
    import imageio.v3 as iio
    from aejpeg_tpu.io.image import ImageData
    imgs = []
    for p in sorted(glob.glob(f"{LIVE}/*.bmp")):
        im = iio.imread(p)
        if im.shape == (512, 768, 3):
            imgs.append(ImageData(im.astype(np.float32) / 255.0,
                                  im.shape, ".bmp"))
        if len(imgs) == BATCH:
            break
    return (imgs * REPLICATE)[:BATCH * REPLICATE]


def main():
    from aejpeg_tpu.codec import batch_decode as bd
    from aejpeg_tpu.codec import batch_encode as be
    from aejpeg_tpu.config import CodecConfig
    import aejpeg_tpu.native.entropy as ne

    images = load_images()
    b = len(images)
    h, w = images[0].original_shape[:2]
    cfg = CodecConfig(SPACE, QUALITY, BLOCKS, entropy_level=-1)
    layer_shapes = cfg.layer_shapes((h, w))
    mn, mx = BLOCKS
    band = (int(math.log2(mn)) + 1, int(math.log2(mx)))

    if os.path.exists(CACHE):
        with open(CACHE, "rb") as f:
            levels_bits, dense_np, slow_np, blobs = pickle.load(f)
        jit_b, spec = be._stage_b_fn(cfg, (h, w), b)
    else:
        print("one-time CPU encode of the bench batch...", file=sys.stderr)
        import jax.numpy as jnp
        stacked = np.stack([im.data for im in images])
        u8 = np.round(stacked * 255.0).astype(np.uint8)
        batch_dev = jnp.asarray(u8)
        jit_b, spec = be._stage_b_fn(cfg, (h, w), b)
        gp, pb = be._stage_a(batch_dev, cfg.color_space,
                             tuple(layer_shapes), band, spec)
        outs = jit_b(gp)
        be._sync_all((outs, pb))
        levels_bits = np.asarray(pb)
        dense_np, slow_np = [], []
        for gi, (dense_t, slow_t) in enumerate(outs):
            g = spec.groups[gi]
            p_ = b * g.n_l
            dense_np.append([
                np.ascontiguousarray(np.asarray(dense_t[si])).reshape(
                    p_, (g.ph // s) * (g.pw // s), s * s)
                for si, s in enumerate(g.sizes)])
            slow_np.append([
                np.ascontiguousarray(np.asarray(slow_t[si])).reshape(
                    -1, s * s) for si, s in enumerate(g.sizes)])
        from aejpeg_tpu.codec.batch_encode import encode_batch
        blobs = encode_batch(images, cfg)
        with open(CACHE, "wb") as f:
            pickle.dump((levels_bits, dense_np, slow_np, blobs), f)

    plans = be._build_plans(cfg, layer_shapes, levels_bits, band, b)
    be.assemble_native(cfg, spec, plans, dense_np, slow_np, b)   # warm

    print(f"batch: {b} images {h}x{w}, blocks {BLOCKS}, "
          f"{os.cpu_count()} cpus", file=sys.stderr)

    results = {}
    orig_asm = ne.assemble_batch_native
    for threads in (1, 2, 3, 4):
        def asm_t(*a, **k):
            k["threads"] = threads
            return orig_asm(*a, **k)
        ne.assemble_batch_native = asm_t
        try:
            ts = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                be.assemble_native(cfg, spec, plans, dense_np, slow_np, b)
                ts.append(time.perf_counter() - t0)
            results[f"assemble_t{threads}"] = sorted(ts)[len(ts) // 2]
        finally:
            ne.assemble_batch_native = orig_asm

    # plans DFS (single-threaded C++ batch call, included for the host_busy
    # decomposition)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        be._build_plans(cfg, layer_shapes, levels_bits, band, b)
        ts.append(time.perf_counter() - t0)
    results["plans"] = sorted(ts)[len(ts) // 2]

    # decode parse at pool sizes 1..4
    from aejpeg_tpu.io.container import ContainerReader
    jit_d, dspec = bd._stage_d_fn(cfg, (h, w), b)
    readers = [ContainerReader(bl) for bl in blobs]
    payloads = [[r.read_layer_raw() for _ in range(3)] for r in readers]
    tables, masks = [], []
    for gi, g in enumerate(dspec.groups):
        per, mper = [], []
        for s in g.sizes:
            gh, gw = g.ph // s, g.pw // s
            per.append(ne.scratch_view(
                f"hs_tbl_{gi}_{s}", (b * g.n_l, gh * gw, s * s), np.int16))
            m = ne.scratch_view(
                f"hs_msk_{gi}_{s}", (b * g.n_l, gh * gw), np.uint8)
            m[:] = 0
            mper.append(m)
        tables.append(per)
        masks.append(mper)
    bd.parse_native_into_tables(payloads, dspec, tables, masks, b)  # warm

    orig_dec = ne.decode_batch_native
    for threads in (1, 2, 3, 4):
        def dec_t(*a, **k):
            k["threads"] = threads
            return orig_dec(*a, **k)
        ne.decode_batch_native = dec_t
        try:
            ts = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                bd.parse_native_into_tables(payloads, dspec, tables, masks,
                                            b)
                ts.append(time.perf_counter() - t0)
            results[f"parse_t{threads}"] = sorted(ts)[len(ts) // 2]
        finally:
            ne.decode_batch_native = orig_dec

    for k, v in results.items():
        print(f"{k:>12}: {v * 1e3:7.1f} ms")
    a1, a2 = results["assemble_t1"], results["assemble_t2"]
    p1, p2 = results["parse_t1"], results["parse_t2"]
    print(f"assemble scaling t1->t2: {a1 / a2:.2f}x "
          f"(pool efficiency {a1 / a2 / 2 * 100:.0f}%)")
    print(f"parse    scaling t1->t2: {p1 / p2:.2f}x "
          f"(pool efficiency {p1 / p2 / 2 * 100:.0f}%)")


if __name__ == "__main__":
    main()
