"""Round-3 host profile: split assemble (88 ms) into gather / scan / emit.

Reconstructs each task's contiguous int16 stream in numpy (the gather the
C++ does with memcpys), then times payload16 (scan+emit) and the scan-only
probe separately.  CPU backend — host work only.
"""
import ctypes
import glob
import math
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from aejpeg_tpu.codec import batch_encode as be
from aejpeg_tpu.config import CodecConfig
from aejpeg_tpu.io.image import ImageData
from aejpeg_tpu.native import entropy as ne

LIVE = "/root/reference/test_images/LIVE_image_quality_assessment_database"
BATCH, REPLICATE = 14, 3
REPS = 5


def main():
    import imageio.v3 as iio
    imgs = []
    for p in sorted(glob.glob(f"{LIVE}/*.bmp")):
        im = iio.imread(p)
        if im.shape == (512, 768, 3):
            imgs.append(ImageData(im.astype(np.float32) / 255.0, im.shape,
                                  ".bmp"))
        if len(imgs) == BATCH:
            break
    images = (imgs * REPLICATE)[:BATCH * REPLICATE]
    cfg = CodecConfig("YCoCg", (20, 80), (4, 64), entropy_level=-1)

    # full encode once to warm; optionally time assemble via encode_batch
    if os.environ.get("AEJ_PROFILE_FULL"):
        t = {}
        be.encode_batch(images, cfg)
        for _ in range(REPS):
            be.encode_batch(images, cfg, timings=t)
        print({k: round(v / REPS * 1e3, 1) for k, v in t.items()},
              "(CPU device)")

    # rebuild the per-task raw streams with the numpy oracle gather
    b = len(images)
    h, w = images[0].original_shape[:2]
    layer_shapes = cfg.layer_shapes((h, w))
    mn, mx = cfg.block_size_range
    band = (int(math.log2(mn)) + 1, int(math.log2(mx)))
    jit_b, spec = be._stage_b_fn(cfg, (h, w), b)
    stacked = np.stack([im.data for im in images])
    u8 = np.round(stacked * 255.0).astype(np.uint8)
    import jax.numpy as jnp
    gp, pb = be._stage_a(jnp.asarray(u8), cfg.color_space,
                         tuple(layer_shapes), band, spec)
    outs = jit_b(gp)
    levels_bits = np.asarray(pb)
    plans = be._build_plans(cfg, layer_shapes, levels_bits, band, b)

    dense_np, slow_np = [], []
    for gi, (dense_t, slow_t) in enumerate(outs):
        g = spec.groups[gi]
        p = b * g.n_l
        dn, sn = [], []
        for si, s in enumerate(g.sizes):
            gh, gw = g.ph // s, g.pw // s
            dn.append(np.asarray(dense_t[si]).reshape(p, gh * gw, s * s))
            sn.append(np.asarray(slow_t[si]).reshape(-1, s * s))
        dense_np.append(dn)
        slow_np.append(sn)

    # gather all 3*b task streams (numpy vectorized per size — proxy for
    # the C++ memcpy loop) and keep them
    streams = []
    for bi in range(b):
        for li in range(3):
            gi, j = spec.layer_pos[li]
            g = spec.groups[gi]
            plan = plans[bi][li]
            plane = bi * g.n_l + j
            sizes64 = plan.leaf_sizes.astype(np.int64)
            offsets = np.zeros(len(sizes64) + 1, np.int64)
            np.cumsum(sizes64 * sizes64, out=offsets[1:])
            raw = np.empty(int(offsets[-1]), np.int16)
            lh, lw = plan.height, plan.width
            for s in np.unique(sizes64):
                s = int(s)
                si = g.sizes.index(s)
                idx = np.nonzero(sizes64 == s)[0]
                ly = plan.leaf_y[idx].astype(np.int64)
                lx = plan.leaf_x[idx].astype(np.int64)
                interior = (ly + s <= lh) & (lx + s <= lw)
                nb = g.n_boundary(s)
                flat = (offsets[idx][:, None]
                        + np.arange(s * s, dtype=np.int64)[None, :])
                vals = np.empty((len(idx), s * s), np.int16)
                if interior.any():
                    rows = ((ly[interior] // s) * (g.pw // s)
                            + lx[interior] // s)
                    vals[interior] = dense_np[gi][si][plane][rows]
                bsel = ~interior
                if bsel.any():
                    ghf = lh // s
                    gy, gx = ly[bsel] // s, lx[bsel] // s
                    n_right = ghf if lw % s else 0
                    rank = np.where(gy < ghf, gy, n_right + gx)
                    vals[bsel] = slow_np[gi][si][plane * nb + rank]
                raw[flat.ravel()] = vals.ravel()
            streams.append(raw)

    import pickle
    with open("/tmp/aej_streams.pkl", "wb") as f:
        pickle.dump(streams, f)
    total = sum(s.size for s in streams)
    nz = sum(int(np.count_nonzero(s)) for s in streams)
    print(f"{len(streams)} tasks, {total / 1e6:.1f}M coeffs "
          f"({total * 2 / 1e6:.0f} MB int16), nonzero {nz / total:.1%}")

    lib = ne._load()

    # scan-only probe, single thread, all tasks serially
    t0 = time.perf_counter()
    for s in streams:
        lib.aej_bench_scan16(s.ctypes.data_as(ctypes.c_void_p), s.size)
    scan_1t = time.perf_counter() - t0
    print(f"scan-only 1 thread: {scan_1t * 1e3:.1f} ms "
          f"({total * 2 / scan_1t / 1e9:.2f} GB/s)")

    # full payload16 (scan + emit), 1 thread serially
    t0 = time.perf_counter()
    outb = 0
    for s in streams:
        outb += len(ne.payload16(s, threads=1))
    p16_1t = time.perf_counter() - t0
    print(f"payload16 1 thread: {p16_1t * 1e3:.1f} ms -> {outb / 1e6:.1f} MB "
          f"(emit = {1e3 * (p16_1t - scan_1t):.1f} ms)")

    # memcpy cost proxy: copy all streams
    t0 = time.perf_counter()
    for s in streams:
        _ = s.copy()
    cp = time.perf_counter() - t0
    print(f"pure memcpy of streams 1 thread: {cp * 1e3:.1f} ms "
          f"({total * 2 / cp / 1e9:.2f} GB/s)")


if __name__ == "__main__":
    main()
