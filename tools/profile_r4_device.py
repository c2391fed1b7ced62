"""Round-4 device profile: split device_busy into stage A/B substages.

Times, on device-resident input with dispatch amortized over REPS:
  - stage A full, stage B full, A+B
  - stage A substages: u8->f32+color, downsample, canny per layer,
    canny internals (clahe, gaussian, bilateral, percentiles,
    sobel+nms, hysteresis), level pyramid + bit-pack
  - stage B substages: per-size dense DCT / quant+round / transpose /
    zigzag gather, and the boundary slow tables
"""
import glob
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from aejpeg_tpu.codec import batch_encode as be
from aejpeg_tpu.config import CodecConfig
from aejpeg_tpu.ops import dct, resize
from aejpeg_tpu.ops import canny as C
from aejpeg_tpu import color

LIVE = "/root/reference/test_images/LIVE_image_quality_assessment_database"
BATCH, REPLICATE, REPS = 14, 3, 8


def load():
    import imageio.v3 as iio
    imgs = []
    for p in sorted(glob.glob(f"{LIVE}/*.bmp")):
        im = iio.imread(p)
        if im.shape == (512, 768, 3):
            imgs.append(im)
        if len(imgs) == BATCH:
            break
    return np.stack(imgs * REPLICATE)


def timeit(name, fn, *a):
    out = fn(*a)
    be._sync_all(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*a)
    be._sync_all(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:34s} {dt * 1e3:8.2f} ms", flush=True)
    return out


def main():
    import math
    import os
    u8 = load()
    b, h, w = u8.shape[:3]
    blocks = tuple(int(x) for x in
                   os.environ.get("AEJ_BENCH_BLOCKS", "4,64").split(","))
    cfg = CodecConfig("YCoCg", (20, 80), blocks)
    layer_shapes = cfg.layer_shapes((h, w))
    band = (int(math.log2(blocks[0])) + 1, int(math.log2(blocks[1])))
    jit_b, spec = be._stage_b_fn(cfg, (h, w), b)
    batch_dev = jnp.asarray(u8)
    be._sync(batch_dev)

    stage_a = lambda: be._stage_a(batch_dev, cfg.color_space,
                                  tuple(layer_shapes), band, spec)
    gp, pb = timeit("stage A (full)", stage_a)
    timeit("stage B (dense tables)", jit_b, gp)
    timeit("A+B", lambda: jit_b(stage_a()[0]))
    timeit("stage A no-canny", lambda: be._stage_a(
        batch_dev, cfg.color_space, tuple(layer_shapes), None, spec))

    @jax.jit
    def to_layers(x):
        from aejpeg_tpu.ops.pallas_kernels import u8_to_unit_exact
        xf = u8_to_unit_exact(x)
        conv = color.convert("sRGB", cfg.color_space, xf)
        return [resize.resize2d(conv[..., i], tuple(layer_shapes[i]), "area")
                for i in range(3)]

    layers = timeit("color+downsample", to_layers, batch_dev)

    canny_b = jax.jit(jax.vmap(C.canny))
    for i in (0, 1):
        timeit(f"canny layer {i} {layers[i].shape}", canny_b, layers[i])

    # ---- canny substages on layer 0 (full-res luma)
    lay0 = layers[0]
    u8l = timeit("  to_uint8", jax.jit(jax.vmap(C.to_uint8)), lay0)
    eq = timeit("  clahe", jax.jit(jax.vmap(
        lambda x: C.clahe(x, 0.75, (4, 4)))), u8l)
    g = timeit("  gaussian3", jax.jit(jax.vmap(
        lambda x: C.gaussian_blur_u8(x, 3))), eq)
    blur = timeit("  bilateral5", jax.jit(jax.vmap(
        lambda x: C.bilateral_u8(x, 5, 75.0, 75.0))), g)
    timeit("  percentiles", jax.jit(jax.vmap(
        lambda x: C.percentiles_u8(x, (10.0, 30.0)))), blur)
    gxy = timeit("  sobel", jax.jit(jax.vmap(C.sobel_xy)), blur)

    @jax.jit
    @jax.vmap
    def nms_hyst(bl):
        low, high = C.percentiles_u8(bl, (10.0, 30.0))
        gx, gy = C.sobel_xy(bl)
        return C._canny_from_gradients(gx, gy, low * low, high * high)

    timeit("  pct+sobel+nms+hysteresis", nms_hyst, blur)

    @jax.jit
    @jax.vmap
    def nms_only(bl):
        low, high = C.percentiles_u8(bl, (10.0, 30.0))
        gx, gy = C.sobel_xy(bl)
        mag = (gx * gx + gy * gy).astype(jnp.float32)
        strong = mag > high * high
        weak = mag > low * low
        return strong, weak

    timeit("  pct+sobel+nms (no hyst)", nms_only, blur)

    # ---- level pyramid + packing cost: stage A with band minus no-canny
    # ---- stage B substages on the luma group (group 0)
    g0 = spec.groups[0]
    planes0 = gp[0]

    for s in g0.sizes:
        timeit(f"  B dct_dense s={s}", jax.jit(
            lambda p, s=s: dct.dct2_dense(p, s)), planes0)

    def full_size(p, s):
        gh, gw = g0.ph // s, g0.pw // s
        y = dct.dct2_dense(p, s)
        n_l = g0.n_l
        y6 = y.reshape(b, n_l, gh, s, gw, s)
        from aejpeg_tpu.codec.batch_encode import _quant_tables_np
        hi3, lo3, _ = _quant_tables_np(cfg, s)
        hi_g = np.stack([hi3[li] for li in g0.layers])
        lo_g = np.stack([lo3[li] for li in g0.layers])
        hi6 = jnp.asarray(hi_g).reshape(1, n_l, 1, s, 1, s)
        lo6 = jnp.asarray(lo_g).reshape(1, n_l, 1, s, 1, s)
        lv = jnp.round(y6 * hi6 + y6 * lo6).astype(jnp.int16)
        p_ = lv.reshape(b * n_l, gh, s, gw, s).transpose(
            0, 1, 3, 2, 4).reshape(b * n_l, gh * gw, s * s)
        from aejpeg_tpu.ops import zigzag
        zz = zigzag.zigzag_indices(s)
        return p_[:, :, jnp.asarray(zz)].reshape(-1)

    for s in g0.sizes:
        timeit(f"  B full s={s}", jax.jit(
            lambda p, s=s: full_size(p, s)), planes0)

    def no_zz(p, s):
        gh, gw = g0.ph // s, g0.pw // s
        y = dct.dct2_dense(p, s)
        n_l = g0.n_l
        y6 = y.reshape(b, n_l, gh, s, gw, s)
        from aejpeg_tpu.codec.batch_encode import _quant_tables_np
        hi3, lo3, _ = _quant_tables_np(cfg, s)
        hi_g = np.stack([hi3[li] for li in g0.layers])
        lo_g = np.stack([lo3[li] for li in g0.layers])
        hi6 = jnp.asarray(hi_g).reshape(1, n_l, 1, s, 1, s)
        lo6 = jnp.asarray(lo_g).reshape(1, n_l, 1, s, 1, s)
        lv = jnp.round(y6 * hi6 + y6 * lo6).astype(jnp.int16)
        return lv.reshape(b * n_l, gh, s, gw, s).transpose(
            0, 1, 3, 2, 4).reshape(-1)

    for s in g0.sizes:
        timeit(f"  B no-zigzag s={s}", jax.jit(
            lambda p, s=s: no_zz(p, s)), planes0)


if __name__ == "__main__":
    main()
