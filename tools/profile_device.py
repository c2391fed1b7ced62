"""Break down device_busy on the real TPU: stage A vs stage B, and the
stage-A substages (color convert, resize, Canny stack, pyramid+packing).

Timing method: K back-to-back dispatches on device-resident input + one
sync (same as bench.py's device_busy), so tunnel latency amortizes.
"""

import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

LIVE = "/root/reference/test_images/LIVE_image_quality_assessment_database"
REPS = int(os.environ.get("AEJ_PROF_REPS", 8))


def main():
    import jax
    import jax.numpy as jnp
    from aejpeg_tpu.codec import batch_encode as be
    from aejpeg_tpu.codec import quadtree as qtree
    from aejpeg_tpu.config import CodecConfig
    from aejpeg_tpu.io.image import ImageData
    from aejpeg_tpu import color
    from aejpeg_tpu.ops import resize as rsz
    from aejpeg_tpu.ops.canny import canny
    import imageio.v3 as iio

    imgs = []
    for p in sorted(glob.glob(f"{LIVE}/*.bmp")):
        im = iio.imread(p)
        if im.shape == (512, 768, 3):
            imgs.append(im)
        if len(imgs) == 14:
            break
    u8 = np.stack(imgs * 3)
    b = u8.shape[0]
    h, w = u8.shape[1:3]
    mpix = b * h * w / 1e6
    cfg = CodecConfig("YCoCg", (20, 80), (4, 64), entropy_level=-1)
    layer_shapes = cfg.layer_shapes((h, w))
    band = (2, 6)
    batch_dev = jnp.asarray(u8)

    jit_b, spec = be._stage_b_fn(cfg, (h, w), b)

    def timeit(label, fn, *args):
        out = fn(*args)
        be._sync_all(out)
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
        be._sync_all(out)
        dt = (time.perf_counter() - t0) / REPS
        print(f"{label:28s} {dt * 1e3:8.2f} ms   {mpix / dt:8.1f} Mpix/s")
        return out

    print(f"batch {b} x {h}x{w} = {mpix:.1f} Mpix, reps={REPS}")

    # full pipeline pieces
    ga = timeit("stage A (full)", lambda x: be._stage_a(
        x, cfg.color_space, tuple(layer_shapes), band, spec), batch_dev)
    timeit("stage B (dense DCT/quant)", jit_b, ga[0])

    # stage A substages
    @jax.jit
    def s_color(x):
        xf = x.astype(jnp.float32)
        xf = xf * be._INV255_HI + xf * be._INV255_LO
        return color.convert("sRGB", cfg.color_space, xf)

    conv = timeit("  color convert", s_color, batch_dev)

    @jax.jit
    def s_resize(c):
        return [rsz.resize2d(c[..., i], tuple(layer_shapes[i]), "area")
                for i in range(3)]

    layers = timeit("  resize (3 layers)", s_resize, conv)

    @jax.jit
    def s_canny(ls):
        return [jax.vmap(canny)(l) for l in ls]

    edges = timeit("  canny x3 layers", s_canny, layers)

    @jax.jit
    def s_canny_luma(ls):
        return jax.vmap(canny)(ls[0])

    timeit("  canny luma only", s_canny_luma, layers)

    @jax.jit
    def s_pyramid(es):
        packed = []
        for i, e in enumerate(es):
            lh, lw = layer_shapes[i]
            root = qtree.root_size_for(lh, lw)
            base = jnp.zeros((b, root, root), jnp.bool_)
            base = base.at[:, :lh, :lw].set(e == 1.0)
            cur = base
            for k in range(1, band[1] + 1):
                cur = jax.vmap(be._pool_any, in_axes=(0, None))(cur, 2)
                if k >= band[0]:
                    packed.append(cur.reshape(b, -1))
        bits = jnp.concatenate(packed, axis=1)
        pad = (-bits.shape[1]) % 8
        bits = jnp.pad(bits, ((0, 0), (0, pad)))
        w8 = jnp.asarray(be._BIT_WEIGHTS)
        return (bits.reshape(b, -1, 8) * w8).sum(
            axis=-1, dtype=jnp.uint32).astype(jnp.uint8)

    timeit("  pyramid+bitpack", s_pyramid, edges)


if __name__ == "__main__":
    main()
