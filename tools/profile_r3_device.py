"""Round-3 device-side profile: time stage A, stage B, and Canny substages
back-to-back on device-resident input (tunnel dispatch amortized)."""
import glob
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from aejpeg_tpu.codec import batch_encode as be
from aejpeg_tpu.config import CodecConfig
from aejpeg_tpu.io.image import ImageData

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
    print(f"{name:28s} {dt * 1e3:8.2f} ms")
    return out


def main():
    u8 = load()
    b, h, w = u8.shape[:3]
    cfg = CodecConfig("YCoCg", (20, 80), (4, 64))
    layer_shapes = cfg.layer_shapes((h, w))
    band = (3, 6)
    jit_b, spec = be._stage_b_fn(cfg, (h, w), b)
    batch_dev = jnp.asarray(u8)
    be._sync(batch_dev)

    stage_a = lambda: be._stage_a(batch_dev, cfg.color_space,
                                  tuple(layer_shapes), band, spec)
    gp, pb = timeit("stage A (full)", stage_a)
    timeit("stage B (dense tables)", jit_b, gp)
    timeit("A+B", lambda: jit_b(stage_a()[0]))

    # stage A without canny/levels (band=None path)
    timeit("stage A no-canny", lambda: be._stage_a(
        batch_dev, cfg.color_space, tuple(layer_shapes), None, spec))

    # canny alone on the 3 layers
    from aejpeg_tpu.ops import resize
    from aejpeg_tpu.ops.canny import canny
    from aejpeg_tpu import color

    @jax.jit
    def to_layers(x):
        from aejpeg_tpu.ops.pallas_kernels import u8_to_unit_exact
        xf = u8_to_unit_exact(x)
        conv = color.convert("sRGB", cfg.color_space, xf)
        return [resize.resize2d(conv[..., i], tuple(layer_shapes[i]), "area")
                for i in range(3)]

    layers = timeit("color+downsample", to_layers, batch_dev)

    canny_b = jax.jit(jax.vmap(canny))
    for i in range(3):
        timeit(f"canny layer {i} {layers[i].shape}", canny_b, layers[i])

    # canny substage timings live in tools/profile_r4_device.py


if __name__ == "__main__":
    main()
