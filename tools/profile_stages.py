"""Micro-profile the encode pipeline on the live chip.

Part 1: per-stage wall times via encode_batch's timings dict (averaged).
Part 2: Canny sub-stage device times with REPEAT back-to-back dispatches
between syncs so the tunnel round-trip amortizes out.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import load_images, SPACE, QUALITY, BLOCKS, ENTROPY_LEVEL
from aejpeg_tpu.codec import batch_encode as be
from aejpeg_tpu.config import CodecConfig
from aejpeg_tpu.ops.canny import (canny, to_uint8, clahe, gaussian_blur_u8,
                                  bilateral_u8, sobel_xy,
                                  _canny_from_gradients)

REPEAT = 8


def timeit(name, fn, *args):
    out = fn(*args)  # compile
    be._sync(out)
    t0 = time.perf_counter()
    for _ in range(REPEAT):
        out = fn(*args)
    be._sync(out)
    dt = (time.perf_counter() - t0) / REPEAT
    print(f"{name:34s} {dt*1000:9.2f} ms/call")
    return out


def main():
    images = load_images()
    cfg = CodecConfig(SPACE, QUALITY, BLOCKS, entropy_level=ENTROPY_LEVEL)

    # ---- full pipeline stage attribution
    be.encode_batch(images, cfg)  # compile
    timings = {}
    iters = 4
    for _ in range(iters):
        be.encode_batch(images, cfg, timings=timings)
    print("encode_batch stages (s/batch):",
          {k: round(v / iters, 4) for k, v in timings.items()})

    # ---- canny sub-stages on the luma batch
    stacked = np.stack([im.data for im in images])
    layer = jnp.asarray(stacked[..., 0])
    timeit("canny (B luma)", jax.jit(jax.vmap(canny)), layer)
    u8 = jax.jit(jax.vmap(to_uint8))(layer)
    be._sync(u8)
    timeit("  clahe", jax.jit(jax.vmap(lambda x: clahe(x, 0.75, (4, 4)))), u8)
    eq = jax.vmap(lambda x: clahe(x, 0.75, (4, 4)))(u8)
    blur = jax.vmap(lambda x: gaussian_blur_u8(x, 3))(eq)
    timeit("  gaussian", jax.jit(jax.vmap(lambda x: gaussian_blur_u8(x, 3))),
           eq)
    timeit("  bilateral",
           jax.jit(jax.vmap(lambda x: bilateral_u8(x, 5, 75.0, 75.0))), blur)
    bil = jax.vmap(lambda x: bilateral_u8(x, 5, 75.0, 75.0))(blur)
    timeit("  sobel", jax.jit(jax.vmap(sobel_xy)), bil)
    gx, gy = jax.vmap(sobel_xy)(bil)
    lo = jnp.full((), 100.0, jnp.float32)
    hi = jnp.full((), 900.0, jnp.float32)
    timeit("  nms+hysteresis",
           jax.jit(jax.vmap(lambda a, b: _canny_from_gradients(
               a, b, lo * lo, hi * hi))), gx, gy)


if __name__ == "__main__":
    main()
