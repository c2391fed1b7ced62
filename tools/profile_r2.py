"""Round-2 micro-profile: canny sub-stages, percentile, stage_b internals,
assemble breakdown — on the live chip."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import load_images, SPACE, QUALITY, BLOCKS, ENTROPY_LEVEL
from aejpeg_tpu.codec import batch_encode as be
from aejpeg_tpu.config import CodecConfig
from aejpeg_tpu.ops import dct
from aejpeg_tpu.ops.canny import (canny, to_uint8, clahe, gaussian_blur_u8,
                                  bilateral_u8, sobel_xy, percentile_u8,
                                  _canny_from_gradients, _hysteresis)

REPEAT = 8


def timeit(name, fn, *args):
    out = fn(*args)  # compile
    be._sync(out)
    t0 = time.perf_counter()
    for _ in range(REPEAT):
        out = fn(*args)
    be._sync(out)
    dt = (time.perf_counter() - t0) / REPEAT
    print(f"{name:40s} {dt*1000:9.2f} ms/call", flush=True)
    return out


def main():
    images = load_images()
    cfg = CodecConfig(SPACE, QUALITY, BLOCKS, entropy_level=ENTROPY_LEVEL)

    stacked = np.stack([im.data for im in images])
    layer = jnp.asarray(stacked[..., 0])
    be._sync(layer)
    b, h, w = layer.shape
    print(f"batch {b} x {h}x{w} luma", flush=True)

    timeit("canny (B luma)", jax.jit(jax.vmap(canny)), layer)
    u8 = jax.jit(jax.vmap(to_uint8))(layer)
    be._sync(u8)
    timeit("  to_uint8", jax.jit(jax.vmap(to_uint8)), layer)
    timeit("  clahe", jax.jit(jax.vmap(lambda x: clahe(x, 0.75, (4, 4)))), u8)
    eq = jax.jit(jax.vmap(lambda x: clahe(x, 0.75, (4, 4))))(u8)
    be._sync(eq)
    blur = jax.jit(jax.vmap(lambda x: gaussian_blur_u8(x, 3)))(eq)
    be._sync(blur)
    timeit("  gaussian", jax.jit(jax.vmap(lambda x: gaussian_blur_u8(x, 3))),
           eq)
    timeit("  bilateral",
           jax.jit(jax.vmap(lambda x: bilateral_u8(x, 5, 75.0, 75.0))), blur)
    bil = jax.jit(jax.vmap(lambda x: bilateral_u8(x, 5, 75.0, 75.0)))(blur)
    be._sync(bil)
    timeit("  percentile x2",
           jax.jit(jax.vmap(lambda x: (percentile_u8(x, 10.0),
                                       percentile_u8(x, 30.0)))), bil)
    timeit("  sobel", jax.jit(jax.vmap(sobel_xy)), bil)
    gx, gy = jax.jit(jax.vmap(sobel_xy))(bil)
    be._sync((gx, gy))
    lo = jnp.full((), 100.0, jnp.float32)
    hi = jnp.full((), 900.0, jnp.float32)
    timeit("  nms+hysteresis",
           jax.jit(jax.vmap(lambda a, b: _canny_from_gradients(
               a, b, lo * lo, hi * hi))), gx, gy)

    # hysteresis alone
    mag = (gx * gx + gy * gy).astype(jnp.float32)
    strong = mag > 900.0 * 900.0
    weak = mag > 100.0 * 100.0
    timeit("  hysteresis alone",
           jax.jit(jax.vmap(_hysteresis)), strong, weak)

    # ---- stage_b style microbenches on dense data
    p = b * 3
    ph, pw = 512, 768
    planes = jnp.asarray(np.random.randn(p, ph, pw).astype(np.float32) * 30)
    be._sync(planes)
    gh8, gw8 = ph // 8, pw // 8
    ntiles = p * gh8 * gw8

    @jax.jit
    def s2d(pl):
        return pl.reshape(p, gh8, 8, gw8, 8).transpose(0, 1, 3, 2, 4).reshape(
            ntiles, 64)
    tiles8 = timeit("space-to-depth 8", s2d, planes)
    be._sync(tiles8)

    # gather benchmark: 300k random rows
    nrows = 300_000
    idx = jnp.asarray(
        np.random.randint(0, ntiles, nrows).astype(np.int32))
    be._sync(idx)
    timeit("row gather 300k x 64 f32",
           jax.jit(lambda t, i: t[i]), tiles8, idx)

    # dense per-size separable DCT+quant (the proposed stage_b)
    def dense_dct(pl, s):
        gh, gw = ph // s, pw // s
        d = jnp.asarray(dct.dct_matrix(s))
        x = pl.reshape(p, gh, s, gw, s)
        y = jnp.einsum("km,bimjn->bikjn", d, x, precision="highest")
        y = jnp.einsum("bikjn,ln->bikjl", y, d, precision="highest")
        return jnp.round(y).astype(jnp.int16)

    for s in (8, 16, 32, 64):
        timeit(f"dense sep DCT s={s} (+round->i16)",
               jax.jit(lambda pl, s=s: dense_dct(pl, s)), planes)

    @jax.jit
    def dense_all(pl):
        return tuple(dense_dct(pl, s) for s in (8, 16, 32, 64))
    timeit("dense sep DCT all sizes", dense_all, planes)


if __name__ == "__main__":
    main()
