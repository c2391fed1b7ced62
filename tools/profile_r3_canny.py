"""Profile the Canny substages batched over 42x512x768 on the real TPU."""
import glob
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from aejpeg_tpu.codec import batch_encode as be
from aejpeg_tpu.ops import canny as C

LIVE = "/root/reference/test_images/LIVE_image_quality_assessment_database"
REPS = 10


def timeit(name, fn, *a):
    out = fn(*a)
    be._sync_all(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*a)
    be._sync_all(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:30s} {dt * 1e3:8.2f} ms")
    return out


def main():
    import imageio.v3 as iio
    imgs = []
    for p in sorted(glob.glob(f"{LIVE}/*.bmp")):
        im = iio.imread(p)
        if im.shape == (512, 768, 3):
            imgs.append(im[..., 0])
        if len(imgs) == 14:
            break
    u8 = np.stack(imgs * 3)  # (42, 512, 768) uint8 luminance-ish
    lay = jnp.asarray(u8.astype(np.float32) / 255.0)
    be._sync(lay)

    v = lambda f: jax.jit(jax.vmap(f))
    u8d = timeit("to_uint8", v(C.to_uint8), lay)
    eq = timeit("clahe", v(lambda x: C.clahe(x, 0.75, (4, 4))), u8d)
    blur = timeit("gaussian", v(C.gaussian_blur_u8), eq)
    bil = timeit("bilateral", v(C.bilateral_u8), blur)
    timeit("percentiles", v(lambda x: C.percentiles_u8(x, (10.0, 30.0))), bil)
    gxy = timeit("sobel", v(C.sobel_xy), bil)

    @jax.jit
    def nms_hyst(gx, gy, img):
        low, high = jax.vmap(lambda x: C.percentiles_u8(x, (10.0, 30.0)))(img)
        return jax.vmap(C._canny_from_gradients)(gx, gy, low * low,
                                                 high * high)
    timeit("nms+hysteresis", nms_hyst, gxy[0], gxy[1], bil)

    # hysteresis alone
    @jax.jit
    def just_nms(gx, gy, img):
        low, high = jax.vmap(lambda x: C.percentiles_u8(x, (10.0, 30.0)))(img)
        mag = (gx * gx + gy * gy).astype(jnp.float32)
        return mag > (high * high)[:, None, None]
    strongish = timeit("nms-proxy (mag>high)", just_nms, gxy[0], gxy[1], bil)

    timeit("full canny", v(C.canny), lay)


if __name__ == "__main__":
    main()
