"""Profile CLAHE internals: tile histograms vs LUT math vs LUT apply."""
import glob
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from aejpeg_tpu.codec import batch_encode as be
from aejpeg_tpu.ops import canny as C
from aejpeg_tpu.ops.pallas_kernels import histogram256, clahe_lut_apply

LIVE = "/root/reference/test_images/LIVE_image_quality_assessment_database"
REPS = 10


def timeit(name, fn, *a):
    out = fn(*a)
    be._sync_all(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*a)
    be._sync_all(out)
    print(f"{name:30s} {(time.perf_counter() - t0) / REPS * 1e3:8.2f} ms")
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
    u8 = np.stack(imgs * 3)
    img = jnp.asarray(u8.astype(np.int32))
    be._sync(img)
    h, w = 512, 768
    gh = gw = 4
    th, tw = h // gh, w // gw

    @jax.jit
    def tile_hists(x):
        tiles = x.reshape(-1, gh, th, gw, tw).transpose(0, 1, 3, 2, 4)
        tiles = tiles.reshape(-1, gh * gw, th * tw)
        return jax.vmap(histogram256)(tiles)

    hists = timeit("tile histograms", tile_hists, img)

    @jax.jit
    def luts_from(x):
        return jax.vmap(lambda p: C._clahe_luts(p, th, tw, gh, gw, 0.75))(
            x.astype(jnp.uint8))
    luts = timeit("luts (hist+clip+cumsum)", luts_from, img)

    wts = jnp.asarray(C._clahe_tile_weights(h, w, th, tw, gh, gw))

    @jax.jit
    def apply_all(x, l):
        lm = l.reshape(-1, gh * gw, 256).transpose(0, 2, 1).astype(
            jnp.bfloat16)
        return jax.vmap(lambda xi, li: clahe_lut_apply(xi, li, wts))(x, lm)

    timeit("lut apply", apply_all, img, luts)

    # percentile histogram shape for comparison
    @jax.jit
    def perc_hist(x):
        flat = x.reshape(x.shape[0], 8, -1)
        return jax.vmap(histogram256)(flat)
    timeit("percentile histogram (8 rows)", perc_hist, img)


if __name__ == "__main__":
    main()
