"""Round-5 stage-B layout experiment (VERDICT r4 #2).

r4 measured the per-size stage-B passes as layout/bandwidth-bound (~4 ms
each, size-independent).  Each pass currently does: dense DCT einsum ->
quant+round+int16 -> 5-D transpose (block-major) -> zigzag gather.  The
transpose and the zigzag are BOTH pure data movement; this experiment
fuses them into ONE static gather along a wide flattened axis:

  lv (p, gh, s, gw, s) -> view (p, gh, s*gw*s)
  out[p, g, c*s*s + k] = lv[p, g, i(k)*gw*s + c*s + j(k)]

i.e. a single take_along_axis with a precomputed (gw*s*s,) index vector
(last dim >= 1536 — healthy lane count), versus transpose+gather's two
relayout passes.  Checks bitwise equality against the production chain,
then times both.  Run on the real TPU.
"""
import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from aejpeg_tpu.codec import batch_encode as be
from aejpeg_tpu.codec.batch_encode import _quant_tables_np
from aejpeg_tpu.config import CodecConfig
from aejpeg_tpu.ops import dct, zigzag

LIVE = "/root/reference/test_images/LIVE_image_quality_assessment_database"
BATCH, REPLICATE = 14, 3
REPS = int(os.environ.get("REPS", 8))
BLOCKS = tuple(int(x) for x in
               os.environ.get("AEJ_BENCH_BLOCKS", "4,128").split(","))


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
    print(f"{name:40s} {dt * 1e3:8.2f} ms", flush=True)
    return out


def main():
    u8 = load()
    b, h, w = u8.shape[:3]
    cfg = CodecConfig("YCoCg", (20, 80), BLOCKS)
    jit_b, spec = be._stage_b_fn(cfg, (h, w), b)
    import math
    band = (int(math.log2(BLOCKS[0])) + 1, int(math.log2(BLOCKS[1])))
    layer_shapes = cfg.layer_shapes((h, w))
    batch_dev = jnp.asarray(u8)
    gp, pb = be._stage_a(batch_dev, cfg.color_space, tuple(layer_shapes),
                         band, spec)
    be._sync_all((gp, pb))

    g0 = spec.groups[0]
    planes0 = gp[0]
    n_l = g0.n_l

    def chain_current(p, s):
        gh, gw = g0.ph // s, g0.pw // s
        y = dct.dct2_dense(p, s)
        y6 = y.reshape(b, n_l, gh, s, gw, s)
        hi3, lo3, _ = _quant_tables_np(cfg, s)
        hi6 = jnp.asarray(np.stack([hi3[li] for li in g0.layers])).reshape(
            1, n_l, 1, s, 1, s)
        lo6 = jnp.asarray(np.stack([lo3[li] for li in g0.layers])).reshape(
            1, n_l, 1, s, 1, s)
        lv = jnp.round(y6 * hi6 + y6 * lo6).astype(jnp.int16)
        rows = lv.reshape(b * n_l, gh, s, gw, s).transpose(
            0, 1, 3, 2, 4).reshape(b * n_l, gh * gw, s * s)
        zz = zigzag.zigzag_indices(s)
        return rows[:, :, jnp.asarray(zz)].reshape(-1)

    def chain_fused(p, s):
        gh, gw = g0.ph // s, g0.pw // s
        y = dct.dct2_dense(p, s)
        y6 = y.reshape(b, n_l, gh, s, gw, s)
        hi3, lo3, _ = _quant_tables_np(cfg, s)
        hi6 = jnp.asarray(np.stack([hi3[li] for li in g0.layers])).reshape(
            1, n_l, 1, s, 1, s)
        lo6 = jnp.asarray(np.stack([lo3[li] for li in g0.layers])).reshape(
            1, n_l, 1, s, 1, s)
        lv = jnp.round(y6 * hi6 + y6 * lo6).astype(jnp.int16)
        # fused transpose+zigzag: one static gather over the wide axis
        zz = zigzag.zigzag_indices(s)
        i_k = (zz // s).astype(np.int64)
        j_k = (zz % s).astype(np.int64)
        c = np.arange(gw, dtype=np.int64)
        idx = (i_k[None, :] * (gw * s) + c[:, None] * s
               + j_k[None, :]).reshape(-1)                 # (gw*s*s,)
        flat = lv.reshape(b * n_l, gh, s * gw * s)
        out = jnp.take(flat, jnp.asarray(idx), axis=2)
        return out.reshape(-1)

    sizes = list(g0.sizes)
    print(f"group 0: {g0.ph}x{g0.pw}, n_l={n_l}, sizes {sizes}")
    for s in sizes:
        a = np.asarray(jax.jit(lambda p, s=s: chain_current(p, s))(planes0))
        f = np.asarray(jax.jit(lambda p, s=s: chain_fused(p, s))(planes0))
        eq = np.array_equal(a, f)
        print(f"s={s}: fused == current: {eq}")
        assert eq, f"fused chain diverges at s={s}"

    for s in sizes:
        timeit(f"current s={s}", jax.jit(
            lambda p, s=s: chain_current(p, s)), planes0)
    for s in sizes:
        timeit(f"fused   s={s}", jax.jit(
            lambda p, s=s: chain_fused(p, s)), planes0)

    # all sizes inside ONE jit, both variants (XLA may fuse across sizes)
    timeit("ALL sizes current", jax.jit(
        lambda p: tuple(chain_current(p, s) for s in sizes)), planes0)
    timeit("ALL sizes fused", jax.jit(
        lambda p: tuple(chain_fused(p, s) for s in sizes)), planes0)

    # ---- decode direction: inverse zigzag + block de-transpose fused the
    # same way (stage D does gather -> 6-D transpose -> idct per size)
    rng = np.random.default_rng(0)
    s0 = sizes[len(sizes) // 2]
    gh, gw = g0.ph // s0, g0.pw // s0
    p_ = b * n_l
    zzr_np = (rng.standard_normal((p_, gh * gw, s0 * s0)) * 5).astype(
        np.int16)
    zzrows = jnp.asarray(zzr_np)
    q = jnp.asarray(rng.random((1, n_l, 1, 1, s0, s0)).astype(np.float32))

    def dec_current(zz_in):
        inv = zigzag.inverse_zigzag_indices(s0)
        raster = zz_in[:, :, jnp.asarray(inv)]
        lv = raster.reshape(b, n_l, gh, gw, s0, s0)
        coeffs = (lv * q).astype(jnp.float32)
        return coeffs.transpose(0, 1, 2, 4, 3, 5).reshape(-1)

    def dec_fused(zz_in):
        # out[(i, c, j)] = in[(c, inv[i, j])] — inverse zigzag and block
        # de-transpose in one static gather along the wide axis
        inv2 = np.asarray(
            zigzag.inverse_zigzag_indices(s0)).reshape(s0, s0)
        c = np.arange(gw, dtype=np.int64)
        idx = (c[None, :, None] * (s0 * s0)
               + inv2[:, None, :]).reshape(-1)          # (s0*gw*s0,)
        flat = zz_in.reshape(p_, gh, gw * s0 * s0)
        out = jnp.take(flat, jnp.asarray(idx), axis=2)
        lv = out.reshape(b, n_l, gh, s0, gw, s0)
        q6 = q.reshape(1, n_l, 1, s0, 1, s0)
        return (lv * q6).astype(jnp.float32).reshape(-1)

    a = np.asarray(jax.jit(dec_current)(zzrows))
    f = np.asarray(jax.jit(dec_fused)(zzrows))
    print(f"decode fused == current (s={s0}): {np.array_equal(a, f)}")
    timeit(f"decode current s={s0}", jax.jit(dec_current), zzrows)
    timeit(f"decode fused   s={s0}", jax.jit(dec_fused), zzrows)


if __name__ == "__main__":
    main()
