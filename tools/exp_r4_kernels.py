"""Round-4 kernel experiments: CLAHE apply blocking variants + batched
histogram. Times on the real TPU; checks exact equality vs current."""
import sys
import time
import functools

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aejpeg_tpu.codec import batch_encode as be
from aejpeg_tpu.ops.pallas_kernels import clahe_lut_apply, histogram256

H, W, B = 512, 768, 42
T = 16

rng = np.random.default_rng(0)
img_np = rng.integers(0, 256, (B, H, W), dtype=np.int32)
lut_np = rng.integers(0, 256, (256, T)).astype(np.float32)
from aejpeg_tpu.ops.canny import _clahe_tile_weights
wts_np = _clahe_tile_weights(H, W, 128, 192, 4, 4)

img = jnp.asarray(img_np)
lut = jnp.asarray(lut_np).astype(jnp.bfloat16)
wts = jnp.asarray(wts_np)
be._sync_all((img, lut, wts))


def timeit(name, fn, *a, reps=8):
    out = fn(*a)
    be._sync_all(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    be._sync_all(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt * 1e3:8.2f} ms", flush=True)
    return out


# ---- current kernel
cur = timeit("current (8x512 blocks, vmap)", jax.jit(jax.vmap(
    lambda im: clahe_lut_apply(im, lut, wts))), img)


# ---- variant: parameterized block size
def _kern(img_ref, lut_ref, wts_ref, out_ref):
    bh, bw = img_ref.shape
    bins = jax.lax.broadcasted_iota(jnp.int32, (bh, bw, 256), 2)
    oh = (img_ref[:][:, :, None] == bins).astype(jnp.bfloat16)
    contrib = jax.lax.dot_general(
        oh, lut_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[:] = (wts_ref[:] * contrib).sum(axis=-1)


def apply_v2(img2, lut2, wts2, rows, cols):
    h, w = img2.shape
    t = lut2.shape[1]
    out = pl.pallas_call(
        _kern,
        grid=(h // rows, w // cols),
        in_specs=[
            pl.BlockSpec((rows, cols), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, t), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, cols, t), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, cols), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
    )(img2, lut2, wts2)
    return out


for rows, cols in ((16, 768), (32, 768), (64, 768), (8, 768), (32, 384)):
    try:
        o = timeit(f"blocks {rows}x{cols}", jax.jit(jax.vmap(
            lambda im: apply_v2(im, lut, wts, rows, cols))), img)
        print("   equal:", bool(jnp.all(o == cur)))
    except Exception as e:
        print(f"blocks {rows}x{cols} failed: {type(e).__name__}: {str(e)[:120]}")


# ---- variant: flatten batch into rows (one pallas_call, no vmap)
img_flat = img.reshape(B * H, W)
wts_b = jnp.broadcast_to(wts[None], (B, H, W, T)).reshape(B * H, W, T)
# NOTE: wts_b materializes (B*H, W, T) f32 = 1GB... skip; instead tile wts by
# making index_map wrap modulo H.
def apply_flat(img2, lut2, wts2, rows, cols):
    h, w = img2.shape
    t = lut2.shape[1]
    out = pl.pallas_call(
        _kern,
        grid=(h // rows, w // cols),
        in_specs=[
            pl.BlockSpec((rows, cols), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, t), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, cols, t),
                         lambda i, j: (i % (H // rows), j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, cols), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
    )(img2, lut2, wts2)
    return out

# per-image LUT selection needs lut per row-block; use batched lut with
# index map over images
lut_b = jnp.asarray(np.stack([lut_np] * B)).astype(jnp.bfloat16)  # (B,256,T)

def _kern3(img_ref, lut_ref, wts_ref, out_ref):
    bh, bw = img_ref.shape
    bins = jax.lax.broadcasted_iota(jnp.int32, (bh, bw, 256), 2)
    oh = (img_ref[:][:, :, None] == bins).astype(jnp.bfloat16)
    contrib = jax.lax.dot_general(
        oh, lut_ref[0], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[:] = (wts_ref[:] * contrib).sum(axis=-1)

def apply_flat_b(img2, lut3, wts2, rows, cols):
    h, w = img2.shape
    t = lut3.shape[2]
    out = pl.pallas_call(
        _kern3,
        grid=(h // rows, w // cols),
        in_specs=[
            pl.BlockSpec((rows, cols), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 256, t),
                         lambda i, j: (i // (H // rows), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, cols, t),
                         lambda i, j: (i % (H // rows), j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, cols), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
    )(img2, lut3, wts2)
    return out

for rows in (16, 32, 64):
    try:
        o = timeit(f"flat-batch blocks {rows}x{W}", jax.jit(
            lambda im: apply_flat_b(im, lut_b, wts, rows, W)), img_flat)
        print("   equal:", bool(jnp.all(o.reshape(B, H, W) == cur)))
    except Exception as e:
        print(f"flat {rows} failed: {type(e).__name__}: {str(e)[:120]}")

# ---- histogram batching: G tiles per grid step via batched dot_general
from aejpeg_tpu.ops.pallas_kernels import _hist_consts, _diag_mask

def _hist_kernel_g(vals_ref, sel_ref, bins_ref, out_ref):
    sel = sel_ref[:]
    bins = bins_ref[:]
    rows = vals_ref[:]                   # (G, N/8, 8) int32
    hi = (rows >> 4).astype(jnp.bfloat16)
    lo = (rows & 15).astype(jnp.bfloat16)
    rep_hi = jax.lax.dot_general(hi, sel, (((2,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    rep_lo = jax.lax.dot_general(lo, sel, (((2,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    a2 = (rep_hi == bins).astype(jnp.bfloat16)      # (G, N/8, 128)
    b2 = (rep_lo == bins).astype(jnp.bfloat16)
    out_ref[:] = jax.lax.dot_general(
        a2, b2, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)

def histogram256_g(values, g=8):
    t, n = values.shape
    pad = (-n) % 128
    if pad:
        values = jnp.pad(values, ((0, 0), (0, pad)), constant_values=-1)
        n += pad
    tpad = (-t) % g
    if tpad:
        values = jnp.pad(values, ((0, tpad), (0, 0)), constant_values=-1)
        t += tpad
    sel_np, bins_np = _hist_consts()
    sel = jnp.asarray(sel_np, jnp.bfloat16)
    bins = jnp.asarray(bins_np, jnp.float32)
    pairs = pl.pallas_call(
        _hist_kernel_g,
        grid=(t // g,),
        in_specs=[
            pl.BlockSpec((g, n // 8, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, 128, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, 128, 128), jnp.float32),
    )(values.reshape(t, n // 8, 8), sel, bins)
    r4 = pairs.reshape(t, 8, 16, 8, 16)
    hist = (r4 * jnp.asarray(_diag_mask())).sum(axis=(1, 3))
    return hist.reshape(t, 256).astype(jnp.int32)[: values.shape[0] - tpad if tpad else t]

tiles = jnp.asarray(rng.integers(0, 256, (672, 24576), dtype=np.int64).astype(np.int32))
be._sync(tiles)
h_cur = timeit("histogram current (672 steps)", jax.jit(histogram256), tiles)
for g in (4, 8, 16):
    try:
        hg = timeit(f"histogram G={g} ({672//g} steps)", jax.jit(
            functools.partial(histogram256_g, g=g)), tiles)
        print("   equal:", bool(jnp.all(hg[:672] == h_cur)))
    except Exception as e:
        print(f"hist G={g} failed: {type(e).__name__}: {str(e)[:140]}")
