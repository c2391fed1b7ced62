"""Probe TPU lowering of candidate paint strategies for the s=4 decode
bucket at batch-42 scale: compile success + time + implied memory."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

P, GH, GW, S = 126, 160, 224, 4
M = P * GH * GW
N = 1 << 20


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[-1].ravel()[:1])


def timeit(name, fn, *args):
    try:
        out = fn(*args)
        _sync(out)
    except Exception as e:
        print(f"{name:28s} FAILED: {str(e)[:120]}")
        return
    t0 = time.perf_counter()
    for _ in range(4):
        out = fn(*args)
    _sync(out)
    print(f"{name:28s} {(time.perf_counter()-t0)/4*1000:9.2f} ms")


rng = np.random.default_rng(0)
blocks_flat = jnp.asarray(rng.standard_normal((N, S * S)).astype(np.float32))
flat_idx = jnp.asarray(
    rng.choice(M, size=N, replace=False).astype(np.int32))
inv_map = np.full(M, N, np.int32)
inv_map[np.asarray(flat_idx)] = np.arange(N, dtype=np.int32)
inv_map = jnp.asarray(inv_map)
_sync((blocks_flat, flat_idx, inv_map))


@jax.jit
def scatter_flat_then_d2s(blocks, idx):
    tiles = jnp.zeros((M, S * S), jnp.float32)
    tiles = tiles.at[idx].set(blocks, mode="drop")
    return tiles.reshape(P, GH, GW, S, S).transpose(0, 1, 3, 2, 4).reshape(
        P, GH * S, GW * S)


@jax.jit
def gather_flat_then_d2s(blocks, inv):
    padded = jnp.concatenate(
        [blocks, jnp.zeros((1, S * S), jnp.float32)], axis=0)
    tiles = padded[inv]
    return tiles.reshape(P, GH, GW, S, S).transpose(0, 1, 3, 2, 4).reshape(
        P, GH * S, GW * S)


@jax.jit
def gather_rowsegs(blocks, inv):
    # canvas as (P*GH*S, GW) segments of length S: canvas row-segment
    # (pl, ty, r, tx) = blocks[inv[tile], r*S:(r+1)*S]
    padded = jnp.concatenate(
        [blocks, jnp.zeros((1, S * S), jnp.float32)], axis=0)
    # seg ids: for each (pl, ty, r, tx) -> tile index
    tile_of_seg = (jnp.arange(P * GH * S * GW, dtype=jnp.int32)
                   .reshape(P * GH, S, GW))
    pl_ty = jnp.arange(P * GH, dtype=jnp.int32)[:, None, None]
    tx = jnp.arange(GW, dtype=jnp.int32)[None, None, :]
    r = jnp.arange(S, dtype=jnp.int32)[None, :, None]
    tile_idx = pl_ty * GW + tx
    row_sel = inv[tile_idx]                      # (P*GH, 1, GW) -> broadcast
    segs = padded[row_sel]                       # (P*GH, S, GW, 16)
    # pick row r columns r*S..r*S+S:  (P*GH, S, GW, S)
    cols = (r[..., None] * S + jnp.arange(S, dtype=jnp.int32))
    out = jnp.take_along_axis(
        segs, jnp.broadcast_to(cols, segs.shape[:3] + (S,)), axis=3)
    return out.reshape(P * GH, S, GW * S).reshape(P, GH * S, GW * S)


@jax.jit
def scatter_3d(blocks, idx):
    b3 = blocks.reshape(N, S, S)
    tiles = jnp.zeros((M, S, S), jnp.float32)
    tiles = tiles.at[idx].set(b3, mode="drop")
    return tiles.reshape(P, GH, GW, S, S).transpose(0, 1, 3, 2, 4).reshape(
        P, GH * S, GW * S)


timeit("scatter_flat+d2s", scatter_flat_then_d2s, blocks_flat, flat_idx)
timeit("gather_flat+d2s", gather_flat_then_d2s, blocks_flat, inv_map)
timeit("gather_rowsegs", gather_rowsegs, blocks_flat, inv_map)
timeit("scatter_3d (status quo)", scatter_3d, blocks_flat, flat_idx)
