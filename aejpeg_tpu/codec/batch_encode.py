"""Batched quadtree-active encoder: the production throughput path.

The per-image `Codec.compress` dispatches one device call per (layer, size
bucket) — fine interactively, but dispatch latency dominates at batch scale.
This module restructures encode around *global buckets*:

  stage A (1 jit call / batch):  color convert, downsample, Canny, pooled
      has-edge levels, normalization for B same-shape images.  Only the
      pyramid levels the split predicate can consult (min < size <= max,
      <= 1/64th of the pixels for min=4) leave the device.
  host: quadtree plans per (image, layer) from the pooled levels; leaves of
      every image/layer are concatenated per block size.
  stage B (1 jit call / block size):  gather reflect-padded blocks from the
      stacked normalized planes (per-block plane index + per-block bounds),
      DCT matmul, per-layer df32 quantization, zigzag — for ALL images at
      once, padded to capacity buckets.
  host: preorder stream assembly + parallel deflate per image (thread pool
      overlaps images).

Output containers are byte-compatible with `Codec.compress` (and the
reference format).
"""

import functools
import math
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import color
from ..config import CodecConfig
from ..io.container import (ContainerMetadata, ContainerWriter, LayerPayload)
from ..io.image import ImageData
from ..native import deflate_parallel
from ..ops import dct, quant, resize, zigzag
from ..ops.canny import canny
from . import quadtree as qt


def _pool_any(mask: jnp.ndarray, factor: int) -> jnp.ndarray:
    h, w = mask.shape
    return mask.reshape(h // factor, factor, w // factor, factor).any(
        axis=(1, 3))


def _plane_shape(layer_shapes) -> Tuple[int, int]:
    """Stacked-plane shape: layer 0 rounded up to space-to-depth tiles."""
    ph, pw = layer_shapes[0]
    t = dct.TILE
    return -(-ph // t) * t, -(-pw // t) * t


@functools.partial(jax.jit, static_argnames=("space", "layer_shapes",
                                             "level_band"))
def _stage_a(batch: jnp.ndarray, space: str,
             layer_shapes: Tuple[Tuple[int, int], ...],
             level_band: Tuple[int, int]):
    """(B, H, W, 3) -> per-layer (normalized layers, pooled levels).

    level_band = (k_lo, k_hi): pooled has-edge masks returned for node sizes
    2**k, k_lo <= k <= k_hi.  Accepts uint8 input (4x smaller host-link
    upload) — the on-device /255 is bit-identical to the host loader."""
    if batch.dtype == jnp.uint8:
        x = batch.astype(jnp.float32)
        batch = x * _INV255_HI + x * _INV255_LO
    mids, scales = color.normalization_constants(space)
    converted = color.convert("sRGB", space, batch)

    # planes padded to TILE multiples: stage_b space-to-depths them once
    ph, pw = _plane_shape(layer_shapes)
    norms, packed = [], []
    for i, (lh, lw) in enumerate(layer_shapes):
        layer = resize.resize2d(converted[..., i], (lh, lw), "area")
        edges = jax.vmap(canny)(layer)
        root = qt.root_size_for(lh, lw)
        base = jnp.zeros((edges.shape[0], root, root), jnp.bool_)
        base = base.at[:, :lh, :lw].set(edges == 1.0)
        cur = base
        for k in range(1, level_band[1] + 1):
            cur = jax.vmap(_pool_any, in_axes=(0, None))(cur, 2)
            if k >= level_band[0]:
                packed.append(cur.reshape(cur.shape[0], -1))
        norm = (layer - mids[i]) * scales[i]
        norms.append(jnp.pad(norm, ((0, 0), (0, ph - lh), (0, pw - lw))))
    # (B, 3, ph, pw) -> (B*3, ph, pw): the stacked planes stage_b gathers
    # blocks from (built here so no eager pad/stack dispatches sit between
    # the two stages)
    planes = jnp.stack(norms, axis=1).reshape(-1, ph, pw)
    # one packed uint8 tensor -> a single host transfer for all levels
    packed = (jnp.concatenate(packed, axis=1).astype(jnp.uint8)
              if packed else jnp.zeros((batch.shape[0], 0), jnp.uint8))
    return planes, packed


def _level_layout(layer_shapes, level_band):
    """Host-side descriptor matching _stage_a's packed level tensor:
    [(layer, k, grid, offset)]."""
    out = []
    off = 0
    for i, (lh, lw) in enumerate(layer_shapes):
        root = qt.root_size_for(lh, lw)
        for k in range(level_band[0], level_band[1] + 1):
            g = root >> k
            out.append((i, k, g, off))
            off += g * g
    return out, off


_INV255_HI = np.float32(1.0 / 255.0)
_INV255_LO = np.float32(1.0 / 255.0 - np.float64(np.float32(1.0 / 255.0)))


@jax.jit
def _u8_to_unit_float(batch: jnp.ndarray) -> jnp.ndarray:
    """uint8 -> float32/255, bit-identical to the host loader's
    x.astype(f32)/255 over all 256 inputs (exhaustively tested).

    XLA's compiled f32 divide is not correctly rounded (126/256 values are
    1 ulp off vs numpy), so divide via the double-float32 reciprocal:
    x*hi + x*lo compensates the representation error of 1/255."""
    x = batch.astype(jnp.float32)
    return x * _INV255_HI + x * _INV255_LO


def _finish_bucket(blocks: jnp.ndarray, plane_idx: jnp.ndarray,
                   inv_hi3: jnp.ndarray, inv_lo3: jnp.ndarray
                   ) -> jnp.ndarray:
    """DCT -> df32 quantize (per-LAYER tables selected by plane_idx % 3)
    -> zigzag int16.  Levels are bounded by the DCT gain: |coeff| <=
    size * 127.5 <= 16320 for size <= 128, quant divides by Q >= 1, so
    int16 never saturates and the pull moves half the bytes."""
    inv_hi = inv_hi3[plane_idx % 3]
    inv_lo = inv_lo3[plane_idx % 3]
    coeffs = dct.dct2(blocks)
    levels = quant.quantize(coeffs, inv_hi, inv_lo)
    return zigzag.zigzag_gather(levels).astype(jnp.int16)


def _bucket_coeffs_tiled(tiles8: jnp.ndarray, idx8: jnp.ndarray,
                         inv_hi_z: jnp.ndarray, inv_lo_z: jnp.ndarray,
                         size: int, kind: str, gsize: int) -> jnp.ndarray:
    """Interior-block bucket over the SHARED 8x8 space-to-depth layout.

    Quadtree leaves are size-aligned, so an interior size-s (s >= 8) block
    is exactly (s/8)^2 whole rows of tiles8; a sibling quad of four 4x4
    leaves is exactly one row.  One row-gather (64-wide rows: no (8,128)
    tiling waste, good gather granularity) plus ONE fused matmul that
    folds subtile->raster permutation, Kronecker 2-D DCT, and the zigzag
    output permutation (see ops/dct.py) — quantization tables arrive
    zigzag-permuted so no per-lane gather remains."""
    if kind == "quad":
        mz, k2 = dct.quad4_zigzag_matrix(), 1
    else:
        mz, k2 = dct.tiled_zigzag_matrix(size), (size // 8) ** 2
    g = tiles8[idx8]                                    # (cap*k2, 64)
    x = g.reshape(-1, k2 * 64)
    y = jnp.einsum("nk,kl->nl", x, jnp.asarray(mz), precision="highest")
    plane_idx = idx8.reshape(-1, k2)[:, 0] // gsize
    levels = quant.quantize(y, inv_hi_z[plane_idx % 3],
                            inv_lo_z[plane_idx % 3])
    return levels.astype(jnp.int16)


def _bucket_coeffs(planes: jnp.ndarray, plane_idx: jnp.ndarray,
                   ys: jnp.ndarray, xs: jnp.ndarray, lim_h: jnp.ndarray,
                   lim_w: jnp.ndarray, inv_hi3: jnp.ndarray,
                   inv_lo3: jnp.ndarray, size: int) -> jnp.ndarray:
    """Boundary-block bucket (general path): per-block plane index, origin,
    and true layer bounds; reflect-pads against each block's own available
    region exactly as the reference does (src/jpeg/jpeg.py:398-402)."""
    inv_hi = inv_hi3[plane_idx % 3]
    inv_lo = inv_lo3[plane_idx % 3]
    # reflect against each block's own layer bounds
    offs = jnp.arange(size, dtype=jnp.int32)[None, :]
    avail_h = jnp.maximum(lim_h - ys, 1)[:, None]
    period_h = jnp.maximum(2 * avail_h - 2, 1)
    mh = offs % period_h
    rows = ys[:, None] + jnp.where(mh < avail_h, mh, period_h - mh)
    avail_w = jnp.maximum(lim_w - xs, 1)[:, None]
    period_w = jnp.maximum(2 * avail_w - 2, 1)
    mw = offs % period_w
    cols = xs[:, None] + jnp.where(mw < avail_w, mw, period_w - mw)

    blocks = planes[plane_idx[:, None, None], rows[:, :, None],
                    cols[:, None, :]]
    return _finish_bucket(blocks, plane_idx, inv_hi3, inv_lo3)


@functools.partial(jax.jit, static_argnames=("sizes", "kinds"))
def _stage_b(planes: jnp.ndarray, per_size: Tuple, sizes: Tuple[int, ...],
             kinds: Tuple[str, ...]) -> Tuple[jnp.ndarray, ...]:
    """All size buckets in ONE dispatch (each eager call pays the host-link
    round-trip).  kinds[i] selects the path: 'tiled'/'quad' buckets are
    3-tuples (idx8, inv_hi_z, inv_lo_z) over the shared space-to-depth
    layout; 'slow' boundary buckets are 7-tuples (plane_idx, ys, xs,
    lim_h, lim_w, inv_hi3, inv_lo3).  sizes[i] may repeat."""
    p, ph, pw = planes.shape
    gh8, gw8 = ph // dct.TILE, pw // dct.TILE
    tiles8 = None
    if any(k != "slow" for k in kinds):
        tiles8 = planes.reshape(p, gh8, dct.TILE, gw8, dct.TILE).transpose(
            0, 1, 3, 2, 4).reshape(p * gh8 * gw8, dct.TILE * dct.TILE)
    out = []
    for i, (s, kind) in enumerate(zip(sizes, kinds)):
        args = per_size[i]
        if kind == "slow":
            out.append(_bucket_coeffs(planes, *args, size=s))
        else:
            out.append(_bucket_coeffs_tiled(tiles8, *args, size=s,
                                            kind=kind, gsize=gh8 * gw8))
    return tuple(out)


def _bucket_capacity(n: int) -> int:
    cap = 128
    while cap < n:
        cap *= 2
    return cap


def _sync(tree) -> None:
    """Force execution by pulling one scalar (block_until_ready is a no-op
    through the dev-harness tunnel)."""
    leaf = jax.tree_util.tree_leaves(tree)[-1]
    np.asarray(leaf.ravel()[:1])


@jax.jit
def _first_elem_sum(leaves) -> jnp.ndarray:
    return sum(jnp.asarray(x).ravel()[0].astype(jnp.float32)
               for x in jax.tree_util.tree_leaves(leaves))


def _sync_all(tree) -> None:
    """Force EVERY leaf's transfer/execution with a single scalar pull
    (syncing only the last leaf lets in-flight uploads bleed into the next
    stage's wall time on slow dev links)."""
    np.asarray(_first_elem_sum(tree))


def encode_batch(images: Sequence[ImageData], config: CodecConfig,
                 timings: Optional[Dict[str, float]] = None) -> List[bytes]:
    """Encode same-shape images as one device pipeline; returns .ajpg blobs
    in input order.  Pass `timings` to collect per-stage wall times
    ('push', 'stage_a', 'plans', 'push_idx', 'stage_b', 'pull',
    'assemble'); 'push', 'push_idx' and 'pull' are the host<->device
    transfers."""
    cfg = config
    if not images:
        return []

    marks = [time.perf_counter()]

    def mark(name):
        if timings is not None:
            marks.append(time.perf_counter())
            timings[name] = timings.get(name, 0.0) + marks[-1] - marks[-2]
    h, w = images[0].original_shape[:2]
    for im in images:
        if im.original_shape[:2] != (h, w):
            raise ValueError("encode_batch requires same-shape images; "
                             "group by shape upstream")
    b = len(images)
    layer_shapes = cfg.layer_shapes((h, w))
    mn, mx = cfg.block_size_range
    k_lo = int(math.log2(mn)) + 1
    k_hi = int(math.log2(mx))
    uniform = mn == mx

    # Upload uint8 when every image is exactly uint8-sourced (4x fewer
    # bytes over the host link); the device-side /255 matches the host
    # loader bit-for-bit (exhaustively tested over all 256 values).
    stacked = np.stack([im.data for im in images])
    u8 = np.round(stacked * 255.0).astype(np.uint8)
    if np.array_equal(u8.astype(np.float32) / 255.0, stacked):
        batch = jnp.asarray(u8)
        if timings is not None:
            _sync(batch)
        mark("push")
    else:
        batch = jnp.asarray(stacked)
        if timings is not None:
            _sync(batch)
        mark("push")
    band = (k_lo, max(k_hi, k_lo))
    planes, packed_levels = _stage_a(batch, cfg.color_space, layer_shapes,
                                     band)
    if timings is not None:
        _sync(planes)
    mark("stage_a")

    # ---- host: plans per (image, layer)
    plans: List[List[qt.QuadPlan]] = []
    if uniform:
        for bi in range(b):
            plans.append([qt.uniform_plan(lh, lw, mn)
                          for (lh, lw) in layer_shapes])
    else:
        from ..native.entropy import build_plan as native_build_plan
        layout, _ = _level_layout(layer_shapes, band)
        levels_np = np.asarray(packed_levels)       # one transfer
        # per-layer contiguous slice of the packed row + per-k offsets
        per_layer: Dict[int, Tuple[int, int, np.ndarray]] = {}
        for li, k, g, off in layout:
            if k > k_hi:
                continue
            start, end, offs = per_layer.get(li, (off, off, []))
            if not isinstance(offs, list):
                offs = list(offs)
            offs.append(off)
            per_layer[li] = (min(start, off), max(end, off + g * g), offs)
        native_ok = True
        for bi in range(b):
            row = levels_np[bi]
            plan_layers = []
            for li in range(3):
                lh, lw = layer_shapes[li]
                root = qt.root_size_for(lh, lw)
                start, end, offs = per_layer[li]
                res = native_build_plan(
                    row[start:end],
                    np.asarray(offs, np.int64) - start, k_lo, k_hi,
                    root, lh, lw, mx, mn) if native_ok else None
                if res is None:
                    native_ok = False
                    break
                states, sizes_a, ys_a, xs_a = res
                plan_layers.append(qt.QuadPlan(
                    root_size=root, height=lh, width=lw, states=states,
                    leaf_sizes=sizes_a, leaf_y=ys_a, leaf_x=xs_a))
            if not native_ok:
                break
            plans.append(plan_layers)
        if not native_ok:
            plans.clear()
            per = [[{} for _ in range(3)] for _ in range(b)]
            for li, k, g, off in layout:
                if k > k_hi:
                    continue
                block = levels_np[:, off:off + g * g].reshape(b, g, g)
                for bi in range(b):
                    per[bi][li][k] = block[bi].astype(bool)
            for bi in range(b):
                plans.append([
                    qt.plan_from_levels(per[bi][li], *layer_shapes[li],
                                        mx, mn)
                    for li in range(3)])
    mark("plans")

    # ---- global buckets
    # per-layer reciprocal tables per size
    inv_tables: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}

    def inv_for(size: int):
        if size not in inv_tables:
            his, los = [], []
            for li in range(3):
                q = quant.quantization_matrix(
                    np.asarray(cfg.quantization_matrices[li]), size,
                    cfg.quality_for(max(size, mn)))
                hi, lo = quant.reciprocal_table(q)
                his.append(hi)
                los.append(lo)
            inv_tables[size] = (np.stack(his), np.stack(los))
        return inv_tables[size]

    def inv_for_z(size: int, quad: bool):
        """Zigzag-permuted flat tables for the tiled/quad matmul paths."""
        his, los = inv_for(size)
        zz = zigzag.zigzag_indices(size)
        hz, lz = his.reshape(3, -1)[:, zz], los.reshape(3, -1)[:, zz]
        if quad:
            hz, lz = np.tile(hz, (1, 4)), np.tile(lz, (1, 4))
        return hz, lz

    # gather all leaves per size: interior blocks ride the shared 8x8
    # space-to-depth layout ((s/8)^2 whole rows per block; 4x4 sibling
    # quads one row), boundary blocks reflect-pad against layer bounds
    ph, pw = _plane_shape(layer_shapes)
    gh8, gw8 = ph // dct.TILE, pw // dct.TILE
    tiled_entries: Dict[int, List] = {}
    quad_entries: List = []
    slow_entries: Dict[int, List] = {}
    for bi in range(b):
        for li in range(3):
            plan = plans[bi][li]
            lh, lw = layer_shapes[li]
            base8 = (bi * 3 + li) * gh8 * gw8
            for s, idx in plan.buckets().items():
                ly = plan.leaf_y[idx]
                lx = plan.leaf_x[idx]
                interior = (ly + s <= lh) & (lx + s <= lw)
                sel = np.nonzero(interior)[0]
                orph = np.zeros(0, np.int64)
                if s >= dct.TILE and len(sel):
                    k = s // dct.TILE
                    start = base8 + (ly[sel] // 8) * gw8 + lx[sel] // 8
                    offs = (np.arange(k, dtype=np.int64)[:, None] * gw8
                            + np.arange(k, dtype=np.int64)[None, :]).ravel()
                    idx8 = (start.astype(np.int64)[:, None]
                            + offs[None, :]).ravel()
                    tiled_entries.setdefault(s, []).append(
                        (bi, li, idx8.astype(np.int32), idx[sel]))
                elif len(sel):  # s == 4: group preorder sibling quads
                    y, x, ii = ly[sel], lx[sel], idx[sel]
                    n = len(sel)
                    qs = np.zeros(n, bool)
                    if n >= 4:
                        qs[:n - 3] = (
                            (y[:-3] % 8 == 0) & (x[:-3] % 8 == 0)
                            & (y[1:-2] == y[:-3]) & (x[1:-2] == x[:-3] + 4)
                            & (y[2:-1] == y[:-3] + 4) & (x[2:-1] == x[:-3])
                            & (y[3:] == y[:-3] + 4) & (x[3:] == x[:-3] + 4)
                            & (ii[3:] == ii[:-3] + 3))
                    starts = np.nonzero(qs)[0]
                    cov = np.zeros(n, bool)
                    if len(starts):
                        rows8 = base8 + (y[starts] // 8) * gw8 \
                            + x[starts] // 8
                        quad_entries.append((bi, li,
                                             rows8.astype(np.int32),
                                             ii[starts]))
                        cov[(starts[:, None] + np.arange(4)).ravel()] = True
                    orph = np.nonzero(~cov)[0]
                # one slow entry per (bi, li, s): quad orphans merged with
                # boundary blocks (two entries would collide in `slices`)
                nsel = np.nonzero(~interior)[0]
                if len(orph) or len(nsel):
                    sy = np.concatenate([ly[sel][orph], ly[nsel]])
                    sx = np.concatenate([lx[sel][orph], lx[nsel]])
                    si = np.concatenate([idx[sel][orph], idx[nsel]])
                    slow_entries.setdefault(s, []).append(
                        (bi, li, sy, sx, si))

    # bucket list: (size, kind) with kind in {tiled, quad, slow}
    results: Dict[Tuple[int, str], np.ndarray] = {}
    counts: Dict[Tuple[int, str], int] = {}
    slices: Dict[Tuple[int, int, int, str],
                 Tuple[np.ndarray, np.ndarray]] = {}
    sizes_list: List[int] = []
    kinds: List[str] = []
    per_size = []

    def add_rowgather_bucket(s: int, kind: str, items: List) -> None:
        k2 = 1 if kind == "quad" else (s // dct.TILE) ** 2
        n = sum(len(it[3]) for it in items)
        cap = _bucket_capacity(n)
        idx8 = np.zeros(cap * k2, np.int32)
        pos = 0
        for bi, li, rows, idx in items:
            m = len(idx)
            idx8[pos * k2:(pos + m) * k2] = rows
            slices[(bi, li, s, kind)] = (np.arange(pos, pos + m), idx)
            pos += m
        hz, lz = inv_for_z(s, kind == "quad")
        per_size.append((idx8, hz, lz))
        sizes_list.append(s)
        kinds.append(kind)
        counts[(s, kind)] = n

    if quad_entries:
        add_rowgather_bucket(4, "quad", quad_entries)
    for s in sorted(tiled_entries):
        add_rowgather_bucket(s, "tiled", tiled_entries[s])
    for s in sorted(slow_entries):
        items = slow_entries[s]
        n = sum(len(it[2]) for it in items)
        cap = _bucket_capacity(n)
        ys = np.zeros(cap, np.int32)
        xs = np.zeros(cap, np.int32)
        pidx = np.zeros(cap, np.int32)
        lim_h = np.ones(cap, np.int32)
        lim_w = np.ones(cap, np.int32)
        pos = 0
        for bi, li, ly, lx, idx in items:
            m = len(ly)
            ys[pos:pos + m] = ly
            xs[pos:pos + m] = lx
            pidx[pos:pos + m] = bi * 3 + li
            lim_h[pos:pos + m] = layer_shapes[li][0]
            lim_w[pos:pos + m] = layer_shapes[li][1]
            slices[(bi, li, s, "slow")] = (np.arange(pos, pos + m), idx)
            pos += m
        his, los = inv_for(s)
        per_size.append((pidx, ys, xs, lim_h, lim_w, his, los))
        sizes_list.append(s)
        kinds.append("slow")
        counts[(s, "slow")] = n
    # explicit index/table upload so transfer time is attributed to
    # 'push_idx', not the compute stage (matters on slow dev links)
    per_size_dev = jax.device_put(tuple(per_size))
    if timings is not None:
        _sync_all(per_size_dev)
    mark("push_idx")
    device_vecs = _stage_b(planes, per_size_dev, sizes=tuple(sizes_list),
                           kinds=tuple(kinds))
    if timings is not None:
        _sync(device_vecs)
    mark("stage_b")
    for s, kind, v in zip(sizes_list, kinds, device_vecs):
        # slice to the real count on device: the capacity padding (up to
        # 2x) never crosses the host link
        results[(s, kind)] = np.asarray(v[:counts[(s, kind)]],
                                        dtype=np.int32)
    mark("pull")

    # ---- host: per-image assembly + entropy
    def assemble(bi: int) -> bytes:
        writer = ContainerWriter(ContainerMetadata(
            height=h, width=w, num_layers=3, color_space=cfg.color_space,
            quality_min=cfg.quality_range[0],
            quality_max=cfg.quality_range[1],
            block_size_min=mn, block_size_max=mx,
            extension=images[bi].extension),
            compress=lambda d: deflate_parallel(d, level=cfg.entropy_level,
                                                threads=1))
        for li in range(3):
            plan = plans[bi][li]
            sizes64 = plan.leaf_sizes.astype(np.int64)
            offsets = np.zeros(len(sizes64) + 1, np.int64)
            np.cumsum(sizes64 * sizes64, out=offsets[1:])
            coeffs = np.empty(int(offsets[-1]), np.int32)
            for s in np.unique(sizes64):
                s = int(s)
                for kind in ("tiled", "quad", "slow"):
                    if (bi, li, s, kind) not in slices:
                        continue
                    rows, idx = slices[(bi, li, s, kind)]
                    # a quad row holds its 4 preorder-consecutive sibling
                    # leaves (idx = first sibling; spans are contiguous)
                    width = 4 * s * s if kind == "quad" else s * s
                    flat = (offsets[idx][:, None]
                            + np.arange(width, dtype=np.int64)[None, :])
                    coeffs[flat.ravel()] = results[(s, kind)][rows].ravel()
            states_bytes, bits_len = qt.pack_states(plan.states)
            writer.add_layer(LayerPayload(bits_len, plan.root_size,
                                          states_bytes, coeffs))
        return writer.tobytes()

    with ThreadPoolExecutor() as pool:
        out = list(pool.map(assemble, range(b)))
    mark("assemble")
    return out
