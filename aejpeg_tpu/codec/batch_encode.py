"""Batched quadtree-active encoder: the production throughput path.

Round-2 dense redesign.  The reference encodes per block in Python loops
(src/jpeg/jpeg.py:461-506); round 1 batched same-size blocks into gathered
buckets, but the gather *indices* depend on the quadtree plans, so the
device sat idle while the host planned, and the index upload dominated.
This version removes the data dependence entirely:

  stage A (1 jit / batch):  color convert, downsample, Canny, pooled
      has-edge pyramid levels (bit-packed), normalization — per layer-shape
      GROUP of planes padded to the block-size grid.
  stage B (1 jit / batch, dispatched BEFORE the host sees any levels):
      for every block size s in the config band, DCT+quantize+zigzag the
      whole padded plane as if uniformly tiled by s -> dense per-size
      zigzag-int16 level tables, one row per grid cell; plus a small static
      "slow" table of every possible boundary (partial) block,
      reflect-padded exactly like the reference (src/jpeg/jpeg.py:398-402).
  host (overlapped with stage B): pull packed levels, build quadtree plans
      (native C++ DFS).
  host: per (image, layer), C++ assembles the preorder coefficient stream
      straight out of the dense tables (row = grid cell of each leaf) and
      deflates it (native/entropy.cpp aej_layer_payload) — the
      coefficient-domain sparse encoder never materializes the widened
      int32 stream.

Dense tables cost n_sizes redundant DCT passes (cheap MXU work) in
exchange for: no index upload, no plan->device dependency, no host
scatter, and a byte layout C++ can consume with pure memcpys.

Output containers are byte-compatible with `Codec.compress` (and the
reference format).
"""

import ctypes
import functools
import math
import threading
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
from ..native import entropy as native_entropy
from ..ops import dct, quant, resize, zigzag
from ..ops.canny import canny
from . import quadtree as qt
from .dense import BatchSpec, batch_spec, boundary_positions


# Fused layout path (transpose+zigzag as one wide static gather).
# Bitwise-identical to the two-pass chain on CPU and TPU (verified by
# tools/exp_r5_stageb.py) and ~2x faster on CPU, but MEASURED SLOWER on
# TPU in the production all-sizes jit (19.9 vs 15.8 ms for the luma
# group, r5): XLA/Mosaic lays out the transpose+small-gather chain better
# than the wide per-lane gather.  Default OFF; AEJ_FUSED_LAYOUT=1 enables
# it for A/B measurement on other backends.
import os as _os

_FUSED_LAYOUT = _os.environ.get("AEJ_FUSED_LAYOUT", "0") == "1"


def _pool_any(mask: jnp.ndarray, factor: int) -> jnp.ndarray:
    h, w = mask.shape
    return mask.reshape(h // factor, factor, w // factor, factor).any(
        axis=(1, 3))


_BIT_WEIGHTS = np.array([128, 64, 32, 16, 8, 4, 2, 1], np.uint32)


@jax.jit
def _u8_to_unit_float(batch: jnp.ndarray) -> jnp.ndarray:
    """uint8 -> float32/255, bit-identical to the host loader's
    x.astype(f32)/255 over all 256 inputs (exhaustively tested, and
    TPU-tested in tests/tpu/test_identity.py).

    Neither XLA's divide nor a double-float32 compensated reciprocal is
    correctly rounded here: under --xla_allow_excess_precision=true (forced
    by this harness) the compiler contracts x*hi + x*lo and 126/256 values
    come out 1 ulp off, which silently broke batch-vs-single container
    byte identity on TPU through round 3.  A 256-entry table of the exact
    host values gathered per element (Pallas lane gather) is exact by
    construction and costs ~5 VPU ops/element."""
    from ..ops.pallas_kernels import u8_to_unit_exact
    return u8_to_unit_exact(batch)


@functools.partial(jax.jit, static_argnames=("space", "layer_shapes",
                                             "level_band", "spec"))
def _stage_a(batch: jnp.ndarray, space: str,
             layer_shapes: Tuple[Tuple[int, int], ...],
             level_band: Tuple[int, int], spec: BatchSpec):
    """(B, H, W, 3) -> (per-group normalized plane stacks, packed levels).

    Group planes are (B * n_l, ph, pw) float32, plane p = bi * n_l + j with
    j the layer's position within its group; the pad region is zero (only
    boundary slow-bucket rows ever read near it, and those gather with
    reflect indices that stay inside the layer).  level_band = (k_lo, k_hi):
    pooled has-edge masks for node sizes 2**k are emitted BIT-PACKED (one
    uint8 row per image) so the host link moves 1 bit per node.  Accepts
    uint8 input (4x smaller upload) — the on-device /255 is bit-identical
    to the host loader."""
    if batch.dtype == jnp.uint8:
        from ..ops.pallas_kernels import u8_to_unit_exact
        batch = u8_to_unit_exact(batch)
    mids, scales = color.normalization_constants(space)
    converted = color.convert("sRGB", space, batch)
    b = batch.shape[0]

    # process per GROUP (layers sharing a downsampled shape — e.g. both
    # chroma layers under 4:2:0/4:1:1): the group's layers ride ONE
    # stacked resize + Canny + pyramid chain of batch b*n_l instead of
    # n_l separate per-layer chains.  Every op in the chain is per-pixel
    # deterministic, so stacking is bit-transparent; it halves the
    # chroma-side XLA op count and dispatch work in stage A.
    packed: List = [None] * 3
    group_planes_l: List = [None] * len(spec.groups)
    for gi, g in enumerate(spec.groups):
        lh, lw = g.shape
        idxs = list(g.layers)
        k = g.n_l
        src = (converted[..., idxs[0]] if k == 1 else
               jnp.stack([converted[..., i] for i in idxs], axis=1))
        layer = resize.resize2d(src, (lh, lw), "area")  # (b,[k,]lh,lw)
        flat_l = layer.reshape(b * k, lh, lw)
        if level_band is not None:
            # uniform grids pass None: the split predicate never consults
            # edges (src/jpeg/quadtree.py:118 with min == max), so the
            # whole Canny stack is skipped
            edges = jax.vmap(canny)(flat_l)
            root = qt.root_size_for(lh, lw)
            base = jnp.zeros((b * k, root, root), jnp.bool_)
            base = base.at[:, :lh, :lw].set(edges == 1.0)
            cur = base
            levels_per = [[] for _ in idxs]
            for lvk in range(1, level_band[1] + 1):
                cur = jax.vmap(_pool_any, in_axes=(0, None))(cur, 2)
                if lvk >= level_band[0]:
                    lv = cur.reshape(b, k, -1)
                    for j in range(k):
                        levels_per[j].append(lv[:, j])
            for j, i in enumerate(idxs):
                packed[i] = levels_per[j]
        else:
            for i in idxs:
                packed[i] = []
        if k == 1:
            norm = (layer - mids[idxs[0]]) * scales[idxs[0]]
            padded = jnp.pad(norm, ((0, 0), (0, g.ph - lh),
                                    (0, g.pw - lw)))
        else:
            mids_v = jnp.asarray(
                np.asarray([mids[i] for i in idxs], np.float32)
            ).reshape(1, k, 1, 1)
            scales_v = jnp.asarray(
                np.asarray([scales[i] for i in idxs], np.float32)
            ).reshape(1, k, 1, 1)
            norm = (layer - mids_v) * scales_v
            padded = jnp.pad(norm, ((0, 0), (0, 0), (0, g.ph - lh),
                                    (0, g.pw - lw)))
        group_planes_l[gi] = padded.reshape(b * k, g.ph, g.pw)
    group_planes = group_planes_l

    flat = [lv for i in range(3) for lv in packed[i]]
    if flat:
        bits = jnp.concatenate(flat, axis=1)
        pad = (-bits.shape[1]) % 8
        bits = jnp.pad(bits, ((0, 0), (0, pad)))
        w8 = jnp.asarray(_BIT_WEIGHTS)
        packed_bits = (bits.reshape(b, -1, 8) * w8).sum(
            axis=-1, dtype=jnp.uint32).astype(jnp.uint8)
    else:
        packed_bits = jnp.zeros((b, 0), jnp.uint8)
    return tuple(group_planes), packed_bits


def _level_layout(layer_shapes, level_band):
    """Host-side descriptor matching _stage_a's packed level tensor:
    [(layer, k, grid, offset)] in BIT units."""
    out = []
    off = 0
    for i, (lh, lw) in enumerate(layer_shapes):
        root = qt.root_size_for(lh, lw)
        for k in range(level_band[0], level_band[1] + 1):
            g = root >> k
            out.append((i, k, g, off))
            off += g * g
    return out, off


# --------------------------------------------------------------- stage B


def _quant_tables_np(cfg: CodecConfig, size: int):
    """(3, s, s) df32 reciprocal tables (hi, lo) + int32 Q, reference
    quality interpolation (src/jpeg/jpeg.py:688-724)."""
    his, los, qs = [], [], []
    mn = cfg.block_size_range[0]
    for li in range(3):
        q = quant.quantization_matrix(
            np.asarray(cfg.quantization_matrices[li]), size,
            cfg.quality_for(max(size, mn)))
        hi, lo = quant.reciprocal_table(q)
        his.append(hi)
        los.append(lo)
        qs.append(q)
    return np.stack(his), np.stack(los), np.stack(qs)


@functools.lru_cache(maxsize=32)
def _stage_b_fn(cfg: CodecConfig, shape: Tuple[int, int], b: int):
    """Compiled dense stage B for (config, image shape, batch size).

    Returns (jit_fn, spec).  jit_fn(group_planes) -> per group:
    (dense tables tuple, slow tables tuple), where dense[si] is
    (B * n_l, gh * gw, s * s) zigzag int16 and slow[si] is
    (B * n_l * n_boundary, s * s) zigzag int16 (empty when the layer shape
    divides evenly)."""
    layer_shapes = cfg.layer_shapes(shape)
    mn, mx = cfg.block_size_range
    spec = batch_spec(layer_shapes, mn, mx)

    # static per-(group, size) constants
    consts = {}
    for gi, g in enumerate(spec.groups):
        lh, lw = g.shape
        for s in g.sizes:
            hi3, lo3, _ = _quant_tables_np(cfg, s)
            # layer selection per plane position: (n_l, s, s)
            hi_g = np.stack([hi3[li] for li in g.layers])
            lo_g = np.stack([lo3[li] for li in g.layers])
            zz = zigzag.zigzag_indices(s)
            by, bx = boundary_positions(lh, lw, s)
            slow_idx = None
            if len(by):
                # reflect indices against the true layer bounds, exactly
                # np.pad 'reflect' semantics (src/jpeg/jpeg.py:398-402)
                offs = np.arange(s, dtype=np.int64)[None, :]
                avail_h = np.maximum(lh - by.astype(np.int64), 1)[:, None]
                period_h = np.maximum(2 * avail_h - 2, 1)
                m = offs % period_h
                rows = by[:, None] + np.where(m < avail_h, m, period_h - m)
                avail_w = np.maximum(lw - bx.astype(np.int64), 1)[:, None]
                period_w = np.maximum(2 * avail_w - 2, 1)
                m = offs % period_w
                cols = bx[:, None] + np.where(m < avail_w, m, period_w - m)
                nb = len(by)
                # plane-major: p = bi * n_l + j, then boundary rank
                pidx = np.repeat(np.arange(b * g.n_l, dtype=np.int32), nb)
                rows_f = np.tile(rows.astype(np.int32), (b * g.n_l, 1))
                cols_f = np.tile(cols.astype(np.int32), (b * g.n_l, 1))
                # per-row quant tables follow the plane's layer
                hi_rows = np.tile(np.repeat(hi_g, nb, axis=0),
                                  (b, 1, 1))
                lo_rows = np.tile(np.repeat(lo_g, nb, axis=0),
                                  (b, 1, 1))
                slow_idx = (pidx, rows_f, cols_f, hi_rows, lo_rows)
            consts[(gi, s)] = (hi_g, lo_g, zz, slow_idx)

    n_l_of = {gi: g.n_l for gi, g in enumerate(spec.groups)}

    def fn(group_planes):
        out = []
        for gi, g in enumerate(spec.groups):
            planes = group_planes[gi]
            p, ph, pw = planes.shape
            n_l = n_l_of[gi]
            dense_out, slow_out = [], []
            for s in g.sizes:
                hi_g, lo_g, zz, slow_idx = consts[(gi, s)]
                gh, gw = ph // s, pw // s
                y = dct.dct2_dense(planes, s)          # (p, gh, s, gw, s)
                y6 = y.reshape(b, n_l, gh, s, gw, s)
                hi6 = jnp.asarray(hi_g).reshape(1, n_l, 1, s, 1, s)
                lo6 = jnp.asarray(lo_g).reshape(1, n_l, 1, s, 1, s)
                lv = jnp.round(y6 * hi6 + y6 * lo6).astype(jnp.int16)
                # tables leave the device FLAT (1-D): the C++ assembler
                # reads raw memory, and a pulled N-D array can arrive with
                # a transposed device layout exposed as numpy strides —
                # 1-D is linear by construction (host reshapes for free)
                if _FUSED_LAYOUT:
                    # block transpose + zigzag as ONE wide static gather
                    # (bitwise-identical; halves the relayout passes that
                    # bind stage B — see ops/zigzag.row_zigzag_indices)
                    fidx = jnp.asarray(zigzag.row_zigzag_indices(s, gw))
                    flat = lv.reshape(p, gh, s * gw * s)
                    dense_out.append(jnp.take(flat, fidx, axis=2)
                                     .reshape(-1))
                else:
                    rows = lv.reshape(p, gh, s, gw, s).transpose(
                        0, 1, 3, 2, 4).reshape(p, gh * gw, s * s)
                    dense_out.append(rows[:, :, jnp.asarray(zz)]
                                     .reshape(-1))
                if slow_idx is None:
                    slow_out.append(jnp.zeros((0,), jnp.int16))
                    continue
                pidx, rows_f, cols_f, hi_rows, lo_rows = slow_idx
                blocks = planes[jnp.asarray(pidx)[:, None, None],
                                jnp.asarray(rows_f)[:, :, None],
                                jnp.asarray(cols_f)[:, None, :]]
                yb = dct.dct2(blocks)
                lvb = jnp.round(yb * jnp.asarray(hi_rows)
                                + yb * jnp.asarray(lo_rows)).astype(jnp.int16)
                slow_out.append(
                    lvb.reshape(-1, s * s)[:, jnp.asarray(zz)].reshape(-1))
            out.append((tuple(dense_out), tuple(slow_out)))
        return tuple(out)

    return jax.jit(fn), spec


# ---------------------------------------------------------------- helpers


def _sync(tree) -> None:
    """Execution barrier: pull one scalar computed FROM the tree (a
    dependent jit can only return after everything before it in the
    dispatch queue ran).  block_until_ready is a no-op through the
    dev-harness tunnel, and — worse — a bulk np.asarray of a
    not-yet-computed buffer can return zeros, so every bulk pull in this
    module is preceded by one of these barriers.  Empty leaves are skipped
    (an empty slice is a no-op barrier)."""
    leaves = [x for x in jax.tree_util.tree_leaves(tree) if x.size]
    if leaves:
        np.asarray(leaves[-1].ravel()[:1])


@jax.jit
def _first_elem_sum(leaves) -> jnp.ndarray:
    return sum(jnp.asarray(x).ravel()[0].astype(jnp.float32)
               for x in jax.tree_util.tree_leaves(leaves) if x.size)


def _sync_all(tree) -> None:
    """Force EVERY leaf's transfer/execution with a single scalar pull
    (syncing only the last leaf lets in-flight uploads bleed into the next
    stage's wall time on slow dev links)."""
    np.asarray(_first_elem_sum(tree))


def _build_plans(cfg: CodecConfig, layer_shapes, levels_bits: np.ndarray,
                 band: Tuple[int, int], b: int):
    """Quadtree plans per (image, layer) from the bit-packed pooled levels.

    One batched C++ call plans all B x 3 layers on an internal thread pool,
    reading the packed bits directly and emitting container-format packed
    state streams (round 2 looped 3B ctypes calls with numpy slicing and
    unpacked the whole level tensor first — ~1 ms/plan of pure Python
    overhead).  Python fallback when the native library is unavailable."""
    mn, mx = cfg.block_size_range
    k_lo, k_hi = int(math.log2(mn)) + 1, int(math.log2(mx))
    if mn == mx:
        return [[qt.uniform_plan(lh, lw, mn) for (lh, lw) in layer_shapes]
                for _ in range(b)]
    layout, nbits = _level_layout(layer_shapes, band)
    roots = [qt.root_size_for(lh, lw) for (lh, lw) in layer_shapes]
    n_k = k_hi - k_lo + 1
    bit_offs = np.zeros((3, n_k), np.int64)
    for li, k, g, off in layout:
        if k_lo <= k <= k_hi:
            bit_offs[li, k - k_lo] = off
    res = native_entropy.build_plans_batch(
        levels_bits, roots, [s[0] for s in layer_shapes],
        [s[1] for s in layer_shapes], bit_offs, k_lo, k_hi, mx, mn)
    if res is not None:
        states_p, bits_len, sizes_a, ys_a, xs_a, n_leaves, totals = res
        # the arenas are volatile per-thread scratch: compact the used
        # prefixes into ONE exact-size allocation per array (the plans can
        # outlive the next native call — stream lookahead, sweep reuse)
        n_tasks = 3 * b
        offs = np.zeros(n_tasks + 1, np.int64)
        np.cumsum(n_leaves, out=offs[1:])
        tot = int(offs[-1])
        all_s = np.empty(tot, np.int32)
        all_y = np.empty(tot, np.int32)
        all_x = np.empty(tot, np.int32)
        for t in range(n_tasks):
            o, nl = int(offs[t]), int(n_leaves[t])
            all_s[o:o + nl] = sizes_a[t, :nl]
            all_y[o:o + nl] = ys_a[t, :nl]
            all_x[o:o + nl] = xs_a[t, :nl]
        plans = []
        for bi in range(b):
            row = []
            for li in range(3):
                t = bi * 3 + li
                o, nl = int(offs[t]), int(n_leaves[t])
                bl = int(bits_len[t])
                row.append(qt.QuadPlan(
                    root_size=roots[li], height=layer_shapes[li][0],
                    width=layer_shapes[li][1], states=None,
                    leaf_sizes=all_s[o:o + nl], leaf_y=all_y[o:o + nl],
                    leaf_x=all_x[o:o + nl],
                    states_packed=states_p[t, :(bl + 7) // 8].tobytes(),
                    bits_len=bl))
            plans.append(row)
        return plans
    # pure-Python fallback
    levels_np = np.unpackbits(levels_bits, axis=1)[:, :nbits]
    plans = []
    per = [[{} for _ in range(3)] for _ in range(b)]
    for li, k, g, off in layout:
        if k > k_hi:
            continue
        block = levels_np[:, off:off + g * g].reshape(b, g, g)
        for bi in range(b):
            per[bi][li][k] = block[bi].astype(bool)
    for bi in range(b):
        plans.append([
            qt.plan_from_levels(per[bi][li], *layer_shapes[li], mx, mn)
            for li in range(3)])
    return plans


def _payload_numpy(plan: qt.QuadPlan, spec_group, dense_rows, slow_rows,
                   plane: int, level: int) -> bytes:
    """Pure-numpy mirror of entropy.cpp aej_layer_payload (fallback when
    the native library is unavailable; also the test oracle for it)."""
    lh, lw, pw = plan.height, plan.width, spec_group.pw
    sizes64 = plan.leaf_sizes.astype(np.int64)
    offsets = np.zeros(len(sizes64) + 1, np.int64)
    np.cumsum(sizes64 * sizes64, out=offsets[1:])
    coeffs = np.empty(int(offsets[-1]), np.int32)
    for s in np.unique(sizes64):
        s = int(s)
        si = spec_group.sizes.index(s)
        idx = np.nonzero(sizes64 == s)[0]
        ly = plan.leaf_y[idx].astype(np.int64)
        lx = plan.leaf_x[idx].astype(np.int64)
        interior = (ly + s <= lh) & (lx + s <= lw)
        nb = spec_group.n_boundary(s)
        flat = (offsets[idx][:, None]
                + np.arange(s * s, dtype=np.int64)[None, :])
        vals = np.empty((len(idx), s * s), np.int16)
        if interior.any():
            rows = (ly[interior] // s) * (pw // s) + lx[interior] // s
            vals[interior] = dense_rows[si][plane][rows]
        bsel = ~interior
        if bsel.any():
            ghf = lh // s
            gy, gx = ly[bsel] // s, lx[bsel] // s
            n_right = ghf if lw % s else 0
            rank = np.where(gy < ghf, gy, n_right + gx)
            vals[bsel] = slow_rows[si][plane * nb + rank]
        coeffs[flat.ravel()] = vals.astype(np.int32).ravel()
    return deflate_parallel(
        np.ascontiguousarray(coeffs, dtype="<i4").tobytes(),
        level=level, threads=1)


@functools.lru_cache(maxsize=16)
def _sharded_fn_cache(cfg: CodecConfig, shape: Tuple[int, int], b: int,
                      mesh, data_axes):
    from ..parallel.batch import sharded_dense_device_fn
    return sharded_dense_device_fn(cfg, shape, b, mesh, data_axes)


def assemble_native(cfg: CodecConfig, spec: BatchSpec, plans, dense_np,
                    slow_np, b: int):
    """Batched C++ stream assembly + entropy coding from pulled dense
    tables: returns (arena, arena_offs, out_sizes) — task t = (bi*3 + li)'s
    payload is arena[arena_offs[t] : arena_offs[t] + out_sizes[t]] — or
    None when the native library is unavailable.  Shared by encode_batch
    and the bench's measured-stream host stage."""
    if not native_entropy.native_available():
        return None
    n_tasks = 3 * b
    lp_s = np.empty(n_tasks, np.uint64)
    lp_y = np.empty(n_tasks, np.uint64)
    lp_x = np.empty(n_tasks, np.uint64)
    n_leaves = np.empty(n_tasks, np.int64)
    hs = np.empty(n_tasks, np.int32)
    ws = np.empty(n_tasks, np.int32)
    pws = np.empty(n_tasks, np.int32)
    tbl = np.zeros((n_tasks, 8), np.uint64)
    slw = np.zeros((n_tasks, 8), np.uint64)
    totals = np.empty(n_tasks, np.int64)
    keep = []   # keep contiguous leaf arrays alive through the call
    for bi in range(b):
        for li in range(3):
            t = bi * 3 + li
            gi, j = spec.layer_pos[li]
            g = spec.groups[gi]
            plan = plans[bi][li]
            plane = bi * g.n_l + j
            ls = np.ascontiguousarray(plan.leaf_sizes, np.int32)
            ly = np.ascontiguousarray(plan.leaf_y, np.int32)
            lx = np.ascontiguousarray(plan.leaf_x, np.int32)
            keep.append((ls, ly, lx))
            lp_s[t] = ls.ctypes.data
            lp_y[t] = ly.ctypes.data
            lp_x[t] = lx.ctypes.data
            n_leaves[t] = len(ls)
            hs[t] = plan.height
            ws[t] = plan.width
            pws[t] = g.pw
            totals[t] = int((ls.astype(np.int64) ** 2).sum())
            for si, s in enumerate(g.sizes):
                k = s.bit_length() - 1
                arr = dense_np[gi][si]
                tbl[t, k] = (arr.ctypes.data
                             + plane * arr.shape[1] * arr.shape[2] * 2)
                nb = g.n_boundary(s)
                if nb:
                    sarr = slow_np[gi][si]
                    slw[t, k] = (sarr.ctypes.data
                                 + plane * nb * s * s * 2)
    lens = totals * 4
    chunks = (lens + (1 << 20) - 1) // (1 << 20) + 1
    bounds = lens + lens // 500 + 32 * chunks + 64
    arena_offs = np.zeros(n_tasks + 1, np.int64)
    np.cumsum(bounds, out=arena_offs[1:])
    # warm per-thread scratch: the payloads are copied out via .tobytes()
    # by the caller, so reuse across batches is safe
    arena = native_entropy.scratch_arena("assemble", int(arena_offs[-1]))
    out_sizes = native_entropy.assemble_batch_native(
        lp_s, lp_y, lp_x, n_leaves, hs, ws, pws, tbl, slw,
        cfg.entropy_level, arena, arena_offs)
    if out_sizes is None:
        return None
    return arena, arena_offs, out_sizes


# ------------------------------------------------------------ encode_batch


def encode_batch(images: Sequence[ImageData], config: CodecConfig,
                 timings: Optional[Dict[str, float]] = None,
                 mesh=None, data_axes=None) -> List[bytes]:
    """Encode same-shape images as one device pipeline; returns .ajpg blobs
    in input order.  Pass `timings` to collect per-stage wall times:
    'push' (host->device image upload), 'plans' (host quadtree planning,
    overlapped with device stage B — includes the stage A wait), 'device'
    (residual stage B wait), 'pull' (dense table download), 'assemble'
    (C++ stream assembly + deflate).

    With `mesh` (a jax.sharding.Mesh), the device stages run data-parallel
    over the mesh's `data_axes` (default: every axis); len(images) must
    divide evenly.  Outputs are byte-identical to the single-device path
    (see parallel/batch.py sharded_dense_device_fn)."""
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
    band = None if mn == mx else (k_lo, k_hi)

    spec = batch_spec(layer_shapes, mn, mx)

    # Upload uint8 when every image is exactly uint8-sourced (4x fewer
    # bytes over the host link); the device-side LUT /255 matches the host
    # loader bit-for-bit.  The loader marks 8-bit sources (u8_exact);
    # unmarked arrays pay the full equality check once (r3 ran the 50
    # MB/batch compare on every call — ADVICE/VERDICT r3 #4).
    stacked = np.stack([im.data for im in images])
    if all(im.u8_exact for im in images):
        host_batch = np.round(stacked * 255.0).astype(np.uint8)
    else:
        u8 = np.round(stacked * 255.0).astype(np.uint8)
        host_batch = (u8 if np.array_equal(u8.astype(np.float32) / 255.0,
                                           stacked) else stacked)
    if mesh is None:
        batch = jnp.asarray(host_batch)
    else:
        from jax.sharding import NamedSharding, PartitionSpec
        axes = (tuple(mesh.shape.keys()) if data_axes is None
                else tuple(data_axes))
        batch = jax.device_put(
            host_batch, NamedSharding(mesh, PartitionSpec(axes)))
    if timings is not None:
        _sync(batch)
    mark("push")

    # dispatch the full device pipeline BEFORE any host work: stage B has
    # no plan dependence, so host planning below overlaps it
    if mesh is None:
        jit_b, spec = _stage_b_fn(cfg, (h, w), b)
        group_planes, packed_bits = _stage_a(batch, cfg.color_space,
                                             layer_shapes, band, spec)
        outs = jit_b(group_planes)
    else:
        fn = _sharded_fn_cache(cfg, (h, w), b, mesh,
                               None if data_axes is None
                               else tuple(data_axes))
        packed_bits, outs = fn(batch)

    if mesh is None and b * h * w <= (1 << 20):
        # Latency path (single image / tiny batch): start EVERY
        # device->host copy asynchronously, then collect — the levels, the
        # dense tables and the execution barrier share one link round-trip
        # instead of one per output leaf (VERDICT r4 #6; device_get alone
        # pulls leaves serially, ~16 round-trips at ~26 ms each on the dev
        # tunnel).  The combined wait is attributed to 'pull' (transfer);
        # device execution overlaps it and is profiled separately by the
        # bench's amortized work-only p50.
        try:
            jax.tree_util.tree_map(lambda x: x.copy_to_host_async(),
                                   (packed_bits, outs))
        except AttributeError:
            pass
        levels_bits, outs = jax.device_get((packed_bits, outs))
        mark("pull")
        plans = _build_plans(cfg, layer_shapes, levels_bits, band, b)
        mark("plans")
    else:
        # The stage-B execution barrier (a scalar pull; see _sync) rides a
        # background thread so its round-trip runs concurrently with the
        # levels pull and the planning DFS — serially it added a full link
        # RTT to the critical path, which dominated single-image latency on
        # high-latency links (VERDICT r3 #4: p50 was ~2 RTTs + work).
        barrier_exc: List[BaseException] = []

        def _barrier():
            try:
                _sync_all(outs)
            except BaseException as e:   # re-raised on join below
                barrier_exc.append(e)

        barrier_th = threading.Thread(target=_barrier)
        barrier_th.start()
        try:
            levels_bits = np.asarray(packed_bits)  # blocks on stage A
            plans = _build_plans(cfg, layer_shapes, levels_bits, band, b)
            mark("plans")
        finally:
            # join even when the pull/planning path raises: abandoning the
            # non-daemon thread would drop its exception and block
            # interpreter teardown on a hung device (advisor r4)
            barrier_th.join()
        if barrier_exc:
            raise barrier_exc[0]
        mark("device")

    dense_np: List[List[np.ndarray]] = []
    slow_np: List[List[np.ndarray]] = []
    for gi, (dense_t, slow_t) in enumerate(outs):
        g = spec.groups[gi]
        p = b * g.n_l
        dn, sn = [], []
        for si, s in enumerate(g.sizes):
            gh, gw = g.ph // s, g.pw // s
            dn.append(np.ascontiguousarray(
                np.asarray(dense_t[si])).reshape(p, gh * gw, s * s))
            sn.append(np.ascontiguousarray(
                np.asarray(slow_t[si])).reshape(-1, s * s))
        dense_np.append(dn)
        slow_np.append(sn)
    mark("pull")

    # ---- host: batched C++ assembly + entropy (one call, internal pool)
    def metadata_for(bi: int) -> ContainerMetadata:
        return ContainerMetadata(
            height=h, width=w, num_layers=3, color_space=cfg.color_space,
            quality_min=cfg.quality_range[0],
            quality_max=cfg.quality_range[1],
            block_size_min=mn, block_size_max=mx,
            extension=images[bi].extension)

    res = assemble_native(cfg, spec, plans, dense_np, slow_np, b)
    if res is not None:
        arena, arena_offs, out_sizes = res
        out = []
        for bi in range(b):
            writer = ContainerWriter(metadata_for(bi))
            for li in range(3):
                t = bi * 3 + li
                plan = plans[bi][li]
                states_bytes, bits_len = plan.packed()
                off = int(arena_offs[t])
                writer.add_layer(LayerPayload(
                    bits_len, plan.root_size, states_bytes, coeffs=None,
                    compressed=arena[off:off + int(out_sizes[t])].tobytes()))
            out.append(writer.tobytes())
        mark("assemble")
        return out

    # pure-Python fallback (no native library)
    def assemble(bi: int) -> bytes:
        writer = ContainerWriter(metadata_for(bi))
        for li in range(3):
            gi, j = spec.layer_pos[li]
            g = spec.groups[gi]
            plan = plans[bi][li]
            plane = bi * g.n_l + j
            states_bytes, bits_len = plan.packed()
            comp = _payload_numpy(plan, g, dense_np[gi], slow_np[gi],
                                  plane, cfg.entropy_level)
            writer.add_layer(LayerPayload(bits_len, plan.root_size,
                                          states_bytes, coeffs=None,
                                          compressed=comp))
        return writer.tobytes()

    with ThreadPoolExecutor() as pool:
        out = list(pool.map(assemble, range(b)))
    mark("assemble")
    return out
