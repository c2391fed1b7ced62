"""Batched metric sweep: the production-pipeline version of the reference
sweep harness (reference: test/analysis/metrics_computation.py:297-334).

The reference runs one PROCESS per image and re-compresses eagerly per
combo.  Round 2's `MetricsSweep` still routed the per-image `Codec`; at
62 ms/image a full LIVE sweep is hours.  This module restructures the
sweep around the dense batched pipeline so a (color_space, quality_range,
block_size_range) grid over the whole LIVE database runs in minutes:

 - Images are grouped by shape and pushed to the device ONCE (uint8).
 - Stage A (color convert + downsample + Canny + pooled has-edge pyramid)
   runs once per (shape, space) with the WIDEST level band (blocks
   4..128); every combo's quadtree plans read bit-subranges of that one
   pooled-levels tensor.
 - Stage B is compiled ONCE per shape with the quantization tables as
   RUNTIME arguments (the production `_stage_b_fn` bakes them as
   constants, which would recompile per quality pair — 630 XLA compiles
   for the default grid).  All wide sizes (4..128) are always computed;
   combos use the subset their block range selects.
 - Reconstruction + metrics run ON DEVICE: the combo's quadtree leaf
   masks (small bitmaps) select, per size, which dense-table rows are
   leaves; masked dequantize + inverse DCT + denormalize + upsample +
   color inversion reproduce the decoder's output (batch_decode.py), and
   PSNR / SSIM / MS-SSIM against the device-resident originals come back
   as 3 scalars per image — the decoded images never cross the host link.
 - Compression ratios come from REAL container bytes: the pulled dense
   tables feed the batched C++ assembler (aej_assemble_batch), so the
   blobs are exactly what `encode_batch` would produce for that combo.

CSV schema matches the reference (metrics_computation.py:189-201):
image_name,color_space,min_quality,max_quality,min_block_size,
max_block_size,psnr,ssim,ms_ssim,lpips,compression_ratio — 4-decimal
strings, lpips '' unless LPIPS weights are supplied (see metrics/lpips.py;
the torch hub weights are unobtainable in this environment, so the column
is empty by default — loudly noted in the run log).
"""

import functools
import math
import time
from itertools import product
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import color
from ..codec import batch_encode as be
from ..codec import quadtree as qt
from ..codec.dense import BatchSpec, batch_spec, boundary_positions
from ..config import CodecConfig
from ..io.container import ContainerMetadata, ContainerWriter, LayerPayload
from ..io.image import ImageData
from ..metrics.quality import (MS_SSIM_WEIGHTS, _avg_pool, _filter_valid,
                               _gaussian_window, _ssim_components,
                               rgb_to_gray_u8)
from ..native import entropy as native_entropy

WIDE_BLOCKS = (4, 128)   # widest reference block band; combos use subsets
WIDE_BAND = (3, 7)       # pooled-level ks for WIDE_BLOCKS


# ------------------------------------------------------------ device stages


@functools.lru_cache(maxsize=64)
def _stage_b_rt_fn(layer_shapes: Tuple[Tuple[int, int], ...], b: int):
    """Stage B with runtime quantization tables: one compile per (shape,
    batch) serves every (quality, block-range) combo.

    Returns (jit_fn, spec) where jit_fn(group_planes, hi_t, lo_t) mirrors
    batch_encode._stage_b_fn's dense outputs for the WIDE size set;
    hi_t/lo_t are dicts keyed (gi, s) of (n_l, s, s) float32 reciprocal
    tables passed as pytrees."""
    from ..ops import dct, zigzag

    mn, mx = WIDE_BLOCKS
    spec = batch_spec(layer_shapes, mn, mx)

    consts = {}
    for gi, g in enumerate(spec.groups):
        lh, lw = g.shape
        for s in g.sizes:
            zz = zigzag.zigzag_indices(s)
            by, bx = boundary_positions(lh, lw, s)
            slow_idx = None
            if len(by):
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
                pidx = np.repeat(np.arange(b * g.n_l, dtype=np.int32), nb)
                rows_f = np.tile(rows.astype(np.int32), (b * g.n_l, 1))
                cols_f = np.tile(cols.astype(np.int32), (b * g.n_l, 1))
                slow_idx = (pidx, rows_f, cols_f, nb)
            consts[(gi, s)] = (zz, slow_idx)

    def fn(group_planes, hi_t, lo_t):
        out = []
        for gi, g in enumerate(spec.groups):
            planes = group_planes[gi]
            p, ph, pw = planes.shape
            n_l = g.n_l
            dense_out, slow_out = [], []
            for s in g.sizes:
                zz, slow_idx = consts[(gi, s)]
                hi_g = hi_t[(gi, s)]
                lo_g = lo_t[(gi, s)]
                gh, gw = ph // s, pw // s
                y = dct.dct2_dense(planes, s)
                y6 = y.reshape(b, n_l, gh, s, gw, s)
                hi6 = hi_g.reshape(1, n_l, 1, s, 1, s)
                lo6 = lo_g.reshape(1, n_l, 1, s, 1, s)
                lv = jnp.round(y6 * hi6 + y6 * lo6).astype(jnp.int16)
                if be._FUSED_LAYOUT:
                    fidx = jnp.asarray(zigzag.row_zigzag_indices(s, gw))
                    flat = lv.reshape(p, gh, s * gw * s)
                    dense_out.append(jnp.take(flat, fidx, axis=2)
                                     .reshape(p, gh * gw, s * s))
                else:
                    rows = lv.reshape(p, gh, s, gw, s).transpose(
                        0, 1, 3, 2, 4).reshape(p, gh * gw, s * s)
                    dense_out.append(rows[:, :, jnp.asarray(zz)])
                if slow_idx is None:
                    slow_out.append(jnp.zeros((0, s * s), jnp.int16))
                    continue
                pidx, rows_f, cols_f, nb = slow_idx
                blocks = planes[jnp.asarray(pidx)[:, None, None],
                                jnp.asarray(rows_f)[:, :, None],
                                jnp.asarray(cols_f)[:, None, :]]
                yb = dct.dct2(blocks)
                hi_rows = jnp.repeat(hi_g, nb, axis=0)
                hi_rows = jnp.tile(hi_rows, (b, 1, 1))
                lo_rows = jnp.repeat(lo_g, nb, axis=0)
                lo_rows = jnp.tile(lo_rows, (b, 1, 1))
                lvb = jnp.round(yb * hi_rows + yb * lo_rows).astype(
                    jnp.int16)
                slow_out.append(lvb.reshape(-1, s * s)[:, jnp.asarray(zz)])
            out.append((tuple(dense_out), tuple(slow_out)))
        return tuple(out)

    return jax.jit(fn), spec


@functools.lru_cache(maxsize=8)
def _lpips_batch_fn(weights_path: str):
    """Batched LPIPS(AlexNet) distance, jitted once per weights file.

    fn(batch_u8, recon) -> (B,) distances; batch_u8 is the (B,H,W,3) uint8
    original batch, recon the (B,H,W,3) float32 [0,1] reconstruction.
    Same math as metrics.lpips.lpips_distance (reference semantics:
    src/image/evaluation_metrics.py:91-109), vectorized over the batch."""
    from ..metrics import lpips as L

    params = L._load_weights(weights_path)

    def fn(batch_u8, recon):
        orig = be._u8_to_unit_float(batch_u8)

        def to_nchw(img):  # (B,H,W,3) [0,1] -> (B,3,H,W) [-1,1]
            return jnp.transpose(img * 2.0 - 1.0, (0, 3, 1, 2))

        fa = L._alex_features(params, to_nchw(orig))
        fb = L._alex_features(params, to_nchw(recon))
        total = jnp.zeros((orig.shape[0],), jnp.float32)
        for i, (x, y) in enumerate(zip(fa, fb)):
            d = (L._unit_normalize(x) - L._unit_normalize(y)) ** 2
            lin = jnp.asarray(params[f"lin{i}_w"])  # (1, C, 1, 1)
            val = jnp.sum(d * lin, axis=1, keepdims=True)
            total = total + jnp.mean(val, axis=(1, 2, 3))
        return total

    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def _recon_metrics_fn(space: str, shape: Tuple[int, int],
                      layer_shapes: Tuple[Tuple[int, int], ...], b: int,
                      want_recon: bool = False):
    """Masked reconstruction + metrics, one compile per (space, shape).

    jit_fn(batch_u8, outs, masks, q_t) -> (psnr, ssim, ms_ssim) each (B,)
    (plus the (B,H,W,3) reconstruction itself when `want_recon`, so an
    LPIPS pass can reuse it without a second reconstruction):
    `outs` is stage B's output pytree, `masks[(gi, s)]` is (p, gh*gw)
    float32 leaf-row selectors for THIS combo (zeros for sizes outside the
    combo's block band), `q_t[(gi, s)]` the (n_l, s, s) float32 dequant
    tables.  Reproduces batch_decode._stage_d_fn's math (sum of per-size
    reconstructions over leaf rows only) without the decode round-trip."""
    from ..ops import dct, resize, zigzag

    h, w = shape
    mn, mx = WIDE_BLOCKS
    spec = batch_spec(layer_shapes, mn, mx)
    mids, scales = color.normalization_constants(space)

    consts = {}
    for gi, g in enumerate(spec.groups):
        lh, lw = g.shape
        for s in g.sizes:
            inv = zigzag.inverse_zigzag_indices(s)
            by, bx = boundary_positions(lh, lw, s)
            bcells = ((by.astype(np.int64) // s) * (g.pw // s)
                      + bx.astype(np.int64) // s).astype(np.int32)
            consts[(gi, s)] = (inv, bcells)

    def fn(batch_u8, outs, masks, q_t):
        orig = be._u8_to_unit_float(batch_u8)

        canvases = []
        for gi, g in enumerate(spec.groups):
            ph, pw, n_l = g.ph, g.pw, g.n_l
            p = b * n_l
            canvas = jnp.zeros((b, n_l, ph, pw), jnp.float32)
            for si, s in enumerate(g.sizes):
                inv, bcells = consts[(gi, s)]
                gh, gw = ph // s, pw // s
                zzrows, slow = outs[gi][0][si], outs[gi][1][si]
                if len(bcells):
                    # boundary cells must reconstruct the reflect-padded
                    # slow-bucket block (what the decoder scatters), not
                    # the zero-padded dense row
                    slow3 = slow.reshape(p, len(bcells), s * s)
                    zzrows = zzrows.at[:, jnp.asarray(bcells), :].set(slow3)
                lv = zzrows * masks[(gi, s)][:, :, None]
                if be._FUSED_LAYOUT:
                    ridx = jnp.asarray(
                        zigzag.row_inverse_zigzag_indices(s, gw))
                    flat = lv.reshape(p, gh, gw * s * s)
                    lv6 = jnp.take(flat, ridx, axis=2).reshape(
                        b, n_l, gh, s, gw, s)
                    coeffs = (lv6 * q_t[(gi, s)].reshape(1, n_l, 1, s, 1, s)
                              ).astype(jnp.float32)
                    blocks = dct.idct2_dense(coeffs)
                else:
                    raster = lv[:, :, jnp.asarray(inv)]
                    lv6 = raster.reshape(b, n_l, gh, gw, s, s)
                    coeffs = (lv6 * q_t[(gi, s)].reshape(1, n_l, 1, 1, s, s)
                              ).astype(jnp.float32)
                    blocks = dct.idct2_dense(
                        coeffs.transpose(0, 1, 2, 4, 3, 5))
                canvas = canvas + blocks.reshape(b, n_l, ph, pw)
            canvases.append(canvas)

        ups = []
        for li in range(3):
            gi, j = spec.layer_pos[li]
            g = spec.groups[gi]
            lh, lw = g.shape
            layer = canvases[gi][:, j, :lh, :lw] / scales[li] + mids[li]
            ups.append(resize.resize2d(layer, (h, w), "linear"))
        recon = color.convert(space, "sRGB", jnp.stack(ups, axis=-1))

        # ---- metrics (EvaluationMetrics semantics, metrics/quality.py)
        def per_image(o, r, o_u8):
            mse = jnp.mean((o - r) ** 2)
            p = 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12))

            r_u8 = (r * 255.0).astype(jnp.uint8)
            go = rgb_to_gray_u8(o_u8).astype(jnp.float32)[None]
            gr = rgb_to_gray_u8(r_u8).astype(jnp.float32)[None]
            f = max(1, round(min(h, w) / 256))
            if f > 1:
                go = _avg_pool(go, f)
                gr = _avg_pool(gr, f)
            s_val, _ = _ssim_components(go, gr, 255.0)

            oc = jnp.transpose(o, (2, 0, 1))
            rc = jnp.transpose(r, (2, 0, 1))
            vals = []
            for i in range(len(MS_SSIM_WEIGHTS)):
                sv, cs = _ssim_components(oc, rc, 1.0)
                vals.append(sv if i == len(MS_SSIM_WEIGHTS) - 1 else cs)
                if i < len(MS_SSIM_WEIGHTS) - 1:
                    oc = _avg_pool(oc, 2)
                    rc = _avg_pool(rc, 2)
            ms = jnp.ones(())
            for v, wgt in zip(vals, MS_SSIM_WEIGHTS):
                ms = ms * jnp.maximum(v, 0.0) ** wgt
            return p, s_val, ms

        p_v, s_v, m_v = jax.vmap(per_image)(orig, recon, batch_u8)
        if want_recon:
            return p_v, s_v, m_v, recon
        return p_v, s_v, m_v

    return jax.jit(fn), spec


# ------------------------------------------------------------- host helpers


def _quant_tables_for(cfg: CodecConfig, spec: BatchSpec):
    """Per-(group, size) runtime tables: (hi, lo) reciprocal stacks and Q
    dequant stacks, identity for sizes outside the combo's block band
    (their rows are masked out on device; identity keeps everything
    finite)."""
    from ..ops import quant

    mn, mx = cfg.block_size_range
    his, los, qs = {}, {}, {}
    for gi, g in enumerate(spec.groups):
        for s in g.sizes:
            if mn <= s <= mx:
                hi3, lo3, q3 = be._quant_tables_np(cfg, s)
                hi_g = np.stack([hi3[li] for li in g.layers])
                lo_g = np.stack([lo3[li] for li in g.layers])
                q_g = np.stack([q3[li] for li in g.layers]).astype(
                    np.float32)
            else:
                hi_g = np.ones((g.n_l, s, s), np.float32)
                lo_g = np.zeros((g.n_l, s, s), np.float32)
                q_g = np.ones((g.n_l, s, s), np.float32)
            his[(gi, s)] = jnp.asarray(hi_g)
            los[(gi, s)] = jnp.asarray(lo_g)
            qs[(gi, s)] = jnp.asarray(q_g)
    return his, los, qs


def _leaf_masks(plans, spec: BatchSpec, b: int):
    """masks[(gi, s)] = (b*n_l, gh*gw) float32: 1 where the combo's plan
    puts a leaf of size s at that grid cell."""
    masks = {}
    for gi, g in enumerate(spec.groups):
        for s in g.sizes:
            gh, gw = g.ph // s, g.pw // s
            masks[(gi, s)] = np.zeros((b * g.n_l, gh * gw), np.float32)
    for bi in range(b):
        for li, (gi, j) in enumerate(spec.layer_pos):
            g = spec.groups[gi]
            plan = plans[bi][li]
            plane = bi * g.n_l + j
            sizes64 = plan.leaf_sizes.astype(np.int64)
            for s in np.unique(sizes64):
                s = int(s)
                idx = sizes64 == s
                rows = ((plan.leaf_y[idx].astype(np.int64) // s)
                        * (g.pw // s)
                        + plan.leaf_x[idx].astype(np.int64) // s)
                masks[(gi, int(s))][plane, rows] = 1.0
    return masks


def _plans_for_combo(cfg: CodecConfig, layer_shapes, levels_bits, b: int):
    """Quadtree plans for one combo from the WIDE pooled-levels rows
    (bit offsets into the wide layout; same C++ batch DFS as production)."""
    mn, mx = cfg.block_size_range
    k_lo, k_hi = int(math.log2(mn)) + 1, int(math.log2(mx))
    if mn == mx:
        return [[qt.uniform_plan(lh, lw, mn) for (lh, lw) in layer_shapes]
                for _ in range(b)]
    layout, _ = be._level_layout(layer_shapes, WIDE_BAND)
    roots = [qt.root_size_for(lh, lw) for (lh, lw) in layer_shapes]
    n_k = k_hi - k_lo + 1
    bit_offs = np.zeros((3, n_k), np.int64)
    for li, k, g, off in layout:
        if k_lo <= k <= k_hi:
            bit_offs[li, k - k_lo] = off
    res = native_entropy.build_plans_batch(
        levels_bits, roots, [sh[0] for sh in layer_shapes],
        [sh[1] for sh in layer_shapes], bit_offs, k_lo, k_hi, mx, mn)
    if res is None:
        raise RuntimeError("native build_plans_batch unavailable; the "
                           "batched sweep requires the C++ backend")
    states_p, bits_len, sizes_a, ys_a, xs_a, n_leaves, totals = res
    plans = []
    for bi in range(b):
        row = []
        for li in range(3):
            t = bi * 3 + li
            nl = int(n_leaves[t])
            bl = int(bits_len[t])
            row.append(qt.QuadPlan(
                root_size=roots[li], height=layer_shapes[li][0],
                width=layer_shapes[li][1], states=None,
                leaf_sizes=sizes_a[t, :nl], leaf_y=ys_a[t, :nl],
                leaf_x=xs_a[t, :nl],
                states_packed=states_p[t, :(bl + 7) // 8].tobytes(),
                bits_len=bl))
        plans.append(row)
    return plans


def _assemble_blobs(cfg: CodecConfig, spec: BatchSpec, plans,
                    dense_np, slow_np, extensions, shape) -> List[bytes]:
    """Real .ajpg containers from pulled dense tables (C++ batch assembly;
    mirrors batch_encode.encode_batch's assemble stage)."""
    b = len(plans)
    h, w = shape
    mn, mx = cfg.block_size_range
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
    keep = []
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
                if (gi, s) not in dense_np:
                    continue
                k = s.bit_length() - 1
                arr = dense_np[(gi, s)]
                tbl[t, k] = (arr.ctypes.data
                             + plane * arr.shape[1] * arr.shape[2] * 2)
                if slow_np.get((gi, s)) is not None \
                        and slow_np[(gi, s)].size:
                    sarr = slow_np[(gi, s)]
                    nb = g.n_boundary(s)
                    slw[t, k] = (sarr.ctypes.data
                                 + plane * nb * s * s * 2)
    lens = totals * 4
    chunks = (lens + (1 << 20) - 1) // (1 << 20) + 1
    bounds = lens + lens // 500 + 32 * chunks + 64
    arena_offs = np.zeros(n_tasks + 1, np.int64)
    np.cumsum(bounds, out=arena_offs[1:])
    arena = np.empty(int(arena_offs[-1]), np.uint8)
    out_sizes = native_entropy.assemble_batch_native(
        lp_s, lp_y, lp_x, n_leaves, hs, ws, pws, tbl, slw,
        cfg.entropy_level, arena, arena_offs)
    if out_sizes is None:
        raise RuntimeError("native assemble_batch failed")
    blobs = []
    for bi in range(b):
        writer = ContainerWriter(ContainerMetadata(
            height=h, width=w, num_layers=3, color_space=cfg.color_space,
            quality_min=cfg.quality_range[0],
            quality_max=cfg.quality_range[1],
            block_size_min=mn, block_size_max=mx,
            extension=extensions[bi]))
        for li in range(3):
            t = bi * 3 + li
            plan = plans[bi][li]
            sb, bl = plan.packed()
            off = int(arena_offs[t])
            writer.add_layer(LayerPayload(
                bl, plan.root_size, sb, coeffs=None,
                compressed=arena[off:off + int(out_sizes[t])].tobytes()))
        blobs.append(writer.tobytes())
    return blobs


# ---------------------------------------------------------------- the sweep


def default_quality_ranges(values=(10, 25, 50, 75, 90)):
    return [(a, b) for a in values for b in values if a <= b]


def default_block_ranges(values=(4, 8, 16, 32, 64, 128)):
    return [(a, b) for a in values for b in values if a <= b]


class BatchedMetricsSweep:
    """Full-grid sweep over the LIVE database through the batched device
    pipeline.  Writes rows incrementally (resume-safe: already-present
    (image, combo) rows are skipped on re-run)."""

    def __init__(self, img_files: Sequence, result_file,
                 color_spaces: Sequence[str] = ("YCbCr",),
                 quality_ranges: Optional[List[Tuple[int, int]]] = None,
                 block_size_ranges: Optional[List[Tuple[int, int]]] = None,
                 entropy_level: int = -1,
                 progress_every: int = 10,
                 with_lpips: bool = False,
                 lpips_weights: Optional[str] = None):
        self.img_files = [Path(p) for p in img_files]
        self.result_file = Path(result_file)
        self.color_spaces = list(color_spaces)
        self.quality_ranges = quality_ranges or default_quality_ranges()
        self.block_size_ranges = (block_size_ranges
                                  or default_block_ranges())
        self.entropy_level = entropy_level
        self.progress_every = progress_every
        self.errors: List[str] = []
        # LPIPS is opt-in and weight-gated: the AlexNet+lin weights cannot
        # be fetched in this environment (zero egress); see metrics/lpips.py
        # for the export recipe.  Without weights the column stays '' —
        # loudly, so a consumer of the CSV knows why.
        self.lpips_path: Optional[str] = None
        if with_lpips:
            from ..metrics.lpips import default_weights_path
            self.lpips_path = lpips_weights or default_weights_path()
            if self.lpips_path is None:
                print("[sweep] LPIPS requested but no weights found "
                      "(AEJPEG_LPIPS_WEIGHTS / metrics/lpips_alex.npz); "
                      "the lpips column will be EMPTY.  Export weights via "
                      "aejpeg_tpu.metrics.lpips.convert_torch_checkpoint "
                      "on a machine with torchvision+lpips.", flush=True)
            else:
                print(f"[sweep] LPIPS enabled (weights: {self.lpips_path})",
                      flush=True)

    COLUMNS = ["image_name", "color_space", "min_quality", "max_quality",
               "min_block_size", "max_block_size", "psnr", "ssim",
               "ms_ssim", "lpips", "compression_ratio"]

    def _existing_keys(self):
        if not self.result_file.exists():
            return set()
        import csv
        keys = set()
        with open(self.result_file) as f:
            for row in csv.DictReader(f):
                keys.add((row["image_name"], row["color_space"],
                          row["min_quality"], row["max_quality"],
                          row["min_block_size"], row["max_block_size"]))
        return keys

    def run(self):
        combos = list(product(self.color_spaces, self.quality_ranges,
                              self.block_size_ranges))
        existing = self._existing_keys()
        self.result_file.parent.mkdir(parents=True, exist_ok=True)
        fresh = not self.result_file.exists()
        out = open(self.result_file, "a", buffering=1)
        if fresh:
            out.write(",".join(self.COLUMNS) + "\n")

        # group images by shape
        groups: Dict[Tuple[int, int], List[Path]] = {}
        for p in self.img_files:
            img = ImageData.load(str(p))
            groups.setdefault(tuple(img.original_shape[:2]), []).append(p)

        total = len(self.img_files) * len(combos)
        done = len(existing)
        t0 = time.perf_counter()
        for shape, paths in groups.items():
            self._run_shape_group(shape, paths, combos, existing, out,
                                  lambda n: self._progress(
                                      done + n, total, t0))
            done += len(paths) * len(combos)
        out.close()
        if self.errors:
            print(f"[sweep] {len(self.errors)} errors; first: "
                  f"{self.errors[0]}")
        return self.result_file

    def _progress(self, done, total, t0):
        if done % self.progress_every:
            return
        dt = time.perf_counter() - t0
        eta = dt / max(done, 1) * (total - done)
        print(f"[sweep] {done}/{total} ({dt:.0f}s, ETA {eta:.0f}s)",
              flush=True)

    def _run_shape_group(self, shape, paths, combos, existing, out,
                         progress):
        h, w = shape
        imgs = [ImageData.load(str(p)) for p in paths]
        b = len(imgs)
        u8 = np.round(np.stack([im.data for im in imgs]) * 255.0
                      ).astype(np.uint8)
        batch_dev = jnp.asarray(u8)
        raw_bytes = h * w * 3

        cfg0 = CodecConfig(self.color_spaces[0], (50, 50), WIDE_BLOCKS)
        layer_shapes = cfg0.layer_shapes(shape)
        jit_b, spec = _stage_b_rt_fn(tuple(layer_shapes), b)

        n_done = 0
        for space in self.color_spaces:
            # resume fast-path: if every combo of this (shape, space) is
            # already in the CSV, skip the whole device setup (stage A +
            # jit construction) — on a resumed run the first compile of a
            # covered shape group would otherwise cost minutes for rows
            # that are then skipped one by one
            missing = [c for c in combos if c[0] == space and (
                str(paths[0]), c[0], str(c[1][0]), str(c[1][1]),
                str(c[2][0]), str(c[2][1])) not in existing]
            if not missing:
                n_done += b * sum(1 for c in combos if c[0] == space)
                progress(n_done)
                continue
            ls_space = CodecConfig(space, (50, 50),
                                   WIDE_BLOCKS).layer_shapes(shape)
            if tuple(ls_space) != tuple(layer_shapes):
                # different subsampling (ICtCp/ICaCb): separate stage B
                layer_shapes = ls_space
                jit_b, spec = _stage_b_rt_fn(tuple(layer_shapes), b)
            group_planes, packed_bits = be._stage_a(
                batch_dev, space, tuple(layer_shapes), WIDE_BAND, spec)
            levels_bits = np.asarray(packed_bits)
            jit_m, _ = _recon_metrics_fn(space, shape,
                                         tuple(layer_shapes), b,
                                         want_recon=bool(self.lpips_path))

            for sp, qr, br in combos:
                if sp != space:
                    continue
                n_done += b
                key0 = (str(paths[0]), sp, str(qr[0]), str(qr[1]),
                        str(br[0]), str(br[1]))
                if key0 in existing:
                    continue
                try:
                    rows = self._run_combo(
                        sp, qr, br, shape, paths, imgs, b, raw_bytes,
                        batch_dev, group_planes, levels_bits,
                        layer_shapes, jit_b, jit_m, spec)
                    for r in rows:
                        out.write(",".join(r) + "\n")
                except Exception as e:  # noqa: BLE001 - combo isolation
                    self.errors.append(
                        f"{shape} {sp} {qr} {br}: {type(e).__name__}: {e}")
                progress(n_done)

    def _run_combo(self, space, qr, br, shape, paths, imgs, b, raw_bytes,
                   batch_dev, group_planes, levels_bits, layer_shapes,
                   jit_b, jit_m, spec):
        cfg = CodecConfig(space, qr, br, entropy_level=self.entropy_level)
        his, los, qs = _quant_tables_for(cfg, spec)
        outs = jit_b(group_planes, his, los)
        plans = _plans_for_combo(cfg, layer_shapes, levels_bits, b)
        masks = _leaf_masks(plans, spec, b)
        masks_j = {k: jnp.asarray(v) for k, v in masks.items()}
        lpips_v = None
        if self.lpips_path:
            psnr_v, ssim_v, ms_v, recon = jit_m(batch_dev, outs, masks_j,
                                                qs)
            lpips_v = np.asarray(
                _lpips_batch_fn(self.lpips_path)(batch_dev, recon))
        else:
            psnr_v, ssim_v, ms_v = jit_m(batch_dev, outs, masks_j, qs)
        psnr_v = np.asarray(psnr_v)
        ssim_v = np.asarray(ssim_v)
        ms_v = np.asarray(ms_v)

        # pull only the combo's sizes for container assembly
        mn, mx = br
        dense_np, slow_np = {}, {}
        for gi, g in enumerate(spec.groups):
            for si, s in enumerate(g.sizes):
                if not (mn <= s <= mx):
                    continue
                gh, gw = g.ph // s, g.pw // s
                dense_np[(gi, s)] = np.ascontiguousarray(
                    np.asarray(outs[gi][0][si]))
                slow_np[(gi, s)] = np.ascontiguousarray(
                    np.asarray(outs[gi][1][si])) \
                    if g.n_boundary(s) else None
        blobs = _assemble_blobs(cfg, spec, plans, dense_np, slow_np,
                                [im.extension for im in imgs], shape)

        rows = []
        for bi, p in enumerate(paths):
            lp = f"{float(lpips_v[bi]):.4f}" if lpips_v is not None else ""
            rows.append([
                str(p), space, str(qr[0]), str(qr[1]), str(br[0]),
                str(br[1]), f"{float(psnr_v[bi]):.4f}",
                f"{float(ssim_v[bi]):.4f}", f"{float(ms_v[bi]):.4f}", lp,
                f"{raw_bytes / len(blobs[bi]):.4f}"])
        return rows
