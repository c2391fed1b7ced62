"""Batched quadtree decoder: the mirror of `batch_encode`.

Round-2 dense redesign.  The reference decodes per block in Python loops
(src/jpeg/jpeg.py:599-674, 410-459); round 1 batched gathered buckets but
spent more time in the host numpy bucket assembly than on the device.
Here the host never touches coefficients:

  host (thread pool over blobs): parse containers; per layer, C++ replays
      the state stream, inflates the coefficient stream and scatters each
      leaf's zigzag row — narrowed to int16 — into dense per-size tables
      (native/entropy.cpp aej_decode_layer).  Planes are padded so every
      leaf block lands inside its size grid; non-leaf rows stay zero.
  device (1 jit / batch): per size — inverse zigzag, dequantize, dense
      inverse DCT over the whole plane; SUM the per-size reconstructions
      (leaves partition the plane, and zero rows reconstruct to zero);
      then crop, denormalize, bilinear-upsample chroma and invert the
      color transform for all images at once.

Outputs match `Codec.decompress` within 1-2 ulp (the dense sum of
per-size reconstructions reorders the float accumulation; measured max
abs diff ~1.8e-7 on ~15% of pixels).  Requires same-shape, same-settings
containers; group upstream otherwise.
"""

import ctypes
import functools
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import color
from ..config import CodecConfig
from ..io.container import ContainerReader
from ..io.image import ImageData
from ..native import entropy as native_entropy
from ..native import inflate as native_inflate
from ..ops import dct, quant, resize, zigzag
from . import quadtree as qt
from .batch_encode import _FUSED_LAYOUT, _quant_tables_np, _sync
from .dense import batch_spec


@functools.lru_cache(maxsize=32)
def _stage_d_fn(cfg: CodecConfig, shape: Tuple[int, int], b: int):
    """Compiled dense decode stage for (config, image shape, batch size).

    Returns (jit_fn, spec).  jit_fn(tables, masks) with tables[gi][si] =
    (B * n_l, gh * gw, s * s) zigzag int16 and masks[gi][si] =
    (B * n_l, gh * gw) uint8 leaf-row gates -> (B, H, W, 3) float32 sRGB.
    Non-leaf table rows may be arbitrary garbage (the host fills tables
    from uninitialized scratch); the mask zeroes them before dequantize,
    so only leaf rows contribute to the per-size reconstruction sum."""
    h, w = shape
    layer_shapes = cfg.layer_shapes(shape)
    mn, mx = cfg.block_size_range
    spec = batch_spec(layer_shapes, mn, mx)
    mids, scales = color.normalization_constants(cfg.color_space)

    consts = {}
    for gi, g in enumerate(spec.groups):
        for s in g.sizes:
            _, _, q3 = _quant_tables_np(cfg, s)
            q_g = np.stack([q3[li] for li in g.layers])      # (n_l, s, s)
            inv = zigzag.inverse_zigzag_indices(s)
            consts[(gi, s)] = (q_g, inv)

    def fn(tables, masks):
        canvases = []
        for gi, g in enumerate(spec.groups):
            ph, pw, n_l = g.ph, g.pw, g.n_l
            canvas = jnp.zeros((b, n_l, ph, pw), jnp.float32)
            for si, s in enumerate(g.sizes):
                q_g, inv = consts[(gi, s)]
                gh, gw = ph // s, pw // s
                zzrows = tables[gi][si]                  # (p, gh*gw, s*s)
                zzrows = jnp.where(masks[gi][si][:, :, None] != 0,
                                   zzrows, 0)
                if _FUSED_LAYOUT:
                    # inverse zigzag + block de-transpose as ONE wide
                    # static gather (bitwise-identical; mirrors encode's
                    # fused layout — ops/zigzag.row_inverse_zigzag_indices)
                    ridx = jnp.asarray(
                        zigzag.row_inverse_zigzag_indices(s, gw))
                    flat = zzrows.reshape(b * n_l, gh, gw * s * s)
                    lv = jnp.take(flat, ridx, axis=2).reshape(
                        b, n_l, gh, s, gw, s)
                    coeffs = (lv * jnp.asarray(q_g).reshape(
                        1, n_l, 1, s, 1, s)).astype(jnp.float32)
                    blocks = dct.idct2_dense(coeffs)
                else:
                    raster = zzrows[:, :, jnp.asarray(inv)]
                    lv = raster.reshape(b, n_l, gh, gw, s, s)
                    coeffs = (lv * jnp.asarray(q_g).reshape(
                        1, n_l, 1, 1, s, s)).astype(jnp.float32)
                    # dense inverse DCT wants (..., gh, s, gw, s)
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
        stacked = jnp.stack(ups, axis=-1)
        return color.convert(cfg.color_space, "sRGB", stacked)

    return jax.jit(fn), spec


def _decode_layer_numpy(payload, table_views: Dict[int, np.ndarray],
                        pw: int,
                        mask_views: Optional[Dict[int, np.ndarray]] = None
                        ) -> None:
    """Pure-numpy mirror of entropy.cpp aej_decode_layer (fallback when the
    native library is unavailable; also its test oracle).  table_views[k]
    is this plane's (gh*gw, s*s) int16 view; mask_views[k] (if given) its
    (gh*gw,) uint8 leaf-gate view."""
    states = qt.unpack_states(payload.states_bytes, payload.bits_len)
    sizes, ys, xs = qt.replay_positions(states, payload.root_size, 0, 0)
    coeffs = payload.coeffs
    sizes64 = sizes.astype(np.int64)
    offsets = np.zeros(len(sizes64) + 1, np.int64)
    np.cumsum(sizes64 * sizes64, out=offsets[1:])
    for s in np.unique(sizes64):
        s = int(s)
        k = s.bit_length() - 1
        idx = np.nonzero(sizes64 == s)[0]
        flat = (offsets[idx][:, None]
                + np.arange(s * s, dtype=np.int64)[None, :])
        rows = (ys[idx].astype(np.int64) // s) * (pw // s) + xs[idx] // s
        table_views[k][rows] = coeffs[flat.ravel()].reshape(
            len(idx), s * s).astype(np.int16)
        if mask_views is not None:
            mask_views[k][rows] = 1


@functools.lru_cache(maxsize=16)
def _sharded_decode_cache(cfg: CodecConfig, shape: Tuple[int, int], b: int,
                          mesh, data_axes):
    from ..parallel.batch import sharded_dense_decode_fn
    return sharded_dense_decode_fn(cfg, shape, b, mesh, data_axes)


def parse_native_into_tables(payloads, spec, tables, masks, b: int) -> None:
    """One batched C++ call: per (container, layer) replay the state
    stream, inflate the coefficient stream and scatter int16 rows into the
    caller's dense tables/masks.  Raises on malformed containers.  Shared
    by decode_batch and the bench's measured decode stream."""
    n_tasks = 3 * b
    st_ptrs = np.empty(n_tasks, np.uint64)
    bits_lens = np.empty(n_tasks, np.int64)
    root_sizes = np.empty(n_tasks, np.int32)
    comp_ptrs = np.empty(n_tasks, np.uint64)
    comp_lens = np.empty(n_tasks, np.int64)
    pws = np.empty(n_tasks, np.int32)
    phs = np.empty(n_tasks, np.int32)
    tbl = np.zeros((n_tasks, 8), np.uint64)
    msk = np.zeros((n_tasks, 8), np.uint64)
    keep = []   # keep the ctypes views of the payload bytes alive
    for bi in range(b):
        for li in range(3):
            t = bi * 3 + li
            payload = payloads[bi][li]
            gi, j = spec.layer_pos[li]
            g = spec.groups[gi]
            plane = bi * g.n_l + j
            sb = ctypes.c_char_p(payload.states_bytes)
            cb = ctypes.c_char_p(payload.compressed)
            keep.append((sb, cb))
            st_ptrs[t] = ctypes.cast(sb, ctypes.c_void_p).value or 0
            comp_ptrs[t] = ctypes.cast(cb, ctypes.c_void_p).value or 0
            bits_lens[t] = payload.bits_len
            root_sizes[t] = payload.root_size
            comp_lens[t] = len(payload.compressed)
            pws[t] = g.pw
            phs[t] = g.ph
            for si, s in enumerate(g.sizes):
                k = s.bit_length() - 1
                arr = tables[gi][si]
                tbl[t, k] = (arr.ctypes.data
                             + plane * arr.shape[1] * arr.shape[2] * 2)
                marr = masks[gi][si]
                msk[t, k] = marr.ctypes.data + plane * marr.shape[1]
    done = native_entropy.decode_batch_native(
        st_ptrs, bits_lens, root_sizes, comp_ptrs, comp_lens, pws, phs,
        tbl, msk)
    if done is not None and (done < 0).any():
        bad = int(np.nonzero(done < 0)[0][0])
        raise ValueError(f"malformed .ajpg container (image {bad // 3}, "
                         f"layer {bad % 3})")
    return done


def decode_batch(blobs: List[bytes],
                 timings: Optional[Dict[str, float]] = None,
                 materialize: bool = True, mesh=None, data_axes=None):
    """Decode same-settings .ajpg blobs as one device pipeline; returns
    images in input order.  Stage timings: 'parse' (inflate + replay +
    dense scatter, C++), 'push', 'device', 'pull'.  materialize=False
    returns the device-resident (B, H, W, 3) array plus the metadata list
    instead of host ImageData (skips the device->host image transfer).

    With `mesh` (a jax.sharding.Mesh), the device stage runs data-parallel
    over the mesh's `data_axes` (default: every axis); len(blobs) must
    divide evenly.  Outputs are numerically identical to the single-device
    path (see parallel/batch.py sharded_dense_decode_fn)."""
    if not blobs:
        return []
    marks = [time.perf_counter()]

    def mark(name):
        if timings is not None:
            marks.append(time.perf_counter())
            timings[name] = timings.get(name, 0.0) + marks[-1] - marks[-2]

    metas = [None] * len(blobs)
    readers = []
    for bi, blob in enumerate(blobs):
        r = ContainerReader(blob)
        metas[bi] = r.metadata
        readers.append(r)
    meta0 = metas[0]
    for m in metas[1:]:
        if (m.height, m.width, m.color_space, m.quality_min, m.quality_max,
            m.block_size_min, m.block_size_max) != (
                meta0.height, meta0.width, meta0.color_space,
                meta0.quality_min, meta0.quality_max, meta0.block_size_min,
                meta0.block_size_max):
            raise ValueError("decode_batch requires same-shape, "
                             "same-settings containers")
    cfg = CodecConfig(meta0.color_space,
                      (meta0.quality_min, meta0.quality_max),
                      (meta0.block_size_min, meta0.block_size_max))
    h, w = meta0.height, meta0.width
    b = len(blobs)
    if mesh is None:
        jit_d, spec = _stage_d_fn(cfg, (h, w), b)
    else:
        jit_d, spec = _sharded_decode_cache(
            cfg, (h, w), b, mesh,
            None if data_axes is None else tuple(data_axes))

    # dense tables from per-thread grow-only scratch (UNINITIALIZED — the
    # np.zeros this replaced cost more in page faults than the C++ decode;
    # non-leaf garbage rows are gated out on device by the masks).  Volatile
    # until this thread's next decode_batch, which is safe: _sync(out)
    # below guarantees the device consumed the upload before we return.
    # masks[gi][si] = (B*n_l, gh*gw) uint8, zeroed (small: 1 byte/block).
    tables: List[List[np.ndarray]] = []
    masks: List[List[np.ndarray]] = []
    for gi, g in enumerate(spec.groups):
        per, mper = [], []
        for s in g.sizes:
            gh, gw = g.ph // s, g.pw // s
            per.append(native_entropy.scratch_view(
                f"dec_tbl_{gi}_{s}", (b * g.n_l, gh * gw, s * s), np.int16))
            m = native_entropy.scratch_view(
                f"dec_msk_{gi}_{s}", (b * g.n_l, gh * gw), np.uint8)
            m[:] = 0
            mper.append(m)
        tables.append(per)
        masks.append(mper)

    # host: one batched C++ call — per (container, layer): replay the state
    # stream, decode the coefficient stream (custom sparse inflater, zlib
    # fallback) and scatter int16 rows into the dense tables, on an internal
    # thread pool (round 2 made 3B ctypes calls from a Python thread pool).
    payloads = [[readers[bi].read_layer_raw() for _ in range(3)]
                for bi in range(b)]
    done = None
    if native_entropy.native_available():
        done = parse_native_into_tables(payloads, spec, tables, masks, b)

    if done is None:
        # pure-Python fallback (no native library)
        def parse(bi: int) -> None:
            for li in range(3):
                payload = payloads[bi][li]
                gi, j = spec.layer_pos[li]
                g = spec.groups[gi]
                plane = bi * g.n_l + j
                raw = native_inflate(payload.compressed,
                                     max_out=4 * g.ph * g.pw * 2)
                payload.coeffs = np.frombuffer(raw, dtype="<i4")
                views, mviews = {}, {}
                for si, s in enumerate(g.sizes):
                    k = s.bit_length() - 1
                    views[k] = tables[gi][si][plane]
                    mviews[k] = masks[gi][si][plane]
                _decode_layer_numpy(payload, views, g.pw, mviews)

        with ThreadPoolExecutor() as pool:
            list(pool.map(parse, range(b)))
    mark("parse")

    host_tables = tuple(tuple(per) for per in tables)
    host_masks = tuple(tuple(per) for per in masks)
    if mesh is None:
        tables_dev = jax.device_put(host_tables)
        masks_dev = jax.device_put(host_masks)
    else:
        from jax.sharding import NamedSharding, PartitionSpec
        axes = (tuple(mesh.shape.keys()) if data_axes is None
                else tuple(data_axes))
        sharding = NamedSharding(mesh, PartitionSpec(axes))
        tables_dev = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), host_tables)
        masks_dev = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), host_masks)
    if timings is not None:
        _sync(tables_dev)
    mark("push")

    out = jit_d(tables_dev, masks_dev)
    _sync(out)   # execution barrier before any bulk pull (see batch_encode)
    mark("device")
    if not materialize:
        return out, metas
    arr = np.ascontiguousarray(np.asarray(out, np.float32))
    mark("pull")
    return [ImageData(arr[i], (h, w, 3), metas[i].extension)
            for i in range(b)]
