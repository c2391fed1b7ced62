"""Batched quadtree decoder: the mirror of `batch_encode`.

The per-image `Codec.decompress` dispatches one device call per (layer,
size) bucket; at batch scale dispatch latency dominates.  Here:

  host: parse containers, inflate coefficient streams (native zlib pool),
      replay state streams to leaf positions (native C++ stack replay),
      gather per-size global level buckets across all images/layers.
  device (1 jit call / batch): per size bucket — inverse zigzag -> dequant
      (per-layer tables) -> IDCT matmuls -> scatter whole tiles into
      padded space-to-depth canvases (quadtree leaves are size-aligned, so
      every block is one tile row: the fast scatter mirrors the encoder's
      fast gather); then crop, denormalize, bilinear-upsample chroma and
      invert the color transform for all images at once.

Outputs are numerically identical to `Codec.decompress` (same jnp ops).
Requires same-shape, same-settings containers; group upstream otherwise.
"""

import functools
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import color
from ..config import CodecConfig
from ..io.container import ContainerReader
from ..io.image import ImageData
from ..ops import dct, quant, resize, zigzag
from . import quadtree as qt
from .batch_encode import _bucket_capacity, _sync


def _canvas_pad(n: int) -> int:
    """Smallest multiple of 128 >= n + 127: every leaf tile (size <= 128,
    origin inside the layer) fits entirely inside the padded canvas, and
    the tile grid divides evenly for every block size."""
    return ((n + 127 + 127) // 128) * 128


@functools.partial(jax.jit, static_argnames=("sizes", "space",
                                             "layer_shapes", "out_shape",
                                             "canvas_shape"))
def _stage_d(per_size: Tuple, sizes: Tuple[int, ...],
             qtabs: Tuple, space: str,
             layer_shapes: Tuple[Tuple[int, int], ...],
             out_shape: Tuple[int, int], canvas_shape: Tuple[int, int, int]
             ) -> jnp.ndarray:
    """per_size[i] = (levels (cap, s*s) int32, row_layer (cap,) int32,
    inv_map (p*gh*gw,) int32 mapping each canvas tile slot to its bucket
    row, or cap for empty slots); qtabs[i] = (3, s, s) int32 quantization
    tables.  Returns (B, H, W, 3) float32 sRGB.

    Paint is a row-GATHER from the decoded bucket into the dense tile
    array (the host precomputes the inverse map): measured ~3x a scatter
    on the TPU, and for s <= KRON_MAX everything stays 2-D — (n, s, s)
    tensors tile to (8, 128) with up to 32x memory padding (an earlier
    scatter formulation OOMed 17 GB at batch 42)."""
    p, php, pwp = canvas_shape
    canvas = jnp.zeros((p, php, pwp), jnp.float32)
    for i, s in enumerate(sizes):
        levels, row_layer, inv_map = per_size[i]
        gh, gw = php // s, pwp // s
        if s <= dct.KRON_MAX:
            q = qtabs[i].reshape(3, -1)[row_layer]
            blocks = dct.idct2_flat(quant.dequantize(
                zigzag.zigzag_scatter_flat(levels, s), q), s)
            padded = jnp.concatenate(
                [blocks, jnp.zeros((1, s * s), jnp.float32)], axis=0)
            tiles = padded[inv_map]
            canvas = canvas + tiles.reshape(p, gh, gw, s, s).transpose(
                0, 1, 3, 2, 4).reshape(p, php, pwp)
        else:
            q = qtabs[i][row_layer]
            blocks = dct.idct2(quant.dequantize(
                zigzag.zigzag_scatter(levels, s), q))
            padded = jnp.concatenate(
                [blocks, jnp.zeros((1, s, s), jnp.float32)], axis=0)
            tiles = padded[inv_map]
            canvas = canvas + tiles.reshape(p, gh, gw, s, s).transpose(
                0, 1, 3, 2, 4).reshape(p, php, pwp)

    mids, scales = color.normalization_constants(space)
    h, w = out_shape
    b = p // 3
    canv = canvas.reshape(b, 3, php, pwp)
    ups = []
    for i, (lh, lw) in enumerate(layer_shapes):
        layer = canv[:, i, :lh, :lw] / scales[i] + mids[i]
        ups.append(resize.resize2d(layer, (h, w), "linear"))
    stacked = jnp.stack(ups, axis=-1)
    return color.convert(space, "sRGB", stacked)


def decode_batch(blobs: List[bytes],
                 timings: Optional[Dict[str, float]] = None,
                 materialize: bool = True):
    """Decode same-settings .ajpg blobs as one device pipeline; returns
    images in input order.  Stage timings: 'parse' (inflate + replay),
    'buckets', 'push', 'stage_d', 'pull'.  materialize=False returns the
    device-resident (B, H, W, 3) array plus the metadata list instead of
    host ImageData (skips the device->host image transfer)."""
    if not blobs:
        return []
    import time
    marks = [time.perf_counter()]

    def mark(name):
        if timings is not None:
            marks.append(time.perf_counter())
            timings[name] = timings.get(name, 0.0) + marks[-1] - marks[-2]

    # ---- host: parse + inflate + replay (thread pool across blobs)
    def parse(blob):
        reader = ContainerReader(blob)
        layers = []
        for payload in reader.read_layers():
            states = qt.unpack_states(payload.states_bytes, payload.bits_len)
            sizes, ys, xs = qt.replay_positions(states, payload.root_size,
                                                0, 0)
            layers.append((sizes, ys, xs, payload.coeffs))
        return reader.metadata, layers

    with ThreadPoolExecutor() as pool:
        parsed = list(pool.map(parse, blobs))
    meta0 = parsed[0][0]
    for m, _ in parsed[1:]:
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
    layer_shapes = cfg.layer_shapes((h, w))
    php, pwp = _canvas_pad(layer_shapes[0][0]), _canvas_pad(layer_shapes[0][1])
    mark("parse")

    # ---- host: global per-size buckets
    entries: Dict[int, List] = {}
    for bi, (_, layers) in enumerate(parsed):
        for li, (sizes, ys, xs, coeffs) in enumerate(layers):
            sizes64 = sizes.astype(np.int64)
            offsets = np.zeros(len(sizes64) + 1, np.int64)
            np.cumsum(sizes64 * sizes64, out=offsets[1:])
            for s in np.unique(sizes64):
                s = int(s)
                idx = np.nonzero(sizes64 == s)[0]
                flat_pos = (offsets[idx][:, None]
                            + np.arange(s * s, dtype=np.int64)[None, :])
                vecs = coeffs[flat_pos.ravel()].reshape(len(idx), s * s)
                gh, gw = php // s, pwp // s
                flat_idx = ((bi * 3 + li) * gh * gw
                            + (ys[idx] // s) * gw + xs[idx] // s)
                entries.setdefault(s, []).append(
                    (vecs.astype(np.int32), flat_idx.astype(np.int32), li))

    mn = cfg.block_size_range[0]
    sizes_t = tuple(sorted(entries))
    per_size, qtabs = [], []
    p = b * 3
    for s in sizes_t:
        items = entries[s]
        n = sum(len(v) for v, _, _ in items)
        cap = _bucket_capacity(n)
        n_tiles = p * (php // s) * (pwp // s)
        levels = np.zeros((cap, s * s), np.int32)
        row_layer = np.zeros(cap, np.int32)
        inv_map = np.full(n_tiles, cap, np.int32)  # cap -> the zero row
        pos = 0
        for v, f, li in items:
            m = len(v)
            levels[pos:pos + m] = v
            row_layer[pos:pos + m] = li
            inv_map[f] = np.arange(pos, pos + m, dtype=np.int32)
            pos += m
        per_size.append((levels, row_layer, inv_map))
        qtabs.append(np.stack([
            quant.quantization_matrix(
                np.asarray(cfg.quantization_matrices[li]), s,
                cfg.quality_for(max(s, mn)))
            for li in range(3)]))
    mark("buckets")

    per_size_dev = jax.device_put(tuple(per_size))
    qtabs_dev = jax.device_put(tuple(qtabs))
    if timings is not None:
        _sync((per_size_dev, qtabs_dev))
    mark("push")

    out = _stage_d(per_size_dev, sizes_t, qtabs_dev, cfg.color_space,
                   layer_shapes, (h, w), (p, php, pwp))
    if timings is not None:
        _sync(out)
    mark("stage_d")
    if not materialize:
        return out, [m for m, _ in parsed]
    arr = np.asarray(out, np.float32)
    mark("pull")
    return [ImageData(arr[i], (h, w, 3), parsed[i][0].extension)
            for i in range(b)]
