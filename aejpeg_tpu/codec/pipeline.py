"""End-to-end codec: batched, bucketed, device-resident pipeline.

Encode (mirrors the behavior of Jpeg.compress, src/jpeg/jpeg.py:240-272, with
a TPU-first dataflow):

  device:  sRGB -> target color space -> per-layer INTER_AREA downsample
           -> Canny edge map            (fused jnp/Pallas, one jit call)
  host:    quadtree plan per layer (mask pyramid + Morton preorder sort)
  device:  per (size-bucket): gather leaf blocks (reflect-padded) from the
           normalized layer -> DCT matmul -> quantize -> zigzag   (jit per
           bucket shape, padded to capacity buckets to bound recompiles)
  host:    preorder coefficient assembly -> zlib -> .ajpg container

Decode inverts each stage (Jpeg.decompress, src/jpeg/jpeg.py:274-297):
container parse -> state replay -> bucket scatter -> dequant -> IDCT ->
canvas paint -> crop -> denormalize -> INTER_LINEAR upsample -> inverse
color -> clip.
"""

import functools
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import color
from ..config import CodecConfig
from ..io.container import (ContainerMetadata, ContainerReader,
                            ContainerWriter, LayerPayload)
from ..io.image import ImageData
from ..ops import dct, quant, resize, zigzag
from . import quadtree as qt


def _bucket_capacity(n: int) -> int:
    """Round bucket sizes up to limit jit cache entries: next power of two,
    min 64."""
    cap = 64
    while cap < n:
        cap *= 2
    return cap


def _reflect_indices(origins: jnp.ndarray, size: int, limit: int
                     ) -> jnp.ndarray:
    """(n,) block origins -> (n, size) absolute indices with np.pad-'reflect'
    semantics for the out-of-bounds tail (src/jpeg/jpeg.py:398-402)."""
    offs = jnp.arange(size, dtype=jnp.int32)[None, :]
    avail = jnp.maximum(limit - origins, 1)[:, None]        # valid extent
    period = jnp.maximum(2 * avail - 2, 1)
    m = offs % period
    idx = jnp.where(m < avail, m, period - m)
    return origins[:, None] + idx


@functools.partial(jax.jit, static_argnames=("size", "h", "w"))
def _encode_bucket(layer: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray,
                   inv_hi: jnp.ndarray, inv_lo: jnp.ndarray,
                   size: int, h: int, w: int) -> jnp.ndarray:
    """Gather (reflect-pad) -> DCT -> quantize -> zigzag for one bucket.

    layer: (h, w) normalized layer;  ys/xs: (cap,) origins (padded rows may
    repeat origin 0 and are discarded on host).  Returns (cap, size*size)
    int32 zigzag vectors.
    """
    rows = _reflect_indices(ys, size, h)                     # (cap, s)
    cols = _reflect_indices(xs, size, w)                     # (cap, s)
    blocks = layer[rows[:, :, None], cols[:, None, :]]       # (cap, s, s)
    coeffs = dct.dct2(blocks)
    levels = quant.quantize(coeffs, inv_hi, inv_lo)
    return zigzag.zigzag_gather(levels)


@functools.partial(jax.jit, static_argnames=("size",))
def _decode_bucket(vectors: jnp.ndarray, qmatrix: jnp.ndarray, size: int
                   ) -> jnp.ndarray:
    """Inverse zigzag -> dequantize -> IDCT for one bucket:
    (cap, s*s) int32 -> (cap, s, s) float32."""
    levels = zigzag.zigzag_scatter(vectors, size)
    coeffs = quant.dequantize(levels, qmatrix)
    return dct.idct2(coeffs)


@functools.partial(jax.jit, static_argnames=("root", "size"))
def _paint_bucket(canvas: jnp.ndarray, blocks: jnp.ndarray, ys: jnp.ndarray,
                  xs: jnp.ndarray, root: int, size: int) -> jnp.ndarray:
    """Scatter (cap, s, s) blocks into the (root, root) canvas.  Padded
    bucket rows carry origin == root (out of bounds) and are dropped by the
    scatter, so bucket shapes stay capacity-stable for the jit cache."""
    rows = ys[:, None] + jnp.arange(size, dtype=jnp.int32)[None, :]
    cols = xs[:, None] + jnp.arange(size, dtype=jnp.int32)[None, :]
    return canvas.at[rows[:, :, None], cols[:, None, :]].set(
        blocks, mode="drop")


class Codec:
    """Adaptive edge-aware JPEG codec (API parity with reference `Jpeg`:
    compress(ImageData) -> bytes, decompress(bytes) -> ImageData)."""

    def __init__(self, config: Optional[CodecConfig] = None,
                 edge_fn: Optional[Callable] = None):
        self.config = config or CodecConfig()
        # edge_fn(layer_f32_hw) -> float32 {0,1} edge map; defaults to the
        # Canny stack; injectable for tests/oracles.
        if edge_fn is None:
            from ..ops.canny import canny
            edge_fn = canny
        self.edge_fn = edge_fn
        self.extension: Optional[str] = None

    # ------------------------------------------------------------ settings
    def update_settings(self, config: CodecConfig) -> None:
        self.config = config

    def _quant_tables(self) -> List[Dict[int, np.ndarray]]:
        cfg = self.config
        tables = []
        for base in cfg.quantization_matrices:
            per_size = {}
            for s in cfg.block_sizes:
                per_size[s] = quant.quantization_matrix(
                    np.asarray(base), s, cfg.quality_for(s))
            tables.append(per_size)
        return tables

    def _quant_table_for(self, tables, layer: int, size: int) -> np.ndarray:
        per_size = tables[layer]
        if size not in per_size:
            # leaves smaller than min_block_size occur only when the image is
            # smaller than the configured min block; extend gracefully (the
            # reference would KeyError here).
            cfg = self.config
            base = cfg.quantization_matrices[layer]
            per_size[size] = quant.quantization_matrix(
                np.asarray(base), size, cfg.quality_for(max(
                    size, cfg.block_size_range[0])))
        return per_size[size]

    # ------------------------------------------------------------- encode
    def compress(self, img: ImageData) -> bytes:
        cfg = self.config
        h, w = img.original_shape[:2]
        self.extension = img.extension
        layer_shapes = cfg.layer_shapes((h, w))

        # --- device: color convert + downsample (one jit call)
        layers = _color_and_downsample(
            jnp.asarray(img.data, jnp.float32), cfg.color_space,
            layer_shapes)

        mids, scales = color.normalization_constants(cfg.color_space)
        tables = self._quant_tables()
        mn, mx = cfg.block_size_range

        from ..native import deflate_parallel
        writer = ContainerWriter(ContainerMetadata(
            height=h, width=w, num_layers=3, color_space=cfg.color_space,
            quality_min=cfg.quality_range[0], quality_max=cfg.quality_range[1],
            block_size_min=mn, block_size_max=mx, extension=img.extension),
            compress=lambda b: deflate_parallel(b, level=cfg.entropy_level))

        for i in range(3):
            layer = layers[i]
            lh, lw = layer_shapes[i]
            if mn == mx:
                # uniform grid: the tree never consults edges; cached plan
                plan = qt.uniform_plan(lh, lw, mn)
            else:
                edge = np.asarray(self.edge_fn(layer))
                plan = qt.build_plan(edge, mx, mn)

            norm = (layer - mids[i]) * scales[i]

            # Preorder coefficient stream assembly offsets.
            sizes64 = plan.leaf_sizes.astype(np.int64)
            offsets = np.zeros(len(sizes64) + 1, np.int64)
            np.cumsum(sizes64 * sizes64, out=offsets[1:])
            total = int(offsets[-1])
            coeffs = np.empty(total, np.int32)

            for s, idx in plan.buckets().items():
                n = len(idx)
                cap = _bucket_capacity(n)
                ys = np.zeros(cap, np.int32)
                xs = np.zeros(cap, np.int32)
                ys[:n] = plan.leaf_y[idx]
                xs[:n] = plan.leaf_x[idx]
                table = self._quant_table_for(tables, i, s)
                inv_hi, inv_lo = quant.reciprocal_table(table)
                vecs = np.asarray(_encode_bucket(
                    norm, jnp.asarray(ys), jnp.asarray(xs),
                    jnp.asarray(inv_hi), jnp.asarray(inv_lo),
                    size=int(s), h=lh, w=lw))[:n]
                # scatter bucket rows into the preorder stream
                starts = offsets[idx]
                flat_idx = (starts[:, None]
                            + np.arange(s * s, dtype=np.int64)[None, :])
                coeffs[flat_idx.ravel()] = vecs.ravel()

            states_bytes, bits_len = qt.pack_states(plan.states)
            writer.add_layer(LayerPayload(
                bits_len=bits_len, root_size=plan.root_size,
                states_bytes=states_bytes, coeffs=coeffs))

        return writer.tobytes()

    # ------------------------------------------------------------- decode
    def decompress(self, data: bytes) -> ImageData:
        reader = ContainerReader(data)
        meta = reader.metadata
        cfg = CodecConfig(color_space=meta.color_space,
                          quality_range=(meta.quality_min, meta.quality_max),
                          block_size_range=(meta.block_size_min,
                                            meta.block_size_max))
        self.config = cfg
        self.extension = meta.extension
        h, w = meta.height, meta.width
        layer_shapes = cfg.layer_shapes((h, w))
        mids, scales = color.normalization_constants(cfg.color_space)
        tables = self._quant_tables()

        up_layers = []
        for i in range(3):
            payload = reader.read_layer()
            lh, lw = layer_shapes[i]
            states = qt.unpack_states(payload.states_bytes, payload.bits_len)
            sizes, ys, xs = qt.replay_positions(states, payload.root_size,
                                                lh, lw)

            offsets = np.zeros(len(sizes) + 1, np.int64)
            np.cumsum(sizes.astype(np.int64) ** 2, out=offsets[1:])
            coeffs = payload.coeffs

            canvas = jnp.zeros((payload.root_size, payload.root_size),
                               jnp.float32)
            for s in np.unique(sizes):
                idx = np.nonzero(sizes == s)[0]
                n = len(idx)
                cap = _bucket_capacity(n)
                vecs = np.zeros((cap, int(s) * int(s)), np.int32)
                starts = offsets[idx]
                flat_idx = (starts[:, None]
                            + np.arange(int(s) ** 2, dtype=np.int64)[None, :])
                vecs[:n] = coeffs[flat_idx.ravel()].reshape(n, -1)
                table = self._quant_table_for(tables, i, int(s))
                blocks = _decode_bucket(jnp.asarray(vecs),
                                        jnp.asarray(table), size=int(s))
                # padded rows get origin == root -> dropped by the scatter
                by = np.full(cap, payload.root_size, np.int32)
                bx = np.full(cap, payload.root_size, np.int32)
                by[:n] = ys[idx]
                bx[:n] = xs[idx]
                canvas = _paint_bucket(canvas, blocks, jnp.asarray(by),
                                       jnp.asarray(bx),
                                       root=int(payload.root_size),
                                       size=int(s))

            layer = canvas[:lh, :lw] / scales[i] + mids[i]
            up = resize.resize2d(layer, (h, w), "linear")
            up_layers.append(up)

        stacked = jnp.stack(up_layers, axis=-1)
        rgb = color.convert(cfg.color_space, "sRGB", stacked)
        out = np.asarray(rgb, np.float32)
        return ImageData(out, (h, w, 3), meta.extension)


@functools.partial(jax.jit, static_argnames=("space", "layer_shapes"))
def _color_and_downsample(rgb: jnp.ndarray, space: str,
                          layer_shapes: Tuple[Tuple[int, int], ...]):
    """sRGB (H, W, 3) -> tuple of downsampled layers (reference order:
    convert (src/jpeg/jpeg.py:262-264) then per-layer INTER_AREA resize
    (src/jpeg/jpeg.py:323-338))."""
    converted = color.convert("sRGB", space, rgb)
    layers = []
    for i, (lh, lw) in enumerate(layer_shapes):
        layers.append(resize.resize2d(converted[..., i], (lh, lw), "area"))
    return tuple(layers)
