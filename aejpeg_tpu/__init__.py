"""aejpeg_tpu — a TPU-native adaptive edge-aware JPEG-like batch image codec.

Brand-new JAX/XLA/Pallas implementation of the capabilities of
fevzibabaoglu/adaptive-edge-aware-jpeg: edge-aware quadtree block
partitioning (4x4..128x128), 7 selectable internal color spaces,
size-interpolated quantization quality, and a self-describing `.ajpg`
container — redesigned as a batched, bucketed, dense-tensor pipeline for TPU
meshes instead of a per-image, per-block CPU loop.
"""

__version__ = "0.1.0"

from .config import CodecConfig, COLOR_SPACE_SETTINGS, LUMA_QUANT, CHROMA_QUANT
from .color import convert, apply_normalization, get_color_spaces

__all__ = [
    "CodecConfig", "COLOR_SPACE_SETTINGS", "LUMA_QUANT", "CHROMA_QUANT",
    "convert", "apply_normalization", "get_color_spaces",
    "Codec",
]


def __getattr__(name):
    # Lazy import of the heavy pipeline module.
    if name == "Codec":
        from .codec.pipeline import Codec
        return Codec
    raise AttributeError(name)
