"""Color engine: registry, conversion dispatch, normalization.

API parity with the reference's `color` package (src/color/conversion.py):
`convert(from_space, to_space, data)` with sRGB as one endpoint,
`apply_normalization(space, data, inverse)`, `get_color_spaces()`.
All functions are jit-friendly and operate on (..., 3) arrays (the reference
is restricted to (N, 3)).
"""

from typing import Dict, NamedTuple, Callable, List

import jax.numpy as jnp
import numpy as np

from . import constants as C
from . import transforms as T


class ColorSpaceDef(NamedTuple):
    from_srgb: Callable
    to_srgb: Callable
    midpoints: np.ndarray  # (3,) float32
    scales: np.ndarray     # (3,) float32


REGISTRY: Dict[str, ColorSpaceDef] = {
    "ICaCb": ColorSpaceDef(T.srgb_to_icacb, T.icacb_to_srgb,
                           C.ICACB_MIDPOINTS, C.ICACB_SCALES),
    "ICtCp": ColorSpaceDef(T.srgb_to_ictcp, T.ictcp_to_srgb,
                           C.ICTCP_MIDPOINTS, C.ICTCP_SCALES),
    "JzAzBz": ColorSpaceDef(T.srgb_to_jzazbz, T.jzazbz_to_srgb,
                            C.JZAZBZ_MIDPOINTS, C.JZAZBZ_SCALES),
    "OKLAB": ColorSpaceDef(T.srgb_to_oklab, T.oklab_to_srgb,
                           C.OKLAB_MIDPOINTS, C.OKLAB_SCALES),
    "YCbCr": ColorSpaceDef(T.srgb_to_ycbcr, T.ycbcr_to_srgb,
                           C.YCBCR_MIDPOINTS, C.YCBCR_SCALES),
    "XYZ": ColorSpaceDef(T.srgb_to_xyz, T.xyz_to_srgb,
                         C.XYZ_MIDPOINTS, C.XYZ_SCALES),
    "YCoCg": ColorSpaceDef(T.srgb_to_ycocg, T.ycocg_to_srgb,
                           C.YCOCG_MIDPOINTS, C.YCOCG_SCALES),
    "YCoCg-R": ColorSpaceDef(T.srgb_to_ycocg_r, T.ycocg_r_to_srgb,
                             C.YCOCG_R_MIDPOINTS, C.YCOCG_R_SCALES),
}


def get_color_spaces() -> List[str]:
    """Public (user-selectable) spaces; sRGB and XYZ are internal endpoints
    (reference src/color/conversion.py:86-93)."""
    return sorted(set(REGISTRY) - {"XYZ"})


def convert(from_space: str, to_space: str, data) -> jnp.ndarray:
    """Convert (..., 3) data; one endpoint must be sRGB
    (reference src/color/conversion.py:95-124)."""
    spaces = set(REGISTRY) | {"sRGB"}
    if from_space not in spaces or to_space not in spaces:
        raise ValueError(f"Invalid color space: {from_space} -> {to_space}")
    if from_space != "sRGB" and to_space != "sRGB":
        raise ValueError("One of the color spaces must be sRGB.")
    if from_space == to_space:
        return jnp.asarray(data, jnp.float32)
    if from_space == "sRGB":
        return REGISTRY[to_space].from_srgb(data)
    return REGISTRY[from_space].to_srgb(data)


def normalization_constants(color_space: str):
    """(midpoints, scales) float32 (3,) arrays mapping each channel into
    ~[-127, 127]."""
    if color_space == "sRGB":
        return (np.zeros(3, np.float32), np.ones(3, np.float32))
    d = REGISTRY[color_space]
    return d.midpoints, d.scales


def apply_normalization(color_space: str, data, inverse: bool) -> jnp.ndarray:
    """(x - mid) * scale, or its inverse (reference
    src/color/conversion.py:126-157, src/color/common.py:161-189)."""
    mid, scale = normalization_constants(color_space)
    data = jnp.asarray(data, jnp.float32)
    if inverse:
        return data / scale + mid
    return (data - mid) * scale


__all__ = ["REGISTRY", "ColorSpaceDef", "get_color_spaces", "convert",
           "normalization_constants", "apply_normalization",
           "constants", "transforms"]
