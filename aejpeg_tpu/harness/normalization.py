"""Normalization-constant derivation (reference AColorNormalization parity:
test/analysis/color_normalization.py:25-52).

Sweeps the full 256^3 sRGB lattice through each color space on device and
prints/returns (midpoint, scale) per channel:
midpoint = (min + max) / 2, scale = 127 / max_abs_deviation.
The shipped constants in color/constants.py were derived this way.
"""

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import color


def derive_constants(chunk: int = 1 << 18,
                     spaces=None) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    spaces = spaces or color.get_color_spaces()
    v = np.arange(256, dtype=np.float32) / 255.0
    out = {}
    for space in spaces:
        fn = jax.jit(color.REGISTRY[space].from_srgb)
        mins = np.full(3, np.inf, np.float32)
        maxs = np.full(3, -np.inf, np.float32)
        # stream the lattice in chunks (full lattice = 16.7M px)
        rr, gg = np.meshgrid(v, v, indexing="ij")
        base = np.stack([rr.ravel(), gg.ravel()], axis=-1)  # (65536, 2)
        for b in v:
            rgb = np.concatenate(
                [base, np.full((base.shape[0], 1), b, np.float32)], axis=-1)
            x = np.asarray(fn(rgb))
            mins = np.minimum(mins, x.min(axis=0))
            maxs = np.maximum(maxs, x.max(axis=0))
        mid = (mins + maxs) / 2
        max_abs = np.maximum(np.abs(mins - mid), np.abs(maxs - mid))
        scale = 127.0 / max_abs
        out[space] = (mid, scale)
    return out


def main():
    for space, (mid, scale) in derive_constants().items():
        print(space)
        for c in range(3):
            print(f"  ({mid[c]!r}, {scale[c]!r})")


if __name__ == "__main__":
    main()
