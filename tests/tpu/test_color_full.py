"""Full 256^3-lattice color acceptance — the exact reference test
(/root/reference/test/unit_tests/test_color_conversions.py:31-33,64-68):
round-trip every public space over ALL 16.7M sRGB lattice points, max AND
mean abs error < 1e-4.

Heavy by design: runs on the real TPU (acceptance) or CPU in chunks.
Skipped in the default suite unless AEJPEG_FULL_LATTICE=1 (the CPU suite
covers a 48^3 lattice + 200k random pixels in tests/test_color.py).
"""

import os

import numpy as np
import pytest

import jax

from aejpeg_tpu import color

TOL = 1e-4
CHUNK = 1 << 21  # 2M pixels per device call

pytestmark = pytest.mark.skipif(
    os.environ.get("AEJPEG_FULL_LATTICE") != "1"
    and jax.default_backend() != "tpu",
    reason="full 256^3 lattice run is the TPU acceptance test; "
           "set AEJPEG_FULL_LATTICE=1 to force on CPU")


def _full_lattice() -> np.ndarray:
    v = (np.arange(256, dtype=np.float32) / 255.0)
    r, g, b = np.meshgrid(v, v, v, indexing="ij")
    return np.stack([r.ravel(), g.ravel(), b.ravel()], axis=-1)


@pytest.fixture(scope="module")
def lattice():
    return _full_lattice()


@pytest.mark.parametrize("space", sorted(color.REGISTRY))
def test_full_lattice_round_trip(space, lattice):
    d = color.REGISTRY[space]
    fwd = jax.jit(d.from_srgb)
    bwd = jax.jit(d.to_srgb)
    max_err = 0.0
    sum_err = 0.0
    n = lattice.shape[0]
    for off in range(0, n, CHUNK):
        chunk = lattice[off:off + CHUNK]
        out = np.asarray(bwd(fwd(chunk)))
        err = np.abs(out - chunk)
        max_err = max(max_err, float(err.max()))
        sum_err += float(err.sum())
    mean_err = sum_err / (n * 3)
    assert max_err < TOL, f"{space}: max {max_err:.3e}"
    assert mean_err < TOL, f"{space}: mean {mean_err:.3e}"
