"""Color engine acceptance tests.

Model of the reference's exhaustive lattice round-trip test
(test/unit_tests/test_color_conversions.py:27-82): round-trip error must stay
< 1e-4 (max and mean).  On CPU CI we use a 48^3 lattice + 200k random pixels;
the full 256^3 acceptance run lives in tests/tpu/test_color_full.py (runs on
the real chip, or anywhere with AEJPEG_FULL_LATTICE=1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aejpeg_tpu import color

TOL = 1e-4


def _lattice(n=64):
    v = np.linspace(0, 255, n).round().astype(np.float32) / 255.0
    r, g, b = np.meshgrid(v, v, v, indexing="ij")
    return np.stack([r.ravel(), g.ravel(), b.ravel()], axis=-1)


@pytest.fixture(scope="module")
def grid():
    rng = np.random.default_rng(42)
    lat = _lattice(48)
    rand = (rng.integers(0, 256, size=(200_000, 3)) / 255.0).astype(np.float32)
    return np.concatenate([lat, rand], axis=0)


@pytest.mark.parametrize("space", sorted(color.REGISTRY))
def test_round_trip(space, grid):
    d = color.REGISTRY[space]
    fwd = jax.jit(d.from_srgb)
    bwd = jax.jit(d.to_srgb)
    out = np.asarray(bwd(fwd(grid)))
    err = np.abs(out - grid)
    assert err.max() < TOL, f"{space}: max {err.max():.2e}"
    assert err.mean() < TOL, f"{space}: mean {err.mean():.2e}"


@pytest.mark.parametrize("space", sorted(color.REGISTRY))
def test_normalized_range(space, grid):
    """After normalization every channel must land in roughly [-127, 127]
    (the reference derives scale = 127/max_abs over the full lattice)."""
    x = color.convert("sRGB", space, grid)
    n = np.asarray(color.apply_normalization(space, x, inverse=False))
    assert np.abs(n).max() < 127.5 + 1e-3, f"{space}: {np.abs(n).max()}"
    back = np.asarray(color.apply_normalization(space, n, inverse=True))
    np.testing.assert_allclose(back, np.asarray(x), atol=1e-5)


def test_convert_requires_srgb_endpoint():
    with pytest.raises(ValueError):
        color.convert("YCbCr", "OKLAB", np.zeros((4, 3), np.float32))
    with pytest.raises(ValueError):
        color.convert("sRGB", "nope", np.zeros((4, 3), np.float32))


def test_get_color_spaces_hides_internal():
    spaces = color.get_color_spaces()
    assert "XYZ" not in spaces and "sRGB" not in spaces
    assert set(spaces) == {"ICaCb", "ICtCp", "JzAzBz", "OKLAB", "YCbCr",
                           "YCoCg", "YCoCg-R"}


def test_batched_shapes():
    """Transforms must accept arbitrary leading batch dims (TPU batch path)."""
    x = np.random.default_rng(1).random((2, 5, 7, 3), np.float32)
    y = color.convert("sRGB", "OKLAB", x)
    assert y.shape == x.shape
    z = color.convert("OKLAB", "sRGB", y)
    assert np.abs(np.asarray(z) - x).max() < TOL
