"""Pallas TPU kernels for the codec's hot ops.

Currently: 256-bin histograms (CLAHE tiles + Canny percentile thresholds).
XLA alternatives are pathological on TPU: scatter-add serializes updates and
a one-hot compare materializes (tiles, N, 256) in HBM.  The kernel keeps a
tile in VMEM and reduces 256 compare-sums on the VPU — one HBM read of the
data, no gathers/scatters.

Falls back to interpret mode off-TPU so unit tests run on the CPU backend.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


_CHUNK = 128


def _hist_kernel(vals_ref, hist_ref):
    """(T, N) int32 values (whole array in VMEM) -> (T, 256) histograms.

    Chunked one-hot compare-sums: each fori step broadcasts a (T, 128) value
    chunk against all 256 bins in registers and accumulates — no gathers, no
    scatters, no dynamic stores (Mosaic requires 128-aligned dynamic column
    indices, so per-bin column writes are not lowerable)."""
    t, n = vals_ref.shape
    bins = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 256), 2)

    def body(i, acc):
        chunk = vals_ref[:, pl.ds(i * _CHUNK, _CHUNK)]       # (T, C)
        eq = (chunk[:, :, None] == bins).astype(jnp.int32)   # (T, C, 256)
        return acc + jnp.sum(eq, axis=1)

    hist = jax.lax.fori_loop(0, n // _CHUNK, body,
                             jnp.zeros((t, 256), jnp.int32))
    hist_ref[:] = hist


def histogram256(values: jnp.ndarray) -> jnp.ndarray:
    """(T, N) int32 values in [0, 255] -> (T, 256) int32 histograms.
    N is padded to a chunk multiple with -1 (never counted)."""
    t, n = values.shape
    pad = (-n) % _CHUNK
    if pad:
        values = jnp.pad(values, ((0, 0), (0, pad)), constant_values=-1)
    return pl.pallas_call(
        _hist_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, 256), jnp.int32),
        interpret=_interpret(),
    )(values)
