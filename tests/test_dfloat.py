"""double-float32 arithmetic tests.

These guard against two classes of silent compiler breakage that we hit in
practice: XLA's algebraic simplifier cancelling compensation terms, and LLVM
FMA contraction replacing rounded products with exact ones.  Every test runs
the *jitted* function — the eager path was never the problem.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aejpeg_tpu.ops import dfloat as dfl


def _val(pair):
    return np.asarray(pair[0], np.float64) + np.asarray(pair[1], np.float64)


def test_two_prod_exact_under_jit():
    x = jnp.float32(np.pi)
    p, e = jax.jit(dfl.two_prod)(x, x)
    assert float(p) + float(e) == float(np.float64(x) * np.float64(x))


def test_df_mul_exact_under_jit():
    x = jnp.float32(np.pi)
    hi, lo = jax.jit(lambda u: dfl.df_mul(dfl.df(u), dfl.df(u)))(x)
    assert float(hi) + float(lo) == float(np.float64(x) ** 2)


def test_df_exp_accuracy():
    rng = np.random.default_rng(0)
    a = rng.uniform(-30, 10, 50000).astype(np.float32)
    got = _val(jax.jit(lambda v: dfl.df_exp(dfl.df(v)))(a))
    want = np.exp(a.astype(np.float64))
    assert np.abs(got / want - 1).max() < 1e-12


def test_df_log_accuracy():
    rng = np.random.default_rng(1)
    x = rng.uniform(1e-20, 100, 50000).astype(np.float32)
    got = _val(jax.jit(lambda v: dfl.df_log(dfl.df(v)))(x))
    want = np.log(x.astype(np.float64))
    assert np.abs(got - want).max() < 1e-12


def test_df_div_accuracy():
    rng = np.random.default_rng(2)
    a = rng.uniform(-100, 100, 10000).astype(np.float32)
    b = rng.uniform(0.1, 100, 10000).astype(np.float32)
    got = _val(jax.jit(lambda u, v: dfl.df_div(dfl.df(u), dfl.df(v)))(a, b))
    want = a.astype(np.float64) / b.astype(np.float64)
    assert np.abs(got - want).max() < 1e-11


@pytest.mark.parametrize("p", [2610 / 2 ** 14, 2523 / 2 ** 5,
                               1.7 * 2523 / 2 ** 5])
def test_df_pow_pq_exponents(p):
    rng = np.random.default_rng(3)
    x = rng.uniform(1e-10, 1.0, 50000).astype(np.float32)

    def f(v):
        return dfl.df_pow(dfl.df(v), dfl.df_const_like(p, v))

    got = _val(jax.jit(f)(x))
    want = x.astype(np.float64) ** p
    strict = want > 1e-20  # the codec's PQ signals live in [7e-7, 1]
    assert np.abs(got[strict] / want[strict] - 1).max() < 1e-10
    # tiny results: lo limb degrades, plain-f32 accuracy remains
    loose = (want > 1e-37) & ~strict
    if loose.any():
        assert np.abs(got[loose] / want[loose] - 1).max() < 2e-7
    under = want <= 1e-37
    if under.any():
        # below f32 normals: flushed to zero or a faithful subnormal
        assert np.all(np.abs(got[under]) <= np.maximum(2 * want[under],
                                                       1.2e-38))
