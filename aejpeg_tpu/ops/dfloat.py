"""Double-float32 ("df32") arithmetic for TPU.

TPUs have no native float64; the reference implementation silently relies on
float64 (Numba promotes scalar math to f64 inside its njit color kernels, e.g.
src/color/common.py:94-159, src/color/ictcp.py:27-137).  The PQ transfer
function's huge exponent (m2 = 78.84, JzAzBz p = 134.03) amplifies float32
rounding by ~2 orders of magnitude, which breaks the reference's 1e-4
round-trip bound.  This module provides the classic error-free-transformation
(Dekker/Knuth) double-float arithmetic over pairs of float32, entirely with
VPU-friendly elementwise ops, giving ~1e-14 relative precision where the
codec's color math needs it.

All functions operate on (hi, lo) tuples of same-shape jnp arrays and are
fully jit/vmap-compatible.
"""

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax

DF = Tuple[jnp.ndarray, jnp.ndarray]

_SPLIT = np.float32(4097.0)  # 2**12 + 1 for the 24-bit f32 mantissa

# ------------------------------------------------------- constants as pairs

def df_const(x: float) -> Tuple[np.float32, np.float32]:
    """Split a python float (f64) into a (hi, lo) float32 pair."""
    hi = np.float32(x)
    lo = np.float32(x - float(hi))
    return hi, lo


LN2 = df_const(math.log(2.0))


# -------------------------------------------------- error-free transforms

def two_sum(a, b):
    # The barrier pins s to the *rounded* sum so XLA's algebraic simplifier
    # cannot cancel the compensation terms ((a+b)-a -> b destroys the EFT).
    s = lax.optimization_barrier(a + b)
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def quick_two_sum(a, b):
    """Requires |a| >= |b| (or a == 0)."""
    s = lax.optimization_barrier(a + b)
    err = b - (s - a)
    return s, err


def _split(a):
    t = _SPLIT * a
    hi = t - (t - a)
    lo = a - hi
    return hi, lo


def two_prod(a, b):
    """Contraction-immune Dekker product.

    The textbook formulation (err = ah*bh - p + ...) breaks under backend FMA
    contraction: LLVM/Mosaic may rewrite `x - a*b` into fma(-a, b, x), which
    uses the *unrounded* product and silently zeroes the error term
    (optimization_barrier does not help — XLA expands barriers before
    codegen).  Instead we never form the rounded full product: the four
    partial products of the 12-bit splits are exactly representable in f32,
    so FMA contraction is value-preserving, and they are combined with
    add-only error-free transforms.
    """
    ah, al = _split(a)
    bh, bl = _split(b)
    p1 = ah * bh        # exact (24-bit significand)
    p2 = ah * bl        # exact
    p3 = al * bh        # exact
    p4 = al * bl        # exact
    s, e1 = two_sum(p1, p2)
    s, e2 = two_sum(s, p3)
    err = e1 + e2 + p4  # eps^2-level terms; their rounding is eps^3
    return quick_two_sum(s, err)


# ------------------------------------------------------------- df algebra

def df(x) -> DF:
    x = jnp.asarray(x, jnp.float32)
    return x, jnp.zeros_like(x)


def df_neg(a: DF) -> DF:
    return -a[0], -a[1]


def df_add(a: DF, b: DF) -> DF:
    s, e = two_sum(a[0], b[0])
    e = e + a[1] + b[1]
    return quick_two_sum(s, e)


def df_sub(a: DF, b: DF) -> DF:
    return df_add(a, df_neg(b))


def df_mul(a: DF, b: DF) -> DF:
    p, e = two_prod(a[0], b[0])
    e = e + (a[0] * b[1] + a[1] * b[0])
    return quick_two_sum(p, e)


def df_mul_f32(a: DF, b) -> DF:
    p, e = two_prod(a[0], b)
    e = e + a[1] * b
    return quick_two_sum(p, e)


def df_div(a: DF, b: DF) -> DF:
    q1 = a[0] / b[0]
    r = df_add(a, df_neg(df_mul_f32(b, q1)))
    q2 = (r[0] + r[1]) / b[0]
    return quick_two_sum(q1, q2)


# -------------------------------------------------------------- df exp/log

# exp(r) Taylor coefficients 1/k! as df constants (k = 2..12).
_INV_FACT = [df_const(1.0 / math.factorial(k)) for k in range(2, 13)]


def df_exp(a: DF) -> DF:
    """exp(a) for |a| up to ~80, ~1e-13 relative accuracy.

    Range-reduce a = k*ln2 + r with |r| <= ln2/2, evaluate the Taylor series
    of exp(r) in df arithmetic, and scale by 2**k exactly.
    """
    k = jnp.round(a[0] / np.float32(math.log(2.0)))
    # r = a - k*ln2 in df
    kl = df_mul_f32((jnp.full_like(a[0], LN2[0]), jnp.full_like(a[0], LN2[1])), k)
    r = df_add(a, df_neg(kl))

    # exp(r) = 1 + r + sum_{k>=2} r^k/k!
    p = df_mul(r, r)  # r^2
    s = df_add(df_add(df(jnp.ones_like(r[0])), r),
               df_mul_f32(p, np.float32(0.5)))
    for c in _INV_FACT[1:]:
        p = df_mul(p, r)
        term = df_mul(p, (jnp.full_like(p[0], c[0]), jnp.full_like(p[0], c[1])))
        s = df_add(s, term)

    # Exact 2**k via exponent bits: jnp.exp2 is an approximation on some
    # backends (XLA CPU returns 2**-26 with ~1e-6 relative error!).
    # k < -126 underflows f32 normals -> flush to 0; k > 127 -> inf.
    ki = jnp.clip(k, -126.0, 127.0).astype(jnp.int32)
    scale = lax.bitcast_convert_type(((ki + 127) << 23).astype(jnp.int32),
                                     jnp.float32)
    hi = jnp.where(k < -126.0, 0.0, s[0] * scale)
    hi = jnp.where(k > 127.0, jnp.inf, hi)
    lo = jnp.where((k < -126.0) | (k > 127.0), 0.0, s[1] * scale)
    return hi.astype(jnp.float32), lo.astype(jnp.float32)


def df_log(a: DF) -> DF:
    """log(a) for a > 0 via one Newton refinement of the f32 intrinsic:
    log(a) = l0 + log(a * exp(-l0)), where the residual is ~1e-7 so a single
    df-evaluated log1p(rho) ~= rho - rho^2/2 completes the precision."""
    l0 = jnp.log(a[0])
    w = df_mul(a, df_exp(df((-l0))))
    rho = df_add(w, df((-jnp.ones_like(l0))))
    corr = df_add(rho, df((-0.5) * rho[0] * rho[0]))
    return df_add((l0, jnp.zeros_like(l0)), corr)


def df_pow(a: DF, p: DF) -> DF:
    """a**p for a > 0."""
    return df_exp(df_mul(df_log(a), p))


def df_to_f32(a: DF) -> jnp.ndarray:
    return a[0] + a[1]


def df_const_like(x: float, like) -> DF:
    """Broadcast a python-float constant to a df pair shaped like `like`."""
    hi, lo = df_const(x)
    return jnp.full_like(like, hi), jnp.full_like(like, lo)
