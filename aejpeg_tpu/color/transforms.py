"""Color transforms as pure, fused jnp functions.

TPU-first design: every transform maps (..., 3) float32 -> (..., 3) float32 as
a chain of elementwise ops and 3x3 contractions, so XLA fuses the whole
conversion into a handful of vectorized kernels over arbitrarily batched
pixels.  There is no per-pixel loop anywhere (the reference uses Numba prange
loops for ICtCp/ICaCb/JzAzBz: src/color/ictcp.py:27-137 etc.).

Functional parity targets (same round-trip bound as the reference test
test/unit_tests/test_color_conversions.py:64-68): max & mean abs error < 1e-4
over the sRGB lattice.

Numerical-safety deviations (documented, value-preserving on valid inputs):
fractional powers clamp their base to >= 0 (the reference's numba fastmath
kernels would produce NaN on negative bases; valid sRGB-gamut inputs never
hit that branch).
"""

import functools
import math

import jax.numpy as jnp
import numpy as np

from . import constants as C
from ..ops import dfloat as dfl


def _dot3(x, m):
    """(..., 3) @ m.T with float32 accumulation (3x3 is VPU-sized; HIGHEST
    keeps fp32 exactness on MXU if XLA routes it there)."""
    return jnp.einsum("...i,ji->...j", x, jnp.asarray(m),
                      precision="highest")


# --------------------------------------------------------------- sRGB <-> lin
def srgb_to_linear(v):
    """Inverse sRGB transfer function (reference src/color/common.py:34-60)."""
    v = jnp.asarray(v, jnp.float32)
    lin = jnp.where(v <= 0.04045,
                    v / 12.92,
                    ((jnp.maximum(v, 0.04045) + 0.055) / 1.055) ** 2.4)
    return lin.astype(jnp.float32)


def linear_to_srgb(v):
    """Forward sRGB transfer + clip to [0,1] (src/color/common.py:62-92)."""
    v = jnp.asarray(v, jnp.float32)
    srgb = jnp.where(v <= 0.0031308,
                     v * 12.92,
                     1.055 * jnp.maximum(v, 0.0031308) ** (1.0 / 2.4) - 0.055)
    return jnp.clip(srgb, 0.0, 1.0).astype(jnp.float32)


# ------------------------------------------------------------------------- PQ
#
# The PQ transfer function is evaluated in double-float32: its m2 exponent
# (78.84, or 134.03 for JzAzBz) amplifies plain-f32 rounding ~100x, which
# breaks the reference's 1e-4 round-trip bound (the reference gets f64 for
# free from Numba type promotion, src/color/common.py:94-159; TPUs have no
# f64, so we carry (hi, lo) f32 pairs instead).

def _pq_inverse_df(y_df, m2):
    """Luminance -> PQ signal, df32 in / df32 out (see pq_inverse_eotf)."""
    yhi, ylo = y_df
    clamp = yhi < np.float32(1e-30)
    hi = jnp.maximum(yhi, np.float32(1e-30))
    lo = jnp.where(clamp, 0.0, ylo)
    w = dfl.df_mul((hi, lo), dfl.df_const_like(1.0 / C.PQ_LP, hi))
    t = dfl.df_pow(w, dfl.df_const_like(C.PQ_M1, hi))
    num = dfl.df_add(dfl.df_const_like(C.PQ_C1, hi),
                     dfl.df_mul_f32(t, np.float32(C.PQ_C2)))
    den = dfl.df_add(dfl.df(jnp.ones_like(hi)),
                     dfl.df_mul_f32(t, np.float32(C.PQ_C3)))
    e = dfl.df_pow(dfl.df_div(num, den), dfl.df_const_like(m2, hi))
    z_hi, z_lo = dfl.df_const(float(C.PQ_C1) ** m2)
    mask = yhi <= 0.0
    return (jnp.where(mask, z_hi, e[0]).astype(jnp.float32),
            jnp.where(mask, z_lo, e[1]).astype(jnp.float32))


def pq_inverse_eotf(y, m2=C.PQ_M2):
    """Luminance -> PQ signal (src/color/common.py:131-159).

    y <= 0 maps to (c1/1)**m2, matching the reference's behavior at 0.
    Negative inputs are clamped to 0 (the reference's fastmath kernels would
    produce NaN; valid in-gamut inputs never go negative)."""
    y = jnp.asarray(y, jnp.float32)
    return dfl.df_to_f32(_pq_inverse_df(dfl.df(y), m2)).astype(jnp.float32)


def _pq_eotf_df(e_df, m2):
    """PQ signal -> luminance, df32 in / df32 out (see pq_eotf)."""
    ehi, elo = e_df
    clamp = ehi < np.float32(1e-30)
    hi = jnp.maximum(ehi, np.float32(1e-30))
    lo = jnp.where(clamp, 0.0, elo)
    lne = dfl.df_log((hi, lo))
    u = dfl.df_exp(dfl.df_mul(lne, dfl.df_const_like(1.0 / m2, hi)))
    num = dfl.df_add(u, dfl.df_const_like(-C.PQ_C1, hi))
    den = dfl.df_add(dfl.df_const_like(C.PQ_C2, hi),
                     dfl.df_mul_f32(u, np.float32(-C.PQ_C3)))
    nonpos = (ehi <= 0.0) | (num[0] <= 0.0)
    num = (jnp.where(nonpos, 1.0, num[0]), jnp.where(nonpos, 0.0, num[1]))
    den_bad = den[0] <= 0.0
    den = (jnp.where(den_bad, np.float32(1e-12), den[0]),
           jnp.where(den_bad, 0.0, den[1]))
    t = dfl.df_div(num, den)
    lny = dfl.df_add(dfl.df_mul(dfl.df_log(t),
                                dfl.df_const_like(1.0 / C.PQ_M1, hi)),
                     dfl.df_const_like(math.log(C.PQ_LP), hi))
    y = dfl.df_exp(lny)
    return (jnp.where(nonpos, 0.0, y[0]).astype(jnp.float32),
            jnp.where(nonpos, 0.0, y[1]).astype(jnp.float32))


def pq_eotf(e, m2=C.PQ_M2):
    """PQ signal -> luminance, with the reference's clamps
    (src/color/common.py:94-129): num < 0 -> 0, den <= 0 -> 1e-12."""
    e = jnp.asarray(e, jnp.float32)
    return dfl.df_to_f32(_pq_eotf_df(dfl.df(e), m2)).astype(jnp.float32)


def _dot3_df(x_df, m64: np.ndarray):
    """df32 (..., 3) x f64 3x3 matrix -> df32 (..., 3); each constant is
    carried as a (hi, lo) f32 pair, products/sums error-compensated."""
    hi, lo = x_df
    outs = []
    for j in range(3):
        acc = None
        for i in range(3):
            c = dfl.df_const_like(float(m64[j, i]), hi[..., i])
            term = dfl.df_mul((hi[..., i], lo[..., i]), c)
            acc = term if acc is None else dfl.df_add(acc, term)
        outs.append(acc)
    return (jnp.stack([o[0] for o in outs], axis=-1),
            jnp.stack([o[1] for o in outs], axis=-1))


@functools.lru_cache(maxsize=None)
def _f64_pair(name: str):
    """(M, M^-1) of a constants.py 3x3 matrix, inverted in FLOAT64 — the
    f32-LAPACK inverses cost ~1 decimal digit that the PQ exponent then
    amplifies past the 1e-4 round-trip bound on a handful of lattice
    points."""
    m64 = getattr(C, name).astype(np.float64)
    return m64, np.linalg.inv(m64)


# ------------------------------------------------------------------ 3x3 spaces
def srgb_to_ycbcr(rgb):
    return _dot3(rgb, C.M_SRGB_TO_YCBCR)


def ycbcr_to_srgb(ycc):
    return jnp.clip(_dot3(ycc, C.M_YCBCR_TO_SRGB), 0.0, 1.0)


def srgb_to_ycocg(rgb):
    return _dot3(rgb, C.M_SRGB_TO_YCOCG)


def ycocg_to_srgb(x):
    return jnp.clip(_dot3(x, C.M_YCOCG_TO_SRGB), 0.0, 1.0)


def srgb_to_ycocg_r(rgb):
    return _dot3(rgb, C.M_SRGB_TO_YCOCG_R)


def ycocg_r_to_srgb(x):
    return jnp.clip(_dot3(x, C.M_YCOCG_R_TO_SRGB), 0.0, 1.0)


def srgb_to_xyz(rgb):
    return _dot3(srgb_to_linear(rgb), C.M_LINEAR_RGB_TO_XYZ)


def xyz_to_srgb(xyz):
    return linear_to_srgb(_dot3(xyz, C.M_XYZ_TO_LINEAR_RGB))


# ---------------------------------------------------------------------- OKLAB
def srgb_to_oklab(rgb):
    xyz = srgb_to_xyz(rgb)
    lms = _dot3(xyz, C.OKLAB_M_XYZ_TO_LMS)
    lms_p = jnp.cbrt(lms)
    return _dot3(lms_p, C.OKLAB_M_LMSP_TO_LAB)


def oklab_to_srgb(lab):
    lms_p = _dot3(lab, C.OKLAB_M_LAB_TO_LMSP)
    lms = lms_p ** 3
    xyz = _dot3(lms, C.OKLAB_M_LMS_TO_XYZ)
    return xyz_to_srgb(xyz)


# ---------------------------------------------------------------------- ICtCp
def srgb_to_ictcp(rgb):
    """XYZ -> LMS -> PQ -> ICtCp entirely in df32 (rounded once at the
    output): the PQ exponent amplifies any f32 matmul rounding past the
    reference's 1e-4 full-lattice round-trip bound."""
    xyz = srgb_to_xyz(rgb)
    m_lms, _ = _f64_pair("ICTCP_M_XYZ_TO_LMS")
    m_ict, _ = _f64_pair("ICTCP_M_LMSP_TO_ICTCP")
    lms = _dot3_df(dfl.df(jnp.asarray(xyz, jnp.float32)), m_lms)
    lms_p = _pq_inverse_df(lms, C.PQ_M2)
    return dfl.df_to_f32(_dot3_df(lms_p, m_ict)).astype(jnp.float32)


def ictcp_to_srgb(ictcp):
    m_lms, m_lms_inv = _f64_pair("ICTCP_M_XYZ_TO_LMS")
    _, m_ict_inv = _f64_pair("ICTCP_M_LMSP_TO_ICTCP")
    lms_p = _dot3_df(dfl.df(jnp.asarray(ictcp, jnp.float32)), m_ict_inv)
    lms = _pq_eotf_df(lms_p, C.PQ_M2)
    xyz = dfl.df_to_f32(_dot3_df(lms, m_lms_inv)).astype(jnp.float32)
    return xyz_to_srgb(xyz)


# ---------------------------------------------------------------------- ICaCb
def srgb_to_icacb(rgb):
    xyz = srgb_to_xyz(rgb)
    rgb_bar = _dot3(xyz, C.ICACB_M_XYZ_TO_RGBBAR)
    rgb_p = pq_inverse_eotf(rgb_bar)
    return _dot3(rgb_p, C.ICACB_M_RGBP_TO_ICACB)


def icacb_to_srgb(icacb):
    rgb_p = _dot3(icacb, C.ICACB_M_ICACB_TO_RGBP)
    rgb_bar = pq_eotf(rgb_p)
    xyz = _dot3(rgb_bar, C.ICACB_M_RGBBAR_TO_XYZ)
    return xyz_to_srgb(xyz)


# --------------------------------------------------------------------- JzAzBz
def srgb_to_jzazbz(rgb):
    xyz = srgb_to_xyz(rgb)
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    xp = C.JZAZBZ_B * x - (C.JZAZBZ_B - 1.0) * z
    yp = C.JZAZBZ_G * y - (C.JZAZBZ_G - 1.0) * x
    xyz_p = jnp.stack([xp, yp, z], axis=-1)
    lms = _dot3(xyz_p, C.JZAZBZ_M_XYZ_TO_LMS)
    lms_p = pq_inverse_eotf(lms, m2=C.JZAZBZ_P)
    izazbz = _dot3(lms_p, C.JZAZBZ_M_LMSP_TO_IZAZBZ)
    iz = izazbz[..., 0]
    jz = ((1.0 + C.JZAZBZ_D) * iz) / (1.0 + C.JZAZBZ_D * iz) - C.JZAZBZ_D0
    return jnp.stack([jz, izazbz[..., 1], izazbz[..., 2]], axis=-1)


def jzazbz_to_srgb(jab):
    jz, az, bz = jab[..., 0], jab[..., 1], jab[..., 2]
    jz0 = jz + C.JZAZBZ_D0
    iz = jz0 / (1.0 + C.JZAZBZ_D - C.JZAZBZ_D * jz0)
    izazbz = jnp.stack([iz, az, bz], axis=-1)
    lms_p = _dot3(izazbz, C.JZAZBZ_M_IZAZBZ_TO_LMSP)
    lms = pq_eotf(lms_p, m2=C.JZAZBZ_P)
    xyz_p = _dot3(lms, C.JZAZBZ_M_LMS_TO_XYZ)
    xp, yp, zp = xyz_p[..., 0], xyz_p[..., 1], xyz_p[..., 2]
    x = (xp + (C.JZAZBZ_B - 1.0) * zp) / C.JZAZBZ_B
    y = (yp + (C.JZAZBZ_G - 1.0) * x) / C.JZAZBZ_G
    xyz = jnp.stack([x, y, zp], axis=-1)
    return xyz_to_srgb(xyz)
