"""Is separable DCT bit-identical across (N,s,s) vs (P,gh,s,gw,s) einsum
layouts?  Decides whether the dense stage_b can match the per-image Codec
coefficient-for-coefficient."""

import os
import sys

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

sys.path.insert(0, "/root/repo")
from aejpeg_tpu.ops import dct

print("platform:", jax.devices()[0].platform)

rng = np.random.default_rng(0)
P, PH, PW = 6, 256, 384
planes = rng.standard_normal((P, PH, PW), np.float32) * 127


def sep_blocks(blocks, d):
    # (N, s, s) separable
    y = jnp.einsum("km,nmj->nkj", d, blocks, precision="highest")
    return jnp.einsum("nkj,lj->nkl", y, d, precision="highest")


def sep_dense(pl, d, s):
    p, ph, pw = pl.shape
    gh, gw = ph // s, pw // s
    x = pl.reshape(p, gh, s, gw, s)
    y = jnp.einsum("km,pgmhn->pgkhn", d, x, precision="highest")
    return jnp.einsum("pgkhn,ln->pgkhl", y, d, precision="highest")


for s in (4, 8, 16, 32, 64):
    d = jnp.asarray(dct.dct_matrix(s))
    gh, gw = PH // s, PW // s
    blocks = jnp.asarray(
        planes.reshape(P, gh, s, gw, s).transpose(0, 1, 3, 2, 4).reshape(
            -1, s, s))
    a = np.asarray(jax.jit(sep_blocks, static_argnums=())(blocks, d))
    b4 = np.asarray(jax.jit(sep_dense, static_argnames=("s",))(
        jnp.asarray(planes), d, s=s))
    b = b4.transpose(0, 1, 3, 2, 4).reshape(-1, s, s)
    eq_sep = np.array_equal(a, b)
    md = np.abs(a - b).max()
    print(f"s={s:3d}  sep(N,s,s)==sep(dense): {eq_sep} (maxdiff {md:.3e})")
