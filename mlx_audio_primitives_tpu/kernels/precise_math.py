"""Precise float32 transcendentals for the VPU.

XLA lowers ``log``/``exp`` to fast approximations (~1e-4 relative error on
some backends), which would blow the reference's dB-conversion accuracy
budget (~4e-6, reference: `NUMERICAL_ACCURACY.md:16`). These replacements
reach ~2e-6 using exact bit-level range reduction plus short minimax-grade
polynomials — a handful of VPU flops per element, fully fusible by XLA.

* ``log10``: ``x = m * 2^e`` via frexp, then ``ln m`` from the atanh series
  ``2*(s + s^3/3 + ...)`` with ``s = (m-1)/(m+1)`` (|s| <= 1/3, so six terms
  exceed f32 precision).
* ``exp10``: ``10^x = 2^(n+f)`` with n = round(x*log2 10), ``2^f`` from a
  degree-7 Taylor/Horner evaluation of exp(f ln2) (|f| <= 0.5), scaled by
  ldexp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_LN2_F32 = np.float32(np.log(2.0))
_INV_LN10_F32 = np.float32(1.0 / np.log(10.0))
_LOG2_10_F32 = np.float32(np.log2(10.0))


def log10(x: jax.Array) -> jax.Array:
    """Accurate float32 log10 (~1.6e-6 max abs error over f32 range).

    Non-finite/edge semantics match ``jnp.log10``: +inf -> +inf, 0 -> -inf,
    negative -> nan (frexp alone would turn inf into nan via the series).
    """
    m, e = jnp.frexp(x)  # m in [0.5, 1)
    s = (m - 1.0) / (m + 1.0)
    s2 = s * s
    p = jnp.asarray(1.0 / 11.0, dtype=x.dtype)
    for c in (1.0 / 9, 1.0 / 7, 1.0 / 5, 1.0 / 3, 1.0):
        p = p * s2 + c
    ln_m = 2.0 * s * p
    out = (e.astype(x.dtype) * _LN2_F32 + ln_m) * _INV_LN10_F32
    out = jnp.where(jnp.isposinf(x), jnp.inf, out)
    out = jnp.where(x == 0, -jnp.inf, out)
    return jnp.where(x < 0, jnp.nan, out)


def exp10(x: jax.Array) -> jax.Array:
    """Accurate float32 10**x (~4e-6 max rel error in the normal range).

    Non-finite edges match ``10.0**x``: -inf -> 0, +inf -> +inf, nan -> nan
    (the range reduction alone would turn both infinities into nan — and
    -inf inputs are routine: they are ``log10(0)`` of digital silence).
    """
    t = x * _LOG2_10_F32
    n = jnp.round(t)
    f = t - n
    z = f * _LN2_F32
    p = jnp.asarray(1.0 / 5040.0, dtype=x.dtype)
    for c in (1.0 / 720, 1.0 / 120, 1.0 / 24, 1.0 / 6, 0.5, 1.0, 1.0):
        p = p * z + c
    out = jnp.ldexp(p, n.astype(jnp.int32))
    out = jnp.where(jnp.isneginf(x), 0.0, out)
    return jnp.where(jnp.isposinf(x), jnp.inf, out)
