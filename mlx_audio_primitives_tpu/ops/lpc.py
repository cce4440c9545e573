"""Linear prediction coefficients (Burg's method).

Beyond-parity feature (the reference has no LPC; librosa.lpc is the
semantic model — same Burg recursion, same ``[1, a_1, ..., a_order]``
output convention with leading 1).

TPU-native design: librosa's Burg loop shrinks the forward/backward
prediction-error arrays by one sample per order step — dynamic shapes that
XLA cannot compile. Here the recursion runs under ``lax.fori_loop`` with
FIXED-shape arrays and a shrinking validity mask instead:

* ``fwd``/``bwd`` keep their full ``N-1`` length; step ``i`` masks to the
  first ``N-1-i`` entries;
* librosa's ``fwd = fwd_new[1:]`` becomes a left roll (the mask absorbs
  the wrapped element), ``bwd = bwd_new[:-1]`` is just the tightened mask;
* the Levinson-style coefficient update ``a[j] += r * a_prev[i+1-j]``
  is a dynamic-shift reversed read of the fixed ``(order+1,)`` vector.

The whole recursion is one jitted program over ``order`` steps, batched
over leading axes (every frame/channel solves its own LPC concurrently on
the VPU — no per-signal host loop).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .._config import REAL_DTYPE
from ..utils.validation import validate_positive

ArrayLike = Any


@partial(jax.jit, static_argnames=("order",))
def _lpc_burg(y: jax.Array, *, order: int) -> jax.Array:
    B, N = y.shape
    M = N - 1  # prediction-error array length
    fwd0 = y[:, 1:]
    bwd0 = y[:, :-1]
    den0 = jnp.sum(fwd0 * fwd0 + bwd0 * bwd0, axis=-1)
    ar0 = jnp.zeros((B, order + 1), REAL_DTYPE).at[:, 0].set(1.0)
    t = jnp.arange(M)
    j = jnp.arange(order + 1)
    tiny = jnp.asarray(np.finfo(np.float32).tiny, REAL_DTYPE)

    def body(i, carry):
        ar, fwd, bwd, den = carry
        n_valid = M - i
        mask = (t < n_valid).astype(REAL_DTYPE)
        num = jnp.sum(mask * bwd * fwd, axis=-1)
        reflect = -2.0 * num / jnp.where(jnp.abs(den) < tiny, tiny, den)
        reflect = jnp.where(jnp.abs(den) < tiny, 0.0, reflect)[:, None]
        # a[j] = a_prev[j] + r * a_prev[i+1-j]  for j = 1..i+1
        # reversed read: a_prev[i+1-j] = flip(a_prev)[j + order-i-1]
        rev = jnp.roll(jnp.flip(ar, axis=-1), -(order - 1 - i), axis=-1)
        upd = (j >= 1) & (j <= i + 1)
        ar = jnp.where(upd[None, :], ar + reflect * rev, ar)
        fwd_new = fwd + reflect * bwd
        bwd_new = bwd + reflect * fwd
        # den' = (1-r^2) den - fwd_new[first]^2 - bwd_new[last_valid]^2
        last = jnp.take_along_axis(
            bwd_new, jnp.full((B, 1), n_valid - 1), axis=-1
        )[:, 0]
        den = (1.0 - reflect[:, 0] ** 2) * den - fwd_new[:, 0] ** 2 - last**2
        fwd = jnp.roll(fwd_new, -1, axis=-1)
        return ar, fwd, bwd_new, den

    ar, _, _, _ = jax.lax.fori_loop(0, order, body, (ar0, fwd0, bwd0, den0))
    return ar


def lpc(y: ArrayLike, order: int, axis: int = -1) -> jax.Array:
    """LPC coefficients ``[1, a_1, ..., a_order]`` via Burg's method.

    librosa `lpc` semantics: minimizes combined forward+backward
    prediction error; the returned polynomial is the denominator of the
    all-pole model ``1 / A(z)`` (scipy.signal.lfilter convention).
    Output shape: input shape with ``axis`` replaced by ``order + 1``.
    """
    validate_positive(order, "order")
    y = jnp.asarray(y, dtype=REAL_DTYPE)
    if y.ndim == 0:
        raise ValueError("lpc expects at least a 1-D signal")
    y = jnp.moveaxis(y, axis, -1)
    if y.shape[-1] <= order:
        raise ValueError(
            f"signal length along axis ({y.shape[-1]}) must exceed order "
            f"({order})"
        )
    lead = y.shape[:-1]
    ar = _lpc_burg(y.reshape(-1, y.shape[-1]), order=order)
    ar = ar.reshape(*lead, order + 1)
    return jnp.moveaxis(ar, -1, axis)


__all__ = ["lpc"]
