"""Harmonic interpolation and salience maps.

librosa `interp_harmonics` / `salience` roles: resample a spectral
representation at integer (or fractional) multiples of its frequency
axis, and aggregate those harmonic layers into a pitch-salience map.

TPU-native: for a fixed frequency grid the linear-interpolation operator
at each harmonic is STATIC — a (gather index, lerp weight) pair computed
once on the host per (grid, harmonic) and applied on device as two
gathers + one fused multiply-add, batched over every frame and batch
axis. No per-frame interpolation calls.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .._config import REAL_DTYPE

ArrayLike = Any


@lru_cache(maxsize=32)
def _interp_plan(freqs_key: tuple, harmonics_key: tuple):
    """(idx_lo, w_hi, valid) arrays, shape (n_h, n_bins), host-built."""
    freqs = np.asarray(freqs_key, dtype=np.float64)
    harmonics = np.asarray(harmonics_key, dtype=np.float64)
    n = len(freqs)
    targets = harmonics[:, None] * freqs[None, :]  # (n_h, n)
    idx_hi = np.searchsorted(freqs, targets)  # first freq >= target
    idx_hi = np.clip(idx_hi, 1, n - 1)
    idx_lo = idx_hi - 1
    span = freqs[idx_hi] - freqs[idx_lo]
    span = np.where(span <= 0, 1.0, span)
    w_hi = (targets - freqs[idx_lo]) / span
    valid = (targets >= freqs[0]) & (targets <= freqs[-1])
    return (
        idx_lo.astype(np.int32),
        w_hi.astype(np.float32),
        valid,
    )


def interp_harmonics(
    x: ArrayLike,
    freqs: ArrayLike,
    harmonics: ArrayLike = (1, 2, 3, 4),
    fill_value: float = 0.0,
) -> jax.Array:
    """Resample ``x`` at harmonic multiples of its frequency axis:
    ``(n_harmonics, ..., n_bins, F)``.

    ``out[h, ..., k, t] = x[..., freq -> harmonics[h] * freqs[k], t]``
    (linear interpolation along the frequency axis, ``fill_value``
    outside the grid). librosa `interp_harmonics` semantics with
    ``kind='linear'``; the interpolation operator is precomputed per
    (grid, harmonic) and applied as static gathers.
    """
    x = jnp.asarray(x, dtype=REAL_DTYPE)
    if x.ndim < 2:
        raise ValueError(
            f"interp_harmonics expects (..., n_bins, F) input, got {x.ndim}-D"
        )
    f = np.asarray(freqs, dtype=np.float64)
    if f.ndim != 1 or f.shape[0] != x.shape[-2]:
        raise ValueError(
            f"freqs must be 1-D with one value per bin ({x.shape[-2]}), "
            f"got shape {f.shape}"
        )
    if np.any(np.diff(f) <= 0):
        raise ValueError("freqs must be strictly increasing")
    h = np.atleast_1d(np.asarray(harmonics, dtype=np.float64))
    idx_lo, w_hi, valid = _interp_plan(tuple(f.tolist()), tuple(h.tolist()))

    lo = jnp.asarray(idx_lo)
    w = jnp.asarray(w_hi)[:, :, None]
    v = jnp.asarray(valid)[:, :, None]
    # gather along the bins axis for every harmonic at once
    xl = x[..., lo, :]          # (..., n_h, n_bins, F)
    xh = x[..., lo + 1, :]
    out = xl * (1.0 - w) + xh * w
    out = jnp.where(v, out, jnp.asarray(fill_value, REAL_DTYPE))
    # harmonics axis to the front (librosa layout)
    return jnp.moveaxis(out, -3, 0).astype(REAL_DTYPE)


def salience(
    S: ArrayLike,
    freqs: ArrayLike,
    harmonics: ArrayLike = (1, 2, 3, 4),
    weights: ArrayLike | None = None,
    filter_peaks: bool = True,
    fill_value: float = np.nan,
) -> jax.Array:
    """Harmonic pitch-salience map, shaped like ``S``.

    librosa `salience` semantics: the weighted mean of ``S`` resampled at
    each candidate frequency's harmonics — a bin is salient when energy
    appears at ALL its harmonic multiples. ``filter_peaks`` keeps the map
    only at frequency-axis local maxima of ``S`` (``fill_value``
    elsewhere), isolating the f0 ridge.
    """
    S = jnp.asarray(S, dtype=REAL_DTYPE)
    h = np.atleast_1d(np.asarray(harmonics, dtype=np.float64))
    if weights is None:
        wts = np.ones(len(h), dtype=np.float32)
    else:
        wts = np.asarray(weights, dtype=np.float32)
        if wts.shape != (len(h),):
            raise ValueError(
                f"weights must have one value per harmonic ({len(h)}), "
                f"got shape {wts.shape}"
            )
    layers = interp_harmonics(S, freqs, harmonics=h, fill_value=0.0)
    wsum = float(np.abs(wts).sum()) or 1.0
    sal = jnp.einsum("h,h...->...", jnp.asarray(wts / wsum), layers)
    if filter_peaks:
        Sp = jnp.pad(
            S, [(0, 0)] * (S.ndim - 2) + [(1, 1), (0, 0)], mode="edge"
        )
        is_peak = (S > Sp[..., :-2, :]) & (S >= Sp[..., 2:, :])
        sal = jnp.where(is_peak, sal, jnp.asarray(fill_value, REAL_DTYPE))
    return sal.astype(REAL_DTYPE)


__all__ = ["interp_harmonics", "salience"]
