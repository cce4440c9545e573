"""Decibel conversions (librosa-compatible).

Pure elementwise VPU math under jit; fuses into adjacent ops (e.g. the
mel->log step of MFCC). Behavior matches the reference's `convert.py`
(reference: `mlx_audio_primitives/convert.py:14-198`): callable-or-scalar
``ref``, ``amin`` clamping of both S and ref, and a ``top_db`` dynamic-range
clip against the *global* max of the converted array.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from .._config import REAL_DTYPE
from ..kernels.precise_math import exp10, log10

ArrayLike = Any


def _to_db(
    S: ArrayLike,
    ref: float | Callable,
    coefficient: float,
    amin: float,
    top_db: float | None,
) -> jax.Array:
    if amin <= 0:
        raise ValueError(f"amin must be positive, got {amin}")
    S = jnp.asarray(S, dtype=REAL_DTYPE)
    ref_value = ref(S) if callable(ref) else jnp.asarray(ref, dtype=S.dtype)
    S_clamped = jnp.maximum(S, amin)
    ref_clamped = jnp.maximum(ref_value, amin)
    S_db = coefficient * log10(S_clamped / ref_clamped)
    if top_db is not None:
        if top_db <= 0:
            raise ValueError(f"top_db must be positive, got {top_db}")
        S_db = jnp.maximum(S_db, jnp.max(S_db) - top_db)
    return S_db


def power_to_db(
    S: ArrayLike,
    ref: float | Callable = 1.0,
    amin: float = 1e-10,
    top_db: float | None = 80.0,
) -> jax.Array:
    """Convert a power spectrogram to dB: ``10 * log10(S / ref)``.

    Reference parity: `mlx_audio_primitives/convert.py:63-97`.
    """
    return _to_db(S, ref, coefficient=10.0, amin=amin, top_db=top_db)


def db_to_power(S_db: ArrayLike, ref: float = 1.0) -> jax.Array:
    """Invert :func:`power_to_db`: ``ref * 10**(S_db / 10)``.

    Reference parity: `mlx_audio_primitives/convert.py:100-129`.
    """
    S_db = jnp.asarray(S_db, dtype=REAL_DTYPE)
    return ref * exp10(S_db / 10.0)


def amplitude_to_db(
    S: ArrayLike,
    ref: float | Callable = 1.0,
    amin: float = 1e-5,
    top_db: float | None = 80.0,
) -> jax.Array:
    """Convert an amplitude spectrogram to dB: ``20 * log10(S / ref)``.

    Reference parity: `mlx_audio_primitives/convert.py:132-166`.
    """
    return _to_db(S, ref, coefficient=20.0, amin=amin, top_db=top_db)


def db_to_amplitude(S_db: ArrayLike, ref: float = 1.0) -> jax.Array:
    """Invert :func:`amplitude_to_db`: ``ref * 10**(S_db / 20)``.

    Reference parity: `mlx_audio_primitives/convert.py:169-198`.
    """
    S_db = jnp.asarray(S_db, dtype=REAL_DTYPE)
    return ref * exp10(S_db / 20.0)


def perceptual_weighting(
    S: ArrayLike,
    frequencies: ArrayLike,
    kind: str = "A",
    **power_to_db_kwargs,
) -> jax.Array:
    """Perceptually weighted power spectrogram in dB:
    ``frequency_weighting(f)[:, None] + power_to_db(S)`` (librosa
    `perceptual_weighting` semantics). ``frequencies`` is one center
    frequency per row of ``S``; ``kind`` selects the A/B/C/D/Z curve
    (:func:`~.units.frequency_weighting`, host f64 table) and the rest of
    the pipeline stays on device."""
    from .units import frequency_weighting

    S = jnp.asarray(S, dtype=REAL_DTYPE)
    w = np.atleast_1d(
        frequency_weighting(np.asarray(frequencies, dtype=np.float64),
                            kind=kind)
    )
    if w.shape[0] != S.shape[-2]:
        raise ValueError(
            f"frequencies must have one value per spectrogram row "
            f"({S.shape[-2]}), got {w.shape[0]}"
        )
    return (
        jnp.asarray(w.astype(np.float32))[:, None]
        + power_to_db(S, **power_to_db_kwargs)
    ).astype(REAL_DTYPE)


def mu_compress(
    x: ArrayLike, mu: float = 255.0, quantize: bool = True
) -> jax.Array:
    """Mu-law companding (librosa `mu_compress` semantics): map [-1, 1]
    through ``sign(x) ln(1 + mu|x|) / ln(1 + mu)``; ``quantize=True``
    bins the companded value with librosa's ``np.digitize`` over
    ``linspace(-1, 1, mu+1)``, yielding integer codes in
    ``[-(mu+1)/2 + 1, (mu+1)/2]`` (e.g. [-127, 128] for mu=255)."""
    if mu <= 0:
        raise ValueError(f"mu must be positive, got {mu}")
    x = jnp.asarray(x, dtype=REAL_DTYPE)
    x = jnp.clip(x, -1.0, 1.0)
    mu = float(mu)
    y = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / np.log1p(mu)
    if not quantize:
        return y.astype(REAL_DTYPE)
    # np.digitize(y, linspace(-1, 1, mu+1)) == searchsorted(edges, y,
    # side='right'); for uniform edges that is floor((y+1)*mu/2) + 1.
    idx = jnp.floor((y + 1.0) * (mu / 2.0)).astype(jnp.int32) + 1
    idx = jnp.clip(idx, 1, int(mu) + 1)
    return idx - int((mu + 1) // 2)


def mu_expand(
    x: ArrayLike, mu: float = 255.0, quantize: bool = True
) -> jax.Array:
    """Inverse of :func:`mu_compress`: ``quantize=True`` treats ``x`` as
    integer codes and de-quantizes with librosa's ``x * 2/(1+mu)``
    (no offset), else as companded floats in [-1, 1]."""
    if mu <= 0:
        raise ValueError(f"mu must be positive, got {mu}")
    mu = float(mu)
    x = jnp.asarray(x)
    if quantize:
        y = x.astype(REAL_DTYPE) * 2.0 / (1.0 + mu)
    else:
        y = jnp.asarray(x, dtype=REAL_DTYPE)
    y = jnp.clip(y, -1.0, 1.0)
    return (
        jnp.sign(y) * ((1.0 + mu) ** jnp.abs(y) - 1.0) / mu
    ).astype(REAL_DTYPE)
