"""Harmonic/percussive source separation: ``hpss`` and median filtering.

librosa's ``decompose.hpss`` / ``effects.harmonic`` / ``effects.percussive``
family is absent from the reference library; like the effects module it
completes the framework's spectrogram-processing stack.

TPU-first median filtering: scipy's ``ndimage.median_filter`` (librosa's
engine) runs a sequential histogram sweep on the host. Here each 1-D median
is one gather into a ``(..., n, k)`` window view plus a small-axis
``jnp.sort`` — embarrassingly parallel over every output element, jitted,
batched, and differentiable-where-meaningful. Selection semantics match
scipy exactly: rank ``k // 2`` of the sorted window (true median for odd
``k``, scipy's upper-middle choice for even ``k``) over a 'reflect'
(= NumPy 'symmetric') padded input.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from .._config import MATMUL_PRECISION, REAL_DTYPE
from ..utils.validation import validate_positive
from .stft import istft, stft

ArrayLike = Any

__all__ = ["median_filter_1d", "hpss", "harmonic", "percussive", "decompose"]


@partial(jax.jit, static_argnames=("size", "axis"))
def _median_filter_axis(x: jax.Array, *, size: int, axis: int) -> jax.Array:
    """scipy-exact 1-D median (rank) filter along ``axis``."""
    if size == 1:
        return x
    left = size // 2
    right = size - 1 - left
    xm = jnp.moveaxis(x, axis, -1)
    pads = [(0, 0)] * (xm.ndim - 1) + [(left, right)]
    xp = jnp.pad(xm, pads, mode="symmetric")  # scipy.ndimage 'reflect'
    n = xm.shape[-1]
    idx = jnp.arange(n)[:, None] + jnp.arange(size)[None, :]
    windows = xp[..., idx]  # (..., n, size)
    med = jnp.sort(windows, axis=-1)[..., size // 2]
    return jnp.moveaxis(med, -1, axis)


def median_filter_1d(x: ArrayLike, size: int, axis: int = -1) -> jax.Array:
    """Median-filter ``x`` along one axis (scipy ``median_filter`` semantics:
    'reflect' boundary, rank ``size // 2`` selection). The on-device engine
    behind :func:`hpss`."""
    validate_positive(size, "size")
    x = jnp.asarray(x)
    if not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(REAL_DTYPE)
    axis = axis % x.ndim
    n = x.shape[axis]
    if size > 2 * n + 1:
        raise ValueError(
            f"size ({size}) may not exceed 2 * axis length + 1 ({2 * n + 1})"
        )
    return _median_filter_axis(x, size=int(size), axis=axis)


def _softmask(
    X: jax.Array, X_ref: jax.Array, power: float, split_zeros: bool
) -> jax.Array:
    """librosa ``util.softmask``: relative power mask, safe where both
    inputs underflow to zero."""
    if np.isinf(power):
        return (X > X_ref).astype(REAL_DTYPE)
    tiny = float(np.finfo(np.float32).tiny)
    Z = jnp.maximum(X, X_ref)
    bad = Z < tiny
    Zs = jnp.where(bad, 1.0, Z)
    m = (X / Zs) ** power
    m_ref = (X_ref / Zs) ** power
    fill = 0.5 if split_zeros else 0.0
    return jnp.where(bad, fill, m / (m + m_ref))


def hpss(
    S: ArrayLike,
    kernel_size: int | tuple[int, int] = 31,
    power: float = 2.0,
    mask: bool = False,
    margin: float | tuple[float, float] = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """Median-filtering harmonic/percussive separation (Fitzgerald 2010,
    Driedger 2014 margins) on a spectrogram.

    librosa-compatible semantics (``librosa.decompose.hpss``): the harmonic
    enhancement median-filters each frequency row across time, the percussive
    one filters each frame across frequency; soft masks compare the two with
    exponent ``power`` (``inf`` = hard masks). ``margin`` > 1 leaves a
    residual. ``S`` is ``(n_bins, F)`` or ``(batch, n_bins, F)``, magnitude
    or complex (phase is preserved onto both outputs). Returns
    ``(harmonic, percussive)`` — or the two masks when ``mask=True``.
    """
    if isinstance(kernel_size, (tuple, list)):
        win_harm, win_perc = int(kernel_size[0]), int(kernel_size[1])
    else:
        win_harm = win_perc = int(kernel_size)
    validate_positive(win_harm, "kernel_size[harmonic]")
    validate_positive(win_perc, "kernel_size[percussive]")
    validate_positive(power, "power")
    if isinstance(margin, (tuple, list)):
        margin_harm, margin_perc = float(margin[0]), float(margin[1])
    else:
        margin_harm = margin_perc = float(margin)
    if margin_harm < 1 or margin_perc < 1:
        raise ValueError(f"margins must be >= 1.0, got {margin}")

    S = jnp.asarray(S)
    if S.ndim not in (2, 3):
        raise ValueError(f"S must be 2-D or 3-D, got shape {S.shape}")
    if jnp.issubdtype(S.dtype, jnp.complexfloating):
        mag = jnp.abs(S)
        phase = S / jnp.maximum(mag, np.finfo(np.float32).tiny)
    else:
        mag = S.astype(REAL_DTYPE)
        phase = None

    harm = median_filter_1d(mag, win_harm, axis=-1)  # across time
    perc = median_filter_1d(mag, win_perc, axis=-2)  # across frequency

    split_zeros = margin_harm == 1 and margin_perc == 1
    mask_harm = _softmask(harm, perc * margin_harm, power, split_zeros)
    mask_perc = _softmask(perc, harm * margin_perc, power, split_zeros)
    if mask:
        return mask_harm, mask_perc
    H = mag * mask_harm
    P = mag * mask_perc
    if phase is not None:
        return H * phase, P * phase
    return H, P


def _hpss_audio(
    y: ArrayLike,
    which: int,
    n_fft: int,
    hop_length: int | None,
    win_length: int | None,
    window: str | ArrayLike,
    center: bool,
    pad_mode: str,
    **hpss_kwargs: Any,
) -> jax.Array:
    y = jnp.asarray(y, dtype=REAL_DTYPE)
    D = stft(
        y, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
        window=window, center=center, pad_mode=pad_mode,
    )
    D_sep = hpss(D, **hpss_kwargs)[which]
    return istft(
        D_sep, hop_length=hop_length, win_length=win_length, n_fft=n_fft,
        window=window, center=center, length=y.shape[-1],
    )


def harmonic(
    y: ArrayLike,
    n_fft: int = 2048,
    hop_length: int | None = None,
    win_length: int | None = None,
    window: str | ArrayLike = "hann",
    center: bool = True,
    pad_mode: str = "constant",
    **hpss_kwargs: Any,
) -> jax.Array:
    """Extract the harmonic component of a waveform
    (``librosa.effects.harmonic``): STFT -> :func:`hpss` -> ISTFT at the
    input length. Extra keyword arguments go to :func:`hpss`."""
    return _hpss_audio(
        y, 0, n_fft, hop_length, win_length, window, center, pad_mode,
        **hpss_kwargs,
    )


def percussive(
    y: ArrayLike,
    n_fft: int = 2048,
    hop_length: int | None = None,
    win_length: int | None = None,
    window: str | ArrayLike = "hann",
    center: bool = True,
    pad_mode: str = "constant",
    **hpss_kwargs: Any,
) -> jax.Array:
    """Extract the percussive component of a waveform
    (``librosa.effects.percussive``); see :func:`harmonic`."""
    return _hpss_audio(
        y, 1, n_fft, hop_length, win_length, window, center, pad_mode,
        **hpss_kwargs,
    )


@partial(jax.jit, static_argnames=("n_components", "n_iter"))
def _nmf_mu(S: jax.Array, W0: jax.Array, H0: jax.Array, *,
            n_components: int, n_iter: int):
    """Multiplicative-update NMF (Lee & Seung 2001, Frobenius objective):
    W, H >= 0 minimizing ||S - W H||_F. Every update is two MXU GEMMs per
    factor — the whole solver is one jitted fori_loop, batched-friendly.
    """
    eps = jnp.asarray(np.finfo(np.float32).tiny, REAL_DTYPE)

    def body(_, wh):
        W, H = wh
        # H <- H * (W^T S) / (W^T W H)
        WtS = jnp.einsum("fk,ft->kt", W, S, precision=MATMUL_PRECISION)
        WtWH = jnp.einsum(
            "fk,fj,jt->kt", W, W, H, precision=MATMUL_PRECISION
        )
        H = H * WtS / (WtWH + eps)
        # W <- W * (S H^T) / (W H H^T)
        SHt = jnp.einsum("ft,kt->fk", S, H, precision=MATMUL_PRECISION)
        WHHt = jnp.einsum(
            "fj,jt,kt->fk", W, H, H, precision=MATMUL_PRECISION
        )
        W = W * SHt / (WHHt + eps)
        return W, H

    return jax.lax.fori_loop(0, n_iter, body, (W0, H0))


def decompose(
    S: ArrayLike,
    n_components: int = 8,
    n_iter: int = 200,
    seed: int = 0,
    W: ArrayLike | None = None,
    fit_W: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Nonnegative spectrogram factorization ``S ~ W @ H`` (on-device NMF).

    The librosa `decompose.decompose` role (spectral template + activation
    separation) with a TPU-native solver: librosa delegates to sklearn's
    host NMF; here Lee-Seung multiplicative updates run as one jitted
    ``fori_loop`` of MXU GEMMs — deterministic given ``seed``, monotone
    nonincreasing in the Frobenius objective. Returns
    ``(components, activations)`` = ``(W (bins, k), H (k, frames))``.

    ``W`` supplies fixed or warm-start templates (librosa's supervised
    mode): with ``fit_W=False`` only activations are fitted (template
    decomposition); with ``fit_W=True`` it is a warm start.
    """
    validate_positive(n_components, "n_components")
    validate_positive(n_iter, "n_iter")
    S = jnp.asarray(S, dtype=REAL_DTYPE)
    if S.ndim != 2:
        raise ValueError(
            f"decompose expects a 2-D (bins, frames) spectrogram, got "
            f"{S.ndim}-D"
        )
    if bool(jnp.any(S < 0)):
        raise ValueError("decompose requires a nonnegative spectrogram")
    nb, nf = S.shape
    rng = np.random.default_rng(seed)
    scale = float(np.sqrt(float(jnp.mean(S)) / max(n_components, 1) + 1e-12))
    if W is None:
        W0 = jnp.asarray(
            scale * rng.uniform(0.1, 1.0, (nb, n_components)), REAL_DTYPE
        )
    else:
        W0 = jnp.asarray(W, dtype=REAL_DTYPE)
        if W0.shape != (nb, n_components):
            raise ValueError(
                f"W must have shape ({nb}, {n_components}), got "
                f"{tuple(W0.shape)}"
            )
    H0 = jnp.asarray(
        scale * rng.uniform(0.1, 1.0, (n_components, nf)), REAL_DTYPE
    )
    if W is not None and not fit_W:
        eps = jnp.asarray(np.finfo(np.float32).tiny, REAL_DTYPE)

        @partial(jax.jit, static_argnames=("n_iter",))
        def _fit_h(S, W, H0, n_iter: int):
            WtW = jnp.einsum("fk,fj->kj", W, W, precision=MATMUL_PRECISION)
            WtS = jnp.einsum("fk,ft->kt", W, S, precision=MATMUL_PRECISION)

            def body(_, H):
                return H * WtS / (
                    jnp.einsum("kj,jt->kt", WtW, H,
                               precision=MATMUL_PRECISION) + eps
                )

            return jax.lax.fori_loop(0, n_iter, body, H0)

        return W0, _fit_h(S, W0, H0, n_iter)
    return _nmf_mu(S, W0, H0, n_components=n_components, n_iter=n_iter)
