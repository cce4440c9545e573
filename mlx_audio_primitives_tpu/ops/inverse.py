"""Mel-spectrogram inversion: ``mel_to_stft`` and ``mel_to_audio``.

librosa's ``feature.inverse`` API, absent from the reference library, is
a natural completion of this framework's reconstruction stack (istft,
griffinlim): recover a linear magnitude spectrogram from a mel spectrogram
(non-negative least squares against the mel filterbank) and then audio from
it (Griffin-Lim).

TPU-first NNLS: librosa solves per-frame NNLS on the host with
scipy-powered block optimization; here ALL frames solve simultaneously as
one jitted FISTA projected-gradient program — every iteration is two MXU
GEMMs (``A @ X`` and ``A^T @ R``) over the whole batch, with the step size
1/L fixed by the filterbank's largest singular value (computed once per
table in float64 on the host and cached). Convergence is monotone in the
least-squares objective and reaches scipy's exact per-frame optimum to
~1e-6 residual in a few hundred cheap iterations
(``tests/test_inverse.py`` pins it against ``scipy.optimize.nnls``).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .._config import MATMUL_PRECISION, REAL_DTYPE
from ..utils.validation import validate_positive
from .mel import _mel_filterbank_table, mel_filterbank

ArrayLike = Any

__all__ = ["mel_to_stft", "mel_to_audio", "mfcc_to_mel", "mfcc_to_audio", "nnls"]


@lru_cache(maxsize=64)
def _lipschitz(
    sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float,
    htk: bool, norm: str | None,
) -> float:
    """``sigma_max(A)^2`` of the mel filterbank — the gradient Lipschitz
    constant of ``0.5 ||A x - m||^2`` — in float64 on the host, cached per
    table like the filterbank itself."""
    A = _mel_filterbank_table.host(sr, n_fft, n_mels, fmin, fmax, htk, norm)
    return float(np.linalg.norm(A, 2) ** 2)


@partial(jax.jit, static_argnames=("n_iter",))
def _nnls_fista(
    A: jax.Array,  # (m, n)
    M: jax.Array,  # (B, m, F)
    L: jax.Array,  # scalar Lipschitz constant
    n_iter: int,
) -> jax.Array:
    """FISTA for ``min_{X>=0} 0.5 ||A X - M||_F^2``, all columns at once."""
    inv_L = 1.0 / L
    # warm start: one projected gradient step from zero = clip(A^T M / L, 0)
    x0 = jnp.maximum(
        jnp.einsum("mn,bmf->bnf", A, M, precision=MATMUL_PRECISION) * inv_L,
        0.0,
    )

    def body(_, carry):
        x_prev, y, t = carry
        r = jnp.einsum("mn,bnf->bmf", A, y, precision=MATMUL_PRECISION) - M
        g = jnp.einsum("mn,bmf->bnf", A, r, precision=MATMUL_PRECISION)
        x = jnp.maximum(y - g * inv_L, 0.0)
        t_next = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        y = x + ((t - 1.0) / t_next) * (x - x_prev)
        return x, y, t_next

    x, _, _ = lax.fori_loop(
        0, n_iter, body, (x0, x0, jnp.asarray(1.0, REAL_DTYPE))
    )
    return x


def nnls(A: ArrayLike, B: ArrayLike, n_iter: int = 300) -> jax.Array:
    """Solve ``min_{X>=0} ||A @ X - B||_F`` on device (FISTA).

    ``A`` is ``(m, n)``; ``B`` is ``(m, F)`` or batched ``(batch, m, F)``.
    The general-purpose entry point behind :func:`mel_to_stft` (librosa's
    ``util.nnls`` analog — that one solves per-column on the host).
    """
    validate_positive(n_iter, "n_iter")
    A = jnp.asarray(A, dtype=REAL_DTYPE)
    B = jnp.asarray(B, dtype=REAL_DTYPE)
    if A.ndim != 2:
        raise ValueError(f"A must be 2-D, got shape {A.shape}")
    batched = B.ndim == 3
    if not batched:
        B = B[None]
    if B.shape[1] != A.shape[0]:
        raise ValueError(
            f"A rows ({A.shape[0]}) must match B's contraction dim "
            f"({B.shape[1]})"
        )
    L = jnp.asarray(
        float(np.linalg.norm(np.asarray(A, np.float64), 2) ** 2), REAL_DTYPE
    )
    X = _nnls_fista(A, B, L, n_iter)
    return X[0] if not batched else X


def mel_to_stft(
    M: ArrayLike,
    sr: int = 22050,
    n_fft: int = 2048,
    power: float = 2.0,
    fmin: float = 0.0,
    fmax: float | None = None,
    htk: bool = False,
    norm: str | None = "slaney",
    nnls_iter: int = 300,
) -> jax.Array:
    """Approximate the magnitude spectrogram that produced a mel spectrogram.

    librosa-compatible semantics (``librosa.feature.inverse.mel_to_stft``):
    solve NNLS ``mel_basis @ S^power ~ M`` and return ``S`` (magnitude,
    power 1). ``M`` is ``(n_mels, F)`` or ``(batch, n_mels, F)``; the result
    has ``n_fft // 2 + 1`` rows.
    """
    validate_positive(power, "power")
    M = jnp.asarray(M, dtype=REAL_DTYPE)
    batched = M.ndim == 3
    if M.ndim not in (2, 3):
        raise ValueError(f"M must be 2-D or 3-D, got shape {M.shape}")
    n_mels = M.shape[-2]
    if fmax is None:
        fmax = sr / 2.0
    A = mel_filterbank(
        sr, n_fft, n_mels=n_mels, fmin=fmin, fmax=fmax, htk=htk, norm=norm
    )
    L = jnp.asarray(
        _lipschitz(sr, n_fft, n_mels, float(fmin), float(fmax), htk, norm),
        REAL_DTYPE,
    )
    X = _nnls_fista(A, M if batched else M[None], L, nnls_iter)
    S = jnp.power(X, 1.0 / power)
    return S if batched else S[0]


def mel_to_audio(
    M: ArrayLike,
    sr: int = 22050,
    n_fft: int = 2048,
    hop_length: int | None = None,
    win_length: int | None = None,
    window: str | ArrayLike = "hann",
    center: bool = True,
    pad_mode: str = "constant",
    power: float = 2.0,
    n_iter: int = 32,
    length: int | None = None,
    fmin: float = 0.0,
    fmax: float | None = None,
    htk: bool = False,
    norm: str | None = "slaney",
    nnls_iter: int = 300,
    random_state: int | None = None,
) -> jax.Array:
    """Invert a mel spectrogram to audio: NNLS magnitude recovery
    (:func:`mel_to_stft`) followed by Griffin-Lim phase reconstruction —
    librosa's ``feature.inverse.mel_to_audio`` pipeline, fully on device.
    """
    from .griffinlim import griffinlim

    S = mel_to_stft(
        M, sr=sr, n_fft=n_fft, power=power, fmin=fmin, fmax=fmax, htk=htk,
        norm=norm, nnls_iter=nnls_iter,
    )
    return griffinlim(
        S, n_iter=n_iter, hop_length=hop_length, win_length=win_length,
        n_fft=n_fft, window=window, center=center, length=length,
        pad_mode=pad_mode, random_state=random_state,
    )


def mfcc_to_mel(
    M: ArrayLike,
    n_mels: int = 128,
    dct_type: int = 2,
    norm: str | None = "ortho",
    ref: float = 1.0,
    lifter: int = 0,
) -> jax.Array:
    """Approximate the mel power spectrogram behind an MFCC matrix.

    librosa `feature.inverse.mfcc_to_mel` semantics: undo liftering,
    inverse DCT (zero-padding the missing high-quefrency coefficients),
    and dB -> power. Lossy by construction — the forward MFCC discarded
    ``n_mels - n_mfcc`` coefficients and clamped at ``top_db``.

    The inverse DCT is the same cached-basis matmul idiom as the forward
    (:func:`~.mfcc.dct`): for ``norm='ortho'`` the DCT-II basis is
    orthonormal so its transpose inverts it; for ``norm=None`` the
    unnormalized DCT-III (scipy ``idct(type=2)``) basis is the forward
    table with its DC column halved.
    """
    from .convert import db_to_power
    from .mfcc import _dct_basis_t, lifter_coeffs

    validate_positive(n_mels, "n_mels")
    if dct_type != 2:
        raise ValueError(
            f"Unsupported dct_type: {dct_type}. Only type 2 (librosa's "
            "default) is invertible here"
        )
    M = jnp.asarray(M, dtype=REAL_DTYPE)
    if M.ndim not in (2, 3):
        raise ValueError(f"M must be 2-D or 3-D, got shape {M.shape}")
    n_mfcc = M.shape[-2]
    if n_mfcc > n_mels:
        raise ValueError(
            f"n_mfcc ({n_mfcc}) cannot exceed n_mels ({n_mels})"
        )
    if lifter > 0:
        M = M / lifter_coeffs(n_mfcc, lifter)[:, None]
    elif lifter != 0:
        raise ValueError(f"lifter must be non-negative, got {lifter}")

    # (n_mels, n_mfcc) inverse basis
    A = _dct_basis_t(n_mfcc, n_mels, "ortho" if norm == "ortho" else None)
    A = np.asarray(A)
    if norm is None:
        A = A.copy()
        A[:, 0] *= 0.5
    elif norm != "ortho":
        raise ValueError(f"Unknown norm: '{norm}'. Supported: 'ortho', None")
    logmel = jnp.einsum(
        "mk,...kf->...mf", jnp.asarray(A, REAL_DTYPE), M,
        precision=MATMUL_PRECISION,
    )
    return db_to_power(logmel, ref=ref)


def mfcc_to_audio(
    M: ArrayLike,
    n_mels: int = 128,
    dct_type: int = 2,
    norm: str | None = "ortho",
    ref: float = 1.0,
    lifter: int = 0,
    sr: int = 22050,
    n_fft: int = 2048,
    hop_length: int | None = None,
    win_length: int | None = None,
    window: str | ArrayLike = "hann",
    center: bool = True,
    pad_mode: str = "constant",
    power: float = 2.0,
    n_iter: int = 32,
    length: int | None = None,
    **mel_kwargs,
) -> jax.Array:
    """MFCC -> audio: inverse DCT to mel (:func:`mfcc_to_mel`), then the
    NNLS + Griffin-Lim chain (:func:`mel_to_audio`) — librosa's
    ``feature.inverse.mfcc_to_audio`` pipeline, fully on device."""
    mel = mfcc_to_mel(
        M, n_mels=n_mels, dct_type=dct_type, norm=norm, ref=ref,
        lifter=lifter,
    )
    return mel_to_audio(
        mel, sr=sr, n_fft=n_fft, hop_length=hop_length,
        win_length=win_length, window=window, center=center,
        pad_mode=pad_mode, power=power, n_iter=n_iter, length=length,
        **mel_kwargs,
    )
