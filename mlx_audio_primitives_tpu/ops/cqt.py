"""Constant-Q transform (CQT).

Beyond-parity feature: the reference lists "CQT - Constant-Q Transform" as
unbuilt future work (`/root/reference/ARCHITECTURE.md` "Potential
Features"). librosa-shaped API (`cqt` / `pseudo_cqt` /
`cqt_frequencies` with librosa's default geometry: fmin = C1, 84 bins at
12 bins/octave).

TPU-native design — the Brown & Puckette (1992) frequency-domain method,
which is exactly an MXU workload:

1. A host-float64 table of constant-Q wavelet filters (hann-windowed
   complex exponentials, length ``Q * sr / f_k``, l1-normalized) is built
   once per config, FFT'd at a shared ``n_fft``, conjugated, and cached
   device-resident as a ``(n_bins, n_fft//2+1)`` complex matrix — the same
   table idiom as every filterbank in the package.
2. The signal runs through ONE rectangular-window :func:`~.stft.stft` at
   that ``n_fft`` (riding the library's transform dispatch), and the CQT is
   a single complex GEMM: ``C = basis @ STFT``. No per-octave recursion,
   no host loops, static shapes throughout — the multirate recursion
   librosa uses to save CPU FLOPs is a poor trade on TPU, where one large
   batched GEMM beats eight small sequential resample+FFT stages.

Normalization contract (documented rather than librosa-bit-matched, since
the filters are l1-normalized): a pure tone of amplitude ``A`` at bin
``k``'s center frequency yields ``|C[k]| ~= A / 2``.

The analytic filters carry negligible negative-frequency energy, so only
the rfft half-spectrum participates (same half-spectrum truncation librosa
applies to its FFT basis).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .._config import FILTERBANK_CACHE_SIZE, MATMUL_PRECISION, REAL_DTYPE
from ..utils.cache import table_cache
from ..utils.validation import validate_positive
from .stft import stft

ArrayLike = Any

# C1 in Hz (MIDI note 24 at A440): librosa's default CQT anchor.
_C1 = 32.70319566257483


def cqt_frequencies(
    n_bins: int, fmin: float = _C1, bins_per_octave: int = 12,
    tuning: float = 0.0,
) -> np.ndarray:
    """Center frequencies of CQT bins (host float64, geometric spacing)."""
    validate_positive(n_bins, "n_bins")
    validate_positive(bins_per_octave, "bins_per_octave")
    correction = 2.0 ** (float(tuning) / bins_per_octave)
    return correction * fmin * 2.0 ** (
        np.arange(n_bins, dtype=np.float64) / bins_per_octave
    )


def _cqt_window(n: int) -> np.ndarray:
    """Symmetric hann in float64 (matches the package's window tables)."""
    if n == 1:
        return np.ones(1)
    m = np.arange(n, dtype=np.float64)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * m / (n - 1))


def _cqt_q(bins_per_octave: int, filter_scale: float) -> float:
    return float(filter_scale) / (2.0 ** (1.0 / bins_per_octave) - 1.0)


def cqt_filter_length(
    sr: int, fmin: float, bins_per_octave: int = 12, filter_scale: float = 1.0
) -> int:
    """Length in samples of the longest (lowest-frequency) CQT filter."""
    return int(np.ceil(_cqt_q(bins_per_octave, filter_scale) * sr / fmin))


@table_cache("cqt_basis", maxsize=FILTERBANK_CACHE_SIZE)
def _cqt_fft_basis(
    sr: int, n_fft: int, n_bins: int, fmin: float, bins_per_octave: int,
    filter_scale: float,
) -> np.ndarray:
    """Conjugated rfft-bin responses of the constant-Q wavelet bank,
    stored as stacked real/imag planes ``(2, n_bins, n_fft//2+1)`` float32.

    Row k: hann-windowed complex exponential at ``f_k``, length
    ``Q*sr/f_k``, l1-normalized, centered in the ``n_fft`` frame (so the
    response phase is referenced to the frame center), FFT'd, conjugated,
    and divided by ``n_fft`` — making ``basis @ FFT(frame)`` the exact
    time-domain correlation ``sum_n conj(h_k[n]) frame[n]`` by Parseval
    (up to the discarded, negligible negative-frequency content).

    Real/imag plane split rather than a complex64 table: some restricted
    TPU runtimes (the tunneled axon attachment) cannot transfer complex64
    host<->device; the complex matrix is reassembled on device inside the
    jitted apply (see STATUS.md known limitations).
    """
    freqs = cqt_frequencies(n_bins, fmin, bins_per_octave)
    Q = _cqt_q(bins_per_octave, filter_scale)
    basis = np.zeros((n_bins, n_fft), dtype=np.complex128)
    for k, f in enumerate(freqs):
        ilen = min(int(np.ceil(Q * sr / f)), n_fft)
        w = _cqt_window(ilen)
        t = np.arange(ilen, dtype=np.float64) - (ilen - 1) / 2.0
        h = w * np.exp(2j * np.pi * f * t / sr)
        h /= np.sum(np.abs(h))
        start = (n_fft - ilen) // 2
        basis[k, start : start + ilen] = h
    # By Parseval, conj(FFT(h)) . FFT(frame) / n_fft = sum_n conj(h[n]) *
    # frame[n]: the filter stays centered in the frame, so each
    # coefficient's phase is referenced to the filter's own center (which
    # coincides with the analysis position t*hop under center=True).
    B = np.conj(np.fft.fft(basis, axis=1)[:, : n_fft // 2 + 1]) / n_fft
    return np.ascontiguousarray(np.stack([B.real, B.imag]))


def _cqt_setup(
    sr: int, n_bins: int, fmin: float | None, bins_per_octave: int,
    filter_scale: float, tuning: float,
) -> tuple[float, int]:
    validate_positive(n_bins, "n_bins")
    validate_positive(bins_per_octave, "bins_per_octave")
    validate_positive(filter_scale, "filter_scale")
    if fmin is None:
        fmin = _C1
    fmin = float(fmin) * 2.0 ** (float(tuning) / bins_per_octave)
    if fmin <= 0:
        raise ValueError(f"fmin must be positive, got {fmin}")
    f_top = fmin * 2.0 ** ((n_bins - 1) / bins_per_octave)
    if f_top > sr / 2.0:
        raise ValueError(
            f"highest CQT bin ({f_top:.1f} Hz) exceeds Nyquist "
            f"({sr / 2.0:.1f} Hz): reduce n_bins or raise sr"
        )
    max_len = cqt_filter_length(sr, fmin, bins_per_octave, filter_scale)
    n_fft = 1 << int(np.ceil(np.log2(max_len)))
    return fmin, n_fft


def cqt(
    y: ArrayLike,
    sr: int = 22050,
    hop_length: int = 512,
    fmin: float | None = None,
    n_bins: int = 84,
    bins_per_octave: int = 12,
    tuning: float = 0.0,
    filter_scale: float = 1.0,
    pad_mode: str = "constant",
    fft_mode: str = "auto",
) -> jax.Array:
    """Complex constant-Q transform, ``(n_bins, F)`` / ``(B, n_bins, F)``.

    ``fmin`` defaults to C1 (~32.70 Hz); frames are centered (librosa-style
    ``center=True`` at the internal ``n_fft``). Magnitude contract: a pure
    tone of amplitude ``A`` at a bin's center frequency gives
    ``|C| ~= A/2`` at that bin (l1-normalized filters; see module
    docstring). Complex output — ``magnitude(cqt(y))`` for the modulus.

    Restricted-runtime note: some remote TPU attachments (the tunneled
    ``axon`` platform, STATUS.md known limitation) cannot fetch complex64
    device arrays to host — ``np.asarray(cqt(y))`` raises UNIMPLEMENTED.
    Reduce on device first (``magnitude(...)``/``jnp.abs``, as
    :func:`chroma_cqt` does) or fetch ``.real``/``.imag`` separately.
    """
    fmin, n_fft = _cqt_setup(
        sr, n_bins, fmin, bins_per_octave, filter_scale, tuning
    )
    validate_positive(hop_length, "hop_length")
    basis = _cqt_fft_basis(
        int(sr), n_fft, int(n_bins), fmin, int(bins_per_octave),
        float(filter_scale),
    )
    D = stft(
        y,
        n_fft=n_fft,
        hop_length=hop_length,
        window="ones",
        center=True,
        pad_mode=pad_mode,
        fft_mode=fft_mode,
    )
    return _cqt_apply(basis, D)


@jax.jit
def _cqt_apply(basis_ri: jax.Array, D: jax.Array) -> jax.Array:
    # (Br + jBi) @ (Dr + jDi) as four real MXU GEMMs — the complex basis
    # never crosses the host<->device boundary (see table docstring), and
    # XLA lowers complex matmuls to exactly this anyway.
    Br, Bi = basis_ri[0], basis_ri[1]
    Dr, Di = jnp.real(D), jnp.imag(D)
    re = jnp.matmul(Br, Dr, precision=MATMUL_PRECISION) - jnp.matmul(
        Bi, Di, precision=MATMUL_PRECISION
    )
    im = jnp.matmul(Br, Di, precision=MATMUL_PRECISION) + jnp.matmul(
        Bi, Dr, precision=MATMUL_PRECISION
    )
    return jax.lax.complex(re, im)


def pseudo_cqt(
    y: ArrayLike,
    sr: int = 22050,
    hop_length: int = 512,
    fmin: float | None = None,
    n_bins: int = 84,
    bins_per_octave: int = 12,
    tuning: float = 0.0,
    filter_scale: float = 1.0,
    pad_mode: str = "constant",
) -> jax.Array:
    """Magnitude-only approximate CQT: ``|basis| @ |STFT|`` (real GEMM).

    Phase-insensitive projection of the magnitude spectrogram through the
    CQT filter magnitudes (librosa's `pseudo_cqt` construction). Cheaper
    than :func:`cqt` (real instead of complex GEMM, and the magnitude
    STFT path can ride the fused Pallas kernels). Peak locations track
    ``|cqt|``, but the absolute scale does not (triangle inequality:
    ``sum |B||Y| >= |sum conj(B) Y|``, and the rectangular frame's
    spectral leakage inflates the cross terms) — same caveat librosa
    documents for its `pseudo_cqt`.
    """
    fmin, n_fft = _cqt_setup(
        sr, n_bins, fmin, bins_per_octave, filter_scale, tuning
    )
    validate_positive(hop_length, "hop_length")
    basis = _cqt_fft_basis(
        int(sr), n_fft, int(n_bins), fmin, int(bins_per_octave),
        float(filter_scale),
    )
    from .stft import magnitude_spectrogram

    M = magnitude_spectrogram(
        y,
        n_fft=n_fft,
        hop_length=hop_length,
        window="ones",
        center=True,
        pad_mode=pad_mode,
    )
    return _pseudo_cqt_apply(basis, M)


@jax.jit
def _pseudo_cqt_apply(basis_ri: jax.Array, M: jax.Array) -> jax.Array:
    mag = jnp.sqrt(basis_ri[0] ** 2 + basis_ri[1] ** 2).astype(REAL_DTYPE)
    return jnp.matmul(mag, M, precision=MATMUL_PRECISION)


def _vqt_alpha(bins_per_octave: int) -> float:
    """Relative bandwidth of one bin: (2^(1/B) - 2^(-1/B)) / 2."""
    r = 2.0 ** (1.0 / bins_per_octave)
    return (r - 1.0 / r) / 2.0


@table_cache("vqt_basis", maxsize=FILTERBANK_CACHE_SIZE)
def _vqt_fft_basis(
    sr: int, n_fft: int, n_bins: int, fmin: float, bins_per_octave: int,
    filter_scale: float, gamma: float,
) -> np.ndarray:
    """Variable-Q analog of :func:`_cqt_fft_basis`: filter k has length
    ``Q_a * sr / (f_k + gamma / alpha)`` with ``Q_a = filter_scale/alpha``
    — constant-Q at high frequency, approaching constant-bandwidth
    (``gamma`` Hz) at the low end. Same hann window, l1 normalization,
    centering, conjugated rfft storage as the CQT table.
    """
    freqs = cqt_frequencies(n_bins, fmin, bins_per_octave)
    alpha = _vqt_alpha(bins_per_octave)
    Qa = float(filter_scale) / alpha
    basis = np.zeros((n_bins, n_fft), dtype=np.complex128)
    for k, f in enumerate(freqs):
        ilen = min(int(np.ceil(Qa * sr / (f + gamma / alpha))), n_fft)
        w = _cqt_window(ilen)
        t = np.arange(ilen, dtype=np.float64) - (ilen - 1) / 2.0
        h = w * np.exp(2j * np.pi * f * t / sr)
        h /= np.sum(np.abs(h))
        start = (n_fft - ilen) // 2
        basis[k, start : start + ilen] = h
    B = np.conj(np.fft.fft(basis, axis=1)[:, : n_fft // 2 + 1]) / n_fft
    return np.ascontiguousarray(np.stack([B.real, B.imag]))


def vqt(
    y: ArrayLike,
    sr: int = 22050,
    hop_length: int = 512,
    fmin: float | None = None,
    n_bins: int = 84,
    gamma: float | None = None,
    bins_per_octave: int = 12,
    tuning: float = 0.0,
    filter_scale: float = 1.0,
    pad_mode: str = "constant",
    fft_mode: str = "auto",
) -> jax.Array:
    """Complex variable-Q transform, ``(n_bins, F)`` / ``(B, n_bins, F)``.

    librosa `vqt` semantics: like :func:`cqt` but each filter's bandwidth
    is ``alpha * f_k + gamma`` — ``gamma = 0`` reduces to a constant-Q
    bank; the default ``gamma = 24.7 * alpha / 0.108`` Hz tracks the ERB
    auditory bandwidth (Glasberg & Moore), giving better time resolution
    in the low octaves at the cost of Q. Same single-GEMM
    frequency-domain evaluation and magnitude contract as :func:`cqt`
    (tone of amplitude A at a bin center -> ``|V| ~= A/2``), and the same
    complex64-fetch caveat on restricted runtimes.
    """
    validate_positive(hop_length, "hop_length")
    validate_positive(n_bins, "n_bins")
    validate_positive(bins_per_octave, "bins_per_octave")
    validate_positive(filter_scale, "filter_scale")
    if fmin is None:
        fmin = _C1
    fmin = float(fmin) * 2.0 ** (float(tuning) / bins_per_octave)
    if fmin <= 0:
        raise ValueError(f"fmin must be positive, got {fmin}")
    alpha = _vqt_alpha(int(bins_per_octave))
    if gamma is None:
        gamma = 24.7 * alpha / 0.108
    if gamma < 0:
        raise ValueError(f"gamma must be non-negative, got {gamma}")
    f_top = fmin * 2.0 ** ((n_bins - 1) / bins_per_octave)
    if f_top > sr / 2.0:
        raise ValueError(
            f"highest VQT bin ({f_top:.1f} Hz) exceeds Nyquist "
            f"({sr / 2.0:.1f} Hz): reduce n_bins or raise sr"
        )
    # longest filter sets the shared transform length
    max_len = int(np.ceil(
        (float(filter_scale) / alpha) * sr / (fmin + float(gamma) / alpha)
    ))
    n_fft = 1 << int(np.ceil(np.log2(max(max_len, 2))))
    basis = _vqt_fft_basis(
        int(sr), n_fft, int(n_bins), fmin, int(bins_per_octave),
        float(filter_scale), float(gamma),
    )
    D = stft(
        y,
        n_fft=n_fft,
        hop_length=hop_length,
        window="ones",
        center=True,
        pad_mode=pad_mode,
        fft_mode=fft_mode,
    )
    return _cqt_apply(basis, D)
