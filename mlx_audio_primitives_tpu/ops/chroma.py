"""Chroma (pitch-class) filterbank and chromagram.

Beyond-parity feature: the reference lists "Chroma - Pitch class profiles"
as unbuilt future work (`/root/reference/ARCHITECTURE.md` "Potential
Features"); this module implements it TPU-native with librosa-compatible
semantics (`librosa.filters.chroma` / `librosa.feature.chroma_stft`
signatures and the classic Ellis chromagram construction).

Design follows the mel pipeline exactly: the filterbank is a host-float64
table cached device-resident (`utils/cache.py`), and the chromagram is the
same fused ``fb @ |STFT|^power`` dispatch as :func:`~.mel.melspectrogram` —
on TPU the whole thing runs inside the fused radix Pallas kernel whenever
its shape gates admit (12 chroma rows is a tiny filterbank; the kernel does
not care), otherwise the six-step / packed-FFT XLA pipeline.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .._config import FILTERBANK_CACHE_SIZE, MATMUL_PRECISION, REAL_DTYPE
from ..utils.cache import table_cache
from ..utils.validation import validate_positive
from .mel import filterbank_spectrogram
from .stft import _get_padded_window

ArrayLike = Any


def hz_to_octs(
    frequencies: ArrayLike, tuning: float = 0.0, bins_per_octave: int = 12
) -> np.ndarray:
    """Hz -> octave number relative to A0 ~ 27.5 Hz (host float64).

    ``octs = log2(f / (A440/16))`` with A440 detuned by ``tuning`` fractional
    bins: the standard chroma frequency coordinate (A440/16 = A1... the
    4-octaves-below-A440 anchor librosa uses).
    """
    f = np.asarray(frequencies, dtype=np.float64)
    a440 = 440.0 * 2.0 ** (float(tuning) / bins_per_octave)
    with np.errstate(divide="ignore"):
        return np.log2(f / (a440 / 16.0))


def octs_to_hz(
    octs: ArrayLike, tuning: float = 0.0, bins_per_octave: int = 12
) -> np.ndarray:
    """Octave number -> Hz; exact inverse of :func:`hz_to_octs`."""
    z = np.asarray(octs, dtype=np.float64)
    a440 = 440.0 * 2.0 ** (float(tuning) / bins_per_octave)
    return (a440 / 16.0) * (2.0**z)


@table_cache("chroma_filterbank", maxsize=FILTERBANK_CACHE_SIZE)
def _chroma_filterbank_table(
    sr: int,
    n_fft: int,
    n_chroma: int,
    tuning: float,
    ctroct: float,
    octwidth: float | None,
    norm: float | None,
    base_c: bool,
) -> np.ndarray:
    """Gaussian-bump chroma projection matrix in host float64.

    The classic Ellis chromagram construction: each FFT bin's frequency is
    mapped to a fractional chroma coordinate, every chroma class collects
    bins via a Gaussian whose width follows the local bin spacing, columns
    are length-normalized, and an octave-weighting Gaussian (center
    ``ctroct`` octaves, width ``octwidth``) emphasizes the mid range.
    """
    # Fractional chroma bin of every FFT bin (DC gets a sentinel 1.5 octaves
    # below bin 1, so it lands in no class's bump).
    freqs = np.linspace(0, sr, n_fft, endpoint=False)[1:]
    frqbins = n_chroma * hz_to_octs(freqs, tuning=tuning, bins_per_octave=n_chroma)
    frqbins = np.concatenate(([frqbins[0] - 1.5 * n_chroma], frqbins))

    # Local spacing between successive bins' chroma coordinates, floored at
    # one chroma bin so the bumps never collapse at the sparse low end.
    binwidth = np.concatenate((np.maximum(frqbins[1:] - frqbins[:-1], 1.0), [1.0]))

    # Wrapped distance from each FFT bin to each chroma class, in bins.
    D = frqbins[None, :] - np.arange(n_chroma, dtype=np.float64)[:, None]
    half = round(n_chroma / 2.0)
    D = np.remainder(D + half + 10 * n_chroma, n_chroma) - half

    wts = np.exp(-0.5 * (2.0 * D / binwidth[None, :]) ** 2)

    # Column normalization (each FFT bin's profile), numerically guarded.
    if norm is not None:
        if np.isinf(norm):
            length = np.max(np.abs(wts), axis=0)
        else:
            length = np.sum(np.abs(wts) ** norm, axis=0) ** (1.0 / norm)
        length = np.where(length < np.finfo(np.float64).tiny, 1.0, length)
        wts = wts / length[None, :]

    if octwidth is not None:
        wts *= np.exp(
            -0.5 * (((frqbins / n_chroma - ctroct) / octwidth) ** 2)
        )[None, :]

    if base_c:
        # Rotate so row 0 is C rather than A (A->C is -3 semitone classes).
        wts = np.roll(wts, -3 * (n_chroma // 12), axis=0)

    return np.ascontiguousarray(wts[:, : 1 + n_fft // 2])


def chroma_filterbank(
    sr: int,
    n_fft: int,
    n_chroma: int = 12,
    tuning: float = 0.0,
    ctroct: float = 5.0,
    octwidth: float | None = 2.0,
    norm: float | None = 2.0,
    base_c: bool = True,
) -> jax.Array:
    """Chroma filterbank ``(n_chroma, n_fft//2 + 1)``, device-cached.

    librosa-compatible (`librosa.filters.chroma` semantics); host float64
    construction like every other table in the package (the mel/bark/linear
    filterbank idiom, reference `mel_filterbank.cpp:144-228`).

    Parameters mirror librosa: ``tuning`` in fractional chroma bins,
    ``ctroct``/``octwidth`` the octave-weighting Gaussian (``octwidth=None``
    disables it), ``norm`` the per-FFT-bin column norm (2, 1, inf, or None),
    ``base_c`` rotates row 0 from A to C.
    """
    validate_positive(n_fft, "n_fft")
    validate_positive(n_chroma, "n_chroma")
    validate_positive(sr, "sr")
    return _chroma_filterbank_table(
        int(sr),
        int(n_fft),
        int(n_chroma),
        float(tuning),
        float(ctroct),
        None if octwidth is None else float(octwidth),
        None if norm is None else float(norm),
        bool(base_c),
    )


def _normalize_frames(C: jax.Array, norm: float | None) -> jax.Array:
    """Per-frame chroma normalization over the class axis (-2), on device."""
    if norm is None:
        return C
    if np.isinf(norm):
        length = jnp.max(jnp.abs(C), axis=-2, keepdims=True)
    elif norm == 1.0:
        length = jnp.sum(jnp.abs(C), axis=-2, keepdims=True)
    elif norm == 2.0:
        length = jnp.sqrt(jnp.sum(C * C, axis=-2, keepdims=True))
    else:
        length = jnp.sum(jnp.abs(C) ** norm, axis=-2, keepdims=True) ** (1.0 / norm)
    tiny = jnp.asarray(np.finfo(np.float32).tiny, REAL_DTYPE)
    return C / jnp.where(length < tiny, 1.0, length)


def chroma_stft(
    y: ArrayLike | None = None,
    sr: int = 22050,
    S: ArrayLike | None = None,
    n_fft: int = 2048,
    hop_length: int | None = None,
    win_length: int | None = None,
    window: str | ArrayLike = "hann",
    center: bool = True,
    pad_mode: str = "constant",
    power: float = 2.0,
    norm: float | None = np.inf,
    tuning: float = 0.0,
    n_chroma: int = 12,
    ctroct: float = 5.0,
    octwidth: float | None = 2.0,
    base_c: bool = True,
    fft_mode: str = "auto",
    use_pallas: bool | None = None,
) -> jax.Array:
    """Chromagram ``(n_chroma, n_frames)`` / ``(batch, n_chroma, n_frames)``.

    librosa-compatible (`librosa.feature.chroma_stft` semantics): energy
    spectrogram ``|STFT|^power`` projected through the chroma filterbank,
    then each frame normalized (``norm=inf`` -> peak class = 1.0, librosa's
    default). Accepts a precomputed magnitude spectrogram ``S``
    ``(..., n_fft//2+1, F)`` via the same S-or-y protocol as the spectral
    features (reference `features.py:24-54`).

    Unlike librosa, ``tuning`` defaults to 0.0 rather than being estimated
    from the signal; pass an explicit fractional-bin tuning if needed.
    On TPU the y-path runs inside the fused radix Pallas kernel (see
    :func:`~.mel.filterbank_spectrogram`).
    """
    from .stft import _as_batched, _validate_stft_params

    if hop_length is None:
        hop_length = n_fft // 4
    if win_length is None:
        win_length = n_fft

    fb = chroma_filterbank(
        sr=sr,
        n_fft=n_fft,
        n_chroma=n_chroma,
        tuning=tuning,
        ctroct=ctroct,
        octwidth=octwidth,
        base_c=base_c,
    )

    if S is not None:
        S = jnp.asarray(S, dtype=REAL_DTYPE)
        input_is_1d = S.ndim == 2
        if input_is_1d:
            S = S[None]
        if S.shape[-2] != n_fft // 2 + 1:
            raise ValueError(
                f"S has {S.shape[-2]} frequency bins but n_fft={n_fft} "
                f"implies {n_fft // 2 + 1}"
            )
        raw = _apply_chroma_fb(S, fb)
        raw = _normalize_frames(raw, norm)
        return raw[0] if input_is_1d else raw

    if y is None:
        raise ValueError("Either y or S must be provided")
    _validate_stft_params(n_fft, hop_length, win_length, pad_mode)
    y, input_is_1d = _as_batched(y, n_fft, center)
    win = _get_padded_window(window, win_length, n_fft)
    raw = filterbank_spectrogram(
        y,
        win,
        fb,
        n_fft=n_fft,
        hop_length=hop_length,
        center=center,
        pad_mode=pad_mode,
        power=power,
        fft_mode=fft_mode,
        use_pallas=use_pallas,
    )
    raw = _normalize_frames(raw, norm)
    return raw[0] if input_is_1d else raw


@jax.jit
def _apply_chroma_fb(S: jax.Array, fb: jax.Array) -> jax.Array:
    from .._config import MATMUL_PRECISION

    return jnp.matmul(fb, S, precision=MATMUL_PRECISION)


@table_cache("cq_to_chroma", maxsize=FILTERBANK_CACHE_SIZE)
def _cq_to_chroma_table(
    n_bins: int, bins_per_octave: int, n_chroma: int, fmin: float,
    base_c: bool,
) -> np.ndarray:
    """(n_chroma, n_bins) aggregation matrix folding CQT bins onto pitch
    classes (librosa `filters.cq_to_chroma` semantics for the common case
    ``bins_per_octave % n_chroma == 0``): each CQT bin contributes its
    energy to the class of its center frequency; merged bins average."""
    if bins_per_octave % n_chroma != 0:
        raise ValueError(
            f"bins_per_octave ({bins_per_octave}) must be a multiple of "
            f"n_chroma ({n_chroma})"
        )
    merge = bins_per_octave // n_chroma
    # chroma class of bin 0 from its frequency relative to C (class 0)
    from .cqt import _C1

    midi_off = 12.0 * np.log2(fmin / _C1)  # semitones above C1
    class0 = (midi_off * n_chroma / 12.0) % n_chroma
    M = np.zeros((n_chroma, n_bins), dtype=np.float64)
    for b in range(n_bins):
        c = (class0 + b / merge) % n_chroma
        lo = int(np.floor(c)) % n_chroma
        frac = c - np.floor(c)
        # linear split between adjacent classes for detuned anchors
        M[lo, b] += (1.0 - frac) / merge
        M[(lo + 1) % n_chroma, b] += frac / merge
    if not base_c:
        # rotate class 0 from C to A
        M = np.roll(M, 3 * (n_chroma // 12), axis=0)
    return M


def chroma_cqt(
    y: ArrayLike,
    sr: int = 22050,
    hop_length: int = 512,
    fmin: float | None = None,
    n_bins: int = 84,
    bins_per_octave: int = 12,
    tuning: float = 0.0,
    n_chroma: int = 12,
    norm: float | None = np.inf,
    base_c: bool = True,
) -> jax.Array:
    """Chromagram from the constant-Q transform,
    ``(n_chroma, F)`` / ``(batch, n_chroma, F)``.

    librosa `feature.chroma_cqt` semantics: ``|CQT|`` energies folded onto
    pitch classes by a cached aggregation matrix, then per-frame
    normalized like :func:`chroma_stft`. Sharper low-frequency class
    separation than the STFT chromagram (constant-Q resolution follows
    the semitone grid).
    """
    from .cqt import _C1, cqt

    if fmin is None:
        fmin = _C1
    C = cqt(
        y,
        sr=sr,
        hop_length=hop_length,
        fmin=fmin,
        n_bins=n_bins,
        bins_per_octave=bins_per_octave,
        tuning=tuning,
    )
    M = _cq_to_chroma_table(
        int(n_bins), int(bins_per_octave), int(n_chroma), float(fmin),
        bool(base_c),
    )
    raw = _apply_chroma_fb(jnp.abs(C), M)
    raw = _normalize_frames(raw, norm)
    return raw


@table_cache("tonnetz_basis", maxsize=4)
def _tonnetz_basis(n_chroma: int) -> np.ndarray:
    """Harmonic-network projection ``(6, n_chroma)`` (host f64, cached).

    librosa `feature.tonnetz` transformation: three circles — perfect
    fifths (r=1), minor thirds (r=1), major thirds (r=0.5) — each as a
    (sin, cos) coordinate pair over the chroma circle.
    """
    dim_map = np.linspace(0, 12, num=n_chroma, endpoint=False)
    scale = np.asarray([7.0 / 6, 7.0 / 6, 3.0 / 2, 3.0 / 2, 2.0 / 3, 2.0 / 3])
    V = np.multiply.outer(scale, dim_map)
    # even rows are the sin-phase coordinates
    V[::2] -= 0.5
    R = np.asarray([1.0, 1.0, 1.0, 1.0, 0.5, 0.5])
    return (R[:, None] * np.cos(np.pi * V)).astype(np.float32)


@jax.jit
def _tonnetz_core(chroma: jax.Array, phi: jax.Array) -> jax.Array:
    # librosa normalizes the chromagram to unit l1 per frame before the
    # projection
    l1 = jnp.sum(jnp.abs(chroma), axis=-2, keepdims=True)
    tiny = jnp.asarray(np.finfo(np.float32).tiny, REAL_DTYPE)
    cn = chroma / jnp.where(l1 < tiny, 1.0, l1)
    return jnp.einsum(
        "dc,...cf->...df", phi, cn, precision=MATMUL_PRECISION
    ).astype(REAL_DTYPE)


def tonnetz(
    y: ArrayLike | None = None,
    sr: int = 22050,
    chroma: ArrayLike | None = None,
    **chroma_cqt_kwargs,
) -> jax.Array:
    """Tonal-centroid features (tonnetz), ``(6, F)`` / ``(batch, 6, F)``.

    librosa `feature.tonnetz` semantics (Harte/Sandler/Gasser 2006): the
    l1-normalized chromagram projected onto the 6-D harmonic network —
    (sin, cos) pairs for the circles of fifths, minor thirds, and major
    thirds. ``chroma`` may be precomputed (same protocol as the S-or-y
    features); otherwise it is derived via :func:`chroma_cqt` with
    ``**chroma_cqt_kwargs``.

    Beyond-parity feature (the reference's roadmap family,
    `/root/reference/ARCHITECTURE.md` "Potential Features"); one cached
    (6, n_chroma) table + one jitted matmul.
    """
    if chroma is None:
        if y is None:
            raise ValueError("Either y (audio) or chroma must be provided")
        chroma = chroma_cqt(y, sr=sr, **chroma_cqt_kwargs)
    else:
        chroma = jnp.asarray(chroma, dtype=REAL_DTYPE)
    if chroma.ndim not in (2, 3):
        raise ValueError(
            f"tonnetz expects a 2-D or 3-D chromagram, got {chroma.ndim}-D"
        )
    phi = _tonnetz_basis(int(chroma.shape[-2]))
    return _tonnetz_core(chroma, phi)


_CENS_STEPS = (0.05, 0.1, 0.2, 0.4)
_CENS_WEIGHTS = (0.25, 0.25, 0.25, 0.25)


@partial(jax.jit, static_argnames=("win_len_smooth", "smoothing_window"))
def _cens_core(
    chroma: jax.Array, *, win_len_smooth: int | None, smoothing_window: str
) -> jax.Array:
    tiny = jnp.asarray(np.finfo(np.float32).tiny, REAL_DTYPE)
    # l1 per frame
    l1 = jnp.sum(jnp.abs(chroma), axis=-2, keepdims=True)
    cn = chroma / jnp.where(l1 < tiny, 1.0, l1)
    # amplitude quantization: staircase of thresholded indicators
    q = sum(
        w * (cn > s).astype(REAL_DTYPE)
        for s, w in zip(_CENS_STEPS, _CENS_WEIGHTS)
    )
    if win_len_smooth:
        from .windows import get_window

        win = get_window(smoothing_window, win_len_smooth + 2, fftbins=False)
        win = win / jnp.sum(win)
        pad = (win_len_smooth + 2) // 2
        is_batched = q.ndim == 3
        qb = q if is_batched else q[None]
        qp = jnp.pad(qb, ((0, 0), (0, 0), (pad, pad)))
        # time smoothing: one depthwise conv over frames
        out = jax.lax.conv_general_dilated(
            qp.reshape(-1, 1, qp.shape[-1]),
            win[None, None, :],
            window_strides=(1,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        q = out.reshape(qb.shape[:-1] + (out.shape[-1],))[
            ..., : qb.shape[-1]
        ]
        if not is_batched:
            q = q[0]
    # final l2 per frame
    l2 = jnp.sqrt(jnp.sum(q * q, axis=-2, keepdims=True))
    return (q / jnp.where(l2 < tiny, 1.0, l2)).astype(REAL_DTYPE)


def chroma_cens(
    y: ArrayLike | None = None,
    sr: int = 22050,
    chroma: ArrayLike | None = None,
    win_len_smooth: int | None = 41,
    smoothing_window: str = "hann",
    **chroma_cqt_kwargs,
) -> jax.Array:
    """CENS chroma (Chroma Energy Normalized Statistics), librosa
    `feature.chroma_cens` semantics (Mueller & Ewert 2011): l1-normalize
    the CQT chromagram, quantize amplitudes through the published
    (0.05/0.1/0.2/0.4 -> 0.25 each) staircase, smooth over time with a
    ``hann(win_len_smooth + 2)`` window, l2-normalize per frame.

    Tempo/articulation-robust features for music matching. Fully
    vectorized: the quantization staircase is four thresholded masks, the
    smoothing one depthwise convolution over frames. ``chroma`` may be
    precomputed (pre-normalization chromagram, e.g.
    ``chroma_cqt(..., norm=None)``); otherwise derived via
    :func:`chroma_cqt` with ``**chroma_cqt_kwargs``.
    """
    if chroma is None:
        if y is None:
            raise ValueError("Either y (audio) or chroma must be provided")
        chroma_cqt_kwargs.setdefault("norm", None)
        chroma = chroma_cqt(y, sr=sr, **chroma_cqt_kwargs)
    else:
        chroma = jnp.asarray(chroma, dtype=REAL_DTYPE)
    if chroma.ndim not in (2, 3):
        raise ValueError(
            f"chroma_cens expects a 2-D or 3-D chromagram, got {chroma.ndim}-D"
        )
    if win_len_smooth is not None:
        validate_positive(int(win_len_smooth), "win_len_smooth")
    return _cens_core(
        chroma,
        win_len_smooth=None if win_len_smooth is None else int(win_len_smooth),
        smoothing_window=smoothing_window,
    )


def chroma_vqt(
    y: ArrayLike,
    sr: int = 22050,
    hop_length: int = 512,
    fmin: float | None = None,
    n_bins: int = 84,
    gamma: float | None = None,
    bins_per_octave: int = 12,
    tuning: float = 0.0,
    n_chroma: int = 12,
    norm: float | None = np.inf,
    base_c: bool = True,
) -> jax.Array:
    """Chromagram from the variable-Q transform,
    ``(n_chroma, F)`` / ``(batch, n_chroma, F)``.

    Like :func:`chroma_cqt` but over :func:`~.cqt.vqt` — the default
    ERB-tracking ``gamma`` trades low-octave frequency selectivity for
    much better time resolution, which sharpens chroma onsets on
    percussive material. Same pitch-class aggregation table and
    per-frame normalization.
    """
    from .cqt import _C1, vqt

    if fmin is None:
        fmin = _C1
    V = vqt(
        y,
        sr=sr,
        hop_length=hop_length,
        fmin=fmin,
        n_bins=n_bins,
        gamma=gamma,
        bins_per_octave=bins_per_octave,
        tuning=tuning,
    )
    M = _cq_to_chroma_table(
        int(n_bins), int(bins_per_octave), int(n_chroma), float(fmin),
        bool(base_c),
    )
    raw = _apply_chroma_fb(jnp.abs(V), M)
    return _normalize_frames(raw, norm)
