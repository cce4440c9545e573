"""Rhythm analysis: autocorrelation tempogram and global tempo estimation.

Companion to :mod:`.onset` (the reference's "Onset detection" roadmap item
carried to its natural conclusion). librosa-compatible semantics
(`librosa.feature.tempogram` / `librosa.feature.rhythm.tempo`): local
onset-envelope autocorrelation per frame, and a log-normal-prior argmax
over the aggregated tempogram for the global BPM.

TPU-native design: the tempogram is the same framewise Wiener-Khinchin ACF
machinery as :mod:`.pitch` — every envelope frame transforms at once via
the packed pow2 rfft, one jitted program, no per-frame Python. The hop
between tempogram frames is 1 envelope frame (librosa's), so framing uses
the library's shared chunk-algebra gather.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .._config import REAL_DTYPE
from ..kernels.bluestein import _next_pow2, rfft_power_len
from ..utils.validation import validate_positive
from ._frames import frame_signal_batched
from .onset import onset_strength

ArrayLike = Any


def tempo_frequencies(
    n: int, hop_length: int = 512, sr: int = 22050
) -> np.ndarray:
    """BPM value of each tempogram lag bin (host float64).

    Lag ``i`` frames spans ``i * hop / sr`` seconds -> ``60 * sr / (hop*i)``
    BPM; bin 0 is +inf (librosa convention).
    """
    bins = np.arange(n, dtype=np.float64)
    with np.errstate(divide="ignore"):
        return 60.0 * sr / (hop_length * bins)


@partial(jax.jit, static_argnames=("win_length",))
def _tempogram_core(env: jax.Array, *, win_length: int) -> jax.Array:
    """(B, F) envelope -> (B, win_length, F) normalized local ACF."""
    lo = win_length // 2
    hi = win_length - 1 - lo  # frames tile to exactly F windows
    env = jnp.pad(env, ((0, 0), (lo, hi)), mode="linear_ramp",
                  end_values=0.0)
    frames = frame_signal_batched(env, win_length, 1)  # (B, F, win)
    n = np.hanning(win_length)  # symmetric hann, f64 host table
    frames = frames * jnp.asarray(n, REAL_DTYPE)
    n_fft = _next_pow2(2 * win_length - 1)
    frames = jnp.pad(frames, ((0, 0), (0, 0), (0, n_fft - win_length)))
    power = rfft_power_len(frames, n_fft)
    ac = jnp.fft.irfft(power, n=n_fft, axis=-1)[..., :win_length]
    # per-frame inf-norm (librosa util.normalize(norm=inf, axis=-2 after
    # transpose)); guarded for silent frames
    peak = jnp.max(jnp.abs(ac), axis=-1, keepdims=True)
    tiny = jnp.asarray(np.finfo(np.float32).tiny, REAL_DTYPE)
    ac = ac / jnp.where(peak < tiny, 1.0, peak)
    return jnp.swapaxes(ac, 1, 2).astype(REAL_DTYPE)  # (B, win, F)


def tempogram(
    y: ArrayLike | None = None,
    sr: int = 22050,
    onset_envelope: ArrayLike | None = None,
    hop_length: int = 512,
    win_length: int = 384,
    **strength_kwargs: Any,
) -> jax.Array:
    """Local ACF tempogram ``(win_length, F)`` / ``(B, win_length, F)``.

    Row ``i`` is the onset envelope's autocorrelation at a lag of ``i``
    frames (tempo ``tempo_frequencies(win_length, hop_length, sr)[i]``
    BPM), computed in a centered ``win_length``-frame hann window around
    each frame (linear-ramp edge padding, librosa semantics), inf-norm
    normalized per frame.
    """
    validate_positive(win_length, "win_length")
    if onset_envelope is None:
        if y is None:
            raise ValueError("Either y or onset_envelope must be provided")
        onset_envelope = onset_strength(
            y, sr=sr, hop_length=hop_length, **strength_kwargs
        )
    env = jnp.asarray(onset_envelope, dtype=REAL_DTYPE)
    input_is_1d = env.ndim == 1
    if input_is_1d:
        env = env[None]
    tg = _tempogram_core(env, win_length=int(win_length))
    return tg[0] if input_is_1d else tg


def tempo(
    y: ArrayLike | None = None,
    sr: int = 22050,
    onset_envelope: ArrayLike | None = None,
    hop_length: int = 512,
    start_bpm: float = 120.0,
    std_bpm: float = 1.0,
    ac_size: float = 8.0,
    max_tempo: float | None = 320.0,
    aggregate: bool = True,
    **strength_kwargs: Any,
) -> np.ndarray:
    """Tempo estimate in BPM (host array).

    librosa `feature.rhythm.tempo` semantics: the tempogram (window
    ``ac_size`` seconds) is averaged over time, weighted by a log-normal
    prior centered at ``start_bpm`` with spread ``std_bpm`` octaves, and
    the best lag wins; candidates at or above ``max_tempo`` are excluded.

    ``aggregate=True`` (default, librosa's ``aggregate=np.mean``) gives
    one global estimate, shape ``(1,)`` / ``(B, 1)``;
    ``aggregate=False`` (librosa ``aggregate=None``) scores every frame's
    tempogram column independently -> per-frame tempo, shape ``(F,)`` /
    ``(B, F)`` — the time-varying-tempo tracker.
    """
    validate_positive(start_bpm, "start_bpm")
    validate_positive(std_bpm, "std_bpm")
    validate_positive(ac_size, "ac_size")
    win_length = max(int(ac_size * sr // hop_length), 2)
    tg = tempogram(
        y=y,
        sr=sr,
        onset_envelope=onset_envelope,
        hop_length=hop_length,
        win_length=win_length,
        **strength_kwargs,
    )
    input_is_1d = tg.ndim == 2
    if input_is_1d:
        tg = tg[None]
    if aggregate:
        ac = np.asarray(jnp.mean(tg, axis=-1))  # (B, win)
    else:
        ac = np.swapaxes(np.asarray(tg), 1, 2)  # (B, F, win)

    bpms = tempo_frequencies(win_length, hop_length, sr)
    with np.errstate(divide="ignore"):
        logprior = -0.5 * ((np.log2(bpms) - np.log2(start_bpm)) / std_bpm) ** 2
    if max_tempo is not None:
        logprior[bpms >= max_tempo] = -np.inf
    logprior[0] = -np.inf  # lag 0 = infinite BPM
    best = np.argmax(np.log1p(1e6 * np.maximum(ac, 0.0)) + logprior,
                     axis=-1)
    out = bpms[best] if not aggregate else bpms[best][:, None]
    return out[0] if input_is_1d else out


def fourier_tempogram(
    y: ArrayLike | None = None,
    sr: int = 22050,
    onset_envelope: ArrayLike | None = None,
    hop_length: int = 512,
    win_length: int = 384,
    center: bool = True,
    window: str = "hann",
    **strength_kwargs: Any,
) -> jax.Array:
    """Fourier tempogram: complex STFT of the onset envelope,
    ``(1 + win_length//2, F)`` / ``(B, 1 + win_length//2, F)``.

    librosa `feature.fourier_tempogram` semantics: the envelope's
    short-time spectrum at an envelope hop of ONE frame, so bin ``k``
    oscillates at ``k * sr / (hop_length * win_length)`` Hz — i.e. tempo
    ``60 * k * sr / (hop_length * win_length)`` BPM. Complements the ACF
    :func:`tempogram` (same windowing convention, frequency- instead of
    lag-axis).

    Complex output: on restricted remote runtimes fetch ``jnp.abs`` of it
    (see the :func:`~.cqt.cqt` note).
    """
    from .stft import stft as _stft

    validate_positive(win_length, "win_length")
    if onset_envelope is None:
        if y is None:
            raise ValueError("Either y or onset_envelope must be provided")
        onset_envelope = onset_strength(
            y, sr=sr, hop_length=hop_length, **strength_kwargs
        )
    env = jnp.asarray(onset_envelope, dtype=REAL_DTYPE)
    if center:
        # librosa pads the envelope itself with mode='linear_ramp'
        # (end_values=0) and runs an UNcentered stft, so boundary frames
        # taper linearly instead of stepping to zero.
        pad = [(0, 0)] * (env.ndim - 1) + [(win_length // 2,) * 2]
        env = jnp.pad(env, pad, mode="linear_ramp", end_values=0.0)
    return _stft(
        env, n_fft=win_length, hop_length=1, window=window, center=False,
        pad_mode="constant",
    )
