"""Time-scale and pitch effects: ``phase_vocoder`` / ``time_stretch`` /
``pitch_shift``.

librosa's ``effects`` time/pitch family is absent from the reference library;
like mel inversion (`inverse.py`) it is a natural completion of this
framework's reconstruction stack (stft, istft, resample, griffinlim).

TPU-first phase vocoder: librosa runs a sequential Python loop over output
frames, carrying a phase accumulator. The accumulator is really a prefix sum
— ``acc[t] = angle(D[..., 0]) + sum_{tau<t} (phi_advance + dphase[tau])`` —
and ``dphase`` depends only on the (static) input columns, never on the
accumulator. So the whole vocoder vectorizes into one jitted program: two
gathers, elementwise phase arithmetic, and a single ``cumsum`` over frames.
No scan, no host loop.

Precision: the linear part of the accumulator, ``t * phi_advance``, grows to
~1e6 radians (pi * hop_length per hop at the top bin), where float32 carries
~0.1 rad of rounding — audible phase noise. It is split out and reduced
mod 2*pi exactly in float64 on the host at trace time; only the bounded,
zero-mean deviation term is cumsum-accumulated in float32 on device.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from .._config import COMPLEX_DTYPE, REAL_DTYPE
from ..utils.validation import validate_positive
from .resample import resample as _resample
from .stft import istft, stft

ArrayLike = Any

__all__ = ["phase_vocoder", "time_stretch", "pitch_shift"]

_TWO_PI = 2.0 * np.pi


@lru_cache(maxsize=32)
def _pv_tables(
    n_bins: int, n_frames: int, hop_length: int, rate: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Static (idx, alpha, phi_advance, linear_phase_mod_2pi) for a config.

    ``linear_phase`` is the accumulated per-hop expected advance
    ``t * phi_advance`` reduced mod 2*pi in float64 — exact where a float32
    running sum would drift by ~0.1 rad over a thousand frames.
    """
    time_steps = np.arange(0, n_frames, rate, dtype=np.float64)
    idx = np.floor(time_steps).astype(np.int32)
    alpha = (time_steps - idx).astype(np.float32)
    phi_advance = np.linspace(0.0, np.pi * hop_length, n_bins, dtype=np.float64)
    t = np.arange(len(time_steps), dtype=np.float64)
    linear = np.mod(phi_advance[:, None] * t[None, :], _TWO_PI)
    # the deviation wrap is mod-2pi invariant, so the device only ever needs
    # phi_advance mod 2pi — subtracting the raw ~pi*hop_length value in
    # float32 would lose ~5e-5 rad per step and accumulate systematically
    phi_mod = np.mod(phi_advance, _TWO_PI)
    return (
        idx,
        alpha,
        phi_mod.astype(np.float32),
        linear.astype(np.float32),
    )


@jax.jit
def _pv_core(
    D: jax.Array,  # (B, n_bins, n_frames) complex
    idx: jax.Array,  # (T,) int32 — floor of the fractional frame positions
    alpha: jax.Array,  # (T,) float32 — fractional parts
    phi_mod: jax.Array,  # (n_bins,) float32 — per-hop phase advance mod 2pi
    linear_phase: jax.Array,  # (n_bins, T) float32 — (t * phi_advance) mod 2pi
) -> jax.Array:
    # two trailing zero frames so idx+1 never reads past the end
    # (librosa pads the same way before its loop)
    Dp = jnp.pad(D, ((0, 0), (0, 0), (0, 2)))
    c0 = Dp[..., idx]  # (B, n_bins, T)
    c1 = Dp[..., idx + 1]
    mag = (1.0 - alpha) * jnp.abs(c0) + alpha * jnp.abs(c1)
    ang0 = jnp.angle(c0)
    ang1 = jnp.angle(c1)
    # deviation of the observed hop-to-hop phase step from the bin's
    # expected advance, wrapped to [-pi, pi] (librosa's princarg)
    dphase = ang1 - ang0 - phi_mod[:, None]
    dphase = dphase - _TWO_PI * jnp.round(dphase / _TWO_PI)
    # accumulator = initial phase + exact linear advance + prefix sum of the
    # bounded deviations (acc[t] uses deviations of steps 0..t-1)
    dev = jnp.concatenate(
        [jnp.zeros_like(dphase[..., :1]), jnp.cumsum(dphase[..., :-1], axis=-1)],
        axis=-1,
    )
    acc = jnp.angle(D[..., :1]) + linear_phase + dev
    return (mag * jnp.exp(1j * acc)).astype(COMPLEX_DTYPE)


def phase_vocoder(
    D: ArrayLike,
    rate: float,
    hop_length: int | None = None,
    n_fft: int | None = None,
) -> jax.Array:
    """Time-stretch an STFT by ``rate`` without changing pitch.

    librosa-compatible semantics (``librosa.phase_vocoder``): magnitudes are
    linearly interpolated at fractional frame positions ``arange(0, F, rate)``
    and phases advance by each bin's expected per-hop rotation plus the
    wrapped deviation observed in the input. ``rate > 1`` speeds up (fewer
    output frames), ``rate < 1`` slows down.

    ``D`` is ``(n_fft//2+1, F)`` or ``(batch, n_fft//2+1, F)`` complex;
    the output has ``ceil(F / rate)`` frames.
    """
    validate_positive(rate, "rate")
    D = jnp.asarray(D)
    if D.ndim not in (2, 3):
        raise ValueError(f"D must be 2-D or 3-D, got shape {D.shape}")
    if not jnp.issubdtype(D.dtype, jnp.complexfloating):
        D = D.astype(COMPLEX_DTYPE)
    input_is_2d = D.ndim == 2
    if input_is_2d:
        D = D[None]
    n_bins, n_frames = D.shape[-2], D.shape[-1]
    if n_fft is None:
        n_fft = 2 * (n_bins - 1)
    if hop_length is None:
        hop_length = n_fft // 4
    validate_positive(hop_length, "hop_length")
    idx, alpha, phi, linear = _pv_tables(
        n_bins, n_frames, hop_length, float(rate)
    )
    out = _pv_core(
        D,
        jnp.asarray(idx),
        jnp.asarray(alpha),
        jnp.asarray(phi),
        jnp.asarray(linear),
    )
    return out[0] if input_is_2d else out


def time_stretch(
    y: ArrayLike,
    rate: float,
    n_fft: int = 2048,
    hop_length: int | None = None,
    win_length: int | None = None,
    window: str | ArrayLike = "hann",
    center: bool = True,
    pad_mode: str = "constant",
) -> jax.Array:
    """Stretch audio in time by ``rate`` (pitch preserved).

    ``librosa.effects.time_stretch`` pipeline: STFT -> phase vocoder ->
    ISTFT cropped to ``round(len(y) / rate)`` samples. ``rate > 1`` shortens,
    ``rate < 1`` lengthens. Input ``(samples,)`` or ``(batch, samples)``.
    """
    validate_positive(rate, "rate")
    y = jnp.asarray(y, dtype=REAL_DTYPE)
    if hop_length is None:
        hop_length = n_fft // 4
    D = stft(
        y, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
        window=window, center=center, pad_mode=pad_mode,
    )
    D_stretch = phase_vocoder(D, rate, hop_length=hop_length, n_fft=n_fft)
    len_stretch = int(round(y.shape[-1] / rate))
    return istft(
        D_stretch, hop_length=hop_length, win_length=win_length, n_fft=n_fft,
        window=window, center=center, length=len_stretch,
    )


def _fix_length(y: jax.Array, size: int) -> jax.Array:
    """Crop or zero-pad the last axis to exactly ``size`` samples."""
    n = y.shape[-1]
    if n == size:
        return y
    if n > size:
        return y[..., :size]
    pad = [(0, 0)] * (y.ndim - 1) + [(0, size - n)]
    return jnp.pad(y, pad)


def pitch_shift(
    y: ArrayLike,
    sr: int,
    n_steps: float,
    bins_per_octave: int = 12,
    res_type: str = "fft",
    n_fft: int = 2048,
    hop_length: int | None = None,
    win_length: int | None = None,
    window: str | ArrayLike = "hann",
    center: bool = True,
    pad_mode: str = "constant",
) -> jax.Array:
    """Shift pitch by ``n_steps`` steps (``bins_per_octave`` per octave),
    preserving duration.

    ``librosa.effects.pitch_shift`` pipeline: time-stretch by
    ``2**(-n_steps/bins_per_octave)``, resample back to ``sr``, fix the
    length to the input's. ``n_steps`` may be fractional and negative.
    """
    validate_positive(sr, "sr")
    validate_positive(bins_per_octave, "bins_per_octave")
    y = jnp.asarray(y, dtype=REAL_DTYPE)
    if float(n_steps) == 0.0:
        return y
    rate = 2.0 ** (-float(n_steps) / bins_per_octave)
    y_stretch = time_stretch(
        y, rate, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
        window=window, center=center, pad_mode=pad_mode,
    )
    y_shift = _resample(y_stretch, sr / rate, sr, res_type=res_type)
    return _fix_length(y_shift, y.shape[-1])


def _nonsilent_frames(
    y: jax.Array,
    frame_length: int,
    hop_length: int,
    top_db: float,
    ref: float | None,
) -> np.ndarray:
    """Boolean per-frame "above the silence threshold" mask (host numpy).

    librosa `effects._signal_to_frame_nonsilent` semantics: framewise mean
    square energy vs ``top_db`` below the reference power (default: the
    peak frame energy, aggregated over any leading channel axes). The
    energy computation is one jitted device program (:func:`~.framing.rms`);
    only the boolean mask and the ragged interval extraction touch the
    host — event boundaries are inherently ragged output.
    """
    from .convert import power_to_db
    from .framing import rms

    if top_db <= 0:
        raise ValueError(f"top_db must be positive, got {top_db}")
    mse = rms(y, frame_length=frame_length, hop_length=hop_length) ** 2
    ref_power = float(jnp.max(mse)) if ref is None else float(ref) ** 2
    db = np.asarray(power_to_db(mse[..., 0, :], ref=ref_power, top_db=None))
    if db.ndim > 1:
        db = db.max(axis=tuple(range(db.ndim - 1)))
    return db > -float(top_db)


def trim(
    y: ArrayLike,
    top_db: float = 60.0,
    ref: float | None = None,
    frame_length: int = 2048,
    hop_length: int = 512,
) -> tuple[jax.Array, np.ndarray]:
    """Trim leading/trailing silence: ``(y_trimmed, [start, end])``.

    librosa `effects.trim` semantics: frames whose energy sits more than
    ``top_db`` below the reference (default: the peak frame energy) are
    silent; the returned slice spans the first through last non-silent
    frame, converted to samples (``end`` exclusive, clipped to the signal).
    An all-silent signal returns an empty slice and ``[0, 0]``.

    Beyond-parity feature (reference has no effects module); batched input
    trims ALL leading axes by the aggregated (max-over-batch) mask, exactly
    like librosa's multi-channel handling.
    """
    validate_positive(frame_length, "frame_length")
    validate_positive(hop_length, "hop_length")
    y = jnp.asarray(y, dtype=REAL_DTYPE)
    non_silent = _nonsilent_frames(y, frame_length, hop_length, top_db, ref)
    nz = np.flatnonzero(non_silent)
    if nz.size:
        start = int(nz[0]) * hop_length
        end = min(int(y.shape[-1]), (int(nz[-1]) + 1) * hop_length)
    else:
        start = end = 0
    idx = (slice(None),) * (y.ndim - 1) + (slice(start, end),)
    return y[idx], np.asarray([start, end])


def split(
    y: ArrayLike,
    top_db: float = 60.0,
    ref: float | None = None,
    frame_length: int = 2048,
    hop_length: int = 512,
) -> np.ndarray:
    """Non-silent intervals ``(n_intervals, 2)`` in samples (end exclusive).

    librosa `effects.split` semantics: maximal runs of frames above the
    silence threshold, edges converted to samples and clipped to the
    signal length. Interval lists are inherently ragged, so this is a host
    boundary by design (the energy computation itself is on-device).
    """
    validate_positive(frame_length, "frame_length")
    validate_positive(hop_length, "hop_length")
    y = jnp.asarray(y, dtype=REAL_DTYPE)
    non_silent = _nonsilent_frames(y, frame_length, hop_length, top_db, ref)
    edges = np.flatnonzero(np.diff(non_silent.astype(np.int8))) + 1
    parts = [edges]
    if non_silent.size and non_silent[0]:
        parts.insert(0, np.asarray([0]))
    if non_silent.size and non_silent[-1]:
        parts.append(np.asarray([non_silent.size]))
    edges = np.concatenate(parts) if parts else np.empty(0, np.int64)
    samples = np.minimum(edges * hop_length, int(y.shape[-1]))
    return samples.reshape(-1, 2)


def remix(
    y: ArrayLike, intervals: ArrayLike, align_zeros: bool = True
) -> jax.Array:
    """Re-order a signal by concatenating the given sample intervals
    (librosa `effects.remix` semantics): the shuffle/loop primitive that
    pairs with :func:`split` and beat intervals.

    ``align_zeros`` snaps each boundary to the nearest zero crossing of
    the (first-channel) signal, suppressing clicks at the joins. Interval
    lists are ragged, so assembly happens on the host; the result is a
    device array.
    """
    y = jnp.asarray(y, dtype=REAL_DTYPE)
    yh = np.asarray(y)
    n = yh.shape[-1]
    iv = np.asarray(intervals, dtype=np.int64)
    if iv.ndim != 2 or iv.shape[1] != 2:
        raise ValueError(
            f"intervals must be (n_intervals, 2), got {tuple(iv.shape)}"
        )
    if np.any(iv < 0) or np.any(iv > n):
        raise ValueError(f"interval bounds out of range for length {n}")
    if align_zeros and n > 1:
        mono = yh.reshape(-1, n)[0]
        zc = np.flatnonzero(np.abs(np.diff(np.signbit(mono))) > 0)
        if zc.size:
            snapped = zc[
                np.clip(np.searchsorted(zc, iv.ravel()), 0, zc.size - 1)
            ].reshape(iv.shape)
            iv = np.minimum(snapped, n)
    parts = [yh[..., a:b] for a, b in iv if b > a]
    if not parts:
        return jnp.zeros(yh.shape[:-1] + (0,), REAL_DTYPE)
    return jnp.asarray(np.concatenate(parts, axis=-1))
