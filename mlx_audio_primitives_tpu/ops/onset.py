"""Onset strength envelope and onset detection.

Beyond-parity feature: the reference lists "Onset detection - Event
detection primitives" as unbuilt future work (`/root/reference/
ARCHITECTURE.md` "Potential Features"). librosa-compatible semantics
(`librosa.onset.onset_strength` / `onset_detect` signatures and the
spectral-flux + peak-pick algorithm).

TPU-native design: the whole strength envelope is one jitted program — the
log-mel frontend rides the fused radix kernel via
:func:`~.mel.melspectrogram`, the ``max_size`` frequency-local reference is
a `lax.reduce_window` max-pool, and the rectified flux is a shifted
subtraction. Peak picking vectorizes librosa's five conditions: the
pre/post-max and pre/post-mean windows are reduce_window max/mean pools
(ragged edge windows handled exactly via a mask-count division), and only
the sequential ``wait`` debounce runs as a `lax.scan` over frames — O(F)
scalar work, everything else stays on the VPU.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .._config import REAL_DTYPE
from ..utils.validation import validate_non_negative, validate_positive
from .convert import power_to_db
from .mel import melspectrogram

ArrayLike = Any


@partial(jax.jit, static_argnames=("lag", "max_size", "detrend", "center_pad"))
def _onset_strength_core(
    S_db: jax.Array, *, lag: int, max_size: int, detrend: bool, center_pad: int
) -> jax.Array:
    """(B, n_mels, F) dB spectrogram -> (B, F) onset envelope."""
    ref = S_db
    if max_size > 1:
        # librosa: scipy.ndimage.maximum_filter(size=(max_size, 1)) over the
        # frequency axis — centered window, rank max_size//2 to the left
        # (scipy centers even sizes on origin-left), 'reflect'-free constant
        # edges are wrong: scipy uses reflect; max-pool with edge padding
        # equals reflect for max (the boundary value dominates its mirror).
        lo = max_size // 2
        hi = max_size - 1 - lo
        ref = jnp.pad(S_db, ((0, 0), (lo, hi), (0, 0)), mode="edge")
        ref = jax.lax.reduce_window(
            ref,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=(1, max_size, 1),
            window_strides=(1, 1, 1),
            padding="VALID",
        )
    # rectified spectral flux with lag
    diff = jnp.maximum(0.0, S_db[..., lag:] - ref[..., :-lag])
    env = jnp.mean(diff, axis=-2)  # aggregate over frequency (B, F-lag)
    # alignment: the lost `lag` frames are always re-padded at the START;
    # centering adds n_fft//(2*hop) more so peaks line up with the centered
    # frames that caused them, then truncates back to the original count.
    F = env.shape[-1] + lag
    env = jnp.pad(env, ((0, 0), (lag + center_pad, 0)))
    if center_pad > 0:
        env = env[..., :F]
    if detrend:
        # linear detrend (scipy.signal.detrend type='linear'): closed-form
        # least-squares line fit over the frame axis, subtracted.
        n = env.shape[-1]
        x = jnp.arange(n, dtype=REAL_DTYPE)
        xm = (n - 1) / 2.0
        xc = x - xm
        denom = jnp.sum(xc * xc)
        ym = jnp.mean(env, axis=-1, keepdims=True)
        slope = jnp.sum(env * xc, axis=-1, keepdims=True) / denom
        env = env - (ym + slope * xc)
    return env.astype(REAL_DTYPE)


def onset_strength(
    y: ArrayLike | None = None,
    sr: int = 22050,
    S: ArrayLike | None = None,
    lag: int = 1,
    max_size: int = 1,
    detrend: bool = False,
    center: bool = True,
    n_fft: int = 2048,
    hop_length: int = 512,
    n_mels: int = 128,
    fmin: float = 0.0,
    fmax: float | None = None,
    use_pallas: bool | None = None,
) -> jax.Array:
    """Spectral-flux onset strength envelope, ``(n_frames,)`` / ``(B, F)``.

    librosa-compatible (`librosa.onset.onset_strength`): rectified first
    difference of the dB mel spectrogram, averaged over mel bands. With
    ``max_size > 1`` the reference for the difference is a max-filter over
    frequency (vibrato suppression, superflux). The ``lag`` frames lost to
    the difference are re-padded at the start; ``center=True`` adds
    ``n_fft // (2*hop_length)`` more and truncates back to the original
    frame count so peaks line up with their causal centered frames. ``S``
    bypasses the mel frontend: a precomputed dB spectrogram
    ``(..., n_bands, F)``.
    """
    validate_positive(lag, "lag")
    validate_positive(max_size, "max_size")
    if S is None:
        if y is None:
            raise ValueError("Either y or S must be provided")
        M = melspectrogram(
            y,
            sr=sr,
            n_fft=n_fft,
            hop_length=hop_length,
            n_mels=n_mels,
            fmin=fmin,
            fmax=fmax,
            use_pallas=use_pallas,
        )
        # per-signal dB clip: top_db references each element's own max
        # (librosa processes one signal at a time; a whole-batch max would
        # couple batch elements through the clip)
        S_db = jax.vmap(power_to_db)(M) if M.ndim == 3 else power_to_db(M)
    else:
        S_db = jnp.asarray(S, dtype=REAL_DTYPE)
    input_is_1d = S_db.ndim == 2
    if input_is_1d:
        S_db = S_db[None]
    center_pad = n_fft // (2 * hop_length) if center else 0
    env = _onset_strength_core(
        S_db, lag=lag, max_size=max_size, detrend=detrend, center_pad=center_pad
    )
    return env[0] if input_is_1d else env


def _pool_max(x: jax.Array, before: int, after: int) -> jax.Array:
    """Sliding max over [n-before, n+after] with exact ragged edges."""
    pad = ((0, 0), (before, after))
    xp = jnp.pad(x, pad, constant_values=-jnp.inf)
    return jax.lax.reduce_window(
        xp,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, before + after + 1),
        window_strides=(1, 1),
        padding="VALID",
    )


def _pool_mean(x: jax.Array, before: int, after: int) -> jax.Array:
    """Sliding mean over [n-before, n+after]; edge windows divide by their
    true (clipped) length exactly as NumPy slicing does in librosa."""
    pad = ((0, 0), (before, after))
    xp = jnp.pad(x, pad)
    ones = jnp.pad(jnp.ones_like(x), pad)
    win = (1, before + after + 1)
    s = jax.lax.reduce_window(xp, 0.0, jax.lax.add, win, (1, 1), "VALID")
    c = jax.lax.reduce_window(ones, 0.0, jax.lax.add, win, (1, 1), "VALID")
    return s / c


@partial(jax.jit, static_argnames=("pre_max", "post_max", "pre_avg", "post_avg", "wait"))
def _peak_pick_mask(
    env: jax.Array,
    *,
    pre_max: int,
    post_max: int,
    pre_avg: int,
    post_avg: int,
    delta: float,
    wait: int,
) -> jax.Array:
    """librosa `util.peak_pick` as a boolean mask over frames (B, F).

    Conditions: (1) x[n] == max over [n-pre_max, n+post_max]; (2) x[n] >=
    mean over [n-pre_avg, n+post_avg] + delta; (3) greedy debounce — at
    least ``wait + 1`` frames since the previously accepted peak.
    """
    is_max = env >= _pool_max(env, pre_max, post_max)
    above = env >= _pool_mean(env, pre_avg, post_avg) + delta
    cand = is_max & above

    if wait == 0:
        return cand

    def step(last, c):
        n, ok = c
        take = ok & (n - last > wait)
        last = jnp.where(take, n, last)
        return last, take

    n_idx = jnp.arange(env.shape[-1])

    def row(c_row):
        _, taken = jax.lax.scan(
            step, jnp.asarray(-wait - 1), (n_idx, c_row)
        )
        return taken

    return jax.vmap(row)(cand)


def onset_detect(
    y: ArrayLike | None = None,
    sr: int = 22050,
    onset_envelope: ArrayLike | None = None,
    hop_length: int = 512,
    backtrack: bool = False,
    energy: ArrayLike | None = None,
    units: str = "frames",
    normalize: bool = True,
    pre_max: int | None = None,
    post_max: int | None = None,
    pre_avg: int | None = None,
    post_avg: int | None = None,
    delta: float = 0.07,
    wait: int | None = None,
    **strength_kwargs: Any,
) -> np.ndarray:
    """Pick onset events from the strength envelope; returns a NumPy index
    array (frames / samples / time, like librosa — variable length, host).

    librosa-compatible (`librosa.onset.onset_detect`): envelope is
    peak-normalized to [0, 1], then `peak_pick` runs with librosa's
    tempo-scaled default windows (0.03 s max windows, 0.10 s mean windows,
    0.03 s debounce). ``backtrack=True`` rolls each onset back to the
    preceding local minimum of ``energy`` (default: the envelope itself).
    1-D input only — event lists are inherently ragged, so this is a host
    boundary by design; the jitted mask kernel underneath is batched.
    """
    if onset_envelope is None:
        if y is None:
            raise ValueError("Either y or onset_envelope must be provided")
        onset_envelope = onset_strength(
            y, sr=sr, hop_length=hop_length, **strength_kwargs
        )
    env = jnp.asarray(onset_envelope, dtype=REAL_DTYPE)
    if env.ndim != 1:
        raise ValueError(
            f"onset_detect expects a 1-D envelope, got {env.ndim}-D "
            "(event lists are ragged; loop batches on the host)"
        )
    validate_positive(hop_length, "hop_length")
    validate_non_negative(delta, "delta")

    # librosa's tempo-scaled defaults: seconds * sr FLOOR-divided by hop
    # (librosa onset_detect: `0.03 * sr // hop_length` etc. — at sr=22050,
    # hop=512 this gives pre_max=1/pre_avg=4/wait=1, not ceil's 2/5/2)
    if pre_max is None:
        pre_max = int(0.03 * sr // hop_length)
    if post_max is None:
        post_max = int(0.00 * sr // hop_length) + 1
    if pre_avg is None:
        pre_avg = int(0.10 * sr // hop_length)
    if post_avg is None:
        post_avg = int(0.10 * sr // hop_length) + 1
    if wait is None:
        wait = int(0.03 * sr // hop_length)

    if normalize:
        lo = jnp.min(env)
        rng = jnp.max(env) - lo
        env = jnp.where(rng > 0, (env - lo) / jnp.where(rng > 0, rng, 1.0), env)

    mask = _peak_pick_mask(
        env[None],
        pre_max=int(pre_max),
        # librosa's slice max is x[n-pre : n+post] (post EXCLUSIVE of its
        # +1 convention already applied above)
        post_max=int(post_max) - 1,
        pre_avg=int(pre_avg),
        post_avg=int(post_avg) - 1,
        delta=float(delta),
        wait=int(wait),
    )[0]
    onsets = np.flatnonzero(np.asarray(mask))

    if backtrack:
        e = np.asarray(env if energy is None else energy, dtype=np.float64)
        onsets = _backtrack(onsets, e)

    if units == "frames":
        return onsets
    if units == "samples":
        return onsets * hop_length
    if units == "time":
        return onsets * (hop_length / float(sr))
    raise ValueError(f"Unknown units: '{units}'. Supported: 'frames', 'samples', 'time'")


def _backtrack(onsets: np.ndarray, energy: np.ndarray) -> np.ndarray:
    """Roll each onset back to the preceding local minimum of ``energy``
    (librosa `onset_backtrack`): host NumPy — a handful of events."""
    if len(onsets) == 0 or len(energy) < 3:
        return onsets
    # librosa util.localmin: strictly below the PREVIOUS sample, <= the NEXT
    # — a flat-bottomed valley backtracks to its FIRST frame, not its last
    interior = (energy[1:-1] < energy[:-2]) & (energy[1:-1] <= energy[2:])
    minima = np.flatnonzero(np.concatenate(([True], interior, [False])))
    pos = np.searchsorted(minima, onsets, side="right") - 1
    return minima[np.maximum(pos, 0)]


def onset_backtrack(events: ArrayLike, energy: ArrayLike) -> np.ndarray:
    """Roll each detected onset back to the preceding local minimum of an
    energy curve (librosa `onset.onset_backtrack` public API; the same
    routine :func:`onset_detect` uses for ``backtrack=True``). Host NumPy
    — a handful of ragged events."""
    return _backtrack(
        np.asarray(events, dtype=np.int64),
        np.asarray(energy, dtype=np.float64).ravel(),
    )
