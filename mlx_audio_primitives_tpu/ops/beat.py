"""Beat tracking (Ellis dynamic programming).

Beyond-parity feature (the reference's roadmap family — its
`ARCHITECTURE.md` "Potential Features" stops at onset detection; beats are
the natural next stage of that chain). Semantics follow the published
algorithm librosa.beat.beat_track implements: Ellis, "Beat Tracking by
Dynamic Programming" (JNMR 2007) —

    C(t) = O(t) + max_{t-2p <= tau <= t-p/2} [ C(tau) - alpha * log^2((t-tau)/p) ]

with O the Gaussian-smoothed onset envelope, p the beat period from the
global tempo estimate, and alpha the ``tightness`` penalty weight.

TPU-native design: the recurrence is inherently sequential in t, but each
step's predecessor search is a fixed ``1.5 p + 1``-wide window — so the DP
runs as ONE ``lax.scan`` over frames carrying a rolling score buffer
(length ``2p``), with the window extracted by static slice and reduced on
the VPU. No per-frame Python, no O(F * p) host loop (librosa runs this
under numba for the same reason). Backtracking over the backlink chain and
the final beat trimming are host NumPy — beat lists are ragged output.
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


@partial(jax.jit, static_argnames=("period", "tightness"))
def _beat_dp(localscore: jax.Array, *, period: int, tightness: float):
    """Forward DP pass: returns (cumscore, backlink) arrays, shape (F,).

    backlink[i] is the chosen predecessor frame, or -1 when frame i starts
    a fresh chain (the "first beat" rule: until the first confident beat,
    frames with localscore below 1% of the peak do not link backward).
    """
    F = localscore.shape[0]
    lo = 2 * period                    # earliest predecessor: i - 2p
    hi = max(int(round(period / 2.0)), 1)  # latest: i - round(p/2)
    W = lo - hi + 1                    # window width
    offs = jnp.arange(-lo, -hi + 1, dtype=jnp.float32)
    txwt = -float(tightness) * jnp.log(-offs / float(period)) ** 2
    score_thresh = 0.01 * jnp.max(localscore)

    def body(carry, score_i):
        i, buf, first_beat = carry
        # buf[k] = cumscore[i - 2p + k] for k in 0..2p-1 (zeros before t=0)
        valid = (i + jnp.arange(-lo, -hi + 1)) >= 0
        cand = txwt + jnp.where(valid, buf[:W], 0.0)
        best = jnp.argmax(cand)
        cum_i = score_i + cand[best]
        is_silent_start = first_beat & (score_i < score_thresh)
        link = jnp.where(is_silent_start, -1, i - lo + best)
        first_beat = first_beat & is_silent_start
        buf = jnp.roll(buf, -1).at[-1].set(cum_i)
        return (i + 1, buf, first_beat), (cum_i, link)

    buf0 = jnp.zeros(2 * period, REAL_DTYPE)
    (_, _, _), (cumscore, backlink) = jax.lax.scan(
        body, (jnp.int32(0), buf0, jnp.bool_(True)), localscore
    )
    return cumscore, backlink


@partial(jax.jit, static_argnames=("period",))
def _local_score(oe: jax.Array, *, period: int) -> jax.Array:
    """Gaussian-smoothed, std-normalized onset envelope (Ellis eq. 2)."""
    std = jnp.std(oe, ddof=1)
    tiny = jnp.asarray(np.finfo(np.float32).tiny, REAL_DTYPE)
    oe = oe / jnp.where(std < tiny, 1.0, std)
    t = np.arange(-period, period + 1, dtype=np.float64)
    win = jnp.asarray(np.exp(-0.5 * (t * 32.0 / period) ** 2), REAL_DTYPE)
    pad = period
    ope = jnp.pad(oe, (pad, pad))
    out = jax.lax.conv_general_dilated(
        ope[None, None, :], win[None, None, :],
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out[0, 0, : oe.shape[0]].astype(REAL_DTYPE)


def _last_beat(cumscore: np.ndarray) -> int:
    """Final beat: last local max of cumscore above half the median local
    max (Ellis's endpoint rule as librosa implements it)."""
    n = len(cumscore)
    if n == 1:
        return 0
    interior = (cumscore[1:-1] > cumscore[:-2]) & (
        cumscore[1:-1] >= cumscore[2:]
    )
    lm = np.concatenate(([False], interior, [cumscore[-1] > cumscore[-2]]))
    if not lm.any():
        return n - 1
    thresh = 0.5 * np.median(cumscore[lm])
    good = np.flatnonzero(lm & (cumscore >= thresh))
    return int(good[-1]) if good.size else n - 1


def _trim_beats(localscore: np.ndarray, beats: np.ndarray) -> np.ndarray:
    """Drop weak leading/trailing beats: keep the span where the
    hann(5)-smoothed beat-onset strength exceeds half its RMS."""
    if beats.size == 0:
        return beats
    w = np.hanning(5)
    boe = np.convolve(localscore[beats], w, "same")
    thresh = 0.5 * np.sqrt(np.mean(boe**2))
    valid = np.flatnonzero(boe > thresh)
    if valid.size == 0:
        return beats[:0]
    return beats[valid[0] : valid[-1] + 1]


def beat_track(
    y: ArrayLike | None = None,
    sr: int = 22050,
    onset_envelope: ArrayLike | None = None,
    hop_length: int = 512,
    start_bpm: float = 120.0,
    tightness: float = 100.0,
    trim: bool = True,
    bpm: float | None = None,
    units: str = "frames",
    **strength_kwargs: Any,
) -> tuple[float, np.ndarray]:
    """Track beats: returns ``(bpm, beat_positions)``.

    librosa `beat.beat_track` semantics (Ellis 2007 dynamic programming):
    estimate the global tempo (:func:`~.rhythm.tempo`, unless ``bpm`` is
    given), smooth the onset envelope with a period-matched Gaussian, run
    the DP recurrence penalizing deviations from the beat period by
    ``tightness * log^2`` , backtrace from the best late local maximum,
    and optionally ``trim`` weak leading/trailing beats. An all-zero
    envelope returns ``(0.0, [])``.

    1-D input only, like :func:`~.onset.onset_detect` — beat lists are
    inherently ragged, so this is a host boundary by design; the envelope,
    smoothing, and the full DP pass run on device.
    """
    from .onset import onset_strength

    validate_positive(hop_length, "hop_length")
    validate_positive(tightness, "tightness")
    validate_positive(start_bpm, "start_bpm")
    if onset_envelope is None:
        if y is None:
            raise ValueError("Either y or onset_envelope must be provided")
        onset_envelope = onset_strength(
            y, sr=sr, hop_length=hop_length, **strength_kwargs
        )
    oe = jnp.asarray(onset_envelope, dtype=REAL_DTYPE)
    if oe.ndim != 1:
        raise ValueError(
            f"beat_track expects a 1-D envelope, got {oe.ndim}-D "
            "(beat lists are ragged; loop batches on the host)"
        )
    if not bool(jnp.any(oe != 0.0)):
        return 0.0, np.empty(0, dtype=np.int64)

    if bpm is None:
        from .rhythm import tempo as _tempo

        bpm = float(
            np.atleast_1d(
                _tempo(onset_envelope=oe, sr=sr, hop_length=hop_length,
                       start_bpm=start_bpm)
            ).ravel()[0]
        )
    if not np.isfinite(bpm) or bpm <= 0:
        raise ValueError(f"bpm must be positive and finite, got {bpm}")

    period = max(int(round(60.0 * sr / (bpm * hop_length))), 1)
    localscore = _local_score(oe, period=period)
    if int(oe.shape[0]) <= 2 * period:
        # too short for the DP window: every frame could only link to a
        # pre-signal predecessor; degenerate to the single best frame
        beats = np.asarray([int(np.argmax(np.asarray(localscore)))])
    else:
        cumscore, backlink = _beat_dp(
            localscore, period=period, tightness=float(tightness)
        )
        cumscore = np.asarray(cumscore)
        backlink = np.asarray(backlink)
        b = _last_beat(cumscore)
        chain = [b]
        while backlink[chain[-1]] >= 0:
            chain.append(int(backlink[chain[-1]]))
        beats = np.asarray(chain[::-1], dtype=np.int64)
    if trim:
        beats = _trim_beats(np.asarray(localscore), beats)

    if units == "frames":
        return bpm, beats
    if units == "samples":
        return bpm, beats * hop_length
    if units == "time":
        return bpm, beats * (hop_length / float(sr))
    raise ValueError(
        f"Unknown units: '{units}'. Supported: 'frames', 'samples', 'time'"
    )


__all__ = ["beat_track"]
