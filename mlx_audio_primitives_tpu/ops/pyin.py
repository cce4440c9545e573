"""Probabilistic YIN (pYIN) pitch tracking.

Beyond-parity feature; semantic model: Mauch & Dixon, "pYIN: A fundamental
frequency estimator using probabilistic threshold distributions" (ICASSP
2014) — the algorithm behind librosa.pyin. Instead of YIN's single
absolute threshold, EVERY CMND trough becomes a pitch candidate whose
probability integrates a Beta(2, 18) prior over thresholds with a
Boltzmann preference for earlier troughs; an HMM over (pitch bin x
voicing) states with a triangular pitch-transition band and a small
voicing switch probability is decoded by Viterbi, yielding per-frame f0,
a voiced/unvoiced flag, and a voicing probability.

TPU-native design (no numba, no per-frame Python):

* the CMND band comes from the same all-frames-at-once machinery as
  :func:`~.pitch.yin` (:func:`~.pitch._yin_cmnd`);
* trough-threshold integration is one dense masked tensor program over
  (frames, periods, thresholds) — ranks via a cumulative count, the
  Boltzmann weights in closed form;
* candidate probabilities scatter-add into log2-spaced pitch bins;
* Viterbi runs as ONE `lax.scan` over frames carrying the (2, n_bins)
  score vector; the transition factorizes as
  kron(banded pitch window, 2x2 voicing switch), so each step is a
  windowed max-plus against a dense (S, S) log-transition built once.
  Backpointers are emitted per step; only the ragged backtrace walks on
  the host.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .._config import REAL_DTYPE
from ..utils.validation import validate_positive

ArrayLike = Any


@lru_cache(maxsize=8)
def _beta_threshold_prior(n_thresholds: int, a: float, b: float) -> np.ndarray:
    """Mass of each threshold level under Beta(a, b): CDF differences on a
    uniform grid over (0, 1] (host f64; regularized incomplete beta via a
    fine trapezoid — scipy-free, error ~1e-10 at n=4096 panels)."""
    grid = np.linspace(0.0, 1.0, 4097)
    pdf = grid ** (a - 1.0) * (1.0 - grid) ** (b - 1.0)
    # endpoint singularities are absent for a,b>1 (default 2,18); guard any
    pdf = np.nan_to_num(pdf, posinf=0.0)
    cdf = np.concatenate([[0.0], np.cumsum((pdf[1:] + pdf[:-1]) * 0.5)])
    cdf /= cdf[-1]
    t = np.linspace(0.0, 1.0, n_thresholds + 1)
    return np.diff(np.interp(t, grid, cdf))


@lru_cache(maxsize=8)
def _transition_tables(
    n_bins: int, width: int, switch_prob: float
) -> tuple[np.ndarray, np.ndarray]:
    """(log local (n_bins, n_bins), log switch (2, 2)) host f64 tables."""
    delta = np.abs(np.subtract.outer(np.arange(n_bins), np.arange(n_bins)))
    half = width // 2
    tri = np.maximum(half + 1 - delta, 0).astype(np.float64)
    tri /= tri.sum(axis=1, keepdims=True)
    with np.errstate(divide="ignore"):
        log_local = np.log(tri)
    sw = np.array([[1.0 - switch_prob, switch_prob],
                   [switch_prob, 1.0 - switch_prob]])
    return log_local.astype(np.float32), np.log(sw).astype(np.float32)


@partial(jax.jit, static_argnames=(
    "n_thresholds", "boltzmann_parameter", "no_trough_prob", "n_bins",
    "bins_per_semitone", "min_period", "sr", "fmin",
))
def _pyin_observations(
    band: jax.Array,
    beta_probs: jax.Array,
    *,
    n_thresholds: int,
    boltzmann_parameter: float,
    no_trough_prob: float,
    n_bins: int,
    bins_per_semitone: int,
    min_period: int,
    sr: int,
    fmin: float,
):
    """(B, F, P) CMND band -> (observation (B, F, n_bins), voiced_prob).

    Troughs get probability mass integrated over the Beta threshold prior
    with Boltzmann rank weighting; refined (parabolic) periods map to
    log2-spaced pitch bins.
    """
    B, F, P = band.shape
    big = jnp.asarray(1e6, REAL_DTYPE)
    # interior local minima (librosa localmin: < prev, <= next); global
    # minimum always admitted as the fallback candidate
    prev = jnp.concatenate([band[..., :1] + 1.0, band[..., :-1]], axis=-1)
    nxt = jnp.concatenate([band[..., 1:], band[..., -1:] + 1.0], axis=-1)
    trough = (band < prev) & (band <= nxt)
    gmin = jnp.argmin(band, axis=-1)
    trough = trough | (
        jnp.arange(P)[None, None, :] == gmin[..., None]
    )
    d = jnp.where(trough, band, big)  # masked trough depths (B, F, P)
    # degenerate frames (silence): the 0/0-guarded CMND is identically ~0,
    # which would read as a perfect trough everywhere. The YIN convention
    # is d' = 1 for a zero-energy frame — treat them as having NO trough
    # below any threshold (they fall to the no_trough_prob fallback).
    dead = jnp.max(band, axis=-1, keepdims=True) < 1e-7
    d = jnp.where(dead, big, d)

    # parabolic refinement of each trough's period and depth
    denom = prev + nxt - 2.0 * band
    tiny = jnp.asarray(np.finfo(np.float32).tiny, REAL_DTYPE)
    shift = jnp.where(
        jnp.abs(denom) > tiny, 0.5 * (prev - nxt) / denom, 0.0
    )
    shift = jnp.clip(shift, -0.5, 0.5)
    period = (
        jnp.arange(P, dtype=REAL_DTYPE)[None, None, :]
        + min_period
        + shift
    )

    # threshold integration: for each threshold level t_i (mass beta[i]),
    # troughs with depth < t_i share the mass by Boltzmann rank
    t_levels = jnp.linspace(
        1.0 / n_thresholds, 1.0, n_thresholds, dtype=REAL_DTYPE
    )
    below = d[..., None] < t_levels  # (B, F, P, T)
    rank = jnp.cumsum(below, axis=-2) - 1  # rank within the below-set
    lam = jnp.asarray(float(boltzmann_parameter), REAL_DTYPE)
    n_below = jnp.sum(below, axis=-2, keepdims=True)  # (B, F, 1, T)
    # Boltzmann pmf over ranks 0..N-1: (1-e^-lam) e^(-lam r) / (1-e^-lam N)
    bw = (
        (1.0 - jnp.exp(-lam))
        * jnp.exp(-lam * rank.astype(REAL_DTYPE))
        / jnp.maximum(1.0 - jnp.exp(-lam * n_below.astype(REAL_DTYPE)), tiny)
    )
    contrib = jnp.where(below, bw, 0.0) * beta_probs  # (B, F, P, T)
    trough_prob = jnp.sum(contrib, axis=-1)  # (B, F, P)
    # thresholds with NO trough below: no_trough_prob of their mass goes
    # to the global minimum trough
    empty_mass = jnp.sum(
        jnp.where(n_below[..., 0, :] == 0, beta_probs, 0.0), axis=-1
    )  # (B, F)
    is_gmin = jnp.arange(P)[None, None, :] == gmin[..., None]
    # the fallback is for frames WITH energy whose troughs are all shallow;
    # dead (silent) frames get no voiced mass at all, so Viterbi decodes
    # them unvoiced instead of parking on a single fmin-adjacent bin
    fallback = jnp.where(dead[..., 0], 0.0, no_trough_prob * empty_mass)
    trough_prob = trough_prob + is_gmin * fallback[..., None]

    voiced_prob = jnp.clip(jnp.sum(trough_prob, axis=-1), 0.0, 1.0)

    # scatter candidate probabilities into log2-spaced pitch bins
    f0 = sr / jnp.maximum(period, tiny)
    bin_f = (
        12.0 * bins_per_semitone * jnp.log2(jnp.maximum(f0, tiny) / fmin)
    )
    bin_idx = jnp.clip(jnp.round(bin_f).astype(jnp.int32), 0, n_bins - 1)
    bf = jnp.reshape(trough_prob, (B * F, P))
    bi = jnp.reshape(bin_idx, (B * F, P))
    obs = jnp.zeros((B * F, n_bins), REAL_DTYPE)
    obs = jax.vmap(lambda o, i, v: o.at[i].add(v))(obs, bi, bf)
    return obs.reshape(B, F, n_bins), voiced_prob


@partial(jax.jit, static_argnames=("n_bins",))
def _pyin_viterbi(
    obs: jax.Array,
    voiced_prob: jax.Array,
    log_local: jax.Array,
    log_switch: jax.Array,
    *,
    n_bins: int,
):
    """Viterbi over 2*n_bins (voiced-bin | unvoiced-bin) states.

    Returns (last_state (B,), backpointers (B, F, 2*n_bins) int32).
    """
    B, F, _ = obs.shape
    tiny = jnp.asarray(np.finfo(np.float32).tiny, REAL_DTYPE)
    # observation log-probs: voiced bins carry the trough mass, unvoiced
    # bins share (1 - voiced_prob) uniformly
    o_v = jnp.log(jnp.maximum(obs, tiny))
    o_u = jnp.log(
        jnp.maximum((1.0 - voiced_prob)[..., None] / n_bins, tiny)
    )
    logO = jnp.concatenate([o_v, jnp.broadcast_to(o_u, o_v.shape)], -1)

    S = 2 * n_bins
    # full (S, S) log transition: kron(switch over voicing, local in pitch)
    # with state order [voiced bins | unvoiced bins]
    T = jnp.concatenate(
        [
            jnp.concatenate(
                [log_switch[0, 0] + log_local, log_switch[0, 1] + log_local],
                axis=1,
            ),
            jnp.concatenate(
                [log_switch[1, 0] + log_local, log_switch[1, 1] + log_local],
                axis=1,
            ),
        ],
        axis=0,
    )  # (S, S): T[prev, cur]

    def step(delta, logO_t):
        scores = delta[:, :, None] + T[None, :, :]  # (B, prev, cur)
        bp = jnp.argmax(scores, axis=1).astype(jnp.int32)
        delta = jnp.max(scores, axis=1) + logO_t
        # renormalize to stop drift over long signals
        delta = delta - jnp.max(delta, axis=-1, keepdims=True)
        return delta, bp

    delta0 = logO[:, 0, :] - jnp.log(jnp.asarray(float(S), REAL_DTYPE))
    deltaF, bps = jax.lax.scan(
        step, delta0, jnp.moveaxis(logO[:, 1:, :], 1, 0)
    )
    last = jnp.argmax(deltaF, axis=-1).astype(jnp.int32)
    return last, jnp.moveaxis(bps, 0, 1)  # (B, F-1, S)


def pyin(
    y: ArrayLike,
    fmin: float,
    fmax: float,
    sr: int = 22050,
    frame_length: int = 2048,
    win_length: int | None = None,
    hop_length: int | None = None,
    n_thresholds: int = 100,
    beta_parameters: tuple[float, float] = (2.0, 18.0),
    boltzmann_parameter: float = 2.0,
    resolution: float = 0.1,
    max_transition_rate: float = 35.92,
    switch_prob: float = 0.01,
    no_trough_prob: float = 0.01,
    fill_na: float = np.nan,
    center: bool = True,
    pad_mode: str = "constant",
):
    """pYIN fundamental frequency track: ``(f0, voiced_flag, voiced_prob)``.

    Shapes ``(F,)`` / ``(B, F)`` each; unvoiced frames get ``fill_na`` in
    ``f0``. Parameters follow librosa.pyin (Mauch & Dixon defaults):
    ``resolution`` in fractions of a semitone per pitch bin,
    ``max_transition_rate`` in octaves/second (sets the triangular Viterbi
    transition band), ``switch_prob`` the voiced<->unvoiced transition
    probability, ``beta_parameters`` the threshold prior. Decoded f0 is
    the Viterbi-selected pitch-bin center — accurate to ``resolution``
    (0.1 semitone ~ 0.6%); use :func:`~.pitch.yin` for sub-resolution
    parabolic estimates when a voicing decision is not needed.
    """
    from .pitch import _yin_cmnd

    validate_positive(frame_length, "frame_length")
    if win_length is None:
        win_length = frame_length // 2
    if hop_length is None:
        hop_length = frame_length // 4
    validate_positive(hop_length, "hop_length")
    validate_positive(win_length, "win_length")
    validate_positive(n_thresholds, "n_thresholds")
    if win_length >= frame_length:
        raise ValueError(
            f"win_length ({win_length}) must be less than frame_length "
            f"({frame_length})"
        )
    if fmin <= 0:
        raise ValueError(f"fmin must be positive, got {fmin}")
    if fmin >= fmax:
        raise ValueError(f"fmin ({fmin}) must be less than fmax ({fmax})")
    if not 0 <= switch_prob <= 1:
        raise ValueError(f"switch_prob must be in [0, 1], got {switch_prob}")
    if resolution <= 0 or resolution > 1:
        raise ValueError(f"resolution must be in (0, 1], got {resolution}")

    min_period = max(int(np.floor(sr / fmax)), 1)
    max_period = min(int(np.ceil(sr / fmin)), frame_length - win_length - 1)
    if max_period <= min_period:
        raise ValueError(
            f"the period band [{min_period}, {max_period}] is empty: raise "
            f"frame_length ({frame_length}) or narrow [fmin, fmax]"
        )

    y = jnp.asarray(y, dtype=REAL_DTYPE)
    input_is_1d = y.ndim == 1
    if input_is_1d:
        y = y[None]
    if center:
        pad = frame_length // 2
        y = jnp.pad(y, ((0, 0), (pad, pad)), mode=pad_mode)
    if y.shape[-1] < frame_length:
        raise ValueError(
            f"signal of length {y.shape[-1]} is shorter than frame_length "
            f"({frame_length})"
        )

    bins_per_semitone = max(int(round(1.0 / resolution)), 1)
    n_bins = (
        int(np.ceil(12.0 * bins_per_semitone * np.log2(fmax / fmin))) + 1
    )
    band = _yin_cmnd(
        y, frame_length=frame_length, win_length=win_length,
        hop_length=hop_length, min_period=min_period, max_period=max_period,
    )
    beta_probs = jnp.asarray(
        _beta_threshold_prior(
            int(n_thresholds), float(beta_parameters[0]),
            float(beta_parameters[1]),
        ),
        REAL_DTYPE,
    )
    obs, voiced_prob = _pyin_observations(
        band, beta_probs,
        n_thresholds=int(n_thresholds),
        boltzmann_parameter=float(boltzmann_parameter),
        no_trough_prob=float(no_trough_prob),
        n_bins=n_bins, bins_per_semitone=bins_per_semitone,
        min_period=min_period, sr=int(sr), fmin=float(fmin),
    )

    frames_per_sec = sr / hop_length
    width = 2 * max(
        int(round(
            max_transition_rate * 12.0 * bins_per_semitone / frames_per_sec
        )),
        1,
    ) + 1
    log_local, log_switch = _transition_tables(
        n_bins, min(width, 2 * n_bins - 1), float(switch_prob)
    )
    last, bps = _pyin_viterbi(
        obs, voiced_prob, jnp.asarray(log_local), jnp.asarray(log_switch),
        n_bins=n_bins,
    )

    # host backtrace (ragged-free but sequential in F; F is small)
    bps = np.asarray(bps)
    last = np.asarray(last)
    B, Fm1, _ = bps.shape
    states = np.empty((B, Fm1 + 1), np.int64)
    states[:, -1] = last
    for t in range(Fm1 - 1, -1, -1):
        states[:, t] = bps[np.arange(B), t, states[:, t + 1]]

    voiced = states < n_bins
    bins = states % n_bins
    freqs = float(fmin) * 2.0 ** (
        np.arange(n_bins) / (12.0 * bins_per_semitone)
    )
    f0 = np.where(voiced, freqs[bins], fill_na).astype(np.float32)
    vp = np.asarray(voiced_prob)
    if input_is_1d:
        return f0[0], voiced[0], vp[0]
    return f0, voiced, vp


__all__ = ["pyin"]
