"""Streaming (chunked) STFT / ISTFT / log-mel.

The reference lists "Streaming support — process audio in chunks" as future
work (reference `ARCHITECTURE.md:536-540`); its only streaming hooks are the
``zi``/``return_zf`` filter states in pre/de-emphasis (`framing.py:196-199`),
which this library also supports. This module completes the story.

Design for jit: a stream step must have *static shapes*, so chunk sizes are
fixed per stream and must be a multiple of ``hop_length``. Each push then
yields exactly ``chunk_size/hop`` frames and the carried state has constant
shape:

* STFT state = the last ``n_fft - hop`` input samples (the frame overlap);
* ISTFT state = the last ``n_fft - hop`` unnormalized overlap-add samples
  (the tail that future frames still add into). Emitted samples are
  normalized by the steady-state periodic window envelope, so a streamed
  reconstruction equals the offline ``istft`` away from the very first and
  last ``n_fft - hop`` samples (standard streaming-OLA semantics).

Functional cores (``*_init`` / ``*_push``) are pure and jitted; the
``Streaming*`` classes wrap them with tiny Python state for convenience.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from .._config import MATMUL_PRECISION, REAL_DTYPE, WINDOW_SUM_EPSILON
from ..kernels.bluestein import irfft_len, rfft_len
from .convert import power_to_db
from ._frames import frame_signal_batched, overlap_add
from .mel import mel_filterbank
from .stft import _get_padded_window

ArrayLike = Any


def _valid_hop(hop_length: int | None, n_fft: int) -> int:
    """Validate/default the hop (``or`` would silently rewrite hop=0)."""
    hop = n_fft // 4 if hop_length is None else hop_length
    if not 0 < hop <= n_fft:
        raise ValueError(
            f"hop_length must be in (0, n_fft]; got {hop} with n_fft={n_fft}"
        )
    return hop


def _steady_envelope(win: jax.Array, hop: int) -> jax.Array:
    """Steady-state periodic squared-window envelope, one hop period."""
    n_fft = win.shape[0]
    C = -(-n_fft // hop)
    sq = jnp.pad(win * win, (0, C * hop - n_fft)).reshape(C, hop)
    return jnp.maximum(jnp.sum(sq, axis=0), WINDOW_SUM_EPSILON)


# ---------------------------------------------------------------------------
# functional cores


def streaming_stft_init(batch: int, n_fft: int, hop_length: int) -> jax.Array:
    """Initial carry: ``n_fft - hop`` zeros (as if preceded by silence)."""
    return jnp.zeros((batch, n_fft - hop_length), REAL_DTYPE)


@partial(jax.jit, static_argnames=("n_fft", "hop_length"))
def streaming_stft_push(
    carry: jax.Array,
    chunk: jax.Array,
    win: jax.Array,
    *,
    n_fft: int,
    hop_length: int,
) -> tuple[jax.Array, jax.Array]:
    """Push ``(B, chunk)`` samples -> (new_carry, (B, chunk/hop, n_bins))."""
    B, C_s = chunk.shape
    if C_s % hop_length != 0:
        raise ValueError(
            f"chunk size ({C_s}) must be a multiple of hop_length ({hop_length})"
        )
    ext = jnp.concatenate([carry, chunk.astype(REAL_DTYPE)], axis=1)
    frames = frame_signal_batched(ext, n_fft, hop_length) * win
    spec = rfft_len(frames, n_fft)
    tail = n_fft - hop_length
    # NB: slice from the absolute position — a negative -(tail) start would
    # select the ENTIRE array when tail == 0 (hop == n_fft)
    return ext[:, ext.shape[1] - tail :], spec


def streaming_istft_init(batch: int, n_fft: int, hop_length: int) -> jax.Array:
    return jnp.zeros((batch, n_fft - hop_length), REAL_DTYPE)


@partial(jax.jit, static_argnames=("n_fft", "hop_length"))
def streaming_istft_push(
    carry: jax.Array,
    spec: jax.Array,  # (B, F, n_bins)
    win: jax.Array,
    *,
    n_fft: int,
    hop_length: int,
) -> tuple[jax.Array, jax.Array]:
    """Push ``(B, F, n_bins)`` frames -> (new_carry, (B, F*hop) samples)."""
    B, F, _ = spec.shape
    frames = irfft_len(spec, n_fft).astype(REAL_DTYPE) * win
    local = overlap_add(frames, hop_length, n_fft + (F - 1) * hop_length)
    emit_len = F * hop_length
    tail_len = n_fft - hop_length
    combined = local.at[:, :tail_len].add(carry)
    emitted = combined[:, :emit_len]
    # local has length emit_len + tail_len by construction
    new_carry = combined[:, emit_len:]
    env = _steady_envelope(win, hop_length)
    emitted = emitted / jnp.tile(env, emit_len // hop_length)
    return new_carry, emitted


# ---------------------------------------------------------------------------
# convenience classes


class StreamingSTFT:
    """Chunked STFT primed with silence.

    The stream equals the offline ``stft(center=False)`` of the signal
    pre-padded with ``n_fft - hop`` zeros — i.e. streamed frame ``f``
    corresponds to offline (unpadded, center=False) frame
    ``f - (n_fft - hop)/hop`` once past the priming region.

    >>> s = StreamingSTFT(n_fft=1024, hop_length=256, batch=1)
    >>> for chunk in chunks:                 # (1, k*256) each
    ...     frames = s.push(chunk)           # (1, k, 513) complex64
    """

    def __init__(
        self,
        n_fft: int = 2048,
        hop_length: int | None = None,
        window: str | ArrayLike = "hann",
        batch: int = 1,
    ):
        self.n_fft = n_fft
        self.hop_length = _valid_hop(hop_length, n_fft)
        self.win = _get_padded_window(window, n_fft, n_fft)
        self.batch = batch
        self.carry = streaming_stft_init(batch, n_fft, self.hop_length)

    def push(self, chunk: ArrayLike) -> jax.Array:
        chunk = jnp.asarray(chunk, REAL_DTYPE)
        if chunk.ndim == 1:
            chunk = chunk[None]
        self.carry, spec = streaming_stft_push(
            self.carry, chunk, self.win,
            n_fft=self.n_fft, hop_length=self.hop_length,
        )
        return spec

    def reset(self) -> None:
        self.carry = streaming_stft_init(self.batch, self.n_fft, self.hop_length)


class StreamingISTFT:
    """Chunked ISTFT: push frame blocks, receive hop-aligned samples.

    Emitted samples lag the pushed frames by ``n_fft - hop`` samples of
    look-ahead (the overlap still being accumulated).
    """

    def __init__(
        self,
        n_fft: int = 2048,
        hop_length: int | None = None,
        window: str | ArrayLike = "hann",
        batch: int = 1,
    ):
        self.n_fft = n_fft
        self.hop_length = _valid_hop(hop_length, n_fft)
        self.win = _get_padded_window(window, n_fft, n_fft)
        self.batch = batch
        self.carry = streaming_istft_init(batch, n_fft, self.hop_length)

    def push(self, spec: ArrayLike) -> jax.Array:
        spec = jnp.asarray(spec)
        self.carry, out = streaming_istft_push(
            self.carry, spec, self.win,
            n_fft=self.n_fft, hop_length=self.hop_length,
        )
        return out

    def reset(self) -> None:
        self.carry = streaming_istft_init(self.batch, self.n_fft, self.hop_length)


@jax.jit
def _logmel_post(spec: jax.Array, fb_t: jax.Array) -> jax.Array:
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    mel = jnp.matmul(power, fb_t, precision=MATMUL_PRECISION)
    return power_to_db(mel, top_db=None)


class StreamingLogMel:
    """Chunked log-mel frontend: StreamingSTFT + mel GEMM + dB (one jitted
    post stage per chunk — the per-push hot path never dispatches eagerly)."""

    def __init__(
        self,
        sr: int = 22050,
        n_fft: int = 2048,
        hop_length: int | None = None,
        n_mels: int = 128,
        window: str | ArrayLike = "hann",
        batch: int = 1,
    ):
        self.stft = StreamingSTFT(n_fft, hop_length, window, batch)
        self.fb_t = mel_filterbank(sr, n_fft, n_mels=n_mels).T

    def push(self, chunk: ArrayLike) -> jax.Array:
        return _logmel_post(self.stft.push(chunk), self.fb_t)

    def reset(self) -> None:
        self.stft.reset()
