"""Streaming (chunked) STFT / ISTFT / log-mel / MFCC / chroma / pitch / resample.

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
  (the tail that future frames still add into) PLUS the same positions of
  the running squared-window envelope. Carrying the *true* envelope (not
  its steady-state period) makes every emitted sample normalized by exactly
  the same window sum the offline ``istft`` uses, so
  ``concat(pushes..., flush()) == istft(S, center=False)`` over the FULL
  signal, first/last ``n_fft - hop`` samples included.

Functional cores (``*_init`` / ``*_push``) are pure and jitted; the
``Streaming*`` classes wrap them with tiny Python state for convenience.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .._config import MATMUL_PRECISION, REAL_DTYPE, WINDOW_SUM_EPSILON
from ..kernels.bluestein import irfft_len, rfft_len
from ..utils.validation import validate_positive
from .convert import power_to_db
from ._frames import frame_signal_batched, overlap_add, window_envelope
from .mel import mel_filterbank
from .stft import _get_padded_window

ArrayLike = Any


def _valid_hop(hop_length: int | None, n_fft: int, name: str = "n_fft") -> int:
    """Validate/default the hop (``or`` would silently rewrite hop=0)."""
    hop = n_fft // 4 if hop_length is None else hop_length
    if not 0 < hop <= n_fft:
        raise ValueError(
            f"hop_length must be in (0, {name}]; got {hop} with {name}={n_fft}"
        )
    return hop


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


def streaming_istft_init(
    batch: int, n_fft: int, hop_length: int
) -> tuple[jax.Array, jax.Array]:
    """Initial carry: (OLA sample tail, squared-window envelope tail)."""
    tail = n_fft - hop_length
    return (
        jnp.zeros((batch, tail), REAL_DTYPE),
        jnp.zeros((1, tail), REAL_DTYPE),
    )


@partial(jax.jit, static_argnames=("n_fft", "hop_length"))
def streaming_istft_push(
    carry: tuple[jax.Array, jax.Array],
    spec: jax.Array,  # (B, F, n_bins)
    win: jax.Array,
    *,
    n_fft: int,
    hop_length: int,
) -> tuple[tuple[jax.Array, jax.Array], jax.Array]:
    """Push ``(B, F, n_bins)`` frames -> (new_carry, (B, F*hop) samples).

    The envelope is overlap-added alongside the samples so emitted positions
    are normalized by the exact window sum the offline ``istft`` would use
    (``stft.py:_istft_envelope_table`` semantics). The envelope OLA runs on a
    batch of 1, so its cost is negligible next to the (B, ...) sample OLA.
    """
    sample_tail, env_tail = carry
    B, F, _ = spec.shape
    frames = irfft_len(spec, n_fft).astype(REAL_DTYPE) * win
    out_len = n_fft + (F - 1) * hop_length
    local = overlap_add(frames, hop_length, out_len)
    local_env = window_envelope(win, F, hop_length, out_len)[None]
    emit_len = F * hop_length
    tail_len = n_fft - hop_length
    combined = local.at[:, :tail_len].add(sample_tail)
    combined_env = local_env.at[:, :tail_len].add(env_tail)
    # local has length emit_len + tail_len by construction
    emitted = combined[:, :emit_len] / jnp.maximum(
        combined_env[:, :emit_len], WINDOW_SUM_EPSILON
    )
    return (combined[:, emit_len:], combined_env[:, emit_len:]), emitted


@partial(jax.jit, static_argnames=())
def streaming_istft_flush(
    carry: tuple[jax.Array, jax.Array],
) -> jax.Array:
    """Emit the final ``n_fft - hop`` samples after the last push.

    These positions still had future frames pending during pushes; at end of
    stream their envelope is final, matching the offline ``istft`` tail."""
    sample_tail, env_tail = carry
    return sample_tail / jnp.maximum(env_tail, WINDOW_SUM_EPSILON)


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
    look-ahead (the overlap still being accumulated); call :meth:`flush`
    after the last push to receive them. The concatenation of all pushes
    plus the flush equals the offline ``istft(S, center=False)`` exactly
    (up to f32 rounding), including the first and last ``n_fft - hop``
    samples — the true window envelope is carried through the stream.
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

    def flush(self) -> jax.Array:
        """Final ``(B, n_fft - hop)`` samples; resets the stream state."""
        out = streaming_istft_flush(self.carry)
        self.reset()
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


@jax.jit
def _chroma_post(spec: jax.Array, fb_t: jax.Array) -> jax.Array:
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    raw = jnp.matmul(power, fb_t, precision=MATMUL_PRECISION)  # (B, F, 12)
    peak = jnp.max(jnp.abs(raw), axis=-1, keepdims=True)
    tiny = jnp.asarray(np.finfo(np.float32).tiny, REAL_DTYPE)
    return raw / jnp.where(peak < tiny, 1.0, peak)


class StreamingChroma:
    """Chunked chromagram: StreamingSTFT + chroma GEMM + per-frame inf-norm.

    Streamed output equals offline ``chroma_stft(center=False, norm=inf)``
    frame-for-frame past the silence-primed startup — the inf-norm
    normalization is per frame, so unlike the dB clip in :class:`~.mfcc`
    pipelines nothing about it is global/acausal.
    """

    def __init__(
        self,
        sr: int = 22050,
        n_fft: int = 2048,
        hop_length: int | None = None,
        n_chroma: int = 12,
        tuning: float = 0.0,
        window: str | ArrayLike = "hann",
        batch: int = 1,
    ):
        from .chroma import chroma_filterbank

        self.stft = StreamingSTFT(n_fft, hop_length, window, batch)
        self.fb_t = chroma_filterbank(
            sr, n_fft, n_chroma=n_chroma, tuning=tuning
        ).T

    def push(self, chunk: ArrayLike) -> jax.Array:
        """Push ``(B, k*hop)`` samples -> ``(B, k, n_chroma)`` frames."""
        return _chroma_post(self.stft.push(chunk), self.fb_t)

    def reset(self) -> None:
        self.stft.reset()


@jax.jit
def _mfcc_post(
    spec: jax.Array, fb_t: jax.Array, dct_t: jax.Array, lift: jax.Array
) -> jax.Array:
    logmel = _logmel_post(spec, fb_t)
    # (B, F, n_mels) @ (n_mels, n_mfcc) -> (B, F, n_mfcc)
    return jnp.matmul(logmel, dct_t, precision=MATMUL_PRECISION) * lift


class StreamingMFCC:
    """Chunked MFCC frontend: StreamingSTFT + mel + dB + DCT-II (+ lifter).

    Causality note: the offline ``mfcc`` clamps dB at 80 below the GLOBAL
    spectrogram max (librosa's ``top_db=80``), which a stream cannot know;
    this class therefore uses ``top_db=None``. Streamed output equals
    ``mfcc(S=power_to_db(melspectrogram(...), top_db=None))`` frame-for-frame
    (past the silence-primed startup, see :class:`StreamingSTFT`).
    """

    def __init__(
        self,
        sr: int = 22050,
        n_fft: int = 2048,
        hop_length: int | None = None,
        n_mfcc: int = 20,
        n_mels: int = 128,
        window: str | ArrayLike = "hann",
        lifter: int = 0,
        batch: int = 1,
    ):
        from .mfcc import _dct_basis_t, lifter_coeffs

        self.stft = StreamingSTFT(n_fft, hop_length, window, batch)
        self.fb_t = mel_filterbank(sr, n_fft, n_mels=n_mels).T
        self.dct_t = _dct_basis_t(n_mfcc, n_mels, "ortho")
        self.lift = lifter_coeffs(n_mfcc, lifter)

    def push(self, chunk: ArrayLike) -> jax.Array:
        """Push ``(B, k*hop)`` samples -> ``(B, k, n_mfcc)`` coefficients."""
        return _mfcc_post(self.stft.push(chunk), self.fb_t, self.dct_t, self.lift)

    def reset(self) -> None:
        self.stft.reset()


@partial(
    jax.jit,
    static_argnames=(
        "frame_length", "hop_length", "lo", "hi", "sr", "min_lag", "threshold",
    ),
)
def _pitch_step(
    carry, chunk, C, *, frame_length, hop_length, lo, hi, sr, min_lag,
    threshold
):
    from .pitch import _framewise_acf_xla, _pick_f0

    ext = jnp.concatenate([carry, chunk], axis=1)
    keep = frame_length - hop_length  # may be 0 (hop == frame)
    new_carry = ext[:, ext.shape[1] - keep:]
    search, valid = _framewise_acf_xla(
        ext, C, frame_length=frame_length, hop_length=hop_length, lo=lo, hi=hi
    )
    f0, voiced = _pick_f0(search, valid, sr=sr, min_lag=min_lag,
                          threshold=threshold)
    return f0, voiced, new_carry


class StreamingPitch:
    """Chunked ACF pitch tracking: per push of ``(B, k*hop)`` samples, the
    last ``frame_length - hop`` carried samples complete the overlapping
    frames, yielding exactly ``k`` (f0, voiced) estimates.

    Matches the offline :func:`~.pitch.pitch_detect_acf` with
    ``center=False`` frame-for-frame once the carry holds real signal
    (silence-primed startup, like :class:`StreamingSTFT`); the offline op's
    ``center=True`` default instead pads ``frame_length // 2`` zeros, so
    its frame GRID is shifted by ``frame_length/2 - (frame_length - hop)``
    samples relative to the stream.
    """

    def __init__(
        self,
        sr: int = 22050,
        fmin: float = 50.0,
        fmax: float = 2000.0,
        frame_length: int = 2048,
        hop_length: int = 512,
        threshold: float = 0.1,
        batch: int = 1,
    ):
        from .pitch import _lag_bounds

        if fmin >= fmax:
            raise ValueError(f"fmin ({fmin}) must be less than fmax ({fmax})")
        hop_length = _valid_hop(hop_length, frame_length, name="frame_length")
        self.sr, self.threshold = sr, threshold
        self.frame_length, self.hop_length = frame_length, hop_length
        self.min_lag, max_lag = _lag_bounds(sr, fmin, fmax)
        self._lo = self.min_lag
        self._hi = min(max_lag + 1, frame_length + 1)
        self.batch = batch
        self.reset()

    def reset(self) -> None:
        self._carry = jnp.zeros(
            (self.batch, self.frame_length - self.hop_length), REAL_DTYPE
        )

    def push(self, chunk: ArrayLike) -> tuple[jax.Array, jax.Array]:
        """``(B, k*hop)`` samples -> ``(f0, voiced)`` each ``(B, k)``."""
        from .pitch import _acf_lag_basis, _next_pow2

        chunk = jnp.asarray(chunk, REAL_DTYPE)
        if chunk.ndim == 1:
            chunk = chunk[None]
        if (
            chunk.shape[0] != self.batch
            or chunk.shape[1] == 0
            or chunk.shape[1] % self.hop_length
        ):
            raise ValueError(
                f"chunk must be ({self.batch}, k*{self.hop_length}) with "
                f"k >= 1; got {chunk.shape}"
            )
        if self._hi <= self._lo:
            # degenerate lag window: still advance the carry
            ext = jnp.concatenate([self._carry, chunk], axis=1)
            keep = self.frame_length - self.hop_length
            self._carry = ext[:, ext.shape[1] - keep:]
            k = chunk.shape[1] // self.hop_length
            z = jnp.zeros((self.batch, k), REAL_DTYPE)
            return z, z.astype(bool)
        n_fft = _next_pow2(2 * self.frame_length - 1)
        C = _acf_lag_basis(n_fft, self._lo, self._hi)
        # the whole step — carry concat, XLA ACF, peak pick, next carry —
        # is ONE jit: per-push latency is dispatch-bound at streaming
        # chunk sizes, so fewer dispatches beats the fused kernel's
        # (3-call) throughput advantage
        f0, voiced, self._carry = _pitch_step(
            self._carry, chunk, C, frame_length=self.frame_length,
            hop_length=self.hop_length, lo=self._lo, hi=self._hi,
            sr=self.sr, min_lag=self.min_lag, threshold=self.threshold,
        )
        return f0, voiced


# ---------------------------------------------------------------------------
# streaming polyphase resampling


@partial(jax.jit, static_argnames=("down", "W", "drop"))
def _resample_step(
    carry: jax.Array, chunk: jax.Array, Kt: jax.Array, *,
    down: int, W: int, drop: int
) -> tuple[jax.Array, jax.Array]:
    """One streaming polyphase step: carry ``(B, W - down)`` + chunk
    ``(B, k*down)`` -> (new carry, ``(B, k*up - drop)`` output samples)."""
    ext = jnp.concatenate([carry, chunk], axis=1)
    frames = frame_signal_batched(ext, W, down)  # (B, k, W)
    flat = jnp.matmul(
        frames, Kt, precision=jax.lax.Precision.HIGHEST
    ).reshape(chunk.shape[0], -1)
    keep = W - down
    return ext[:, ext.shape[1] - keep:], flat[:, drop:]


class StreamingResample:
    """Chunked polyphase resampling with the offline filter, exactly.

    The polyphase geometry streams with no approximation: the offline
    left extension (``Lpmax - 1`` zeros) IS the initial carry, each pushed
    ``k * down`` input samples complete exactly ``k`` hop-``down`` frames
    (one MXU GEMM -> ``k * up`` output samples), and the filter's group
    delay means the final ``m0`` outputs need ``ceil(m0/up)`` frames of
    zero right-extension — emitted by :meth:`flush`. The concatenation of
    all pushes plus the flush equals
    ``resample_poly(y, up, down, padtype='constant')`` over the full
    signal to f32 rounding (identical frames and kernel; only the GEMM's
    reduction tiling differs between the chunked and offline shapes).

    Only the 'constant' (zero) boundary semantics can stream — every other
    scipy padtype depends on signal ends or global statistics the stream
    has not seen.

    >>> r = StreamingResample(up=160, down=441, batch=1)  # 44.1k -> 16k
    >>> outs = [r.push(c) for c in chunks]                # (1, k*441) each
    >>> outs.append(r.flush())
    """

    def __init__(self, up: int, down: int, batch: int = 1):
        import math as _math

        from .resample import _polyphase_geometry, _polyphase_kernel

        validate_positive(up, "up")
        validate_positive(down, "down")
        g = _math.gcd(up, down)
        self.up, self.down = up // g, down // g
        self.batch = batch
        if self.up == 1 and self.down == 1:
            self.W = self.m0 = 0
            self.Kt = None
        else:
            _, _, W, m0 = _polyphase_geometry(self.up, self.down)
            self.W, self.m0 = W, m0
            self.Kt = _polyphase_kernel(self.up, self.down)
        self.reset()

    def reset(self) -> None:
        self._started = False
        if self.Kt is not None:
            self._carry = jnp.zeros(
                (self.batch, self.W - self.down), REAL_DTYPE
            )

    def push(self, chunk: ArrayLike) -> jax.Array:
        """``(B, k*down)`` input samples -> resampled output samples.

        Every push yields ``k*up`` samples, except the first, which yields
        ``k*up - m0`` (the filter's group delay); the first chunk must
        therefore satisfy ``k*up > m0`` (~10 output samples — any real
        streaming chunk clears it).
        """
        chunk = jnp.asarray(chunk, REAL_DTYPE)
        if chunk.ndim == 1:
            chunk = chunk[None]
        if self.Kt is None:  # up == down: identity stream
            return chunk
        if (
            chunk.shape[0] != self.batch
            or chunk.shape[1] == 0
            or chunk.shape[1] % self.down
        ):
            raise ValueError(
                f"chunk must be ({self.batch}, k*{self.down}) with k >= 1; "
                f"got {chunk.shape}"
            )
        drop = 0
        if not self._started:
            drop = self.m0
            if chunk.shape[1] // self.down * self.up <= drop:
                raise ValueError(
                    f"first chunk must produce more than m0={self.m0} output "
                    f"samples; push at least "
                    f"{(self.m0 // self.up + 1) * self.down} input samples"
                )
            self._started = True
        self._carry, out = _resample_step(
            self._carry, chunk, self.Kt, down=self.down, W=self.W, drop=drop,
        )
        return out

    def flush(self) -> jax.Array:
        """Final ``(B, m0)`` output samples (zero right-extension); resets."""
        if self.Kt is None:
            return jnp.zeros((self.batch, 0), REAL_DTYPE)
        E = -(-self.m0 // self.up)  # frames of zero-extension needed
        zeros = jnp.zeros((self.batch, E * self.down), REAL_DTYPE)
        _, out = _resample_step(
            self._carry, zeros, self.Kt, down=self.down, W=self.W, drop=0,
        )
        out = out[:, : self.m0]
        self.reset()
        return out


class StreamingPCEN:
    """Chunked PCEN-mel frontend: StreamingSTFT + mel GEMM + PCEN with the
    smoother state carried across chunks.

    PCEN is causal (the one-pole smoother only looks backward), so the
    streamed output equals offline
    ``pcen(melspectrogram(..., center=False))`` frame-for-frame — exactly,
    not just asymptotically (unlike the global dB clip in MFCC pipelines).
    The carried state is scipy's lfilter ``zi`` convention, the same
    contract :func:`~.pcen.pcen` exposes through ``zi``/``return_zf``.
    """

    def __init__(
        self,
        sr: int = 22050,
        n_fft: int = 2048,
        hop_length: int | None = None,
        n_mels: int = 128,
        gain: float = 0.98,
        bias: float = 2.0,
        power: float = 0.5,
        time_constant: float = 0.4,
        eps: float = 1e-6,
        b: float | None = None,
        window: str | ArrayLike = "hann",
        batch: int = 1,
    ):
        self.stft = StreamingSTFT(n_fft, hop_length, window, batch)
        self.fb_t = mel_filterbank(sr, n_fft, n_mels=n_mels).T
        self._pcen_kwargs = dict(
            sr=sr, hop_length=self.stft.hop_length, gain=gain, bias=bias,
            power=power, time_constant=time_constant, eps=eps, b=b,
        )
        self._zi: jax.Array | None = None

    def push(self, chunk: ArrayLike) -> jax.Array:
        """Push ``(B, k*hop)`` samples -> ``(B, k, n_mels)`` PCEN frames."""
        from .pcen import pcen

        spec = self.stft.push(chunk)
        if spec.shape[1] == 0:
            return jnp.zeros(
                (spec.shape[0], 0, self.fb_t.shape[1]), REAL_DTYPE
            )
        power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
        mel = jnp.matmul(power, self.fb_t, precision=MATMUL_PRECISION)
        out, self._zi = pcen(
            jnp.swapaxes(mel, 1, 2), zi=self._zi, return_zf=True,
            **self._pcen_kwargs,
        )
        return jnp.swapaxes(out, 1, 2)

    def reset(self) -> None:
        self.stft.reset()
        self._zi = None
