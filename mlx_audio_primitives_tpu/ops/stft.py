"""Short-Time Fourier Transform and inverse (librosa-compatible).

TPU-native architecture (vs the reference `mlx_audio_primitives/stft.py`):

* The reference caches ``mx.compile``d graphs keyed on
  ``(n_fft, hop, center, pad_mode)`` (`stft.py:109-133`). Here ``jax.jit``
  with those parameters as static arguments *is* that cache — one XLA
  executable per (shape, params) combination, managed by JAX.
* pad -> frame -> window -> rfft all live inside one jitted core so XLA fuses
  the window multiply and padding index math into the transform's operand
  loads. Framing is chunk algebra (see `_frames.py`), not a strided view.
* The transform has three paths: the fused Pallas radix kernel
  (`kernels/stft_radix.py` — pad+frame+window+DFT in one kernel, 1.8x the
  XLA FFT at batch 64 on v5e, ~3e-7 accurate; the TPU auto default where
  its shape gates admit), ``jnp.fft.rfft`` (the XLA default elsewhere), and
  the MXU DFT-GEMM path (`kernels/dft.py`, ``fft_mode='matmul'``), which
  wins when matmul precision is relaxed to HIGH/DEFAULT.
* ISTFT's overlap-add + squared-window normalization is the race-free chunk
  transpose (`_frames.py:overlap_add`), the TPU analog of the reference's
  fused output-centric Metal kernel (`csrc/metal/overlap_add.metal:16-55`).

Public signatures match the reference exactly (`stft.py:136-431`).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .._config import (
    REAL_DTYPE,
    WINDOW_SUM_EPSILON,
)
from ..kernels.bluestein import irfft_len, rfft_len, rfft_power_len
from ..kernels.dft import forward_basis, inverse_basis, irdft_matmul, rdft_matmul
from ..utils import dispatch
from ..utils.cache import table_cache
from ._frames import frame_signal_batched, num_frames, overlap_add, window_envelope
from .windows import get_window

ArrayLike = Any

_PAD_MODES = ("constant", "reflect", "edge")


def _squeeze0(x: jax.Array) -> jax.Array:
    """Drop the size-1 leading axis as a RESHAPE (``lax.squeeze``).

    ``x[0]`` lowers to a gather whose automatic transpose is a complex pad
    that some TPU runtimes reject at execution (UNIMPLEMENTED, killing the
    client session); squeeze's transpose is a reshape, safe in both autodiff
    modes."""
    return jax.lax.squeeze(x, (0,))


def _resolve_fft_mode(fft_mode: str, n_fft: int) -> str:
    """Resolve the transform path.

    Measured on TPU v5e with slope-amortized timing (see
    benchmarks/utils.py): XLA's FFT is both faster than the DFT-GEMM at the
    library's default Precision.HIGHEST (0.61 vs 0.84 ms for the batch-64
    mel pipeline) and equally accurate (~2e-7 rel), so 'auto' = 'fft'. The
    GEMM path wins when precision is relaxed (HIGH: 0.47 ms, DEFAULT:
    0.12 ms) and remains selectable via fft_mode='matmul'.
    """
    if fft_mode == "auto":
        return "fft"
    if fft_mode == "sixstep":
        from ..kernels import sixstep

        if not sixstep.supported(n_fft):
            return "fft"  # graceful fallback for unsupported sizes
        return "sixstep"
    if fft_mode not in ("fft", "matmul"):
        raise ValueError(
            f"fft_mode must be 'auto', 'fft', 'matmul' or 'sixstep', got {fft_mode}"
        )
    return fft_mode


@table_cache("istft_envelope", maxsize=32)
def _istft_envelope_table(
    window_key: tuple, win_length: int, n_fft: int,
    n_frames: int, hop_length: int, padded_length: int,
) -> np.ndarray:
    """Squared-window overlap-add envelope, built once per config in f64.

    The envelope is constant given (window, F, hop, length); recomputing it
    as a traced overlap-add inside every istft call roughly doubles the OLA
    work in the hot reconstruction path (win is a traced argument, so XLA
    cannot fold it). Host f64 construction is also more accurate.
    """
    from .windows import window_host

    name, beta = window_key
    win = window_host(name if beta is None else (name, beta), win_length)
    if win_length < n_fft:
        lp = (n_fft - win_length) // 2
        win = np.pad(win, (lp, n_fft - win_length - lp))
    sq = win * win
    env = np.zeros(padded_length, np.float64)
    for f in range(n_frames):
        s = f * hop_length
        e = min(s + n_fft, padded_length)
        if s >= padded_length:
            break
        env[s:e] += sq[: e - s]
    return np.maximum(env, WINDOW_SUM_EPSILON)


def _window_key(window) -> tuple | None:
    """Hashable cache key for string/tuple window specs (None for arrays).

    Aliases normalize ('hanning' == 'hann', 'boxcar' == 'rectangular', ...)
    so identical envelopes share one slot in the envelope table cache."""
    from .windows import _ALIASES

    if isinstance(window, str):
        name = window.lower()
        return (_ALIASES.get(name, name), None)
    if isinstance(window, tuple) and len(window) == 2:
        name = str(window[0]).lower()
        return (_ALIASES.get(name, name), float(window[1]))
    return None


def _validate_stft_params(
    n_fft: int, hop_length: int, win_length: int, pad_mode: str
) -> None:
    """Shared argument validation for the STFT-family entry points
    (stft / magnitude_spectrogram / melspectrogram — one copy, no drift)."""
    if hop_length <= 0:
        raise ValueError(f"hop_length must be positive, got {hop_length}")
    if win_length <= 0:
        raise ValueError(f"win_length must be positive, got {win_length}")
    if win_length > n_fft:
        raise ValueError(f"win_length ({win_length}) must be <= n_fft ({n_fft})")
    if hop_length > n_fft:
        raise ValueError(
            f"hop_length ({hop_length}) should typically be <= n_fft ({n_fft})"
        )
    if pad_mode not in _PAD_MODES:
        raise ValueError(
            f"Unknown pad_mode: '{pad_mode}'. Supported: {', '.join(_PAD_MODES)}"
        )


def _as_batched(y: ArrayLike, n_fft: int, center: bool) -> tuple[jax.Array, bool]:
    """Promote to (B, L) float32 and check the center=False length bound.

    Returns ``(y_2d, input_is_1d)``.
    """
    y = jnp.asarray(y, dtype=REAL_DTYPE)
    if y.ndim not in (1, 2):
        raise ValueError(f"y must be 1D or 2D, got {y.ndim}D")
    input_is_1d = y.ndim == 1
    if input_is_1d:
        y = y[None, :]
    if not center and y.shape[1] < n_fft:
        raise ValueError(
            f"signal length ({y.shape[1]}) must be >= n_fft ({n_fft}) "
            "when center=False"
        )
    return y, input_is_1d


def _get_padded_window(
    window: str | tuple | ArrayLike, win_length: int, n_fft: int
) -> jax.Array:
    """Window of length ``win_length`` center-padded to ``n_fft``.

    Reference behavior: `mlx_audio_primitives/stft.py:88-106`. Device-array
    caching is handled by the window table cache; padding is a cheap traced op.
    """
    win = get_window(window, win_length, fftbins=True)
    if win_length < n_fft:
        pad_left = (n_fft - win_length) // 2
        pad_right = n_fft - win_length - pad_left
        win = jnp.pad(win, (pad_left, pad_right))
    return win


@partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "center", "pad_mode", "fft_mode"),
)
def _stft_core(
    y: jax.Array,
    win: jax.Array,
    basis: jax.Array | None,
    *,
    n_fft: int,
    hop_length: int,
    center: bool,
    pad_mode: str,
    fft_mode: str,
) -> jax.Array:
    """(B, L) -> (B, F, n_bins) complex; fully fused under one jit."""
    if center:
        pad = n_fft // 2
        y = jnp.pad(y, ((0, 0), (pad, pad)), mode=pad_mode)
    frames = frame_signal_batched(y, n_fft, hop_length)
    frames = frames * win
    if fft_mode == "matmul":
        return rdft_matmul(frames, n_fft, basis)
    if fft_mode == "sixstep":
        from ..kernels.sixstep import rfft_sixstep

        return rfft_sixstep(frames, n_fft)
    return rfft_len(frames, n_fft)


@partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "center", "pad_mode"),
)
def _magnitude_core(
    y: jax.Array,
    win: jax.Array,
    *,
    n_fft: int,
    hop_length: int,
    center: bool,
    pad_mode: str,
) -> jax.Array:
    """(B, L) -> (B, F, n_bins) real magnitudes, fully fused.

    ``sqrt(rfft_power_len(.))`` never materializes a complex spectrum (see
    `kernels/bluestein.py::packed_power_rows`), unlike ``|_stft_core(.)|``.
    """
    if center:
        pad = n_fft // 2
        y = jnp.pad(y, ((0, 0), (pad, pad)), mode=pad_mode)
    frames = frame_signal_batched(y, n_fft, hop_length) * win
    return jnp.sqrt(rfft_power_len(frames, n_fft))


def magnitude_spectrogram(
    y: ArrayLike,
    n_fft: int = 2048,
    hop_length: int | None = None,
    win_length: int | None = None,
    window: str | ArrayLike = "hann",
    center: bool = True,
    pad_mode: str = "constant",
    use_pallas: bool | None = None,
    fast_gemm: bool | None = None,
) -> jax.Array:
    """``|stft(y)|`` without the complex intermediate (internal fast path).

    Same signature subset and semantics as ``magnitude(stft(y, ...))``
    (reference composes them, `stft.py:136-222` + `:347-362`); used by the
    spectral-feature S-or-y protocol.

    ``fast_gemm`` (default `_config.ANALYSIS_FAST_GEMM`) selects the fused
    kernel's 3-pass bf16-split GEMMs; noise-floor-sensitive consumers
    (``spectral_flatness``'s log-power geometric mean) pass False so
    near-silent bins keep the f32-exact ~1e-7 floor below their ``amin``
    clamp.
    """
    if hop_length is None:
        hop_length = n_fft // 4
    if win_length is None:
        win_length = n_fft
    _validate_stft_params(n_fft, hop_length, win_length, pad_mode)
    y, input_is_1d = _as_batched(y, n_fft, center)
    win = _get_padded_window(window, win_length, n_fft)

    from ..kernels.stft_radix import stft_radix_supported

    if (
        dispatch.resolve_use_pallas(use_pallas, default_on_tpu=True)
        and not dispatch.is_batch_traced(y)
        and stft_radix_supported(n_fft, hop_length)
    ):
        # |stft| via the fused radix kernel with the half-traffic
        # group-layout magnitude naturalize (2x stft_pallas+abs at scale)
        from ..kernels.stft_radix import stft_magnitude_pallas

        out = stft_magnitude_pallas(
            y, win, n_fft=n_fft, hop_length=hop_length, center=center,
            pad_mode=pad_mode, fast_gemm=fast_gemm,
        )
        return out[0] if input_is_1d else out

    out = _magnitude_core(
        y, win, n_fft=n_fft, hop_length=hop_length, center=center,
        pad_mode=pad_mode,
    )
    out = jnp.swapaxes(out, 1, 2)
    return out[0] if input_is_1d else out


def stft(
    y: ArrayLike,
    n_fft: int = 2048,
    hop_length: int | None = None,
    win_length: int | None = None,
    window: str | ArrayLike = "hann",
    center: bool = True,
    pad_mode: str = "constant",
    fft_mode: str = "auto",
    use_pallas: bool | None = None,
) -> jax.Array:
    """Short-Time Fourier Transform.

    librosa-compatible signature and semantics (reference:
    `mlx_audio_primitives/stft.py:136-222`). Input ``(samples,)`` or
    ``(batch, samples)``; output ``(n_fft//2+1, n_frames)`` or
    ``(batch, n_fft//2+1, n_frames)`` complex64.

    ``fft_mode`` is a TPU-native extension: 'auto' (= 'fft'), 'fft', or
    'matmul' (the MXU DFT-GEMM path; faster at relaxed matmul precision).
    ``use_pallas`` selects the fused radix kernel (`kernels/stft_radix.py`:
    pad+frame+window+DFT in one kernel, frames never hit HBM); default None
    auto-selects it on TPU where its shape gates admit, unless an explicit
    ``fft_mode`` pins an XLA branch.
    """
    if hop_length is None:
        hop_length = n_fft // 4
    if win_length is None:
        win_length = n_fft
    _validate_stft_params(n_fft, hop_length, win_length, pad_mode)
    y, input_is_1d = _as_batched(y, n_fft, center)

    win = _get_padded_window(window, win_length, n_fft)
    fft_mode_r = _resolve_fft_mode(fft_mode, n_fft)

    from ..kernels.stft_radix import stft_radix_supported

    pallas_ok = (
        dispatch.resolve_use_pallas(use_pallas, default_on_tpu=True)
        and not dispatch.is_batch_traced(y)
        and (fft_mode == "auto" or use_pallas is True)
        and stft_radix_supported(n_fft, hop_length)
    )
    if pallas_ok:
        from ..kernels.stft_radix import stft_pallas

        out = dispatch.try_pallas(lambda: stft_pallas(
            y, win, n_fft=n_fft, hop_length=hop_length, center=center,
            pad_mode=pad_mode,
        ))
        if out is not None:
            return _squeeze0(out) if input_is_1d else out

    out = _stft_core(
        y,
        win,
        forward_basis(n_fft) if fft_mode_r == "matmul" else None,
        n_fft=n_fft,
        hop_length=hop_length,
        center=center,
        pad_mode=pad_mode,
        fft_mode=fft_mode_r,
    )
    out = jnp.swapaxes(out, 1, 2)  # (B, n_bins, F) — librosa convention
    return _squeeze0(out) if input_is_1d else out


@partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "padded_length", "fft_mode", "pallas_mode"),
)
def _istft_core(
    S: jax.Array,
    win: jax.Array,
    basis: jax.Array | None,
    env: jax.Array | None,
    *,
    n_fft: int,
    hop_length: int,
    padded_length: int,
    fft_mode: str,
    pallas_mode: str = "none",
) -> jax.Array:
    """(B, F, n_bins) complex -> (B, padded_length) normalized reconstruction.

    ``env`` is the precomputed clamped squared-window envelope (None only for
    array windows, where it is derived in-graph). ``pallas_mode``: 'fused'
    (one kernel: inverse transform + window + OLA + normalize,
    `kernels/istft_fused.py`), 'ola' (XLA inverse transform + fused OLA
    kernel), or 'none' (pure XLA).
    """
    if env is None:
        env = jnp.maximum(
            window_envelope(win, S.shape[1], hop_length, padded_length),
            WINDOW_SUM_EPSILON,
        )
    if pallas_mode == "fused":
        from ..kernels.istft_fused import istft_pallas

        # kara=True: the 3-GEMM exact complex base (HIGHEST GEMMs) — 25%
        # fewer MXU passes at ~1e-6 round-trip (measured, 10x inside the
        # public <=1e-5 contract); see benchmarks/kernel_ab_r05.json
        return istft_pallas(
            S, win, env, n_fft=n_fft, hop_length=hop_length,
            padded_length=padded_length, kara=True,
        )
    if fft_mode == "matmul":
        frames = irdft_matmul(S, n_fft, basis)
    elif fft_mode == "sixstep":
        from ..kernels.sixstep import irfft_sixstep

        frames = irfft_sixstep(S, n_fft)
    else:
        frames = irfft_len(S, n_fft)
    frames = frames.astype(REAL_DTYPE)
    fw = frames * win
    if pallas_mode == "ola":
        from ..kernels.overlap_add import overlap_add_pallas

        return overlap_add_pallas(
            fw, env, hop_length=hop_length, output_length=padded_length
        )
    y = overlap_add(fw, hop_length, padded_length)
    return y / env


def istft(
    stft_matrix: ArrayLike,
    hop_length: int | None = None,
    win_length: int | None = None,
    n_fft: int | None = None,
    window: str | ArrayLike = "hann",
    center: bool = True,
    length: int | None = None,
    fft_mode: str = "auto",
    use_pallas: bool | None = None,
) -> jax.Array:
    """Inverse Short-Time Fourier Transform.

    librosa-compatible semantics including ``length`` crop/pad and center-pad
    trimming (reference: `mlx_audio_primitives/stft.py:225-344`).

    ``use_pallas`` selects between the fused overlap-add+normalize kernel
    (`kernels/overlap_add.py`, the analog of the reference's fused Metal
    kernel) and the XLA chunk overlap-add — the same graceful-dispatch
    contract as the reference's ``use_cpp``. Default (``None``) picks the
    measured winner: the fused kernel on TPU (5-30% faster end-to-end,
    any hop), the XLA path elsewhere.
    """
    S = jnp.asarray(stft_matrix)
    if S.ndim not in (2, 3):
        raise ValueError(f"stft_matrix must be 2D or 3D, got {S.ndim}D")
    input_is_2d = S.ndim == 2
    if input_is_2d:
        S = S[None]

    _, freq_bins, n_frames = S.shape
    if n_fft is None:
        n_fft = 2 * (freq_bins - 1)
    if hop_length is None:
        hop_length = n_fft // 4
    if win_length is None:
        win_length = n_fft
    if hop_length <= 0:
        raise ValueError(f"hop_length must be positive, got {hop_length}")
    if win_length > n_fft:
        raise ValueError(f"win_length ({win_length}) must be <= n_fft ({n_fft})")

    win = _get_padded_window(window, win_length, n_fft)
    S = jnp.swapaxes(S, 1, 2)  # (B, F, n_bins)

    if length is not None:
        padded_length = length + n_fft if center else length
    else:
        padded_length = n_fft + (n_frames - 1) * hop_length

    fft_mode_r = _resolve_fft_mode(fft_mode, n_fft)
    # Three-tier TPU default: (1) the fully-fused ISTFT kernel (inverse
    # radix transform + window + OLA + normalize in ONE kernel,
    # `kernels/istft_fused.py`) under the radix gates when no explicit
    # fft_mode pins an XLA transform; (2) XLA inverse transform + the fused
    # OLA kernel for other shapes within its envelope; (3) pure XLA.
    from ..kernels.istft_fused import istft_fused_supported
    from ..kernels.overlap_add import ola_supported

    want_pallas = dispatch.resolve_use_pallas(
        use_pallas, default_on_tpu=True
    ) and not dispatch.is_batch_traced(S)
    if (
        want_pallas
        and (fft_mode == "auto" or use_pallas is True)
        and istft_fused_supported(n_fft, hop_length)
    ):
        pallas_mode = "fused"
    elif want_pallas and ola_supported(n_fft, hop_length):
        pallas_mode = "ola"
    else:
        pallas_mode = "none"
    wkey = _window_key(window)
    env = (
        _istft_envelope_table(wkey, win_length, n_fft, n_frames, hop_length,
                              padded_length)
        if wkey is not None
        else None
    )
    y = _istft_core(
        S,
        win,
        inverse_basis(n_fft) if fft_mode_r == "matmul" else None,
        env,
        n_fft=n_fft,
        hop_length=hop_length,
        padded_length=padded_length,
        fft_mode=fft_mode_r,
        pallas_mode=pallas_mode,
    )

    if center:
        pad = n_fft // 2
        if length is not None:
            y = y[:, pad : pad + length]
        else:
            end = y.shape[1] - pad
            y = y[:, pad:end] if end > pad else y[:, :0]
    elif length is not None:
        cur = y.shape[1]
        if length < cur:
            y = y[:, :length]
        elif length > cur:
            y = jnp.pad(y, ((0, 0), (0, length - cur)))

    return y[0] if input_is_2d else y


def magnitude(stft_matrix: ArrayLike) -> jax.Array:
    """Magnitude of a complex STFT (reference: `stft.py:347-362`)."""
    return jnp.abs(jnp.asarray(stft_matrix))


def phase(stft_matrix: ArrayLike) -> jax.Array:
    """Phase (radians) of a complex STFT via arctan2(imag, real)
    (reference: `stft.py:365-379`)."""
    S = jnp.asarray(stft_matrix)
    return jnp.arctan2(jnp.imag(S), jnp.real(S))


def check_nola(
    window: str | ArrayLike,
    hop_length: int,
    n_fft: int,
    tol: float = 1e-10,
) -> bool:
    """Nonzero-overlap-add constraint check (scipy ``check_NOLA`` algorithm;
    reference: `mlx_audio_primitives/stft.py:382-431`). Host-side: it's a
    tiny O(n_fft) reduction whose result gates Python-level control flow."""
    if hop_length <= 0:
        raise ValueError(f"hop_length must be positive, got {hop_length}")
    if hop_length > n_fft:
        # hops larger than the window leave uncovered gaps: NOLA fails
        return False
    win = np.asarray(get_window(window, n_fft, fftbins=True), dtype=np.float64)
    step = hop_length
    n_bins = n_fft // step
    binsums = sum(win[ii * step : (ii + 1) * step] ** 2 for ii in range(n_bins))
    if n_fft % step != 0:
        binsums[: n_fft % step] += win[-(n_fft % step):] ** 2
    return bool(np.min(binsums) > tol)


def reconstruction_length(
    n_frames: int, hop_length: int, n_fft: int, center: bool
) -> int:
    """Natural ISTFT output length for a given frame count (helper)."""
    full = n_fft + (n_frames - 1) * hop_length
    return full - 2 * (n_fft // 2) if center else full


__all__ = [
    "stft",
    "istft",
    "magnitude",
    "phase",
    "check_nola",
    "num_frames",
    "reconstruction_length",
]


def magphase(D: ArrayLike, power: float = 1.0) -> tuple[jax.Array, jax.Array]:
    """Split a complex spectrogram into ``(|D|**power, unit phasors)``
    with ``mag * phase == D`` when ``power=1`` (librosa `magphase`
    semantics). Zero-magnitude cells get phase ``1+0j`` rather than NaN.
    """
    D = jnp.asarray(D)
    mag = jnp.abs(D)
    tiny = jnp.asarray(np.finfo(np.float32).tiny, mag.dtype)
    ph = jnp.where(
        mag > tiny, D / jnp.maximum(mag, tiny).astype(D.dtype),
        jnp.asarray(1.0 + 0.0j, D.dtype),
    )
    if power != 1.0:
        mag = mag**power
    return mag.astype(REAL_DTYPE), ph
