"""Spectral features: centroid, bandwidth, rolloff, flatness, contrast, ZCR.

Parity: `mlx_audio_primitives/features.py:24-722`.

TPU-native improvements over the reference:

* ``spectral_rolloff`` — the reference loops ``np.searchsorted`` per frame on
  the host (`features.py:242-271`) or calls a C++ kernel. Here it's a pure
  XLA cumsum -> first-above-threshold argmax, fully batched (the C++ kernel's
  own trick, `csrc/primitives/spectral.cpp:125-207`, is the same formulation).
* ``spectral_contrast`` — the reference is a pure-NumPy host port of librosa
  (`features.py:445-592`). Here the octave-band loop is unrolled at trace
  time (band edges are static given sr/n_fft) and each band's quantile
  statistics use ``jnp.sort`` on device; identical algorithm, zero host work.
* ``zero_crossing_rate`` — sign handling uses ``signbit`` (librosa's exact
  definition, reference `features.py:695-713`) while staying on device.

``use_cpp``/``use_mlx`` keyword arguments are accepted for signature
compatibility with the reference and ignored (there is a single XLA path).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .._config import MATMUL_PRECISION, REAL_DTYPE
from ..kernels.precise_math import exp10, log10
from ..utils.cache import table_cache
from ..utils.validation import validate_positive, validate_range
from ._frames import frame_signal_batched
from .stft import magnitude_spectrogram

ArrayLike = Any


def _get_frequencies(sr: int, n_fft: int) -> jax.Array:
    return jnp.linspace(0.0, sr / 2.0, n_fft // 2 + 1, dtype=REAL_DTYPE)


def _compute_spectrogram(
    y, S, n_fft, hop_length, win_length, window, center, pad_mode, power=1.0,
    fast_gemm=None,
) -> jax.Array:
    """S-or-y input protocol (librosa style; reference `features.py:24-54`).

    A provided ``S`` is taken AS-IS — no ``power`` exponent is applied and
    ``n_fft`` is NOT inferred from its bin count, exactly like the reference
    (`features.py:36-37`): the caller is responsible for passing a
    spectrogram whose scale matches ``power`` and whose bins match the
    ``n_fft`` used for frequency mapping. (librosa differs on both points.)
    """
    if S is not None:
        return jnp.asarray(S, dtype=REAL_DTYPE)
    if y is None:
        raise ValueError("Either y (audio) or S (spectrogram) must be provided")
    # Fused magnitude path: |stft| without the complex intermediate.
    S = magnitude_spectrogram(
        y,
        n_fft=n_fft,
        hop_length=hop_length,
        win_length=win_length,
        window=window,
        center=center,
        pad_mode=pad_mode,
        fast_gemm=fast_gemm,
    )
    if power != 1.0:
        S = jnp.power(S, power)
    return S


def _moments_fused(
    y, freq, *, n_fft, hop_length, win_length, window, center, pad_mode
):
    """``(M0, M1) = (sum S, sum f*S)`` per frame via the fused radix kernel
    with the ``[1, f]`` weight pair as its folded "filterbank" (power=1).

    Returns None when the kernel's gates reject the config (non-radix
    shape, off-TPU, or a freq vector of the wrong length) — callers fall
    back to the explicit-spectrogram formula. Shapes: ``(B?, 1, F)`` each,
    matching the feature ops' keepdims convention.
    """
    from ..kernels.mel_fused import melspectrogram_pallas, radix_supported
    from ..utils import dispatch
    from .stft import _as_batched, _get_padded_window, _validate_stft_params

    if freq.ndim != 1 or freq.shape[0] != n_fft // 2 + 1:
        return None
    if not (
        dispatch.resolve_use_pallas(None, default_on_tpu=True)
        and not dispatch.is_batch_traced(y)
        and radix_supported(n_fft, hop_length, 2)
    ):
        return None
    if win_length is None:
        win_length = n_fft
    # same argument contract as every STFT-family op — the fast path must
    # raise the same ValueErrors as the fallback, not kernel-shape errors
    _validate_stft_params(n_fft, hop_length, win_length, pad_mode)
    y = jnp.asarray(y, dtype=REAL_DTYPE)
    input_is_1d = y.ndim == 1
    y, _ = _as_batched(y, n_fft, center)
    win = _get_padded_window(window, win_length, n_fft)
    fb = jnp.stack([jnp.ones_like(freq), freq], axis=1)  # (n_bins, 2)
    M = melspectrogram_pallas(
        y, win, fb, n_fft=n_fft, hop_length=hop_length, center=center,
        pad_mode=pad_mode, power=1.0,
    )  # (B, 2, F)
    M0, M1 = M[:, 0:1, :], M[:, 1:2, :]
    if input_is_1d:
        M0, M1 = M0[0], M1[0]
    return M0, M1


def spectral_centroid(
    y: ArrayLike | None = None,
    sr: int = 22050,
    S: ArrayLike | None = None,
    n_fft: int = 2048,
    hop_length: int = 512,
    win_length: int | None = None,
    window: str | ArrayLike = "hann",
    center: bool = True,
    pad_mode: str = "constant",
    freq: ArrayLike | None = None,
) -> jax.Array:
    """Spectral centroid ``sum(f*S)/sum(S)`` per frame, shape ``(..., 1, F)``.

    Reference parity: `features.py:57-134`.

    Fast path (y input, radix shapes): the [1, f] weight pair rides the
    fused radix kernel as a two-column "filterbank", so |X| and both
    moments happen in one kernel — the spectrogram never exists in HBM
    (2.6x at batch-64 x 4 s; same trick as the pitch lag basis).
    """
    freq = _get_frequencies(sr, n_fft) if freq is None else jnp.asarray(freq, REAL_DTYPE)
    if S is None and y is not None:
        out = _moments_fused(
            y, freq, n_fft=n_fft, hop_length=hop_length,
            win_length=win_length, window=window, center=center,
            pad_mode=pad_mode,
        )
        if out is not None:
            M0, M1 = out
            return M1 / (M0 + 1e-10)
    S = _compute_spectrogram(y, S, n_fft, hop_length, win_length, window, center, pad_mode)
    is_batched = S.ndim == 3
    if not is_batched:
        S = S[None]
    weighted = jnp.sum(freq[:, None] * S, axis=1, keepdims=True)
    total = jnp.sum(S, axis=1, keepdims=True) + 1e-10
    out = weighted / total
    return out if is_batched else out[0]


def spectral_bandwidth(
    y: ArrayLike | None = None,
    sr: int = 22050,
    S: ArrayLike | None = None,
    n_fft: int = 2048,
    hop_length: int = 512,
    win_length: int | None = None,
    window: str | ArrayLike = "hann",
    center: bool = True,
    pad_mode: str = "constant",
    freq: ArrayLike | None = None,
    centroid: ArrayLike | None = None,
    p: float = 2.0,
    norm: bool = True,
) -> jax.Array:
    """Spectral bandwidth ``(sum(S*|f-c|^p)/sum(S))^(1/p)`` per frame.

    Reference parity: `features.py:137-239` (including the
    autocompute-centroid sentinel).
    """
    S = _compute_spectrogram(y, S, n_fft, hop_length, win_length, window, center, pad_mode)
    freq = _get_frequencies(sr, n_fft) if freq is None else jnp.asarray(freq, REAL_DTYPE)
    is_batched = S.ndim == 3
    if not is_batched:
        S = S[None]
    if centroid is None:
        centroid = spectral_centroid(S=S, sr=sr, n_fft=n_fft, freq=freq)
    else:
        centroid = jnp.asarray(centroid, REAL_DTYPE)
    if centroid.ndim == 2:
        centroid = centroid[None]
    deviation = jnp.abs(freq[None, :, None] - centroid)
    weighted = jnp.sum(S * jnp.power(deviation, p), axis=1, keepdims=True)
    if norm:
        weighted = weighted / (jnp.sum(S, axis=1, keepdims=True) + 1e-10)
    out = jnp.power(weighted, 1.0 / p)
    return out if is_batched else out[0]


def spectral_rolloff(
    y: ArrayLike | None = None,
    sr: int = 22050,
    S: ArrayLike | None = None,
    n_fft: int = 2048,
    hop_length: int = 512,
    win_length: int | None = None,
    window: str | ArrayLike = "hann",
    center: bool = True,
    pad_mode: str = "constant",
    freq: ArrayLike | None = None,
    roll_percent: float = 0.85,
    use_cpp: bool = True,  # compatibility no-op (reference `features.py:318`)
) -> jax.Array:
    """Rolloff frequency: first bin where cumulative energy reaches
    ``roll_percent`` of the total. Reference parity: `features.py:274-360`.
    """
    del use_cpp
    validate_range(roll_percent, "roll_percent", low=0.0, high=1.0)
    S = _compute_spectrogram(y, S, n_fft, hop_length, win_length, window, center, pad_mode)
    freq = _get_frequencies(sr, n_fft) if freq is None else jnp.asarray(freq, REAL_DTYPE)
    is_batched = S.ndim == 3
    if not is_batched:
        S = S[None]
    cumsum = jnp.cumsum(S, axis=1)
    threshold = roll_percent * cumsum[:, -1:, :]
    # searchsorted(cumsum, t) == index of first bin with cumsum >= t;
    # argmax returns the first True of the mask.
    mask = cumsum >= threshold
    idx = jnp.argmax(mask, axis=1)  # (B, F)
    idx = jnp.minimum(idx, S.shape[1] - 1)
    out = freq[idx][:, None, :]
    return out if is_batched else out[0]


def spectral_flatness(
    y: ArrayLike | None = None,
    S: ArrayLike | None = None,
    n_fft: int = 2048,
    hop_length: int = 512,
    win_length: int | None = None,
    window: str | ArrayLike = "hann",
    center: bool = True,
    pad_mode: str = "constant",
    power: float = 2.0,
    amin: float = 1e-10,
) -> jax.Array:
    """Spectral flatness (Wiener entropy): geometric / arithmetic mean.

    Reference parity: `features.py:363-442`. Uses the precise log10/exp10
    kernels so the geometric mean keeps ~1e-6 accuracy.

    The magnitude is computed with f32-exact GEMMs (``fast_gemm=False``):
    the geometric mean takes ``log(power)`` of every bin, so near-silent
    bins sit at the spectrum's rounding floor — the fused kernel's 3-pass
    bf16 mode would lift that floor (~2.7e-5 rel vs ~1e-7) above the
    ``amin`` clamp and shift flatness on tonal signals.
    """
    S = _compute_spectrogram(
        y, S, n_fft, hop_length, win_length, window, center, pad_mode, power,
        fast_gemm=False,
    )
    is_batched = S.ndim == 3
    if not is_batched:
        S = S[None]
    S = jnp.maximum(S, amin)
    gmean = exp10(jnp.mean(log10(S), axis=1, keepdims=True))
    amean = jnp.mean(S, axis=1, keepdims=True)
    out = gmean / (amean + 1e-10)
    return out if is_batched else out[0]


def spectral_contrast(
    y: ArrayLike | None = None,
    sr: int = 22050,
    S: ArrayLike | None = None,
    n_fft: int = 2048,
    hop_length: int = 512,
    win_length: int | None = None,
    window: str | ArrayLike = "hann",
    center: bool = True,
    pad_mode: str = "constant",
    freq: ArrayLike | None = None,
    fmin: float = 200.0,
    n_bands: int = 6,
    quantile: float = 0.02,
    linear: bool = False,
) -> jax.Array:
    """Octave-band spectral contrast (peak - valley quantile means).

    librosa's exact algorithm (reference `features.py:445-592`): octave band
    edges ``[0, fmin, 2*fmin, ...]``, neighbor-bin extension at the lower
    edge, Nyquist extension for the last band, ``n_quantile`` computed before
    dropping the shared upper bin. Band membership is static, so the band
    loop unrolls at trace time; per-band sorting runs on device.
    """
    validate_positive(n_bands, "n_bands")
    validate_range(quantile, "quantile", low=0.0, high=1.0)
    S = _compute_spectrogram(y, S, n_fft, hop_length, win_length, window, center, pad_mode)
    is_batched = S.ndim == 3
    if not is_batched:
        S = S[None]

    if freq is None:
        freq_np = np.linspace(0, sr / 2.0, n_fft // 2 + 1)
    else:
        freq_np = np.asarray(freq, dtype=np.float64)

    octa = np.zeros(n_bands + 2)
    octa[1:] = fmin * (2.0 ** np.arange(0, n_bands + 1))

    valleys, peaks = [], []
    B, n_bins, F = S.shape
    zeros = jnp.zeros((B, 1, F), dtype=S.dtype)
    # one transpose for every band: bins minormost, where both the sort and
    # the extraction kernel want them
    St = jnp.swapaxes(S, 1, 2)  # (B, F, n_bins)
    from ..kernels.select_extremes import (
        quantile_extreme_means_pallas,
        select_supported,
    )
    from ..utils import dispatch

    use_kernel = dispatch.resolve_use_pallas(
        None, default_on_tpu=True
    ) and not dispatch.is_batch_traced(St)
    for k, (f_low, f_high) in enumerate(zip(octa[:-1], octa[1:])):
        band = np.logical_and(freq_np >= f_low, freq_np <= f_high)
        idx = np.flatnonzero(band)
        if len(idx) == 0:
            valleys.append(zeros)
            peaks.append(zeros)
            continue
        if k > 0 and idx[0] > 0:
            band[idx[0] - 1] = True
        if k == n_bands and idx[-1] + 1 < len(band):
            band[idx[-1] + 1 :] = True
        n_quantile = int(np.maximum(np.rint(quantile * np.sum(band)), 1))
        sel = np.flatnonzero(band)
        sub = St[:, :, sel[0] : sel[-1] + 1]  # bands are contiguous bins
        if k < n_bands and sub.shape[-1] > 1:
            sub = sub[:, :, :-1]
        W = sub.shape[-1]
        if n_quantile == 1:
            # mean of the single smallest/largest value = plain min/max —
            # no sort needed (covers the narrow low bands, ~60x cheaper)
            valley_bf = jnp.min(sub, axis=-1)
            peak_bf = jnp.max(sub, axis=-1)
        elif use_kernel and select_supported(W, n_quantile, n_quantile):
            # small-k extraction kernel: one VMEM-resident pass instead of
            # a bitonic device sort (see kernels/select_extremes.py)
            lo, hi = quantile_extreme_means_pallas(
                sub.reshape(B * F, W), k_lo=n_quantile, k_hi=n_quantile
            )
            valley_bf = lo.reshape(B, F)
            peak_bf = hi.reshape(B, F)
        else:
            sorted_sub = jnp.sort(sub, axis=-1)
            valley_bf = jnp.mean(sorted_sub[..., :n_quantile], axis=-1)
            peak_bf = jnp.mean(sorted_sub[..., -n_quantile:], axis=-1)
        valleys.append(valley_bf[:, None, :])
        peaks.append(peak_bf[:, None, :])

    valley = jnp.concatenate(valleys, axis=1)
    peak = jnp.concatenate(peaks, axis=1)

    if linear:
        out = peak - valley
    else:
        peak_db = 10.0 * log10(jnp.maximum(peak, 1e-10))
        valley_db = 10.0 * log10(jnp.maximum(valley, 1e-10))
        out = peak_db - valley_db
    return out if is_batched else out[0]


def zero_crossing_rate(
    y: ArrayLike,
    frame_length: int = 2048,
    hop_length: int = 512,
    center: bool = True,
    pad_mode: str = "edge",
    use_mlx: bool = True,  # compatibility no-op (reference `features.py:631`)
) -> jax.Array:
    """Zero-crossing rate per frame, shape ``(..., 1, F)``.

    librosa semantics: signbit sign changes, first frame position counts no
    crossing, default edge padding (reference `features.py:625-722`).
    """
    del use_mlx
    validate_positive(frame_length, "frame_length")
    validate_positive(hop_length, "hop_length")
    y = jnp.asarray(y, dtype=REAL_DTYPE)
    input_is_1d = y.ndim == 1
    if input_is_1d:
        y = y[None]
    if center:
        pad = frame_length // 2
        if pad_mode not in ("constant", "edge"):
            raise ValueError(
                f"Unknown pad_mode: '{pad_mode}'. Supported: 'constant', 'edge'"
            )
        y = jnp.pad(y, ((0, 0), (pad, pad)), mode=pad_mode)
    frames = frame_signal_batched(y, frame_length, hop_length)
    sign = jnp.signbit(frames)
    crossings = (sign[..., 1:] != sign[..., :-1]).astype(REAL_DTYPE)
    # librosa pads the first position with "no crossing": mean over
    # frame_length with frame_length-1 contributing terms.
    zcr = jnp.sum(crossings, axis=-1, keepdims=True) / frame_length
    zcr = jnp.swapaxes(zcr, 1, 2)
    return zcr[0] if input_is_1d else zcr


@table_cache("poly_basis", maxsize=8)
def _poly_pinv_table(sr: int, n_fft: int, order: int) -> np.ndarray:
    """Pseudo-inverse of the Vandermonde matrix over the rfft frequency
    grid, host float64 (the least-squares operator np.polyfit applies);
    rows ordered highest degree first, librosa/np.polyfit convention."""
    freq = np.linspace(0, sr / 2.0, n_fft // 2 + 1)
    V = np.vander(freq, order + 1)  # columns: f^order .. f^0
    return np.linalg.pinv(V).astype(np.float32)  # (order+1, n_bins)


def poly_features(
    y: ArrayLike | None = None,
    sr: int = 22050,
    S: ArrayLike | None = None,
    n_fft: int = 2048,
    hop_length: int = 512,
    win_length: int | None = None,
    window: str | ArrayLike = "hann",
    center: bool = True,
    pad_mode: str = "constant",
    order: int = 1,
    freq: ArrayLike | None = None,
) -> jax.Array:
    """Per-frame polynomial fit to the spectrum, ``(..., order+1, F)``.

    librosa `feature.poly_features` semantics: least-squares coefficients
    of a degree-``order`` polynomial in frequency fitted to each frame's
    magnitudes, highest degree first (np.polyfit convention). The
    least-squares solve is one cached pseudo-inverse table times the
    spectrogram — a single MXU matmul for every frame at once, instead of
    np.polyfit's per-call SVD.

    ``freq`` overrides the fit grid (must be 1-D, one value per bin); a
    custom grid computes its pseudo-inverse on the host per call rather
    than via the cached table.
    """
    validate_positive(n_fft, "n_fft")
    if order < 0:
        raise ValueError(f"order must be non-negative, got {order}")
    S = _compute_spectrogram(
        y, S, n_fft, hop_length, win_length, window, center, pad_mode
    )
    if freq is None:
        P = _poly_pinv_table(int(sr), int(n_fft), int(order))
    else:
        f = np.asarray(freq, dtype=np.float64)
        if f.ndim != 1 or f.shape[0] != S.shape[-2]:
            raise ValueError(
                f"freq must be 1-D with one value per bin "
                f"({S.shape[-2]}), got shape {f.shape}"
            )
        P = jnp.asarray(
            np.linalg.pinv(np.vander(f, order + 1)).astype(np.float32)
        )
    return jnp.einsum(
        "ck,...kf->...cf", P, S, precision=MATMUL_PRECISION
    ).astype(REAL_DTYPE)


def stack_memory(
    data: ArrayLike, n_steps: int = 2, delay: int = 1
) -> jax.Array:
    """Short-term history embedding: vertically stack ``n_steps``
    time-shifted copies of a feature matrix, ``(..., d*n_steps, F)``.

    librosa `feature.stack_memory` semantics: block ``k`` holds the
    features delayed by ``k * delay`` frames (zero-padded at the edge a
    shift runs off); negative ``delay`` embeds the future instead.
    """
    if n_steps < 1:
        raise ValueError(f"n_steps must be at least 1, got {n_steps}")
    if delay == 0:
        raise ValueError("delay must be non-zero")
    x = jnp.asarray(data, dtype=REAL_DTYPE)
    if x.ndim < 2:
        x = x[None]
    F = x.shape[-1]
    blocks = []
    for k in range(n_steps):
        shift = k * delay
        if shift == 0:
            blocks.append(x)
        elif shift > 0:
            pad = [(0, 0)] * x.ndim
            pad[-1] = (shift, 0)
            blocks.append(jnp.pad(x, pad)[..., :F])
        else:
            pad = [(0, 0)] * x.ndim
            pad[-1] = (0, -shift)
            blocks.append(jnp.pad(x, pad)[..., -F:])
    return jnp.concatenate(blocks, axis=-2)


def sync(
    data: ArrayLike,
    idx: ArrayLike,
    aggregate: str = "mean",
    pad: bool = True,
    axis: int = -1,
) -> jax.Array:
    """Aggregate a feature matrix between boundary frames (librosa
    `util.sync` semantics) — the beat-synchronous feature reducer:
    ``sync(C, beat_frames)`` collapses a chromagram to one column per
    beat interval.

    ``idx`` holds ordered slice boundaries; ``pad=True`` prepends 0 and
    appends the axis length so leading/trailing partial segments are
    kept. ``aggregate``: 'mean', 'median', 'max', or 'min'. Segments are
    inherently ragged, so this is a host boundary by design (one NumPy
    reduction per segment over device-fetched data).

    Deliberate deviation: empty segments (duplicate boundaries) emit a
    zero column here, whereas librosa's ``util.sync`` yields NaN for
    mean/median and raises for max/min on an empty slice — zeros keep
    the output finite and usable downstream. Crossval suites must not
    assert strict equality on the duplicate-boundary case.
    """
    x = np.asarray(jnp.asarray(data, dtype=REAL_DTYPE))
    x = np.moveaxis(x, axis, -1)
    n = x.shape[-1]
    bounds = np.asarray(idx, dtype=np.int64).ravel()
    if np.any(np.diff(bounds) < 0):
        raise ValueError("idx must be non-decreasing")
    if bounds.size and (bounds[0] < 0 or bounds[-1] > n):
        raise ValueError(f"idx out of range for axis length {n}")
    if pad:
        bounds = np.concatenate([[0], bounds, [n]])
    # keep duplicate boundaries: each requested segment yields a column,
    # empty segments emitting zeros (deliberate deviation from librosa's
    # NaN/raise on empty slices — see docstring)
    bounds = np.sort(bounds)
    agg = {"mean": np.mean, "median": np.median, "max": np.max,
           "min": np.min}.get(aggregate)
    if agg is None:
        raise ValueError(
            f"Unknown aggregate: '{aggregate}'. Supported: 'mean', "
            "'median', 'max', 'min'"
        )
    cols = []
    for a, b in zip(bounds[:-1], bounds[1:]):
        if b > a:
            cols.append(agg(x[..., a:b], axis=-1))
        else:
            cols.append(np.zeros(x.shape[:-1], x.dtype))
    out = (
        np.stack(cols, axis=-1)
        if cols else np.zeros(x.shape[:-1] + (0,), x.dtype)
    )
    return jnp.asarray(np.moveaxis(out, -1, axis))
