"""Mel scale, mel filterbank, and mel spectrogram.

Parity: `mlx_audio_primitives/mel.py` (Slaney constants `:24-28`, filterbank
algorithm `:100-168`, melspectrogram `:245-352`), which itself reproduces
librosa bit-for-bit.

TPU-native design:

* ``hz_to_mel``/``mel_to_hz`` remain host NumPy float64 utilities — they feed
  table construction where precision beats device placement (same decision as
  the reference, whose C++ path forces CPU float64, `csrc/primitives/
  mel_filterbank.cpp:70-106`).
* The filterbank is a host-f64 table cached device-resident (two-tier cache).
* ``melspectrogram`` is ONE fused jitted pipeline:
  pad -> frame -> window -> rDFT-GEMM -> |.|^power -> filterbank GEMM.
  On the GEMM path the complex spectrum is never materialized: the stacked
  [cos|-sin] basis yields (R, I) as real matrices and power = R^2 + I^2 feeds
  the mel matmul directly. Both GEMMs ride the MXU back-to-back, which is the
  whole game for the headline batched-melspectrogram benchmark.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .._config import FILTERBANK_CACHE_SIZE, MATMUL_PRECISION
from ..kernels.bluestein import rfft_power_len
from ..kernels.dft import forward_basis
from ..utils.cache import table_cache
from ..utils.validation import validate_non_negative, validate_positive
from ._frames import frame_signal_batched
from .stft import _get_padded_window, _resolve_fft_mode
from .windows import get_window  # noqa: F401  (re-exported pipeline dep)

ArrayLike = Any

# Slaney mel-scale constants (librosa default; reference `mel.py:24-28`).
_F_MIN = 0.0
_F_SP = 200.0 / 3
_MIN_LOG_HZ = 1000.0
_MIN_LOG_MEL = (_MIN_LOG_HZ - _F_MIN) / _F_SP
_LOGSTEP = np.log(6.4) / 27.0


def hz_to_mel(frequencies: ArrayLike, htk: bool = False) -> np.ndarray:
    """Convert Hz to mel (host float64 NumPy; reference `mel.py:31-62`)."""
    f = np.asarray(frequencies, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(
            f < _MIN_LOG_HZ,
            (f - _F_MIN) / _F_SP,
            _MIN_LOG_MEL + np.log(f / _MIN_LOG_HZ) / _LOGSTEP,
        )


def mel_to_hz(mels: ArrayLike, htk: bool = False) -> np.ndarray:
    """Convert mel to Hz (host float64 NumPy; reference `mel.py:65-93`)."""
    m = np.asarray(mels, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    return np.where(
        m < _MIN_LOG_MEL,
        _F_MIN + _F_SP * m,
        _MIN_LOG_HZ * np.exp(_LOGSTEP * (m - _MIN_LOG_MEL)),
    )


@table_cache("mel_filterbank", maxsize=FILTERBANK_CACHE_SIZE)
def _mel_filterbank_table(
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float,
    fmax: float,
    htk: bool,
    norm: str | None,
) -> np.ndarray:
    """librosa's exact fdiff/ramps triangular-filter algorithm in float64
    (reference `mel.py:100-168`, `csrc/primitives/mel_filterbank.cpp:144-228`).
    Native C++ builder first, NumPy fallback."""
    if norm in (None, "slaney"):
        from .._native import native_mel_filterbank

        fb = native_mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk, norm)
        if fb is not None:
            return fb
    fftfreqs = np.linspace(0, sr / 2.0, 1 + n_fft // 2)
    mels = np.linspace(hz_to_mel(fmin, htk), hz_to_mel(fmax, htk), n_mels + 2)
    mel_f = mel_to_hz(mels, htk)
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    if norm == "slaney":
        enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
        weights *= enorm[:, None]
    elif norm is not None:
        raise ValueError(f"Unknown norm: '{norm}'. Supported: 'slaney', None")
    return weights


def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int = 128,
    fmin: float = 0.0,
    fmax: float | None = None,
    htk: bool = False,
    norm: str | None = "slaney",
) -> jax.Array:
    """Mel filterbank matrix ``(n_mels, n_fft//2 + 1)``, device-cached.

    Reference parity: `mlx_audio_primitives/mel.py:171-242`.
    """
    validate_positive(n_mels, "n_mels")
    validate_non_negative(fmin, "fmin")
    if fmax is None:
        fmax = sr / 2.0
    if fmin >= fmax:
        raise ValueError(f"fmin ({fmin}) must be less than fmax ({fmax})")
    if fmax > sr / 2.0:
        raise ValueError(
            f"fmax ({fmax}) cannot exceed Nyquist frequency ({sr / 2.0})"
        )
    return _mel_filterbank_table(sr, n_fft, n_mels, float(fmin), float(fmax), htk, norm)


@partial(
    jax.jit,
    static_argnames=(
        "n_fft",
        "hop_length",
        "center",
        "pad_mode",
        "power",
        "fft_mode",
    ),
)
def _melspec_core(
    y: jax.Array,
    win: jax.Array,
    fb_t: jax.Array,
    basis: jax.Array | None,
    *,
    n_fft: int,
    hop_length: int,
    center: bool,
    pad_mode: str,
    power: float,
    fft_mode: str,
) -> jax.Array:
    """Fused (B, L) -> (B, n_mels, F); no complex intermediate on GEMM path."""
    if center:
        pad = n_fft // 2
        y = jnp.pad(y, ((0, 0), (pad, pad)), mode=pad_mode)
    frames = frame_signal_batched(y, n_fft, hop_length) * win
    n_bins = n_fft // 2 + 1
    if fft_mode == "matmul":
        # basis: (n_fft, 2*n_bins) [cos | -sin]
        ri = jnp.matmul(frames, basis, precision=MATMUL_PRECISION)
        pow2 = ri[..., :n_bins] ** 2 + ri[..., n_bins:] ** 2
    elif fft_mode == "sixstep":
        from ..kernels.sixstep import rfft_power_sixstep

        pow2 = rfft_power_sixstep(frames, n_fft)
    else:
        pow2 = rfft_power_len(frames, n_fft)
    if power == 2.0:
        P = pow2
    elif power == 1.0:
        P = jnp.sqrt(pow2)
    else:
        P = jnp.power(pow2, power / 2.0)
    mel = jnp.matmul(P, fb_t, precision=MATMUL_PRECISION)  # (B, F, n_mels)
    return jnp.swapaxes(mel, 1, 2)


def melspectrogram(
    y: ArrayLike,
    sr: int = 22050,
    n_fft: int = 2048,
    hop_length: int | None = None,
    win_length: int | None = None,
    window: str | ArrayLike = "hann",
    center: bool = True,
    pad_mode: str = "constant",
    power: float = 2.0,
    n_mels: int = 128,
    fmin: float = 0.0,
    fmax: float | None = None,
    htk: bool = False,
    norm: str | None = "slaney",
    fft_mode: str = "auto",
    use_pallas: bool | None = None,
) -> jax.Array:
    """Mel spectrogram ``(n_mels, n_frames)`` / ``(batch, n_mels, n_frames)``.

    librosa-compatible signature (reference `mel.py:245-352`); the compute is
    one fused jit (see module docstring). ``use_pallas`` picks between the
    single-kernel fused radix path (`kernels/mel_fused.py`) and the XLA
    pipeline; the default (None) auto-selects the kernel on TPU where its
    shape gates admit (pow2 ``n_fft`` divisible by ``hop``, ``hop`` a
    multiple of 128, ``power`` in {1, 2}) — with the default 3-pass
    bf16-split GEMMs (`_config.ANALYSIS_FAST_GEMM`) it measures ~4x the XLA
    six-step pipeline in the same ~2.5e-5 accuracy class; set
    ``ANALYSIS_FAST_GEMM = False`` for the f32-exact (3e-7) kernel at ~2x.
    """
    from .stft import _as_batched, _validate_stft_params

    if hop_length is None:
        hop_length = n_fft // 4
    if win_length is None:
        win_length = n_fft
    _validate_stft_params(n_fft, hop_length, win_length, pad_mode)
    y, input_is_1d = _as_batched(y, n_fft, center)

    fb = mel_filterbank(
        sr=sr, n_fft=n_fft, n_mels=n_mels, fmin=fmin, fmax=fmax, htk=htk, norm=norm
    )
    win = _get_padded_window(window, win_length, n_fft)
    out = filterbank_spectrogram(
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
    return out[0] if input_is_1d else out


def filterbank_spectrogram(
    y: jax.Array,
    win: jax.Array,
    fb: jax.Array,
    *,
    n_fft: int,
    hop_length: int,
    center: bool,
    pad_mode: str,
    power: float,
    fft_mode: str = "auto",
    use_pallas: bool | None = None,
) -> jax.Array:
    """Fused ``fb @ |STFT(y)|^power`` for an arbitrary ``(n_bands, n_bins)``
    filterbank: ``(B, L) -> (B, n_bands, F)``.

    The dispatch shared by :func:`melspectrogram` and
    :func:`~.chroma.chroma_stft` — any row-matrix over rfft bins rides the
    same fused radix Pallas kernel / six-step / packed-FFT policy (the kernel
    contracts ``|rDFT|^p`` with whatever "filterbank" it is handed, exactly
    how the ACF lag basis already uses it, `pitch.py:246-285`).
    """
    from ..kernels.mel_fused import radix_supported
    from ..utils import dispatch as _dispatch

    if fft_mode != "auto":
        # validate eagerly (and on every platform): an explicit fft_mode
        # must never be silently swallowed by the Pallas auto-dispatch below
        _resolve_fft_mode(fft_mode, n_fft)

    # The fused radix kernel measures ~2x faster than the XLA six-step
    # pipeline at float32-exact accuracy (module docstring, v5e numbers), so
    # it is the TPU auto default wherever its shape gates admit. An explicit
    # fft_mode pins the XLA pipeline unless use_pallas=True overrides.
    pallas_ok = (
        _dispatch.resolve_use_pallas(use_pallas, default_on_tpu=True)
        and not _dispatch.is_batch_traced(y)
        and (fft_mode == "auto" or use_pallas is True)
        and power in (1.0, 2.0)
        and radix_supported(n_fft, hop_length, fb.shape[0])
    )
    if pallas_ok:
        from ..kernels.mel_fused import melspectrogram_pallas

        out = _dispatch.try_pallas(lambda: melspectrogram_pallas(
            y,
            win,
            fb.T,
            n_fft=n_fft,
            hop_length=hop_length,
            center=center,
            pad_mode=pad_mode,
            power=float(power),
        ))
        if out is not None:
            return out

    n_frames_est = 1 + (y.shape[1] + (n_fft if center else 0) - n_fft) // hop_length
    if fft_mode == "auto":
        # Mel's accuracy budget (reference claims ~1e-4 for mel/MFCC) admits
        # the six-step MXU transform: 2.4e-5 rel vs the f64 oracle and ~1.3x
        # the packed-FFT path on v5e (0.39 vs 0.51 ms for the batch-64
        # headline). Only worthwhile when the frame GEMMs have enough rows;
        # small workloads stay on the packed FFT (stft() always does).
        from ..kernels import sixstep as _sixstep

        enough_rows = y.shape[0] * n_frames_est >= 256
        fft_mode_r = (
            "sixstep" if (_sixstep.supported(n_fft) and enough_rows) else "fft"
        )
    else:
        fft_mode_r = _resolve_fft_mode(fft_mode, n_fft)
    return _melspec_core(
        y,
        win,
        fb.T,
        forward_basis(n_fft) if fft_mode_r == "matmul" else None,
        n_fft=n_fft,
        hop_length=hop_length,
        center=center,
        pad_mode=pad_mode,
        power=float(power),
        fft_mode=fft_mode_r,
    )
