"""Independent float64 NumPy oracles implementing librosa's published algorithms.

librosa/torchaudio are not installed in this environment, so — in addition to
scipy and torch (which ARE available and used directly where they overlap) —
the parity suite validates against these self-contained float64 NumPy
implementations of the exact algorithms librosa documents. They are written
from the algorithm definitions (Slaney mel scale, pad->frame->window->rfft
STFT, triangular filterbanks, DCT-II ortho, etc.), entirely independent of
the library under test (which is float32 JAX), giving a genuine
cross-implementation check in the spirit of the reference's
`tests/test_torchaudio_crossval.py`.
"""

from __future__ import annotations

import numpy as np
import scipy.signal


def window_np(window, n: int, fftbins: bool = True) -> np.ndarray:
    if isinstance(window, np.ndarray):
        return window.astype(np.float64)
    return scipy.signal.get_window(window, n, fftbins=fftbins).astype(np.float64)


def frame_np(y: np.ndarray, frame_length: int, hop_length: int) -> np.ndarray:
    n = 1 + (len(y) - frame_length) // hop_length
    idx = np.arange(n)[:, None] * hop_length + np.arange(frame_length)[None, :]
    return y[idx]


def stft_np(
    y: np.ndarray,
    n_fft: int = 2048,
    hop_length: int | None = None,
    win_length: int | None = None,
    window="hann",
    center: bool = True,
    pad_mode: str = "constant",
) -> np.ndarray:
    """float64 STFT, librosa conventions: output (n_fft//2+1, n_frames)."""
    hop_length = hop_length or n_fft // 4
    win_length = win_length or n_fft
    y = np.asarray(y, dtype=np.float64)
    win = window_np(window, win_length, fftbins=True)
    if win_length < n_fft:
        lp = (n_fft - win_length) // 2
        win = np.pad(win, (lp, n_fft - win_length - lp))
    if center:
        y = np.pad(y, n_fft // 2, mode=pad_mode)
    frames = frame_np(y, n_fft, hop_length) * win
    return np.fft.rfft(frames, axis=-1).T


def istft_np(
    S: np.ndarray,
    hop_length: int | None = None,
    win_length: int | None = None,
    n_fft: int | None = None,
    window="hann",
    center: bool = True,
    length: int | None = None,
    eps: float = 1e-8,
) -> np.ndarray:
    """float64 ISTFT via direct overlap-add with squared-window normalization."""
    freq_bins, n_frames = S.shape
    n_fft = n_fft or 2 * (freq_bins - 1)
    hop_length = hop_length or n_fft // 4
    win_length = win_length or n_fft
    win = window_np(window, win_length, fftbins=True)
    if win_length < n_fft:
        lp = (n_fft - win_length) // 2
        win = np.pad(win, (lp, n_fft - win_length - lp))
    frames = np.fft.irfft(S.T, n=n_fft, axis=-1)
    if length is not None:
        total = length + n_fft if center else length
    else:
        total = n_fft + (n_frames - 1) * hop_length
    y = np.zeros(total)
    wsum = np.zeros(total)
    for f in range(n_frames):
        s = f * hop_length
        e = min(s + n_fft, total)
        if s >= total:
            break
        y[s:e] += frames[f, : e - s] * win[: e - s]
        wsum[s:e] += win[: e - s] ** 2
    y = y / np.maximum(wsum, eps)
    if center:
        pad = n_fft // 2
        y = y[pad : pad + length] if length is not None else y[pad : total - pad]
    elif length is not None:
        y = y[:length] if length <= total else np.pad(y, (0, length - total))
    return y


# ---- mel scale (Slaney & HTK), exactly librosa's documented formulas ----

_F_MIN = 0.0
_F_SP = 200.0 / 3
_MIN_LOG_HZ = 1000.0
_MIN_LOG_MEL = (_MIN_LOG_HZ - _F_MIN) / _F_SP
_LOGSTEP = np.log(6.4) / 27.0


def hz_to_mel_np(f, htk: bool = False):
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    mels = (f - _F_MIN) / _F_SP
    log_t = f >= _MIN_LOG_HZ
    mels = np.where(
        log_t,
        _MIN_LOG_MEL + np.log(np.maximum(f, _MIN_LOG_HZ) / _MIN_LOG_HZ) / _LOGSTEP,
        mels,
    )
    return mels


def mel_to_hz_np(m, htk: bool = False):
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    freqs = _F_MIN + _F_SP * m
    log_t = m >= _MIN_LOG_MEL
    freqs = np.where(log_t, _MIN_LOG_HZ * np.exp(_LOGSTEP * (m - _MIN_LOG_MEL)), freqs)
    return freqs


def mel_filterbank_np(
    sr: int,
    n_fft: int,
    n_mels: int = 128,
    fmin: float = 0.0,
    fmax: float | None = None,
    htk: bool = False,
    norm: str | None = "slaney",
) -> np.ndarray:
    """librosa.filters.mel algorithm (fdiff/ramps formulation) in float64."""
    if fmax is None:
        fmax = sr / 2.0
    fftfreqs = np.linspace(0, sr / 2.0, n_fft // 2 + 1)
    min_mel = hz_to_mel_np(fmin, htk=htk)
    max_mel = hz_to_mel_np(fmax, htk=htk)
    mels = np.linspace(min_mel, max_mel, n_mels + 2)
    mel_f = mel_to_hz_np(mels, htk=htk)
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    if norm == "slaney":
        enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
        weights *= enorm[:, None]
    return weights


def melspectrogram_np(
    y, sr=22050, n_fft=2048, hop_length=512, n_mels=128, power=2.0, **mel_kw
):
    S = np.abs(stft_np(y, n_fft=n_fft, hop_length=hop_length)) ** power
    fb = mel_filterbank_np(sr, n_fft, n_mels=n_mels, **mel_kw)
    return fb @ S


def dct_basis_np(n_out: int, n_in: int) -> np.ndarray:
    """Ortho-normalized DCT-II basis (scipy.fft.dct type 2, norm='ortho')."""
    n = np.arange(n_in, dtype=np.float64)
    k = np.arange(n_out, dtype=np.float64)[:, None]
    basis = np.cos(np.pi * k * (2 * n[None, :] + 1) / (2 * n_in))
    basis *= np.sqrt(2.0 / n_in)
    basis[0] *= 1.0 / np.sqrt(2.0)
    return basis
