"""mlx-audio-primitives-tpu: TPU-native, librosa-compatible audio DSP in JAX.

A ground-up JAX/XLA/Pallas re-design of the audio DSP primitives library
`zkeown/mlx-audio-primitives` (reference `__init__.py:175-226` defines the
public surface this package reproduces): STFT/ISTFT, windows, mel & MFCC,
filterbanks, spectral features, time-domain ops, resampling, Griffin-Lim,
pitch, and dB conversions — all on-device, jit-compiled, and batched.
"""

from __future__ import annotations

__version__ = "0.1.0"

from .ops.convert import (
    amplitude_to_db,
    db_to_amplitude,
    db_to_power,
    power_to_db,
)
from .ops.filterbanks import (
    bark_filterbank,
    bark_to_hz,
    hz_to_bark,
    linear_filterbank,
)
from .ops.mel import hz_to_mel, mel_filterbank, mel_to_hz, melspectrogram
from .ops.mfcc import dct, delta, mfcc
from .ops.stft import check_nola, istft, magnitude, phase, stft
from .ops.windows import get_window
from .utils.dispatch import HAS_PALLAS_TPU as _HAS_PALLAS_TPU  # noqa: F401

__all__ = [
    "__version__",
    # STFT
    "stft",
    "istft",
    "magnitude",
    "phase",
    "check_nola",
    # Windows
    "get_window",
    # Mel
    "mel_filterbank",
    "melspectrogram",
    "hz_to_mel",
    "mel_to_hz",
    # Filterbanks
    "linear_filterbank",
    "bark_filterbank",
    "hz_to_bark",
    "bark_to_hz",
    # MFCC
    "mfcc",
    "delta",
    "dct",
    # Conversions
    "power_to_db",
    "db_to_power",
    "amplitude_to_db",
    "db_to_amplitude",
]
