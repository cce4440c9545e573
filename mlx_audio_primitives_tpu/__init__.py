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
    # Conversions
    "power_to_db",
    "db_to_power",
    "amplitude_to_db",
    "db_to_amplitude",
]
