"""Core and composite DSP ops (librosa-compatible)."""

from .convert import amplitude_to_db, db_to_amplitude, db_to_power, power_to_db
from .stft import check_nola, istft, magnitude, phase, stft
from .windows import get_window

__all__ = [
    "stft",
    "istft",
    "magnitude",
    "phase",
    "check_nola",
    "get_window",
    "power_to_db",
    "db_to_power",
    "amplitude_to_db",
    "db_to_amplitude",
]
