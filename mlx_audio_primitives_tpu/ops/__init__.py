"""Core and composite DSP ops (librosa-compatible)."""

from .convert import amplitude_to_db, db_to_amplitude, db_to_power, power_to_db
from .filterbanks import bark_filterbank, bark_to_hz, hz_to_bark, linear_filterbank
from .mel import hz_to_mel, mel_filterbank, mel_to_hz, melspectrogram
from .mfcc import dct, delta, mfcc
from .stft import check_nola, istft, magnitude, phase, stft
from .windows import get_window

__all__ = [
    "mel_filterbank",
    "melspectrogram",
    "hz_to_mel",
    "mel_to_hz",
    "linear_filterbank",
    "bark_filterbank",
    "hz_to_bark",
    "bark_to_hz",
    "mfcc",
    "delta",
    "dct",
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
