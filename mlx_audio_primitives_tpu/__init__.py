"""mlx-audio-primitives-tpu: TPU-native, librosa-compatible audio DSP in JAX.

A ground-up JAX/XLA/Pallas re-design of the audio DSP primitives library
`zkeown/mlx-audio-primitives` (reference `__init__.py:175-226` defines the
public surface this package reproduces): STFT/ISTFT, windows, mel & MFCC,
filterbanks, spectral features, time-domain ops, resampling, Griffin-Lim,
pitch, and dB conversions — all on-device, jit-compiled, and batched.

Core Operations
---------------
stft / istft / magnitude / phase : STFT family
get_window : window functions
mel_filterbank / melspectrogram / hz_to_mel / mel_to_hz : mel scale
linear_filterbank / bark_filterbank / hz_to_bark / bark_to_hz : filterbanks
spectral_{centroid,bandwidth,rolloff,flatness,contrast} / zero_crossing_rate
mfcc / delta / dct : cepstral features
frame / rms / preemphasis / deemphasis : time-domain
resample / resample_poly : sample-rate conversion
griffinlim : phase reconstruction
autocorrelation / pitch_detect_acf / periodicity : pitch
power_to_db / db_to_power / amplitude_to_db / db_to_amplitude : dB
check_nola : invertibility check
"""

from __future__ import annotations

try:  # single source of truth in pyproject (reference `__init__.py:85-91`)
    from importlib.metadata import version as _get_version

    __version__ = _get_version("mlx-audio-primitives-tpu")
except Exception:  # editable / in-tree use
    __version__ = "0.1.0"

from .ops import (
    amplitude_to_db,
    autocorrelation,
    bark_filterbank,
    bark_to_hz,
    check_nola,
    dct,
    db_to_amplitude,
    db_to_power,
    deemphasis,
    delta,
    frame,
    get_window,
    griffinlim,
    hz_to_bark,
    hz_to_mel,
    istft,
    linear_filterbank,
    magnitude,
    mel_filterbank,
    mel_to_hz,
    melspectrogram,
    mfcc,
    periodicity,
    phase,
    pitch_detect_acf,
    power_to_db,
    preemphasis,
    resample,
    resample_poly,
    rms,
    spectral_bandwidth,
    spectral_centroid,
    spectral_contrast,
    spectral_flatness,
    spectral_rolloff,
    stft,
    zero_crossing_rate,
)
from .ops import augment  # noqa: F401  (spec_augment/time_mask/freq_mask/...)
from .ops import streaming  # noqa: F401  (StreamingSTFT/ISTFT/LogMel/MFCC/Pitch)
from .ops.chroma import (  # noqa: F401
    chroma_cens,
    chroma_cqt,
    chroma_vqt,
    chroma_filterbank,
    chroma_stft,
    tonnetz,
)
from .ops.cqt import cqt, cqt_frequencies, pseudo_cqt, vqt  # noqa: F401
from .ops.decompose import decompose, harmonic, hpss, percussive  # noqa: F401
from .ops.effects import (  # noqa: F401
    phase_vocoder,
    pitch_shift,
    remix,
    split,
    time_stretch,
    trim,
)
from .ops.features import poly_features, stack_memory, sync  # noqa: F401
from .ops.inverse import (  # noqa: F401
    mel_to_audio,
    mel_to_stft,
    mfcc_to_audio,
    mfcc_to_mel,
)
from .ops.onset import onset_backtrack, onset_detect, onset_strength  # noqa: F401
from .ops.beat import beat_track  # noqa: F401
from .ops.lpc import lpc  # noqa: F401
from .ops.pcen import pcen  # noqa: F401
from .ops.convert import mu_compress, mu_expand, perceptual_weighting  # noqa: F401
from .ops.harmonics import interp_harmonics, salience  # noqa: F401
from .ops.reassign import reassigned_spectrogram  # noqa: F401
from .ops.segment import cross_similarity, nn_filter, recurrence_matrix  # noqa: F401
from .ops import units  # noqa: F401  (frames/time/notes/MIDI converters)
from .ops import utilx as util  # noqa: F401  (normalize/peak_pick/localmax/...)
from .ops.pitch import estimate_tuning, piptrack, pitch_tuning, yin  # noqa: F401
from .ops.pyin import pyin  # noqa: F401
from .ops.signals import chirp, clicks, tone  # noqa: F401
from .ops.stft import magphase  # noqa: F401
from .ops.rhythm import (  # noqa: F401
    fourier_tempogram,
    tempo,
    tempo_frequencies,
    tempogram,
)
# mel inversion / effects / hpss stay out of __all__, which mirrors the
# reference's exact 40-symbol surface (like the unexported griffinlim_iter /
# streaming module)


def __getattr__(name: str):  # pragma: no cover - lazy flag resolution
    # the analog of the reference's `_HAS_CPP_EXT` flag (`__init__.py:94`
    # there). Resolved lazily: reading it initializes the XLA backend, and
    # doing that at import time would break jax.distributed.initialize().
    if name == "_HAS_PALLAS_TPU":
        from .utils.dispatch import has_pallas_tpu

        return has_pallas_tpu()
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

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
    # Spectral features
    "spectral_centroid",
    "spectral_bandwidth",
    "spectral_rolloff",
    "spectral_flatness",
    "spectral_contrast",
    "zero_crossing_rate",
    # MFCC
    "mfcc",
    "delta",
    "dct",
    # Time-domain
    "frame",
    "rms",
    "preemphasis",
    "deemphasis",
    # Resampling
    "resample",
    "resample_poly",
    # Phase reconstruction
    "griffinlim",
    # Pitch/periodicity
    "autocorrelation",
    "pitch_detect_acf",
    "periodicity",
    # Conversions
    "power_to_db",
    "db_to_power",
    "amplitude_to_db",
    "db_to_amplitude",
]
