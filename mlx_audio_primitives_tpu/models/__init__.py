"""Composed flagship pipelines and the multi-chip training-step demo."""

from .pipelines import (
    LogMelFrontend,
    MFCCPipeline,
    TrainableLogMelFrontend,
    init_classifier_params,
    make_sharded_train_step,
)
from .presets import (
    PRESETS,
    music_logmel,
    speech_kaldi_logmel,
    vggish_logmel,
    whisper_logmel,
)

__all__ = [
    "LogMelFrontend",
    "MFCCPipeline",
    "TrainableLogMelFrontend",
    "init_classifier_params",
    "make_sharded_train_step",
    "PRESETS",
    "whisper_logmel",
    "vggish_logmel",
    "speech_kaldi_logmel",
    "music_logmel",
]
