"""Composed flagship pipelines and the multi-chip training-step demo."""

from .pipelines import (
    LogMelFrontend,
    MFCCPipeline,
    init_classifier_params,
    make_sharded_train_step,
)

__all__ = [
    "LogMelFrontend",
    "MFCCPipeline",
    "init_classifier_params",
    "make_sharded_train_step",
]
