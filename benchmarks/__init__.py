"""Benchmark harness for mlx-audio-primitives-tpu.

TPU re-design of the reference's `benchmarks/` package (SURVEY.md §2.4):
per-op suites vs CPU oracles, scaling sweeps, cold/warm cache analysis,
Pallas-vs-XLA comparison, JSON baseline store with regression gating, and a
`tpu-audio-bench` console entry point.
"""

from .schemas import AccuracyStats, BenchmarkMetric, BenchmarkResult, BenchmarkRun
from .utils import compute_accuracy, time_function

__all__ = [
    "BenchmarkResult",
    "BenchmarkMetric",
    "BenchmarkRun",
    "AccuracyStats",
    "time_function",
    "compute_accuracy",
]
