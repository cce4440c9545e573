"""Benchmark result dataclasses (analog of reference `benchmarks/schemas.py`)."""

from __future__ import annotations

import dataclasses
import datetime
import subprocess
from dataclasses import dataclass, field
from typing import Any


@dataclass
class AccuracyStats:
    max_error: float
    mean_error: float
    correlation: float


@dataclass
class BenchmarkResult:
    """One timed comparison line (reference `utils.py:12-27`)."""

    name: str
    time_ms: float
    baseline_name: str | None = None
    baseline_time_ms: float | None = None
    accuracy: AccuracyStats | None = None
    extra: dict[str, Any] = field(default_factory=dict)

    @property
    def speedup(self) -> float | None:
        if self.baseline_time_ms and self.time_ms:
            return self.baseline_time_ms / self.time_ms
        return None

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["speedup"] = self.speedup
        return d


@dataclass
class BenchmarkMetric:
    """Persisted metric with optional cold/warm/memory fields
    (reference `schemas.py:18-42`)."""

    name: str
    value: float
    unit: str = "ms"
    cold_ms: float | None = None
    warm_ms: float | None = None
    peak_memory_mb: float | None = None

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


def _git_sha() -> str | None:
    try:
        return (
            subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True, check=True,
            ).stdout.strip()
        )
    except Exception:
        return None


@dataclass
class BenchmarkRun:
    """A full run: metrics + provenance (reference `schemas.py:72-118`)."""

    platform_key: str
    metrics: list[BenchmarkMetric]
    version: str = ""
    git_sha: str | None = None
    timestamp: str = ""
    platform_info: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def create(cls, platform_key, metrics, platform_info) -> "BenchmarkRun":
        from mlx_audio_primitives_tpu import __version__

        return cls(
            platform_key=platform_key,
            metrics=metrics,
            version=__version__,
            git_sha=_git_sha(),
            timestamp=datetime.datetime.now(datetime.timezone.utc).isoformat(),
            platform_info=platform_info,
        )

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["metrics"] = [m.to_dict() for m in self.metrics]
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "BenchmarkRun":
        metrics = [BenchmarkMetric(**m) for m in d.get("metrics", [])]
        return cls(
            platform_key=d["platform_key"],
            metrics=metrics,
            version=d.get("version", ""),
            git_sha=d.get("git_sha"),
            timestamp=d.get("timestamp", ""),
            platform_info=d.get("platform_info", {}),
        )
