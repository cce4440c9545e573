"""JSON baseline store + regression detection.

Analog of reference `benchmarks/baseline.py:31-261`: baselines keyed by
platform, each carrying version/git-sha/timestamp, per-metric ratio
comparison with a 10% default threshold, and an exit-code gate.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path

from .schemas import BenchmarkRun

DEFAULT_BASELINE_PATH = Path(__file__).parent / "baselines.json"
REGRESSION_THRESHOLD = 0.10  # >10% slower = regression


def load_baselines(path: Path = DEFAULT_BASELINE_PATH) -> dict[str, BenchmarkRun]:
    if not Path(path).exists():
        return {}
    raw = json.loads(Path(path).read_text())
    return {k: BenchmarkRun.from_dict(v) for k, v in raw.items()}


def save_baseline(
    run: BenchmarkRun, path: Path = DEFAULT_BASELINE_PATH
) -> None:
    baselines = load_baselines(path)
    baselines[run.platform_key] = run
    Path(path).write_text(
        json.dumps({k: v.to_dict() for k, v in baselines.items()}, indent=2)
    )


@dataclass
class Comparison:
    metric: str
    baseline: float
    current: float
    ratio: float  # current / baseline (time-like: >1 is slower)
    regressed: bool


def compare_to_baseline(
    run: BenchmarkRun,
    path: Path = DEFAULT_BASELINE_PATH,
    threshold: float = REGRESSION_THRESHOLD,
) -> list[Comparison]:
    baselines = load_baselines(path)
    base = baselines.get(run.platform_key)
    if base is None:
        return []
    base_by_name = {m.name: m for m in base.metrics}
    out = []
    for m in run.metrics:
        b = base_by_name.get(m.name)
        if b is None or b.value <= 0:
            continue
        ratio = m.value / b.value
        # all persisted metrics are time-like (ms): bigger = worse
        out.append(
            Comparison(
                metric=m.name,
                baseline=b.value,
                current=m.value,
                ratio=ratio,
                regressed=ratio > 1.0 + threshold,
            )
        )
    return out


def has_regressions(comparisons: list[Comparison]) -> bool:
    return any(c.regressed for c in comparisons)
