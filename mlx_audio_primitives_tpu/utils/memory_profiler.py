"""Device-memory profiling.

TPU re-design of the reference's `_memory_profiler.py:55-326`: the reference
wraps `mx.metal.get_active_memory/get_peak_memory`; here we read
`device.memory_stats()` (PJRT) with graceful fallbacks, provide a
``track_memory`` context manager and ``profile_memory(fn)`` returning a
``MemoryProfile`` with the same ``efficiency = output_bytes / peak_delta``
metric, plus analytical per-stage estimates for the stft/mel/mfcc pipelines.
"""

from __future__ import annotations

import contextlib
from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import numpy as np


def _stats() -> dict[str, int]:
    try:
        s = jax.devices()[0].memory_stats()
        return dict(s) if s else {}
    except Exception:
        return {}


def get_active_memory() -> int:
    """Bytes currently allocated on device 0 (0 if unavailable)."""
    return int(_stats().get("bytes_in_use", 0))


def get_peak_memory() -> int:
    """Peak bytes allocated on device 0 (0 if unavailable)."""
    s = _stats()
    return int(s.get("peak_bytes_in_use", s.get("bytes_in_use", 0)))


def memory_available() -> bool:
    return bool(_stats())


@dataclass
class MemoryProfile:
    active_before: int
    active_after: int
    peak: int
    output_bytes: int = 0
    extra: dict[str, Any] = field(default_factory=dict)

    @property
    def delta_mb(self) -> float:
        return (self.active_after - self.active_before) / 1e6

    @property
    def peak_mb(self) -> float:
        return self.peak / 1e6

    @property
    def efficiency(self) -> float:
        """output bytes / peak-above-baseline (1.0 = no transient overhead)."""
        denom = max(self.peak - self.active_before, 1)
        return self.output_bytes / denom


@contextlib.contextmanager
def track_memory():
    """Context manager yielding a MemoryProfile filled on exit.

    PJRT limitation (unlike the reference's ``mx.metal.reset_peak_memory``):
    ``peak_bytes_in_use`` is process-lifetime and cannot be reset, so a
    region's true peak is visible only when it EXCEEDS every earlier peak.
    The reported ``peak`` is therefore clamped to at least the region's
    entry peak — when a prior workload peaked higher, ``peak_mb`` reflects
    that earlier high-water mark, and ``efficiency`` is a lower bound.
    Profile representative workloads in a fresh process for exact numbers.
    """
    prof = MemoryProfile(active_before=get_active_memory(), active_after=0, peak=0)
    peak_before = get_peak_memory()
    try:
        yield prof
    finally:
        prof.active_after = get_active_memory()
        prof.peak = get_peak_memory()
        prof.extra["peak_is_process_lifetime"] = prof.peak <= peak_before


def _nbytes(tree) -> int:
    total = 0
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "nbytes"):
            total += int(leaf.nbytes)
    return total


def profile_memory(fn: Callable, *args, **kwargs) -> tuple[Any, MemoryProfile]:
    """Run ``fn`` and measure device memory around it."""
    with track_memory() as prof:
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    prof.output_bytes = _nbytes(out)
    return out, prof


def estimate_operation_memory(
    op: str,
    signal_length: int,
    batch: int = 1,
    n_fft: int = 2048,
    hop_length: int = 512,
    n_mels: int = 128,
    n_mfcc: int = 20,
) -> dict[str, float]:
    """Analytical per-stage MB estimates (reference `_memory_profiler.py:218-326`).

    Useful for predicting whether a workload fits HBM before running it.
    """
    f32 = 4
    n_frames = 1 + signal_length // hop_length  # center=True
    n_bins = n_fft // 2 + 1
    est: dict[str, float] = {
        "input_mb": batch * signal_length * f32 / 1e6,
        "frames_mb": batch * n_frames * n_fft * f32 / 1e6,
        "spectrum_mb": batch * n_frames * n_bins * 2 * f32 / 1e6,
    }
    if op in ("mel", "mfcc"):
        est["mel_mb"] = batch * n_mels * n_frames * f32 / 1e6
    if op == "mfcc":
        est["mfcc_mb"] = batch * n_mfcc * n_frames * f32 / 1e6
    if op == "istft":
        est["output_mb"] = batch * signal_length * f32 / 1e6
    est["total_mb"] = float(np.sum(list(est.values())))
    return est
