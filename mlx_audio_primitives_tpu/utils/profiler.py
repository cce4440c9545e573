"""Lightweight profiling subsystem.

TPU-native re-design of the reference profiler
(reference: `mlx_audio_primitives/_profiler.py:48-428`): a global state with
enable/disable/clear, a ``profile_section`` context manager that synchronizes
the device (``block_until_ready`` instead of ``mx.eval``) for honest timings,
a ``@profile`` decorator, explicit hooks for sync points / host<->device
transfers / cache accesses, and text/JSON report generation.

Zero overhead when disabled: every hook checks one boolean first
(reference: `_profiler.py:227-229`).

For deep kernel-level traces use ``jax.profiler.trace`` directly; this module
covers the always-on lightweight layer the library itself instruments.
"""

from __future__ import annotations

import contextlib
import functools
import json
import time
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Any

import jax


@dataclass
class ProfilerState:
    enabled: bool = False
    timings: dict[str, list[float]] = field(default_factory=lambda: defaultdict(list))
    sync_points: list[str] = field(default_factory=list)
    transfers: list[tuple[str, str, int]] = field(default_factory=list)
    cache_accesses: dict[str, dict[str, int]] = field(
        default_factory=lambda: defaultdict(lambda: {"hits": 0, "misses": 0})
    )


_STATE = ProfilerState()


def enable_profiling() -> None:
    _STATE.enabled = True


def disable_profiling() -> None:
    _STATE.enabled = False


def clear_profiling() -> None:
    _STATE.timings = defaultdict(list)
    _STATE.sync_points = []
    _STATE.transfers = []
    _STATE.cache_accesses = defaultdict(lambda: {"hits": 0, "misses": 0})


def is_profiling() -> bool:
    return _STATE.enabled


def _sync() -> None:
    """Block until all pending device work completes (honest GPU/TPU timing)."""
    try:
        for d in jax.live_arrays():
            d.block_until_ready()
    except Exception:
        pass


@contextlib.contextmanager
def profile_section(name: str):
    """Time a region with device synchronization before and after.

    Analog of the reference's ``profile_section`` which brackets regions with
    ``mx.eval`` (reference: `_profiler.py:112-146`).
    """
    if not _STATE.enabled:
        yield
        return
    _sync()
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _sync()
        _STATE.timings[name].append(time.perf_counter() - t0)


def profile(fn=None, *, name: str | None = None):
    """Decorator: time a function and block on any returned jax arrays."""

    def deco(f):
        label = name or f.__qualname__

        @functools.wraps(f)
        def wrapper(*args, **kwargs):
            if not _STATE.enabled:
                return f(*args, **kwargs)
            _sync()
            t0 = time.perf_counter()
            out = f(*args, **kwargs)
            jax.block_until_ready(out)
            _STATE.timings[label].append(time.perf_counter() - t0)
            return out

        return wrapper

    return deco(fn) if fn is not None else deco


def log_sync_point(context: str) -> None:
    if _STATE.enabled:
        _STATE.sync_points.append(context)


def log_transfer(direction: str, context: str, num_bytes: int) -> None:
    """Record a host<->device transfer (direction: 'h2d' or 'd2h')."""
    if _STATE.enabled:
        _STATE.transfers.append((direction, context, int(num_bytes)))


def log_cache_access(name: str, hit: bool) -> None:
    if _STATE.enabled:
        entry = _STATE.cache_accesses[name]
        entry["hits" if hit else "misses"] += 1


def tracked_to_device(x, context: str = "to_device"):
    """``jax.device_put`` that logs the host->device transfer when profiling.

    Analog of the reference's ``tracked_mx_array`` converter
    (`_profiler.py:263-303`).
    """
    arr = jax.device_put(x)
    if _STATE.enabled and hasattr(arr, "nbytes"):
        log_transfer("h2d", context, arr.nbytes)
    return arr


def tracked_to_host(x, context: str = "to_host"):
    """Device->host conversion (``np.asarray``) that logs the transfer.

    Analog of the reference's ``tracked_np_array`` (`_profiler.py:263-303`).
    """
    import numpy as np

    out = np.asarray(x)
    if _STATE.enabled:
        log_transfer("d2h", context, out.nbytes)
    return out


def start_device_trace(log_dir: str) -> None:
    """Start a full jax.profiler trace (TensorBoard format) alongside the
    lightweight section timers."""
    jax.profiler.start_trace(log_dir)


def stop_device_trace() -> None:
    jax.profiler.stop_trace()


def get_profiling_data() -> dict[str, Any]:
    return {
        "timings": {k: list(v) for k, v in _STATE.timings.items()},
        "sync_points": list(_STATE.sync_points),
        "transfers": [
            {"direction": d, "context": c, "bytes": b} for d, c, b in _STATE.transfers
        ],
        "cache_accesses": {k: dict(v) for k, v in _STATE.cache_accesses.items()},
    }


def generate_text_report() -> str:
    """Aggregate timings / syncs / transfer MB / cache hit-rates as text."""
    lines = ["=== mlx-audio-primitives-tpu profile ==="]
    if _STATE.timings:
        lines.append("\n-- section timings --")
        for name, ts in sorted(_STATE.timings.items()):
            total = sum(ts)
            lines.append(
                f"{name}: calls={len(ts)} total={total * 1e3:.3f}ms "
                f"mean={total / len(ts) * 1e3:.3f}ms"
            )
    if _STATE.transfers:
        lines.append("\n-- host<->device transfers --")
        by_ctx: dict[tuple[str, str], int] = defaultdict(int)
        for d, c, b in _STATE.transfers:
            by_ctx[(d, c)] += b
        for (d, c), b in sorted(by_ctx.items()):
            lines.append(f"{d} [{c}]: {b / 1e6:.3f} MB")
    if _STATE.sync_points:
        lines.append(f"\n-- sync points: {len(_STATE.sync_points)} --")
    if _STATE.cache_accesses:
        lines.append("\n-- cache hit rates --")
        for name, e in sorted(_STATE.cache_accesses.items()):
            n = e["hits"] + e["misses"]
            rate = e["hits"] / n if n else 0.0
            lines.append(f"{name}: {e['hits']}/{n} ({rate:.1%})")
    return "\n".join(lines)


def export_json(path: str) -> None:
    with open(path, "w") as f:
        json.dump(get_profiling_data(), f, indent=2)
