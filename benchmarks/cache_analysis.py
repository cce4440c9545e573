"""Cold vs warm cache analysis (analog of reference `bench_cache.py:27-170`).

Measures the cost structure the two-tier table caches hide: cold = first call
(host f64 table build + device transfer + XLA compile), warm = steady state.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from mlx_audio_primitives_tpu.utils.cache import cache_stats, clear_all_caches

from .schemas import BenchmarkResult
from .utils import time_function


def _cold_warm(fn) -> tuple[float, float]:
    clear_all_caches()
    jax.clear_caches()
    t0 = time.perf_counter()
    jax.block_until_ready(fn())
    cold = time.perf_counter() - t0
    warm = time_function(fn, warmup=2, runs=10)
    return cold, warm


def run_cache_analysis() -> list[BenchmarkResult]:
    from mlx_audio_primitives_tpu import get_window, mel_filterbank, melspectrogram

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal(22050).astype(np.float32))

    out = []
    for name, fn in [
        ("get_window hann-2048", lambda: get_window("hann", 2048)),
        ("mel_filterbank 128", lambda: mel_filterbank(22050, 2048, n_mels=128)),
        ("melspectrogram 1x22050", lambda: melspectrogram(y, n_mels=128)),
    ]:
        cold, warm = _cold_warm(fn)
        out.append(
            BenchmarkResult(
                name=f"{name} cold-vs-warm",
                time_ms=warm * 1e3,
                baseline_name="cold (build+compile)",
                baseline_time_ms=cold * 1e3,
                extra={"cache_stats": cache_stats()},
            )
        )
    return out
