"""Scaling sweeps over signal length / batch size / n_mels.

Analog of reference `benchmarks/bench_scaling.py:26-155` (lengths up to
176400, batches up to 32 — extended here since a TPU chip is happy far
beyond that).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .schemas import BenchmarkResult
from .utils import time_jax_amortized

LENGTHS = [8000, 22050, 44100, 88200, 176400, 705600]
BATCHES = [1, 8, 32, 64, 256]
N_MELS = [40, 80, 128, 256]


def scaling_lengths() -> list[BenchmarkResult]:
    from mlx_audio_primitives_tpu import stft

    rng = np.random.default_rng(0)
    out = []
    for n in LENGTHS:
        y = jax.device_put(jnp.asarray(rng.standard_normal(n).astype(np.float32)))
        t = time_jax_amortized(lambda x: stft(x, n_fft=2048, hop_length=512), y)
        out.append(
            BenchmarkResult(
                name=f"stft length={n}", time_ms=t * 1e3,
                extra={"samples_per_sec": n / t},
            )
        )
    return out


def scaling_batches() -> list[BenchmarkResult]:
    from mlx_audio_primitives_tpu import melspectrogram

    rng = np.random.default_rng(0)
    out = []
    for b in BATCHES:
        y = jax.device_put(
            jnp.asarray(rng.standard_normal((b, 22050)).astype(np.float32))
        )
        t = time_jax_amortized(lambda x: melspectrogram(x, n_mels=128), y)
        frames = b * (1 + 22050 // 512)
        out.append(
            BenchmarkResult(
                name=f"melspectrogram batch={b}", time_ms=t * 1e3,
                extra={"frames_per_sec": frames / t},
            )
        )
    return out


def scaling_mels() -> list[BenchmarkResult]:
    from mlx_audio_primitives_tpu import melspectrogram

    rng = np.random.default_rng(0)
    y = jax.device_put(
        jnp.asarray(rng.standard_normal((32, 22050)).astype(np.float32))
    )
    out = []
    for m in N_MELS:
        t = time_jax_amortized(lambda x, mm=m: melspectrogram(x, n_mels=mm), y)
        out.append(BenchmarkResult(name=f"melspectrogram n_mels={m}", time_ms=t * 1e3))
    return out


def run_scaling() -> list[BenchmarkResult]:
    return scaling_lengths() + scaling_batches() + scaling_mels()
