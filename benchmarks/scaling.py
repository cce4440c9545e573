"""Scaling sweeps (analog of reference `benchmarks/bench_scaling.py`).

The reference sweeps lengths [8000..176400] x batches [1..32] x n_mels
(`bench_scaling.py:26-27`); this keeps that grid and extends the upper ends
(a TPU chip is happy far beyond an M-series GPU). Four sweeps:

* ``scaling_grid``     — melspectrogram over the full length x batch grid
* ``scaling_lengths``  — stft + istft over lengths at batch 1
* ``scaling_mels``     — melspectrogram over n_mels at the headline config
* ``scaling_iters``    — griffinlim over n_iter (loop-carried op scaling)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .schemas import BenchmarkResult
from .utils import rand_signal, time_jax_amortized

LENGTHS = [8000, 22050, 44100, 88200, 176400, 705600]
BATCHES = [1, 8, 32, 64]
GRID_LENGTHS = [8000, 22050, 44100, 176400]
GRID_BATCHES = [1, 8, 32]
N_MELS = [40, 80, 128, 256]
N_ITERS = [8, 32, 64]


def _signal(batch: int, n: int) -> jax.Array:
    return rand_signal(n, batch)


def scaling_production() -> list[BenchmarkResult]:
    """One at-scale point (batch-256 x 4 s): sub-ms configs are dispatch-noise
    dominated through the tunneled attachment, so the regression gate needs a
    row big enough for a real kernel regression to rise above timing noise."""
    from mlx_audio_primitives_tpu import istft, melspectrogram, stft

    n, b = 88200, 256
    y = _signal(b, n)
    out = []
    t = time_jax_amortized(
        lambda x: melspectrogram(x, n_fft=2048, hop_length=512, n_mels=128),
        y, k=3,
    )
    out.append(
        BenchmarkResult(
            name=f"melspectrogram len={n} batch={b} (production)",
            time_ms=t * 1e3,
            extra={"frames_per_sec": b * (1 + n // 512) / t},
        )
    )
    t = time_jax_amortized(lambda x: stft(x, n_fft=2048, hop_length=512), y, k=3)
    out.append(
        BenchmarkResult(
            name=f"stft len={n} batch={b} (production)", time_ms=t * 1e3
        )
    )
    S = stft(y, n_fft=2048, hop_length=512)
    t = time_jax_amortized(lambda s: istft(s, hop_length=512), S, k=3)
    out.append(
        BenchmarkResult(
            name=f"istft len={n} batch={b} (production)", time_ms=t * 1e3
        )
    )
    from mlx_audio_primitives_tpu import pitch_detect_acf

    b2 = 64  # pitch at full 256 would dominate the suite's runtime
    y2 = _signal(b2, n)
    t = time_jax_amortized(lambda x: pitch_detect_acf(x, sr=22050)[0], y2, k=3)
    out.append(
        BenchmarkResult(
            name=f"pitch_detect_acf len={n} batch={b2} (production)",
            time_ms=t * 1e3,
        )
    )
    return out


def scaling_grid() -> list[BenchmarkResult]:
    """melspectrogram over the reference's length x batch grid."""
    from mlx_audio_primitives_tpu import melspectrogram

    out = []
    for n in GRID_LENGTHS:
        for b in GRID_BATCHES:
            y = _signal(b, n)
            t = time_jax_amortized(
                lambda x: melspectrogram(x, n_fft=2048, hop_length=512,
                                         n_mels=128), y
            )
            frames = b * (1 + n // 512)
            out.append(
                BenchmarkResult(
                    name=f"melspectrogram len={n} batch={b}",
                    time_ms=t * 1e3,
                    extra={"frames_per_sec": frames / t},
                )
            )
    return out


def scaling_lengths() -> list[BenchmarkResult]:
    from mlx_audio_primitives_tpu import istft, stft

    out = []
    for n in LENGTHS:
        y = _signal(1, n)
        t = time_jax_amortized(lambda x: stft(x, n_fft=2048, hop_length=512), y)
        out.append(
            BenchmarkResult(
                name=f"stft length={n}", time_ms=t * 1e3,
                extra={"samples_per_sec": n / t},
            )
        )
        S = stft(y, n_fft=2048, hop_length=512)
        t = time_jax_amortized(lambda s: istft(s, hop_length=512), S)
        out.append(
            BenchmarkResult(
                name=f"istft length={n}", time_ms=t * 1e3,
                extra={"samples_per_sec": n / t},
            )
        )
    return out


def scaling_batches() -> list[BenchmarkResult]:
    from mlx_audio_primitives_tpu import melspectrogram

    out = []
    for b in BATCHES:
        y = _signal(b, 22050)
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

    y = _signal(32, 22050)
    out = []
    for m in N_MELS:
        t = time_jax_amortized(lambda x, mm=m: melspectrogram(x, n_mels=mm), y)
        out.append(BenchmarkResult(name=f"melspectrogram n_mels={m}", time_ms=t * 1e3))
    return out


def scaling_iters() -> list[BenchmarkResult]:
    """griffinlim n_iter scaling — the loop-carried op; should be ~linear in
    n_iter since the whole loop is one fori_loop jit."""
    from mlx_audio_primitives_tpu import griffinlim, stft

    y = _signal(1, 22050)
    S = jnp.abs(stft(y, n_fft=1024, hop_length=256))
    out = []
    for it in N_ITERS:
        t = time_jax_amortized(
            lambda s, n=it: griffinlim(s, n_iter=n, hop_length=256), S, k=5
        )
        out.append(
            BenchmarkResult(
                name=f"griffinlim n_iter={it}", time_ms=t * 1e3,
                extra={"ms_per_iter": t * 1e3 / it},
            )
        )
    return out


def run_scaling() -> list[BenchmarkResult]:
    return (
        scaling_grid()
        + scaling_lengths()
        + scaling_batches()
        + scaling_mels()
        + scaling_iters()
        + scaling_production()
    )
