"""Forced-fallback comparison suite (analog of reference
`benchmarks/bench_cpp_extension.py:16-106`).

The reference monkeypatches `_force_python_*` to time every op's C++ fast path
against its pure-Python fallback. The TPU analog: every op with a Pallas
kernel or multiple FFT dispatch branches is timed across ALL of its paths via
the public ``use_pallas=`` / ``fft_mode=`` kwargs (the in-process equivalents
of the `MLX_AUDIO_TPU_DISABLE_PALLAS` kill switch, which acts at import time).
Accuracy of each forced path vs the auto default is reported alongside.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .schemas import BenchmarkResult
from .utils import rand_signal, compute_accuracy, time_jax_amortized

SR = 22050


def _sig(batch: int | None = None, n: int = SR, seed: int = 0) -> jax.Array:
    return rand_signal(n, batch, seed)


def _complex_planes(S: jax.Array) -> np.ndarray:
    """Stacked (real, imag) float32 planes of a complex device array.

    complex64 device->host transfer is unimplemented on some remote TPU
    attachments, and the failed transfer kills the whole process's device
    session (every subsequent suite then fails identically). Transferring
    the planes separately keeps the comparison phase-sensitive — a
    sign/conjugate twiddle error that preserves |S| still shows up.
    """
    return np.stack([np.asarray(jnp.real(S)), np.asarray(jnp.imag(S))])


def fallback_mel() -> list[BenchmarkResult]:
    """melspectrogram: fused Pallas radix kernel vs each XLA fft_mode."""
    from mlx_audio_primitives_tpu import melspectrogram

    y = _sig(batch=64)
    kw = dict(sr=SR, n_fft=2048, hop_length=512, n_mels=128)
    ref = np.asarray(melspectrogram(y, **kw))
    t_auto = time_jax_amortized(lambda x: melspectrogram(x, **kw), y)
    out = [
        BenchmarkResult(name="mel batch=64 auto (pallas on TPU)",
                        time_ms=t_auto * 1e3)
    ]
    for mode in ("matmul", "sixstep", "fft"):
        fn = lambda x, m=mode: melspectrogram(x, use_pallas=False, fft_mode=m, **kw)
        t = time_jax_amortized(fn, y)
        out.append(
            BenchmarkResult(
                name=f"mel batch=64 forced fft_mode={mode}",
                time_ms=t * 1e3,
                baseline_name="auto",
                baseline_time_ms=t_auto * 1e3,
                accuracy=compute_accuracy(np.asarray(fn(y)), ref),
            )
        )
    return out


def fallback_stft() -> list[BenchmarkResult]:
    """stft: every fft_mode dispatch branch, incl. the Bluestein path
    (odd n_fft) and the dense-DFT path (small n_fft)."""
    from mlx_audio_primitives_tpu import stft

    out = []
    y = _sig(batch=8)
    for n_fft, modes in [
        (512, ("auto", "matmul", "fft")),
        (2048, ("auto", "sixstep", "fft")),
    ]:
        ref = _complex_planes(stft(y, n_fft=n_fft, hop_length=n_fft // 4))
        t_auto = None
        for mode in modes:
            fn = lambda x, m=mode, n=n_fft: stft(x, n_fft=n, hop_length=n // 4,
                                                 fft_mode=m)
            t = time_jax_amortized(fn, y)
            if mode == "auto":
                t_auto = t
                out.append(
                    BenchmarkResult(name=f"stft n_fft={n_fft} auto",
                                    time_ms=t * 1e3)
                )
            else:
                out.append(
                    BenchmarkResult(
                        name=f"stft n_fft={n_fft} forced fft_mode={mode}",
                        time_ms=t * 1e3,
                        baseline_name="auto",
                        baseline_time_ms=t_auto * 1e3,
                        accuracy=compute_accuracy(_complex_planes(fn(y)), ref),
                    )
                )
    # odd n_fft exercises the Bluestein chirp-Z branch regardless of mode
    t = time_jax_amortized(lambda x: stft(x, n_fft=1000, hop_length=250), y)
    out.append(BenchmarkResult(name="stft n_fft=1000 (bluestein)", time_ms=t * 1e3))
    # fused radix kernel vs the XLA FFT it replaced as TPU auto default
    t_p = time_jax_amortized(
        lambda x: stft(x, n_fft=2048, hop_length=512, use_pallas=True), y
    )
    t_x = time_jax_amortized(
        lambda x: stft(x, n_fft=2048, hop_length=512, use_pallas=False), y
    )
    out.append(
        BenchmarkResult(
            name="stft n_fft=2048 pallas-vs-xla",
            time_ms=t_p * 1e3,
            baseline_name="xla fft",
            baseline_time_ms=t_x * 1e3,
        )
    )
    return out


def fallback_istft() -> list[BenchmarkResult]:
    """istft: Pallas overlap-add vs XLA chunk overlap-add across hops
    (aligned 128-multiples AND the arbitrary-hop lane-rotation path)."""
    from mlx_audio_primitives_tpu import istft, stft

    out = []
    y = _sig()
    for n_fft, hop in [(2048, 512), (1024, 256), (512, 128), (2048, 441),
                       (1024, 160)]:
        S = jax.device_put(stft(y, n_fft=n_fft, hop_length=hop))
        ref = np.asarray(istft(S, hop_length=hop, use_pallas=False))
        t_x = time_jax_amortized(
            lambda s, h=hop: istft(s, hop_length=h, use_pallas=False), S
        )
        t_p = time_jax_amortized(
            lambda s, h=hop: istft(s, hop_length=h, use_pallas=True), S
        )
        out.append(
            BenchmarkResult(
                name=f"istft n_fft={n_fft} hop={hop} pallas-vs-xla",
                time_ms=t_p * 1e3,
                baseline_name="xla chunk OLA",
                baseline_time_ms=t_x * 1e3,
                accuracy=compute_accuracy(
                    np.asarray(istft(S, hop_length=hop, use_pallas=True)), ref
                ),
            )
        )
    return out


def fallback_frame_paths() -> list[BenchmarkResult]:
    """framing: chunk-algebra slices vs the gather fallback (tiny hop)."""
    from mlx_audio_primitives_tpu.ops._frames import (
        _MAX_UNROLLED_CHUNKS,
        cdiv,
        frame_signal_batched,
    )

    y = _sig(batch=4)
    out = []
    for frame_len, hop in [(2048, 512), (2048, 7)]:
        t = time_jax_amortized(
            lambda x, f=frame_len, h=hop: frame_signal_batched(x, f, h), y
        )
        path = (
            "chunk-slices"
            if cdiv(frame_len, hop) <= _MAX_UNROLLED_CHUNKS
            else "gather"
        )
        out.append(
            BenchmarkResult(
                name=f"frame_signal frame={frame_len} hop={hop} ({path})",
                time_ms=t * 1e3,
            )
        )
    return out


def run_fallback() -> list[BenchmarkResult]:
    import sys

    out: list[BenchmarkResult] = []
    for fn in (fallback_mel, fallback_stft, fallback_istft,
               fallback_frame_paths):
        # degrade per sub-suite: the tunneled TPU attachment occasionally
        # drops a session mid-run (transient UNIMPLEMENTED backend errors);
        # one flake should not zero out the other sub-suites' metrics
        try:
            out.extend(fn())
        except Exception as e:
            print(f"fallback sub-suite {fn.__name__} failed: "
                  f"{type(e).__name__}: {e}", file=sys.stderr)
    return out
