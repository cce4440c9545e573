"""Cold vs warm cache analysis (analog of reference `bench_cache.py:27-170`).

Two levels, mirroring the reference's per-table + end-to-end structure:

* **per-table**: every registered :class:`TableCache` is exercised with a
  canonical argument tuple — cold = host f64 build + device transfer after
  ``clear()``, warm = steady-state cached fetch. This is the direct analog of
  the reference's per-cache suite over `_WindowCache` / filterbank / DCT
  caches (`bench_cache.py:171-420`).
* **end-to-end**: whole public ops cold (table builds + XLA compile) vs warm,
  the user-visible "first call" cost (`bench_cache.py:27-170`).
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from mlx_audio_primitives_tpu.utils.cache import (
    _CACHE_REGISTRY,
    cache_stats,
    clear_all_caches,
)

from .schemas import BenchmarkResult
from .utils import time_function

# canonical argument tuples per registered table cache: (label, args)
_TABLE_CASES: dict[str, list[tuple[str, tuple]]] = {
    "window": [
        ("hann-2048-periodic", ("hann", 2048, True, None)),
        ("blackman-4096-periodic", ("blackman", 4096, True, None)),
        ("hamming-1024-symmetric", ("hamming", 1024, False, None)),
        ("kaiser8.6-2048", ("kaiser", 2048, True, 8.6)),
    ],
    "mel_filterbank": [
        ("slaney-128", (22050, 2048, 128, 0.0, 11025.0, False, "slaney")),
        ("htk-40", (22050, 2048, 40, 0.0, 11025.0, True, None)),
    ],
    "dct_basis": [("20x128-ortho", (20, 128, "ortho"))],
    "savgol_fir": [("width9-poly1", (9, 1, 1, 1.0))],
    "bark_filterbank": [
        ("zwicker-24", (22050, 2048, 24, 0.0, 11025.0, "zwicker", "slaney"))
    ],
    "linear_filterbank": [("64", (22050, 2048, 64, 0.0, 11025.0, "slaney"))],
    "istft_envelope": [
        ("hann-2048x44", (("hann", None), 2048, 2048, 44, 512, 24064))
    ],
    "polyphase_kernel": [("160/441", (160, 441))],
    "bluestein": [("n=1000", (1000,))],
    "acf_lag_basis": [("4096-lags11..442", (4096, 11, 442))],
    "acf_window": [("2048in4096", (2048, 4096))],
    "mel_radix_twiddle": [("2048/512", (2048, 512))],
    "mel_radix_basis": [("hop512", (512,))],
    "istft_inv_base": [("2048", (2048,))],
    "istft_inv_base_rev": [("2048", (2048,))],
    "istft_inv_stage2": [("hop512", (512,))],
    "istft_inv_twiddle": [("2048/512", (2048, 512))],
    "dft_basis_fwd": [("1024", (1024,))],
    "dft_basis_inv": [("1024", (1024,))],
    "chroma_filterbank": [
        ("12c-2048", (22050, 2048, 12, 0.0, 5.0, 2.0, 2.0, True))
    ],
    "cqt_basis": [
        ("84x12-c1", (22050, 16384, 84, 32.70319566257483, 12, 1.0))
    ],
    "cq_to_chroma": [("84to12", (84, 12, 12, 32.70319566257483, True))],
    "tonnetz_basis": [("12", (12,))],
    "poly_basis": [("order2-2048", (22050, 2048, 2))],
    "vqt_basis": [
        ("84x12-c1-erb", (22050, 2048, 84, 32.70319566257483, 12, 1.0,
                          13.217791238133179))
    ],
}


def per_table_cold_warm() -> list[BenchmarkResult]:
    """Cold (build + transfer) vs warm (cached fetch) for every registered
    table cache; flags any registered cache with no canonical case so new
    caches cannot silently escape coverage."""
    # force-import every module that registers a lazy table cache so the
    # registry is complete before we iterate it
    import mlx_audio_primitives_tpu.kernels.bluestein  # noqa: F401
    import mlx_audio_primitives_tpu.kernels.dft  # noqa: F401
    import mlx_audio_primitives_tpu.kernels.istft_fused  # noqa: F401
    import mlx_audio_primitives_tpu.kernels.mel_fused  # noqa: F401
    import mlx_audio_primitives_tpu.ops.pitch  # noqa: F401
    import mlx_audio_primitives_tpu.ops.resample  # noqa: F401

    out = []
    caches = {c.name: c for c in list(_CACHE_REGISTRY)}
    for name, cache in sorted(caches.items()):
        if name.startswith("test_"):
            # ad-hoc caches registered by unit tests, not library tables
            continue
        cases = _TABLE_CASES.get(name)
        if not cases:
            out.append(
                BenchmarkResult(
                    name=f"table:{name} (NO CANONICAL CASE)", time_ms=-1.0
                )
            )
            continue
        for label, args in cases:
            try:
                cache.clear()
                t0 = time.perf_counter()
                jax.block_until_ready(cache(*args))
                cold = time.perf_counter() - t0
                warm = time_function(lambda: cache(*args), warmup=2, runs=20)
            except Exception as e:
                # a stale canonical arg tuple must not abort every other
                # table's analysis
                out.append(BenchmarkResult(
                    name=f"table:{name}[{label}] FAILED "
                         f"({type(e).__name__})", time_ms=-1.0))
                continue
            out.append(
                BenchmarkResult(
                    name=f"table:{name} {label}",
                    time_ms=warm * 1e3,
                    baseline_name="cold (build+transfer)",
                    baseline_time_ms=cold * 1e3,
                    extra=dict(cache.stats),
                )
            )
    return out


def _cold_warm(fn) -> tuple[float, float]:
    clear_all_caches()
    jax.clear_caches()
    t0 = time.perf_counter()
    jax.block_until_ready(fn())
    cold = time.perf_counter() - t0
    warm = time_function(fn, warmup=2, runs=10)
    return cold, warm


def end_to_end_cold_warm() -> list[BenchmarkResult]:
    from mlx_audio_primitives_tpu import (
        get_window,
        istft,
        mel_filterbank,
        melspectrogram,
        mfcc,
        stft,
    )

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal(22050).astype(np.float32))
    S = stft(y, n_fft=2048, hop_length=512)

    out = []
    for name, fn in [
        ("get_window hann-2048", lambda: get_window("hann", 2048)),
        ("mel_filterbank 128", lambda: mel_filterbank(22050, 2048, n_mels=128)),
        ("stft 1x22050", lambda: stft(y, n_fft=2048, hop_length=512)),
        ("istft 1x22050", lambda: istft(S, hop_length=512)),
        ("melspectrogram 1x22050", lambda: melspectrogram(y, n_mels=128)),
        ("mfcc 1x22050", lambda: mfcc(y, n_mfcc=20)),
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


def run_cache_analysis() -> list[BenchmarkResult]:
    return per_table_cold_warm() + end_to_end_cold_warm()
