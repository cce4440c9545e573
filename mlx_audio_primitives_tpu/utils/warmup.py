"""Ahead-of-serving compilation warmup.

A TPU first-compile of a new (shape, params) combination costs tens of
seconds; every subsequent call hits jax's in-process executable cache. A
serving process therefore wants to pay all compiles at startup, before
traffic arrives. The reference library has no analog (``mx.compile`` caches
are also per-process but Metal compiles are milliseconds); on TPU this is a
production requirement, not a nicety.

Two tools:

* :func:`warmup` — run each requested op once per (batch, length) on tiny
  random data, forcing compilation of the exact executables the serving
  shapes will hit. Returns per-op wall seconds (compile-dominated on first
  run, ~0 on later runs — useful as a cache-hit smoke signal).
* :func:`enable_persistent_compilation_cache` — turn on jax's on-disk
  executable cache so compiles survive process restarts (one process pays,
  the fleet reuses).
"""

from __future__ import annotations

import time
from collections.abc import Iterable, Sequence

import numpy as np

_DEFAULT_OPS = ("stft", "istft", "melspectrogram", "mfcc")
# opt-in extras a serving config may add to ``ops``
_EXTRA_OPS = ("chroma_stft", "pcen")


def warmup(
    signal_lengths: Sequence[int] = (22050,),
    batch_sizes: Sequence[int] = (1,),
    *,
    sr: int = 22050,
    n_fft: int = 2048,
    hop_length: int | None = None,
    n_mels: int = 128,
    ops: Iterable[str] = _DEFAULT_OPS,
) -> dict[str, float]:
    """Compile every (op, batch, length) combination once.

    Returns ``{"<op> b=<B> len=<L>": seconds}`` — wall time including the
    compile on first call and near-zero afterwards. Unknown op names raise
    ValueError up front (a typo must not silently skip a warmup).
    """
    import jax

    from .. import chroma_stft, istft, melspectrogram, mfcc, pcen, stft

    if hop_length is None:
        hop_length = n_fft // 4
    ops = tuple(ops)
    known = set(_DEFAULT_OPS) | set(_EXTRA_OPS)
    unknown = [o for o in ops if o not in known]
    if unknown:
        raise ValueError(f"unknown warmup ops {unknown}; available: {sorted(known)}")

    rng = np.random.default_rng(0)
    times: dict[str, float] = {}
    for B in batch_sizes:
        for L in signal_lengths:
            y2d = rng.standard_normal((B, L)).astype(np.float32)
            # batch 1 warms BOTH layouts a server may feed: (1, L) and (L,)
            # — they compile to different executables
            variants = [y2d] if B > 1 else [y2d, y2d[0]]
            for op in ops:
                t0 = time.perf_counter()
                for y in variants:
                    if op == "stft":
                        jax.block_until_ready(
                            stft(y, n_fft=n_fft, hop_length=hop_length)
                        )
                    elif op == "istft":
                        spec = jax.block_until_ready(
                            stft(y, n_fft=n_fft, hop_length=hop_length)
                        )
                        jax.block_until_ready(
                            istft(spec, hop_length=hop_length, length=L)
                        )
                    elif op == "melspectrogram":
                        jax.block_until_ready(
                            melspectrogram(y, sr=sr, n_fft=n_fft,
                                           hop_length=hop_length,
                                           n_mels=n_mels)
                        )
                    elif op == "mfcc":
                        jax.block_until_ready(
                            mfcc(y, sr=sr, n_fft=n_fft, hop_length=hop_length,
                                 n_mels=n_mels)
                        )
                    elif op == "chroma_stft":
                        jax.block_until_ready(
                            chroma_stft(y, sr=sr, n_fft=n_fft,
                                        hop_length=hop_length)
                        )
                    elif op == "pcen":
                        jax.block_until_ready(
                            pcen(melspectrogram(
                                y, sr=sr, n_fft=n_fft,
                                hop_length=hop_length, n_mels=n_mels,
                            ), sr=sr, hop_length=hop_length)
                        )
                times[f"{op} b={B} len={L}"] = time.perf_counter() - t0
    return times


def enable_persistent_compilation_cache(cache_dir: str) -> None:
    """Persist compiled executables to ``cache_dir`` across processes.

    Thin wrapper over jax's compilation cache config. Both storage gates
    are zeroed: min entry size AND min compile time — jax's default skips
    executables that compile in under 1 s, which is precisely the small DSP
    executables this library produces. Safe to call more than once.
    """
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


__all__ = ["warmup", "enable_persistent_compilation_cache"]
