"""Timing and accuracy utilities.

Analog of reference `benchmarks/utils.py:30-89` (warmup + median-of-N with a
device sync), with one TPU-specific addition: ``time_function`` can amortize
over a ``lax.scan`` of K chained iterations inside one jit — per-call wall
timing through a remote TPU attachment has a latency floor that would
otherwise dominate sub-millisecond ops.
"""

from __future__ import annotations

import time
from collections.abc import Callable

import numpy as np

import jax
import jax.numpy as jnp

from .schemas import AccuracyStats


def time_function(
    fn: Callable[[], object],
    warmup: int = 3,
    runs: int = 10,
) -> float:
    """Median wall seconds of ``fn()`` with device sync each call."""
    for _ in range(warmup):
        jax.block_until_ready(fn())
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def time_jax_amortized(
    fn: Callable[[jax.Array], jax.Array],
    x: jax.Array,
    k: int = 20,
    runs: int = 5,
) -> float:
    """Seconds per call of ``fn`` measured as a K-step serialized scan.

    ``fn`` must map an array to an array; iterations are chained through a
    scalar carry so XLA cannot parallelize them away.
    """

    @jax.jit
    def loop(xx):
        def body(carry, _):
            out = fn(xx * (1.0 + carry))
            flat = jax.tree.leaves(out)[0].ravel()[0]
            zero = jnp.real(flat).astype(jnp.float32) * 0.0
            return zero, zero

        return jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=k)[1]

    loop(x).block_until_ready()
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        loop(x).block_until_ready()
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / k


def compute_accuracy(ours, reference) -> AccuracyStats:
    """Max/mean abs error + Pearson correlation (reference `utils.py:66-89`)."""
    a = np.asarray(ours, dtype=np.float64).ravel()
    b = np.asarray(reference, dtype=np.float64).ravel()
    n = min(a.size, b.size)
    a, b = a[:n], b[:n]
    err = np.abs(a - b)
    denom = float(np.std(a) * np.std(b))
    corr = float(np.corrcoef(a, b)[0, 1]) if denom > 0 else 1.0
    return AccuracyStats(
        max_error=float(err.max()) if n else 0.0,
        mean_error=float(err.mean()) if n else 0.0,
        correlation=corr,
    )
