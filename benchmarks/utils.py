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


def rand_signal(n: int, batch: int | None = None, seed: int = 0) -> jax.Array:
    """Seeded random float32 test signal on device: ``(n,)`` when batch is
    None or 1, else ``(batch, n)`` (shared by every benchmark suite)."""
    rng = np.random.default_rng(seed)
    shape = (n,) if batch in (None, 1) else (batch, n)
    return jax.device_put(jnp.asarray(rng.standard_normal(shape).astype(np.float32)))


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
    deadline: float | None = None,
) -> float:
    """Honest seconds-per-call of a jax op on a remote/async TPU attachment.

    ``deadline`` (absolute ``time.time()`` value) bounds the slow paths: the
    8x-longer k_xl escalation loop compiles a THIRD scan executable, which on
    a 1-CPU host can cost minutes — past the deadline the ordinary slope is
    returned as-is instead (round-2 postmortem: compiles, not math, are the
    bench budget).

    Four measurement hazards, all hit in practice, all handled here:

    1. per-call RPC latency floor (tens of ms on tunneled TPUs) — amortized
       by chaining iterations inside ONE executable via ``lax.scan``;
    2. XLA dead-code elimination — the output is consumed by a *nonlinear*
       full reduction (a scalar slice gets slice-propagated away; a linear
       sum factors through matmuls as sum(A@B)=rowsum(A)·colsum(B));
    3. XLA loop-invariant code motion — the scan carry is *data-dependent*
       (a 0.0 carry constant-folds and the body hoists out of the loop);
    4. ``block_until_ready`` that does not actually block (async PJRT
       proxies) — synchronization is a real scalar device->host transfer,
       and the per-op time is the SLOPE between two different K values,
       which cancels the transfer floor exactly.
    """
    k_lo = max(2, k // 5)
    k_hi = k_lo + k

    def make_loop(length):
        @jax.jit
        def loop(xx):
            def body(carry, _):
                out = fn(xx * (1.0 + carry))
                total = sum(
                    jnp.sum(jnp.abs(leaf)).astype(jnp.float32)
                    for leaf in jax.tree.leaves(out)
                )
                return total * 1e-20, total

            return jax.lax.scan(
                body, jnp.zeros((), jnp.float32), None, length=length
            )[1][-1]

        return loop

    lo, hi = make_loop(k_lo), make_loop(k_hi)
    float(lo(x))
    float(hi(x))
    t_lo, t_hi = [], []
    for _ in range(runs):
        t0 = time.perf_counter()
        float(lo(x))
        t_lo.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(hi(x))
        t_hi.append(time.perf_counter() - t0)
    slope = (float(np.median(t_hi)) - float(np.median(t_lo))) / (k_hi - k_lo)
    past_deadline = deadline is not None and time.time() > deadline - 30.0
    if (slope <= 0 or slope < 1e-4) and not past_deadline:
        # Sub-0.1 ms slopes (or outright noise inversions) are dominated by
        # RPC-floor drift between runs: the tunnel's per-call floor wanders
        # by ~1 ms mid-session, which at k_hi - k_lo = 20 injects ~50 us of
        # slope noise — the same magnitude as the measurement. An 8x longer
        # loop shrinks the drift's contribution 8x; if even that inverts,
        # report the long loop's per-iteration time, which INCLUDES the
        # dispatch floor and is therefore a conservative upper bound.
        k_xl = 8 * k_hi
        xl = make_loop(k_xl)
        float(xl(x))
        t_xl = []
        for _ in range(runs):
            t0 = time.perf_counter()
            float(xl(x))
            t_xl.append(time.perf_counter() - t0)
        slope_xl = (float(np.median(t_xl)) - float(np.median(t_lo))) / (k_xl - k_lo)
        if slope_xl > 0:
            slope = slope_xl
        elif slope <= 0:
            slope = float(np.median(t_xl)) / k_xl  # upper bound
    elif slope <= 0:
        # Deadline passed AND the short-loop slope inverted: report the long
        # loop's per-iteration time (includes dispatch floor, upper bound).
        slope = float(np.median(t_hi)) / k_hi
    return slope


def compute_accuracy(ours, reference) -> AccuracyStats:
    """Max/mean abs error + Pearson correlation (reference `utils.py:66-89`).

    A size mismatch (e.g. an off-by-one frame count vs the oracle) is
    surfaced as max_error=inf rather than silently truncating; a zero-variance
    input (broken kernel returning a constant) reports correlation 0.0
    unless both arrays are equal constants.
    """
    a = np.asarray(ours, dtype=np.float64).ravel()
    b = np.asarray(reference, dtype=np.float64).ravel()
    if a.size != b.size:
        return AccuracyStats(
            max_error=float("inf"), mean_error=float("inf"), correlation=0.0
        )
    n = a.size
    err = np.abs(a - b)
    denom = float(np.std(a) * np.std(b))
    if denom > 0:
        corr = float(np.corrcoef(a, b)[0, 1])
    else:
        corr = 1.0 if n and np.array_equal(a, b) else 0.0
    return AccuracyStats(
        max_error=float(err.max()) if n else 0.0,
        mean_error=float(err.mean()) if n else 0.0,
        correlation=corr,
    )
