"""Device-resident table caches.

The reference library uses a two-tier cache for every host-built table
(windows, mel/bark/linear filterbanks, DCT basis): an ``lru_cache`` over the
float64 NumPy builder, plus a dict of device arrays so cache hits never pay a
host->device transfer (reference: `mlx_audio_primitives/windows.py:125-135`,
`mel.py:97-100`, `ARCHITECTURE.md:325-377`).

The TPU-native version keeps exactly that structure:

* tier 1 — ``functools.lru_cache`` around a pure-NumPy float64 builder
  (bit-exact scipy/librosa table math happens on the host, once);
* tier 2 — a dict keyed by ``(builder args, jax backend)`` holding the
  ``jax.device_put`` float32 constant, so repeated calls return the same
  committed buffer. Passing the table *as an argument* into jitted compute
  functions (rather than closing over it) lets XLA cache one executable per
  shape while the table stays resident in HBM.

All caches register themselves so tooling can clear them (cold/warm cache
benchmarks, reference: `benchmarks/bench_cache.py:27-170`) and report hit
rates (reference profiler hook `_profiler.py:179-192`).
"""

from __future__ import annotations

import functools
import threading
from collections.abc import Callable
from typing import Any

import jax
import numpy as np

# Registry of all live TableCache instances, for clear_all_caches().
_CACHE_REGISTRY: list["TableCache"] = []
_REGISTRY_LOCK = threading.Lock()


class TableCache:
    """Two-tier (host lru / device dict) cache around a float64 table builder."""

    def __init__(
        self,
        name: str,
        builder: Callable[..., np.ndarray],
        maxsize: int = 128,
        dtype: Any = np.float32,
    ):
        self.name = name
        self.dtype = dtype
        self._host_builder = functools.lru_cache(maxsize=maxsize)(builder)
        self._device_cache: dict[tuple, jax.Array] = {}
        self._maxsize = maxsize
        self._order: list[tuple] = []
        # guards _device_cache/_order/counters: concurrent serving threads
        # would otherwise corrupt the LRU order (duplicate keys -> a later
        # eviction removes a still-hot entry) and lose counter updates
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0
        with _REGISTRY_LOCK:
            _CACHE_REGISTRY.append(self)

    def __call__(self, *args) -> jax.Array:
        key = (args, jax.default_backend())
        with self._lock:
            hit = self._device_cache.get(key)
            if hit is not None:
                self.hits += 1
                # true LRU: a hit refreshes recency (otherwise eviction is
                # FIFO and a constantly-hit table can be evicted by churn)
                try:
                    self._order.remove(key)
                except ValueError:
                    pass
                self._order.append(key)
        if hit is not None:
            self._note_profiler(True)
            return hit
        with self._lock:
            self.misses += 1
        self._note_profiler(False)
        host = self._host_builder(*args)
        # ensure_compile_time_eval keeps the device_put concrete even when a
        # table is first requested inside a jit trace — otherwise we would
        # cache a tracer and leak it into later traces.
        with jax.ensure_compile_time_eval():
            dev = jax.device_put(np.asarray(host).astype(self.dtype))
        if isinstance(dev, jax.core.Tracer):
            # some trace contexts (shard_map bodies) are NOT escaped by
            # ensure_compile_time_eval: the table comes back as a tracer of
            # the enclosing trace. It is still a correct constant for THIS
            # trace, but caching it would poison every later trace — return
            # it uncached (the first concrete call populates the cache).
            return dev
        with self._lock:
            if key not in self._device_cache:
                if len(self._device_cache) >= self._maxsize and self._order:
                    oldest = self._order.pop(0)
                    self._device_cache.pop(oldest, None)
                self._device_cache[key] = dev
                self._order.append(key)
            else:
                dev = self._device_cache[key]  # concurrent builder won
        return dev

    def host(self, *args) -> np.ndarray:
        """Return the host float64 table (tier-1 only)."""
        return self._host_builder(*args)

    def _note_profiler(self, hit: bool) -> None:
        # Lazy import: profiler is optional and must not create a cycle.
        from . import profiler as _prof

        _prof.log_cache_access(self.name, hit)

    def clear(self) -> None:
        self._host_builder.cache_clear()
        self._device_cache.clear()
        self._order.clear()
        self.hits = 0
        self.misses = 0

    @property
    def stats(self) -> dict[str, int]:
        return {"hits": self.hits, "misses": self.misses, "entries": len(self._device_cache)}


def table_cache(name: str, maxsize: int = 128, dtype: Any = np.float32):
    """Decorator: wrap a float64 NumPy builder into a TableCache."""

    def deco(builder: Callable[..., np.ndarray]) -> TableCache:
        return TableCache(name, builder, maxsize=maxsize, dtype=dtype)

    return deco


def clear_all_caches() -> None:
    """Clear every registered table cache (cold-cache benchmarking hook)."""
    with _REGISTRY_LOCK:
        caches = list(_CACHE_REGISTRY)
    for c in caches:
        c.clear()


def cache_stats() -> dict[str, dict[str, int]]:
    """Hit/miss/entry counts for every registered cache."""
    with _REGISTRY_LOCK:
        caches = list(_CACHE_REGISTRY)
    return {c.name: c.stats for c in caches}
