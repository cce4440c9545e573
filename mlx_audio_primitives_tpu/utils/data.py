"""Input-pipeline helpers: host batching and device prefetch.

The training loop's classic stall is the host->device copy of batch ``k+1``
waiting for batch ``k``'s step to finish. JAX transfers are asynchronous,
so double buffering is just *issuing the put early*: `prefetch_to_device`
keeps ``size`` batches in flight, overlapping PCIe/ICI transfer with TPU
compute. `batch_iterator` is the minimal deterministic epoch batcher the
examples and tests use — real data loading can come from anywhere that
yields NumPy pytrees.
"""

from __future__ import annotations

import collections
from typing import Any, Callable, Iterable, Iterator

import numpy as np

import jax

__all__ = ["prefetch_to_device", "batch_iterator"]


def prefetch_to_device(
    iterator: Iterable[Any],
    size: int = 2,
    sharding: Any | None = None,
) -> Iterator[Any]:
    """Wrap a host-batch iterator with ``size``-deep device prefetch.

    Each item is a pytree of host arrays; it is placed on device (optionally
    with ``sharding`` — a `NamedSharding` or a matching pytree of them) as
    soon as a buffer slot frees up, so the transfer of the NEXT batch runs
    while the CURRENT one computes. ``size=2`` is classic double buffering;
    deeper only helps when batch arrival is bursty.
    """
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")

    def put(batch):
        if sharding is None:
            return jax.device_put(batch)
        if jax.tree.structure(batch) == jax.tree.structure(
            sharding, is_leaf=lambda x: x is None
        ):
            return jax.device_put(batch, sharding)
        # single sharding applied to every leaf
        return jax.tree.map(lambda leaf: jax.device_put(leaf, sharding), batch)

    queue: collections.deque = collections.deque()
    it = iter(iterator)
    try:
        while len(queue) < size:
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out


def batch_iterator(
    data: Any,
    batch_size: int,
    *,
    shuffle: bool = True,
    seed: int = 0,
    drop_remainder: bool = True,
    epochs: int = 1,
    transform: Callable[[Any], Any] | None = None,
) -> Iterator[Any]:
    """Deterministic epoch batcher over a pytree of equal-length arrays.

    ``data`` is a pytree whose leaves share a leading example axis. Each
    yield is the same pytree sliced to ``batch_size`` examples; ``shuffle``
    reshuffles every epoch from ``seed`` (reproducible), ``transform`` maps
    each host batch before it is yielded (e.g. decode or augment on host).
    """
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    leaves = jax.tree.leaves(data)
    if not leaves:
        raise ValueError("data has no array leaves")
    n = leaves[0].shape[0]
    for leaf in leaves:
        if leaf.shape[0] != n:
            raise ValueError(
                f"all leaves must share the example axis: {leaf.shape[0]} != {n}"
            )
    rng = np.random.default_rng(seed)
    for _ in range(epochs):
        order = rng.permutation(n) if shuffle else np.arange(n)
        stop = n - (n % batch_size) if drop_remainder else n
        for start in range(0, stop, batch_size):
            idx = order[start:start + batch_size]
            batch = jax.tree.map(lambda leaf: leaf[idx], data)
            yield transform(batch) if transform is not None else batch
