"""Data-parallel batch sharding helpers.

Every op in the public API is independent per batch element (SURVEY.md §2.3),
so multi-chip batch parallelism needs no collectives at all: place the batch
axis over the 'data' mesh axis and jit — XLA partitions the whole fused
pipeline. These helpers wrap that pattern.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
from jax.sharding import Mesh

from .mesh import batch_sharding


def shard_batch(arr: Any, mesh: Mesh) -> jax.Array:
    """Place a ``(batch, ...)`` array with the batch axis over 'data'.

    (Unspecified trailing dims of a PartitionSpec are replicated, so the
    rank-generic spec lives in one place: ``mesh.batch_sharding``.)"""
    return jax.device_put(arr, batch_sharding(mesh))


def data_parallel(fn: Callable, mesh: Mesh) -> Callable:
    """Wrap an eager batched op so its inputs are batch-sharded on ``mesh``.

    ``fn`` must accept/return arrays with a leading batch axis. The returned
    callable shards positional array arguments and relies on XLA's sharding
    propagation through the jitted op.
    """

    def wrapper(*args, **kwargs):
        sharded = [
            shard_batch(a, mesh) if hasattr(a, "ndim") and a.ndim >= 1 else a
            for a in args
        ]
        return fn(*sharded, **kwargs)

    return wrapper
