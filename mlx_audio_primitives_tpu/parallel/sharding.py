"""Data-parallel batch sharding helpers.

Every op in the public API is independent per batch element (SURVEY.md §2.3),
so multi-chip batch parallelism needs no collectives at all: place the batch
axis over the 'data' mesh axis and run the op per shard. These helpers wrap
that pattern.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import DATA_AXIS, batch_sharding


def sharding_tree(mesh: Mesh, specs: Any) -> Any:
    """Map a PartitionSpec pytree to the matching NamedSharding pytree.

    The one place the spec->sharding conversion lives — every
    ``*_param_sharding`` helper in ``models/`` delegates here."""
    from jax.sharding import NamedSharding

    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_batch(arr: Any, mesh: Mesh) -> jax.Array:
    """Place a ``(batch, ...)`` array with the batch axis over 'data'.

    (Unspecified trailing dims of a PartitionSpec are replicated, so the
    rank-generic spec lives in one place: ``mesh.batch_sharding``.)"""
    return jax.device_put(arr, batch_sharding(mesh))


def data_parallel(fn: Callable, mesh: Mesh) -> Callable:
    """Wrap a batched op so it runs once per 'data' shard on ``mesh``.

    Contract: every POSITIONAL array argument is batched — leading batch
    axis, batch size a multiple of the 'data' axis size — and is sharded
    over it. Auxiliary non-batched arrays (windows, filterbanks, params)
    and scalars go through KEYWORD arguments, which are closed over
    replicated. ``fn`` must return arrays with a leading batch axis.

    Each shard calls ``fn`` on its local batch inside ``shard_map`` — batch
    elements are independent, so no collectives appear, and any Pallas fast
    path stays a single-device kernel per chip (custom kernels are
    device-local by construction under shard_map; automatic SPMD
    partitioning of a custom call is neither needed nor relied upon).
    """

    def wrapper(*args, **kwargs):
        arr_idx = [
            i for i, a in enumerate(args)
            if hasattr(a, "ndim") and getattr(a, "ndim", 0) >= 1
        ]
        arrs = tuple(jnp.asarray(args[i]) for i in arr_idx)
        if not arrs:
            return fn(*args, **kwargs)
        batch = arrs[0].shape[0]
        # every positional array is sharded over 'data' by contract; an aux
        # array (window, filterbank) passed positionally would be silently
        # SLICED per shard whenever its length divides the mesh — reject the
        # mismatch instead of corrupting it
        for i, a in zip(arr_idx, arrs):
            if a.shape[0] != batch:
                raise TypeError(
                    f"data_parallel: positional array argument {i} has "
                    f"leading dim {a.shape[0]} != batch {batch}; every "
                    "positional array is batch-sharded — pass auxiliary "
                    "non-batched arrays (windows/filterbanks/params) as "
                    "keyword arguments, which are replicated."
                )
        # a batched array passed as a kwarg would be silently closed over
        # UN-sharded — every shard would compute over the full batch and the
        # concatenated output would be garbage. Reject the ambiguity.
        for k, v in kwargs.items():
            if (
                hasattr(v, "ndim") and getattr(v, "ndim", 0) >= 1
                and v.shape[0] == batch
            ):
                raise TypeError(
                    f"data_parallel: keyword argument '{k}' looks batched "
                    f"(leading dim {v.shape[0]} == batch); batched arrays "
                    "must be positional so they are sharded. Keyword arrays "
                    "are replicated (windows/filterbanks/params)."
                )

        def body(*shards):
            full = list(args)
            for i, s in zip(arr_idx, shards):
                full[i] = s
            return fn(*full, **kwargs)

        return shard_map(
            body,
            mesh=mesh,
            in_specs=(P(DATA_AXIS),) * len(arrs),
            out_specs=P(DATA_AXIS),
            # pallas_call out_shapes carry no varying-mesh-axes metadata
            check_vma=False,
        )(*arrs)

    return wrapper
