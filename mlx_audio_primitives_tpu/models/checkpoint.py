"""Checkpoint / resume for training state.

The reference's only persisted state is benchmark baselines (SURVEY.md §5.4
— it has no training). This library DOES ship training steps
(`models/pipelines.py`, `models/convnet.py`), so checkpoint/resume becomes a
real subsystem: Orbax-backed (the JAX-ecosystem standard — handles device
arrays, pytrees, and atomic directory writes), with a plain ``.npz``
fallback mirroring the house graceful-degradation style (`_native.py`).

State is any pytree of arrays/scalars, e.g.::

    state = {"params": params, "step": 120}
    save_checkpoint("/ckpts/run1/120", state)
    state = restore_checkpoint("/ckpts/run1/120", target=state)

``target`` gives Orbax the tree topology (and on restore-to-sharded-arrays,
the shardings); restoring without it returns plain host arrays.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

try:  # pragma: no cover - exercised via the public helpers
    import orbax.checkpoint as _ocp

    HAS_ORBAX = True
except Exception:  # pragma: no cover
    _ocp = None
    HAS_ORBAX = False

__all__ = ["save_checkpoint", "restore_checkpoint", "HAS_ORBAX"]


def _npz_path(path: str) -> str:
    return path if path.endswith(".npz") else path + ".npz"


def save_checkpoint(path: str, state: Any, overwrite: bool = True) -> str:
    """Persist a pytree ``state`` at ``path`` (a directory for Orbax).

    Synchronous: returns only after the checkpoint is durable. Returns the
    path actually written (the ``.npz`` file when Orbax is unavailable).
    """
    path = os.path.abspath(path)
    if HAS_ORBAX:
        ck = _ocp.StandardCheckpointer()
        try:
            ck.save(path, state, force=overwrite)
            ck.wait_until_finished()
        finally:
            ck.close()
        return path
    import jax

    flat, treedef = jax.tree.flatten(state)
    out = _npz_path(path)
    if not overwrite and os.path.exists(out):
        raise FileExistsError(out)
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    np.savez(
        out,
        __treedef__=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f"leaf{i}": np.asarray(leaf) for i, leaf in enumerate(flat)},
    )
    return out


def restore_checkpoint(path: str, target: Any | None = None) -> Any:
    """Load a checkpoint written by :func:`save_checkpoint`.

    With ``target`` (a matching pytree, values used for topology/shardings)
    the restore is topology-checked; without it, Orbax reconstructs from the
    stored metadata and the npz fallback requires ``target``.
    """
    path = os.path.abspath(path)
    if HAS_ORBAX and os.path.isdir(path):
        ck = _ocp.StandardCheckpointer()
        try:
            if target is not None:
                return ck.restore(path, target)
            return ck.restore(path)
        finally:
            ck.close()
    import jax

    data = np.load(_npz_path(path))
    n = sum(1 for k in data.files if k.startswith("leaf"))
    leaves = [data[f"leaf{i}"] for i in range(n)]
    if target is None:
        raise ValueError(
            "npz-fallback checkpoints need `target` to rebuild the pytree"
        )
    treedef = jax.tree.structure(target)
    # the stored treedef string guards against a same-leaf-count target with
    # a DIFFERENT structure, which unflatten would otherwise silently
    # misassign positionally
    stored = bytes(data["__treedef__"]).decode()
    if stored != str(treedef):
        raise ValueError(
            f"checkpoint pytree structure {stored} does not match the "
            f"target structure {treedef}"
        )
    return jax.tree.unflatten(treedef, leaves)
