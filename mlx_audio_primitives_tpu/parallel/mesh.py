"""Device-mesh helpers.

The reference is strictly single-device (SURVEY.md §2.3: no collectives, no
process groups anywhere). Multi-chip support is therefore a TPU-native
*extension*, built the JAX way: a `jax.sharding.Mesh` over ICI with named
axes, sharding annotations on the batch ('data') and signal-time ('time')
axes, and XLA-inserted collectives. No NCCL/MPI analog exists or is needed.

All constructors share one grid builder (`_grid_mesh`): validate the dims,
prefer `mesh_utils.create_device_mesh`'s topology-aware layout when the
mesh covers exactly the default device set (so axis neighbors are
ICI-adjacent and ppermute halos / all_to_alls ride single links), and fall
back to enumeration order for virtual/CPU device sets or explicit lists.
"""

from __future__ import annotations

import warnings

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
TIME_AXIS = "time"
MODEL_AXIS = "model"
STAGE_AXIS = "stage"
EXPERT_AXIS = "expert"


def _infer_leading(
    lead_name: str, other: int, other_name: str, devices: list
) -> int:
    """Fill an omitted leading dim so the mesh covers every device."""
    if len(devices) % other != 0:
        raise ValueError(
            f"{len(devices)} devices do not divide evenly over "
            f"{other_name}={other}; pass {lead_name} explicitly"
        )
    return len(devices) // other


def _grid_mesh(
    axis_names: tuple[str, ...], dims: tuple[int, ...], devices: list | None
) -> Mesh:
    """Shared constructor body: validation + topology-aware device layout."""
    explicit = devices is not None
    devices = list(jax.devices()) if devices is None else list(devices)
    for name, v in zip(axis_names, dims):
        if v < 1:
            raise ValueError(f"n_{name} must be >= 1, got {v}")
    n = int(np.prod(dims))
    shape_str = "x".join(str(d) for d in dims)
    if n > len(devices):
        raise ValueError(
            f"mesh {shape_str} needs {n} devices, have {len(devices)}"
        )
    if n < len(devices):
        warnings.warn(
            f"mesh {shape_str} uses {n} of {len(devices)} devices; "
            "the rest stay idle",
            stacklevel=3,
        )
    if not explicit and n == len(devices):
        try:
            from jax.experimental import mesh_utils

            arr = mesh_utils.create_device_mesh(dims)
            return Mesh(arr, axis_names)
        except Exception:
            pass
    arr = np.asarray(devices[:n]).reshape(dims)
    return Mesh(arr, axis_names)


def make_mesh(
    n_data: int | None = None,
    n_time: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a ``(data, time)`` mesh over the available devices.

    ``data`` is the embarrassingly-parallel batch axis (every op in the API
    is independent per batch element, so no collectives cross it). ``time``
    shards long signals along the sample axis; STFT-family ops on that axis
    exchange ``n_fft - hop`` halos over ICI (see `time_shard.py`).
    """
    dev_list = list(jax.devices()) if devices is None else list(devices)
    if n_time < 1:
        raise ValueError(f"n_time must be >= 1, got {n_time}")
    if n_data is None:
        n_data = _infer_leading("n_data", n_time, "n_time", dev_list)
    return _grid_mesh((DATA_AXIS, TIME_AXIS), (n_data, n_time), devices)


def make_tp_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh for tensor-parallel training.

    ``data`` is the batch axis as in :func:`make_mesh`; ``model`` shards
    parameter tensors (conv channels, classifier columns) Megatron-style —
    activations cross it via ``psum`` / ``all_gather`` on ICI (see
    `models/tensor_parallel.py`). A separate constructor rather than a third
    axis on :func:`make_mesh` keeps the dp x sp mesh shape stable for the
    sharded DSP ops, which know nothing about parameters.
    """
    dev_list = list(jax.devices()) if devices is None else list(devices)
    if n_model < 1:
        raise ValueError(f"n_model must be >= 1, got {n_model}")
    if n_data is None:
        n_data = _infer_leading("n_data", n_model, "n_model", dev_list)
    return _grid_mesh((DATA_AXIS, MODEL_AXIS), (n_data, n_model), devices)


def make_ep_mesh(
    n_data: int | None = None,
    n_expert: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a ``(data, expert)`` mesh for expert-parallel (MoE) training.

    ``data`` is the batch axis; ``expert`` shards the EXPERT STACK of a
    mixture-of-experts layer — each device in an expert group holds
    ``n_experts / n_expert`` experts, and routed tokens travel to their
    expert's device over ICI via ``all_to_all`` (see
    `models/expert_parallel.py`). Like :func:`make_tp_mesh`, this is its own
    constructor so the dp x sp mesh used by the sharded DSP ops keeps its
    shape.
    """
    dev_list = list(jax.devices()) if devices is None else list(devices)
    if n_expert < 1:
        raise ValueError(f"n_expert must be >= 1, got {n_expert}")
    if n_data is None:
        n_data = _infer_leading("n_data", n_expert, "n_expert", dev_list)
    return _grid_mesh((DATA_AXIS, EXPERT_AXIS), (n_data, n_expert), devices)


def make_moe_mesh(
    n_data: int,
    n_expert: int,
    n_model: int,
    devices: list | None = None,
) -> Mesh:
    """Build a 3-axis ``(data, expert, model)`` mesh — the production MoE
    topology: batch over 'data', expert stacks over 'expert', and each
    expert's FFN additionally Megatron-sharded over 'model' (see
    `models/expert_parallel.py::make_ep_tp_train_step`)."""
    return _grid_mesh(
        (DATA_AXIS, EXPERT_AXIS, MODEL_AXIS),
        (n_data, n_expert, n_model),
        devices,
    )


def make_pp_mesh(n_stage: int, devices: list | None = None) -> Mesh:
    """Build a 1-D ``(stage,)`` mesh for pipeline-parallel training.

    Devices are taken in enumeration order so stage ``i`` hands activations
    to stage ``i+1`` over a single ICI hop on real hardware (see
    `models/pipeline_parallel.py`).
    """
    dev_list = list(jax.devices()) if devices is None else list(devices)
    if n_stage < 1:
        raise ValueError(f"n_stage must be >= 1, got {n_stage}")
    if n_stage > len(dev_list):
        raise ValueError(
            f"pipeline of {n_stage} stages needs {n_stage} devices, "
            f"have {len(dev_list)}"
        )
    arr = np.asarray(dev_list[:n_stage])
    return Mesh(arr, (STAGE_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for ``(batch, ...)`` arrays: batch split over 'data'."""
    ndim_spec = P(DATA_AXIS)
    return NamedSharding(mesh, ndim_spec)


def batch_time_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for ``(batch, samples)``: batch over 'data', samples over 'time'."""
    return NamedSharding(mesh, P(DATA_AXIS, TIME_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
