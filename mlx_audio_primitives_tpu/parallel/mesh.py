"""Device-mesh helpers.

The reference is strictly single-device (SURVEY.md §2.3: no collectives, no
process groups anywhere). Multi-chip support is therefore a TPU-native
*extension*, built the JAX way: a `jax.sharding.Mesh` over ICI with named
axes, sharding annotations on the batch ('data') and signal-time ('time')
axes, and XLA-inserted collectives. No NCCL/MPI analog exists or is needed.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
TIME_AXIS = "time"
MODEL_AXIS = "model"
STAGE_AXIS = "stage"
EXPERT_AXIS = "expert"


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
    devices = list(jax.devices()) if devices is None else list(devices)
    if n_time < 1:
        raise ValueError(f"n_time must be >= 1, got {n_time}")
    if n_data is None:
        if len(devices) % n_time != 0:
            raise ValueError(
                f"{len(devices)} devices do not divide evenly over "
                f"n_time={n_time}; pass n_data explicitly"
            )
        n_data = len(devices) // n_time
    if n_data < 1:
        raise ValueError(f"n_data must be >= 1, got {n_data}")
    if n_data * n_time > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_time} needs {n_data * n_time} devices, "
            f"have {len(devices)}"
        )
    if n_data * n_time < len(devices):
        import warnings

        warnings.warn(
            f"mesh {n_data}x{n_time} uses {n_data * n_time} of "
            f"{len(devices)} devices; the rest stay idle",
            stacklevel=2,
        )
    # Prefer the topology-aware layout so 'time' neighbors are ICI-adjacent
    # (ppermute halos ride single links); fall back to enumeration order for
    # virtual/CPU device sets or explicit device lists.
    if devices == list(jax.devices()) and n_data * n_time == len(devices):
        try:
            from jax.experimental import mesh_utils

            arr = mesh_utils.create_device_mesh((n_data, n_time))
            return Mesh(arr, (DATA_AXIS, TIME_AXIS))
        except Exception:
            pass
    arr = np.asarray(devices[: n_data * n_time]).reshape(n_data, n_time)
    return Mesh(arr, (DATA_AXIS, TIME_AXIS))


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
    devices = list(jax.devices()) if devices is None else list(devices)
    if n_model < 1:
        raise ValueError(f"n_model must be >= 1, got {n_model}")
    if n_data is None:
        if len(devices) % n_model != 0:
            raise ValueError(
                f"{len(devices)} devices do not divide evenly over "
                f"n_model={n_model}; pass n_data explicitly"
            )
        n_data = len(devices) // n_model
    if n_data < 1:
        raise ValueError(f"n_data must be >= 1, got {n_data}")
    if n_data * n_model > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, "
            f"have {len(devices)}"
        )
    if devices == list(jax.devices()) and n_data * n_model == len(devices):
        try:
            from jax.experimental import mesh_utils

            arr = mesh_utils.create_device_mesh((n_data, n_model))
            return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
        except Exception:
            pass
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


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
    devices = list(jax.devices()) if devices is None else list(devices)
    if n_expert < 1:
        raise ValueError(f"n_expert must be >= 1, got {n_expert}")
    if n_data is None:
        if len(devices) % n_expert != 0:
            raise ValueError(
                f"{len(devices)} devices do not divide evenly over "
                f"n_expert={n_expert}; pass n_data explicitly"
            )
        n_data = len(devices) // n_expert
    if n_data < 1:
        raise ValueError(f"n_data must be >= 1, got {n_data}")
    if n_data * n_expert > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_expert} needs {n_data * n_expert} devices, "
            f"have {len(devices)}"
        )
    if devices == list(jax.devices()) and n_data * n_expert == len(devices):
        try:
            from jax.experimental import mesh_utils

            arr = mesh_utils.create_device_mesh((n_data, n_expert))
            return Mesh(arr, (DATA_AXIS, EXPERT_AXIS))
        except Exception:
            pass
    arr = np.asarray(devices[: n_data * n_expert]).reshape(n_data, n_expert)
    return Mesh(arr, (DATA_AXIS, EXPERT_AXIS))


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
    devices = list(jax.devices()) if devices is None else list(devices)
    for name, v in (("n_data", n_data), ("n_expert", n_expert),
                    ("n_model", n_model)):
        if v < 1:
            raise ValueError(f"{name} must be >= 1, got {v}")
    n = n_data * n_expert * n_model
    if n > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_expert}x{n_model} needs {n} devices, "
            f"have {len(devices)}"
        )
    if devices == list(jax.devices()) and n == len(devices):
        try:
            from jax.experimental import mesh_utils

            arr = mesh_utils.create_device_mesh((n_data, n_expert, n_model))
            return Mesh(arr, (DATA_AXIS, EXPERT_AXIS, MODEL_AXIS))
        except Exception:
            pass
    arr = np.asarray(devices[:n]).reshape(n_data, n_expert, n_model)
    return Mesh(arr, (DATA_AXIS, EXPERT_AXIS, MODEL_AXIS))


def make_pp_mesh(n_stage: int, devices: list | None = None) -> Mesh:
    """Build a 1-D ``(stage,)`` mesh for pipeline-parallel training.

    Devices are taken in enumeration order so stage ``i`` hands activations
    to stage ``i+1`` over a single ICI hop on real hardware (see
    `models/pipeline_parallel.py`).
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    if n_stage < 1:
        raise ValueError(f"n_stage must be >= 1, got {n_stage}")
    if n_stage > len(devices):
        raise ValueError(
            f"pipeline of {n_stage} stages needs {n_stage} devices, "
            f"have {len(devices)}"
        )
    arr = np.asarray(devices[:n_stage])
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
