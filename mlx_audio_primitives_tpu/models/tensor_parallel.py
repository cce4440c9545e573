"""Tensor-parallel (Megatron-style) training for the conv audio classifier.

The reference is single-device (SURVEY.md §2.3); the library's other
multi-chip paths shard the *batch* ('data') and the *signal time axis*
('time'). This module adds the third classic axis: sharding the MODEL over a
``(data, model)`` mesh (`parallel.mesh.make_tp_mesh`) the way large
production models do on TPU pods:

* even conv layers are **column-parallel** — output channels sharded over
  'model', each device convolving its channel slice, activations left
  channel-sharded with no communication;
* odd conv layers are **row-parallel** — input channels sharded to match,
  partial outputs reduced with ``psum`` over ICI, bias added once after the
  reduction;
* the linear head is **column-parallel** — logit columns sharded, completed
  with a tiled ``all_gather`` so the softmax sees every class.

Gradients rely on shard_map's varying-manual-axes (vma) tracking: reverse
mode automatically inserts the matching collective for every cotangent
(psum over 'model' for replicated leaves fed by sharded branches, nothing
for leaves that are themselves sharded), so each leaf's gradient comes back
as the TRUE gradient summed over data shards — one uniform ``/ n_data``
yields the data-parallel mean. Verified leaf-by-leaf against the
single-device step in ``tests/test_tensor_parallel.py``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .._config import MATMUL_PRECISION
from ..parallel.mesh import DATA_AXIS, MODEL_AXIS
from ..parallel.sharding import sharding_tree
from .convnet import _CONV_DIMS, make_sgd_step, standardize_features
from .pipelines import TrainableLogMelFrontend

ArrayLike = Any


def _is_col_parallel(i: int) -> bool:
    """Conv layer i's parallel style: even = column (out-ch sharded), odd =
    row (in-ch sharded). Alternating keeps activations local between a
    col->row pair — the Megatron MLP block pattern."""
    return i % 2 == 0


def validate_tp_shapes(
    n_model: int, channels: tuple[int, ...], n_classes: int
) -> None:
    """Every sharded dimension must divide evenly over the model axis."""
    if n_model < 1:
        raise ValueError(f"n_model must be >= 1, got {n_model}")
    for i, c in enumerate(channels):
        if c % n_model != 0:
            raise ValueError(
                f"channels[{i}]={c} not divisible by n_model={n_model}"
            )
    if n_classes % n_model != 0:
        raise ValueError(
            f"n_classes={n_classes} not divisible by n_model={n_model}; "
            "pad the class count or lower n_model"
        )


def tp_param_specs(channels: tuple[int, ...]) -> dict[str, Any]:
    """PartitionSpec tree matching ``init_audio_classifier_params`` output.

    Col-parallel convs shard w's OUT-channel dim (OIHW dim 0) and their
    bias; row-parallel convs shard w's IN-channel dim (dim 1) with a
    replicated bias (added once, after the psum); the head shards logit
    columns. The frontend filterbank stays replicated.
    """
    net: dict[str, Any] = {}
    for i in range(len(channels)):
        if _is_col_parallel(i):
            net[f"conv{i}"] = {"w": P(MODEL_AXIS), "b": P(MODEL_AXIS)}
        else:
            net[f"conv{i}"] = {"w": P(None, MODEL_AXIS), "b": P()}
    net["head"] = {"w": P(None, MODEL_AXIS), "b": P(MODEL_AXIS)}
    return {"frontend": {"fb_t": P()}, "net": net}


def tp_param_sharding(
    mesh: Mesh, channels: tuple[int, ...]
) -> dict[str, Any]:
    """NamedSharding tree for placing the global params on a tp mesh."""
    return sharding_tree(mesh, tp_param_specs(channels))


def _tp_convnet_apply(
    net: dict, feats: jax.Array, n_layers: int
) -> jax.Array:
    """Shard-local classifier body: feats ``(B_l, n_mels, F)`` -> logits
    ``(B_l, n_classes)`` (full, after the head's all_gather). Runs INSIDE
    shard_map; ``net`` leaves arrive as this device's slices."""
    x = standardize_features(feats)[:, None, :, :]
    sharded = False  # are activations currently channel-sharded?
    for i in range(n_layers):
        layer = net[f"conv{i}"]
        x = lax.conv_general_dilated(
            x,
            layer["w"],
            window_strides=(2, 2),
            padding="SAME",
            dimension_numbers=_CONV_DIMS,
            precision=MATMUL_PRECISION,
        )
        if _is_col_parallel(i):
            x = jax.nn.relu(x + layer["b"][None, :, None, None])
            sharded = True
        else:
            x = lax.psum(x, MODEL_AXIS)  # complete the row-parallel contraction
            x = jax.nn.relu(x + layer["b"][None, :, None, None])
            sharded = False
    if sharded:
        # odd-depth stack ends channel-sharded: gather channels for the pool
        x = lax.all_gather(x, MODEL_AXIS, axis=1, tiled=True)
    pooled = jnp.mean(x, axis=(-2, -1))  # (B_l, C)
    head = net["head"]
    logits_local = (
        jnp.matmul(pooled, head["w"], precision=MATMUL_PRECISION) + head["b"]
    )
    return lax.all_gather(logits_local, MODEL_AXIS, axis=1, tiled=True)


def make_tp_train_step(
    mesh: Mesh,
    frontend: TrainableLogMelFrontend,
    n_classes: int = 10,
    channels: tuple[int, ...] = (16, 32),
    lr: float = 1e-2,
    use_pallas: bool | None = None,
):
    """SGD step of the end-to-end audio classifier, dp x tp sharded.

    ``mesh`` is a ``(data, model)`` mesh from
    :func:`~..parallel.mesh.make_tp_mesh`. The batch shards over 'data';
    parameters shard over 'model' per :func:`tp_param_specs`; the frontend
    replicates over 'model' (its tables are small — sharding the mel GEMM
    would shard a *spatial* dim of the conv input). Returns
    ``step(params, y, labels) -> (new_params, loss)`` over GLOBAL params;
    jit with the batch placed via ``batch_sharding(mesh)`` and params via
    :func:`tp_param_sharding`.
    """
    n_model = mesh.shape[MODEL_AXIS]
    n_data = mesh.shape[DATA_AXIS]
    n_layers = len(channels)
    validate_tp_shapes(n_model, channels, n_classes)
    specs = tp_param_specs(channels)

    def body(params, y_local, labels_local):
        def loss_fn(p):
            feats = frontend.apply(p["frontend"], y_local, use_pallas=use_pallas)
            logits = _tp_convnet_apply(p["net"], feats, n_layers)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, labels_local[:, None], axis=-1)[:, 0]
            return jnp.mean(nll)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # vma tracking auto-inserts the per-leaf collectives in reverse mode
        # (see module docstring). Two uniform scale factors fall out:
        # * n_data — each data shard seeds its LOCAL batch-mean loss, and the
        #   auto-psums sum those over 'data';
        # * n_model — the post-all_gather region (softmax + nll) is computed
        #   redundantly on every model shard, vma still marks it varying, and
        #   the all_gather transpose (psum_scatter) sums the n_model
        #   identical cotangent copies into every upstream leaf.
        # So every leaf arrives as mesh_size x the true batch-mean gradient.
        grads = jax.tree.map(lambda g: g / (n_data * n_model), grads)
        # pmean over 'model' is a consistency no-op (every model shard holds
        # the same post-all_gather loss) that marks the value vma-invariant
        # so the P() out_spec typechecks.
        return lax.pmean(loss, (DATA_AXIS, MODEL_AXIS)), grads

    sharded_body = shard_map(
        body,
        mesh=mesh,
        in_specs=(specs, P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), specs),
    )

    return make_sgd_step(sharded_body, lr)
