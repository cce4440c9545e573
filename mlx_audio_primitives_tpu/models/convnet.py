"""Compact convolutional audio classifier over the log-mel frontend.

The reference has no model zoo (SURVEY.md §2.3 — its "models" are composed
DSP pipelines), so this module is a beyond-parity validation vehicle: a
keyword-spotting-shaped conv net whose input features come from
``TrainableLogMelFrontend``, making the WHOLE stack — learnable mel
filterbank through the fused Pallas kernel's custom VJP, conv stack on the
MXU, pooled linear head — differentiable end to end, and giving
``models/checkpoint.py`` a realistic training state to persist.

Design notes (TPU-first):

* Convolutions use ``lax.conv_general_dilated`` in NCHW/OIHW layout with the
  library's matmul precision so XLA lowers them onto the MXU.
* The training step shards the batch over EVERY mesh axis (the dp×sp meshes
  used elsewhere flatten into one data axis here — convs over the frame axis
  would couple time shards, so the conv model is data-parallel by design).
* Parameters stay replicated; gradients are ``pmean``-reduced across the
  flattened batch axis inside ``shard_map``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from .._config import MATMUL_PRECISION
from .pipelines import TrainableLogMelFrontend

ArrayLike = Any

_CONV_DIMS = ("NCHW", "OIHW", "NCHW")


def standardize_features(feats: jax.Array) -> jax.Array:
    """Per-sample standardization over the (n_mels, frames) axes.

    The shared first stage of every classifier body in ``models/`` (dp, tp,
    pp, and MoE variants all normalize features identically)."""
    x = feats.astype(jnp.float32)
    mean = jnp.mean(x, axis=(-2, -1), keepdims=True)
    std = jnp.std(x, axis=(-2, -1), keepdims=True)
    return (x - mean) / (std + 1e-5)


def make_sgd_step(sharded_body, lr: float, validate=None):
    """Close a ``(params, y, labels) -> (loss, grads)`` sharded body into the
    SGD update shared by every ``make_*_train_step`` factory. ``validate``
    (optional) gets the global batch array before tracing, for clear shape
    errors."""

    def step(params, y, labels):
        if validate is not None:
            validate(y)
        loss, grads = sharded_body(params, y, labels)
        new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return new_params, loss

    return step


def init_convnet_params(
    n_classes: int,
    channels: tuple[int, ...] = (16, 32),
    seed: int = 0,
) -> dict[str, jax.Array]:
    """He-initialized parameters for :func:`convnet_apply`.

    Returns ``{"conv0": {"w","b"}, "conv1": {...}, ..., "head": {"w","b"}}``
    with 3×3 kernels; ``head.w`` maps the channel-pooled features to logits.
    """
    rng = np.random.default_rng(seed)
    params: dict[str, Any] = {}
    in_c = 1
    for i, out_c in enumerate(channels):
        fan_in = in_c * 9
        params[f"conv{i}"] = {
            "w": jnp.asarray(
                (rng.standard_normal((out_c, in_c, 3, 3)) * np.sqrt(2.0 / fan_in))
                .astype(np.float32)
            ),
            "b": jnp.zeros((out_c,), jnp.float32),
        }
        in_c = out_c
    params["head"] = {
        "w": jnp.asarray(
            (rng.standard_normal((in_c, n_classes)) / np.sqrt(in_c)).astype(
                np.float32
            )
        ),
        "b": jnp.zeros((n_classes,), jnp.float32),
    }
    return params


def convnet_apply(params: dict, feats: jax.Array) -> jax.Array:
    """``(B, n_mels, n_frames)`` dB features -> ``(B, n_classes)`` logits.

    Per-sample standardization -> [3×3 conv stride 2, ReLU] per conv layer ->
    global average pool -> linear head. Static shapes throughout; the whole
    body jits into a handful of MXU convolutions.
    """
    x = standardize_features(feats)[:, None, :, :]  # (B, 1, n_mels, F)
    i = 0
    while f"conv{i}" in params:
        layer = params[f"conv{i}"]
        x = lax.conv_general_dilated(
            x,
            layer["w"],
            window_strides=(2, 2),
            padding="SAME",
            dimension_numbers=_CONV_DIMS,
            precision=MATMUL_PRECISION,
        )
        x = jax.nn.relu(x + layer["b"][None, :, None, None])
        i += 1
    pooled = jnp.mean(x, axis=(-2, -1))  # (B, C)
    head = params["head"]
    return (
        jnp.matmul(pooled, head["w"], precision=MATMUL_PRECISION) + head["b"]
    )


def init_audio_classifier_params(
    frontend: TrainableLogMelFrontend,
    n_classes: int,
    channels: tuple[int, ...] = (16, 32),
    seed: int = 0,
) -> dict[str, Any]:
    """Full end-to-end state: learnable filterbank + conv net."""
    return {
        "frontend": frontend.init_params(),
        "net": init_convnet_params(n_classes, channels=channels, seed=seed),
    }


def audio_classifier_apply(
    frontend: TrainableLogMelFrontend,
    params: dict,
    y: ArrayLike,
    use_pallas: bool | None = None,
) -> jax.Array:
    """``(B, samples)`` waveforms -> ``(B, n_classes)`` logits, end to end."""
    feats = frontend.apply(params["frontend"], y, use_pallas=use_pallas)
    return convnet_apply(params["net"], feats)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch sharded over ALL mesh axes (flattened data parallelism)."""
    return NamedSharding(mesh, P(tuple(mesh.axis_names)))


def make_convnet_train_step(
    mesh: Mesh,
    frontend: TrainableLogMelFrontend,
    n_classes: int = 10,
    channels: tuple[int, ...] = (16, 32),
    lr: float = 1e-2,
    use_pallas: bool | None = None,
):
    """SGD step for the end-to-end audio classifier, data-parallel.

    The batch is sharded over the FLATTENED mesh (every axis acts as data
    parallelism — `batch_sharding`), parameters are replicated, and loss +
    gradients are ``pmean``-reduced inside ``shard_map``. The frontend runs
    per shard, so the fused Pallas mel kernel executes as one device-local
    kernel per chip, never subject to automatic SPMD partitioning.

    Returns ``step(params, y, labels) -> (new_params, loss)``; jit with the
    batch placed via :func:`batch_sharding`.
    """
    axes = tuple(mesh.axis_names)

    def body(params, y_local, labels_local):
        def loss_fn(p):
            logits = audio_classifier_apply(
                frontend, p, y_local, use_pallas=use_pallas
            )
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, labels_local[:, None], axis=-1)[:, 0]
            return jnp.mean(nll)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        loss = lax.pmean(loss, axes)
        grads = jax.tree.map(lambda g: lax.pmean(g, axes), grads)
        return loss, grads

    # check_vma=False: with jax 0.9's varying-manual-axes tracking on,
    # in-body `grad` of a replicated param already returns the cross-device
    # SUM (cotangents are auto-psummed back to invariance) and the explicit
    # pmean above would silently over-scale by the mesh size. With vma off,
    # grads stay local and pmean is a true data-parallel average — verified
    # against the single-device step in `tests/test_convnet.py`.
    sharded_body = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(axes), P(axes)),
        out_specs=(P(), P()),
        check_vma=False,
    )

    return make_sgd_step(sharded_body, lr)
