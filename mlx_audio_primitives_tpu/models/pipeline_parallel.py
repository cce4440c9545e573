"""Pipeline-parallel (GPipe-style) training for a deep conv audio classifier.

Completes the library's parallelism demonstration set (dp: `convnet.py` /
`pipelines.py`; sp: `parallel/time_shard.py`; tp: `tensor_parallel.py`) with
the fourth classic axis: a **pipeline over a ``(stage,)`` mesh**
(`parallel.mesh.make_pp_mesh`), the way deep stacks train on TPU pods when
one chip cannot hold every layer.

The pipelined region is a stack of ``n_blocks`` IDENTICAL residual conv
blocks whose parameters stack as a leading ``(n_blocks, ...)`` axis sharded
over 'stage' — the canonical JAX pipelining shape (scan-over-layers with the
layer axis split across devices). The schedule is the classic fill-drain
loop: the batch splits into M microbatches; at step ``t`` stage ``s``
processes microbatch ``t - s``, then hands its activations to stage
``s + 1`` with a ring ``lax.ppermute`` (one ICI hop between neighbors on
real hardware). After ``M + S - 1`` steps every microbatch has crossed every
stage; the last stage's collected outputs are completed with a ``psum``
(every other stage contributes zeros), and the small replicated stem / head
run redundantly on every device — standard for a demo-scale pipeline.

Autodiff runs straight through the schedule: ``ppermute`` transposes to the
inverse ring, the fill/drain masks transpose to themselves, and shard_map's
vma tracking inserts the psum for the stage-sharded block gradients.
Verified leaf-by-leaf against serial (single-device) execution in
``tests/test_pipeline_parallel.py``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .._config import MATMUL_PRECISION
from ..parallel.mesh import STAGE_AXIS
from ..parallel.sharding import sharding_tree
from .convnet import _CONV_DIMS, make_sgd_step, standardize_features
from .pipelines import TrainableLogMelFrontend

ArrayLike = Any


def init_deep_classifier_params(
    frontend: TrainableLogMelFrontend,
    n_classes: int,
    n_blocks: int = 4,
    width: int = 16,
    seed: int = 0,
) -> dict[str, Any]:
    """Parameters for the deep residual classifier.

    ``stem`` lifts ``(B, 1, n_mels, F)`` to ``width`` channels at stride 2;
    ``blocks`` is the pipelined stack — every leaf has a leading
    ``n_blocks`` axis; ``head`` maps pooled channels to logits.
    """
    rng = np.random.default_rng(seed)

    def conv_w(shape, fan_in):
        return jnp.asarray(
            (rng.standard_normal(shape) * np.sqrt(2.0 / fan_in)).astype(
                np.float32
            )
        )

    return {
        "frontend": frontend.init_params(),
        "stem": {
            "w": conv_w((width, 1, 3, 3), 9),
            "b": jnp.zeros((width,), jnp.float32),
        },
        "blocks": {
            "w": conv_w((n_blocks, width, width, 3, 3), width * 9),
            "b": jnp.zeros((n_blocks, width), jnp.float32),
        },
        "head": {
            "w": jnp.asarray(
                (rng.standard_normal((width, n_classes)) / np.sqrt(width))
                .astype(np.float32)
            ),
            "b": jnp.zeros((n_classes,), jnp.float32),
        },
    }


def pp_param_specs() -> dict[str, Any]:
    """PartitionSpec tree: the block stack shards its layer axis over
    'stage'; everything else replicates."""
    return {
        "frontend": {"fb_t": P()},
        "stem": {"w": P(), "b": P()},
        "blocks": {"w": P(STAGE_AXIS), "b": P(STAGE_AXIS)},
        "head": {"w": P(), "b": P()},
    }


def pp_param_sharding(mesh: Mesh) -> dict[str, Any]:
    """NamedSharding tree for placing the global params on a pp mesh."""
    return sharding_tree(mesh, pp_param_specs())


def _stem_apply(stem: dict, feats: jax.Array) -> jax.Array:
    """dB features -> ``(B, width, H, W)`` activations (standardize + conv)."""
    x = standardize_features(feats)[:, None, :, :]
    x = lax.conv_general_dilated(
        x, stem["w"], window_strides=(2, 2), padding="SAME",
        dimension_numbers=_CONV_DIMS, precision=MATMUL_PRECISION,
    )
    return jax.nn.relu(x + stem["b"][None, :, None, None])


def _block_apply(w: jax.Array, b: jax.Array, x: jax.Array) -> jax.Array:
    """One shape-preserving residual block: ``x + relu(conv(x))``."""
    h = lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=_CONV_DIMS, precision=MATMUL_PRECISION,
    )
    return x + jax.nn.relu(h + b[None, :, None, None])


def _blocks_apply(blocks: dict, x: jax.Array) -> jax.Array:
    """Apply a stacked ``(K, ...)`` block sub-stack sequentially (scan)."""

    def body(x, wb):
        return _block_apply(wb["w"], wb["b"], x), None

    out, _ = lax.scan(body, x, blocks)
    return out


def _head_apply(head: dict, x: jax.Array) -> jax.Array:
    pooled = jnp.mean(x, axis=(-2, -1))
    return (
        jnp.matmul(pooled, head["w"], precision=MATMUL_PRECISION) + head["b"]
    )


def deep_classifier_apply(
    frontend: TrainableLogMelFrontend,
    params: dict,
    y: ArrayLike,
    use_pallas: bool | None = None,
) -> jax.Array:
    """Serial (single-device) forward — the pipeline's reference semantics."""
    feats = frontend.apply(params["frontend"], y, use_pallas=use_pallas)
    x = _stem_apply(params["stem"], feats)
    x = _blocks_apply(params["blocks"], x)
    return _head_apply(params["head"], x)


def make_pp_train_step(
    mesh: Mesh,
    frontend: TrainableLogMelFrontend,
    n_classes: int = 10,
    n_blocks: int = 4,
    width: int = 16,
    n_microbatches: int = 2,
    lr: float = 1e-2,
    use_pallas: bool | None = None,
):
    """SGD step of the deep classifier with the block stack pipelined.

    ``mesh`` is a ``(stage,)`` mesh from :func:`~..parallel.mesh.make_pp_mesh`;
    ``n_blocks`` must divide evenly into ``mesh.shape['stage']`` stages and
    the batch into ``n_microbatches`` microbatches. Returns
    ``step(params, y, labels) -> (new_params, loss)`` over GLOBAL params
    (place them with :func:`pp_param_sharding`).
    """
    S = mesh.shape[STAGE_AXIS]
    M = n_microbatches
    if n_blocks % S != 0:
        raise ValueError(
            f"n_blocks={n_blocks} must divide over {S} pipeline stages"
        )
    if M < 1:
        raise ValueError(f"n_microbatches must be >= 1, got {M}")
    specs = pp_param_specs()

    def body(params, y_rep, labels_rep):
        def loss_fn(p):
            feats = frontend.apply(p["frontend"], y_rep, use_pallas=use_pallas)
            x = _stem_apply(p["stem"], feats)  # (B, C, H, W), replicated
            B = x.shape[0]
            if B % M != 0:
                raise ValueError(
                    f"batch ({B}) must divide into {M} microbatches"
                )
            mbs = x.reshape(M, B // M, *x.shape[1:])  # microbatch stack

            stage = lax.axis_index(STAGE_AXIS)
            # pcast-to-varying: the scan carry becomes stage-varying after
            # the first
            # iteration's masks, and scan needs consistent carry avals
            state = lax.pcast(jnp.zeros_like(mbs[0]), STAGE_AXIS, to="varying")
            obuf = lax.pcast(jnp.zeros_like(mbs), STAGE_AXIS, to="varying")

            def sched(carry, t):
                state, obuf = carry
                # fill: stage 0 picks up microbatch t (clamped past the end —
                # its drain-phase work never reaches the last stage in time)
                mb = lax.dynamic_index_in_dim(
                    mbs, jnp.clip(t, 0, M - 1), axis=0, keepdims=False
                )
                state = jnp.where(stage == 0, mb, state)
                # compute: this stage's block sub-stack
                state = _blocks_apply(p["blocks"], state)
                # drain: last stage banks microbatch t - (S-1)
                oi = jnp.clip(t - (S - 1), 0, M - 1)
                written = lax.dynamic_update_index_in_dim(obuf, state, oi, 0)
                emit = (stage == S - 1) & (t >= S - 1)
                obuf = jnp.where(emit, written, obuf)
                # hand activations to the next stage over the ring
                state = lax.ppermute(
                    state, STAGE_AXIS, [(i, (i + 1) % S) for i in range(S)]
                )
                return (state, obuf), None

            (_, obuf), _ = lax.scan(
                sched, (state, obuf), jnp.arange(M + S - 1)
            )
            # only the last stage wrote outputs; psum completes them everywhere
            out = lax.psum(obuf, STAGE_AXIS).reshape(B, *x.shape[1:])
            logits = _head_apply(p["head"], out)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, labels_rep[:, None], axis=-1)[:, 0]
            return jnp.mean(nll)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # No normalization needed, unlike the tp step: psum (unlike
        # all_gather) yields a vma-INVARIANT output, so the post-psum region
        # is typed replicated, the head/loss cotangents are invariant, and
        # the fill/drain masks route exactly one copy of every pipeline
        # cotangent — each leaf's gradient comes back as the true
        # batch-mean. Verified leaf-by-leaf in test_pipeline_parallel.py.
        return lax.pmean(loss, STAGE_AXIS), grads

    sharded_body = shard_map(
        body,
        mesh=mesh,
        in_specs=(specs, P(), P()),
        out_specs=(P(), specs),
    )

    return make_sgd_step(sharded_body, lr)
