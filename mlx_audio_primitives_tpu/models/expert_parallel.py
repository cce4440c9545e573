"""Expert-parallel (MoE) training for an audio frame classifier.

The reference is single-device (SURVEY.md §2.3); this module completes the
library's parallelism axes — after dp (batch), sp (time halo), tp (Megatron
channel sharding) and pp (GPipe stages) — with the fifth classic axis:
**expert parallelism**, sharding a Switch-style mixture-of-experts layer over
a ``(data, expert)`` mesh (`parallel.mesh.make_ep_mesh`) the way production
MoE models run on TPU pods:

* the log-mel frontend turns waveforms into per-frame tokens
  (``d = n_mels``); a learned router picks ONE expert per token (Switch
  top-1) with a static capacity ``C`` per expert per shard, so every shape
  stays fixed under jit;
* each device holds ``n_experts / n_expert_shards`` expert FFNs; tokens
  reach their expert via ``lax.all_to_all`` over the 'expert' axis (split
  the expert-stacked dispatch buffer, exchange over ICI, concatenate the
  peers' token buffers) and return the same way — the GShard/Switch
  dispatch-combine pattern;
* dispatch/combine are one-hot einsums (MXU-friendly, no scatters): tokens
  beyond an expert's capacity are dropped (residual passes them through),
  and the combine tensor carries the router probability so the router
  learns through the scaled expert output;
* a Switch load-balance auxiliary loss (``E · Σ_e f_e · P_e``) keeps the
  router from collapsing onto one expert.

Gradient accounting (``check_vma=False``, explicit collectives, like
`pipelines.make_sharded_train_step`): each device seeds the backward with
its LOCAL batch-mean loss. The ``all_to_all`` transpose (itself an
``all_to_all``) returns expert-weight cotangents to the devices that hold
those experts, so a local expert grad already sums the contributions of
every peer in its expert row; one ``psum`` over 'data' and a uniform
``/ n_devices`` yields the true global-batch-mean gradient. Replicated
leaves (frontend, router, head) take ``psum`` over BOTH axes. Verified
leaf-by-leaf against the dense single-device step in
``tests/test_expert_parallel.py``.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from .._config import MATMUL_PRECISION
from ..parallel.mesh import DATA_AXIS, EXPERT_AXIS, MODEL_AXIS
from ..parallel.sharding import sharding_tree
from .convnet import make_sgd_step, standardize_features
from .pipelines import TrainableLogMelFrontend

ArrayLike = Any


def validate_ep_shapes(n_expert_shards: int, n_experts: int, batch: int,
                       n_devices: int) -> None:
    """Every sharded dimension must divide evenly over the expert mesh."""
    if n_expert_shards < 1:
        raise ValueError(f"n_expert_shards must be >= 1, got {n_expert_shards}")
    if n_experts % n_expert_shards != 0:
        raise ValueError(
            f"n_experts={n_experts} not divisible by "
            f"n_expert_shards={n_expert_shards}"
        )
    if batch % n_devices != 0:
        raise ValueError(
            f"batch={batch} not divisible by the {n_devices}-device mesh "
            "(the batch shards over BOTH mesh axes)"
        )


def init_moe_classifier_params(
    frontend: TrainableLogMelFrontend,
    n_classes: int,
    n_experts: int = 4,
    d_hidden: int = 64,
    seed: int = 0,
) -> dict[str, Any]:
    """Learnable filterbank + router + expert FFN stack + linear head.

    Expert weights are stacked on a leading ``n_experts`` dim — the dim the
    'expert' mesh axis shards (`moe_param_specs`).
    """
    d = frontend.n_mels
    rng = np.random.default_rng(seed)

    def normal(shape, scale):
        return jnp.asarray(
            (rng.standard_normal(shape) * scale).astype(np.float32)
        )

    return {
        "frontend": frontend.init_params(),
        "router": {
            "w": normal((d, n_experts), 0.02),
            "b": jnp.zeros((n_experts,), jnp.float32),
        },
        "experts": {
            "w1": normal((n_experts, d, d_hidden), math.sqrt(2.0 / d)),
            "b1": jnp.zeros((n_experts, d_hidden), jnp.float32),
            "w2": normal((n_experts, d_hidden, d), math.sqrt(2.0 / d_hidden)),
            "b2": jnp.zeros((n_experts, d), jnp.float32),
        },
        "head": {
            "w": normal((d, n_classes), 1.0 / math.sqrt(d)),
            "b": jnp.zeros((n_classes,), jnp.float32),
        },
    }


def moe_param_specs() -> dict[str, Any]:
    """PartitionSpec tree: expert stack sharded over 'expert', rest replicated."""
    return {
        "frontend": {"fb_t": P()},
        "router": {"w": P(), "b": P()},
        "experts": {
            "w1": P(EXPERT_AXIS),
            "b1": P(EXPERT_AXIS),
            "w2": P(EXPERT_AXIS),
            "b2": P(EXPERT_AXIS),
        },
        "head": {"w": P(), "b": P()},
    }


def moe_param_sharding(mesh: Mesh) -> dict[str, Any]:
    """NamedSharding tree for placing the global params on an ep mesh."""
    return sharding_tree(mesh, moe_param_specs())


def moe_capacity(
    tokens_per_group: int, n_experts: int, capacity_factor: float
) -> int:
    """Static per-expert token capacity for one routing group."""
    return max(1, math.ceil(tokens_per_group * capacity_factor / n_experts))


def _tokens_from_feats(feats: jax.Array) -> jax.Array:
    """``(B, n_mels, F)`` dB features -> standardized ``(B, F, d)`` tokens."""
    return jnp.swapaxes(standardize_features(feats), -2, -1)


def _route_tokens(
    x: jax.Array, router: dict, n_experts: int, capacity: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Switch top-1 routing over one token group.

    ``x`` is ``(T, d)``. Returns ``(dispatch, combine, aux)`` where
    ``dispatch``/``combine`` are ``(T, E, C)`` one-hot / gate-weighted
    dispatch tensors and ``aux`` is the Switch load-balance loss. Tokens past
    an expert's capacity get an all-zero dispatch row (dropped — the MoE
    layer's residual carries them through unchanged).
    """
    logits = (
        jnp.matmul(x, router["w"], precision=MATMUL_PRECISION) + router["b"]
    )  # (T, E)
    probs = jax.nn.softmax(logits, axis=-1)
    expert_idx = jnp.argmax(probs, axis=-1)  # (T,)
    gate = jnp.take_along_axis(probs, expert_idx[:, None], axis=-1)[:, 0]
    mask = jax.nn.one_hot(expert_idx, n_experts, dtype=x.dtype)  # (T, E)
    # position of each token in its expert's queue (0-based, arrival order)
    pos = jnp.cumsum(mask, axis=0) * mask - mask
    keep = mask * (pos < capacity)
    dispatch = keep[:, :, None] * jax.nn.one_hot(
        pos.astype(jnp.int32), capacity, dtype=x.dtype
    )  # (T, E, C)
    combine = dispatch * gate[:, None, None]
    # Switch aux loss: E * sum_e (fraction routed to e) * (mean prob of e);
    # minimized (=1) by a uniform router.
    frac = jnp.mean(mask, axis=0)
    mean_prob = jnp.mean(probs, axis=0)
    aux = n_experts * jnp.sum(frac * mean_prob)
    return dispatch, combine, aux


def _expert_ffn(
    inp: jax.Array, experts: dict
) -> jax.Array:
    """Per-expert 2-layer FFN over stacked token buffers.

    ``inp`` is ``(E_local, buf, d)``; weights carry matching ``E_local``
    leading dims. Both contractions are batched MXU matmuls.
    """
    h = jax.nn.relu(
        jnp.einsum(
            "ecd,edh->ech", inp, experts["w1"], precision=MATMUL_PRECISION
        )
        + experts["b1"][:, None, :]
    )
    return (
        jnp.einsum(
            "ech,ehd->ecd", h, experts["w2"], precision=MATMUL_PRECISION
        )
        + experts["b2"][:, None, :]
    )


def _moe_sharded_loss(
    p: dict,
    y_local: jax.Array,
    labels_local: jax.Array,
    *,
    frontend: TrainableLogMelFrontend,
    n_experts: int,
    capacity_factor: float,
    aux_coef: float,
    use_pallas: bool | None,
    expert_fn,
) -> jax.Array:
    """Shard-local MoE classifier loss (runs INSIDE shard_map).

    The body shared by :func:`make_ep_train_step` and
    :func:`make_ep_tp_train_step`: frontend -> tokens -> Switch routing ->
    dispatch einsum -> ``all_to_all`` to the experts' devices ->
    ``expert_fn(expert_in, p['experts'])`` -> ``all_to_all`` home -> combine
    -> residual -> pooled head -> batch-mean NLL + aux. Only the expert-FFN
    body differs between the two steps (plain stacked FFN vs
    Megatron-sharded), so it is the one pluggable piece.
    """
    feats = frontend.apply(p["frontend"], y_local, use_pallas=use_pallas)
    x = _tokens_from_feats(feats)  # (B_l, F, d)
    Bl, F, d = x.shape
    x = x.reshape(Bl * F, d)
    capacity = moe_capacity(Bl * F, n_experts, capacity_factor)
    dispatch, combine, aux = _route_tokens(
        x, p["router"], n_experts, capacity
    )
    expert_in = jnp.einsum(
        "tec,td->ecd", dispatch, x, precision=MATMUL_PRECISION
    )  # (E, C, d)
    # tokens -> their experts' devices: (E, C, d) -> (E/n_ep, n_ep*C, d)
    expert_in = lax.all_to_all(
        expert_in, EXPERT_AXIS, split_axis=0, concat_axis=1, tiled=True
    )
    expert_out = expert_fn(expert_in, p["experts"])
    # processed tokens -> home devices: back to (E, C, d)
    expert_out = lax.all_to_all(
        expert_out, EXPERT_AXIS, split_axis=1, concat_axis=0, tiled=True
    )
    moe_out = jnp.einsum(
        "tec,ecd->td", combine, expert_out, precision=MATMUL_PRECISION
    )
    tokens = (x + moe_out).reshape(Bl, F, d)
    pooled = jnp.mean(tokens, axis=1)
    head = p["head"]
    logits = (
        jnp.matmul(pooled, head["w"], precision=MATMUL_PRECISION) + head["b"]
    )
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels_local[:, None], axis=-1)[:, 0]
    return jnp.mean(nll) + aux_coef * aux


def _moe_layer_dense_group(
    x: jax.Array, params: dict, n_experts: int, capacity: int
) -> tuple[jax.Array, jax.Array]:
    """One routing group of the MoE layer with the FULL expert stack.

    The oracle for the sharded path: the all_to_all there is a pure
    permutation of token buffers and the FFN couples no tokens, so routing +
    dispatch + FFN + combine per group computes exactly these numbers.
    """
    dispatch, combine, aux = _route_tokens(
        x, params["router"], n_experts, capacity
    )
    expert_in = jnp.einsum(
        "tec,td->ecd", dispatch, x, precision=MATMUL_PRECISION
    )
    expert_out = _expert_ffn(expert_in, params["experts"])
    y = jnp.einsum(
        "tec,ecd->td", combine, expert_out, precision=MATMUL_PRECISION
    )
    return x + y, aux


def moe_classifier_apply(
    frontend: TrainableLogMelFrontend,
    params: dict,
    y: ArrayLike,
    n_experts: int,
    capacity_factor: float = 1.25,
    n_groups: int = 1,
    use_pallas: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Dense (single-device) forward: ``(B, samples) -> (B, n_classes)``.

    ``n_groups`` emulates the sharded run's routing groups: the batch is
    split into ``n_groups`` contiguous chunks (the ep mesh's device order
    for a ``P(('data','expert'))`` batch) and each routes independently with
    the same per-group capacity — so dense and sharded drop IDENTICAL
    tokens. Returns ``(logits, aux_loss)``.
    """
    feats = frontend.apply(params["frontend"], y, use_pallas=use_pallas)
    tokens = _tokens_from_feats(feats)  # (B, F, d)
    B, F, d = tokens.shape
    if B % n_groups != 0:
        raise ValueError(f"batch {B} not divisible by n_groups={n_groups}")
    bg = B // n_groups
    capacity = moe_capacity(bg * F, n_experts, capacity_factor)
    grouped = tokens.reshape(n_groups, bg * F, d)
    out, aux = jax.vmap(
        lambda xg: _moe_layer_dense_group(xg, params, n_experts, capacity)
    )(grouped)
    tokens = out.reshape(B, F, d)
    aux = jnp.mean(aux)
    pooled = jnp.mean(tokens, axis=1)  # (B, d)
    head = params["head"]
    logits = (
        jnp.matmul(pooled, head["w"], precision=MATMUL_PRECISION) + head["b"]
    )
    return logits, aux


def make_ep_train_step(
    mesh: Mesh,
    frontend: TrainableLogMelFrontend,
    n_classes: int = 10,
    n_experts: int = 4,
    d_hidden: int = 64,
    capacity_factor: float = 1.25,
    aux_coef: float = 0.01,
    lr: float = 1e-2,
    use_pallas: bool | None = None,
):
    """SGD step of the MoE audio classifier, dp x ep sharded.

    ``mesh`` is a ``(data, expert)`` mesh from
    :func:`~..parallel.mesh.make_ep_mesh`. The batch shards over BOTH axes
    (every device routes its own token group); expert FFNs shard over
    'expert' per :func:`moe_param_specs`; tokens cross the expert axis via
    two ``all_to_all`` exchanges on ICI. Returns
    ``step(params, y, labels) -> (new_params, loss)`` over GLOBAL params;
    jit with the batch placed via ``ep_batch_sharding(mesh)`` and params via
    :func:`moe_param_sharding`.
    """
    n_ep = mesh.shape[EXPERT_AXIS]
    n_data = mesh.shape[DATA_AXIS]
    n_dev = n_ep * n_data
    if n_experts % n_ep != 0:
        raise ValueError(
            f"n_experts={n_experts} not divisible by the expert axis ({n_ep})"
        )
    specs = moe_param_specs()

    def body(params, y_local, labels_local):
        def loss_fn(p):
            return _moe_sharded_loss(
                p, y_local, labels_local,
                frontend=frontend, n_experts=n_experts,
                capacity_factor=capacity_factor, aux_coef=aux_coef,
                use_pallas=use_pallas, expert_fn=_expert_ffn,
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # Backward of the local loss: the all_to_all transpose already
        # returned each expert slice's cotangents from every peer in this
        # expert row, so expert leaves hold their row-sum gradient; psum over
        # 'data' completes the batch. Replicated leaves are local to this
        # device's tokens; psum over both axes completes them. One uniform
        # / n_dev turns sum-of-local-means into the global batch mean.
        grads = jax.tree.map(
            lambda g, s: (
                lax.psum(g, DATA_AXIS)
                if s == P(EXPERT_AXIS)
                else lax.psum(g, (DATA_AXIS, EXPERT_AXIS))
            )
            / n_dev,
            grads,
            specs,
        )
        return lax.pmean(loss, (DATA_AXIS, EXPERT_AXIS)), grads

    sharded_body = shard_map(
        body,
        mesh=mesh,
        in_specs=(
            specs,
            P((DATA_AXIS, EXPERT_AXIS)),
            P((DATA_AXIS, EXPERT_AXIS)),
        ),
        out_specs=(P(), specs),
        check_vma=False,
    )

    return make_sgd_step(
        sharded_body, lr,
        validate=lambda y: validate_ep_shapes(
            n_ep, n_experts, y.shape[0], n_dev
        ),
    )


def ep_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for ``(batch, ...)`` arrays: batch over BOTH ep mesh axes."""
    return NamedSharding(mesh, P((DATA_AXIS, EXPERT_AXIS)))


# ---------------------------------------------------------------------------
# dp x ep x tp: Megatron-sharded experts on a (data, expert, model) mesh


def moe_tp_param_specs() -> dict[str, Any]:
    """PartitionSpec tree for the 3-axis mesh: expert stacks shard over
    'expert' AND each expert FFN shards over 'model' — ``w1`` column-parallel
    (hidden dim), ``w2`` row-parallel (hidden dim), ``b2`` replicated over
    'model' (added once, after the psum)."""
    return {
        "frontend": {"fb_t": P()},
        "router": {"w": P(), "b": P()},
        "experts": {
            "w1": P(EXPERT_AXIS, None, MODEL_AXIS),
            "b1": P(EXPERT_AXIS, MODEL_AXIS),
            "w2": P(EXPERT_AXIS, MODEL_AXIS, None),
            "b2": P(EXPERT_AXIS),
        },
        "head": {"w": P(), "b": P()},
    }


def moe_tp_param_sharding(mesh: Mesh) -> dict[str, Any]:
    return sharding_tree(mesh, moe_tp_param_specs())


def moe_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch over ('data','expert'); replicated over 'model' (each model
    shard sees the same tokens — Megatron activations)."""
    return NamedSharding(mesh, P((DATA_AXIS, EXPERT_AXIS)))


def make_ep_tp_train_step(
    mesh: Mesh,
    frontend: TrainableLogMelFrontend,
    n_classes: int = 10,
    n_experts: int = 4,
    d_hidden: int = 64,
    capacity_factor: float = 1.25,
    aux_coef: float = 0.01,
    lr: float = 1e-2,
    use_pallas: bool | None = None,
):
    """SGD step of the MoE classifier on a ``(data, expert, model)`` mesh.

    The composition production MoE blocks use: tokens shard over
    ('data','expert') and replicate over 'model'; routing + dispatch +
    ``all_to_all`` work exactly as in :func:`make_ep_train_step`; INSIDE
    each expert the FFN is Megatron-sharded — ``w1`` column-parallel (each
    model shard computes a hidden slice), ``w2`` row-parallel with a
    ``psum`` over 'model' completing the contraction, ``b2`` added once
    after the reduction.

    Gradient accounting (``check_vma=False``): each device seeds its local
    loss; the loss is REPLICATED over 'model' (post-psum compute), so every
    leaf's local grad is one of ``n_model`` identical copies of the 'model'
    contribution. The per-spec collectives below make every leaf the global
    batch-mean gradient — verified leaf-by-leaf against the dense step in
    ``tests/test_expert_parallel.py``.
    """
    n_ep = mesh.shape[EXPERT_AXIS]
    n_data = mesh.shape[DATA_AXIS]
    n_tp = mesh.shape[MODEL_AXIS]
    n_tok_dev = n_ep * n_data  # devices holding distinct tokens
    if n_experts % n_ep != 0:
        raise ValueError(
            f"n_experts={n_experts} not divisible by the expert axis ({n_ep})"
        )
    if d_hidden % n_tp != 0:
        raise ValueError(
            f"d_hidden={d_hidden} not divisible by the model axis ({n_tp})"
        )
    specs = moe_tp_param_specs()

    def _tp_expert_ffn(expert_in, e):
        # Megatron-sharded expert FFN: w1 column-parallel (local hidden
        # slice), w2 row-parallel with a psum over 'model' completing the
        # contraction, b2 added once after the reduction.
        h = jax.nn.relu(
            jnp.einsum(
                "ecd,edh->ech", expert_in, e["w1"],
                precision=MATMUL_PRECISION,
            )
            + e["b1"][:, None, :]
        )
        out_partial = jnp.einsum(
            "ech,ehd->ecd", h, e["w2"], precision=MATMUL_PRECISION
        )
        return lax.psum(out_partial, MODEL_AXIS) + e["b2"][:, None, :]

    def body(params, y_local, labels_local):
        def loss_fn(p):
            return _moe_sharded_loss(
                p, y_local, labels_local,
                frontend=frontend, n_experts=n_experts,
                capacity_factor=capacity_factor, aux_coef=aux_coef,
                use_pallas=use_pallas, expert_fn=_tp_expert_ffn,
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)

        def finish(g, s):
            # Model-sharded expert leaves (w1/b1/w2): the psum transpose
            # hands each model shard the full out-cotangent, so its local
            # grad is its true slice for this expert row (summed over row
            # peers by the a2a transpose); complete over 'data' only.
            if s in (
                P(EXPERT_AXIS, None, MODEL_AXIS),
                P(EXPERT_AXIS, MODEL_AXIS),
                P(EXPERT_AXIS, MODEL_AXIS, None),
            ):
                # the psum's transpose SUMS the n_tp identical out-cotangent
                # copies into each model shard (measured: grads exactly
                # n_tp x the dense step without this) — one uniform / n_tp
                # restores the true slice gradient; then complete over 'data'
                return lax.psum(g, DATA_AXIS) / (n_tok_dev * n_tp)
            if s == P(EXPERT_AXIS):
                # b2 sits after the psum: every model shard computes the
                # identical full grad — pmean over 'model' is a consistency
                # no-op; complete over 'data'
                return lax.psum(lax.pmean(g, MODEL_AXIS), DATA_AXIS) / n_tok_dev
            # replicated leaves (frontend/router/head): local to this
            # device's tokens, identical over 'model'
            return lax.psum(lax.pmean(g, MODEL_AXIS),
                            (DATA_AXIS, EXPERT_AXIS)) / n_tok_dev

        grads = jax.tree.map(finish, grads, specs)
        return lax.pmean(loss, (DATA_AXIS, EXPERT_AXIS, MODEL_AXIS)), grads

    sharded_body = shard_map(
        body,
        mesh=mesh,
        in_specs=(
            specs,
            P((DATA_AXIS, EXPERT_AXIS)),
            P((DATA_AXIS, EXPERT_AXIS)),
        ),
        out_specs=(P(), specs),
        check_vma=False,
    )

    return make_sgd_step(
        sharded_body, lr,
        validate=lambda y: validate_ep_shapes(
            n_ep, n_experts, y.shape[0], n_tok_dev
        ),
    )
