"""Transformer audio classifier with ring-attention context parallelism.

The reference is single-device with no model zoo (SURVEY.md §2.3); the
library's other training demos cover dp (`convnet.py`), sp over raw samples
(`parallel/time_shard.py` + `pipelines.py`), tp (`tensor_parallel.py`), pp
(`pipeline_parallel.py`) and ep (`expert_parallel.py`). This module adds the
remaining classic axis — **context parallelism**: an AST-style transformer
encoder over log-mel *frame tokens* whose attention runs as a **ring** over
the same ``(data, time)`` mesh the DSP layer shards waveforms on.

The end-to-end story is fully sequence-parallel: the waveform is sharded
over 'time', `logmel_time_sharded` turns each shard's samples into its own
frame tokens (one ``ppermute`` halo of ``n_fft - hop`` samples), and the
encoder attends across shards by rotating K/V blocks around the ring with
``lax.ppermute`` while accumulating the softmax online (flash-attention
style running max / normalizer) — the full ``(T, T)`` score matrix and the
gathered sequence never materialize on any chip.

TPU-first choices:

* every contraction is an einsum on the MXU at the library's matmul
  precision; shapes are static; the layer stack is a ``lax.scan`` over a
  stacked ``(n_blocks, ...)`` parameter axis (one compiled block body);
* the ring is ``n_time`` unrolled steps of (local attention GEMMs +
  neighbor ``ppermute``) — compute hides the single-hop ICI transfer;
* online-softmax accumulation keeps f32 stability for any score range
  (running max ``m``, normalizer ``l``, and rescaled accumulator).

Gradients ride shard_map's varying-manual-axes tracking: in-body ``grad``
returns each leaf's gradient of the SUM of per-device loss seeds (ppermute
transposes to the inverse ring, psum to broadcast), so one uniform
``/ (n_data * n_time)`` yields the true batch-mean gradient for every leaf —
verified leaf-by-leaf against the single-device step in
``tests/test_transformer.py``.
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
from ..parallel.mesh import DATA_AXIS, TIME_AXIS
from ..parallel.sharding import sharding_tree
from ..parallel.time_shard import logmel_time_sharded
from .convnet import make_sgd_step

ArrayLike = Any


# ---------------------------------------------------------------------------
# Parameters


def sinusoidal_positions(n_positions: int, d_model: int) -> np.ndarray:
    """Standard sin/cos position table ``(n_positions, d_model)`` in f32.

    Used as the *initialization* of a trainable position embedding (learned
    positions starting at the sinusoid — deterministic, no RNG)."""
    pos = np.arange(n_positions, dtype=np.float64)[:, None]
    dim = np.arange(d_model, dtype=np.float64)[None, :]
    angle = pos / np.power(10000.0, 2.0 * (dim // 2) / d_model)
    table = np.where(dim % 2 == 0, np.sin(angle), np.cos(angle))
    return table.astype(np.float32)


def init_transformer_params(
    n_mels: int,
    n_classes: int,
    n_frames: int,
    d_model: int = 64,
    n_heads: int = 4,
    d_ff: int = 128,
    n_blocks: int = 2,
    seed: int = 0,
) -> dict[str, Any]:
    """He/Xavier-initialized encoder parameters.

    Block leaves carry a leading ``(n_blocks,)`` stack axis (scanned over in
    :func:`transformer_apply`, shardable over 'stage' by a pipeline). Head
    dims: ``d_model = n_heads * d_head``.
    """
    if d_model % n_heads != 0:
        raise ValueError(
            f"d_model={d_model} not divisible by n_heads={n_heads}"
        )
    d_head = d_model // n_heads
    rng = np.random.default_rng(seed)

    def dense(shape, fan_in):
        return jnp.asarray(
            (rng.standard_normal(shape) / np.sqrt(fan_in)).astype(np.float32)
        )

    nb = n_blocks
    return {
        "embed": {
            "w": dense((n_mels, d_model), n_mels),
            "b": jnp.zeros((d_model,), jnp.float32),
        },
        "pos": jnp.asarray(sinusoidal_positions(n_frames, d_model)),
        "blocks": {
            "ln1": {
                "g": jnp.ones((nb, d_model), jnp.float32),
                "b": jnp.zeros((nb, d_model), jnp.float32),
            },
            "attn": {
                "wq": dense((nb, d_model, n_heads, d_head), d_model),
                "wk": dense((nb, d_model, n_heads, d_head), d_model),
                "wv": dense((nb, d_model, n_heads, d_head), d_model),
                "wo": dense((nb, n_heads, d_head, d_model), d_model),
            },
            "ln2": {
                "g": jnp.ones((nb, d_model), jnp.float32),
                "b": jnp.zeros((nb, d_model), jnp.float32),
            },
            "mlp": {
                "w1": dense((nb, d_model, d_ff), d_model),
                "b1": jnp.zeros((nb, d_ff), jnp.float32),
                "w2": dense((nb, d_ff, d_model), d_ff),
                "b2": jnp.zeros((nb, d_model), jnp.float32),
            },
        },
        "ln_f": {
            "g": jnp.ones((d_model,), jnp.float32),
            "b": jnp.zeros((d_model,), jnp.float32),
        },
        "head": {
            "w": dense((d_model, n_classes), d_model),
            "b": jnp.zeros((n_classes,), jnp.float32),
        },
    }


def transformer_param_specs() -> dict[str, Any]:
    """PartitionSpec tree for the (data, time) CP mesh: every parameter is
    replicated — context parallelism shards the *tokens*, not the weights."""
    rep = jax.tree.map(
        lambda _: P(),
        init_transformer_params(8, 2, 4, d_model=8, n_heads=2, d_ff=8),
    )
    return rep


# ---------------------------------------------------------------------------
# Encoder body (shared between the single-device and ring paths)


def _layernorm(x: jax.Array, g: jax.Array, b: jax.Array) -> jax.Array:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * lax.rsqrt(var + 1e-5) * g + b


def _mlp(blk: dict, x: jax.Array) -> jax.Array:
    h = jax.nn.gelu(
        jnp.einsum("btd,df->btf", x, blk["w1"], precision=MATMUL_PRECISION)
        + blk["b1"]
    )
    return (
        jnp.einsum("btf,fd->btd", h, blk["w2"], precision=MATMUL_PRECISION)
        + blk["b2"]
    )


def _qkv(attn: dict, x: jax.Array):
    q = jnp.einsum("btd,dhk->bthk", x, attn["wq"], precision=MATMUL_PRECISION)
    k = jnp.einsum("btd,dhk->bthk", x, attn["wk"], precision=MATMUL_PRECISION)
    v = jnp.einsum("btd,dhk->bthk", x, attn["wv"], precision=MATMUL_PRECISION)
    return q, k, v


def _full_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Reference bidirectional attention: ``(B, T, H, dh)`` q/k/v -> context.

    The single-device oracle the ring path must match."""
    scale = 1.0 / np.sqrt(q.shape[-1])
    s = jnp.einsum("bthk,bshk->bhts", q, k, precision=MATMUL_PRECISION) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhts,bshk->bthk", p, v, precision=MATMUL_PRECISION)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
) -> jax.Array:
    """Context-parallel bidirectional attention over a ring.

    ``q``/``k``/``v`` are the SHARD-LOCAL ``(B_l, T_l, H, dh)`` blocks of a
    sequence sharded over mesh axis ``axis_name``; must run inside
    ``shard_map``. Each of the ``n = axis_size`` steps contracts the local
    queries against the currently-held K/V block and folds the result into a
    flash-style online softmax (running per-row max ``m``, normalizer ``l``,
    rescaled accumulator), then rotates K/V one hop around the ring with
    ``lax.ppermute`` — the classic ring-attention schedule: O(T_l) memory,
    full-sequence attention, the score matrix never materialized globally.

    Returns the local context block ``(B_l, T_l, H, dh)``; bitwise layout
    matches :func:`_full_attention` on the gathered sequence to f32
    accumulation error (~1e-6).
    """
    n = lax.axis_size(axis_name)
    scale = 1.0 / np.sqrt(q.shape[-1])
    perm = [(j, (j + 1) % n) for j in range(n)]

    m = jnp.full(q.shape[:3], -jnp.inf, q.dtype)  # (B, T_l, H) running max
    l = jnp.zeros(q.shape[:3], q.dtype)  # running normalizer
    acc = jnp.zeros_like(q)  # running context numerator
    for i in range(n):
        s = (
            jnp.einsum("bthk,bshk->bths", q, k, precision=MATMUL_PRECISION)
            * scale
        )  # (B, T_l, H, S_l)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        # scores are finite, so m_new > -inf after the first block and the
        # correction exp(m - m_new) is well-defined (exp(-inf) = 0 on step 0)
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bths,bshk->bthk", p, v, precision=MATMUL_PRECISION
        )
        m = m_new
        if i < n - 1:
            k = lax.ppermute(k, axis_name, perm=perm)
            v = lax.ppermute(v, axis_name, perm=perm)
    return acc / l[..., None]


def _encoder_tokens(
    params: dict,
    tokens: jax.Array,
    pos: jax.Array,
    attention,
) -> jax.Array:
    """Shared encoder trunk: ``(B, T, n_mels)`` standardized tokens ->
    ``(B, T, d_model)`` encoded tokens. ``attention(q, k, v)`` is either the
    full single-device contraction or the ring schedule."""
    x = (
        jnp.einsum(
            "btm,md->btd", tokens, params["embed"]["w"],
            precision=MATMUL_PRECISION,
        )
        + params["embed"]["b"]
        + pos
    )

    def block(x, blk):
        h = _layernorm(x, blk["ln1"]["g"], blk["ln1"]["b"])
        q, k, v = _qkv(blk["attn"], h)
        ctx = attention(q, k, v)
        x = x + jnp.einsum(
            "bthk,hkd->btd", ctx, blk["attn"]["wo"],
            precision=MATMUL_PRECISION,
        )
        h = _layernorm(x, blk["ln2"]["g"], blk["ln2"]["b"])
        x = x + _mlp(blk["mlp"], h)
        return x, None

    x, _ = lax.scan(block, x, params["blocks"])
    return _layernorm(x, params["ln_f"]["g"], params["ln_f"]["b"])


def _standardize_tokens(tokens: jax.Array) -> jax.Array:
    """Per-sample standardization over (tokens, features) — the token-layout
    twin of `convnet.standardize_features` (same statistics, transposed)."""
    mean = jnp.mean(tokens, axis=(-2, -1), keepdims=True)
    std = jnp.std(tokens, axis=(-2, -1), keepdims=True)
    return (tokens - mean) / (std + 1e-5)


def transformer_logits(params: dict, tokens: jax.Array) -> jax.Array:
    """``(B, T, n_mels)`` raw dB tokens -> ``(B, n_classes)`` logits.

    Single-device reference path: standardize -> encoder (full attention) ->
    mean-pool over tokens -> linear head. The CP step computes exactly this
    with the sequence axis sharded."""
    tokens = _standardize_tokens(tokens)
    F = tokens.shape[1]
    pos = params["pos"][:F][None]
    x = _encoder_tokens(params, tokens, pos, _full_attention)
    pooled = jnp.mean(x, axis=1)
    head = params["head"]
    return (
        jnp.matmul(pooled, head["w"], precision=MATMUL_PRECISION) + head["b"]
    )


def transformer_apply(params: dict, feats: jax.Array) -> jax.Array:
    """``(B, n_mels, F)`` dB features (the library's standard feature
    layout) -> ``(B, n_classes)`` logits."""
    return transformer_logits(params, jnp.swapaxes(feats, -1, -2))


# ---------------------------------------------------------------------------
# Context-parallel training step over the (data, time) mesh


def transformer_param_sharding(mesh: Mesh, params: dict) -> dict:
    """NamedSharding tree (all replicated) matching ``params``' structure."""
    return sharding_tree(mesh, jax.tree.map(lambda _: P(), params))


def make_cp_train_step(
    mesh: Mesh,
    sr: int = 22050,
    n_fft: int = 512,
    hop_length: int | None = None,
    n_mels: int = 64,
    n_classes: int = 10,
    d_model: int = 64,
    n_heads: int = 4,
    d_ff: int = 128,
    n_blocks: int = 2,
    lr: float = 1e-2,
    fft_mode: str = "matmul",
):
    """SGD step of the transformer classifier, dp x cp sharded end to end.

    ``mesh`` is the library's ``(data, time)`` mesh (`make_mesh`): the batch
    shards over 'data', and the SEQUENCE — raw samples into
    `logmel_time_sharded`, frame tokens through the encoder — shards over
    'time'. No chip ever holds the whole sequence: the frontend exchanges
    sample halos, attention rotates K/V blocks around the ring
    (:func:`ring_attention`), token pooling finishes with one ``psum``.

    Waveforms must satisfy ``(t_size * hop) | L`` (the center=False frame
    grid, `time_shard.py`); tokens per shard = ``L / (t_size * hop)``.
    Parameters are replicated; pass them through
    :func:`transformer_param_sharding`. Returns
    ``step(params, y, labels) -> (new_params, loss)``; jit with the batch
    placed via ``batch_time_sharding(mesh)``.
    """
    if hop_length is None:
        hop_length = n_fft // 4
    n_data = mesh.shape[DATA_AXIS]
    n_time = mesh.shape[TIME_AXIS]

    def body(params, feats_local, labels_local):
        # feats_local: (B_l, F_l, n_mels) — this shard's frame tokens
        def loss_fn(p):
            toks = feats_local
            # global per-sample standardization: two-pass moments (mean, then
            # squared deviations — E[x^2]-E[x]^2 cancels badly in f32 for dB
            # features), each reduced over 'time' with one psum
            n_tok = toks.shape[1] * n_time * toks.shape[2]
            s1 = lax.psum(jnp.sum(toks, axis=(1, 2)), TIME_AXIS)
            mean = (s1 / n_tok)[:, None, None]
            s2 = lax.psum(jnp.sum((toks - mean) ** 2, axis=(1, 2)), TIME_AXIS)
            std = jnp.sqrt((s2 / n_tok)[:, None, None])
            toks = (toks - mean) / (std + 1e-5)

            F_l = toks.shape[1]
            t_idx = lax.axis_index(TIME_AXIS)
            pos = lax.dynamic_slice(
                p["pos"], (t_idx * F_l, 0), (F_l, p["pos"].shape[1])
            )[None]
            x = _encoder_tokens(
                p, toks, pos,
                lambda q, k, v: ring_attention(q, k, v, TIME_AXIS),
            )
            pooled = lax.psum(jnp.sum(x, axis=1), TIME_AXIS) / (F_l * n_time)
            head = p["head"]
            logits = (
                jnp.matmul(pooled, head["w"], precision=MATMUL_PRECISION)
                + head["b"]
            )
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(
                logp, labels_local[:, None], axis=-1
            )[:, 0]
            return jnp.mean(nll)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # vma tracking returns each leaf's gradient of the SUM of distinct
        # loss seeds. The in-body loss is time-INVARIANT (the pools psum over
        # 'time' inside loss_fn), so its seed counts ONCE per data shard —
        # unlike tensor_parallel.py, where the post-all_gather loss stays
        # vma-varying and every device seeds. Hence the uniform rescale is
        # 1/n_data, not 1/(n_data*n_time) — pinned leaf-by-leaf against the
        # single-device step in tests/test_transformer.py.
        grads = jax.tree.map(lambda g: g / n_data, grads)
        # loss is already time-invariant (the pools psum over 'time' inside
        # loss_fn), so only the data average remains
        return lax.pmean(loss, DATA_AXIS), grads

    specs = transformer_param_specs()

    sharded_body = shard_map(
        body,
        mesh=mesh,
        in_specs=(specs, P(DATA_AXIS, TIME_AXIS, None), P(DATA_AXIS)),
        out_specs=(P(), specs),
    )
    inner = make_sgd_step(sharded_body, lr)

    def step(params, y, labels):
        feats = logmel_time_sharded(
            y, mesh, sr=sr, n_fft=n_fft, hop_length=hop_length,
            n_mels=n_mels, center=False, fft_mode=fft_mode,
        )  # (B, F, n_mels) sharded (data, time, -)
        return inner(params, feats, labels)

    return step


def single_device_cp_oracle(
    params: dict,
    y: ArrayLike,
    labels: ArrayLike,
    sr: int = 22050,
    n_fft: int = 512,
    hop_length: int | None = None,
    n_mels: int = 64,
    lr: float = 1e-2,
):
    """The unsharded twin of :func:`make_cp_train_step` (same math on one
    device: center=False log-mel over the full frame grid -> transformer ->
    NLL -> SGD), used by the equality tests. Returns ``(new_params, loss)``.

    The sharded frontend computes the FULL ``L/hop`` frame grid (trailing
    frames read zeros past the signal end — `time_shard.py` center=False
    semantics) via the frame -> window -> DFT-GEMM -> mel-GEMM chain, so the
    oracle zero-pads ``n_fft - hop`` samples and runs the SAME primitive
    chain (not `melspectrogram`'s own dispatch, whose different transform
    path would add ~1e-6 feature noise that the leaf-equality tests would
    misread as gradient error).
    """
    from ..kernels.dft import forward_basis
    from ..ops._frames import frame_signal_batched
    from ..ops.convert import power_to_db
    from ..ops.mel import mel_filterbank
    from ..ops.stft import _get_padded_window

    if hop_length is None:
        hop_length = n_fft // 4
    y = jnp.pad(jnp.asarray(y), ((0, 0), (0, n_fft - hop_length)))
    win = _get_padded_window("hann", n_fft, n_fft)
    basis = forward_basis(n_fft)
    fb_t = mel_filterbank(sr, n_fft, n_mels=n_mels).T
    n_bins = n_fft // 2 + 1

    def loss_fn(p):
        frames = frame_signal_batched(y, n_fft, hop_length) * win
        ri = jnp.matmul(frames, basis, precision=MATMUL_PRECISION)
        pow2 = ri[..., :n_bins] ** 2 + ri[..., n_bins:] ** 2
        mel = jnp.matmul(pow2, fb_t, precision=MATMUL_PRECISION)
        tokens = power_to_db(mel, top_db=None)  # (B, F, n_mels)
        logits = transformer_logits(p, tokens)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(
            logp, jnp.asarray(labels)[:, None], axis=-1
        )[:, 0]
        return jnp.mean(nll)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    new_params = jax.tree.map(lambda p_, g: p_ - lr * g, params, grads)
    return new_params, loss
