"""Self- and cross-similarity matrices for music structure analysis.

librosa `segment.recurrence_matrix` / `cross_similarity` roles, TPU-native:
librosa delegates neighbor search to sklearn's NearestNeighbors on the
host; here the full pairwise distance matrix is ONE MXU GEMM
(``|x|^2 + |y|^2 - 2 x.y`` for euclidean, a normalized dot for cosine),
the diagonal exclusion band is a static mask, and k-nearest selection is
``jax.lax.top_k`` per row — everything on device, batched frames.

Semantics follow librosa's documented behavior (k-NN graph over frame
feature vectors, ``width`` diagonal exclusion, connectivity / distance /
affinity modes, optional symmetrization). Defaults that librosa derives
from data (``k``, affinity ``bandwidth``) use the same published formulas
(``k = 2 ceil(sqrt(t - 2 width + 1))``; bandwidth = median retained
distance) — documented here rather than bit-matched against sklearn.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .._config import MATMUL_PRECISION, REAL_DTYPE
from ..utils.validation import validate_positive

ArrayLike = Any

_INF = np.float32(np.inf)


def _pairwise_distance(X: jax.Array, Y: jax.Array, metric: str) -> jax.Array:
    """(t_x, d) x (t_y, d) -> (t_x, t_y) distances via one GEMM."""
    if metric == "euclidean":
        sq = (
            jnp.sum(X * X, axis=-1)[:, None]
            + jnp.sum(Y * Y, axis=-1)[None, :]
            - 2.0 * jnp.matmul(X, Y.T, precision=MATMUL_PRECISION)
        )
        return jnp.sqrt(jnp.maximum(sq, 0.0))
    if metric == "cosine":
        tiny = jnp.asarray(np.finfo(np.float32).tiny, REAL_DTYPE)
        nx = jnp.maximum(jnp.linalg.norm(X, axis=-1), tiny)
        ny = jnp.maximum(jnp.linalg.norm(Y, axis=-1), tiny)
        cos = jnp.matmul(X, Y.T, precision=MATMUL_PRECISION) / (
            nx[:, None] * ny[None, :]
        )
        return 1.0 - jnp.clip(cos, -1.0, 1.0)
    raise ValueError(
        f"Unknown metric: '{metric}'. Supported: 'euclidean', 'cosine'"
    )


@partial(jax.jit, static_argnames=("k", "metric", "width", "sym",
                                   "include_self", "mode"))
def _recurrence_core(
    X: jax.Array, *, k: int, metric: str, width: int, sym: bool,
    include_self: bool, mode: str,
) -> jax.Array:
    t = X.shape[0]
    D = _pairwise_distance(X, X, metric)
    idx = jnp.arange(t)
    band = jnp.abs(idx[:, None] - idx[None, :]) < width
    if include_self:
        band = band & (idx[:, None] != idx[None, :])
    Dm = jnp.where(band, _INF, D)
    # k nearest per row: the k-th smallest distance is the row threshold
    neg_kth = jax.lax.top_k(-Dm, k)[0][:, -1]
    keep = (Dm <= -neg_kth[:, None]) & jnp.isfinite(Dm)
    if sym:
        keep = keep & keep.T
    if mode == "connectivity":
        return keep.astype(REAL_DTYPE)
    if mode == "distance":
        return jnp.where(keep, D, 0.0).astype(REAL_DTYPE)
    # affinity: exp(-D / bandwidth), bandwidth = median retained distance
    vals = jnp.where(keep, D, jnp.nan)
    bw = jnp.nanmedian(vals)
    bw = jnp.where(jnp.isfinite(bw) & (bw > 0), bw, 1.0)
    return jnp.where(keep, jnp.exp(-D / bw), 0.0).astype(REAL_DTYPE)


def recurrence_matrix(
    data: ArrayLike,
    k: int | None = None,
    width: int = 1,
    metric: str = "euclidean",
    sym: bool = False,
    mode: str = "connectivity",
    self_: bool = False,
) -> jax.Array:
    """k-NN self-similarity matrix over frames, ``(t, t)``.

    ``data`` is ``(d, t)`` feature-major like every spectrogram in this
    package (or ``(t,)`` scalar features). ``R[i, j]`` nonzero means frame
    ``j`` is among frame ``i``'s ``k`` nearest neighbors at least ``width``
    frames away from the diagonal. ``mode``: 'connectivity' (0/1),
    'distance', or 'affinity' (``exp(-D/bandwidth)``). ``sym`` keeps only
    mutual neighbor pairs; ``self_`` admits the zero-distance self-match.
    """
    validate_positive(width, "width")
    X = jnp.asarray(data, dtype=REAL_DTYPE)
    if X.ndim == 1:
        X = X[None]
    if X.ndim != 2:
        raise ValueError(
            f"recurrence_matrix expects (d, t) features, got {X.ndim}-D"
        )
    t = X.shape[1]
    if t - 2 * width + 1 < 1:
        raise ValueError(
            f"width ({width}) leaves no admissible neighbors for {t} frames"
        )
    if mode not in ("connectivity", "distance", "affinity"):
        raise ValueError(
            f"Unknown mode: '{mode}'. Supported: 'connectivity', "
            "'distance', 'affinity'"
        )
    if k is None:
        k = int(2 * np.ceil(np.sqrt(t - 2 * width + 1)))
    k = int(min(max(k, 1), t - 1))
    return _recurrence_core(
        X.T, k=k, metric=metric, width=int(width), sym=bool(sym),
        include_self=bool(self_), mode=mode,
    )


@partial(jax.jit, static_argnames=("k", "metric", "mode"))
def _cross_core(
    X: jax.Array, Y: jax.Array, *, k: int, metric: str, mode: str
) -> jax.Array:
    D = _pairwise_distance(X, Y, metric)
    neg_kth = jax.lax.top_k(-D, k)[0][:, -1]
    keep = D <= -neg_kth[:, None]
    if mode == "connectivity":
        return keep.astype(REAL_DTYPE)
    if mode == "distance":
        return jnp.where(keep, D, 0.0).astype(REAL_DTYPE)
    vals = jnp.where(keep, D, jnp.nan)
    bw = jnp.nanmedian(vals)
    bw = jnp.where(jnp.isfinite(bw) & (bw > 0), bw, 1.0)
    return jnp.where(keep, jnp.exp(-D / bw), 0.0).astype(REAL_DTYPE)


def cross_similarity(
    data: ArrayLike,
    data_ref: ArrayLike,
    k: int | None = None,
    metric: str = "euclidean",
    mode: str = "connectivity",
) -> jax.Array:
    """k-NN cross-similarity ``(t, t_ref)`` between two feature sequences
    (librosa `segment.cross_similarity` role): row ``i`` marks the ``k``
    reference frames nearest to query frame ``i``."""
    X = jnp.asarray(data, dtype=REAL_DTYPE)
    Y = jnp.asarray(data_ref, dtype=REAL_DTYPE)
    if X.ndim == 1:
        X = X[None]
    if Y.ndim == 1:
        Y = Y[None]
    if X.ndim != 2 or Y.ndim != 2:
        raise ValueError("cross_similarity expects (d, t) feature matrices")
    if X.shape[0] != Y.shape[0]:
        raise ValueError(
            f"feature dimensions disagree: {X.shape[0]} vs {Y.shape[0]}"
        )
    if mode not in ("connectivity", "distance", "affinity"):
        raise ValueError(
            f"Unknown mode: '{mode}'. Supported: 'connectivity', "
            "'distance', 'affinity'"
        )
    t_ref = Y.shape[1]
    if k is None:
        k = int(2 * np.ceil(np.sqrt(t_ref)))
    k = int(min(max(k, 1), t_ref))
    return _cross_core(X.T, Y.T, k=k, metric=metric, mode=mode)


__all__ = ["recurrence_matrix", "cross_similarity", "nn_filter"]


def nn_filter(
    data: ArrayLike,
    rec: ArrayLike | None = None,
    aggregate: str = "mean",
    **recurrence_kwargs,
) -> jax.Array:
    """Nearest-neighbor smoothing of a feature sequence (librosa
    `decompose.nn_filter` role): each frame is replaced by the aggregate
    of its recurrence-neighbors — the classic self-similarity denoiser
    (REPET-SIM when applied to spectrograms).

    ``rec`` is a precomputed (t, t) recurrence/affinity matrix; otherwise
    :func:`recurrence_matrix` runs with ``**recurrence_kwargs`` (affinity
    mode recommended). ``aggregate``: 'mean' (affinity-weighted) or
    'median' (masked median over neighbors, the REPET-SIM choice). One
    GEMM for the mean path; a masked sort for the median.
    """
    X = jnp.asarray(data, dtype=REAL_DTYPE)
    if X.ndim == 1:
        X = X[None]
    if X.ndim != 2:
        raise ValueError("nn_filter expects (d, t) features")
    if rec is None:
        recurrence_kwargs.setdefault("mode", "affinity")
        R = recurrence_matrix(X, **recurrence_kwargs)
    else:
        R = jnp.asarray(rec, dtype=REAL_DTYPE)
        if R.shape != (X.shape[1], X.shape[1]):
            raise ValueError(
                f"rec must be ({X.shape[1]}, {X.shape[1]}), got "
                f"{tuple(R.shape)}"
            )
    if aggregate == "mean":
        # include each frame itself with unit weight (librosa adds the
        # identity so empty-neighbor frames pass through unchanged)
        Rw = R + jnp.eye(R.shape[0], dtype=REAL_DTYPE)
        norm = jnp.sum(Rw, axis=1)
        return (X @ Rw.T / norm[None, :]).astype(REAL_DTYPE)
    if aggregate == "median":
        t = X.shape[1]
        keep = (R + jnp.eye(t, dtype=REAL_DTYPE)) > 0
        big = jnp.asarray(np.float32(np.finfo(np.float32).max), REAL_DTYPE)
        # masked median per (feature, frame): sort neighbor values with
        # non-neighbors pushed to +inf, then index the middle of the
        # actual neighbor count
        vals = jnp.where(keep[None, :, :], X[:, None, :], big)  # (d,t,t)
        s = jnp.sort(vals, axis=-1)
        n = jnp.sum(keep, axis=1)  # neighbors per frame (t,)
        lo = jnp.take_along_axis(
            s, ((n - 1) // 2)[None, :, None], axis=-1
        )[..., 0]
        hi = jnp.take_along_axis(s, (n // 2)[None, :, None], axis=-1)[..., 0]
        return (0.5 * (lo + hi)).astype(REAL_DTYPE)
    raise ValueError(
        f"Unknown aggregate: '{aggregate}'. Supported: 'mean', 'median'"
    )
