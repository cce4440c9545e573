"""Array utilities: normalize, local extrema, peak picking, length fixing.

The `librosa.util` workhorses, on-device where they are array math
(normalize / localmax / localmin / fix_length / zero_crossings — all
jit-friendly elementwise/reduction programs) and host-boundary where the
output is a ragged event list (`peak_pick`, which reuses the vectorized
mask kernel behind :func:`~.onset.onset_detect`).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .._config import REAL_DTYPE

ArrayLike = Any


def normalize(
    S: ArrayLike,
    norm: float | None = np.inf,
    axis: int | None = 0,
    threshold: float | None = None,
    fill: bool | None = None,
) -> jax.Array:
    """Scale an array to unit norm along ``axis`` (librosa
    `util.normalize` semantics).

    ``norm``: inf (max-abs), -inf (min-abs), 0 (L0 / count), any p > 0
    (Lp), or None (no-op). Slices whose norm falls below ``threshold``
    (default: the dtype's tiny) are left as-is (``fill=None``), zeroed
    (``fill=False``), or set to the uniform unit-norm vector
    (``fill=True``; undefined for norm=0).
    """
    x = jnp.asarray(S, dtype=REAL_DTYPE)
    if norm is None:
        return x
    mag = jnp.abs(x)
    if np.isinf(norm):
        if norm > 0:
            length = jnp.max(mag, axis=axis, keepdims=True)
        else:
            length = jnp.min(mag, axis=axis, keepdims=True)
        fill_norm = 1.0
    elif norm == 0:
        if fill is True:
            raise ValueError("Cannot normalize with norm=0 and fill=True")
        length = jnp.sum(mag > 0, axis=axis, keepdims=True).astype(REAL_DTYPE)
        fill_norm = 1.0
    elif norm > 0:
        length = jnp.sum(mag**norm, axis=axis, keepdims=True) ** (1.0 / norm)
        n = x.shape[axis] if axis is not None else x.size
        fill_norm = n ** (-1.0 / norm)
    else:
        raise ValueError(f"Unsupported norm: {norm}")
    if threshold is None:
        threshold = float(np.finfo(np.float32).tiny)
    elif threshold <= 0:
        raise ValueError(f"threshold must be positive, got {threshold}")
    small = length < threshold
    out = x / jnp.where(small, 1.0, length)
    if fill is None:
        out = jnp.where(small, x, out)
    elif fill:
        out = jnp.where(small, jnp.asarray(fill_norm, REAL_DTYPE), out)
    else:
        out = jnp.where(small, 0.0, out)
    return out.astype(REAL_DTYPE)


def localmax(x: ArrayLike, axis: int = 0) -> jax.Array:
    """Boolean mask of local maxima along ``axis`` (librosa
    `util.localmax`: strictly above the previous element, >= the next,
    edge-padded — so ``x[0]`` is never a max and ``x[-1]`` is one when it
    beats its predecessor)."""
    x = jnp.asarray(x)
    x = jnp.moveaxis(x, axis, -1)
    pad = [(0, 0)] * (x.ndim - 1) + [(1, 1)]
    xp = jnp.pad(x, pad, mode="edge")
    out = (x > xp[..., :-2]) & (x >= xp[..., 2:])
    return jnp.moveaxis(out, -1, axis)


def localmin(x: ArrayLike, axis: int = 0) -> jax.Array:
    """Boolean mask of local minima (mirror of :func:`localmax`:
    strictly below the previous element, <= the next)."""
    x = jnp.asarray(x)
    x = jnp.moveaxis(x, axis, -1)
    pad = [(0, 0)] * (x.ndim - 1) + [(1, 1)]
    xp = jnp.pad(x, pad, mode="edge")
    out = (x < xp[..., :-2]) & (x <= xp[..., 2:])
    return jnp.moveaxis(out, -1, axis)


def peak_pick(
    x: ArrayLike,
    pre_max: int,
    post_max: int,
    pre_avg: int,
    post_avg: int,
    delta: float,
    wait: int,
) -> np.ndarray:
    """Indices of picked peaks in a 1-D signal (librosa `util.peak_pick`
    semantics): ``x[n]`` must equal the max over ``[n-pre_max,
    n+post_max)``, exceed the mean over ``[n-pre_avg, n+post_avg)`` by
    ``delta``, and sit more than ``wait`` samples after the previously
    accepted peak. The five conditions run as the same vectorized jitted
    mask :func:`~.onset.onset_detect` uses; only the ragged index list is
    host-side."""
    from .onset import _peak_pick_mask

    x = jnp.asarray(x, dtype=REAL_DTYPE)
    if x.ndim != 1:
        raise ValueError(f"peak_pick expects a 1-D signal, got {x.ndim}-D")
    for name, v in [("pre_max", pre_max), ("post_max", post_max),
                    ("pre_avg", pre_avg), ("post_avg", post_avg),
                    ("wait", wait)]:
        if v < 0:
            raise ValueError(f"{name} must be non-negative, got {v}")
    if post_max < 1 or post_avg < 1:
        raise ValueError("post_max and post_avg must be at least 1")
    if delta < 0:
        raise ValueError(f"delta must be non-negative, got {delta}")
    mask = _peak_pick_mask(
        x[None],
        pre_max=int(pre_max),
        post_max=int(post_max) - 1,  # librosa slices are post-EXCLUSIVE
        pre_avg=int(pre_avg),
        post_avg=int(post_avg) - 1,
        delta=float(delta),
        wait=int(wait),
    )[0]
    return np.flatnonzero(np.asarray(mask))


def fix_length(
    data: ArrayLike, size: int, axis: int = -1, **pad_kwargs
) -> jax.Array:
    """Crop or zero-pad ``data`` to exactly ``size`` along ``axis``
    (librosa `util.fix_length`)."""
    if size < 0:
        raise ValueError(f"size must be non-negative, got {size}")
    x = jnp.asarray(data)
    n = x.shape[axis]
    if n > size:
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(size)
        return x[tuple(idx)]
    if n < size:
        pad = [(0, 0)] * x.ndim
        pad[axis % x.ndim] = (0, size - n)
        return jnp.pad(x, pad, **pad_kwargs)
    return x


def zero_crossings(
    y: ArrayLike, threshold: float = 1e-10, pad: bool = True
) -> jax.Array:
    """Boolean mask marking sign changes (librosa `util.zero_crossings`
    semantics): ``True`` where ``sign(y[i]) != sign(y[i-1])``, with
    sub-``threshold`` samples clipped to zero first; ``pad=True`` marks
    index 0."""
    y = jnp.asarray(y, dtype=REAL_DTYPE)
    if threshold and threshold > 0:
        y = jnp.where(jnp.abs(y) <= threshold, 0.0, y)
    s = jnp.signbit(y)
    cross = s[..., 1:] != s[..., :-1]
    first = jnp.full(y.shape[:-1] + (1,), bool(pad))
    return jnp.concatenate([first, cross], axis=-1)


__all__ = [
    "normalize", "localmax", "localmin", "peak_pick", "fix_length",
    "zero_crossings",
]
