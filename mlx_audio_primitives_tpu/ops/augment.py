"""Training-time augmentations: SpecAugment masking, noise, random gain.

The reference library stops at feature extraction; this module adds the
standard augmentations an audio training stack expects (torchaudio's
`TimeMasking` / `FrequencyMasking` / `AddNoise` analogs), built the JAX way:
explicit `jax.random` keys in, pure functions out, everything jit/vmap-safe
with static shapes — masks are boolean index-range comparisons, never
dynamic slices, so batches of independent masks compile to one fused
elementwise program.

Layout convention matches the library's features: ``(..., n_mels, F)`` with
frequency on ``-2`` and frames on ``-1``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from .._config import REAL_DTYPE
from ..utils.validation import validate_non_negative, validate_positive

ArrayLike = Any

__all__ = ["time_mask", "freq_mask", "spec_augment", "add_noise", "random_gain"]


def _mask_axis(
    feats: jax.Array,
    key: jax.Array,
    n_masks: int,
    mask_param: int,
    axis: int,
    mask_value: float,
) -> jax.Array:
    """Zero (or fill) ``n_masks`` random index ranges along ``axis``.

    torchaudio semantics per mask: width ``w ~ U{0..mask_param}`` and start
    ``t0 ~ U{0..size-w}``, drawn independently per mask AND per leading
    batch element. ``mask_param`` is clipped to the axis size.
    """
    size = feats.shape[axis]
    mask_param = min(mask_param, size)
    batch_shape = feats.shape[: feats.ndim - 2]  # leading dims
    kw, ks = jax.random.split(key)
    # w first, then start uniform over the w-dependent valid range
    w = jax.random.randint(
        kw, batch_shape + (n_masks,), 0, mask_param + 1
    )
    u = jax.random.uniform(ks, batch_shape + (n_masks,))
    t0 = jnp.floor(u * (size - w + 1)).astype(jnp.int32)
    idx = jnp.arange(size)
    # (..., n_masks, size) -> any over masks
    hit = (idx >= t0[..., None]) & (idx < (t0 + w)[..., None])
    hit = jnp.any(hit, axis=-2)  # (..., size)
    # broadcast onto the requested axis
    shape = [1] * feats.ndim
    for i, d in enumerate(batch_shape):
        shape[i] = d
    shape[axis] = size
    hit = hit.reshape(shape)
    return jnp.where(hit, jnp.asarray(mask_value, feats.dtype), feats)


def time_mask(
    feats: ArrayLike,
    key: jax.Array,
    mask_param: int = 20,
    n_masks: int = 1,
    mask_value: float = 0.0,
) -> jax.Array:
    """SpecAugment time masking: zero ``n_masks`` random frame ranges of
    width ``U{0..mask_param}`` per sample. ``feats`` is ``(..., n_mels, F)``;
    every leading batch element draws independent masks from ``key``."""
    validate_positive(n_masks, "n_masks")
    validate_non_negative(mask_param, "mask_param")
    feats = jnp.asarray(feats, dtype=REAL_DTYPE)
    return _mask_axis(feats, key, n_masks, mask_param, feats.ndim - 1, mask_value)


def freq_mask(
    feats: ArrayLike,
    key: jax.Array,
    mask_param: int = 10,
    n_masks: int = 1,
    mask_value: float = 0.0,
) -> jax.Array:
    """SpecAugment frequency masking: like :func:`time_mask` but over the
    mel-band axis (``-2``)."""
    validate_positive(n_masks, "n_masks")
    validate_non_negative(mask_param, "mask_param")
    feats = jnp.asarray(feats, dtype=REAL_DTYPE)
    return _mask_axis(feats, key, n_masks, mask_param, feats.ndim - 2, mask_value)


def spec_augment(
    feats: ArrayLike,
    key: jax.Array,
    n_time_masks: int = 2,
    time_mask_param: int = 20,
    n_freq_masks: int = 2,
    freq_mask_param: int = 10,
    mask_value: float = 0.0,
) -> jax.Array:
    """The standard SpecAugment recipe (Park et al. 2019, sans time warp):
    ``n_freq_masks`` frequency masks then ``n_time_masks`` time masks, all
    independent per batch element."""
    kf, kt = jax.random.split(key)
    feats = freq_mask(
        feats, kf, mask_param=freq_mask_param, n_masks=n_freq_masks,
        mask_value=mask_value,
    )
    return time_mask(
        feats, kt, mask_param=time_mask_param, n_masks=n_time_masks,
        mask_value=mask_value,
    )


def add_noise(
    y: ArrayLike,
    key: jax.Array,
    snr_db: float | ArrayLike = 20.0,
) -> jax.Array:
    """Add white Gaussian noise at a target signal-to-noise ratio.

    ``snr_db`` may be a scalar or a per-sample array broadcastable to the
    leading batch shape. The noise power is scaled to each sample's OWN
    measured power (torchaudio ``AddNoise`` semantics), so silence stays
    near-silent."""
    y = jnp.asarray(y, dtype=REAL_DTYPE)
    noise = jax.random.normal(key, y.shape, y.dtype)
    p_sig = jnp.mean(y**2, axis=-1, keepdims=True)
    p_noise = jnp.mean(noise**2, axis=-1, keepdims=True)
    snr = jnp.asarray(snr_db, y.dtype)
    snr = jnp.reshape(snr, jnp.shape(snr) + (1,) * (y.ndim - jnp.ndim(snr)))
    scale = jnp.sqrt(p_sig / (p_noise * 10.0 ** (snr / 10.0) + 1e-30))
    return y + noise * scale


def random_gain(
    y: ArrayLike,
    key: jax.Array,
    min_gain_db: float = -6.0,
    max_gain_db: float = 6.0,
) -> jax.Array:
    """Scale each batch element by an independent uniform gain in dB."""
    if min_gain_db > max_gain_db:
        raise ValueError(
            f"min_gain_db ({min_gain_db}) must be <= max_gain_db "
            f"({max_gain_db})"
        )
    y = jnp.asarray(y, dtype=REAL_DTYPE)
    batch_shape = y.shape[:-1]
    g_db = jax.random.uniform(
        key, batch_shape, minval=min_gain_db, maxval=max_gain_db
    )
    return y * (10.0 ** (g_db / 20.0))[..., None]
