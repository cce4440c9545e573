"""Per-channel energy normalization (PCEN).

Beyond-parity feature (librosa.pcen is the semantic model: Wang et al.,
"Trainable Frontend For Robust and Far-Field Keyword Spotting", ICASSP
2017). PCEN replaces log compression in production keyword-spotting /
far-field frontends: an adaptive gain control (the running one-pole
smoother) followed by root compression.

TPU-native design: the time smoother is the sequential heart —
``M[t] = (1-b) M[t-1] + b S[t]`` — which librosa delegates to
``scipy.signal.lfilter`` on the host. Here it runs as a first-order
linear **associative scan** (``jax.lax.associative_scan`` over
(coefficient, value) pairs), i.e. O(log F) depth fully on device, batched
over every leading axis. The scipy ``zi``/``zf`` state convention is
preserved exactly so streaming chunk chains reproduce the offline result
(the same contract as :func:`~.framing.preemphasis`).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .._config import REAL_DTYPE
from ..utils.validation import validate_positive

ArrayLike = Any


@partial(jax.jit, static_argnames=("gain", "bias", "power", "eps", "b",
                                   "max_size", "return_zf"))
def _pcen_core(
    S: jax.Array,
    zi: jax.Array | None,
    *,
    gain: float,
    bias: float,
    power: float,
    eps: float,
    b: float,
    max_size: int,
    return_zf: bool,
):
    S = S.astype(REAL_DTYPE)
    ref = S
    if max_size > 1:
        # frequency-axis max filter (librosa max_size semantics via
        # scipy.ndimage.maximum_filter1d, origin=0): for even sizes the
        # window is LEFT-biased — the extra element sits before the
        # center — so pad_lo = max_size//2, not (max_size-1)//2.
        pad_lo = max_size // 2
        pad_hi = max_size - 1 - pad_lo
        ref = jax.lax.reduce_window(
            S,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=(1,) * (S.ndim - 2) + (max_size, 1),
            window_strides=(1,) * S.ndim,
            padding=((0, 0),) * (S.ndim - 2) + ((pad_lo, pad_hi), (0, 0)),
        )

    c = 1.0 - b
    F = ref.shape[-1]
    # first-order linear recurrence M[t] = c_t * M[t-1] + d_t as an
    # associative scan on pairs (c_t, d_t):
    #   t = 0: scipy's zi convention  M[0] = b*ref[0] + zi
    #          (zi = None means lfilter_zi steady state (1-b)*ref[0],
    #           i.e. M[0] = ref[0])
    #   t > 0: M[t] = c*M[t-1] + b*ref[t]
    coef = jnp.full(ref.shape, c, REAL_DTYPE).at[..., 0].set(0.0)
    d = b * ref
    d0 = ref[..., 0] if zi is None else b * ref[..., 0] + zi
    d = d.at[..., 0].set(d0)

    def combine(x, y):
        cx, dx = x
        cy, dy = y
        return cx * cy, cy * dx + dy

    _, M = jax.lax.associative_scan(combine, (coef, d), axis=-1)

    smooth = (eps + M) ** (-gain)
    if power == 0.0:
        out = jnp.log1p(S * smooth)
    elif bias == 0.0:
        out = jnp.exp(power * (jnp.log(jnp.maximum(S, 0.0)) + jnp.log(smooth)))
    else:
        out = (bias**power) * jnp.expm1(
            power * jnp.log1p(S * smooth / bias)
        )
    out = out.astype(REAL_DTYPE)
    if return_zf:
        return out, (c * M[..., -1]).astype(REAL_DTYPE)
    return out


def pcen(
    S: ArrayLike,
    sr: int = 22050,
    hop_length: int = 512,
    gain: float = 0.98,
    bias: float = 2.0,
    power: float = 0.5,
    time_constant: float = 0.4,
    eps: float = 1e-6,
    b: float | None = None,
    max_size: int = 1,
    zi: ArrayLike | None = None,
    return_zf: bool = False,
):
    """PCEN of a (mel) power spectrogram ``(..., n_bands, F)``.

    librosa `pcen` semantics: a one-pole running mean ``M`` (coefficient
    ``b`` derived from ``time_constant`` seconds unless given) normalizes
    ``S`` adaptively — ``(S / (eps + M)^gain + bias)^power - bias^power``
    (log1p/expm1-stabilized; ``power=0`` selects the ``log1p`` limit).
    ``max_size > 1`` max-filters the smoother input across the frequency
    axis first.

    Streaming: ``zi`` is the scipy `lfilter` state (shape = S without the
    time axis); ``return_zf=True`` also returns the final state, and
    chunked calls chained through it are sample-exact with the offline
    result. The smoother runs as an O(log F)-depth associative scan on
    device — no host lfilter.
    """
    validate_positive(hop_length, "hop_length")
    validate_positive(sr, "sr")
    if gain < 0:
        raise ValueError(f"gain must be non-negative, got {gain}")
    if bias < 0:
        raise ValueError(f"bias must be non-negative, got {bias}")
    if power < 0:
        raise ValueError(f"power must be non-negative, got {power}")
    if eps <= 0:
        raise ValueError(f"eps must be strictly positive, got {eps}")
    if max_size < 1:
        raise ValueError(f"max_size must be at least 1, got {max_size}")
    if b is None:
        t_frames = time_constant * sr / float(hop_length)
        b = (np.sqrt(1.0 + 4.0 * t_frames**2) - 1.0) / (2.0 * t_frames**2)
    if not 0 < b <= 1:
        raise ValueError(f"b must be in (0, 1], got {b}")

    S = jnp.asarray(S, dtype=REAL_DTYPE)
    if S.ndim < 2:
        raise ValueError(
            f"pcen expects at least a 2-D (n_bands, frames) input, got "
            f"{S.ndim}-D"
        )
    if max_size > S.shape[-2]:
        raise ValueError(
            f"max_size ({max_size}) cannot exceed the frequency axis "
            f"({S.shape[-2]})"
        )
    zi_arr = None if zi is None else jnp.asarray(zi, dtype=REAL_DTYPE)
    return _pcen_core(
        S, zi_arr, gain=float(gain), bias=float(bias), power=float(power),
        eps=float(eps), b=float(b), max_size=int(max_size),
        return_zf=bool(return_zf),
    )


__all__ = ["pcen", "pcen_smoother"]


def pcen_smoother(
    ref: jax.Array, b: jax.Array, zi: jax.Array | None = None
) -> jax.Array:
    """The PCEN one-pole running mean as a first-order associative scan.

    ``M[t] = (1 - b) M[t-1] + b ref[t]`` along the last axis, with the
    scipy ``zi`` initialization convention (``zi=None`` -> lfilter_zi
    steady state, i.e. ``M[0] = ref[0]``). ``b`` may be a scalar or any
    shape broadcastable to ``ref`` minus the time axis — PER-CHANNEL
    smoothing coefficients are first-class (the trainable-frontend case,
    Wang et al. 2017), which scipy's lfilter cannot express in one call.
    Differentiable in both ``ref`` and ``b``.
    """
    b = jnp.broadcast_to(
        jnp.asarray(b, ref.dtype)[..., None], ref.shape
    )
    c = 1.0 - b
    coef = c.at[..., 0].set(0.0)
    d = b * ref
    d0 = ref[..., 0] if zi is None else d[..., 0] + zi
    d = d.at[..., 0].set(d0)

    def combine(x, y):
        cx, dx = x
        cy, dy = y
        return cx * cy, cy * dx + dy

    _, M = jax.lax.associative_scan(combine, (coef, d), axis=-1)
    return M
