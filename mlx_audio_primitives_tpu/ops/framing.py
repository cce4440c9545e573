"""Time-domain primitives: frame, rms, preemphasis, deemphasis.

Parity: `mlx_audio_primitives/framing.py:16-392`.

TPU-native improvement: ``deemphasis`` is a first-order IIR the reference
evaluates with host ``scipy.signal.lfilter`` (`framing.py:298-392`). A
first-order linear recurrence is exactly what ``jax.lax.associative_scan``
parallelizes, so the whole filter — including librosa's default-zi correction
term — runs on device in O(log n) depth.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .._config import REAL_DTYPE
from ..utils.validation import validate_positive
from ._frames import frame_signal_batched

ArrayLike = Any


def frame(
    y: ArrayLike,
    frame_length: int,
    hop_length: int,
    axis: int = -1,
) -> jax.Array:
    """Frame a signal into overlapping windows, shape ``(..., F, frame_length)``.

    Reference parity: `framing.py:16-78`.
    """
    validate_positive(frame_length, "frame_length")
    validate_positive(hop_length, "hop_length")
    if axis != -1:
        raise ValueError(f"axis must be -1, got {axis}")
    y = jnp.asarray(y, dtype=REAL_DTYPE)
    input_is_1d = y.ndim == 1
    if input_is_1d:
        y = y[None]
    frames = frame_signal_batched(y, frame_length, hop_length)
    return frames[0] if input_is_1d else frames


def rms(
    y: ArrayLike,
    frame_length: int = 2048,
    hop_length: int = 512,
    center: bool = True,
    pad_mode: str = "constant",
) -> jax.Array:
    """Root-mean-square energy per frame, shape ``(..., 1, F)``.

    Reference parity: `framing.py:81-151`.
    """
    validate_positive(frame_length, "frame_length")
    validate_positive(hop_length, "hop_length")
    y = jnp.asarray(y, dtype=REAL_DTYPE)
    input_is_1d = y.ndim == 1
    if input_is_1d:
        y = y[None]
    if center:
        pad = frame_length // 2
        if pad_mode not in ("constant", "edge"):
            raise ValueError(
                f"Unknown pad_mode: '{pad_mode}'. Supported: 'constant', 'edge'"
            )
        y = jnp.pad(y, ((0, 0), (pad, pad)), mode=pad_mode)
    frames = frame_signal_batched(y, frame_length, hop_length)
    energy = jnp.sqrt(jnp.mean(frames**2, axis=-1, keepdims=True))
    energy = jnp.swapaxes(energy, 1, 2)
    return energy[0] if input_is_1d else energy


def _normalize_zi(zi, batch_size: int) -> jax.Array:
    zi = jnp.asarray(zi, dtype=REAL_DTYPE)
    if zi.ndim == 0:
        zi = jnp.broadcast_to(zi[None, None], (batch_size, 1))
    elif zi.ndim == 1:
        if zi.shape[0] == batch_size:
            zi = zi[:, None]
        else:
            zi = jnp.broadcast_to(zi[None, :], (batch_size, 1))
    return zi


def preemphasis(
    y: ArrayLike,
    coef: float = 0.97,
    zi: ArrayLike | None = None,
    return_zf: bool = False,
    use_mlx: bool = True,  # compatibility no-op (reference `framing.py:199`)
) -> jax.Array | tuple[jax.Array, jax.Array]:
    """Pre-emphasis FIR ``out[n] = y[n] - coef*y[n-1]`` with scipy-lfilter zi
    semantics (``out[0] = y[0] + zi``; default zi = librosa's linear
    extrapolation ``2*y[0] - y[1]``). Reference parity: `framing.py:154-296`.
    """
    del use_mlx
    if not 0.0 <= coef <= 1.0:
        raise ValueError(f"coef must be in [0, 1], got {coef}")
    y = jnp.asarray(y, dtype=REAL_DTYPE)
    input_is_1d = y.ndim == 1
    if input_is_1d:
        y = y[None]
    B = y.shape[0]
    if zi is None:
        zi_arr = 2 * y[:, 0:1] - y[:, 1:2]
    else:
        zi_arr = _normalize_zi(zi, B)
    shifted = jnp.concatenate([y[:, :1], y[:, :-1]], axis=-1)
    out = y - coef * shifted
    out = jnp.concatenate([y[:, :1] + zi_arr, out[:, 1:]], axis=-1)
    # scipy lfilter final state for b=[1,-coef], a=[1]: zf = -coef*y[-1] —
    # feeding it back as the next chunk's zi continues the stream exactly
    # (the reference's librosa-exact scipy path returns the same state,
    # `framing.py:281-286`)
    zf = -coef * y[:, -1:]
    if input_is_1d:
        out, zf = out[0], zf[0]
    return (out, zf) if return_zf else out


_IIR_BLOCK = 256


@partial(jax.jit, static_argnames=("coef", "has_zi"))
def _deemphasis_core(y, zi, *, coef: float, has_zi: bool):
    """IIR ``out[n] = y[n] + coef*out[n-1]`` as a blocked scan-by-matmul.

    TPU-native trick: a first-order linear recurrence over a block of B
    samples is a lower-triangular matmul with ``L[i,j] = coef**(i-j)`` —
    one MXU contraction handles every block in parallel — and the block
    boundary states follow their own tiny recurrence handled by a short
    ``lax.scan``. (A flat ``associative_scan`` over the signal takes minutes
    to compile on TPU for odd lengths; this compiles instantly and runs at
    MXU speed.) A provided initial state adds ``zi * coef**n``
    (scipy direct-form-II-transposed zi semantics).
    """
    B, n = y.shape
    nb = -(-n // _IIR_BLOCK)
    total = nb * _IIR_BLOCK
    yp = jnp.pad(y, ((0, 0), (0, total - n)))
    blocks = yp.reshape(B, nb, _IIR_BLOCK)

    # intra-block scan: s[i] = sum_{j<=i} coef^(i-j) x[j] — one matmul
    ij = np.arange(_IIR_BLOCK)
    expo = ij[:, None] - ij[None, :]
    with np.errstate(over="ignore"):
        L = np.where(expo >= 0, float(coef) ** np.maximum(expo, 0), 0.0)
    Lt = jnp.asarray(L.T.astype(np.float32))  # (j, i) for x @ L^T
    intra = jnp.matmul(blocks, Lt, precision=jax.lax.Precision.HIGHEST)

    # boundary recurrence: h_k = coef^B h_{k-1} + intra[k, -1]
    cB = float(coef) ** _IIR_BLOCK
    cpow = jnp.asarray(
        (float(coef) ** np.arange(1, _IIR_BLOCK + 1)).astype(np.float32)
    )

    def step(h, e):
        h_new = cB * h + e
        return h_new, h
    # h_prev per block = state entering that block (0 for the first)
    _, h_prev = jax.lax.scan(
        step, jnp.zeros((B,), y.dtype), jnp.moveaxis(intra[:, :, -1], 1, 0)
    )
    h_prev = jnp.moveaxis(h_prev, 0, 1)  # (B, nb)

    out = (intra + h_prev[:, :, None] * cpow[None, None, :]).reshape(B, total)
    out = out[:, :n]

    with np.errstate(over="ignore", divide="ignore"):
        powers_np = float(coef) ** np.arange(n, dtype=np.float64)
    powers = jnp.asarray(powers_np.astype(np.float32))[None, :]
    if has_zi:
        out = out + zi * powers
        zf = coef * out[:, -1:]
    else:
        # zf comes from the raw filter state BEFORE the librosa default-zi
        # correction (matching scipy.signal.lfilter's returned state in the
        # reference, `framing.py:361-380`), so chunked continuations agree.
        zf = coef * out[:, -1:]
        corr = ((2.0 - coef) * y[:, 0:1] - y[:, 1:2]) / (3.0 - coef)
        out = out - corr * powers
    return out, zf


def deemphasis(
    y: ArrayLike,
    coef: float = 0.97,
    zi: ArrayLike | None = None,
    return_zf: bool = False,
) -> jax.Array | tuple[jax.Array, jax.Array]:
    """De-emphasis IIR (inverse of :func:`preemphasis`), fully on device.

    Reference parity: `framing.py:298-392` (scipy lfilter + closed-form
    correction for librosa's default pre-emphasis zi).
    """
    if not 0.0 <= coef <= 1.0:
        raise ValueError(f"coef must be in [0, 1], got {coef}")
    y = jnp.asarray(y, dtype=REAL_DTYPE)
    input_is_1d = y.ndim == 1
    if input_is_1d:
        y = y[None]
    B = y.shape[0]
    if zi is None:
        zi_arr = jnp.zeros((B, 1), dtype=REAL_DTYPE)
        out, zf = _deemphasis_core(y, zi_arr, coef=float(coef), has_zi=False)
    else:
        zi_arr = _normalize_zi(zi, B)
        out, zf = _deemphasis_core(y, zi_arr, coef=float(coef), has_zi=True)
    if input_is_1d:
        out, zf = out[0], zf[0]
    return (out, zf) if return_zf else out
