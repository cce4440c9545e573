"""Framing and overlap-add as XLA-friendly chunk algebra.

TPU-first design. The reference implements framing with a strided-view /
Metal gather kernel (reference: `mlx_audio_primitives/_frame_impl.py:64-82`,
`csrc/metal/frame_signal.metal:10-36`) and overlap-add with an output-centric
gather kernel (reference: `csrc/metal/overlap_add.metal:16-55`). Neither view
striding nor cheap scatter exists on TPU, so both ops are re-derived as
*chunk algebra* that XLA tiles perfectly:

Let ``C = ceil(n_fft / hop)``. Split every frame into C hop-sized chunks.
Chunk ``c`` of frame ``f`` covers signal samples ``[(f+c)*hop, (f+c+1)*hop)``.
Therefore, with the signal viewed as hop-sized rows ``rows[r] =
y[r*hop:(r+1)*hop]``:

* **framing** is C static slices of the row view concatenated on the last
  axis — no gather, no dynamic shapes;
* **overlap-add** is the exact transpose: C shifted accumulations of
  contiguous ``(F*hop)``-length vectors — no scatter, no atomics, race-free
  by construction (same property the reference gets from its output-centric
  gather, `mlx_audio_primitives/stft.py:537-547`).

Both fall back to a gather / fori_loop formulation when C is large (tiny
hops) to bound unrolled-graph size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# Above this many chunks (n_fft/hop ratio) switch from unrolled slices to
# gather/fori_loop to keep compiled graphs small (hop=1 would unroll n_fft ops).
_MAX_UNROLLED_CHUNKS = 64


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def num_frames(signal_length: int, frame_length: int, hop_length: int) -> int:
    """Number of full frames: ``1 + (L - frame) // hop`` (reference:
    `mlx_audio_primitives/_frame_impl.py:61`)."""
    return 1 + (signal_length - frame_length) // hop_length


def frame_signal_batched(
    y: jax.Array, frame_length: int, hop_length: int
) -> jax.Array:
    """Frame ``(B, L)`` -> ``(B, F, frame_length)`` with F full frames.

    Equivalent of the reference's ``frame_signal_batched``
    (`mlx_audio_primitives/_frame_impl.py:18-82`), redesigned as chunk
    slices instead of strided views.
    """
    B, L = y.shape
    if L < frame_length:
        raise ValueError(
            f"signal length ({L}) must be >= frame_length ({frame_length})"
        )
    F = num_frames(L, frame_length, hop_length)
    C = cdiv(frame_length, hop_length)
    if C <= _MAX_UNROLLED_CHUNKS:
        total = (F + C) * hop_length
        y_ext = jnp.pad(y, ((0, 0), (0, total - L)))
        rows = y_ext.reshape(B, F + C, hop_length)
        chunks = [lax.slice_in_dim(rows, c, c + F, axis=1) for c in range(C)]
        frames = jnp.concatenate(chunks, axis=-1)
        if frames.shape[-1] != frame_length:
            frames = frames[:, :, :frame_length]
        return frames
    # Small-hop fallback: gather WHOLE ROWS of the (F+C, hop) view instead
    # of single elements — idx[f, c] = f + c picks hop-wide contiguous rows,
    # which vectorizes on the lane axis (measured 29–157× over the element
    # gather idx[f, s] = f*hop + s at hop 7–31 on v5e). For hop < 8 a row is
    # narrower than a sublane and the win vanishes, so group k = ceil(8/hop)
    # hops per row and run k shifted sub-gathers (frame f = q*k + r starts
    # at q*(k*hop) + r*hop: sub-problem r frames the signal shifted by
    # r*hop with hop' = k*hop), interleaving the results.
    k = cdiv(8, hop_length)
    if k == 1:
        total = (F + C) * hop_length
        y_ext = jnp.pad(y, ((0, 0), (0, total - L)))
        rows = y_ext.reshape(B, F + C, hop_length)
        idx = (
            jnp.arange(F, dtype=jnp.int32)[:, None]
            + jnp.arange(C, dtype=jnp.int32)[None, :]
        )
        frames = rows[:, idx].reshape(B, F, C * hop_length)
        if C * hop_length != frame_length:
            frames = frames[:, :, :frame_length]
        return frames
    hop2 = k * hop_length
    Fq = cdiv(F, k)
    C2 = cdiv(frame_length, hop2)
    need = (Fq + C2) * hop2
    y_ext = jnp.pad(y, ((0, 0), (0, max(0, (k - 1) * hop_length + need - L))))
    idx = (
        jnp.arange(Fq, dtype=jnp.int32)[:, None]
        + jnp.arange(C2, dtype=jnp.int32)[None, :]
    )
    subs = []
    for r in range(k):
        rows = lax.slice_in_dim(
            y_ext, r * hop_length, r * hop_length + need, axis=1
        ).reshape(B, Fq + C2, hop2)
        subs.append(rows[:, idx].reshape(B, Fq, C2 * hop2)[:, :, :frame_length])
    frames = jnp.stack(subs, axis=2).reshape(B, Fq * k, frame_length)
    return frames[:, :F]


def overlap_add(fw: jax.Array, hop_length: int, output_length: int) -> jax.Array:
    """Overlap-add ``(B, F, n_fft)`` windowed frames -> ``(B, output_length)``.

    Transpose of :func:`frame_signal_batched`'s chunk decomposition; the
    TPU-native replacement for the reference's fused Metal overlap-add kernel
    (`csrc/metal/overlap_add.metal:16-55`). No scatter: chunk ``c`` of all
    frames forms one contiguous ``(B, F*hop)`` vector added at offset
    ``c*hop``.
    """
    B, F, n_fft = fw.shape
    C = cdiv(n_fft, hop_length)
    pad_cols = C * hop_length - n_fft
    if pad_cols:
        fw = jnp.pad(fw, ((0, 0), (0, 0), (0, pad_cols)))
    chunks = fw.reshape(B, F, C, hop_length)
    total = (F + C) * hop_length
    span = F * hop_length

    if C <= _MAX_UNROLLED_CHUNKS:
        out = jnp.zeros((B, total), dtype=fw.dtype)
        for c in range(C):
            flat = chunks[:, :, c, :].reshape(B, span)
            out = lax.dynamic_update_slice(
                out,
                lax.dynamic_slice(out, (0, c * hop_length), (B, span)) + flat,
                (0, c * hop_length),
            )
    else:

        def body(c, out):
            flat = lax.dynamic_slice(
                chunks, (0, 0, c, 0), (B, F, 1, hop_length)
            ).reshape(B, span)
            start = c * hop_length
            cur = lax.dynamic_slice(out, (0, start), (B, span))
            return lax.dynamic_update_slice(out, cur + flat, (0, start))

        out = lax.fori_loop(0, C, body, jnp.zeros((B, total), dtype=fw.dtype))

    if output_length <= total:
        return out[:, :output_length]
    return jnp.pad(out, ((0, 0), (0, output_length - total)))


def window_envelope(
    win: jax.Array, n_frames: int, hop_length: int, output_length: int
) -> jax.Array:
    """Sum of squared windows at every output sample (NOLA denominator).

    Equivalent of the ``win_sq`` accumulation inside the reference's fused
    overlap-add kernel (`csrc/metal/overlap_add.metal:36-54`), computed once
    per (window, n_frames, hop) as a 1-D envelope.
    """
    sq = (win * win)[None, None, :]
    tiled = jnp.broadcast_to(sq, (1, n_frames, win.shape[0]))
    return overlap_add(tiled, hop_length, output_length)[0]
