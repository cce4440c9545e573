"""Time-axis (sequence-parallel) sharding for STFT-family ops.

The reference scales long signals only within one device (SURVEY.md §5.7);
its docs list streaming/chunked processing as future work
(reference `ARCHITECTURE.md:536-540`). This module is the TPU-native
realization of that direction: shard the *sample axis* of a long signal over
a mesh axis and exchange exactly the ``n_fft - hop`` halo samples that couple
neighboring shards — the context-parallel analog for frame-local DSP.

Design (all inside ``shard_map`` over a ``(data, time)`` mesh):

* forward (STFT/mel): each time-shard holds ``L_s`` samples with
  ``hop | L_s``; frames *starting* in a shard belong to it (``F_s = L_s/hop``
  frames each, uniform), and each shard fetches the next shard's first
  ``n_fft - hop`` samples with one ``lax.ppermute`` (the last shard gets
  zeros). Output frames are sharded over 'time' with no further comms.
* inverse (ISTFT): each shard overlap-adds its own frames into a local
  buffer of ``L_s + halo``; the tail spills into the next shard's territory,
  so one reverse ``ppermute`` carries it right and it is added on. The
  squared-window envelope follows the same halo algebra, then normalization
  is purely local.

Two semantic modes:

* ``center=False`` (raw grid): equivalent to the single-device ops with
  ``center=False`` on a signal zero-padded to ``T * L_s`` samples, computing
  the full ``T * F_s`` frame grid (trailing frames read zero-padding).
  Requires ``t_size | L`` and ``hop | L_s``.
* ``center=True`` (librosa drop-in): the wrapper pads globally
  (``n_fft//2`` each side with ``pad_mode``, like `ops/stft.py`), extends to
  a shardable length with zeros that no *kept* frame ever reads, computes
  the full grid, and trims to librosa's ``1 + L//hop`` frames — bitwise the
  same frames as the single-device op, for ANY signal length. The inverse
  overlap-adds raw (un-normalized) shards and divides by the exact global
  envelope outside the ``shard_map``, so reconstruction equals single-device
  ``istft`` everywhere including the edges.

Per-shard transform (``fft_mode``): 'matmul' (DFT-GEMM, default), 'fft'
(XLA FFT), or 'pallas' — the fused radix kernels (`kernels/stft_radix.py`,
`kernels/istft_fused.py`, `kernels/mel_fused.py`) dispatching INSIDE the
shard_map body, one kernel per shard, with the halo exchange outside.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .._config import MATMUL_PRECISION, REAL_DTYPE, WINDOW_SUM_EPSILON
from ..kernels.block_policy import round_up
from ..kernels.dft import forward_basis, inverse_basis
from ..ops._frames import cdiv, frame_signal_batched, overlap_add, window_envelope
from ..ops.mel import mel_filterbank
from ..ops.stft import _get_padded_window
from .mesh import DATA_AXIS, TIME_AXIS

ArrayLike = Any


def _right_halo(y_local: jax.Array, halo: int, t_size: int) -> jax.Array:
    """Fetch the next time-shard's first ``halo`` samples (zeros at the end)."""
    if halo == 0:
        return y_local[:, :0]
    # shard k receives shard k+1's head: send my head to my LEFT neighbor.
    perm = [(k, (k - 1) % t_size) for k in range(t_size)]
    head = lax.ppermute(y_local[:, :halo], TIME_AXIS, perm=perm)
    t_idx = lax.axis_index(TIME_AXIS)
    return jnp.where(t_idx == t_size - 1, jnp.zeros_like(head), head)


def _local_ri(ext, win, basis, n_fft, hop_length):
    """Shard-local frame -> window -> DFT-GEMM over the halo-extended signal.

    Returns the stacked real|imag spectrum ``(B_l, F_l, 2*n_bins)``.
    """
    frames = frame_signal_batched(ext, n_fft, hop_length) * win
    return jnp.matmul(frames, basis, precision=MATMUL_PRECISION)


def _resolve_sharded_mode(fft_mode: str, kernel_ok: bool) -> str:
    """Per-shard transform selection: 'matmul' (DFT-GEMM, the default),
    'fft' (XLA FFT), or 'pallas' (the fused radix kernels running INSIDE the
    shard_map body — each shard dispatches one fused kernel over its local
    samples). 'pallas' falls back to 'fft' where the radix gates fail, the
    same graceful contract as the single-device dispatch."""
    if fft_mode not in ("matmul", "fft", "pallas"):
        raise ValueError(
            f"fft_mode must be 'matmul', 'fft' or 'pallas', got {fft_mode}"
        )
    if fft_mode == "pallas" and not kernel_ok:
        return "fft"
    return fft_mode


def _check_shardable(L: int, n_fft: int, hop_length: int, t_size: int) -> int:
    if L % t_size != 0:
        raise ValueError(f"signal length {L} must divide over {t_size} time shards")
    L_s = L // t_size
    if L_s % hop_length != 0:
        raise ValueError(
            f"per-shard length {L_s} must be a multiple of hop_length {hop_length}"
        )
    if n_fft - hop_length > L_s:
        raise ValueError(
            f"halo (n_fft-hop = {n_fft - hop_length}) exceeds shard length {L_s}; "
            "use fewer time shards"
        )
    return L_s


def _centered_layout(L: int, n_fft: int, hop_length: int, t_size: int):
    """Frame/padding geometry for the librosa ``center=True`` drop-in mode.

    Returns ``(pad, F, F_pad, L_total)`` where ``F`` is librosa's frame count
    ``1 + (L + 2*pad - n_fft)//hop`` and ``L_total = F_pad * hop`` extends the
    padded signal so (a) each shard owns ``L_total/t_size`` samples (a
    multiple of hop), and (b) every *kept* frame reads only real (librosa-
    padded) samples: max read index ``(F-1)*hop + n_fft - 1 <= L + 2*pad - 1
    <= L_total - 1``, so the trailing zero extension and the last shard's
    zero halo are touched by discarded frames only.
    """
    pad = n_fft // 2
    F = 1 + (L + 2 * pad - n_fft) // hop_length
    F_min = max(F, cdiv(L + 2 * pad, hop_length))
    F_pad = round_up(F_min, t_size)
    L_total = F_pad * hop_length
    L_s = L_total // t_size
    if n_fft - hop_length > L_s:
        raise ValueError(
            f"halo (n_fft-hop = {n_fft - hop_length}) exceeds shard length {L_s}; "
            "use fewer time shards or a longer signal"
        )
    return pad, F, F_pad, L_total


def _pad_centered(y: jax.Array, pad: int, L_total: int, pad_mode: str) -> jax.Array:
    """librosa center pad (``pad_mode``) + zero-extend to ``L_total`` samples."""
    L = y.shape[1]
    yp = jnp.pad(y, ((0, 0), (pad, pad)), mode=pad_mode)
    return jnp.pad(yp, ((0, 0), (0, L_total - (L + 2 * pad))))


def stft_time_sharded(
    y: ArrayLike,
    mesh: Mesh,
    n_fft: int = 2048,
    hop_length: int | None = None,
    win_length: int | None = None,
    window: str | ArrayLike = "hann",
    center: bool = False,
    pad_mode: str = "constant",
    fft_mode: str = "matmul",
) -> jax.Array:
    """STFT of ``(batch, samples)`` sharded (data, time) -> complex
    ``(batch, n_frames, n_bins)`` sharded (data, time, -).

    NOTE the FRAMES-MAJOR layout: the sharded ops put frames on axis 1 (the
    'time'-sharded axis must lead the replicated bins), unlike the
    bins-major ``(n_bins, n_frames)`` librosa convention of the
    single-device ops — swap axes 1/2 when crossing between the two APIs.

    ``center=False``: ``n_frames = samples/hop`` (full frame grid; see module
    docstring). ``center=True``: librosa frame semantics — any signal
    length, ``n_frames = 1 + samples//hop``, frames identical to
    ``ops.stft.stft``.
    """
    from ..ops.stft import _validate_stft_params

    if hop_length is None:
        hop_length = n_fft // 4
    if win_length is None:
        win_length = n_fft
    _validate_stft_params(n_fft, hop_length, win_length, pad_mode)
    y = jnp.asarray(y, dtype=REAL_DTYPE)
    B, L = y.shape
    t_size = mesh.shape[TIME_AXIS]
    if center:
        pad, F, F_pad, L_total = _centered_layout(L, n_fft, hop_length, t_size)
        y = _pad_centered(y, pad, L_total, pad_mode)
    else:
        F = None
        _check_shardable(L, n_fft, hop_length, t_size)
    halo = n_fft - hop_length
    win = _get_padded_window(window, win_length, n_fft)
    from ..kernels.stft_radix import stft_radix_supported

    mode = _resolve_sharded_mode(
        fft_mode, stft_radix_supported(n_fft, hop_length)
    )
    basis = (
        forward_basis(n_fft)
        if mode == "matmul"
        else jnp.zeros((0,), dtype=REAL_DTYPE)  # unused placeholder
    )
    n_bins = n_fft // 2 + 1

    def body(y_local, win_, basis_):
        ext = jnp.concatenate(
            [y_local, _right_halo(y_local, halo, t_size)], axis=1
        )
        if mode == "matmul":
            ri = _local_ri(ext, win_, basis_, n_fft, hop_length)
            return lax.complex(ri[..., :n_bins], ri[..., n_bins:])
        if mode == "pallas":
            # one fused radix kernel per shard over the halo-extended local
            # samples; frame grid is exactly F_s = L_s/hop (center=False)
            from ..kernels.stft_radix import stft_pallas

            out = stft_pallas(ext, win_, n_fft=n_fft, hop_length=hop_length,
                              center=False, pad_mode="constant")
            return jnp.swapaxes(out, 1, 2)
        return jnp.fft.rfft(frame_signal_batched(ext, n_fft, hop_length) * win_,
                            axis=-1)

    out = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, TIME_AXIS), P(), P()),
        out_specs=P(DATA_AXIS, TIME_AXIS, None),
        # pallas_call out_shapes carry no varying-mesh-axes metadata
        check_vma=(mode != "pallas"),
    )(y, win, basis)
    return out if F is None else out[:, :F]


def istft_time_sharded(
    S: ArrayLike,
    mesh: Mesh,
    n_fft: int,
    hop_length: int | None = None,
    win_length: int | None = None,
    window: str | ArrayLike = "hann",
    center: bool = False,
    length: int | None = None,
    fft_mode: str = "matmul",
) -> jax.Array:
    """Inverse of :func:`stft_time_sharded`.

    Input is FRAMES-MAJOR ``(B, F, bins)`` — the layout
    :func:`stft_time_sharded` emits — not the bins-major librosa layout of
    the single-device ops (swap axes 1/2 when crossing APIs).

    ``center=False``: frames sharded (data, time, -) ->
    signal ``(B, F*hop)`` sharded (data, time); per-shard local envelope
    normalization. ``center=True``: librosa-equal reconstruction —
    overlap-adds raw shards and normalizes by the exact global envelope,
    then trims the center pad, equal to single-device ``istft`` everywhere
    (edges included); ``length`` crops/zero-pads like the single-device op.
    """
    from ..ops.stft import _validate_stft_params

    if hop_length is None:
        hop_length = n_fft // 4
    if win_length is None:
        win_length = n_fft
    _validate_stft_params(n_fft, hop_length, win_length, "constant")
    S = jnp.asarray(S)
    t_size = mesh.shape[TIME_AXIS]
    F = S.shape[1]
    halo = n_fft - hop_length
    C = cdiv(n_fft, hop_length)
    if center:
        # pad zero frames so every real frame's spill stays inside the
        # sharded domain: F*hop + halo <= F_pad*hop  <=>  F_pad >= F + C - 1
        F_pad = round_up(F + C - 1, t_size)
        S = jnp.pad(S, ((0, 0), (0, F_pad - F), (0, 0)))
        F_work = F_pad
    else:
        if F % t_size != 0:
            raise ValueError(f"frame count {F} must divide over {t_size} time shards")
        F_work = F
    F_s = F_work // t_size
    L_s = F_s * hop_length
    if halo > L_s:
        raise ValueError("halo exceeds shard length; use fewer time shards")
    win = _get_padded_window(window, win_length, n_fft)
    from ..kernels.istft_fused import istft_fused_supported

    mode = _resolve_sharded_mode(
        fft_mode, istft_fused_supported(n_fft, hop_length)
    )
    basis = (
        inverse_basis(n_fft)
        if mode == "matmul"
        else jnp.zeros((0,), dtype=REAL_DTYPE)
    )
    normalize_local = not center

    def body(S_local, win_, basis_):
        if mode == "pallas":
            # one fully fused inverse kernel per shard (inverse transform +
            # window + overlap-add); env=1 defers normalization to the
            # existing halo-aware logic below
            from ..kernels.istft_fused import istft_pallas

            local = istft_pallas(
                S_local, win_, jnp.ones((L_s + halo,), REAL_DTYPE),
                n_fft=n_fft, hop_length=hop_length,
                padded_length=L_s + halo,
            )
        else:
            if mode == "matmul":
                stacked = jnp.concatenate(
                    [jnp.real(S_local), jnp.imag(S_local)], axis=-1
                )
                frames = jnp.matmul(stacked, basis_, precision=MATMUL_PRECISION)
            else:
                frames = jnp.fft.irfft(S_local, n=n_fft, axis=-1)
            fw = frames.astype(REAL_DTYPE) * win_
            local = overlap_add(fw, hop_length, L_s + halo)  # tail spills right

        # carry my tail to the right neighbor (first shard receives zeros)
        perm = [(k, (k + 1) % t_size) for k in range(t_size)]
        t_idx = lax.axis_index(TIME_AXIS)
        tail = lax.ppermute(local[:, L_s:], TIME_AXIS, perm=perm)
        tail = jnp.where(t_idx == 0, jnp.zeros_like(tail), tail)
        y_local = local[:, :L_s].at[:, :halo].add(tail)
        if not normalize_local:
            return y_local

        env = window_envelope(win_, F_s, hop_length, L_s + halo)
        # env is identical on every shard (same window, same F_s), so the
        # neighbor's env-tail equals our own — only a first-shard mask needed.
        env_head_add = jnp.where(t_idx == 0, jnp.zeros_like(env[L_s:]), env[L_s:])
        env_local = env[:L_s].at[:halo].add(env_head_add)
        return y_local / jnp.maximum(env_local, WINDOW_SUM_EPSILON)

    raw = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, TIME_AXIS, None), P(), P()),
        out_specs=P(DATA_AXIS, TIME_AXIS),
        check_vma=(mode != "pallas"),
    )(S, win, basis)
    if not center:
        if length is None:
            return raw
        # same crop/pad contract as the single-device op (reference
        # `stft.py:314-338`): crop to `length`, zero-pad if longer
        out = raw[:, : min(length, raw.shape[1])]
        if length > raw.shape[1]:
            out = jnp.pad(out, ((0, 0), (0, length - raw.shape[1])))
        return out

    # global normalization + librosa center trim (outside the shard_map:
    # elementwise, XLA shards it with no extra collectives). For string/
    # tuple windows the clamped envelope comes from the cached host-f64
    # table (`ops/stft._istft_envelope_table`) — recomputing it as a traced
    # overlap-add would roughly double the OLA work per call.
    from ..ops.stft import _istft_envelope_table, _window_key

    total = n_fft + (F - 1) * hop_length
    wkey = _window_key(window)
    if wkey is not None:
        env = _istft_envelope_table(wkey, win_length, n_fft, F, hop_length,
                                    total)
    else:
        env = jnp.maximum(
            window_envelope(win, F, hop_length, total), WINDOW_SUM_EPSILON
        )
    y_full = raw[:, :total] / env
    pad = n_fft // 2
    out_len = total - 2 * pad if length is None else length
    avail = total - pad  # samples available after the left trim
    out = y_full[:, pad : pad + min(out_len, avail)]
    if out_len > avail:
        out = jnp.pad(out, ((0, 0), (0, out_len - avail)))
    return out


def logmel_time_sharded(
    y: ArrayLike,
    mesh: Mesh,
    sr: int = 22050,
    n_fft: int = 2048,
    hop_length: int | None = None,
    win_length: int | None = None,
    n_mels: int = 128,
    window: str | ArrayLike = "hann",
    center: bool = False,
    pad_mode: str = "constant",
    fft_mode: str = "matmul",
) -> jax.Array:
    """Fused log-mel frontend, dp x sp sharded: ``(B, L)`` (data, time) ->
    ``(B, F, n_mels)`` (data, time, -). Power mel in dB without top_db clip
    (the global max would need a collective; the training frontend does not
    clip). ``center=True`` gives librosa frame semantics (any length)."""
    from ..ops.stft import _validate_stft_params

    if hop_length is None:
        hop_length = n_fft // 4
    if win_length is None:
        win_length = n_fft
    _validate_stft_params(n_fft, hop_length, win_length, pad_mode)
    y = jnp.asarray(y, dtype=REAL_DTYPE)
    B, L = y.shape
    t_size = mesh.shape[TIME_AXIS]
    if center:
        pad, F, F_pad, L_total = _centered_layout(L, n_fft, hop_length, t_size)
        y = _pad_centered(y, pad, L_total, pad_mode)
    else:
        F = None
        _check_shardable(L, n_fft, hop_length, t_size)
    halo = n_fft - hop_length
    win = _get_padded_window(window, win_length, n_fft)
    from ..kernels.mel_fused import radix_supported

    mode = _resolve_sharded_mode(
        fft_mode, radix_supported(n_fft, hop_length, n_mels)
    )
    basis = (
        forward_basis(n_fft)
        if mode == "matmul"
        else jnp.zeros((0,), dtype=REAL_DTYPE)
    )
    fb_t = mel_filterbank(sr, n_fft, n_mels=n_mels).T
    n_bins = n_fft // 2 + 1

    from ..ops.convert import power_to_db

    def body(y_local, win_, basis_, fb_):
        ext = jnp.concatenate(
            [y_local, _right_halo(y_local, halo, t_size)], axis=1
        )
        if mode == "matmul":
            ri = _local_ri(ext, win_, basis_, n_fft, hop_length)
            pow2 = ri[..., :n_bins] ** 2 + ri[..., n_bins:] ** 2
            mel = jnp.matmul(pow2, fb_, precision=MATMUL_PRECISION)
        elif mode == "pallas":
            # the whole per-shard pipeline (frame, window, DFT, |.|^2, mel
            # GEMM) is ONE fused kernel dispatch
            from ..kernels.mel_fused import melspectrogram_pallas

            mel = jnp.swapaxes(
                melspectrogram_pallas(
                    ext, win_, fb_, n_fft=n_fft, hop_length=hop_length,
                    center=False, pad_mode="constant",
                ), 1, 2,
            )
        else:
            spec = jnp.fft.rfft(
                frame_signal_batched(ext, n_fft, hop_length) * win_, axis=-1
            )
            pow2 = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
            mel = jnp.matmul(pow2, fb_, precision=MATMUL_PRECISION)
        return power_to_db(mel, top_db=None)

    out = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, TIME_AXIS), P(), P(), P()),
        out_specs=P(DATA_AXIS, TIME_AXIS, None),
        check_vma=(mode != "pallas"),
    )(y, win, basis, fb_t)
    return out if F is None else out[:, :F]
