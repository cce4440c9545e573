"""Fused overlap-add + normalize Pallas kernel (ISTFT reconstruction).

TPU re-design of the reference's fused Metal overlap-add kernel
(`csrc/metal/overlap_add.metal:16-55`, dispatched at
`csrc/primitives/overlap_add.cpp:13-72`): output-centric, race-free, no
atomics — each output region *gathers* every frame that covers it
(SURVEY.md §3.2 "Design note").

Formulation: view the output as hop-sized rows; row ``r`` is
``sum_{c=0}^{C-1} fw[r-c, c*hop:(c+1)*hop]`` (the transpose of the chunk
framing identity). Frames are pre-padded with ``C-1`` zero frames so every
program's DMA window is in-bounds and 8-aligned; each program stages
``RB + C - 1`` frames in VMEM, forms its RB output rows with C static
shifted adds (VPU), divides by the squared-window envelope rows, and writes
a disjoint output block — races are impossible by construction.

Arbitrary hop (reference parity: `overlap_add.metal:16-55` handles any hop):
when the chunk offset ``c*hop`` is not 128-lane aligned, the chunk is
extracted with a static lane *rotation* (``pltpu.roll``) to offset 0
followed by a width-``hop`` slice — Mosaic supports arbitrary static
rotations and offset-0 sub-lane slices, where it rejects unaligned slice
offsets. The staged frame width is padded to a 128 multiple (a VMEM-only
cost); aligned hops keep the direct-slice path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .._config import WINDOW_SUM_EPSILON
from ..utils.dispatch import pallas_interpret_mode, vma_struct
from .block_policy import LANE, SUBLANE, VMEM_BUDGET, cdiv, round_up
from .mel_fused import _double_buffered_rows

# Bound on C = ceil(n_fft/hop): each chunk is a statically-unrolled shifted
# add (and a lane rotation for unaligned hops), so tiny hops would explode
# both compile time and the staged-frame VMEM footprint. 64 matches the XLA
# chunk path's unroll bound (`ops/_frames.py::_MAX_UNROLLED_CHUNKS`).
_MAX_CHUNKS = 64


def ola_supported(n_fft: int, hop_length: int) -> bool:
    """Shapes the fused OLA kernel handles without blowing VMEM/compile time.

    Any hop is *algorithmically* supported (lane rotation); this gate bounds
    the resource envelope: C <= 64 chunks, and the minimal block config
    (CB=1, RB=8) must fit the VMEM budget.
    """
    if hop_length < 1:
        return False
    C = cdiv(n_fft, hop_length)
    if C > _MAX_CHUNKS:
        return False
    NFP = round_up(C * hop_length, LANE)
    FBk = round_up(SUBLANE + C - 1, SUBLANE)
    scratch = 2 * FBk * NFP * 4  # double-buffered input DMA
    io = 2 * SUBLANE * hop_length * 4
    return scratch + io <= VMEM_BUDGET


def _ola_kernel_factory(CB, RB, C, HOP, FBk, NFP, GJ):
    def chunk(fw_scr, c):
        # out_rows[r] = sum_c fw[r - c, c*hop:(c+1)*hop]; with the C-1 zero-
        # frame prepad, frame (r-c) sits at scratch row (r_local + C-1-c).
        rows = fw_scr[:, C - 1 - c : C - 1 - c + RB, :]
        off = c * HOP
        if off % LANE == 0:
            return rows[:, :, off : off + HOP]
        # rotate chunk start to lane 0, then a width-HOP offset-0 slice
        return pltpu.roll(rows, NFP - off, 2)[:, :, :HOP]

    def kernel(fw_hbm, env_ref, out_ref, fw_scr, sem):
        cur = _double_buffered_rows(fw_hbm, fw_scr, sem, CB, RB, FBk, GJ)

        acc = chunk(cur, 0)
        for c in range(1, C):
            acc = acc + chunk(cur, c)
        out_ref[:] = acc / env_ref[:]

    return kernel


@partial(jax.jit, static_argnames=("hop_length", "output_length"))
def overlap_add_pallas(
    fw: jax.Array,  # (B, F, n_fft) windowed frames
    env: jax.Array,  # (T_rows * hop,) squared-window envelope (>= epsilon)
    *,
    hop_length: int,
    output_length: int,
) -> jax.Array:
    """Fused OLA + envelope normalization: ``(B, F, n_fft) -> (B, output_length)``.

    ``env`` must already be clamped to the NOLA epsilon (the caller computes
    it once per (window, F, hop) — it is loop-invariant for Griffin-Lim).
    Any ``hop_length >= 1`` is supported (unaligned hops take the in-kernel
    lane-rotation path; see module docstring).
    """
    if hop_length < 1:
        raise ValueError("hop_length must be positive")
    B, F, n_fft = fw.shape
    if output_length < 1:
        # degenerate empty output (e.g. istft length=0) — match the XLA path
        return jnp.zeros((B, max(output_length, 0)), jnp.float32)
    if not ola_supported(n_fft, hop_length):
        raise ValueError(
            f"fused OLA kernel supports C = ceil(n_fft/hop) <= {_MAX_CHUNKS} "
            f"within the VMEM budget; got n_fft={n_fft}, hop={hop_length} "
            f"(C={cdiv(n_fft, hop_length)})"
        )
    def _xla_ref(fw, env):
        # pure-XLA formulation of the same op — the backward differentiates
        # this (pallas_call has no JVP rule; same contract as
        # `istft_fused.py`'s custom_vjp)
        from ..ops._frames import overlap_add

        y = overlap_add(fw, hop_length, output_length)
        e = env
        if e.shape[0] < output_length:
            e = jnp.pad(e, (0, output_length - e.shape[0]),
                        constant_values=1.0)
        return y / e[:output_length]

    @jax.custom_vjp
    def _ola(fw, env):
        return _pallas_forward(fw, env, hop_length, output_length)

    def _ola_fwd(fw, env):
        return _ola(fw, env), (fw, env)

    def _ola_bwd(res, ct):
        fw_r, env_r = res
        _, vjp = jax.vjp(_xla_ref, fw_r, env_r)
        return vjp(ct)

    _ola.defvjp(_ola_fwd, _ola_bwd)
    return _ola(fw, env)


def _pallas_forward(fw, env, hop_length, output_length):
    B, F, n_fft = fw.shape
    C = cdiv(n_fft, hop_length)
    # staged frame width: chunked extent, padded to a full lane multiple so
    # the VMEM scratch tiles cleanly (Mosaic rejects ragged minormost dims)
    NFP = round_up(C * hop_length, LANE)
    if NFP != n_fft:
        fw = jnp.pad(fw, ((0, 0), (0, 0), (0, NFP - n_fft)))

    RT = cdiv(output_length, hop_length)  # output rows needed
    RB = min(round_up(RT, SUBLANE), 64)
    # shrink the row block until the staged frames + IO blocks fit VMEM
    while RB > SUBLANE:
        FBk = round_up(RB + C - 1, SUBLANE)
        if 2 * FBk * NFP * 4 + 2 * RB * hop_length * 4 <= VMEM_BUDGET:
            break
        RB -= SUBLANE
    RT_pad = round_up(RT, RB)
    FBk = round_up(RB + C - 1, SUBLANE)

    # frames starting at/after output_length contribute nothing: row r only
    # reads frames f <= r, so at most RT_pad frames matter (prevents a
    # negative pad when F exceeds the requested output span)
    if F > RT_pad:
        fw = fw[:, :RT_pad, :]
        F = RT_pad

    # prepad C-1 zero frames; extend so every DMA window is in bounds
    NF = RT_pad + FBk
    fw_p = jnp.pad(fw, ((0, 0), (C - 1, NF - F - (C - 1)), (0, 0)))

    env_rows = jnp.pad(env, (0, RT_pad * hop_length - env.shape[0]),
                       constant_values=1.0).reshape(RT_pad, hop_length)

    # largest clip block whose scratch + output block fits the VMEM budget
    CB = 1
    for cand in (8, 4, 2, 1):
        if B % cand:
            continue
        if cand * (2 * FBk * NFP + RB * hop_length) * 4 <= VMEM_BUDGET:
            CB = cand
            break

    out = pl.pallas_call(
        _ola_kernel_factory(CB, RB, C, hop_length, FBk, NFP, RT_pad // RB),
        out_shape=vma_struct((B, RT_pad, hop_length), jnp.float32, fw_p),
        grid=(B // CB, RT_pad // RB),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((RB, hop_length), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (CB, RB, hop_length), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, CB, FBk, NFP), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=pallas_interpret_mode(),
    )(fw_p, env_rows)
    return out.reshape(B, RT_pad * hop_length)[:, :output_length]


def envelope_for_ola(win: jax.Array, n_frames: int, hop_length: int,
                     output_length: int) -> jax.Array:
    """Clamped squared-window envelope sized for :func:`overlap_add_pallas`."""
    from ..ops._frames import window_envelope

    env = window_envelope(win, n_frames, hop_length, output_length)
    return jnp.maximum(env, WINDOW_SUM_EPSILON)
