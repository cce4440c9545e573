"""Fully fused ISTFT Pallas kernel: spectrum -> normalized signal.

One kernel runs the inverse radix-decimated DFT, the synthesis-window
multiply, the output-centric overlap-add, and the squared-window envelope
normalization — time-domain frames never exist in HBM. This completes the
kernel trio (fused STFT `stft_radix.py`, fused mel `mel_fused.py`, fused OLA
`overlap_add.py`); reference analog: the fused Metal overlap-add kernel plus
the irfft it feeds (`csrc/metal/overlap_add.metal:16-55`, `stft.py:292-312`).

Inverse decimation (exact mirror of the forward kernel; verified to 1e-13
against numpy.fft on the host):

* groups: natural bin ``k = r + C*r' + C*R2*j`` with class ``r <= C/2``;
  bins beyond ``n_bins`` are conjugate mirrors ``conj(X[N-k])`` — a static
  XLA gather (`stft_radix.py::group_spectrum`) builds the ``(B, F, 2*G*128)``
  group layout from the natural spectrum before the kernel (sign-mask on the
  imaginary plane). ``istft_pallas_grouped`` skips that gather entirely: its
  input layout is exactly what ``stft_pallas_grouped`` emits, so spectral
  round-trips (the Griffin-Lim loop) never leave group layout.
* stage A (MXU): per group a complex 128-point inverse GEMM
  ``E = Xg @ IB``, ``IB[j, v] = e^{+2πi j v/128} / N`` (1/N folded in).
* stage A2 (VPU): ``S_r[u] = Σ_r' W2_{r'}[u] * E_{r,r'}[u mod 128]`` with
  ``W2_{r'}[u] = e^{+2πi r' u / hop}`` — the lane-tiled inverse butterfly.
* stage B (VPU): chunk ``c`` of every frame is
  ``x[c*hop + u] = Σ_r d_r * Re(ω_C^{-rc·(-1)} T_r[u] S_r[u])`` with
  ``T_r[u] = e^{+2πi r u/N}``, ``d_r = 1`` for r in {0, C/2} else 2.
* synthesis window chunk multiply, then the OLA shifted adds and the
  envelope divide exactly as in `overlap_add.py`.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .._config import MATMUL_PRECISION
from ..utils.cache import table_cache
from ..utils.dispatch import pallas_interpret_mode, vma_struct
from .block_policy import LANE, SUBLANE, VMEM_BUDGET, cdiv, radix_shape_ok, round_up
from .mel_fused import _coef, _double_buffered_rows, _omega
from .stft_radix import _natural_maps, group_spectrum


def _istft_tables_bytes(C: int, R2: int, NC: int, hop: int,
                        rev_base: bool = False) -> int:
    """VMEM bytes of the shared inverse tables: window chunks + the 4-plane
    inverse base (+ the row-flipped base for the natural intake) + stage-2
    butterfly vectors + inverse twiddles. ONE definition — round 4's
    2-to-4-plane fix had to touch five hand-copied variants of this sum."""
    return (
        C * hop * 4
        + (2 if rev_base else 1) * 4 * LANE * LANE * 4
        + R2 * 2 * hop * 4
        + NC * 2 * hop * 4
    )


def istft_fused_supported(n_fft: int, hop_length: int) -> bool:
    """Radix shape gates + the inverse working set under the VMEM budget."""
    if not radix_shape_ok(n_fft, hop_length):
        return False
    C = n_fft // hop_length
    R2 = hop_length // LANE
    NC = C // 2 + 1
    G = NC * R2
    tables = _istft_tables_bytes(C, R2, NC, hop_length)
    min_rows = round_up(SUBLANE + C - 1, SUBLANE)
    # live set per (clip, frame): group block + E + S + Z + chunk accumulators
    min_block = (
        min_rows * (2 * G * LANE + (4 + 2 * NC + C) * hop_length) * 4
        + min_rows * 2 * G * LANE * 4  # second DMA buffer slot
        + 2 * SUBLANE * hop_length * 4
    )
    return tables + min_block <= VMEM_BUDGET


@table_cache("istft_inv_base", maxsize=8)
def _inv_base_table(n_fft: int) -> np.ndarray:
    """(4, 128, 128) inverse base ``IB[j,v] = e^{+2πi j v/128} / n_fft``.

    Planes 0/1 are cos/sin; planes 2/3 the Karatsuba combinations
    ``ibi - ibr`` / ``ibr + ibi`` (3-GEMM complex multiply, used on the
    fast path — same scheme as the forward kernels' `_basis_table`)."""
    jj = np.arange(LANE)[:, None]
    vv = np.arange(LANE)[None, :]
    cr, ci = _omega(-jj * vv, LANE)  # e^{+2πi j v/128}
    return np.stack([cr, ci, ci - cr, cr + ci]) / float(n_fft)


@table_cache("istft_inv_stage2", maxsize=8)
def _inv_stage2_table(hop: int) -> np.ndarray:
    """(R2, 2, hop) butterfly vectors ``W2_{r'}[u] = e^{+2πi r' u/hop}``."""
    R2 = hop // LANE
    u = np.arange(hop)
    W = np.zeros((R2, 2, hop), np.float64)
    for rp in range(R2):
        W[rp, 0], W[rp, 1] = _omega(-rp * u, hop)
    return W


@table_cache("istft_inv_twiddle", maxsize=8)
def _inv_twiddle_table(n_fft: int, hop: int) -> np.ndarray:
    """(NC, 2, hop) inverse twiddles ``T_r[u] = e^{+2πi r u/n_fft}``."""
    C = n_fft // hop
    NC = C // 2 + 1
    u = np.arange(hop)
    T = np.zeros((NC, 2, hop), np.float64)
    for r in range(NC):
        T[r, 0], T[r, 1] = _omega(-r * u, n_fft)
    return T




def _istft_stages(read_group, w_ref, ib_ref, w2_ref, t_ref, env_ref, out_ref,
                  C, R2, NC, RB, FAST, OFF=None, KARA=False, read_E=None):
    """Shared inverse stages of the fused ISTFT kernels (grouped, transposed
    and natural intake). ``read_group(g)`` returns the group's complex block
    ``(er, ei)`` of shape (CB, FBk, 128) frames-major — the kernels differ
    ONLY in how that block is produced from their scratch layout.

    All post-GEMM stages operate per 128-lane hop chunk (c2): the r4 form
    materialized hop-wide tensors via ``concatenate([Er]*R2)`` before every
    butterfly multiply; the chunked form slices the (static, 128-aligned)
    table lanes instead, removing R2x data movement from each frame's
    dependency chain at identical FLOP count and bitwise-identical results.

    ``KARA`` selects the 3-GEMM complex base with exact (HIGHEST) GEMMs —
    25% fewer MXU passes than the 4-GEMM form at ~2x rounding (measured
    ~1e-6 round-trip, inside the public istft's <=1e-5 contract). ``FAST``
    (Griffin-Lim's loop) keeps the bf16-split 3-pass GEMMs and implies the
    Karatsuba base as before."""
    if FAST:
        from .mel_fused import _group_dot

        def dot(a, b):
            return _group_dot(a, b, True)
    else:
        def dot(a, b):
            return jax.lax.dot_general(
                a, b, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=MATMUL_PRECISION,
            )

    if OFF is None:
        OFF = C - 1
    ibr, ibi = ib_ref[0], ib_ref[1]
    # stage A: per-group complex inverse 128-GEMMs; stage A2 accumulates the
    # R2 butterfly into S_r as R2 chunks of 128 lanes (E depends on
    # u mod 128 only, so chunk c2 of S_r needs no tiling of E — just the
    # c2-lane slice of the butterfly vector)
    Z = []  # per class r: list of R2 chunks of T_r * S_r (complex)
    for r in range(NC):
        src = [None] * R2
        sic = [None] * R2
        for rp in range(R2):
            g = r * R2 + rp
            if read_E is not None:
                # natural-intake kernel: the group GEMM is fused into the
                # bins-axis read (a transposed-lhs contraction), so the
                # consumer receives E directly
                Er, Ei = read_E(g)
            else:
                er, ei = read_group(g)
                if FAST or KARA:
                    # 3-GEMM Karatsuba (host-precomputed combo planes)
                    p1 = dot(er + ei, ibr)
                    Er = p1 - dot(ei, ib_ref[3])
                    Ei = p1 + dot(er, ib_ref[2])
                else:
                    Er = dot(er, ibr) - dot(ei, ibi)
                    Ei = dot(er, ibi) + dot(ei, ibr)
            for c2 in range(R2):
                wr = w2_ref[rp, 0, c2 * LANE : (c2 + 1) * LANE]
                wi = w2_ref[rp, 1, c2 * LANE : (c2 + 1) * LANE]
                ar = Er * wr - Ei * wi
                ai = Er * wi + Ei * wr
                src[c2] = ar if src[c2] is None else src[c2] + ar
                sic[c2] = ai if sic[c2] is None else sic[c2] + ai
        zc = []
        for c2 in range(R2):
            tc = t_ref[r, 0, c2 * LANE : (c2 + 1) * LANE]
            ts = t_ref[r, 1, c2 * LANE : (c2 + 1) * LANE]
            zc.append((src[c2] * tc - sic[c2] * ts,
                       src[c2] * ts + sic[c2] * tc))
        Z.append(zc)

    # stage B + window + OLA + normalize, one hop chunk at a time
    for c2 in range(R2):
        fc = []
        for c in range(C):
            acc = None
            for r in range(NC):
                zr, zi = Z[r][c2]
                wr, wi = _coef(-r * c, C)  # e^{+2πi r c/C}
                d = 1.0 if (r == 0 or (C % 2 == 0 and r == C // 2)) else 2.0
                term = (zr * (d * wr) - zi * (d * wi) if wi != 0
                        else zr * (d * wr))
                acc = term if acc is None else acc + term
            fc.append(acc * w_ref[c, c2 * LANE : (c2 + 1) * LANE])

        out = None
        for c in range(C):
            rows = fc[c][:, OFF - c : OFF - c + RB, :]
            out = rows if out is None else out + rows
        out_ref[..., c2 * LANE : (c2 + 1) * LANE] = (
            out / env_ref[:, c2 * LANE : (c2 + 1) * LANE]
        )


def _istft_kernel_factory(CB, RB, C, R2, NC, HOP, FBk, GJ, FAST=False,
                          KARA=False):
    G = NC * R2

    def kernel(xg_hbm, w_ref, ib_ref, w2_ref, t_ref, env_ref, out_ref,
               xg_scr, sem):
        cur = _double_buffered_rows(xg_hbm, xg_scr, sem, CB, RB, FBk, GJ)

        def read_group(g):
            return (
                cur[:, :, g * LANE : (g + 1) * LANE],
                cur[:, :, (G + g) * LANE : (G + g + 1) * LANE],
            )

        _istft_stages(read_group, w_ref, ib_ref, w2_ref, t_ref, env_ref,
                      out_ref, C, R2, NC, RB, FAST, KARA=KARA)

    return kernel


def _pick_blocks_istft(B, C, R2, NC, hop) -> tuple[int, int]:
    G = NC * R2
    tables = _istft_tables_bytes(C, R2, NC, hop)
    budget = VMEM_BUDGET - tables
    per_cf = (2 * G * LANE + (4 + 2 * NC + C) * hop) * 4
    for RB in (64, 48, 32, 24, 16, 8):
        for CB in (8, 4, 2, 1):
            if B % CB:
                continue
            rows = round_up(RB + C - 1, SUBLANE)
            # + a second group-block slot: the input DMA is double-buffered
            if CB * (rows * per_cf + rows * 2 * G * LANE * 4
                     + 2 * RB * hop * 4) <= budget:
                return CB, RB
    return 1, 8


def istft_pallas(
    S: jax.Array,  # (B, F, n_bins) complex spectrum (frames-major)
    win: jax.Array,  # (n_fft,) padded synthesis window
    env: jax.Array,  # (padded_length,) clamped squared-window envelope
    *,
    n_fft: int,
    hop_length: int,
    padded_length: int,
    kara: bool = False,
) -> jax.Array:
    """(B, F, n_bins) -> (B, padded_length) normalized reconstruction,
    one kernel (inverse transform + window + overlap-add + envelope)."""
    # frames at/after the output span contribute nothing — trim BEFORE the
    # group-layout gather so the 2x-expanded tensor never covers them. This
    # is a loose bound (the grouped core's exact RT_pad = round_up(RT, RB)
    # can exceed it for RB values that do not divide 64; the core zero-pads
    # the difference), so the exact trim still happens in the core.
    RT_ub = round_up(cdiv(padded_length, hop_length), 64)
    if S.shape[1] > RT_ub:
        S = S[:, :RT_ub, :]
    xg = group_spectrum(S, n_fft, hop_length)
    return istft_pallas_grouped(
        xg, win, env, n_fft=n_fft, hop_length=hop_length,
        padded_length=padded_length, kara=kara,
    )


def istft_pallas_grouped(
    xg: jax.Array,  # (B, F, 2*G*128) group-layout spectrum (reals | imags)
    win: jax.Array,  # (n_fft,) padded synthesis window
    env: jax.Array,  # (padded_length,) clamped squared-window envelope
    *,
    n_fft: int,
    hop_length: int,
    padded_length: int,
    fast_gemm: bool = False,
    kara: bool = False,
) -> jax.Array:
    """Fused ISTFT directly from the radix kernels' group layout
    (`stft_radix.py::_group_maps`) — the exact layout
    ``stft_pallas_grouped`` emits, so spectral round-trips (e.g. the
    Griffin-Lim loop) skip both per-iteration layout gathers.

    ``fast_gemm`` defaults to False (HIGHEST GEMMs — the public istft's
    <=1e-5 round-trip guarantee); Griffin-Lim's loop opts into the 3-pass
    bf16-split GEMMs, whose ~2.7e-5 spectral noise is far below its
    convergence error."""
    if not istft_fused_supported(n_fft, hop_length):
        raise ValueError(
            f"fused ISTFT kernel requires pow2 n_fft = C*hop, hop = R2*128 "
            f"within the VMEM budget; got n_fft={n_fft}, hop={hop_length}"
        )
    IB = _inv_base_table(n_fft)
    W2 = _inv_stage2_table(hop_length)
    T = _inv_twiddle_table(n_fft, hop_length)
    return _istft_grouped_vjp_fn(
        n_fft, hop_length, padded_length, bool(fast_gemm), bool(kara)
    )(xg, win, env, IB, W2, T)


def _linear_istft_vjp(kern, xla_ref, n_data):
    """custom_vjp scaffold shared by the three intake paths (grouped /
    transposed / natural): kernel forward, XLA-composition backward through
    ``xla_ref`` over the first ``n_data`` args, zero cotangents for the
    trailing host-constant table args. One definition so a future VJP
    contract change cannot silently miss one intake."""

    @jax.custom_vjp
    def f(*args):
        return kern(*args)

    def fwd(*args):
        return kern(*args), args

    def bwd(res, ct):
        data, tables = res[:n_data], res[n_data:]
        _, vjp = jax.vjp(xla_ref, *data)
        return (*vjp(ct), *(jnp.zeros_like(t) for t in tables))

    f.defvjp(fwd, bwd)
    return f


@lru_cache(maxsize=32)
def _istft_grouped_vjp_fn(n_fft: int, hop_length: int, padded_length: int,
                          fast_gemm: bool = False, kara: bool = False):
    """Kernel forward, XLA-composition backward (pallas_call has no autodiff
    rule; the ISTFT is linear in the spectrum, so the VJP is one XLA inverse).

    The XLA reference consumes the group layout through the ``_natural_maps``
    read (the exact inverse of the ``group_spectrum`` gather), so composing
    this VJP with the differentiable gather in :func:`istft_pallas` yields
    the exact natural-layout adjoint.
    """
    kern = partial(
        _istft_grouped_core, n_fft=n_fft, hop_length=hop_length,
        padded_length=padded_length, fast_gemm=fast_gemm, kara=kara,
    )
    C = n_fft // hop_length
    G = (C // 2 + 1) * (hop_length // LANE)

    def xla_ref(xg, win, env):
        from ..ops._frames import overlap_add

        pos, sgn = _natural_maps(n_fft, hop_length)
        pos_d = jnp.asarray(pos)
        S = jax.lax.complex(
            xg[:, :, pos_d], xg[:, :, G * LANE + pos_d] * jnp.asarray(sgn)
        )
        frames = jnp.fft.irfft(S, n=n_fft, axis=-1).astype(jnp.float32)
        y = overlap_add(frames * win, hop_length, padded_length)
        return y / env

    return _linear_istft_vjp(kern, xla_ref, 3)


@partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "padded_length", "fast_gemm",
                     "kara"),
)
def _istft_grouped_core(
    xg: jax.Array,  # (B, F, 2*G*128) group-layout spectrum
    win: jax.Array,
    env: jax.Array,
    IB: jax.Array,
    W2: jax.Array,
    T: jax.Array,
    *,
    n_fft: int,
    hop_length: int,
    padded_length: int,
    fast_gemm: bool = False,
    kara: bool = False,
) -> jax.Array:
    B, F, _ = xg.shape
    if padded_length < 1:
        # degenerate empty output (e.g. istft length=0) — match the XLA path
        return jnp.zeros((B, max(padded_length, 0)), jnp.float32)
    C = n_fft // hop_length
    R2 = hop_length // LANE
    NC = C // 2 + 1
    G = NC * R2

    wch = win.reshape(C, hop_length)
    RT = cdiv(padded_length, hop_length)
    CB, RB = _pick_blocks_istft(B, C, R2, NC, hop_length)
    RB = min(RB, round_up(RT, SUBLANE))
    RT_pad = round_up(RT, RB)
    FBk = round_up(RB + C - 1, SUBLANE)

    # frames at/after the output span contribute nothing
    if F > RT_pad:
        xg = xg[:, :RT_pad, :]
        F = RT_pad

    NF = RT_pad + FBk
    # prepad C-1 zero frames; extend so every DMA window is in bounds
    xg_p = jnp.pad(xg, ((0, 0), (C - 1, NF - F - (C - 1)), (0, 0)))

    env_rows = jnp.pad(env, (0, RT_pad * hop_length - env.shape[0]),
                       constant_values=1.0).reshape(RT_pad, hop_length)

    out = pl.pallas_call(
        _istft_kernel_factory(
            CB, RB, C, R2, NC, hop_length, FBk, RT_pad // RB, fast_gemm,
            kara,
        ),
        out_shape=vma_struct((B, RT_pad, hop_length), jnp.float32, xg_p),
        grid=(B // CB, RT_pad // RB),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((C, hop_length), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, LANE, LANE), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R2, 2, hop_length), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NC, 2, hop_length), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, hop_length), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (CB, RB, hop_length), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, CB, FBk, 2 * G * LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=pallas_interpret_mode(),
    )(xg_p, wch, IB, W2, T, env_rows)
    return out.reshape(B, RT_pad * hop_length)[:, :padded_length]

# ---------------------------------------------------------------------------
# Transposed-intake variant: accept the frames-MINOR natural layout directly.
# ---------------------------------------------------------------------------


def _start_col_dma(xt_hbm, scr, sem, slot, bi, s_dyn, CB, W):
    """Async copy of a 128-ALIGNED frame window (minor axis) into scratch
    ``slot``: xt_hbm is (B, 2*G*128, NF) with frames minor and a tiled HBM
    layout, so Mosaic requires minor-axis slices to be 128-aligned in both
    offset and shape — the window start ``s_dyn`` is always a multiple of
    128 and the window spans W = 256 frames (the needed RB + C - 1 rows
    plus alignment slack; the kernel slices the exact rows after its VMEM
    transpose)."""
    return pltpu.make_async_copy(
        xt_hbm.at[pl.ds(bi * CB, CB), :, pl.ds(s_dyn, W)],
        scr.at[slot],
        sem.at[slot],
    )


def _win_start(j, RB, C, NF, P=LANE, W=2 * LANE):
    """128-aligned start of the frame window covering output row block j.

    Rows [j*RB, j*RB+RB) need padded frames [j*RB + P - (C-1), j*RB + P +
    RB - 1] (P = the 128-frame prepad). round_down(ns - 8, 128) keeps the
    block base >= 8 inside the window (so the post-transpose row slice
    [base-8, base-8+RB+8) is sublane-aligned and in bounds) and the clamp
    to NF - W keeps the window inside the padded tensor — clamping only
    moves the start earlier, which preserves coverage."""
    ns = j * RB + P - (C - 1)
    s = jnp.minimum((ns - 8) // LANE * LANE, NF - W)
    # Mosaic must be able to prove the minor-axis DMA offset is a multiple
    # of the 128 tiling; the arithmetic above guarantees it but is opaque
    # to its divisibility analysis
    return pl.multiple_of(s, LANE)


def _double_buffered_cols(xt_hbm, scr, sem, CB, RB, C, NF, GJ):
    """Frame-window twin of `mel_fused._double_buffered_rows`: per grid step
    prefetch the NEXT block's aligned frame window into the other scratch
    slot so the minor-axis DMA rides under this block's inverse GEMMs.
    Returns (scratch view, window start) for the current block."""
    W = 2 * LANE
    i = pl.program_id(0)
    j = pl.program_id(1)
    ni = pl.num_programs(0)
    step = i * GJ + j
    slot = jax.lax.rem(step, 2)
    nslot = jax.lax.rem(step + 1, 2)
    s_cur = _win_start(j, RB, C, NF)

    @pl.when(step == 0)
    def _():
        _start_col_dma(xt_hbm, scr, sem, slot, i, s_cur, CB, W).start()

    @pl.when(step + 1 < ni * GJ)
    def _():
        nxt_j = jax.lax.rem(j + 1, GJ)
        nxt_i = i + (j + 1) // GJ
        _start_col_dma(xt_hbm, scr, sem, nslot, nxt_i,
                       _win_start(nxt_j, RB, C, NF), CB, W).start()

    _start_col_dma(xt_hbm, scr, sem, slot, i, s_cur, CB, W).wait()
    return scr.at[slot], s_cur


def _istft_t_kernel_factory(CB, RB, C, R2, NC, HOP, NF, GJ, FAST=False,
                            KARA=False):
    """Transposed-intake kernel: scratch holds (CB, 2*G*128, 256) with
    frames MINOR (a 128-aligned window of the layout
    `group_spectrum_nat_t` emits); each group's (128, 256) complex tile is
    transposed to frames-major in VMEM and the RB+8 needed rows sliced out
    (sublane-aligned dynamic offset) — the exact dual of the forward
    transposed-emit kernel (`stft_radix._stft_radix_t_kernel_factory`),
    which pays the same per-group transpose on its way OUT. All inverse
    stages are shared (`_istft_stages`, OFF=8)."""
    G = NC * R2
    FBe = RB + 8  # rows handed to the stages (OFF=8 slack + RB)

    def kernel(xt_hbm, w_ref, ib_ref, w2_ref, t_ref, env_ref, out_ref,
               xt_scr, tr_scr, sem):
        cur, s_cur = _double_buffered_cols(xt_hbm, xt_scr, sem, CB, RB, C,
                                           NF, GJ)
        j = pl.program_id(1)
        # window row of output row 0 of this block; the slice below starts
        # 8 rows earlier (base - 8 is a multiple of 8: j*RB + 128 - s are
        # both multiples of 8), giving the stages OFF = 8
        base = j * RB + LANE - s_cur

        def read_group(g):
            # Mosaic has no dynamic_slice on VALUES, so the transposed tile
            # round-trips through a VMEM scratch and is re-read with a
            # dynamic (sublane-aligned) ref offset — the per-group cost is
            # one 256x128 VMEM store+load
            er = cur[:, g * LANE : (g + 1) * LANE, :]
            ei = cur[:, (G + g) * LANE : (G + g + 1) * LANE, :]
            tr_scr[:, 0] = jnp.swapaxes(er, 1, 2)
            tr_scr[:, 1] = jnp.swapaxes(ei, 1, 2)
            ert = tr_scr[:, 0, pl.ds(base - 8, FBe), :]
            eit = tr_scr[:, 1, pl.ds(base - 8, FBe), :]
            return ert, eit

        _istft_stages(read_group, w_ref, ib_ref, w2_ref, t_ref, env_ref,
                      out_ref, C, R2, NC, RB, FAST, OFF=8, KARA=KARA)

    return kernel


def _pick_blocks_istft_t(B, C, R2, NC, hop, RT) -> tuple[int, int]:
    """Block picker for the transposed intake. RB is chosen to minimize the
    padded-row waste round_up(RT, RB) (the aligned 256-frame window makes
    per-block halo cost independent of RB, so bigger RB is not inherently
    better — unlike the grouped picker); CB widens when VMEM allows. The
    input scratch is two (CB, 2*G*128, 256) slots regardless of RB."""
    G = NC * R2
    tables = _istft_tables_bytes(C, R2, NC, hop)
    budget = VMEM_BUDGET - tables
    in_slot = 2 * G * LANE * 2 * LANE * 4

    def fits(CB, RB):
        rows = RB + 8
        work = rows * (4 + 2 * NC + C) * hop * 4
        trans = 2 * 2 * LANE * LANE * 4  # per-group transpose transient
        return CB * (2 * in_slot + work + trans + 2 * RB * hop * 4) <= budget

    best = None
    rb_max = min(120, 122 - C) // SUBLANE * SUBLANE
    for RB in range(rb_max, 0, -SUBLANE):
        for CB in (8, 4, 2, 1):
            if B % CB or not fits(CB, RB):
                continue
            waste = round_up(RT, RB) - RT
            key = (waste, -CB, -RB)
            if best is None or key < best[0]:
                best = (key, CB, RB)
            break  # larger CB found for this RB; smaller CB can't beat it
    if best is None:
        return 0, 0  # nothing fits: the istft_t_supported gate rejects
    return best[1], best[2]


def istft_t_supported(n_fft: int, hop_length: int) -> bool:
    """Support gate for the transposed intake: the grouped gates plus the
    aligned-window picker finding ANY block under the VMEM budget — gating
    through `_pick_blocks_istft_t` itself so gate and picker cannot drift
    (large-G radix pairs, e.g. 4096/1024, fail and keep the grouped path)."""
    if not istft_fused_supported(n_fft, hop_length):
        return False
    C = n_fft // hop_length
    R2 = hop_length // LANE
    NC = C // 2 + 1
    return _pick_blocks_istft_t(8, C, R2, NC, hop_length, 64)[1] > 0


def istft_pallas_t(
    S: jax.Array,  # (B, n_bins, F) complex spectrum (NATURAL, frames minor)
    win: jax.Array,  # (n_fft,) padded synthesis window
    env: jax.Array,  # (padded_length,) clamped squared-window envelope
    *,
    n_fft: int,
    hop_length: int,
    padded_length: int,
) -> jax.Array:
    """(B, n_bins, F) natural layout -> (B, padded_length) reconstruction
    with a COALESCED row-gather intake (`group_spectrum_nat_t`) feeding the
    transposed-intake kernel — no swapaxes/minor-axis gather anywhere, the
    symmetric twin of the forward t-path (`stft_radix.stft_pallas` F>=64
    routing). The group transpose is paid per-tile in VMEM inside the
    kernel, where it is cheap."""
    from .stft_radix import group_spectrum_nat_t

    RT_ub = round_up(cdiv(padded_length, hop_length), 64)
    if S.shape[2] > RT_ub:
        S = S[:, :, :RT_ub]
    xt = group_spectrum_nat_t(S, n_fft, hop_length)
    return istft_pallas_grouped_t(
        xt, win, env, n_fft=n_fft, hop_length=hop_length,
        padded_length=padded_length,
    )


def istft_pallas_grouped_t(
    xt: jax.Array,  # (B, 2*G*128, F) flat transposed group layout
    win: jax.Array,
    env: jax.Array,
    *,
    n_fft: int,
    hop_length: int,
    padded_length: int,
    fast_gemm: bool = False,
    kara: bool = False,
) -> jax.Array:
    """Fused ISTFT directly from the flat transposed group layout (frames
    minor — what `group_spectrum_nat_t` emits and what the forward
    transposed-emit kernel's output reshapes to). Gated on
    :func:`istft_t_supported` (the grouped gates plus the aligned-window
    input slots); same precision contract as :func:`istft_pallas_grouped`."""
    if not istft_t_supported(n_fft, hop_length):
        raise ValueError(
            f"transposed-intake fused ISTFT requires pow2 n_fft = C*hop, "
            f"hop = R2*128 with the aligned frame windows within the VMEM "
            f"budget; got n_fft={n_fft}, hop={hop_length}"
        )
    IB = _inv_base_table(n_fft)
    W2 = _inv_stage2_table(hop_length)
    T = _inv_twiddle_table(n_fft, hop_length)
    return _istft_t_vjp_fn(
        n_fft, hop_length, padded_length, bool(fast_gemm), bool(kara)
    )(xt, win, env, IB, W2, T)


@lru_cache(maxsize=32)
def _istft_t_vjp_fn(n_fft: int, hop_length: int, padded_length: int,
                    fast_gemm: bool = False, kara: bool = False):
    """Kernel forward, XLA-composition backward for the transposed intake
    (same contract as `_istft_grouped_vjp_fn`; the ISTFT is linear in the
    spectrum so the VJP is one XLA inverse through the t-layout read)."""
    kern = partial(
        _istft_t_core, n_fft=n_fft, hop_length=hop_length,
        padded_length=padded_length, fast_gemm=fast_gemm, kara=kara,
    )
    C = n_fft // hop_length
    G = (C // 2 + 1) * (hop_length // LANE)

    def xla_ref(xt, win, env):
        from ..ops._frames import overlap_add

        pos, sgn = _natural_maps(n_fft, hop_length)
        pos_d = jnp.asarray(pos)
        # t-layout read: rows pos of the real plane / G*128+pos of the imag
        S_fm = jnp.swapaxes(
            jax.lax.complex(
                xt[:, pos_d, :],
                xt[:, G * LANE + pos_d, :] * jnp.asarray(sgn)[:, None],
            ),
            1, 2,
        )
        frames = jnp.fft.irfft(S_fm, n=n_fft, axis=-1).astype(jnp.float32)
        y = overlap_add(frames * win, hop_length, padded_length)
        return y / env

    return _linear_istft_vjp(kern, xla_ref, 3)


@partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "padded_length", "fast_gemm",
                     "kara"),
)
def _istft_t_core(
    xt: jax.Array,  # (B, 2*G*128, F) flat transposed group layout
    win: jax.Array,
    env: jax.Array,
    IB: jax.Array,
    W2: jax.Array,
    T: jax.Array,
    *,
    n_fft: int,
    hop_length: int,
    padded_length: int,
    fast_gemm: bool = False,
    kara: bool = False,
) -> jax.Array:
    B, _, F = xt.shape
    if padded_length < 1:
        return jnp.zeros((B, max(padded_length, 0)), jnp.float32)
    C = n_fft // hop_length
    R2 = hop_length // LANE
    NC = C // 2 + 1
    G = NC * R2

    wch = win.reshape(C, hop_length)
    RT = cdiv(padded_length, hop_length)
    CB, RB = _pick_blocks_istft_t(B, C, R2, NC, hop_length, RT)
    RT_pad = round_up(RT, RB)

    # frames at/after the output span contribute nothing
    if F > RT_pad:
        xt = xt[:, :, :RT_pad]
        F = RT_pad

    # prepad P = 128 zero frames (the aligned-window scheme's halo depth);
    # extend so every clamped 256-frame window is in bounds
    P = LANE
    NF = round_up(RT_pad + P, LANE)
    xt_p = jnp.pad(xt, ((0, 0), (0, 0), (P, NF - F - P)))

    env_rows = jnp.pad(env, (0, RT_pad * hop_length - env.shape[0]),
                       constant_values=1.0).reshape(RT_pad, hop_length)

    out = pl.pallas_call(
        _istft_t_kernel_factory(
            CB, RB, C, R2, NC, hop_length, NF, RT_pad // RB, fast_gemm,
            kara,
        ),
        out_shape=vma_struct((B, RT_pad, hop_length), jnp.float32, xt_p),
        grid=(B // CB, RT_pad // RB),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((C, hop_length), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, LANE, LANE), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R2, 2, hop_length), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NC, 2, hop_length), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, hop_length), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (CB, RB, hop_length), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, CB, 2 * G * LANE, 2 * LANE), jnp.float32),
            pltpu.VMEM((CB, 2, 2 * LANE, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=pallas_interpret_mode(),
    )(xt_p, wch, IB, W2, T, env_rows)
    return out.reshape(B, RT_pad * hop_length)[:, :padded_length]

# ---------------------------------------------------------------------------
# Natural-intake variant: consume the librosa-layout spectrum planes directly
# (NO group-layout tensor in HBM at all).
# ---------------------------------------------------------------------------


@table_cache("istft_inv_base_rev", maxsize=8)
def _inv_base_rev_table(n_fft: int) -> np.ndarray:
    """Row-flipped inverse base: plane p, row u = `_inv_base_table`[p, 127-u].

    The conjugate-mirror rows of a group arrive in REVERSED j order when read
    off the natural spectrum (mirror bin n_fft - k descends as k ascends);
    contracting them against the row-flipped base folds the reversal into
    the GEMM instead of shuffling data.

    Rebuilt from the host math rather than by indexing `_inv_base_table`:
    that cache returns DEVICE arrays, and a device array inside this host
    builder would become a tracer under jit (caught by the kara=False
    timing run)."""
    jj = np.arange(LANE)[:, None]
    vv = np.arange(LANE)[None, :]
    cr, ci = _omega(-jj * vv, LANE)
    base = np.stack([cr, ci, ci - cr, cr + ci]) / float(n_fft)
    return base[:, ::-1, :].copy()


@lru_cache(maxsize=16)
def _nat_group_plan(n_fft: int, hop: int):
    """Per-group static constants for the natural-intake read.

    The natural bins axis (padded to 65*S16 rows, S16 = n_fft/128) is viewed
    as (65, S16): bin k = q*S16 + m. Group (r, rp) with base = r + C*rp has
    direct rows k = base + S16*j at view [j, base] for j < j0 (k < n_bins),
    and mirror rows n_fft - k at view [u, m2] for u in [u_a, u_b) — a
    CONTIGUOUS block in q because the mirror index descends with j, handled
    by the flipped basis (`_inv_base_rev_table` rows [0, u_b - u_a)).

    Returns tuples (base, j0, m2, u_a, u_b) indexed by g = r*R2 + rp.
    """
    C = n_fft // hop
    R2 = hop // LANE
    NC = C // 2 + 1
    S16 = n_fft // LANE
    n_bins = n_fft // 2 + 1
    plan = []
    for r in range(NC):
        for rp in range(R2):
            base = r + C * rp
            j0 = min(-(-(n_bins - base) // S16), LANE)
            m2 = (S16 - base) % S16
            if base == 0:
                # q' = 128 - j for j in [j0, 128) -> u in [1, 128 - j0]
                u_a, u_b = 1, LANE - j0 + 1
            else:
                # q' = 127 - j for j in [j0, 128) -> u in [0, 128 - j0)
                u_a, u_b = 0, LANE - j0
            plan.append((base, j0, m2, u_a, u_b))
    return tuple(plan)


def _dotT(a, b, fast: bool = False):
    """Contract ``a``'s dim 1 (the bins axis, sublane) with ``b``'s dim 0 —
    the transposed-lhs MXU form, so the natural-intake kernel never
    transposes data: (CB, K, Fw) x (K, 128) -> (CB, Fw, 128) frames-major."""
    dn = (((1,), (0,)), ((), ()))
    if not fast:
        return jax.lax.dot_general(
            a, b, dn, preferred_element_type=jnp.float32,
            precision=MATMUL_PRECISION,
        )
    from .mel_fused import _bf16_split

    ah, al = _bf16_split(a)
    bh, bl = _bf16_split(b)
    f = partial(jax.lax.dot_general, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
    return f(ah, bh) + f(ah, bl) + f(al, bh)


def _istft_nat_kernel_factory(CB, RB, C, R2, NC, HOP, S16, GJ, FAST=False,
                              KARA=True):
    """Natural-intake kernel: scratch holds a 256-frame window of the
    (65, S16)-viewed natural spectrum planes; each group's stage-A GEMM
    contracts the bins axis directly off that view (direct + flipped-mirror
    segments, conjugation folded into signs), emitting E frames-major with
    no transpose, no group tensor, and no XLA gather anywhere.

    Two window geometries (prepad = 64 zero frames):
      RB=128: window [128j, 128j+256), rows [56, 192) -> FBe=136, 1 branch.
      RB=64:  window [128*(j//2), +256), rows [56,128) / [120,192) by
              parity -> FBe=72, 2 branches.
    Both give the stages OFF=8.
    """
    G = NC * R2
    FBe = RB + 8
    PLAN = _nat_group_plan(S16 * LANE, HOP)

    # parity pairs (RB=64: blocks 2m and 2m+1) share one window, so DMA is
    # keyed on the WINDOW index w, not the block index: odd blocks issue no
    # copies and no waits (grid steps are sequential per core, so the data
    # is still in the slot), halving input traffic vs naive per-block DMA
    PAR = 1 if RB == LANE else 2
    WJ = -(-GJ // PAR)

    def kernel(xr_hbm, xi_hbm, w_ref, ib_ref, ibf_ref, w2_ref, t_ref,
               env_ref, out_ref, scr, sem):
        W = 2 * LANE
        i = pl.program_id(0)
        j = pl.program_id(1)
        ni = pl.num_programs(0)
        w = j // PAR
        wstep = i * WJ + w
        slot = jax.lax.rem(wstep, 2)
        nslot = jax.lax.rem(wstep + 1, 2)
        first = jax.lax.rem(j, PAR) == 0

        def start(sl, bi, bw):
            st = pl.multiple_of(LANE * bw, LANE)
            a = pltpu.make_async_copy(
                xr_hbm.at[pl.ds(bi * CB, CB), :, :, pl.ds(st, W)],
                scr.at[sl, 0], sem.at[sl, 0])
            b = pltpu.make_async_copy(
                xi_hbm.at[pl.ds(bi * CB, CB), :, :, pl.ds(st, W)],
                scr.at[sl, 1], sem.at[sl, 1])
            return a, b

        @pl.when(first & (wstep == 0))
        def _():
            for cp in start(slot, i, w):
                cp.start()

        @pl.when(first & (wstep + 1 < ni * WJ))
        def _():
            nxt_w = jax.lax.rem(w + 1, WJ)
            nxt_i = i + (w + 1) // WJ
            for cp in start(nslot, nxt_i, nxt_w):
                cp.start()

        @pl.when(first)
        def _():
            for cp in start(slot, i, w):
                cp.wait()

        xr_t = scr.at[slot, 0]
        xi_t = scr.at[slot, 1]

        def body(SS):
            def read_E(g):
                base, j0, m2, ua, ub = PLAN[g]
                xr_d = xr_t[:, 0:j0, base, SS : SS + FBe]
                xi_d = xi_t[:, 0:j0, base, SS : SS + FBe]
                xr_m = xr_t[:, ua:ub, m2, SS : SS + FBe]
                xi_m = xi_t[:, ua:ub, m2, SS : SS + FBe]
                nm = ub - ua
                if FAST or KARA:
                    # 3-GEMM Karatsuba per segment; mirror has ei = -xi_m
                    p1 = _dotT(xr_d + xi_d, ib_ref[0, 0:j0, :], FAST)
                    Er = p1 - _dotT(xi_d, ib_ref[3, 0:j0, :], FAST)
                    Ei = p1 + _dotT(xr_d, ib_ref[2, 0:j0, :], FAST)
                    q1 = _dotT(xr_m - xi_m, ibf_ref[0, 0:nm, :], FAST)
                    Er = Er + q1 + _dotT(xi_m, ibf_ref[3, 0:nm, :], FAST)
                    Ei = Ei + q1 + _dotT(xr_m, ibf_ref[2, 0:nm, :], FAST)
                else:
                    Er = (_dotT(xr_d, ib_ref[0, 0:j0, :])
                          - _dotT(xi_d, ib_ref[1, 0:j0, :])
                          + _dotT(xr_m, ibf_ref[0, 0:nm, :])
                          + _dotT(xi_m, ibf_ref[1, 0:nm, :]))
                    Ei = (_dotT(xr_d, ib_ref[1, 0:j0, :])
                          + _dotT(xi_d, ib_ref[0, 0:j0, :])
                          + _dotT(xr_m, ibf_ref[1, 0:nm, :])
                          - _dotT(xi_m, ibf_ref[0, 0:nm, :]))
                return Er, Ei

            _istft_stages(None, w_ref, ib_ref, w2_ref, t_ref, env_ref,
                          out_ref, C, R2, NC, RB, FAST, OFF=8, KARA=KARA,
                          read_E=read_E)

        if RB == LANE:
            body(56)
        else:
            @pl.when(jax.lax.rem(j, 2) == 0)
            def _():
                body(56)

            @pl.when(jax.lax.rem(j, 2) == 1)
            def _():
                body(120)

    return kernel


def _pick_blocks_istft_nat(B, C, R2, NC, hop, RT) -> tuple[int, int]:
    """RB in {64, 128}: minimize total stage rows GJ*(RB+8) under VMEM
    (the window scratch is RB-independent); CB widens when VMEM allows."""
    S16 = C * R2
    tables = _istft_tables_bytes(C, R2, NC, hop, rev_base=True)
    budget = VMEM_BUDGET - tables
    in_slot = 2 * 65 * S16 * 2 * LANE * 4  # two planes, 256-frame window

    def fits(CB, RB):
        work = (RB + 8) * (4 + 2 * NC + C) * hop * 4
        return CB * (2 * in_slot + work + 2 * RB * hop * 4) <= budget

    best = None
    for RB in (128, 64):
        GJ = -(-RT // RB)
        for CB in (8, 4, 2, 1):
            if B % CB or not fits(CB, RB):
                continue
            key = (GJ * (RB + 8), -CB)
            if best is None or key < best[0]:
                best = (key, CB, RB)
            break
    if best is None:
        return 0, 0
    return best[1], best[2]


def istft_nat_supported(n_fft: int, hop_length: int) -> bool:
    """Support gate for the natural intake: radix shapes plus the two
    double-buffered plane windows under the VMEM budget."""
    if not radix_shape_ok(n_fft, hop_length):
        return False
    C = n_fft // hop_length
    R2 = hop_length // LANE
    NC = C // 2 + 1
    return _pick_blocks_istft_nat(8, C, R2, NC, hop_length, 64)[1] > 0


def istft_pallas_nat(
    S: jax.Array,  # (B, n_bins, F) complex spectrum (NATURAL, frames minor)
    win: jax.Array,
    env: jax.Array,
    *,
    n_fft: int,
    hop_length: int,
    padded_length: int,
    kara: bool = True,
) -> jax.Array:
    """(B, n_bins, F) natural layout -> (B, padded_length) reconstruction in
    ONE kernel with NO layout gather: the plane split (real/imag) is the
    only XLA pass between the user's spectrum and the fused inverse."""
    if not istft_nat_supported(n_fft, hop_length):
        raise ValueError(
            f"natural-intake fused ISTFT requires pow2 n_fft = C*hop, "
            f"hop = R2*128 with the plane windows within the VMEM budget; "
            f"got n_fft={n_fft}, hop={hop_length}"
        )
    IB = _inv_base_table(n_fft)
    IBf = _inv_base_rev_table(n_fft)
    W2 = _inv_stage2_table(hop_length)
    T = _inv_twiddle_table(n_fft, hop_length)
    xr = jnp.real(S)
    xi = jnp.imag(S)
    return _istft_nat_vjp_fn(
        n_fft, hop_length, padded_length, bool(kara)
    )(xr, xi, win, env, IB, IBf, W2, T)


@lru_cache(maxsize=32)
def _istft_nat_vjp_fn(n_fft: int, hop_length: int, padded_length: int,
                      kara: bool = True):
    """Kernel forward, XLA-composition backward (the ISTFT is linear in the
    spectrum planes, so the VJP is one XLA inverse off the natural layout)."""
    kern = partial(
        _istft_nat_core, n_fft=n_fft, hop_length=hop_length,
        padded_length=padded_length, kara=kara,
    )

    def xla_ref(xr, xi, win, env):
        from ..ops._frames import overlap_add

        S_fm = jnp.swapaxes(jax.lax.complex(xr, xi), 1, 2)
        frames = jnp.fft.irfft(S_fm, n=n_fft, axis=-1).astype(jnp.float32)
        y = overlap_add(frames * win, hop_length, padded_length)
        return y / env

    return _linear_istft_vjp(kern, xla_ref, 4)


@partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "padded_length", "kara"),
)
def _istft_nat_core(
    xr: jax.Array,  # (B, n_bins, F) real plane of the natural spectrum
    xi: jax.Array,
    win: jax.Array,
    env: jax.Array,
    IB: jax.Array,
    IBf: jax.Array,
    W2: jax.Array,
    T: jax.Array,
    *,
    n_fft: int,
    hop_length: int,
    padded_length: int,
    kara: bool = True,
) -> jax.Array:
    B, n_bins, F = xr.shape
    if padded_length < 1:
        return jnp.zeros((B, max(padded_length, 0)), jnp.float32)
    C = n_fft // hop_length
    R2 = hop_length // LANE
    NC = C // 2 + 1
    S16 = n_fft // LANE
    KB = 65 * S16

    wch = win.reshape(C, hop_length)
    RT = cdiv(padded_length, hop_length)
    CB, RB = _pick_blocks_istft_nat(B, C, R2, NC, hop_length, RT)
    RT_pad = round_up(RT, RB)
    GJ = RT_pad // RB

    # frames at/after the output span contribute nothing
    if F > RT_pad:
        xr = xr[:, :, :RT_pad]
        xi = xi[:, :, :RT_pad]
        F = RT_pad

    # prepad 64 zero frames (half a window tile: makes the j=0 window
    # geometry identical to every other block); extend so the last window
    # is in bounds; pad bins to the (65, S16) view
    P = LANE // 2
    NF = round_up((GJ - 1) * RB - (RB < LANE) * (LANE - RB) + 2 * LANE, LANE)
    pads = ((0, 0), (0, KB - n_bins), (P, NF - F - P))
    xr4 = jnp.pad(xr, pads).reshape(B, 65, S16, NF)
    xi4 = jnp.pad(xi, pads).reshape(B, 65, S16, NF)

    env_rows = jnp.pad(env, (0, RT_pad * hop_length - env.shape[0]),
                       constant_values=1.0).reshape(RT_pad, hop_length)

    out = pl.pallas_call(
        _istft_nat_kernel_factory(
            CB, RB, C, R2, NC, hop_length, S16, GJ, False, kara
        ),
        out_shape=vma_struct((B, RT_pad, hop_length), jnp.float32, xr4),
        grid=(B // CB, GJ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((C, hop_length), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, LANE, LANE), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, LANE, LANE), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R2, 2, hop_length), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NC, 2, hop_length), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, hop_length), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (CB, RB, hop_length), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2, CB, 65, S16, 2 * LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=pallas_interpret_mode(),
    )(xr4, xi4, wch, IB, IBf, W2, T, env_rows)
    return out.reshape(B, RT_pad * hop_length)[:, :padded_length]
