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


def istft_fused_supported(n_fft: int, hop_length: int) -> bool:
    """Radix shape gates + the inverse working set under the VMEM budget."""
    if not radix_shape_ok(n_fft, hop_length):
        return False
    C = n_fft // hop_length
    R2 = hop_length // LANE
    NC = C // 2 + 1
    G = NC * R2
    tables = (
        C * hop_length * 4  # window chunks
        + 4 * LANE * LANE * 4  # inverse base (4 planes: cos/sin + Karatsuba combos)
        + R2 * 2 * hop_length * 4  # stage-2 butterfly vectors
        + NC * 2 * hop_length * 4  # inverse twiddles
    )
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




def _istft_kernel_factory(CB, RB, C, R2, NC, HOP, FBk, GJ, FAST=False):
    G = NC * R2

    def kernel(xg_hbm, w_ref, ib_ref, w2_ref, t_ref, env_ref, out_ref,
               xg_scr, sem):
        cur = _double_buffered_rows(xg_hbm, xg_scr, sem, CB, RB, FBk, GJ)

        if FAST:
            # 3-pass bf16-split GEMMs (shared with the forward kernels) —
            # only analysis consumers (Griffin-Lim's loop) request this;
            # the public istft keeps HIGHEST for the <=1e-5 round-trip
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

        ibr, ibi = ib_ref[0], ib_ref[1]
        # stage A: per-group complex inverse 128-GEMMs, then stage A2
        # accumulate the R2 butterfly into S_r (complex, (CB, FBk, HOP))
        Z = []  # per class r: T_r * S_r (complex)
        for r in range(NC):
            sr = si = None
            for rp in range(R2):
                g = r * R2 + rp
                er = cur[:, :, g * LANE : (g + 1) * LANE]
                ei = cur[:, :, (G + g) * LANE : (G + g + 1) * LANE]
                if FAST:
                    # 3-GEMM Karatsuba (host-precomputed combo planes):
                    # fast path only — reconstruction keeps 4-GEMM exact
                    p1 = dot(er + ei, ibr)
                    Er = p1 - dot(ei, ib_ref[3])
                    Ei = p1 + dot(er, ib_ref[2])
                else:
                    Er = dot(er, ibr) - dot(ei, ibi)
                    Ei = dot(er, ibi) + dot(ei, ibr)
                # tile to hop lanes: E depends on u mod 128 only
                Ert = jnp.concatenate([Er] * R2, axis=-1)
                Eit = jnp.concatenate([Ei] * R2, axis=-1)
                wr, wi = w2_ref[rp, 0], w2_ref[rp, 1]
                ar = Ert * wr - Eit * wi
                ai = Ert * wi + Eit * wr
                sr = ar if sr is None else sr + ar
                si = ai if si is None else si + ai
            tc, ts = t_ref[r, 0], t_ref[r, 1]
            Z.append((sr * tc - si * ts, sr * ts + si * tc))

        # stage B: chunk c across all frames, windowed
        fc = []
        for c in range(C):
            acc = None
            for r in range(NC):
                zr, zi = Z[r]
                wr, wi = _coef(-r * c, C)  # e^{+2πi r c/C}
                d = 1.0 if (r == 0 or (C % 2 == 0 and r == C // 2)) else 2.0
                term = zr * (d * wr) - zi * (d * wi) if wi != 0 else zr * (d * wr)
                acc = term if acc is None else acc + term
            fc.append(acc * w_ref[c])

        # OLA shifted adds (frames prepadded C-1 like overlap_add.py)
        out = None
        for c in range(C):
            rows = fc[c][:, C - 1 - c : C - 1 - c + RB, :]
            out = rows if out is None else out + rows
        out_ref[:] = out / env_ref[:]

    return kernel


def _pick_blocks_istft(B, C, R2, NC, hop) -> tuple[int, int]:
    G = NC * R2
    tables = (
        C * hop * 4 + 4 * LANE * LANE * 4 + R2 * 2 * hop * 4
        + NC * 2 * hop * 4
    )
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
        padded_length=padded_length,
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
        n_fft, hop_length, padded_length, bool(fast_gemm)
    )(xg, win, env, IB, W2, T)


@lru_cache(maxsize=32)
def _istft_grouped_vjp_fn(n_fft: int, hop_length: int, padded_length: int,
                          fast_gemm: bool = False):
    """Kernel forward, XLA-composition backward (pallas_call has no autodiff
    rule; the ISTFT is linear in the spectrum, so the VJP is one XLA inverse).

    The XLA reference consumes the group layout through the ``_natural_maps``
    read (the exact inverse of the ``group_spectrum`` gather), so composing
    this VJP with the differentiable gather in :func:`istft_pallas` yields
    the exact natural-layout adjoint.
    """
    kern = partial(
        _istft_grouped_core, n_fft=n_fft, hop_length=hop_length,
        padded_length=padded_length, fast_gemm=fast_gemm,
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

    @jax.custom_vjp
    def f(xg, win, env, IB, W2, T):
        return kern(xg, win, env, IB, W2, T)

    def fwd(xg, win, env, IB, W2, T):
        return kern(xg, win, env, IB, W2, T), (xg, win, env, IB, W2, T)

    def bwd(res, ct):
        xg, win, env, IB, W2, T = res
        _, vjp = jax.vjp(xla_ref, xg, win, env)
        dxg, dw, de = vjp(ct)
        return (dxg, dw, de, jnp.zeros_like(IB), jnp.zeros_like(W2),
                jnp.zeros_like(T))

    f.defvjp(fwd, bwd)
    return f


@partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "padded_length", "fast_gemm"),
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
            CB, RB, C, R2, NC, hop_length, FBk, RT_pad // RB, fast_gemm
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
