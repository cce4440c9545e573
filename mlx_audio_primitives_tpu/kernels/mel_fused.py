"""Fused mel-spectrogram Pallas kernel (radix-decimated DFT on the MXU).

The whole melspectrogram pipeline — frame, window, real DFT, |.|^2, mel
filterbank — in ONE kernel that never materializes frames or spectrum in HBM
(the TPU realization of the north-star "fused Pallas STFT kernel" +
"fused mel-power-matmul"; reference pipeline: `mlx_audio_primitives/
mel.py:309-350` over `stft.py:109-133`).

Algorithm (per program; grid = (clip blocks, frame blocks)):

* the padded signal is viewed as hop-sized rows; one DMA stages a block's
  rows into VMEM. Framing never happens: frame ``f``'s chunk ``c`` IS row
  ``f + c`` (``n_fft = C*hop`` exactly), so chunk extraction is a sublane
  slice and the window applies per chunk (VPU).
* the DFT is decimated twice so the only GEMMs are 128-point:
  - stage 1: radix-``C`` butterfly ACROSS the chunk rows (classes
    ``r = k mod C``; real input => only ``r <= C/2`` computed, the rest are
    conjugate mirrors), then twiddle ``T_r[t] = W_N^{tr}``;
  - stage 2: radix-``R2`` butterfly across 128-aligned LANE chunks
    (``hop = R2*128``; sub-classes ``r' = m mod R2``), with the second
    twiddle folded into the base matrices;
  - base: per (r, r') a complex (128, 128) GEMM ``E @ B_{r'}`` where
    ``B_{r'}[t', j] = W_{R2*128}^{t' r'} * W_128^{t' j}`` — four real MXU
    matmuls — yielding bins ``k = r + C*r' + C*R2*j``.
* ``|X|^2`` feeds per-group mel GEMMs immediately; the *host-folded*
  filterbank ``FBfold[(r,r'), j] = FB[k]`` (+ the conjugate-mirror classes'
  rows folded in, since ``|X[N-k]| = |X[k]|``) absorbs the kernel's permuted
  bin order, so no in-kernel reordering or hermitian unpack ever happens.

This replaces the round-1 dense chunk-GEMM kernel (O(n_fft^2) MACs/frame,
0.97 ms) — the Mosaic blocker it documented (no in-kernel ``(N1, N2)``
reshape) is sidestepped because BOTH decimations use only sublane slices and
128-aligned lane slices. Measured on v5e (batch-64 x 1 s, n_fft=2048,
hop=512, n_mels=128, slope-amortized, same-process A/B): **0.11 ms with the
default 3-pass bf16-split GEMMs (2.7e-5 max rel vs the f64 oracle — the
same accuracy class as the XLA six-step pipeline's 2.4e-5, at ~4x its
0.40 ms) and 0.19 ms at HIGHEST precision (f32-exact, 3e-7 rel)**; the
packed-FFT pipeline sits at 0.49 ms. It is therefore the
``use_pallas=None`` auto default on TPU (`ops/mel.py`); see
:func:`_group_dot` and `_config.ANALYSIS_FAST_GEMM` for the GEMM mode.
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
from .block_policy import LANE, MAX_RADIX, SUBLANE, VMEM_BUDGET, radix_shape_ok, round_up

_MAX_RADIX = MAX_RADIX  # C, R2 <= 8 => n_fft <= 8192 with hop >= 128


def radix_supported(n_fft: int, hop_length: int, n_mels: int = 128) -> bool:
    """Shapes the fused kernel handles: pow2 ``n_fft = C*hop``,
    ``hop = R2*128``, radices ``C, R2 <= 8``, and the block-invariant VMEM
    residents plus the minimal (CB=1, FBb=8) working set must fit the
    budget (large ``n_mels`` grows the folded filterbank)."""
    if not radix_shape_ok(n_fft, hop_length):
        return False
    C = n_fft // hop_length
    R2 = hop_length // LANE
    NC = C // 2 + 1
    tables = (
        C * hop_length * 4
        + NC * 2 * hop_length * 4
        + R2 * 4 * LANE * LANE * 4
        + NC * R2 * LANE * n_mels * 4
    )
    min_rows = round_up(8 + C - 1, SUBLANE)
    min_block = 8 * ((C + 2 * NC + 4) * hop_length * 4 + n_mels * 4) + (
        2 * min_rows * hop_length * 4  # double-buffered row scratch
    )
    return tables + min_block <= VMEM_BUDGET


def _omega(num: np.ndarray, den: int) -> tuple[np.ndarray, np.ndarray]:
    """(cos, sin) of ``-2*pi*num/den`` with exact integer-mod angle reduction."""
    m = np.mod(num, den).astype(np.float64)
    ang = -2.0 * np.pi * m / den
    return np.cos(ang), np.sin(ang)


def _coef(num: int, den: int) -> tuple[float, float]:
    """Scalar butterfly coefficient W_den^num, snapped to exact 0/±1."""
    cr, ci = _omega(np.array(num), den)
    cr, ci = float(cr), float(ci)
    cr = round(cr) if abs(cr - round(cr)) < 1e-12 else cr
    ci = round(ci) if abs(ci - round(ci)) < 1e-12 else ci
    return cr, ci


@table_cache("mel_radix_twiddle", maxsize=8)
def _twiddle_table(n_fft: int, hop: int) -> np.ndarray:
    """(NC, 2, hop) stage-1 twiddles ``T_r[t] = W_n_fft^{t r}`` (f64 host)."""
    C = n_fft // hop
    NC = C // 2 + 1
    t = np.arange(hop)
    T = np.zeros((NC, 2, hop), np.float64)
    for r in range(NC):
        T[r, 0], T[r, 1] = _omega(t * r, n_fft)
    return T


@table_cache("mel_radix_basis", maxsize=8)
def _basis_table(hop: int) -> np.ndarray:
    """(R2, 4, 128, 128) base DFT matrices with the stage-2 twiddle folded:
    ``B_{r'}[t', j] = W_{hop}^{t' r'} * W_128^{t' j}`` (f64 host).

    Planes 0/1 are cos/sin (``br``/``bi``); planes 2/3 are the Karatsuba
    combinations ``bi - br`` / ``br + bi`` used by the 3-GEMM complex base
    multiply (`_radix_group_spectra` with ``kara=True``) — precomputed on
    the host so the 3M scheme costs zero in-kernel basis arithmetic."""
    R2 = hop // LANE
    tp = np.arange(LANE)
    jj = np.arange(LANE)
    B = np.zeros((R2, 4, LANE, LANE), np.float64)
    for rp in range(R2):
        B[rp, 0], B[rp, 1] = _omega(np.outer(tp, rp + R2 * jj), R2 * LANE)
        B[rp, 2] = B[rp, 1] - B[rp, 0]
        B[rp, 3] = B[rp, 0] + B[rp, 1]
    return B


@lru_cache(maxsize=8)
def _fold_maps(n_fft: int, hop: int) -> tuple[np.ndarray, np.ndarray]:
    """Host int/bool maps describing the folded-filterbank gather.

    Returns ``(kmap, use)`` of shape (G, 128): group (r, r') column j carries
    bin ``k = r + C*r' + C*R2*j``; ``kmap`` is the rDFT bin whose filterbank
    row lands there (the bin itself, or its conjugate mirror ``n_fft - k``
    when the mirror's class is one we never compute), ``use=False`` zeroes
    columns that contribute to no rDFT bin.
    """
    C = n_fft // hop
    R2 = hop // LANE
    NC = C // 2 + 1
    n_bins = n_fft // 2 + 1
    G = NC * R2
    kmap = np.zeros((G, LANE), np.int32)
    use = np.zeros((G, LANE), bool)
    for r in range(NC):
        for rp in range(R2):
            g = r * R2 + rp
            k = r + C * rp + C * R2 * np.arange(LANE)
            km = n_fft - k
            direct = k < n_bins
            # a bin >= n_bins supplies its mirror ONLY if the mirror's class
            # is not computed directly (mirror class > C/2)
            mirror = (~direct) & (km < n_bins) & (km % C > C // 2)
            kmap[g] = np.where(direct, k, np.where(mirror, km, 0))
            use[g] = direct | mirror
    return kmap, use


def fold_filterbank(fb_t: jax.Array, n_fft: int, hop_length: int) -> jax.Array:
    """(n_bins, n_mels) filterbank -> (G, 128, n_mels) folded to the kernel's
    permuted bin order (gather + mask; stays on device, any filterbank)."""
    kmap, use = _fold_maps(n_fft, hop_length)
    folded = fb_t[jnp.asarray(kmap)]  # (G, 128, n_mels)
    return jnp.where(jnp.asarray(use)[..., None], folded, 0.0)


def _add(a, b):
    if a is None:
        return b
    return a if b is None else a + b


def _scaled(x, s):
    if s == 0 or x is None:
        return None
    if s == 1:
        return x
    return -x if s == -1 else x * s


def _bf16_split(x):
    """f32 -> (hi, lo) bfloat16 planes with ``hi + lo ~= x`` (~16 mantissa
    bits retained)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot_raw(a, b):
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _group_dot(a, b, fast: bool = False):
    """Contraction of ``a``'s last axis with ``b``'s first, f32 accumulate.

    ``fast=False``: lax HIGHEST — the 6-pass bf16 emulation, f32-exact.
    ``fast=True``: manual 3-pass bf16 split (``ah@bh + ah@bl + al@bh`` — the
    lax.Precision.HIGH scheme, which Mosaic does not expose in Pallas dots),
    ~2.7e-5 max rel error and ~2x the MXU throughput. Duplicate splits of a
    reused operand across calls are CSE'd by the compiler.
    """
    if not fast:
        return jax.lax.dot_general(
            a, b, (((a.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=MATMUL_PRECISION,
        )
    ah, al = _bf16_split(a)
    bh, bl = _bf16_split(b)
    return _dot_raw(ah, bh) + _dot_raw(ah, bl) + _dot_raw(al, bh)


def _radix_group_spectra(sig_scr, w_ref, t_ref, b_ref, C, R2, NC, FBb,
                         fast: bool = False, kara: bool = False):
    """Shared radix body of the fused mel and fused STFT kernels.

    Windowed chunks -> radix-C butterfly -> T twiddle -> radix-R2 butterfly
    -> per-group complex 128-DFT base GEMMs. Yields ``(g, xr, xi)`` — the
    group index ``g = r*R2 + rp`` and the group's complex spectrum block
    ``(CB, FBb, 128)`` — one group at a time, so a consumer that reduces
    each group immediately (the mel kernel) keeps nothing larger live.
    The two kernels differ ONLY in how they consume each group.
    """
    # windowed chunks: frame f's chunk c is row f+c (VPU broadcasts the
    # (hop,) window chunk over clips x frames)
    xw = [sig_scr[:, c : c + FBb, :] * w_ref[c] for c in range(C)]

    # stage 1: radix-C butterfly across chunks; real input => classes
    # r in [0, C/2] only (the rest are conjugate mirrors)
    H = []
    for r in range(NC):
        gr = gi = None
        for c in range(C):
            wr, wi = _coef(c * r, C)
            gr = _add(gr, _scaled(xw[c], wr))
            gi = _add(gi, _scaled(xw[c], wi))
        if r == 0:
            H.append((gr, gi))  # T_0 = 1
        elif gi is None:  # real class (e.g. r = C/2): H = G * T
            H.append((gr * t_ref[r, 0], gr * t_ref[r, 1]))
        else:
            tc, ts = t_ref[r, 0], t_ref[r, 1]
            H.append((gr * tc - gi * ts, gr * ts + gi * tc))

    # stage 2 + base GEMMs, one group at a time
    for r in range(NC):
        hr, hi = H[r]
        hrc = [hr[:, :, c2 * LANE : (c2 + 1) * LANE] for c2 in range(R2)]
        hic = (
            None
            if hi is None
            else [hi[:, :, c2 * LANE : (c2 + 1) * LANE] for c2 in range(R2)]
        )
        for rp in range(R2):
            er = ei = None
            for c2 in range(R2):
                wr, wi = _coef(c2 * rp, R2)
                # (hr + i*hi) * (wr + i*wi)
                er = _add(er, _scaled(hrc[c2], wr))
                ei = _add(ei, _scaled(hrc[c2], wi))
                if hic is not None:
                    er = _add(er, _scaled(hic[c2], -wi))
                    ei = _add(ei, _scaled(hic[c2], wr))
            br, bi = b_ref[rp, 0], b_ref[rp, 1]
            if ei is None:
                xr = _group_dot(er, br, fast)
                xi = _group_dot(er, bi, fast)
            elif kara:
                # 3-GEMM complex multiply (Karatsuba/3M): the combined
                # bases bi-br / br+bi are host-precomputed table planes,
                # so the only extra VPU work is er+ei and two adds.
                # 25% fewer MXU passes than the 4-GEMM form; ~2x the
                # rounding (a subtractive cancellation) — reconstruction
                # paths keep the 4-GEMM form, analysis paths opt in.
                p1 = _group_dot(er + ei, br, fast)
                p2 = _group_dot(er, b_ref[rp, 2], fast)
                p3 = _group_dot(ei, b_ref[rp, 3], fast)
                xr = p1 - p3
                xi = p1 + p2
            else:
                xr = _group_dot(er, br, fast) - _group_dot(ei, bi, fast)
                xi = _group_dot(er, bi, fast) + _group_dot(ei, br, fast)
            yield r * R2 + rp, xr, xi


def _start_block_dma(sig_hbm, sig_scr, sem, slot, bi, bj, CB, FBb, FBk):
    """Async copy of grid block (bi, bj)'s signal rows into scratch ``slot``."""
    return pltpu.make_async_copy(
        sig_hbm.at[pl.ds(bi * CB, CB), pl.ds(bj * FBb, FBk), :],
        sig_scr.at[slot],
        sem.at[slot],
    )


def _double_buffered_rows(sig_hbm, sig_scr, sem, CB, FBb, FBk, GJ):
    """Shared DMA pipelining of both radix kernels: grid steps execute
    sequentially per core and scratch persists across them, so each step
    prefetches the NEXT block's signal rows into the other buffer slot
    before waiting on its own — the row DMA rides under the radix GEMMs
    (classic double buffering, ~15% off the fused mel kernel at production
    scale where the grid is hundreds of programs). Returns the current
    block's scratch view."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    ni = pl.num_programs(0)
    step = i * GJ + j
    slot = jax.lax.rem(step, 2)
    nslot = jax.lax.rem(step + 1, 2)

    @pl.when(step == 0)
    def _():
        _start_block_dma(sig_hbm, sig_scr, sem, slot, i, j, CB, FBb, FBk).start()

    @pl.when(step + 1 < ni * GJ)
    def _():
        nxt_j = jax.lax.rem(j + 1, GJ)
        nxt_i = i + (j + 1) // GJ
        _start_block_dma(
            sig_hbm, sig_scr, sem, nslot, nxt_i, nxt_j, CB, FBb, FBk
        ).start()

    _start_block_dma(sig_hbm, sig_scr, sem, slot, i, j, CB, FBb, FBk).wait()
    return sig_scr.at[slot]


def _mel_radix_kernel_factory(CB, FBb, C, R2, NC, HOP, FBk, POW, GJ, FAST,
                              KARA=False):
    """Kernel: double-buffered row DMA -> shared radix body
    (`_radix_group_spectra`) -> |.|^POW -> mel GEMM per group (nothing
    larger than (CB, FBb, 128) stays live past its mel accumulation).

    ``POW`` in {1, 2}: the mirror-folded filterbank stays valid for both
    since ``|X[N-k]| == |X[k]|`` (magnitudes, not components, are folded).
    ``FAST`` selects the 3-pass bf16-split GEMMs (see :func:`_group_dot`)."""

    def kernel(sig_hbm, w_ref, t_ref, b_ref, fb_ref, out_ref, sig_scr, sem):
        cur = _double_buffered_rows(sig_hbm, sig_scr, sem, CB, FBb, FBk, GJ)

        acc = None
        for g, xr, xi in _radix_group_spectra(
            cur, w_ref, t_ref, b_ref, C, R2, NC, FBb, FAST, KARA
        ):
            p = xr * xr + xi * xi
            if POW == 1:
                p = jnp.sqrt(p)
            acc = _add(acc, _group_dot(p, fb_ref[g], FAST))
        out_ref[:] = acc

    return kernel



def _pick_blocks(B: int, C: int, R2: int, NC: int, hop: int,
                 n_mels: int) -> tuple[int, int]:
    """(CB, FBb) under the VMEM budget: the live set is dominated by the
    windowed chunks + H classes (~(C + 2*NC + 2) arrays of (CB, FBb, hop)),
    on top of the block-invariant VMEM residents (window chunks, twiddles,
    base matrices, folded filterbank)."""
    tables = (
        C * hop * 4  # window chunks
        + NC * 2 * hop * 4  # stage-1 twiddles
        + R2 * 4 * LANE * LANE * 4  # folded base matrices
        + NC * R2 * LANE * n_mels * 4  # folded filterbank
    )
    budget = VMEM_BUDGET - tables
    per_cf = (C + 2 * NC + 4) * hop * 4 + n_mels * 4  # incl. the output block
    for FBb in (64, 48, 32, 24, 16, 8):
        for CB in (8, 4, 2, 1):
            if B % CB:
                continue
            rows = round_up(FBb + C - 1, SUBLANE)
            # 2x rows: the signal scratch is double-buffered (DMA prefetch)
            if CB * (FBb * per_cf + 2 * rows * hop * 4) <= budget:
                return CB, FBb
    return 1, 8


def melspectrogram_xla(
    y: jax.Array,  # (B, L)
    win: jax.Array,  # (n_fft,) padded window
    fb_t: jax.Array,  # (n_bins, n_mels) mel filterbank transposed
    *,
    n_fft: int,
    hop_length: int,
    center: bool,
    pad_mode: str,
    power: int = 2,
) -> jax.Array:
    """Pure-XLA composition of the fused kernel's exact pipeline.

    The single source of truth for the kernel's reference semantics: it is
    the forward the kernel's VJP differentiates (`_mel_vjp_fn`) AND the
    fallback the trainable frontend uses off-TPU, so the two can never
    drift. Any shape, any filterbank; ``power`` in {1, 2}.

    Uses plain ``jnp.fft.rfft`` rather than the packed-FFT fast path: the
    packed path's VJP hits an UNIMPLEMENTED op on some TPU runtimes, and
    this composition's jobs (backward pass, off-TPU fallback) need
    differentiability everywhere more than the last 2x of forward speed.
    """
    from ..ops._frames import frame_signal_batched

    if center:
        pad = n_fft // 2
        y = jnp.pad(y, ((0, 0), (pad, pad)), mode=pad_mode)
    frames = frame_signal_batched(y, n_fft, hop_length) * win
    n_bins = n_fft // 2 + 1
    from .bluestein import _DFT_MATMUL_MAX, _has_vma, rfft_vma_safe

    if _has_vma(frames) and n_fft <= _DFT_MATMUL_MAX:
        # Inside a vma-tracked shard_map (the tensor-parallel train step),
        # reverse mode through jnp.fft.rfft fails: jax's fft transpose rule
        # linearizes against a vma-less dummy aval and rejects the varying
        # cotangent. The DFT-GEMM spectrum differentiates as plain matmuls,
        # which are vma-aware.
        from .dft import forward_basis

        out = jnp.matmul(frames, forward_basis(n_fft),
                         precision=MATMUL_PRECISION)
        p = out[..., :n_bins] ** 2 + out[..., n_bins:] ** 2
    elif _has_vma(frames):
        # n_fft past the dense-basis budget (4096 < n_fft <= 8192): same vma
        # transpose problem, fixed with the transpose-free custom-vjp rfft
        # instead of a 268 MB DFT basis.
        spec = rfft_vma_safe(frames)
        p = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    else:
        spec = jnp.fft.rfft(frames, axis=-1)
        p = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    if power == 1:
        p = jnp.sqrt(p)
    return jnp.swapaxes(
        jnp.matmul(p, fb_t, precision=MATMUL_PRECISION), 1, 2
    )


def melspectrogram_pallas(
    y: jax.Array,  # (B, L)
    win: jax.Array,  # (n_fft,) padded window
    fb_t: jax.Array,  # (n_bins, n_mels) mel filterbank transposed
    *,
    n_fft: int,
    hop_length: int,
    center: bool,
    pad_mode: str,
    power: float = 2.0,
    fast_gemm: bool | None = None,
) -> jax.Array:
    """(B, L) -> (B, n_mels, F) mel spectrogram via the fused kernel.

    Requires :func:`radix_supported` and ``power`` in {1, 2}; any window
    array and any filterbank (the folding is an on-device gather).

    ``fast_gemm`` (default: `_config.ANALYSIS_FAST_GEMM`, True) runs the MXU
    contractions as 3-pass bf16 splits — ~2x the HIGHEST-precision kernel
    at 2.7e-5 max rel error, the same accuracy class as the XLA six-step
    fallback (2.4e-5). Pass False for the f32-exact (3e-7) kernel; callers
    whose downstream calibration assumes f32-exact spectra (pitch's ACF
    noise floors) do so.
    """
    if not radix_supported(n_fft, hop_length, fb_t.shape[1]):
        raise ValueError(
            f"fused mel kernel requires pow2 n_fft = C*hop, hop = R2*128, "
            f"C,R2 <= {_MAX_RADIX}, tables within the VMEM budget; got "
            f"n_fft={n_fft}, hop={hop_length}, n_mels={fb_t.shape[1]}"
        )
    if power not in (1.0, 2.0):
        raise ValueError(
            f"fused mel kernel supports power in {{1, 2}}, got {power}"
        )
    pad_total = n_fft if center else 0
    if y.shape[1] + pad_total < n_fft:
        raise ValueError(
            f"signal length ({y.shape[1]}) must be >= n_fft ({n_fft}) "
            "when center=False"
        )
    # device-cached tables fetched outside the jit so they stay resident in
    # HBM as arguments instead of baking into the executable as literals
    if fast_gemm is None:
        from .. import _config

        fast_gemm = _config.ANALYSIS_FAST_GEMM
    T = _twiddle_table(n_fft, hop_length)
    Bt = _basis_table(hop_length)
    return _mel_vjp_fn(
        n_fft, hop_length, center, pad_mode, int(power), bool(fast_gemm)
    )(y, win, fb_t, T, Bt)


@lru_cache(maxsize=32)
def _mel_vjp_fn(n_fft: int, hop_length: int, center: bool, pad_mode: str,
                power: int, fast_gemm: bool = False):
    """Kernel forward with an XLA-path backward: pallas_call has no autodiff
    rule, but the pipeline's math is plain XLA, so reverse-mode runs the
    reference composition's VJP (one extra XLA forward per backward pass)."""
    # kara=True: 3-GEMM Karatsuba complex base — measured on v5e
    # (benchmarks/kernel_ab_r04.json): batch-256 x 4 s mel 2.51 -> 2.19 ms
    # (fast GEMMs) and 4.30 -> 3.34 ms (exact); error stays ~2.7e-5 (fast,
    # bf16-split dominates) / ~7e-7 (exact) — both inside the mel ~1e-4
    # contract.
    kern = partial(
        _mel_radix_core, n_fft=n_fft, hop_length=hop_length, center=center,
        pad_mode=pad_mode, power=power, fast_gemm=fast_gemm, kara=True,
    )

    xla_ref = partial(
        melspectrogram_xla, n_fft=n_fft, hop_length=hop_length,
        center=center, pad_mode=pad_mode, power=power,
    )

    @jax.custom_vjp
    def f(y, win, fb_t, T, Bt):
        return kern(y, win, fb_t, T, Bt)

    def fwd(y, win, fb_t, T, Bt):
        return kern(y, win, fb_t, T, Bt), (y, win, fb_t, T, Bt)

    def bwd(res, ct):
        y, win, fb_t, T, Bt = res
        _, vjp = jax.vjp(xla_ref, y, win, fb_t)
        dy, dw, df = vjp(ct)
        return dy, dw, df, jnp.zeros_like(T), jnp.zeros_like(Bt)

    f.defvjp(fwd, bwd)
    return f


@partial(
    jax.jit,
    static_argnames=(
        "n_fft", "hop_length", "center", "pad_mode", "power", "fast_gemm",
        "kara",
    ),
)
def _mel_radix_core(
    y: jax.Array,
    win: jax.Array,
    fb_t: jax.Array,
    T: jax.Array,
    Bt: jax.Array,
    *,
    n_fft: int,
    hop_length: int,
    center: bool,
    pad_mode: str,
    power: int = 2,
    fast_gemm: bool = False,
    kara: bool = False,
) -> jax.Array:
    B, L = y.shape
    C = n_fft // hop_length
    R2 = hop_length // LANE
    NC = C // 2 + 1
    n_mels = fb_t.shape[1]

    fbf = fold_filterbank(fb_t, n_fft, hop_length)
    wch = win.reshape(C, hop_length)

    pad = n_fft // 2 if center else 0
    F = 1 + (L + 2 * pad - n_fft) // hop_length
    CB, FBb = _pick_blocks(B, C, R2, NC, hop_length, n_mels)
    FBb = min(FBb, round_up(F, SUBLANE))
    F_pad = round_up(F, FBb)
    FBk = round_up(FBb + C - 1, SUBLANE)
    R = F_pad + FBk  # every program's row DMA stays in bounds

    if center and pad_mode != "constant":
        yp = jnp.pad(y, ((0, 0), (pad, pad)), mode=pad_mode)
        yp = jnp.pad(yp, ((0, 0), (0, R * hop_length - L - 2 * pad)))
    else:
        yp = jnp.pad(y, ((0, 0), (pad, R * hop_length - L - pad)))
    sig2d = yp.reshape(B, R, hop_length)

    out = pl.pallas_call(
        _mel_radix_kernel_factory(
            CB, FBb, C, R2, NC, hop_length, FBk, power, F_pad // FBb,
            fast_gemm, kara,
        ),
        out_shape=vma_struct((B, F_pad, n_mels), jnp.float32, sig2d, fbf),
        grid=(B // CB, F_pad // FBb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((C, hop_length), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NC, 2, hop_length), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R2, 4, LANE, LANE), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NC * R2, LANE, n_mels), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (CB, FBb, n_mels), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, CB, FBk, hop_length), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=pallas_interpret_mode(),
    )(sig2d, wch, T, Bt, fbf)
    return jnp.swapaxes(out[:, :F, :], 1, 2)
