"""Fused STFT Pallas kernel (radix-decimated real DFT, natural-order output).

The same twice-decimated DFT machinery as the fused mel kernel
(`kernels/mel_fused.py`, see its module docstring for the algorithm) but
emitting the COMPLEX spectrum instead of mel energies: per group ``(r, r')``
the kernel writes the real and imaginary 128-lane blocks of bins
``k = r + C*r' + C*R2*j`` into a permuted layout; a single static XLA gather
(with a sign mask for conjugate-mirror classes, ``X[N-k] = conj(X[k])``)
restores librosa's natural bin order outside the kernel.

This is the "fused Pallas STFT kernel" of SURVEY.md §7 step 6(a) (reference
compiled-graph analog: `mlx_audio_primitives/stft.py:109-133`): pad, frame,
window, and transform happen in ONE kernel and the frames tensor never
exists in HBM.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.dispatch import pallas_interpret_mode, vma_struct
from .block_policy import LANE, SUBLANE, VMEM_BUDGET, radix_shape_ok, round_up
from .mel_fused import (
    _basis_table,
    _double_buffered_rows,
    _radix_group_spectra,
    _twiddle_table,
)


def stft_radix_supported(n_fft: int, hop_length: int) -> bool:
    """Same radix shape gates as the mel kernel, with the spectrum output
    block (2*G*128 lanes per frame) in the VMEM estimate instead of a mel
    filterbank."""
    if not radix_shape_ok(n_fft, hop_length):
        return False
    C = n_fft // hop_length
    R2 = hop_length // LANE
    NC = C // 2 + 1
    G = NC * R2
    tables = C * hop_length * 4 + NC * 2 * hop_length * 4 + R2 * 4 * LANE * LANE * 4
    min_rows = round_up(8 + C - 1, SUBLANE)
    min_block = 8 * (
        (C + 2 * NC + 4) * hop_length * 4 + 2 * G * LANE * 4
    ) + 2 * min_rows * hop_length * 4  # double-buffered row scratch
    return tables + min_block <= VMEM_BUDGET


@lru_cache(maxsize=8)
def _natural_maps(n_fft: int, hop: int) -> tuple[np.ndarray, np.ndarray]:
    """Host maps restoring natural bin order from the kernel's group layout.

    Returns ``(pos, sgn)`` of shape (n_bins,): natural bin ``k`` lives at
    flat position ``pos[k]`` of the ``(G*128,)`` group axis — read directly
    when its class ``r = k mod C <= C/2``, else read from the conjugate
    mirror ``n_fft - k`` with the imaginary part negated (``sgn[k] = -1``).
    """
    C = n_fft // hop
    R2 = hop // LANE
    n_bins = n_fft // 2 + 1
    k = np.arange(n_bins)
    r = k % C
    direct = r <= C // 2
    kk = np.where(direct, k, n_fft - k)
    sgn = np.where(direct, 1.0, -1.0).astype(np.float32)
    rr = kk % C
    m = (kk - rr) // C
    rp = m % R2
    j = m // R2
    pos = ((rr * R2 + rp) * LANE + j).astype(np.int32)
    return pos, sgn


@lru_cache(maxsize=8)
def _group_maps(n_fft: int, hop: int) -> tuple[np.ndarray, np.ndarray]:
    """The inverse of :func:`_natural_maps`: ``(G*128,)`` gather index + imag
    sign building the group layout from the natural rDFT spectrum — flat
    group position ``p = (r*R2 + r')*128 + j`` holds full-DFT bin
    ``k = r + C*r' + C*R2*j``, read as ``X[k]`` when ``k < n_bins`` and as
    ``conj(X[n_fft - k])`` for conjugate mirrors (``sgn = -1``)."""
    C = n_fft // hop
    R2 = hop // LANE
    NC = C // 2 + 1
    n_bins = n_fft // 2 + 1
    G = NC * R2
    kmap = np.zeros(G * LANE, np.int32)
    sgn = np.zeros(G * LANE, np.float32)
    for r in range(NC):
        for rp in range(R2):
            g = r * R2 + rp
            k = r + C * rp + C * R2 * np.arange(LANE)
            direct = k < n_bins
            kmap[g * LANE : (g + 1) * LANE] = np.where(direct, k, n_fft - k)
            sgn[g * LANE : (g + 1) * LANE] = np.where(direct, 1.0, -1.0)
    return kmap, sgn


def group_spectrum(S: jax.Array, n_fft: int, hop_length: int) -> jax.Array:
    """Natural frames-major complex spectrum ``(B, F, n_bins)`` -> the radix
    kernels' group layout ``(B, F, 2*G*128)`` (reals | imags). Plain
    differentiable XLA (a static gather + sign mask)."""
    kmap, sgn = _group_maps(n_fft, hop_length)
    km = jnp.asarray(kmap)
    xr = jnp.real(S)[:, :, km]
    xi = jnp.imag(S)[:, :, km] * jnp.asarray(sgn)
    return jnp.concatenate([xr, xi], axis=-1)


def naturalize_spectrum(xg: jax.Array, n_fft: int, hop_length: int) -> jax.Array:
    """Group layout ``(B, F, 2*G*128)`` -> natural complex ``(B, n_bins, F)``
    (librosa convention). Plain differentiable XLA."""
    C = n_fft // hop_length
    R2 = hop_length // LANE
    G = (C // 2 + 1) * R2
    pos, sgn = _natural_maps(n_fft, hop_length)
    pos_d = jnp.asarray(pos)
    xr = xg[:, :, pos_d]
    xi = xg[:, :, G * LANE + pos_d] * jnp.asarray(sgn)
    return jnp.swapaxes(jax.lax.complex(xr, xi), 1, 2)


def stft_magnitude_pallas(
    y: jax.Array,
    win: jax.Array,
    *,
    n_fft: int,
    hop_length: int,
    center: bool,
    pad_mode: str,
    fast_gemm: bool | None = None,
) -> jax.Array:
    """``|stft(y)|`` (B, n_bins, F) via the fused kernel with a HALF-traffic
    naturalize: magnitudes are formed in the group layout (|X[N-k]| = |X[k]|
    — no sign mask, no imaginary plane), so restoring librosa's bin order is
    ONE real gather instead of the complex spectrum's two-plane gather +
    complex materialization. Measured 2.0x `stft_pallas`+abs at
    batch-64 x 4 s.

    This is the spectral-feature magnitude path (not a reconstruction path),
    so ``fast_gemm`` defaults to `_config.ANALYSIS_FAST_GEMM` — 3-pass
    bf16-split GEMMs at ~2.7e-5 rel, inside the features' ~1e-4 budget."""
    if fast_gemm is None:
        from .. import _config

        fast_gemm = _config.ANALYSIS_FAST_GEMM
    pad_total = n_fft if center else 0
    F = 1 + (y.shape[1] + pad_total - n_fft) // hop_length
    pos, _ = _natural_maps(n_fft, hop_length)
    if F >= 64:
        # scale regime: transposed-emit + coalesced row gather (same
        # routing rule as `stft_pallas`; |X[N-k]| = |X[k]|, so magnitudes
        # need no sign mask in either layout)
        xt = stft_pallas_grouped_t(
            y, win, n_fft=n_fft, hop_length=hop_length, center=center,
            pad_mode=pad_mode, fast_gemm=fast_gemm, kara=fast_gemm,
        )
        B = xt.shape[0]
        flat = xt.reshape(B, 2, -1, xt.shape[-1])
        pos_d = jnp.asarray(pos)
        xr = flat[:, 0, pos_d, :]
        xi = flat[:, 1, pos_d, :]
        return jnp.sqrt(xr * xr + xi * xi)
    xg = stft_pallas_grouped(
        y, win, n_fft=n_fft, hop_length=hop_length, center=center,
        pad_mode=pad_mode, fast_gemm=fast_gemm, kara=fast_gemm,
    )
    C = n_fft // hop_length
    R2 = hop_length // LANE
    G = (C // 2 + 1) * R2
    xr = xg[..., : G * LANE]
    xi = xg[..., G * LANE :]
    m = jnp.sqrt(xr * xr + xi * xi)
    return jnp.swapaxes(m[:, :, jnp.asarray(pos)], 1, 2)


def naturalize_spectrum_t(xt: jax.Array, n_fft: int, hop_length: int) -> jax.Array:
    """Transposed group layout ``(B, 2, G, 128, F)`` -> natural complex
    ``(B, n_bins, F)``.

    The transposed layout puts FRAMES on the minor axis, so restoring
    librosa's bin order is a ROW gather — every gathered element is a
    contiguous ``(F,)`` row — followed by one elementwise sign/complex
    pass. No transpose: the kernel already paid it in VMEM (where it is
    cheap) instead of XLA paying a strided HBM pass (where it is not).
    """
    B = xt.shape[0]
    F = xt.shape[-1]
    pos, sgn = _natural_maps(n_fft, hop_length)
    flat = xt.reshape(B, 2, -1, F)
    pos_d = jnp.asarray(pos)
    xr = flat[:, 0, pos_d, :]
    xi = flat[:, 1, pos_d, :] * jnp.asarray(sgn)[:, None]
    return jax.lax.complex(xr, xi)


def group_spectrum_nat_t(S: jax.Array, n_fft: int, hop_length: int) -> jax.Array:
    """Natural complex spectrum ``(B, n_bins, F)`` (librosa convention,
    frames MINOR) -> the flat transposed group layout ``(B, 2*G*128, F)``
    consumed by the transposed-intake fused ISTFT
    (`istft_fused.py::istft_pallas_t`).

    The symmetric twin of :func:`naturalize_spectrum_t`: because frames stay
    on the minor axis on BOTH sides, every gathered element is a contiguous
    ``(F,)`` row — a coalesced row gather plus one elementwise sign pass,
    instead of the frames-major :func:`group_spectrum`'s minor-axis gather
    (which XLA fuses with the caller's swapaxes into a strided
    transpose-gather HBM pass). Plain differentiable XLA."""
    kmap, sgn = _group_maps(n_fft, hop_length)
    km = jnp.asarray(kmap)
    xr = jnp.real(S)[:, km, :]
    xi = jnp.imag(S)[:, km, :] * jnp.asarray(sgn)[:, None]
    return jnp.concatenate([xr, xi], axis=1)


def group_spectrum_t(S_fm: jax.Array, n_fft: int, hop_length: int) -> jax.Array:
    """Frames-major natural complex spectrum ``(B, F, n_bins)`` -> the
    transposed group layout ``(B, 2, G, 128, F)``. Plain differentiable XLA
    (the t-kernel's reference emitter, used by its VJP)."""
    C = n_fft // hop_length
    R2 = hop_length // LANE
    G = (C // 2 + 1) * R2
    kmap, sgn = _group_maps(n_fft, hop_length)
    km = jnp.asarray(kmap)
    xr = jnp.real(S_fm)[:, :, km]
    xi = jnp.imag(S_fm)[:, :, km] * jnp.asarray(sgn)
    x = jnp.swapaxes(jnp.stack([xr, xi], 1), 2, 3)  # (B, 2, G*128, F)
    B, _, _, F = x.shape
    return x.reshape(B, 2, G, LANE, F)


@lru_cache(maxsize=32)
def _stft_t_vjp_fn(n_fft: int, hop_length: int, center: bool,
                   pad_mode: str, fast_gemm: bool = False,
                   kara: bool = False):
    """Kernel forward, XLA-composition backward for the transposed-emit
    core (same contract as `_stft_grouped_vjp_fn`)."""
    kern = partial(
        _stft_radix_core_t, n_fft=n_fft, hop_length=hop_length,
        center=center, pad_mode=pad_mode, fast_gemm=fast_gemm, kara=kara,
    )

    def xla_ref(y, win):
        from ..ops._frames import frame_signal_batched

        if center:
            pad = n_fft // 2
            y = jnp.pad(y, ((0, 0), (pad, pad)), mode=pad_mode)
        frames = frame_signal_batched(y, n_fft, hop_length) * win
        return group_spectrum_t(
            jnp.fft.rfft(frames, axis=-1), n_fft, hop_length
        )

    @jax.custom_vjp
    def f(y, win, T, Bt):
        return kern(y, win, T, Bt)

    def fwd(y, win, T, Bt):
        return kern(y, win, T, Bt), (y, win, T, Bt)

    def bwd(res, ct):
        y, win, T, Bt = res
        _, vjp = jax.vjp(xla_ref, y, win)
        dy, dw = vjp(ct)
        return dy, dw, jnp.zeros_like(T), jnp.zeros_like(Bt)

    f.defvjp(fwd, bwd)
    return f


def _stft_radix_t_kernel_factory(CB, FBb, C, R2, NC, HOP, FBk, GJ, FAST=False,
                                 KARA=False):
    """Transposed-emit variant: per group, transpose the (CB, FBb, 128)
    spectrum tile to (CB, 128, FBb) in VMEM and store it frames-minor, so
    the XLA naturalize is a coalesced row gather (`naturalize_spectrum_t`)
    instead of a minor-axis gather + full transpose."""

    def kernel(sig_hbm, w_ref, t_ref, b_ref, out_ref, sig_scr, sem):
        cur = _double_buffered_rows(sig_hbm, sig_scr, sem, CB, FBb, FBk, GJ)

        for g, xr, xi in _radix_group_spectra(
            cur, w_ref, t_ref, b_ref, C, R2, NC, FBb, FAST, KARA
        ):
            out_ref[:, 0, g] = jnp.swapaxes(xr, 1, 2)
            out_ref[:, 1, g] = jnp.swapaxes(xi, 1, 2)

    return kernel


def stft_pallas_grouped_t(
    y: jax.Array,
    win: jax.Array,
    *,
    n_fft: int,
    hop_length: int,
    center: bool,
    pad_mode: str,
    fast_gemm: bool = False,
    kara: bool = False,
) -> jax.Array:
    """(B, L) -> float32 (B, 2, G, 128, F) STFT in the transposed group
    layout (planes r/i, frames minor). See :func:`naturalize_spectrum_t`."""
    if not stft_radix_supported(n_fft, hop_length):
        raise ValueError(
            f"fused STFT kernel requires pow2 n_fft = C*hop, hop = R2*128 "
            f"within the VMEM budget; got n_fft={n_fft}, hop={hop_length}"
        )
    pad_total = n_fft if center else 0
    if y.shape[1] + pad_total < n_fft:
        raise ValueError(
            f"signal length ({y.shape[1]}) must be >= n_fft ({n_fft}) "
            "when center=False"
        )
    T = _twiddle_table(n_fft, hop_length)
    Bt = _basis_table(hop_length)
    return _stft_t_vjp_fn(
        n_fft, hop_length, center, pad_mode, bool(fast_gemm), bool(kara)
    )(y, win, T, Bt)


@partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "center", "pad_mode", "fast_gemm",
                     "kara"),
)
def _stft_radix_core_t(
    y: jax.Array,
    win: jax.Array,
    T: jax.Array,
    Bt: jax.Array,
    *,
    n_fft: int,
    hop_length: int,
    center: bool,
    pad_mode: str,
    fast_gemm: bool = False,
    kara: bool = False,
) -> jax.Array:
    """Kernel driver: (B, L) -> transposed group layout (B, 2, G, 128, F)."""
    B, L = y.shape
    C = n_fft // hop_length
    R2 = hop_length // LANE
    NC = C // 2 + 1
    G = NC * R2

    wch = win.reshape(C, hop_length)
    pad = n_fft // 2 if center else 0
    F = 1 + (L + 2 * pad - n_fft) // hop_length
    # frames are the output block's MINOR dim here, so Mosaic requires the
    # frame block to be 128-divisible or span the whole frame axis: prefer
    # one full-extent block (no padded-frame waste) while it fits VMEM at
    # CB=1, else fall back to 128-frame blocks
    CB, FBb = _pick_blocks_stft(B, C, R2, NC, hop_length)
    Fp8 = round_up(F, SUBLANE)
    tables = (C * hop_length + NC * 2 * hop_length
              + R2 * 4 * LANE * LANE) * 4
    per_cf = (C + 2 * NC + 4) * hop_length * 4 + 2 * G * LANE * 4

    def _fits(cb, fbb):
        rows = round_up(fbb + C - 1, SUBLANE)
        return (cb * (fbb * per_cf + 2 * rows * hop_length * 4)
                <= VMEM_BUDGET - tables)

    if FBb >= Fp8:
        FBb = Fp8
    elif _fits(1, Fp8):
        FBb = Fp8
        while CB > 1 and not _fits(CB, FBb):
            CB //= 2
    else:
        FBb = LANE
        while CB > 1 and not _fits(CB, FBb):
            CB //= 2
    F_pad = round_up(F, FBb)
    FBk = round_up(FBb + C - 1, SUBLANE)
    R = F_pad + FBk

    if center and pad_mode != "constant":
        yp = jnp.pad(y, ((0, 0), (pad, pad)), mode=pad_mode)
        yp = jnp.pad(yp, ((0, 0), (0, R * hop_length - L - 2 * pad)))
    else:
        yp = jnp.pad(y, ((0, 0), (pad, R * hop_length - L - pad)))
    sig2d = yp.reshape(B, R, hop_length)

    out = pl.pallas_call(
        _stft_radix_t_kernel_factory(
            CB, FBb, C, R2, NC, hop_length, FBk, F_pad // FBb, fast_gemm,
            kara,
        ),
        out_shape=vma_struct((B, 2, G, LANE, F_pad), jnp.float32, sig2d),
        grid=(B // CB, F_pad // FBb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((C, hop_length), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NC, 2, hop_length), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R2, 4, LANE, LANE), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (CB, 2, G, LANE, FBb), lambda i, j: (i, 0, 0, 0, j),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, CB, FBk, hop_length), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=pallas_interpret_mode(),
    )(sig2d, wch, T, Bt)
    return out[..., :F]


def _stft_radix_kernel_factory(CB, FBb, C, R2, NC, HOP, FBk, GJ, FAST=False,
                               KARA=False):
    """Kernel: DMA rows -> shared radix body (`mel_fused._radix_group_spectra`)
    -> write (xr | xi) group blocks; differs from the mel kernel only in the
    consumer of each group's complex spectrum. ``FAST`` selects the 3-pass
    bf16-split GEMMs (`mel_fused._group_dot`)."""

    def kernel(sig_hbm, w_ref, t_ref, b_ref, out_ref, sig_scr, sem):
        cur = _double_buffered_rows(sig_hbm, sig_scr, sem, CB, FBb, FBk, GJ)

        G = NC * R2
        for g, xr, xi in _radix_group_spectra(
            cur, w_ref, t_ref, b_ref, C, R2, NC, FBb, FAST, KARA
        ):
            # store each group's 128-lane slices as produced: no full-width
            # concat buffer in VMEM, and stores overlap the next group's GEMMs
            out_ref[..., g * LANE : (g + 1) * LANE] = xr
            out_ref[..., (G + g) * LANE : (G + g + 1) * LANE] = xi

    return kernel


def _pick_blocks_stft(B: int, C: int, R2: int, NC: int, hop: int) -> tuple[int, int]:
    G = NC * R2
    tables = C * hop * 4 + NC * 2 * hop * 4 + R2 * 4 * LANE * LANE * 4
    budget = VMEM_BUDGET - tables
    per_cf = (C + 2 * NC + 4) * hop * 4 + 2 * G * LANE * 4
    for FBb in (64, 48, 32, 24, 16, 8):
        for CB in (8, 4, 2, 1):
            if B % CB:
                continue
            rows = round_up(FBb + C - 1, SUBLANE)
            # 2x rows: the signal scratch is double-buffered (DMA prefetch)
            if CB * (FBb * per_cf + 2 * rows * hop * 4) <= budget:
                return CB, FBb
    return 1, 8


def stft_pallas(
    y: jax.Array,  # (B, L)
    win: jax.Array,  # (n_fft,) padded window
    *,
    n_fft: int,
    hop_length: int,
    center: bool,
    pad_mode: str,
) -> jax.Array:
    """(B, L) -> complex64 (B, n_bins, F) STFT via the fused radix kernel.

    Layout routing (measured on v5e, `benchmarks/kernel_ab_r04.json`): for
    long clips (F >= 64 frames) the transposed-emit kernel + coalesced
    row-gather naturalize wins (batch-64 x 2 s: 0.37 vs 0.83 ms; x 4 s:
    1.64 vs 2.03 ms) because the group->natural gather+transpose tax
    dominates at scale; short clips keep the grouped kernel + minor-axis
    gather (batch-64 x 1 s: 0.12 vs 0.24 ms), where the in-kernel VMEM
    transpose does not amortize.
    """
    pad_total = n_fft if center else 0
    F = 1 + (y.shape[1] + pad_total - n_fft) // hop_length
    if F >= 64:
        xt = stft_pallas_grouped_t(
            y, win, n_fft=n_fft, hop_length=hop_length, center=center,
            pad_mode=pad_mode,
        )
        return naturalize_spectrum_t(xt, n_fft, hop_length)
    xg = stft_pallas_grouped(
        y, win, n_fft=n_fft, hop_length=hop_length, center=center,
        pad_mode=pad_mode,
    )
    return naturalize_spectrum(xg, n_fft, hop_length)


def stft_pallas_grouped(
    y: jax.Array,  # (B, L)
    win: jax.Array,  # (n_fft,) padded window
    *,
    n_fft: int,
    hop_length: int,
    center: bool,
    pad_mode: str,
    fast_gemm: bool = False,
    kara: bool = False,
) -> jax.Array:
    """(B, L) -> float32 (B, F, 2*G*128) STFT in the kernel's native group
    layout (see :func:`_group_maps`), skipping the naturalize gather.

    The group layout is the exact input layout of the fused inverse kernel
    (`istft_fused.py`), so spectral round-trips (e.g. the Griffin-Lim
    iteration) can stay in it and avoid both per-iteration layout gathers.

    ``fast_gemm`` defaults to False (f32-exact HIGHEST GEMMs): the public
    ``stft`` rides this path and carries the round-trip <=1e-5 guarantee.
    Analysis consumers with ~1e-4 budgets (the feature magnitude path,
    Griffin-Lim's loop) opt into the 3-pass bf16-split GEMMs explicitly.
    """
    if not stft_radix_supported(n_fft, hop_length):
        raise ValueError(
            f"fused STFT kernel requires pow2 n_fft = C*hop, hop = R2*128 "
            f"within the VMEM budget; got n_fft={n_fft}, hop={hop_length}"
        )
    pad_total = n_fft if center else 0
    if y.shape[1] + pad_total < n_fft:
        raise ValueError(
            f"signal length ({y.shape[1]}) must be >= n_fft ({n_fft}) "
            "when center=False"
        )
    T = _twiddle_table(n_fft, hop_length)
    Bt = _basis_table(hop_length)
    return _stft_grouped_vjp_fn(
        n_fft, hop_length, center, pad_mode, bool(fast_gemm), bool(kara)
    )(y, win, T, Bt)


@lru_cache(maxsize=32)
def _stft_grouped_vjp_fn(n_fft: int, hop_length: int, center: bool,
                         pad_mode: str, fast_gemm: bool = False,
                         kara: bool = False):
    """Kernel forward, XLA-composition backward (the STFT is linear, so the
    VJP is one XLA transform; pallas_call itself has no autodiff rule).

    The XLA reference emits the same group layout (natural rfft + the
    ``_group_maps`` gather), so the adjoint is exact for the grouped output;
    composed with the differentiable :func:`naturalize_spectrum` gather it
    also yields the exact natural-layout adjoint of :func:`stft_pallas`.
    """
    kern = partial(
        _stft_radix_core, n_fft=n_fft, hop_length=hop_length, center=center,
        pad_mode=pad_mode, fast_gemm=fast_gemm, kara=kara,
    )

    def xla_ref(y, win):
        # plain jnp.fft.rfft (NOT the packed path): its transpose is the
        # plain-rfft adjoint, which restrictive TPU runtimes accept —
        # verified on-chip up to n_fft=8192 (the session-killing transposes
        # were the packed FFT's and the complex-slice squeeze's, both fixed
        # at their sources)
        from ..ops._frames import frame_signal_batched

        if center:
            pad = n_fft // 2
            y = jnp.pad(y, ((0, 0), (pad, pad)), mode=pad_mode)
        frames = frame_signal_batched(y, n_fft, hop_length) * win
        return group_spectrum(jnp.fft.rfft(frames, axis=-1), n_fft, hop_length)

    @jax.custom_vjp
    def f(y, win, T, Bt):
        return kern(y, win, T, Bt)

    def fwd(y, win, T, Bt):
        return kern(y, win, T, Bt), (y, win, T, Bt)

    def bwd(res, ct):
        y, win, T, Bt = res
        _, vjp = jax.vjp(xla_ref, y, win)
        dy, dw = vjp(ct)
        return dy, dw, jnp.zeros_like(T), jnp.zeros_like(Bt)

    f.defvjp(fwd, bwd)
    return f


@partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "center", "pad_mode", "fast_gemm",
                     "kara"),
)
def _stft_radix_core(
    y: jax.Array,
    win: jax.Array,
    T: jax.Array,
    Bt: jax.Array,
    *,
    n_fft: int,
    hop_length: int,
    center: bool,
    pad_mode: str,
    fast_gemm: bool = False,
    kara: bool = False,
) -> jax.Array:
    """Kernel driver: (B, L) -> group-layout float32 (B, F, 2*G*128)."""
    B, L = y.shape
    C = n_fft // hop_length
    R2 = hop_length // LANE
    NC = C // 2 + 1
    G = NC * R2

    wch = win.reshape(C, hop_length)
    pad = n_fft // 2 if center else 0
    F = 1 + (L + 2 * pad - n_fft) // hop_length
    CB, FBb = _pick_blocks_stft(B, C, R2, NC, hop_length)
    FBb = min(FBb, round_up(F, SUBLANE))
    F_pad = round_up(F, FBb)
    FBk = round_up(FBb + C - 1, SUBLANE)
    R = F_pad + FBk

    if center and pad_mode != "constant":
        yp = jnp.pad(y, ((0, 0), (pad, pad)), mode=pad_mode)
        yp = jnp.pad(yp, ((0, 0), (0, R * hop_length - L - 2 * pad)))
    else:
        yp = jnp.pad(y, ((0, 0), (pad, R * hop_length - L - pad)))
    sig2d = yp.reshape(B, R, hop_length)

    out = pl.pallas_call(
        _stft_radix_kernel_factory(
            CB, FBb, C, R2, NC, hop_length, FBk, F_pad // FBb, fast_gemm,
            kara,
        ),
        # vma_struct: under vma-tracked shard_map the output must carry the
        # operands' varying axes; degrades to a plain struct outside
        out_shape=vma_struct((B, F_pad, 2 * G * LANE), jnp.float32, sig2d),
        grid=(B // CB, F_pad // FBb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((C, hop_length), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NC, 2, hop_length), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R2, 4, LANE, LANE), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (CB, FBb, 2 * G * LANE), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, CB, FBk, hop_length), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=pallas_interpret_mode(),
    )(sig2d, wch, T, Bt)
    return out[:, :F, :]
