"""Griffin-Lim phase reconstruction — the iterate loop lives on device.

Parity: `mlx_audio_primitives/griffinlim.py:17-284`.

TPU-native design (the north-star requirement): the reference drives the
istft->stft->phase loop from Python, one lazy graph per iteration
(`griffinlim.py:129-180`). Here the ENTIRE n_iter loop is a
``lax.fori_loop`` inside ONE jitted core — XLA compiles a single program, the
squared-window envelope is hoisted out of the loop (it never changes), and
no host round-trip happens until the final signal.

Numerical details preserved exactly:
* seeded ``np.random.default_rng`` phase init on the host (`:112-119`),
* +/-1-frame shape fixup, static under jit (`:156-165`),
* Perraudin momentum ``rebuilt = new + m*(new - prev)`` (`:176-179`),
* the phase-projection ``S * exp(i*angle(X))`` is computed as
  ``S * X/|X|`` with the |X|=0 -> phase 0 convention (equivalent to
  arctan2(0,0)=0, cheaper than trig).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .._config import REAL_DTYPE, WINDOW_SUM_EPSILON
from ..kernels.bluestein import rfft_len
from ..kernels.dft import forward_basis, inverse_basis, rdft_matmul
from ..utils.validation import validate_positive
from ._frames import frame_signal_batched, window_envelope
from .stft import _get_padded_window, _resolve_fft_mode, istft, magnitude, phase, stft

ArrayLike = Any


@partial(
    jax.jit,
    static_argnames=(
        "n_fft",
        "hop_length",
        "center",
        "pad_mode",
        "length",
        "n_iter",
        "momentum",
        "fft_mode",
        "pallas_mode",
    ),
)
def _griffinlim_core(
    S: jax.Array,  # (B, F, n_bins) magnitude
    angles0: jax.Array,  # (B, F, n_bins) initial phase
    win: jax.Array,
    fwd_basis: jax.Array | None,
    inv_basis: jax.Array | None,
    *,
    n_fft: int,
    hop_length: int,
    center: bool,
    pad_mode: str,
    length: int | None,
    n_iter: int,
    momentum: float,
    fft_mode: str,
    pallas_mode: str,
) -> jax.Array:
    B, F, n_bins = S.shape
    pad = n_fft // 2

    # --- static shape bookkeeping -----------------------------------------
    if length is not None:
        padded_length = length + n_fft if center else length
    else:
        padded_length = n_fft + (F - 1) * hop_length

    # istft output signal length after trims
    if center:
        L_sig = length if length is not None else max(padded_length - 2 * pad, 0)
    else:
        L_sig = length if length is not None else padded_length

    # loop-invariant squared-window envelope
    env = window_envelope(win, F, hop_length, padded_length)
    env = jnp.maximum(env, WINDOW_SUM_EPSILON)

    if pallas_mode == "fused":
        # Group-layout loop: both fused kernels natively speak the radix
        # group layout (`stft_radix.py::_group_maps`); staying in it skips
        # the two per-iteration layout gathers (naturalize after the forward
        # kernel, re-group before the inverse) that a natural-layout loop
        # pays. Entry/exit conversions happen ONCE, and the magnitude
        # projection is elementwise in any layout (mirror positions carry
        # conjugate values, which projection onto a mirror-consistent
        # magnitude preserves).
        return _griffinlim_grouped_core(
            S, angles0, win, env,
            n_fft=n_fft, hop_length=hop_length, center=center,
            pad_mode=pad_mode, length=length, n_iter=n_iter,
            momentum=momentum, padded_length=padded_length, L_sig=L_sig,
        )

    from .stft import _istft_core

    def istft_step(spec: jax.Array) -> jax.Array:
        # shared three-tier dispatch body with ops.stft.istft (fused kernel /
        # XLA inverse + fused OLA kernel / pure XLA); pallas_call traces into
        # the fori_loop body like any other primitive
        y = _istft_core(
            spec, win, inv_basis, env,
            n_fft=n_fft, hop_length=hop_length, padded_length=padded_length,
            fft_mode=fft_mode, pallas_mode=pallas_mode,
        )
        if center:
            return jax.lax.slice_in_dim(y, pad, pad + L_sig, axis=1)
        if length is not None and length < y.shape[1]:
            return y[:, :length]
        if length is not None and length > y.shape[1]:
            return jnp.pad(y, ((0, 0), (0, length - y.shape[1])))
        return y

    def stft_step(y: jax.Array) -> jax.Array:
        if center:
            y = jnp.pad(y, ((0, 0), (pad, pad)), mode=pad_mode)
        frames = frame_signal_batched(y, n_fft, hop_length) * win
        if fft_mode == "matmul":
            spec = rdft_matmul(frames, n_fft, fwd_basis)
        elif fft_mode == "sixstep":
            from ..kernels.sixstep import rfft_sixstep

            spec = rfft_sixstep(frames, n_fft)
        else:
            spec = rfft_len(frames, n_fft)
        # +/-1 frame fixup (static): crop or zero-pad the frame axis to F
        F2 = spec.shape[1]
        if F2 > F:
            spec = spec[:, :F, :]
        elif F2 < F:
            spec = jnp.pad(spec, ((0, 0), (0, F - F2), (0, 0)))
        return spec

    def project(spec: jax.Array) -> jax.Array:
        """Magnitude constraint: S * spec/|spec| with |spec|=0 -> real S."""
        mag = jnp.abs(spec)
        safe = jnp.where(mag > 0, mag, 1.0)
        unit = jnp.where(mag > 0, spec / safe, 1.0 + 0.0j)
        return S * unit

    rebuilt = S * jax.lax.complex(jnp.cos(angles0), jnp.sin(angles0))
    tprev = rebuilt

    def body(_, carry):
        rebuilt, tprev = carry
        new = project(stft_step(istft_step(rebuilt)))
        if momentum > 0:
            return new + momentum * (new - tprev), new
        return new, new

    rebuilt, _ = jax.lax.fori_loop(0, n_iter, body, (rebuilt, tprev))
    return istft_step(rebuilt)


def _griffinlim_grouped_core(
    S: jax.Array,  # (B, F, n_bins) magnitude
    angles0: jax.Array,  # (B, F, n_bins) initial phase
    win: jax.Array,
    env: jax.Array,  # clamped squared-window envelope
    *,
    n_fft: int,
    hop_length: int,
    center: bool,
    pad_mode: str,
    length: int | None,
    n_iter: int,
    momentum: float,
    padded_length: int,
    L_sig: int,
) -> jax.Array:
    """The Griffin-Lim loop entirely in the radix kernels' group layout.

    Runs inside `_griffinlim_core`'s jit; both transforms per iteration are
    single fused Pallas kernels with NO layout gathers in between — the
    group-layout spectrum ``(B, F, 2*G*128)`` flows directly from
    ``stft_pallas_grouped`` into ``istft_pallas_grouped``.
    """
    from ..kernels.istft_fused import istft_pallas_grouped
    from ..kernels.stft_radix import _group_maps, stft_pallas_grouped

    B, F, _n_bins = S.shape
    pad = n_fft // 2
    kmap, sgn = _group_maps(n_fft, hop_length)
    km = jnp.asarray(kmap)
    sg = jnp.asarray(sgn)
    GL = km.shape[0]  # G*128

    # grouped target magnitude: |X[N-k]| = |X[k]|, so the plain gather (no
    # sign) is the magnitude at every group position
    Sg = S[:, :, km]

    # 3-pass bf16-split GEMMs in both per-iteration transforms: their
    # ~2.7e-5 spectral noise is orders of magnitude below the Griffin-Lim
    # iteration's own convergence error, and the GEMMs dominate the loop
    from .._config import ANALYSIS_FAST_GEMM as _fast

    def istft_g(xg: jax.Array) -> jax.Array:
        y = istft_pallas_grouped(
            xg, win, env, n_fft=n_fft, hop_length=hop_length,
            padded_length=padded_length, fast_gemm=_fast,
        )
        if center:
            return jax.lax.slice_in_dim(y, pad, pad + L_sig, axis=1)
        if length is not None and length < y.shape[1]:
            return y[:, :length]
        if length is not None and length > y.shape[1]:
            return jnp.pad(y, ((0, 0), (0, length - y.shape[1])))
        return y

    def stft_g(y: jax.Array) -> jax.Array:
        xg = stft_pallas_grouped(
            y, win, n_fft=n_fft, hop_length=hop_length, center=center,
            pad_mode=pad_mode, fast_gemm=_fast, kara=_fast,
        )
        # +/-1 frame fixup (static): crop or zero-pad the frame axis to F
        F2 = xg.shape[1]
        if F2 > F:
            xg = xg[:, :F, :]
        elif F2 < F:
            xg = jnp.pad(xg, ((0, 0), (0, F - F2), (0, 0)))
        return xg

    def project_g(xg: jax.Array) -> jax.Array:
        """S * xg/|xg| per group position, |xg|=0 -> real S (phase 0) — the
        plane form of the natural-layout projection, no complex arithmetic."""
        xr, xi = xg[:, :, :GL], xg[:, :, GL:]
        mag = jnp.sqrt(xr * xr + xi * xi)
        nz = mag > 0
        safe = jnp.where(nz, mag, 1.0)
        ur = jnp.where(nz, xr / safe, 1.0)
        ui = jnp.where(nz, xi / safe, 0.0)
        return jnp.concatenate([Sg * ur, Sg * ui], axis=-1)

    # initial rebuilt = S * e^{i*angles}, built directly in group layout
    # (mirror positions take the conjugate phase via the sign mask)
    xr0 = (S * jnp.cos(angles0))[:, :, km]
    xi0 = (S * jnp.sin(angles0))[:, :, km] * sg
    xg0 = jnp.concatenate([xr0, xi0], axis=-1)

    def body(_, carry):
        xg, tprev = carry
        new = project_g(stft_g(istft_g(xg)))
        if momentum > 0:
            return new + momentum * (new - tprev), new
        return new, new

    xg, _ = jax.lax.fori_loop(0, n_iter, body, (xg0, xg0))
    return istft_g(xg)


def griffinlim(
    S: ArrayLike,
    n_iter: int = 32,
    hop_length: int | None = None,
    win_length: int | None = None,
    n_fft: int | None = None,
    window: str | ArrayLike = "hann",
    center: bool = True,
    length: int | None = None,
    pad_mode: str = "constant",
    momentum: float = 0.99,
    init: str = "random",
    random_state: int | None = None,
    fft_mode: str = "auto",
    use_pallas: bool | None = None,
) -> jax.Array:
    """Griffin-Lim phase reconstruction from a magnitude spectrogram.

    librosa-compatible signature and semantics (reference
    `griffinlim.py:17-196`); the whole iteration runs in one compiled XLA
    program (see module docstring).
    """
    validate_positive(n_iter, "n_iter")
    # momentum in [0, 1): 0 = classic Griffin-Lim, <1 required for stability
    if not 0.0 <= momentum < 1.0:
        raise ValueError(f"momentum must be in [0, 1), got {momentum}")

    S = jnp.asarray(S, dtype=REAL_DTYPE)
    is_batched = S.ndim == 3
    if not is_batched:
        S = S[None]
    B, freq_bins, n_frames = S.shape

    if n_fft is None:
        n_fft = 2 * (freq_bins - 1)
    if hop_length is None:
        hop_length = n_fft // 4
    if win_length is None:
        win_length = n_fft
    if win_length > n_fft:
        raise ValueError(f"win_length ({win_length}) must be <= n_fft ({n_fft})")

    rng = np.random.default_rng(random_state)
    if init == "random":
        angles = jnp.asarray(
            rng.uniform(-np.pi, np.pi, (B, n_frames, freq_bins)).astype(np.float32)
        )
    elif init == "zeros":
        angles = jnp.zeros((B, n_frames, freq_bins), dtype=REAL_DTYPE)
    else:
        raise ValueError(f"Unknown init: '{init}'. Supported: 'random', 'zeros'")

    win = _get_padded_window(window, win_length, n_fft)
    # 'auto' stays on the packed FFT: GL's per-iteration transforms are small
    # (tens of frames), where six-step's reshuffles outweigh its MXU gains
    # (measured 1.59 vs 1.08 ms for 32 iters on v5e).
    fft_mode_r = _resolve_fft_mode(fft_mode, n_fft)
    from ..kernels.istft_fused import istft_fused_supported
    from ..kernels.overlap_add import ola_supported
    from ..kernels.stft_radix import stft_radix_supported
    from ..utils import dispatch as _dispatch

    # same tier policy as stft()/istft(): an explicit fft_mode pins the XLA
    # transforms (the OLA kernel tier still applies) unless use_pallas=True
    want = _dispatch.resolve_use_pallas(
        use_pallas, default_on_tpu=True
    ) and not _dispatch.is_batch_traced(S)
    if (
        want
        and (fft_mode == "auto" or use_pallas is True)
        and istft_fused_supported(n_fft, hop_length)
        and stft_radix_supported(n_fft, hop_length)
    ):
        pallas_mode = "fused"
    elif want and ola_supported(n_fft, hop_length):
        pallas_mode = "ola"
    else:
        pallas_mode = "none"
    need_basis = fft_mode_r == "matmul" and pallas_mode != "fused"
    fwd = forward_basis(n_fft) if need_basis else None
    inv = inverse_basis(n_fft) if need_basis else None

    y = _griffinlim_core(
        jnp.swapaxes(S, 1, 2),  # (B, F, n_bins)
        angles,
        win,
        fwd,
        inv,
        n_fft=n_fft,
        hop_length=hop_length,
        center=center,
        pad_mode=pad_mode,
        length=length,
        n_iter=n_iter,
        momentum=float(momentum),
        fft_mode=fft_mode_r,
        pallas_mode=pallas_mode,
    )
    return y[0] if not is_batched else y


def griffinlim_iter(
    S: ArrayLike,
    angles: ArrayLike,
    hop_length: int,
    win_length: int,
    n_fft: int,
    window: str | ArrayLike = "hann",
    center: bool = True,
    pad_mode: str = "constant",
    momentum: float = 0.99,
    tprev: ArrayLike | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One Griffin-Lim iteration: returns (new_angles, rebuilt, mse).

    Unexported single-step API for custom stopping criteria, matching the
    reference (`griffinlim.py:199-284`).
    """
    S = jnp.asarray(S, dtype=REAL_DTYPE)
    angles = jnp.asarray(angles, dtype=REAL_DTYPE)
    rebuilt = S * jax.lax.complex(jnp.cos(angles), jnp.sin(angles))
    y_est = istft(
        rebuilt,
        hop_length=hop_length,
        win_length=win_length,
        n_fft=n_fft,
        window=window,
        center=center,
    )
    rebuilt_new = stft(
        y_est,
        n_fft=n_fft,
        hop_length=hop_length,
        win_length=win_length,
        window=window,
        center=center,
        pad_mode=pad_mode,
    )
    # frame fixup
    F = S.shape[-1]
    F2 = rebuilt_new.shape[-1]
    if F2 > F:
        rebuilt_new = rebuilt_new[..., :F]
    elif F2 < F:
        widths = [(0, 0)] * (rebuilt_new.ndim - 1) + [(0, F - F2)]
        rebuilt_new = jnp.pad(rebuilt_new, widths)
    error = jnp.mean((S - magnitude(rebuilt_new)) ** 2)
    new_angles = phase(rebuilt_new)
    projected = S * jax.lax.complex(jnp.cos(new_angles), jnp.sin(new_angles))
    if momentum > 0 and tprev is not None:
        out = projected + momentum * (projected - jnp.asarray(tprev))
    else:
        out = projected
    return new_angles, out, error
