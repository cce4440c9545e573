"""Fused mel-spectrogram Pallas kernel.

The whole melspectrogram pipeline — frame, window, real DFT, |.|^2, mel
filterbank — in ONE kernel that never materializes frames or spectrum in HBM
(the TPU realization of the north-star "fused Pallas STFT kernel" +
"fused mel-power-matmul"; reference pipeline: `mlx_audio_primitives/
mel.py:309-350` over `stft.py:109-133`).

Formulation (per program, grid = (clip blocks, bin blocks)):

* the signal is viewed as hop-sized rows; one DMA stages a clip-block's rows
  into VMEM (k==0 only; the scratch persists across the bin-block axis);
* framing never happens: the windowed DFT is accumulated as C = ceil(n_fft/
  hop) *chunk matmuls* ``sum_c sig_rows[c:c+FB] @ basis_w[c*hop:(c+1)*hop]``
  where ``basis_w`` is the window-folded [cos | -sin] basis — the same chunk
  algebra as `ops/_frames.py`, executed on the MXU;
* power = rc^2 + rs^2 feeds the mel matmul; bin blocks stream through the
  grid's second axis and accumulate into the output block (sequential TPU
  grid => race-free revisiting).

Performance note (v5e, batch-64 x 1 s, slope-amortized): 0.97 ms at
HIGHEST precision — the XLA pipeline with the six-step MXU FFT
(`kernels/sixstep.py`, 0.39 ms) is the production default; this kernel is
the explicit-control path, selected via
``melspectrogram(..., use_pallas=True)``.

Future work: fusing the *six-step* transform inside this kernel (keeping the
twiddle stage in VMEM) would remove the remaining ~0.1 ms of HBM round-trips,
but Mosaic currently rejects the required minor-dim reshapes
("infer-vector-layout: unsupported shape cast" when splitting the frame axis
into (N1, N2) or merging (k1, k2) for the filterbank GEMM); revisit when
Mosaic's layout inference supports those casts.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .._config import MATMUL_PRECISION
from ..utils.cache import table_cache
from ..utils.dispatch import pallas_interpret_mode
from .block_policy import LANE, SUBLANE, cdiv, clips_per_block, round_up
from .dft import _forward_basis


@table_cache("mel_pallas_basis", maxsize=8)
def _windowed_split_basis(n_fft: int, win_key: tuple, bins_pad: int) -> np.ndarray:
    """(2, n_fft, bins_pad) [win*cos | -win*sin] float32 device table.

    ``win_key`` is the hashable window description ('name', n) used to
    rebuild the float64 window on the host.
    """
    from ..ops.windows import window_host

    name, n = win_key
    win = window_host(name, n)
    if n < n_fft:
        lp = (n_fft - n) // 2
        win = np.pad(win, (lp, n_fft - n - lp))
    basis = _forward_basis.host(n_fft) * win[:, None]
    n_bins = n_fft // 2 + 1
    out = np.zeros((2, n_fft, bins_pad), np.float64)
    out[0, :, :n_bins] = basis[:, :n_bins]
    out[1, :, :n_bins] = basis[:, n_bins:]
    return out


def _mel_kernel_factory(CB, FBc, C, HOP, KBLOCKS):
    def kernel(sig_hbm, basis_ref, fb_ref, out_ref, sig_scr, sem):
        i = pl.program_id(0)
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            cp = pltpu.make_async_copy(
                sig_hbm.at[pl.ds(i * CB, CB), :, :], sig_scr, sem
            )
            cp.start()
            cp.wait()

        def chunk_dot(which, c):
            lhs = sig_scr[:, c : c + FBc, :]
            rhs = basis_ref[which, pl.ds(c * HOP, HOP), :]
            return jax.lax.dot_general(
                lhs,
                rhs,
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=MATMUL_PRECISION,
            )

        rc = chunk_dot(0, 0)
        rs = chunk_dot(1, 0)
        for c in range(1, C):
            rc = rc + chunk_dot(0, c)
            rs = rs + chunk_dot(1, c)
        pow2 = rc * rc + rs * rs
        part = jax.lax.dot_general(
            pow2,
            fb_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=MATMUL_PRECISION,
        )

        @pl.when(k == 0)
        def _():
            out_ref[:] = part

        @pl.when(k > 0)
        def _():
            out_ref[:] = out_ref[:] + part

    return kernel


@partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "center", "pad_mode", "power"),
)
def melspectrogram_pallas(
    y: jax.Array,  # (B, L)
    fb_t: jax.Array,  # (n_bins, n_mels) mel filterbank transposed
    basis2: jax.Array,  # (2, n_fft, bins_pad) window-folded split basis
    *,
    n_fft: int,
    hop_length: int,
    center: bool,
    pad_mode: str,
    power: float,
) -> jax.Array:
    """(B, L) -> (B, n_mels, F) mel spectrogram via the fused kernel.

    Requires ``hop_length`` to be a multiple of 128 lanes (use the XLA path
    otherwise) and ``power == 2.0`` (the kernel accumulates |.|^2 natively).
    """
    if power != 2.0:
        raise ValueError("fused kernel supports power=2.0 only")
    if hop_length % LANE != 0:
        raise ValueError("fused kernel requires hop_length % 128 == 0")

    B, L = y.shape
    n_bins = n_fft // 2 + 1
    n_mels = fb_t.shape[1]
    C = cdiv(n_fft, hop_length)
    pad = n_fft // 2 if center else 0
    F = 1 + (L + 2 * pad - n_fft) // hop_length
    FBc = round_up(F, SUBLANE)
    R = round_up(FBc + C, SUBLANE)

    KB = 128
    KBLOCKS = cdiv(n_bins, KB)
    bins_pad = KBLOCKS * KB
    assert basis2.shape == (2, n_fft, bins_pad), basis2.shape

    # mel filterbank padded to bins_pad rows
    fbp = jnp.pad(fb_t, ((0, bins_pad - n_bins), (0, 0)))

    bytes_per_clip = (R * hop_length + FBc * n_mels) * 4
    CB = clips_per_block(B, bytes_per_clip)

    if center and pad_mode != "constant":
        yp = jnp.pad(y, ((0, 0), (pad, pad)), mode=pad_mode)
        yp = jnp.pad(yp, ((0, 0), (0, R * hop_length - L - 2 * pad)))
    else:
        yp = jnp.pad(y, ((0, 0), (pad, R * hop_length - L - pad)))
    sig2d = yp.reshape(B, R, hop_length)

    out = pl.pallas_call(
        _mel_kernel_factory(CB, FBc, C, hop_length, KBLOCKS),
        out_shape=jax.ShapeDtypeStruct((B, FBc, n_mels), jnp.float32),
        grid=(B // CB, KBLOCKS),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (2, n_fft, KB), lambda i, k: (0, 0, k), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((KB, n_mels), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (CB, FBc, n_mels), lambda i, k: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((CB, R, hop_length), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=pallas_interpret_mode(),
    )(sig2d, basis2, fbp)
    return jnp.swapaxes(out[:, :F, :], 1, 2)


def mel_pallas_tables(n_fft: int, window, n_bins: int):
    """Fetch the device-resident window-folded basis for the fused kernel."""
    if not isinstance(window, str):
        raise TypeError("fused mel kernel supports string windows only")
    KB = 128
    bins_pad = cdiv(n_bins, KB) * KB
    return _windowed_split_basis(n_fft, (window.lower(), n_fft), bins_pad)
