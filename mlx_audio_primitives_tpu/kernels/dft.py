"""DFT-as-matmul rfft/irfft: the MXU-native FFT path.

On TPU, the systolic array (MXU) multiplies a ``(frames, n_fft)`` block by an
``(n_fft, n_bins)`` DFT basis at enormous throughput, and XLA fuses the
window multiply into the operand load. For STFT-sized transforms
(n_fft <= 4096) this is typically faster than XLA's generic FFT lowering and
— critically — it *batches over frames as a single GEMM*, which is exactly
how the STFT workload is shaped (SURVEY.md §7 "Hard parts" #2 calls this
decision out; the MelT paper pursues the same GEMM-native NDFT idea).

Basis matrices are built in float64 on the host (same precision discipline as
the reference's table construction, `csrc/primitives/windows.cpp:192-199`)
and cached device-resident. All contractions run at ``Precision.HIGHEST`` so
float32 accuracy survives the MXU's native-bf16 tiles.

The pure ``jnp.fft`` path remains the always-available fallback; callers
select via ``fft_mode`` ('auto' | 'fft' | 'matmul').
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .._config import COMPLEX_DTYPE, MATMUL_PRECISION
from ..utils.cache import table_cache


@table_cache("dft_basis_fwd", maxsize=8)
def _forward_basis(n_fft: int) -> np.ndarray:
    """Stacked ``(n_fft, 2*n_bins)`` [cos | -sin] forward rDFT basis (f64 host)."""
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.concatenate([np.cos(ang), -np.sin(ang)], axis=1)


@table_cache("dft_basis_inv", maxsize=8)
def _inverse_basis(n_fft: int) -> np.ndarray:
    """Stacked ``(2*n_bins, n_fft)`` inverse rDFT basis with hermitian weights."""
    n_bins = n_fft // 2 + 1
    k = np.arange(n_bins, dtype=np.float64)[:, None]
    n = np.arange(n_fft, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    w = np.full((n_bins, 1), 2.0, dtype=np.float64)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    w /= n_fft
    return np.concatenate([w * np.cos(ang), -w * np.sin(ang)], axis=0)


def forward_basis(n_fft: int) -> jax.Array:
    """Device-resident forward basis (fetch eagerly, pass into jitted code)."""
    return _forward_basis(n_fft)


def inverse_basis(n_fft: int) -> jax.Array:
    """Device-resident inverse basis (fetch eagerly, pass into jitted code)."""
    return _inverse_basis(n_fft)


def rdft_matmul(frames: jax.Array, n_fft: int, basis: jax.Array | None = None) -> jax.Array:
    """rfft over the last axis via one GEMM: ``(..., n_fft) -> (..., n_bins)``."""
    if basis is None:
        basis = _forward_basis(n_fft)  # (n_fft, 2*n_bins)
    n_bins = n_fft // 2 + 1
    out = jnp.matmul(frames, basis, precision=MATMUL_PRECISION)
    return jax.lax.complex(out[..., :n_bins], out[..., n_bins:]).astype(COMPLEX_DTYPE)


def irdft_matmul(spec: jax.Array, n_fft: int, basis: jax.Array | None = None) -> jax.Array:
    """irfft over the last axis via one GEMM: ``(..., n_bins) -> (..., n_fft)``."""
    if basis is None:
        basis = _inverse_basis(n_fft)  # (2*n_bins, n_fft)
    stacked = jnp.concatenate([jnp.real(spec), jnp.imag(spec)], axis=-1)
    return jnp.matmul(stacked, basis, precision=MATMUL_PRECISION)
