"""Six-step (Cooley-Tukey N1 x N2) FFT on the MXU.

Decomposes a length-N = N1*N2 DFT into two batched small-DFT *matmuls*,
with the inter-stage twiddle folded into the second contraction's tensor:

    A = W_N1 @ x.reshape(N1, N2)          (contract n1)
    M[k1,n2,k2] = W_N^(k1*n2) * W_N2^(n2*k2)
    X[k1 + N1*k2] = einsum(A, M)[k1,k2]   (contract n2, twiddle folded)

Folding the twiddle removes an elementwise pass over the intermediate (an
HBM round-trip): 0.117 -> 0.103 ms for (1408, 2048) complex64 on v5e. All
heavy ops are MXU contractions, so the transform's speed follows the
matmul precision knob. Measured against ``jnp.fft.fft`` (0.221 ms): HIGHEST
~0.22 ms / 2.2e-7 rel (tie), HIGH 0.103 ms / 2.7e-5 (2.1x), DEFAULT
~0.04 ms / 5e-3. The library's
default transform stays the packed ``jnp.fft`` path (max accuracy);
``fft_mode='sixstep'`` selects this path for throughput-focused pipelines
whose accuracy budget is the reference's ~1e-4 band.

Twiddle tables are built with exact integer-mod angle reduction and embedded
as host constants (complex device arrays cannot be jit-embedded on some
remote TPU attachments).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

#: Matmul precision for the six-step contractions. HIGH is the intended
#: operating point (1.75x over jnp.fft at ~3e-5 rel error).
SIXSTEP_PRECISION = jax.lax.Precision.HIGH

_MAX_N = 16384  # N1, N2 <= 128


def _split(n: int) -> tuple[int, int]:
    """Factor pow2 n into N1*N2 with N1 >= N2, both <= 128."""
    k = n.bit_length() - 1
    k1 = (k + 1) // 2
    return 1 << k1, 1 << (k - k1)


def _twiddle(i: np.ndarray, j: np.ndarray, M: int) -> np.ndarray:
    """``exp(-2j*pi*(i*j mod M)/M)`` with exact integer-mod angle reduction
    (naive f64 evaluation of i*j loses phase accuracy by i*j ~ 1e8)."""
    mods = np.mod(np.outer(i, j), M).astype(np.float64)
    return np.exp(-2j * np.pi * mods / M)


@lru_cache(maxsize=16)
def _tables(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(W1, M): the stage-1 DFT matrix and the twiddle-FOLDED stage-2 tensor
    ``M[k1, n2, k2] = W_N^(k1*n2) * W_N2^(n2*k2)`` — folding the twiddle into
    a batched stage-2 contraction removes an entire elementwise pass over the
    intermediate (0.117 -> 0.103 ms for (1408, 2048) on v5e)."""
    N1, N2 = _split(n)
    W1 = _twiddle(np.arange(N1), np.arange(N1), N1).astype(np.complex64)
    W2 = _twiddle(np.arange(N2), np.arange(N2), N2)
    Tw = _twiddle(np.arange(N1), np.arange(N2), n)
    M = (Tw[:, :, None] * W2[None, :, :]).astype(np.complex64)
    return W1, M


def supported(n: int) -> bool:
    return n & (n - 1) == 0 and 4 <= n <= _MAX_N


# ---------------------------------------------------------------------------
# Generalized two-factor GEMM FFT for composite (non-pow2) lengths.
#
# Same decomposition as the pow2 six-step, but for ANY balanced n = N1*N2
# the twiddle stays a separate (N1, N2) elementwise table instead of being
# folded into stage 2: the folded tensor is (N1, N2, N2) — 74 MB of HBM
# traffic per call at n = 44100 — while the unfolded pass touches only the
# (rows, n) intermediate. Serves exact-length transforms (scipy-compatible
# FFT resampling) far faster than Bluestein's three pow2-of-2n FFTs.
# ---------------------------------------------------------------------------

_GENERAL_N1_MAX = 1024  # stage-GEMM width cap (keeps tables/GEMMs MXU-sized)


@lru_cache(maxsize=64)
def _split_general(n: int) -> tuple[int, int] | None:
    """Most balanced factorization n = N1*N2 with N1 >= N2 >= 2."""
    d = int(np.sqrt(n))
    while d >= 2:
        if n % d == 0:
            return n // d, d
        d -= 1
    return None


def general_supported(n: int) -> bool:
    """Composite n with a balanced-enough factorization for stage GEMMs."""
    if n < 4:
        return False
    sp = _split_general(n)
    return sp is not None and sp[0] <= _GENERAL_N1_MAX


@lru_cache(maxsize=16)
def _tables_general(n: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(W1, W2, Tw): stage DFT matrices and the (N1, N2) inter-stage twiddle,
    all with exact integer-mod angle reduction (host f64 -> complex64)."""
    N1, N2 = _split_general(n)
    W1 = _twiddle(np.arange(N1), np.arange(N1), N1).astype(np.complex64)
    W2 = _twiddle(np.arange(N2), np.arange(N2), N2).astype(np.complex64)
    Tw = _twiddle(np.arange(N1), np.arange(N2), n).astype(np.complex64)
    return W1, W2, Tw


@partial(jax.jit, static_argnames=("n",))
def fft_general(x: jax.Array, *, n: int) -> jax.Array:
    """Complex DFT over the last axis for balanced composite n.

    Runs at HIGHEST matmul precision: this path serves the accuracy-first
    ``rfft_len`` dispatch (exact-length resampling), not the throughput
    ``fft_mode='sixstep'`` knob.
    """
    N1, N2 = _split_general(n)
    W1, W2, Tw = _tables_general(n)
    lead = x.shape[:-1]
    xm = x.reshape(-1, N1, N2)
    prec = jax.lax.Precision.HIGHEST
    A = jnp.einsum("rab,ak->rkb", xm, W1, precision=prec)
    A = A * Tw[None]
    C = jnp.einsum("rkb,bm->rkm", A, W2, precision=prec)
    return jnp.transpose(C, (0, 2, 1)).reshape(*lead, n)


@partial(jax.jit, static_argnames=("n",))
def ifft_general(X: jax.Array, *, n: int) -> jax.Array:
    return jnp.conj(fft_general(jnp.conj(X), n=n)) / n


@partial(jax.jit, static_argnames=("n",))
def fft_sixstep(x: jax.Array, *, n: int) -> jax.Array:
    """Complex DFT over the last axis via MXU matmuls (pow2 n <= 16384)."""
    N1, N2 = _split(n)
    W1, M = _tables(n)
    lead = x.shape[:-1]
    xm = x.reshape(-1, N1, N2)
    A = jnp.einsum("rab,ak->rkb", xm, W1, precision=SIXSTEP_PRECISION)
    C = jnp.einsum("rkb,kbm->rkm", A, M, precision=SIXSTEP_PRECISION)
    return jnp.transpose(C, (0, 2, 1)).reshape(*lead, n)


@partial(jax.jit, static_argnames=("n",))
def ifft_sixstep(X: jax.Array, *, n: int) -> jax.Array:
    return jnp.conj(fft_sixstep(jnp.conj(X), n=n)) / n


def rfft_sixstep(x: jax.Array, n: int) -> jax.Array:
    """rfft via row pairing + six-step complex FFT: (..., n) -> (..., n//2+1)."""
    from .bluestein import _rfft_paired

    return _rfft_paired(lambda z: fft_sixstep(z, n=n), x, n)


def rfft_general(x: jax.Array, n: int) -> jax.Array:
    """rfft via row pairing + the composite-length GEMM FFT."""
    from .bluestein import _rfft_paired

    return _rfft_paired(lambda z: fft_general(z, n=n), x, n)


def rfft_power_sixstep(x: jax.Array, n: int) -> jax.Array:
    """``|rfft(x)|^2`` via row pairing + six-step FFT + direct packed power.

    Skips the hermitian complex unpack entirely (see
    `bluestein.packed_power_rows`): the power of both packed rows comes from
    real arithmetic on the packed spectrum, which XLA fuses into downstream
    consumers (e.g. the mel matmul) instead of materializing two complex
    spectra.
    """
    from .bluestein import packed_power_rows

    *lead, _ = x.shape
    rows = int(np.prod(lead)) if lead else 1
    flat = x.reshape(rows, n)
    odd = rows % 2 == 1
    if odd:
        flat = jnp.pad(flat, ((0, 1), (0, 0)))
    z = jax.lax.complex(flat[0::2], flat[1::2])
    Z = fft_sixstep(z, n=n)
    out = packed_power_rows(Z, n)
    if odd:
        out = out[:rows]
    return out.reshape(*lead, n // 2 + 1)


def irfft_sixstep(X: jax.Array, n: int) -> jax.Array:
    """irfft via spectrum pairing + inverse six-step: (..., n//2+1) -> (..., n)."""
    from .bluestein import _irfft_paired

    return _irfft_paired(lambda Z: ifft_sixstep(Z, n=n), X, n)


def irfft_general(X: jax.Array, n: int) -> jax.Array:
    """irfft via spectrum pairing + the composite-length inverse GEMM FFT."""
    from .bluestein import _irfft_paired

    return _irfft_paired(lambda Z: ifft_general(Z, n=n), X, n)
