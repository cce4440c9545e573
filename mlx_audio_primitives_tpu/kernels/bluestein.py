"""Arbitrary-length FFTs on TPU via Bluestein's chirp-Z algorithm.

XLA's TPU FFT is fast only for power-of-2 lengths; any other length lowers to
a dense (n, n) DFT matmul — 7.8 GB of HBM and ~200 ms for n = 44100, OOM for
n = 88200 (measured). That breaks exact-length transforms like
scipy-compatible FFT resampling. Bluestein re-expresses a length-n DFT as a
circular convolution of length M = next_pow2(2n-1):

    X[k] = b*[k] . FFT^-1( FFT(x . b*) . FFT(b) )[k],   b[m] = exp(i pi m^2/n)

so only power-of-2 FFTs ever run. The chirp phase m^2/n is reduced with
*exact integer* arithmetic on the host ((m*m) mod 2n as Python ints — naive
f32/f64 evaluation of m^2 loses all phase accuracy by m ~ 1e4), and FFT(b) is
precomputed in float64 NumPy and cached device-resident.

Public helpers `rfft_len` / `irfft_len` dispatch: power-of-2 -> jnp.fft,
small n -> the DFT-GEMM basis (kernels/dft.py), otherwise Bluestein.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.cache import table_cache
from .dft import irdft_matmul, rdft_matmul

_DFT_MATMUL_MAX = 4096


def _next_pow2(n: int) -> int:
    return 1 << (int(n - 1)).bit_length()


def _chirp_angles(n: int, count: int) -> np.ndarray:
    """Exact angles pi*m^2/n reduced mod 2pi, via integer (m*m) mod 2n."""
    mods = np.array([(m * m) % (2 * n) for m in range(count)], dtype=np.float64)
    return np.pi * mods / n


@table_cache("bluestein", maxsize=16, dtype=np.float32)
def _bluestein_tables(n: int) -> np.ndarray:
    """Packed (2, 2, M) float32: [chirp conj, FFT(b)] x [real, imag].

    Stored in real components (not complex64) because complex device arrays
    cannot be embedded as jit constants on some remote TPU attachments
    (complex64 device->host transfer is unimplemented there).
    """
    M = _next_pow2(2 * n - 1)
    ang = _chirp_angles(n, n)
    chirp = np.exp(1j * ang)  # b[m]
    a_mult = np.zeros(M, np.complex128)
    a_mult[:n] = np.conj(chirp)  # also the output chirp
    b_circ = np.zeros(M, np.complex128)
    b_circ[:n] = chirp
    b_circ[M - n + 1 :] = chirp[1:][::-1]  # b[-m] = b[m]
    B = np.fft.fft(b_circ)
    return np.stack(
        [
            np.stack([a_mult.real, a_mult.imag]),
            np.stack([B.real, B.imag]),
        ]
    )


@partial(jax.jit, static_argnames=("n",))
def fft_bluestein(x: jax.Array, *, n: int) -> jax.Array:
    """Complex DFT of length n over the last axis (input length must be n)."""
    tables = _bluestein_tables(n)
    M = tables.shape[2]
    chirp_c = jax.lax.complex(tables[0, 0], tables[0, 1])  # conj chirp, len M
    Bf = jax.lax.complex(tables[1, 0], tables[1, 1])
    a = x.astype(jnp.complex64) * chirp_c[:n]
    A = jnp.fft.fft(a, n=M, axis=-1)
    conv = jnp.fft.ifft(A * Bf, axis=-1)
    return conv[..., :n] * chirp_c[:n]


@partial(jax.jit, static_argnames=("n",))
def ifft_bluestein(X: jax.Array, *, n: int) -> jax.Array:
    """Complex inverse DFT of length n: conj(fft(conj(X)))/n."""
    return jnp.conj(fft_bluestein(jnp.conj(X), n=n)) / n


def _rfft_paired(cfft, x: jax.Array, n: int) -> jax.Array:
    """rfft via row pairing + a complex FFT callable: (..., n) -> (..., bins).

    Packing two real rows into one complex row (z = a + i*b) halves the
    transform count; the hermitian split ``A = (Z + conj(Z[-k]))/2``,
    ``B = (Z - conj(Z[-k]))/(2i)`` recovers both spectra. Shared by the
    packed-jnp.fft, six-step, and composite-GEMM transform paths.
    """
    *lead, _ = x.shape
    rows = int(np.prod(lead)) if lead else 1
    flat = x.reshape(rows, n)
    odd_rows = rows % 2 == 1
    if odd_rows:
        flat = jnp.pad(flat, ((0, 1), (0, 0)))
    z = jax.lax.complex(flat[0::2], flat[1::2])
    Z = cfft(z)
    Zf = jnp.concatenate([Z[..., :1], Z[..., :0:-1]], axis=-1)  # Z[(-k) mod n]
    A = 0.5 * (Z + jnp.conj(Zf))
    B = jax.lax.complex(jnp.imag(Z) + jnp.imag(Zf), jnp.real(Zf) - jnp.real(Z)) * 0.5
    n_bins = n // 2 + 1
    out = jnp.stack([A[..., :n_bins], B[..., :n_bins]], axis=1).reshape(-1, n_bins)
    if odd_rows:
        out = out[:rows]
    return out.reshape(*lead, n_bins)


def _irfft_paired(icfft, X: jax.Array, n: int) -> jax.Array:
    """irfft via spectrum pairing + a complex inverse-FFT callable.

    Two hermitian spectra A, B share one inverse transform: with full-length
    extensions, ``z = icfft(A_full + i*B_full)`` gives ``a = Re z``,
    ``b = Im z`` (linearity + realness of a, b).
    """
    *lead, n_bins = X.shape
    rows = int(np.prod(lead)) if lead else 1
    flat = X.reshape(rows, n_bins)
    odd_rows = rows % 2 == 1
    if odd_rows:
        flat = jnp.pad(flat, ((0, 1), (0, 0)))
    # irfft semantics use only the real part of the DC (and, for even n,
    # Nyquist) bins; zero their imaginary parts so the extension is exactly
    # hermitian — otherwise the packed pair leak into each other.
    flat = flat.at[:, 0].set(jnp.real(flat[:, 0]).astype(flat.dtype))
    if n % 2 == 0:
        flat = flat.at[:, -1].set(jnp.real(flat[:, -1]).astype(flat.dtype))
    tail = jnp.conj(flat[:, 1 : (n + 1) // 2][:, ::-1])
    full = jnp.concatenate([flat, tail], axis=-1)  # (rows', n)
    Z = full[0::2] + jax.lax.complex(
        -jnp.imag(full[1::2]), jnp.real(full[1::2])
    )  # A + i*B
    z = icfft(Z)
    out = jnp.stack([jnp.real(z), jnp.imag(z)], axis=1).reshape(-1, n)
    if odd_rows:
        out = out[:rows]
    return out.reshape(*lead, n)


def _has_vma(x) -> bool:
    """True when ``x`` carries varying-manual-axes (inside a vma-tracked
    shard_map). jax 0.9's custom_jvp linearization drops vma from the stored
    output avals, so transposing the packed FFTs there raises a cotangent
    type mismatch — callers route to the plain jnp.fft ops instead, whose
    native autodiff is vma-aware."""
    try:
        return bool(jax.typeof(x).vma)
    except Exception:
        return False


@jax.custom_vjp
def rfft_vma_safe(x: jax.Array) -> jax.Array:
    """``jnp.fft.rfft`` with a transpose-free backward, usable under vma.

    Inside a vma-tracked ``shard_map`` (check_vma=True, jax 0.9), reverse
    mode through ``jnp.fft.rfft`` fails: the fft transpose rule linearizes
    against a vma-less dummy aval and rejects the varying cotangent
    (``TypeError: cotangent type does not match function output``). A
    ``custom_vjp`` never transposes — its backward is the closed-form rfft
    adjoint ``x_bar = n * Re(ifft(pad(conj(ct), n)))`` computed with a
    *forward* fft, which vma handles fine. Exact vs jax's own rfft VJP
    (0.0 max err on CPU). Reverse mode only; jvp callers should use the
    plain op.
    """
    return jnp.fft.rfft(x, axis=-1)


def _rfft_vma_safe_fwd(x):
    # the zero-size residual carries n and the input dtype as STATIC aval
    # facts (residual leaves must be jax types, not raw ints/dtypes)
    return rfft_vma_safe(x), jnp.zeros((0, x.shape[-1]), x.dtype)


def _rfft_vma_safe_bwd(res, ct):
    n = res.shape[1]
    n_bins = n // 2 + 1
    pad = [(0, 0)] * (ct.ndim - 1) + [(0, n - n_bins)]
    xbar = n * jnp.real(jnp.fft.ifft(jnp.pad(jnp.conj(ct), pad), axis=-1))
    return (xbar.astype(res.dtype),)


rfft_vma_safe.defvjp(_rfft_vma_safe_fwd, _rfft_vma_safe_bwd)


@jax.custom_jvp
def rfft_packed(x: jax.Array) -> jax.Array:
    """rfft over the last axis via pair-packed complex FFT (~1.6x on TPU).

    XLA's TPU rfft runs as a full complex FFT; the pairing halves the
    transform count. Measured 0.536 -> 0.328 ms for (2816, 2048) f32 on v5e
    at 2.8e-7 relative accuracy.

    Custom JVP: the packed formulation's automatic transpose lowers to an
    op some TPU runtimes lack (UNIMPLEMENTED at execution). rfft is linear,
    so the tangent rule is plain ``jnp.fft.rfft`` — forward mode works, and
    reverse mode transposes that plain rule (whose adjoint the runtime
    accepts) instead of the packed graph.
    """
    return _rfft_paired(lambda z: jnp.fft.fft(z, axis=-1), x, x.shape[-1])


@rfft_packed.defjvp
def _rfft_packed_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    return rfft_packed(x), jnp.fft.rfft(t, axis=-1)


def packed_power_rows(Z: jax.Array, n: int) -> jax.Array:
    """Power spectra of both packed real rows, without forming them.

    For ``z = a + i*b`` with ``Z = fft(z)``, let ``E = |Z|^2`` and
    ``F = Re(Z * Z[(-k) mod n])``. Then

        |fft(a)|^2 = (E + E_flip + 2F) / 4
        |fft(b)|^2 = (E + E_flip - 2F) / 4

    — all *real* arithmetic, so XLA fuses it straight into downstream
    consumers instead of materializing two complex spectra (the hermitian
    A/B unpack with its complex gather-flip). Takes the packed ``(half, n)``
    complex spectrum, returns ``(2*half, n//2+1)`` real powers. Numerically
    equivalent to squaring the unpacked spectra (1.7e-7 rel); strictly less
    HBM traffic, though the saving is within remote-attachment timing noise
    on the batch-64 mel pipeline (~0.4 ms total).
    """
    n_bins = n // 2 + 1
    Zf = jnp.concatenate([Z[..., :1], Z[..., :0:-1]], axis=-1)
    E = jnp.real(Z) ** 2 + jnp.imag(Z) ** 2
    Ef = jnp.concatenate([E[..., :1], E[..., :0:-1]], axis=-1)
    F = jnp.real(Z) * jnp.real(Zf) - jnp.imag(Z) * jnp.imag(Zf)
    # clamp at 0: for near-silent bins E + Ef ~= -/+2F cancels and rounding
    # can land a few ULP negative — downstream sqrt (magnitude, mel power=1)
    # and fractional powers would turn that into NaN (seen on pure tones)
    P0 = jnp.maximum(0.25 * (E + Ef + 2.0 * F), 0.0)
    P1 = jnp.maximum(0.25 * (E + Ef - 2.0 * F), 0.0)
    half = Z.shape[0]
    return jnp.stack([P0[..., :n_bins], P1[..., :n_bins]], axis=1).reshape(
        2 * half, n_bins
    )


def rfft_power_packed(x: jax.Array) -> jax.Array:
    """``|rfft(x)|^2`` over the last axis via pair packing + direct power."""
    *lead, n = x.shape
    rows = int(np.prod(lead)) if lead else 1
    flat = x.reshape(rows, n)
    odd_rows = rows % 2 == 1
    if odd_rows:
        flat = jnp.pad(flat, ((0, 1), (0, 0)))
    z = jax.lax.complex(flat[0::2], flat[1::2])
    Z = jnp.fft.fft(z, axis=-1)
    out = packed_power_rows(Z, n)
    if odd_rows:
        out = out[:rows]
    return out.reshape(*lead, n // 2 + 1)


def rfft_power_len(x: jax.Array, n: int) -> jax.Array:
    """``|rfft(x)|^2`` of real input of length ``n`` -> (..., n//2+1).

    Pow2 multi-row inputs take the fused packed-power path; everything else
    squares the corresponding :func:`rfft_len` spectrum.
    """
    if n & (n - 1) == 0:
        rows = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
        if rows >= 2 and not _has_vma(x):
            return rfft_power_packed(x)
    S = rfft_len(x, n)
    return jnp.real(S) ** 2 + jnp.imag(S) ** 2


def rfft_len(x: jax.Array, n: int) -> jax.Array:
    """rfft of real input already of length ``n`` -> (..., n//2+1).

    Dispatch: pow2 -> pair-packed complex FFT (or plain rfft for single
    rows); n <= 4096 -> DFT-GEMM; balanced composite n -> two-factor GEMM
    FFT (`sixstep.fft_general` — e.g. 44100 = 210*210, measured ~2.3x the
    Bluestein path on v5e at batch 8); else Bluestein.
    """
    if n & (n - 1) == 0:
        rows = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
        if rows >= 2 and not _has_vma(x):
            return rfft_packed(x)
        return jnp.fft.rfft(x, axis=-1)
    if n <= _DFT_MATMUL_MAX:
        return rdft_matmul(x, n)
    from .sixstep import general_supported, rfft_general

    if general_supported(n):
        return rfft_general(x, n)
    return fft_bluestein(x, n=n)[..., : n // 2 + 1]


@partial(jax.custom_jvp, nondiff_argnums=(1,))
def irfft_packed(X: jax.Array, n: int) -> jax.Array:
    """irfft via pair-packed complex inverse FFT (dual of :func:`rfft_packed`).

    Custom JVP for the same reason as :func:`rfft_packed`."""
    return _irfft_paired(lambda Z: jnp.fft.ifft(Z, axis=-1), X, n)


@irfft_packed.defjvp
def _irfft_packed_jvp(n, primals, tangents):
    (X,), (t,) = primals, tangents
    return irfft_packed(X, n), jnp.fft.irfft(t, n=n, axis=-1)


def irfft_len(X: jax.Array, n: int) -> jax.Array:
    """irfft producing real output of length ``n`` from (..., n//2+1) bins."""
    if n & (n - 1) == 0:
        rows = int(np.prod(X.shape[:-1])) if X.ndim > 1 else 1
        if rows >= 2 and not _has_vma(X):
            return irfft_packed(X, n)
        return jnp.fft.irfft(X, n=n, axis=-1)
    if n <= _DFT_MATMUL_MAX:
        return irdft_matmul(X, n)
    from .sixstep import general_supported, irfft_general

    if general_supported(n):
        return irfft_general(X, n)
    # hermitian extension then complex inverse Bluestein
    tail = jnp.conj(X[..., 1 : (n + 1) // 2][..., ::-1])
    full = jnp.concatenate([X, tail], axis=-1)
    return jnp.real(ifft_bluestein(full, n=n))
