"""MFCC, DCT-II, and delta features.

Parity: `mlx_audio_primitives/mfcc.py` (DCT basis `:23-66`, mfcc pipeline
`:143-287`, savgol delta `:290-368`).

TPU-native decisions:

* DCT-II is a cached host-f64 basis matrix contracted on the MXU — the same
  formulation as the reference's C++/fallback paths (`mfcc.py:119-135`,
  `csrc/primitives/dct.cpp:68-89`), but fused by XLA into the MFCC pipeline.
* ``delta`` stays ON DEVICE. The reference drops to host
  ``scipy.signal.savgol_filter`` (`mfcc.py:339-366`); a Savitzky-Golay filter
  is a *linear* operator, so we build its exact matrix elements once on the
  host with scipy (tiny: a width-tap FIR + two (halflen x width) edge
  matrices for mode='interp') and apply them on device as static slices +
  a small matmul. Bit-equivalent to scipy up to f32 rounding, no host
  round-trip, vectorizes over batch.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .._config import DCT_CACHE_SIZE, MATMUL_PRECISION, REAL_DTYPE
from ..utils.cache import table_cache
from ..utils.validation import validate_positive
from .convert import power_to_db
from .mel import melspectrogram

ArrayLike = Any


@table_cache("dct_basis", maxsize=DCT_CACHE_SIZE)
def _dct_basis_t(n_out: int, n_in: int, norm: str | None) -> np.ndarray:
    """Transposed DCT-II basis ``(n_in, n_out)``: C[k,n]=cos(pi k (2n+1)/(2N)),
    optional ortho scaling (reference `mfcc.py:23-66`). Native C++ builder
    first, NumPy fallback."""
    if norm in (None, "ortho"):
        from .._native import native_dct_basis_t

        basis_t = native_dct_basis_t(n_out, n_in, norm)
        if basis_t is not None:
            return basis_t
    n = np.arange(n_in, dtype=np.float64)
    k = np.arange(n_out, dtype=np.float64)
    basis = np.cos(np.pi * k[:, None] * (2.0 * n[None, :] + 1.0) / (2.0 * n_in))
    if norm == "ortho":
        basis[0, :] *= 1.0 / np.sqrt(n_in)
        basis[1:, :] *= np.sqrt(2.0 / n_in)
    elif norm is None:
        # scipy's unnormalized DCT-II is 2 * sum(x cos(...)).
        basis *= 2.0
    else:
        raise ValueError(f"Unknown norm: '{norm}'. Supported: 'ortho', None")
    return basis.T


def dct(
    x: ArrayLike,
    type: int = 2,
    n: int | None = None,
    axis: int = -1,
    norm: str | None = "ortho",
) -> jax.Array:
    """DCT-II along ``axis`` returning ``n`` coefficients of the N-point
    transform (reference `mfcc.py:69-140`). Only type 2 is supported."""
    if type != 2:
        raise ValueError(f"Only DCT type 2 is supported, got {type}")
    x = jnp.asarray(x, dtype=REAL_DTYPE)
    input_size = x.shape[axis]
    if n is None:
        n = input_size
    basis_t = _dct_basis_t(n, input_size, norm)
    move = axis not in (-1, x.ndim - 1)
    if move:
        x = jnp.moveaxis(x, axis, -1)
    out = jnp.matmul(x, basis_t, precision=MATMUL_PRECISION)
    if move:
        out = jnp.moveaxis(out, -1, axis)
    return out


def mfcc(
    y: ArrayLike | None = None,
    sr: int = 22050,
    S: ArrayLike | None = None,
    n_mfcc: int = 20,
    dct_type: int = 2,
    norm: str | None = "ortho",
    lifter: int = 0,
    n_fft: int = 2048,
    hop_length: int = 512,
    win_length: int | None = None,
    window: str | ArrayLike = "hann",
    center: bool = True,
    pad_mode: str = "constant",
    power: float = 2.0,
    n_mels: int = 128,
    fmin: float = 0.0,
    fmax: float | None = None,
    htk: bool = False,
    mel_norm: str | None = "slaney",
    fft_mode: str = "auto",
) -> jax.Array:
    """Mel-frequency cepstral coefficients.

    librosa-compatible: mel power spectrogram -> dB -> DCT-II -> optional
    liftering ``1 + (L/2) sin(pi (n+1)/L)`` (reference `mfcc.py:143-287`).
    If ``S`` is given it is treated as an already-log-power mel spectrogram.
    """
    validate_positive(n_mfcc, "n_mfcc")
    s_was_provided = S is not None
    if S is None:
        if y is None:
            raise ValueError("Either y or S must be provided")
        S = melspectrogram(
            y,
            sr=sr,
            n_fft=n_fft,
            hop_length=hop_length,
            win_length=win_length,
            window=window,
            center=center,
            pad_mode=pad_mode,
            power=power,
            n_mels=n_mels,
            fmin=fmin,
            fmax=fmax,
            htk=htk,
            norm=mel_norm,
            fft_mode=fft_mode,
        )
    S = jnp.asarray(S, dtype=REAL_DTYPE)
    is_batched = S.ndim == 3
    if not is_batched:
        S = S[None]

    S_db = S if s_was_provided else power_to_db(S, ref=1.0, amin=1e-10, top_db=80.0)
    # (B, n_mels, F) -> DCT over mel axis -> (B, n_mfcc, F)
    M = dct(jnp.swapaxes(S_db, 1, 2), type=dct_type, n=n_mfcc, norm=norm)
    M = jnp.swapaxes(M, 1, 2)

    if lifter != 0:
        M = M * lifter_coeffs(n_mfcc, lifter)[:, None]

    return M[0] if not is_batched else M


def lifter_coeffs(n_mfcc: int, lifter: int) -> jax.Array:
    """Sinusoidal cepstral lifter ``1 + (L/2)sin(pi(n+1)/L)``, ones for L=0
    (reference `mfcc.py:277-282`; shared with the streaming frontend)."""
    if lifter < 0:
        raise ValueError(f"lifter must be non-negative, got {lifter}")
    if lifter == 0:
        return jnp.ones((n_mfcc,), jnp.float32)
    idx = np.arange(n_mfcc, dtype=np.float64)
    lift = 1.0 + (lifter / 2.0) * np.sin(np.pi * (idx + 1) / lifter)
    return jnp.asarray(lift.astype(np.float32))


# ---------------------------------------------------------------------------
# delta: on-device Savitzky-Golay


@table_cache("savgol_fir", maxsize=32)
def _savgol_tables(
    width: int, polyorder: int, deriv: int, delta_t: float
) -> np.ndarray:
    """Exact savgol linear-operator elements, packed as one array:

    ``[0]``            : width-tap interior FIR (time-reversed for correlate)
    ``[1 : 1+half]``   : left-edge matrix rows (output i from first ``width``)
    ``[1+half : ]``    : right-edge matrix rows (output T-half+i from last
                         ``width`` samples) — 'interp' mode edge polynomials.

    Built by pushing the identity through ``scipy.signal.savgol_filter``
    (host, once), so device results equal scipy's by construction.
    """
    from scipy.signal import savgol_filter

    eye = np.eye(width, dtype=np.float64)
    # savgol(e_j) along axis 0 fills column j, so M[i, j] = L_ij directly:
    # row i is output i as a function of the width inputs.
    M = savgol_filter(
        eye, width, polyorder, deriv=deriv, delta=delta_t, axis=0, mode="interp"
    )
    half = width // 2
    fir = M[half]  # interior stencil
    packed = np.concatenate([fir[None, :], M[:half], M[width - half :]], axis=0)
    return packed


def delta(
    data: ArrayLike,
    width: int = 9,
    order: int = 1,
    axis: int = -1,
    mode: str = "interp",
    **kwargs,
) -> jax.Array:
    """Delta (derivative) features via Savitzky-Golay filtering.

    librosa-exact semantics (reference `mfcc.py:290-368`), computed fully
    on-device (see module docstring). Supported modes: 'interp' (default),
    'nearest', 'mirror', 'constant', 'wrap'.
    """
    validate_positive(width, "width")
    validate_positive(order, "order")
    if width < 3:
        raise ValueError(f"width must be >= 3, got {width}")
    if width % 2 == 0:
        raise ValueError(f"width must be odd, got {width}")

    kwargs.pop("deriv", None)
    polyorder = int(kwargs.pop("polyorder", order))
    delta_t = float(kwargs.pop("delta", 1.0))
    if kwargs:
        raise TypeError(f"unexpected keyword arguments: {sorted(kwargs)}")
    if polyorder >= width:
        raise ValueError(
            f"polyorder ({polyorder}) must be less than width ({width})"
        )
    if order > polyorder:
        raise ValueError(
            f"order ({order}) must be <= polyorder ({polyorder})"
        )

    x = jnp.atleast_1d(jnp.asarray(data, dtype=REAL_DTYPE))
    T = x.shape[axis]
    if mode == "interp" and width > T:
        raise ValueError(
            f"when mode='interp', width={width} cannot exceed "
            f"data.shape[axis]={T}"
        )

    packed = _savgol_tables(width, polyorder, order, delta_t)
    half = width // 2
    fir = packed[0]

    move = axis not in (-1, x.ndim - 1)
    if move:
        x = jnp.moveaxis(x, axis, -1)

    if mode == "interp":
        # interior: width static shifted adds (VPU); edges: two tiny matmuls
        interior = sum(
            fir[j] * x[..., j : T - width + 1 + j] for j in range(width)
        )
        left = jnp.matmul(
            x[..., :width], packed[1 : 1 + half].T, precision=MATMUL_PRECISION
        )
        right = jnp.matmul(
            x[..., T - width :], packed[1 + half :].T, precision=MATMUL_PRECISION
        )
        out = jnp.concatenate([left, interior, right], axis=-1)
    else:
        pad_modes = {
            "nearest": "edge",
            "mirror": "reflect",
            "constant": "constant",
            "wrap": "wrap",
        }
        if mode not in pad_modes:
            raise ValueError(f"Unknown mode: '{mode}'")
        widths = [(0, 0)] * (x.ndim - 1) + [(half, half)]
        xp = jnp.pad(x, widths, mode=pad_modes[mode])
        out = sum(fir[j] * xp[..., j : j + T] for j in range(width))

    if move:
        out = jnp.moveaxis(out, -1, axis)
    return out
