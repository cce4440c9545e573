"""Window functions (scipy/librosa-compatible).

TPU-native design note: windows are tiny 1-D tables whose *exactness* matters
far more than their construction speed (they must match scipy bit-for-bit in
float32). Like the reference — which deliberately forces a CPU float64 path
even when a GPU kernel exists (reference: `csrc/primitives/windows.cpp:192-199`,
`mlx_audio_primitives/windows.py:44-58`) — we build every window on the host
in float64 NumPy and cache the float32 result as a device-resident constant
(two-tier cache, reference: `windows.py:125-189`).

Periodic ("fftbins") windows are computed as ``n+1``-point symmetric windows
with the last sample dropped, matching scipy's DFT-even convention
(reference: `windows.py:169-185`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .._config import REAL_DTYPE, WINDOW_CACHE_SIZE
from ..utils.cache import table_cache

# Generalized-cosine coefficients (Harris 1978). Same table as the reference
# (`mlx_audio_primitives/windows.py:63-67`) and scipy.signal.windows.
_COSINE_COEFFS: dict[str, tuple[float, ...]] = {
    "hann": (0.5, 0.5),
    "hamming": (0.54, 0.46),
    "blackman": (0.42, 0.5, 0.08),
}

_ALIASES: dict[str, str] = {
    "hanning": "hann",
    "triangular": "bartlett",
    "boxcar": "rectangular",
    "ones": "rectangular",
}

_SUPPORTED = sorted(
    set(_COSINE_COEFFS) | {"bartlett", "rectangular", "kaiser"} | set(_ALIASES)
)


def _general_cosine_np(n: int, coeffs: tuple[float, ...]) -> np.ndarray:
    """Symmetric generalized-cosine window in float64.

    Uses scipy's ``fac = linspace(-pi, pi, n)`` formulation, which is exactly
    symmetric by construction (the reference achieves the same symmetry with
    an explicit float64 cos-sum, `windows.py:44-58`). Blackman endpoints come
    out ~-1.4e-17 instead of exact 0; scipy keeps them, and byte-exact scipy
    parity (NUMERICAL_ACCURACY.md) requires we keep them too — no clamping.
    """
    if n == 1:
        return np.ones(1, dtype=np.float64)
    fac = np.linspace(-np.pi, np.pi, n)
    w = np.zeros(n, dtype=np.float64)
    for k, a in enumerate(coeffs):
        w += a * np.cos(k * fac)
    return w


def _symmetric_window_np(name: str, n: int, beta: float | None) -> np.ndarray:
    if n <= 0:
        raise ValueError(f"window length must be positive, got {n}")
    if n == 1:
        return np.ones(1, dtype=np.float64)
    if name in _COSINE_COEFFS:
        return _general_cosine_np(n, _COSINE_COEFFS[name])
    if name == "bartlett":
        k = np.arange(n, dtype=np.float64)
        return 1.0 - np.abs(2.0 * k / (n - 1) - 1.0)
    if name == "rectangular":
        return np.ones(n, dtype=np.float64)
    if name == "kaiser":
        b = 8.6 if beta is None else float(beta)
        k = np.arange(n, dtype=np.float64)
        alpha = (n - 1) / 2.0
        from numpy import i0

        return i0(b * np.sqrt(1.0 - ((k - alpha) / alpha) ** 2)) / i0(b)
    raise ValueError(
        f"Unknown window type: '{name}'. Supported: {', '.join(_SUPPORTED)}"
    )


@table_cache("window", maxsize=WINDOW_CACHE_SIZE)
def _window_table(name: str, n: int, fftbins: bool, beta: float | None) -> np.ndarray:
    """Host float64 window table (tier-1 cache).

    Tries the native C++ builder first (`csrc/tables.cpp::mapt_window`,
    bit-identical f64 math), falling back to NumPy — the reference's
    optional-extension contract (`windows.py:152-189`).
    """
    from .._native import native_window

    w = native_window(name, n, fftbins, beta)
    if w is not None:
        return w
    if fftbins and n > 1:
        w = _symmetric_window_np(name, n + 1, beta)[:n]
    else:
        w = _symmetric_window_np(name, n, beta)
    return w


def get_window(
    window: str | tuple | jax.Array | np.ndarray,
    n_fft: int,
    fftbins: bool = True,
) -> jax.Array:
    """Get a window function as a float32 device array of shape ``(n_fft,)``.

    Parameters mirror the reference's ``get_window``
    (reference: `mlx_audio_primitives/windows.py:192-256`):

    - ``window``: one of 'hann'/'hanning', 'hamming', 'blackman',
      'bartlett'/'triangular', 'rectangular'/'boxcar'/'ones', a
      ``('kaiser', beta)`` tuple, or an array of length ``n_fft`` used as-is.
    - ``fftbins=True`` produces a periodic (DFT-even) window, ``False`` a
      symmetric one.

    Results are cached as device-resident constants; repeated calls return
    the same buffer with no host->device transfer.
    """
    if isinstance(window, (jax.Array, np.ndarray)):
        if window.shape[0] != n_fft:
            raise ValueError(
                f"Window array length ({window.shape[0]}) must match n_fft ({n_fft})"
            )
        return jnp.asarray(window, dtype=REAL_DTYPE)

    beta: float | None = None
    if isinstance(window, tuple):
        if len(window) != 2 or window[0] != "kaiser":
            raise ValueError(
                "tuple windows must be ('kaiser', beta); got " f"{window!r}"
            )
        name, beta = "kaiser", float(window[1])
    elif isinstance(window, str):
        name = window.lower()
        name = _ALIASES.get(name, name)
        if name not in set(_SUPPORTED):
            raise ValueError(
                f"Unknown window type: '{window}'. Supported: {', '.join(_SUPPORTED)}"
            )
    else:
        raise TypeError(
            f"window must be str, tuple, or array, got {type(window).__name__}"
        )

    if n_fft <= 0:
        raise ValueError(f"n_fft must be positive, got {n_fft}")
    return _window_table(name, n_fft, fftbins, beta)


def window_host(
    window: str | tuple, n_fft: int, fftbins: bool = True
) -> np.ndarray:
    """Host-side float64 window (used by table builders that stay in f64)."""
    beta = None
    if isinstance(window, tuple):
        name, beta = "kaiser", float(window[1])
    else:
        name = _ALIASES.get(window.lower(), window.lower())
    return _window_table.host(name, n_fft, fftbins, beta)
