"""Optional native (C++) table-builder library, loaded via ctypes.

TPU analog of the reference's optional C++ extension loader
(`mlx_audio_primitives/_extension.py:22-46`): attempt to load (building once
with make if the shared object is missing and a toolchain exists), run a
live smoke-test call, and fall back silently to the NumPy builders on any
failure. ``HAS_NATIVE`` plays the role of ``HAS_CPP_EXT``.

The native layer covers the host float64 table math (windows, mel scale,
mel filterbank, DCT basis — `csrc/tables.cpp`); device compute is always
JAX/XLA/Pallas and never depends on it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_PKG_DIR = Path(__file__).parent
_SO_PATH = _PKG_DIR / "_tables.so"
_CSRC = _PKG_DIR.parent / "csrc"

_WINDOW_KINDS = {
    "hann": 0,
    "hamming": 1,
    "blackman": 2,
    "bartlett": 3,
    "rectangular": 4,
    "kaiser": 5,
}

_lib: ctypes.CDLL | None = None


def _try_build() -> None:
    if not (_CSRC / "Makefile").exists():
        return
    if _SO_PATH.exists():
        # rebuild when any C++ source is newer than the built library —
        # a stale .so would silently serve outdated table math
        srcs = [_CSRC / "tables.cpp", _CSRC / "wavio.cpp"]
        mtime = _SO_PATH.stat().st_mtime
        if not any(s.exists() and s.stat().st_mtime > mtime for s in srcs):
            return
    if os.environ.get("MLX_AUDIO_TPU_NO_NATIVE_BUILD") == "1":
        return
    try:
        subprocess.run(
            ["make", "-C", str(_CSRC)],
            capture_output=True,
            timeout=120,
            check=True,
        )
    except Exception:
        pass


def _load() -> ctypes.CDLL | None:
    _try_build()
    if not _SO_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_SO_PATH))
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.mapt_abi_version.restype = ctypes.c_int32
        lib.mapt_window.argtypes = [
            ctypes.c_int32, ctypes.c_int64, ctypes.c_int32, ctypes.c_double, f64p,
        ]
        lib.mapt_window.restype = ctypes.c_int32
        lib.mapt_hz_to_mel.argtypes = [f64p, ctypes.c_int64, ctypes.c_int32, f64p]
        lib.mapt_hz_to_mel.restype = ctypes.c_int32
        lib.mapt_mel_to_hz.argtypes = [f64p, ctypes.c_int64, ctypes.c_int32, f64p]
        lib.mapt_mel_to_hz.restype = ctypes.c_int32
        lib.mapt_mel_filterbank.argtypes = [
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_double, ctypes.c_double, ctypes.c_int32, ctypes.c_int32, f64p,
        ]
        lib.mapt_mel_filterbank.restype = ctypes.c_int32
        lib.mapt_dct_basis_t.argtypes = [
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, f64p,
        ]
        lib.mapt_dct_basis_t.restype = ctypes.c_int32
        # bark/linear builders: absent in a stale pre-rebuild .so — degrade
        # to the NumPy path per-function rather than rejecting the library
        if hasattr(lib, "mapt_bark_filterbank"):
            lib.mapt_bark_filterbank.argtypes = [
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_double, ctypes.c_double, ctypes.c_int32,
                ctypes.c_int32, f64p,
            ]
            lib.mapt_bark_filterbank.restype = ctypes.c_int32
        if hasattr(lib, "mapt_linear_filterbank"):
            lib.mapt_linear_filterbank.argtypes = [
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_double, ctypes.c_double, ctypes.c_int32, f64p,
            ]
            lib.mapt_linear_filterbank.restype = ctypes.c_int32

        # WAV codec: absent in a stale pre-rebuild .so — degrade per-function
        if hasattr(lib, "mapt_wav_info"):
            i32p = ctypes.POINTER(ctypes.c_int32)
            i64p = ctypes.POINTER(ctypes.c_int64)
            f32p = ctypes.POINTER(ctypes.c_float)
            lib.mapt_wav_info.argtypes = [
                ctypes.c_char_p, i64p, i32p, i32p, i32p, i32p,
            ]
            lib.mapt_wav_info.restype = ctypes.c_int32
            lib.mapt_wav_read_f32.argtypes = [
                ctypes.c_char_p, f32p, ctypes.c_int64, i64p, i32p,
            ]
            lib.mapt_wav_read_f32.restype = ctypes.c_int32
            lib.mapt_wav_write.argtypes = [
                ctypes.c_char_p, f32p, ctypes.c_int64, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32,
            ]
            lib.mapt_wav_write.restype = ctypes.c_int32

        # live smoke test (reference `_extension.py:30-44`)
        if lib.mapt_abi_version() != 2:
            return None
        probe = np.empty(4, np.float64)
        rc = lib.mapt_window(0, 4, 1, 0.0,
                             probe.ctypes.data_as(f64p))
        if rc != 0 or not np.isfinite(probe).all():
            return None
        return lib
    except Exception:
        return None


_lib = _load()

#: True when the native table builders are available (analog of HAS_CPP_EXT).
HAS_NATIVE: bool = _lib is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def native_window(name: str, n: int, fftbins: bool, beta: float | None) -> np.ndarray | None:
    if _lib is None or name not in _WINDOW_KINDS:
        return None
    if name == "kaiser" and beta is None:
        beta = 8.6  # same default as the NumPy builder (ops/windows.py)
    out = np.empty(n, np.float64)
    rc = _lib.mapt_window(
        _WINDOW_KINDS[name], n, int(fftbins), float(beta or 0.0), _ptr(out)
    )
    return out if rc == 0 else None


def native_mel_filterbank(
    sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float,
    htk: bool, norm: str | None,
) -> np.ndarray | None:
    if _lib is None or norm not in (None, "slaney"):
        return None
    out = np.empty((n_mels, n_fft // 2 + 1), np.float64)
    rc = _lib.mapt_mel_filterbank(
        sr, n_fft, n_mels, float(fmin), float(fmax), int(htk),
        1 if norm == "slaney" else 0, _ptr(out),
    )
    return out if rc == 0 else None


def native_dct_basis_t(n_out: int, n_in: int, norm: str | None) -> np.ndarray | None:
    if _lib is None or norm not in (None, "ortho"):
        return None
    out = np.empty((n_in, n_out), np.float64)
    rc = _lib.mapt_dct_basis_t(n_out, n_in, 1 if norm == "ortho" else 0, _ptr(out))
    return out if rc == 0 else None


def native_bark_filterbank(
    sr: int, n_fft: int, n_bands: int, fmin: float, fmax: float,
    formula: str, norm: str | None,
) -> np.ndarray | None:
    if (
        _lib is None
        or not hasattr(_lib, "mapt_bark_filterbank")
        or norm not in (None, "slaney")
        or formula not in ("zwicker", "traunmuller")
    ):
        return None
    out = np.empty((n_bands, n_fft // 2 + 1), np.float64)
    rc = _lib.mapt_bark_filterbank(
        sr, n_fft, n_bands, float(fmin), float(fmax),
        0 if formula == "zwicker" else 1, 1 if norm == "slaney" else 0,
        _ptr(out),
    )
    return out if rc == 0 else None


def native_linear_filterbank(
    sr: int, n_fft: int, n_bands: int, fmin: float, fmax: float,
    norm: str | None,
) -> np.ndarray | None:
    if (
        _lib is None
        or not hasattr(_lib, "mapt_linear_filterbank")
        or norm not in (None, "slaney")
    ):
        return None
    out = np.empty((n_bands, n_fft // 2 + 1), np.float64)
    rc = _lib.mapt_linear_filterbank(
        sr, n_fft, n_bands, float(fmin), float(fmax),
        1 if norm == "slaney" else 0, _ptr(out),
    )
    return out if rc == 0 else None


def has_native_wav() -> bool:
    """Whether the loaded library carries the WAV codec."""
    return _lib is not None and hasattr(_lib, "mapt_wav_info")


def native_wav_read(path: str) -> tuple[np.ndarray, int, int] | None:
    """Decode a WAV file natively -> ``(interleaved_f32, sr, channels)``.

    Returns None (caller falls back to the NumPy codec) when the library is
    missing, pre-dates the codec, or the file uses a format it rejects."""
    if not has_native_wav():
        return None
    p = os.fsencode(path)
    frames = ctypes.c_int64()
    ch = ctypes.c_int32()
    sr = ctypes.c_int32()
    bits = ctypes.c_int32()
    fmt = ctypes.c_int32()
    rc = _lib.mapt_wav_info(
        p, ctypes.byref(frames), ctypes.byref(ch), ctypes.byref(sr),
        ctypes.byref(bits), ctypes.byref(fmt),
    )
    if rc == -1:
        raise OSError(f"cannot read WAV file: {path}")
    if rc != 0:
        return None
    out = np.empty(frames.value * ch.value, np.float32)
    # the read re-parses the file; it reports the counts it ACTUALLY decoded
    # so a file rewritten between the two calls can never leave part of the
    # buffer uninitialized
    got_frames = ctypes.c_int64()
    got_ch = ctypes.c_int32()
    rc = _lib.mapt_wav_read_f32(
        p, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), frames.value,
        ctypes.byref(got_frames), ctypes.byref(got_ch),
    )
    if rc != 0 or got_ch.value != ch.value:
        return None
    if got_frames.value != frames.value:
        out = out[: got_frames.value * got_ch.value]
    return out, sr.value, ch.value


def native_wav_write(
    path: str, interleaved: np.ndarray, sr: int, bits: int
) -> bool:
    """Encode ``(frames, channels)`` float32 natively. False -> fall back."""
    if not has_native_wav():
        return False
    data = np.ascontiguousarray(interleaved, np.float32)
    frames, channels = data.shape
    rc = _lib.mapt_wav_write(
        os.fsencode(path),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        frames, channels, int(sr), int(bits),
    )
    if rc == -1:
        raise OSError(f"cannot write WAV file: {path}")
    return rc == 0


def native_hz_to_mel(f: np.ndarray, htk: bool) -> np.ndarray | None:
    if _lib is None:
        return None
    f = np.ascontiguousarray(f, np.float64)
    out = np.empty_like(f)
    rc = _lib.mapt_hz_to_mel(_ptr(f), f.size, int(htk), _ptr(out))
    return out if rc == 0 else None


def native_mel_to_hz(m: np.ndarray, htk: bool) -> np.ndarray | None:
    if _lib is None:
        return None
    m = np.ascontiguousarray(m, np.float64)
    out = np.empty_like(m)
    rc = _lib.mapt_mel_to_hz(_ptr(m), m.size, int(htk), _ptr(out))
    return out if rc == 0 else None
