"""Window parity vs scipy (port of reference `tests/test_windows.py`)."""

import numpy as np
import pytest
import scipy.signal

from mlx_audio_primitives_tpu import get_window

WINDOW_NAMES = ["hann", "hamming", "blackman", "bartlett", "boxcar"]
SIZES = [16, 255, 256, 1024, 2048, 4096]


@pytest.mark.parametrize("name", WINDOW_NAMES)
@pytest.mark.parametrize("n", SIZES)
@pytest.mark.parametrize("fftbins", [True, False])
def test_window_matches_scipy(name, n, fftbins):
    ours = np.asarray(get_window(name, n, fftbins=fftbins))
    ref = scipy.signal.get_window(name, n, fftbins=fftbins).astype(np.float32)
    # byte-exact: the reference's headline bar (NUMERICAL_ACCURACY.md)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("alias,canon", [
    ("hanning", "hann"),
    ("triangular", "bartlett"),
    ("ones", "boxcar"),
    ("rectangular", "boxcar"),
])
def test_window_aliases(alias, canon):
    np.testing.assert_array_equal(
        np.asarray(get_window(alias, 128)), np.asarray(get_window(canon, 128))
    )


def test_kaiser_string_default_beta():
    """get_window('kaiser', n) (string form) uses beta=8.6 regardless of
    whether the native or NumPy builder serves it."""
    ours = np.asarray(get_window("kaiser", 128, fftbins=True))
    ref = scipy.signal.get_window(("kaiser", 8.6), 128, fftbins=True)
    np.testing.assert_allclose(ours, ref.astype(np.float32), atol=1e-6)
    assert ours[0] < 0.01  # tapered, not rectangular


@pytest.mark.parametrize("beta", [5.0, 8.6, 14.0])
def test_kaiser_matches_scipy(beta):
    ours = np.asarray(get_window(("kaiser", beta), 512, fftbins=True))
    ref = scipy.signal.get_window(("kaiser", beta), 512, fftbins=True)
    np.testing.assert_allclose(ours, ref.astype(np.float32), atol=1e-6, rtol=0)


@pytest.mark.parametrize("name", WINDOW_NAMES)
def test_symmetric_window_is_symmetric(name):
    w = np.asarray(get_window(name, 513, fftbins=False), dtype=np.float64)
    np.testing.assert_allclose(w, w[::-1], atol=0)  # exactly symmetric


def test_periodic_is_symmetric_nplus1_truncated():
    w_per = np.asarray(get_window("hann", 256, fftbins=True))
    w_sym = np.asarray(get_window("hann", 257, fftbins=False))
    np.testing.assert_array_equal(w_per, w_sym[:256])


def test_window_non_negative_and_peak():
    for name in WINDOW_NAMES:
        w = np.asarray(get_window(name, 1024))
        # scipy's blackman endpoints are ~-1.4e-17 (kept for byte-exact
        # parity); anything beyond f64 rounding noise is a real bug.
        assert (w >= -1e-16).all()
        assert w.max() <= 1.0 + 1e-6


def test_array_window_passthrough():
    arr = np.linspace(0, 1, 64).astype(np.float32)
    out = np.asarray(get_window(arr, 64))
    np.testing.assert_array_equal(out, arr)


def test_array_window_wrong_length_raises():
    with pytest.raises(ValueError):
        get_window(np.ones(32, np.float32), 64)


def test_unknown_window_raises():
    with pytest.raises(ValueError):
        get_window("nope", 64)


def test_bad_type_raises():
    with pytest.raises(TypeError):
        get_window(3.14, 64)


def test_length_one_window():
    assert np.asarray(get_window("hann", 1)).tolist() == [1.0]


def test_cache_returns_same_buffer():
    a = get_window("hann", 2048)
    b = get_window("hann", 2048)
    assert a is b  # device-resident cache hit, no transfer
