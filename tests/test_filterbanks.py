"""Bark/linear filterbank tests (port of reference `tests/test_filterbanks.py`)."""

import numpy as np
import pytest

from mlx_audio_primitives_tpu import (
    bark_filterbank,
    bark_to_hz,
    hz_to_bark,
    linear_filterbank,
)


class TestBarkScale:
    @pytest.mark.parametrize("formula", ["zwicker", "traunmuller"])
    def test_roundtrip(self, formula):
        f = np.linspace(20, 11025, 500)
        back = bark_to_hz(hz_to_bark(f, formula=formula), formula=formula)
        np.testing.assert_allclose(back, f, rtol=1e-5)

    def test_zwicker_formula_values(self):
        f = np.array([100.0, 1000.0, 5000.0])
        expected = 13.0 * np.arctan(0.00076 * f) + 3.5 * np.arctan((f / 7500.0) ** 2)
        np.testing.assert_allclose(hz_to_bark(f), expected)

    def test_traunmuller_edges(self):
        # below 2 bark and above 20.1 bark corrections round-trip
        f = np.array([50.0, 150.0, 10000.0, 15000.0])
        z = hz_to_bark(f, formula="traunmuller")
        np.testing.assert_allclose(
            bark_to_hz(z, formula="traunmuller"), f, rtol=1e-6
        )

    def test_monotonic(self):
        f = np.linspace(0, 20000, 1000)
        for formula in ("zwicker", "traunmuller"):
            assert (np.diff(hz_to_bark(f, formula=formula)) > 0).all()

    def test_unknown_formula_raises(self):
        with pytest.raises(ValueError):
            hz_to_bark(np.array([100.0]), formula="bogus")
        with pytest.raises(ValueError):
            bark_to_hz(np.array([5.0]), formula="bogus")


class TestBarkFilterbank:
    def test_shape(self):
        assert bark_filterbank(22050, 2048, n_bands=24).shape == (24, 1025)

    def test_nonnegative(self):
        fb = np.asarray(bark_filterbank(22050, 2048))
        assert (fb >= 0).all()

    def test_every_band_nonzero(self):
        fb = np.asarray(bark_filterbank(22050, 2048, n_bands=24))
        assert (fb.sum(axis=1) > 0).all()

    @pytest.mark.parametrize("formula", ["zwicker", "traunmuller"])
    def test_formulas(self, formula):
        fb = np.asarray(bark_filterbank(22050, 1024, n_bands=16, formula=formula))
        assert fb.shape == (16, 513)
        assert np.isfinite(fb).all()

    def test_norm_none_peak_one(self):
        fb = np.asarray(bark_filterbank(22050, 2048, n_bands=24, norm=None))
        # interior triangular filters peak near 1
        assert fb.max() <= 1.0 + 1e-6
        assert fb.max() > 0.9

    def test_validation(self):
        with pytest.raises(ValueError):
            bark_filterbank(22050, 2048, n_bands=0)
        with pytest.raises(ValueError):
            bark_filterbank(22050, 2048, fmin=9000, fmax=1000)
        with pytest.raises(ValueError):
            bark_filterbank(22050, 2048, fmax=22050.0)
        with pytest.raises(ValueError):
            bark_filterbank(22050, 2048, formula="bogus")
        with pytest.raises(ValueError):
            bark_filterbank(22050, 2048, norm="l1")

    def test_cached(self):
        assert bark_filterbank(22050, 2048) is bark_filterbank(22050, 2048)


class TestLinearFilterbank:
    def test_shape(self):
        assert linear_filterbank(22050, 2048, n_bands=64).shape == (64, 1025)

    def test_centers_equally_spaced(self):
        fb = np.asarray(linear_filterbank(16000, 1024, n_bands=32, norm=None))
        freqs = np.linspace(0, 8000, 513)
        centers = freqs[fb.argmax(axis=1)]
        spacing = np.diff(centers)
        assert spacing.std() < spacing.mean() * 0.2

    def test_slaney_norm_scales_by_bandwidth(self):
        fb_n = np.asarray(linear_filterbank(22050, 2048, n_bands=32))
        fb_u = np.asarray(linear_filterbank(22050, 2048, n_bands=32, norm=None))
        hz_points = np.linspace(0, 11025, 34)
        enorm = 2.0 / (hz_points[2:] - hz_points[:-2])
        np.testing.assert_allclose(fb_n, fb_u * enorm[:, None], rtol=1e-5, atol=1e-8)

    def test_validation(self):
        with pytest.raises(ValueError):
            linear_filterbank(22050, 2048, n_bands=-1)
        with pytest.raises(ValueError):
            linear_filterbank(22050, 2048, fmax=99999.0)
