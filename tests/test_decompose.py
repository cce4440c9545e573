"""HPSS / median filtering (`ops/decompose.py`).

Oracles: `scipy.ndimage.median_filter` (third-party, exact) for the filter
engine; mask algebra and synthetic harmonic/percussive separation for hpss.
"""

import numpy as np
import pytest
import scipy.ndimage

from mlx_audio_primitives_tpu import harmonic, hpss, percussive, stft
from mlx_audio_primitives_tpu.ops.decompose import median_filter_1d


class TestMedianFilter:
    @pytest.mark.parametrize("size", [1, 3, 5, 9, 31])
    @pytest.mark.parametrize("axis", [0, 1, -1])
    def test_matches_scipy_odd(self, size, axis):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((40, 50)).astype(np.float32)
        ours = np.asarray(median_filter_1d(x, size, axis=axis))
        shape = [1, 1]
        shape[axis] = size
        ref = scipy.ndimage.median_filter(x, size=tuple(shape), mode="reflect")
        np.testing.assert_array_equal(ours, ref)

    @pytest.mark.parametrize("size", [2, 4, 8])
    def test_matches_scipy_even(self, size):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((30, 20)).astype(np.float32)
        ours = np.asarray(median_filter_1d(x, size, axis=-1))
        ref = scipy.ndimage.median_filter(x, size=(1, size), mode="reflect")
        np.testing.assert_array_equal(ours, ref)

    def test_batched(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((3, 16, 24)).astype(np.float32)
        out = np.asarray(median_filter_1d(x, 5, axis=-1))
        for b in range(3):
            ref = scipy.ndimage.median_filter(x[b], size=(1, 5), mode="reflect")
            np.testing.assert_array_equal(out[b], ref)

    def test_validation(self):
        with pytest.raises(ValueError):
            median_filter_1d(np.zeros((4, 4)), 0)
        with pytest.raises(ValueError):
            median_filter_1d(np.zeros(4), 100)


def _tone_plus_clicks(sr=22050, n=22050):
    """Steady 440 Hz tone (harmonic) + periodic clicks (percussive)."""
    t = np.arange(n) / sr
    tone = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    clicks = np.zeros(n)
    clicks[:: sr // 10] = 1.0
    return (tone + clicks).astype(np.float32), tone.astype(np.float32), clicks.astype(np.float32)


class TestHPSS:
    def test_masks_sum_to_one(self, random_signal):
        S = np.abs(np.asarray(stft(random_signal, n_fft=512, hop_length=128)))
        mh, mp = hpss(S, kernel_size=15, mask=True)
        mh, mp = np.asarray(mh), np.asarray(mp)
        nz = S > 1e-10
        np.testing.assert_allclose((mh + mp)[nz], 1.0, atol=1e-5)
        assert mh.min() >= 0 and mh.max() <= 1 + 1e-6

    def test_components_sum_to_input(self, random_signal):
        S = np.abs(np.asarray(stft(random_signal, n_fft=512, hop_length=128)))
        H, P = hpss(S, kernel_size=15)
        np.testing.assert_allclose(
            np.asarray(H) + np.asarray(P), S, rtol=1e-4, atol=1e-6
        )

    def test_hard_masks_binary_complementary(self, random_signal):
        S = np.abs(np.asarray(stft(random_signal, n_fft=512, hop_length=128)))
        mh, mp = hpss(S, kernel_size=15, power=np.inf, mask=True)
        mh, mp = np.asarray(mh), np.asarray(mp)
        assert set(np.unique(mh)) <= {0.0, 1.0}
        assert np.all(mh + mp <= 1.0 + 1e-6)

    def test_separates_tone_from_clicks(self):
        y, tone, clicks = _tone_plus_clicks()
        n_fft, hop = 1024, 256
        S = np.asarray(stft(y, n_fft=n_fft, hop_length=hop))
        H, P = hpss(S, kernel_size=31)
        H, P = np.asarray(H), np.asarray(P)
        bin_tone = int(round(440.0 * n_fft / 22050))
        # the tone's bin stays in H; broadband click energy lands in P
        tone_row_h = np.abs(H[bin_tone]).mean()
        tone_row_p = np.abs(P[bin_tone]).mean()
        assert tone_row_h > 5 * tone_row_p
        hi = slice(n_fft // 4, n_fft // 2)  # far above the tone
        assert np.abs(P[hi]).sum() > 5 * np.abs(H[hi]).sum()

    def test_complex_input_preserves_phase(self, random_signal):
        D = np.asarray(stft(random_signal, n_fft=512, hop_length=128))
        H, P = hpss(D, kernel_size=15)
        H, P = np.asarray(H), np.asarray(P)
        assert np.iscomplexobj(H) and np.iscomplexobj(P)
        # magnitudes reconstruct; phases match the input where energy remains
        np.testing.assert_allclose(
            np.abs(H) + np.abs(P), np.abs(D), rtol=1e-4, atol=1e-6
        )
        strong = np.abs(H) > 0.1 * np.abs(D).max()
        np.testing.assert_allclose(
            np.angle(H)[strong], np.angle(D)[strong], atol=1e-3
        )

    def test_margin_leaves_residual(self, random_signal):
        S = np.abs(np.asarray(stft(random_signal, n_fft=512, hop_length=128)))
        H, P = hpss(S, kernel_size=15, margin=2.0)
        resid = S - np.asarray(H) - np.asarray(P)
        assert resid.min() > -1e-5  # components never overshoot
        assert resid.sum() > 0  # something is left behind

    def test_kernel_tuple_and_margin_tuple(self, random_signal):
        S = np.abs(np.asarray(stft(random_signal, n_fft=512, hop_length=128)))
        H, P = hpss(S, kernel_size=(17, 31), margin=(1.0, 1.5))
        assert np.asarray(H).shape == S.shape

    def test_batched(self, batch_signals):
        S = np.abs(np.asarray(stft(batch_signals[:, :8192], n_fft=512, hop_length=128)))
        H, P = hpss(S, kernel_size=9)
        for b in range(S.shape[0]):
            Hb, Pb = hpss(S[b], kernel_size=9)
            np.testing.assert_allclose(np.asarray(H)[b], np.asarray(Hb), atol=1e-6)

    def test_validation(self):
        S = np.zeros((10, 10), dtype=np.float32)
        with pytest.raises(ValueError):
            hpss(S, margin=0.5)
        with pytest.raises(ValueError):
            hpss(S, kernel_size=0)
        with pytest.raises(ValueError):
            hpss(np.zeros(5, dtype=np.float32))


class TestAudioSeparation:
    def test_harmonic_plus_percussive_reconstructs(self):
        y, _, _ = _tone_plus_clicks()
        yh = np.asarray(harmonic(y, n_fft=1024))
        yp = np.asarray(percussive(y, n_fft=1024))
        assert yh.shape == y.shape and yp.shape == y.shape
        # margin=1 masks sum to 1, so the components sum back to the input
        np.testing.assert_allclose(yh + yp, y, atol=1e-3)

    def test_harmonic_keeps_tone(self):
        y, tone, clicks = _tone_plus_clicks()
        yh = np.asarray(harmonic(y, n_fft=1024))
        # correlation with the clean tone should dominate
        tone_corr = np.corrcoef(yh, tone)[0, 1]
        click_corr = np.corrcoef(np.asarray(percussive(y, n_fft=1024)), clicks)[0, 1]
        assert tone_corr > 0.9, tone_corr
        assert click_corr > 0.5, click_corr

    def test_batched_audio(self, batch_signals):
        out = harmonic(batch_signals[:, :8192], n_fft=512, kernel_size=9)
        assert out.shape == (4, 8192)
