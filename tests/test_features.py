"""Spectral feature parity (port of reference `tests/test_features.py`).

Oracle: float64 NumPy implementations of librosa's documented formulas,
computed from the same magnitude spectrogram.
"""

import numpy as np
import pytest

from mlx_audio_primitives_tpu import (
    magnitude,
    spectral_bandwidth,
    spectral_centroid,
    spectral_contrast,
    spectral_flatness,
    spectral_rolloff,
    stft,
    zero_crossing_rate,
)

from oracles import stft_np

SR = 22050
N_FFT = 2048
HOP = 512


@pytest.fixture(scope="module")
def S_np(random_signal):
    # derived from the shared conftest fixture so oracle and library inputs
    # can never silently diverge
    return np.abs(stft_np(random_signal, n_fft=N_FFT, hop_length=HOP))


@pytest.fixture(scope="module")
def freqs():
    return np.linspace(0, SR / 2, N_FFT // 2 + 1)


class TestCentroid:
    def test_matches_formula(self, random_signal, S_np, freqs):
        ours = np.asarray(spectral_centroid(random_signal, sr=SR))
        ref = (freqs[:, None] * S_np).sum(0) / (S_np.sum(0) + 1e-10)
        assert ours.shape == (1, S_np.shape[1])
        np.testing.assert_allclose(ours[0], ref, rtol=1e-3)

    def test_from_spectrogram(self, random_signal, S_np, freqs):
        ours = np.asarray(spectral_centroid(S=S_np.astype(np.float32), sr=SR))
        ref = (freqs[:, None] * S_np).sum(0) / (S_np.sum(0) + 1e-10)
        np.testing.assert_allclose(ours[0], ref, rtol=1e-4)

    def test_batched(self, batch_signals):
        out = spectral_centroid(batch_signals, sr=SR)
        assert out.shape[0] == 4 and out.shape[1] == 1

    def test_sine_centroid_near_frequency(self, sine_signal):
        c = np.asarray(spectral_centroid(sine_signal, sr=SR))
        # interior frames: centroid should be close to 440 Hz
        assert abs(np.median(c) - 440.0) < 60.0

    def test_requires_input(self):
        with pytest.raises(ValueError):
            spectral_centroid()


class TestBandwidth:
    def test_matches_formula(self, random_signal, S_np, freqs):
        ours = np.asarray(spectral_bandwidth(random_signal, sr=SR))
        cent = (freqs[:, None] * S_np).sum(0) / (S_np.sum(0) + 1e-10)
        dev = np.abs(freqs[:, None] - cent[None, :])
        ref = ((S_np * dev**2).sum(0) / (S_np.sum(0) + 1e-10)) ** 0.5
        np.testing.assert_allclose(ours[0], ref, rtol=1e-3)

    def test_p1(self, S_np, freqs):
        ours = np.asarray(spectral_bandwidth(S=S_np.astype(np.float32), sr=SR, p=1.0))
        cent = (freqs[:, None] * S_np).sum(0) / (S_np.sum(0) + 1e-10)
        dev = np.abs(freqs[:, None] - cent[None, :])
        ref = (S_np * dev).sum(0) / (S_np.sum(0) + 1e-10)
        np.testing.assert_allclose(ours[0], ref, rtol=1e-3)

    def test_norm_false(self, S_np, freqs):
        ours = np.asarray(
            spectral_bandwidth(S=S_np.astype(np.float32), sr=SR, norm=False)
        )
        cent = (freqs[:, None] * S_np).sum(0) / (S_np.sum(0) + 1e-10)
        dev = np.abs(freqs[:, None] - cent[None, :])
        ref = ((S_np * dev**2).sum(0)) ** 0.5
        np.testing.assert_allclose(ours[0], ref, rtol=1e-3)

    def test_precomputed_centroid(self, S_np):
        S32 = S_np.astype(np.float32)
        c = spectral_centroid(S=S32, sr=SR)
        a = np.asarray(spectral_bandwidth(S=S32, sr=SR, centroid=c))
        b = np.asarray(spectral_bandwidth(S=S32, sr=SR))
        np.testing.assert_allclose(a, b, rtol=1e-5)


class TestRolloff:
    def _oracle(self, S, freqs, pct):
        cs = np.cumsum(S, axis=0)
        out = np.zeros(S.shape[1])
        for t in range(S.shape[1]):
            idx = np.searchsorted(cs[:, t], pct * cs[-1, t])
            out[t] = freqs[min(idx, len(freqs) - 1)]
        return out

    @pytest.mark.parametrize("pct", [0.5, 0.85, 0.99])
    def test_matches_searchsorted(self, S_np, freqs, pct):
        ours = np.asarray(
            spectral_rolloff(S=S_np.astype(np.float32), sr=SR, roll_percent=pct)
        )
        ref = self._oracle(S_np.astype(np.float32), freqs, pct)
        np.testing.assert_allclose(ours[0], ref, rtol=1e-5)

    def test_monotone_in_percent(self, S_np):
        S32 = S_np.astype(np.float32)
        lo = np.asarray(spectral_rolloff(S=S32, sr=SR, roll_percent=0.5))
        hi = np.asarray(spectral_rolloff(S=S32, sr=SR, roll_percent=0.95))
        assert (hi >= lo).all()

    def test_validation(self, S_np):
        with pytest.raises(ValueError):
            spectral_rolloff(S=S_np.astype(np.float32), roll_percent=1.5)


class TestFlatness:
    def test_matches_formula(self, S_np):
        S32 = S_np.astype(np.float32)
        ours = np.asarray(spectral_flatness(S=S32))
        Sp = np.maximum(S_np, 1e-10)
        gmean = np.exp(np.mean(np.log(Sp), axis=0))
        amean = np.mean(Sp, axis=0)
        ref = gmean / (amean + 1e-10)
        np.testing.assert_allclose(ours[0], ref, rtol=1e-3)

    def test_noise_flatter_than_tone(self, random_signal, sine_signal):
        fn = float(np.median(np.asarray(spectral_flatness(random_signal))))
        ft = float(np.median(np.asarray(spectral_flatness(sine_signal))))
        assert fn > 10 * ft

    def test_range(self, random_signal):
        f = np.asarray(spectral_flatness(random_signal))
        assert (f >= 0).all() and (f <= 1.0 + 1e-5).all()


class TestContrast:
    def _oracle(self, S, freqs, fmin=200.0, n_bands=6, quantile=0.02, linear=False):
        octa = np.zeros(n_bands + 2)
        octa[1:] = fmin * (2.0 ** np.arange(0, n_bands + 1))
        valley = np.zeros((n_bands + 1, S.shape[1]))
        peak = np.zeros_like(valley)
        for k, (fl, fh) in enumerate(zip(octa[:-1], octa[1:])):
            band = np.logical_and(freqs >= fl, freqs <= fh)
            idx = np.flatnonzero(band)
            if len(idx) == 0:
                continue
            if k > 0 and idx[0] > 0:
                band[idx[0] - 1] = True
            if k == n_bands and idx[-1] + 1 < len(band):
                band[idx[-1] + 1 :] = True
            nq = int(max(np.rint(quantile * band.sum()), 1))
            sub = S[band]
            if k < n_bands and sub.shape[0] > 1:
                sub = sub[:-1]
            ss = np.sort(sub, axis=0)
            valley[k] = ss[:nq].mean(0)
            peak[k] = ss[-nq:].mean(0)
        if linear:
            return peak - valley
        return 10 * np.log10(np.maximum(peak, 1e-10)) - 10 * np.log10(
            np.maximum(valley, 1e-10)
        )

    @pytest.mark.parametrize("linear", [False, True])
    def test_matches_librosa_algorithm(self, S_np, freqs, linear):
        S32 = S_np.astype(np.float32)
        ours = np.asarray(spectral_contrast(S=S32, sr=SR, linear=linear))
        ref = self._oracle(S32.astype(np.float64), freqs, linear=linear)
        assert ours.shape == ref.shape == (7, S_np.shape[1])
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)

    def test_batched(self, batch_signals):
        out = spectral_contrast(batch_signals, sr=SR, n_bands=4)
        assert out.shape[:2] == (4, 5)

    def test_validation(self, S_np):
        with pytest.raises(ValueError):
            spectral_contrast(S=S_np.astype(np.float32), n_bands=0)
        with pytest.raises(ValueError):
            spectral_contrast(S=S_np.astype(np.float32), quantile=2.0)


class TestZCR:
    def _oracle(self, y, frame_length=2048, hop=512, center=True):
        if center:
            y = np.pad(y, frame_length // 2, mode="edge")
        n = 1 + (len(y) - frame_length) // hop
        out = np.zeros(n)
        for t in range(n):
            fr = y[t * hop : t * hop + frame_length]
            sc = np.abs(np.diff(np.signbit(fr))).sum()
            out[t] = sc / frame_length
        return out

    def test_matches_librosa_algorithm(self, random_signal):
        ours = np.asarray(zero_crossing_rate(random_signal))
        ref = self._oracle(random_signal)
        assert ours.shape == (1, len(ref))
        np.testing.assert_allclose(ours[0], ref, atol=1e-6)

    def test_sine_zcr_matches_frequency(self, sine_signal):
        z = np.asarray(zero_crossing_rate(sine_signal))
        # 440 Hz sine: 880 crossings/s -> rate ~880/22050
        assert abs(np.median(z) - 880 / 22050) < 0.005

    def test_constant_pad_mode(self, random_signal):
        a = np.asarray(zero_crossing_rate(random_signal, pad_mode="constant"))
        assert a.shape[0] == 1

    def test_batched(self, batch_signals):
        z = zero_crossing_rate(batch_signals)
        assert z.shape[0] == 4 and z.shape[1] == 1

    def test_validation(self, random_signal):
        with pytest.raises(ValueError):
            zero_crossing_rate(random_signal, frame_length=0)
        with pytest.raises(ValueError):
            zero_crossing_rate(random_signal, pad_mode="reflect")


class TestSOrYProtocol:
    def test_S_overrides_y(self, random_signal):
        S = np.asarray(magnitude(stft(random_signal, n_fft=N_FFT, hop_length=HOP)))
        a = np.asarray(spectral_centroid(y=random_signal, S=S, sr=SR))
        b = np.asarray(spectral_centroid(S=S, sr=SR))
        np.testing.assert_array_equal(a, b)
