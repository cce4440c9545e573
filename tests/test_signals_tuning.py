"""tone/chirp/clicks generators, magphase, and tuning estimation tests."""

import numpy as np
import pytest

import mlx_audio_primitives_tpu as ap

SR = 22050


class TestGenerators:
    def test_tone_frequency_and_start(self):
        y = ap.tone(440.0, sr=SR, duration=1.0)
        assert y.shape == (SR,) and y.dtype == np.float32
        assert abs(y[0]) < 1e-6  # default phi=-pi/2 -> sine, starts at 0
        # zero crossings count ~ 2*f
        zc = np.sum(np.abs(np.diff(np.signbit(y))))
        np.testing.assert_allclose(zc, 2 * 440, atol=2)

    def test_tone_phi(self):
        y = ap.tone(100.0, sr=SR, length=100, phi=0.0)
        np.testing.assert_allclose(y[0], 1.0, atol=1e-6)

    def test_chirp_linear_instantaneous_frequency(self):
        y = ap.chirp(500.0, 2000.0, sr=SR, duration=1.0, linear=True)
        f, t, m = ap.reassigned_spectrogram(np.asarray(y), sr=SR)
        f, t, m = map(np.asarray, (f, t, m))
        for fr in (10, m.shape[1] // 2, m.shape[1] - 10):
            k = int(np.argmax(m[:, fr]))
            f_true = 500.0 + 1500.0 * t[k, fr]
            np.testing.assert_allclose(f[k, fr], f_true, rtol=0.01)

    def test_chirp_exponential_instantaneous_frequency(self):
        y = ap.chirp(200.0, 800.0, sr=SR, duration=1.0)
        f, t, m = ap.reassigned_spectrogram(np.asarray(y), sr=SR)
        f, t, m = map(np.asarray, (f, t, m))
        for fr in (10, m.shape[1] // 2):
            k = int(np.argmax(m[:, fr]))
            f_true = 200.0 * (800.0 / 200.0) ** t[k, fr]
            np.testing.assert_allclose(f[k, fr], f_true, rtol=0.02)

    def test_clicks_positions(self):
        y = ap.clicks(times=[0.1, 0.5], sr=SR, length=SR)
        assert y.shape == (SR,)
        assert np.abs(y[: int(0.1 * SR) - 1]).max() == 0.0
        assert np.abs(y[int(0.1 * SR) : int(0.1 * SR) + 100]).max() > 0
        y2 = ap.clicks(frames=[10], sr=SR, hop_length=512)
        assert np.abs(y2[:5119]).max() == 0.0

    def test_custom_click(self):
        ck = np.ones(5, np.float32)
        y = ap.clicks(times=[0.0], sr=SR, click=ck, length=10)
        np.testing.assert_array_equal(y[:5], 1.0)
        np.testing.assert_array_equal(y[5:], 0.0)

    def test_errors(self):
        with pytest.raises(ValueError):
            ap.tone(440.0)  # no length/duration
        with pytest.raises(ValueError):
            ap.tone(-1.0, length=10)
        with pytest.raises(ValueError):
            ap.chirp(0.0, 100.0, length=10)
        with pytest.raises(ValueError):
            ap.clicks()


class TestMagphase:
    def test_reconstruction(self):
        y = ap.tone(440.0, sr=SR, duration=0.3)
        D = np.asarray(ap.stft(np.asarray(y), n_fft=512, hop_length=128))
        mag, ph = ap.magphase(D)
        np.testing.assert_allclose(
            np.asarray(mag) * np.asarray(ph), D, atol=1e-5
        )
        np.testing.assert_allclose(np.abs(np.asarray(ph)), 1.0, atol=1e-5)

    def test_power(self):
        D = np.array([[3 + 4j]], np.complex64)
        mag, ph = ap.magphase(D, power=2.0)
        np.testing.assert_allclose(np.asarray(mag), 25.0, rtol=1e-6)

    def test_zero_cell_phase_one(self):
        D = np.zeros((2, 2), np.complex64)
        mag, ph = ap.magphase(D)
        np.testing.assert_array_equal(np.asarray(ph), 1.0 + 0.0j)


class TestTuning:
    def test_pitch_tuning_quarter_sharp(self):
        # pitches 25 cents sharp of equal temperament
        midis = np.arange(40, 80)
        freqs = 440.0 * 2 ** ((midis - 69 + 0.25) / 12)
        est = ap.pitch_tuning(freqs)
        np.testing.assert_allclose(est, 0.25, atol=0.02)

    def test_pitch_tuning_in_tune(self):
        freqs = 440.0 * 2 ** ((np.arange(40, 80) - 69) / 12)
        assert abs(ap.pitch_tuning(freqs)) <= 0.02

    def test_pitch_tuning_empty(self):
        assert ap.pitch_tuning([]) == 0.0
        assert ap.pitch_tuning([0.0, -1.0, np.nan]) == 0.0

    @pytest.mark.parametrize("offset", [-0.3, 0.0, 0.2])
    def test_estimate_tuning_detuned_tone(self, offset):
        f0 = 440.0 * 2 ** (offset / 12)
        y = ap.tone(f0, sr=SR, duration=1.0)
        est = ap.estimate_tuning(y=np.asarray(y), sr=SR)
        np.testing.assert_allclose(est, offset, atol=0.03)

    def test_estimate_tuning_silence(self):
        assert ap.estimate_tuning(
            S=np.zeros((1025, 10), np.float32), sr=SR
        ) == 0.0
