"""Mathematical invariant tests (port of reference
`tests/test_mathematical_properties.py`, SURVEY.md §4 pillar 3)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mlx_audio_primitives_tpu import (
    get_window,
    istft,
    magnitude,
    melspectrogram,
    mel_filterbank,
    hz_to_mel,
    mel_to_hz,
    power_to_db,
    db_to_power,
    stft,
)


class TestParseval:
    def test_rfft_energy(self, random_signal):
        """Parseval for the LIBRARY's transform (packed rfft path)."""
        from mlx_audio_primitives_tpu.kernels.bluestein import rfft_len

        y = random_signal[:4096].reshape(2, 2048)
        Y = np.asarray(rfft_len(jnp.asarray(y), 2048))
        w = np.full(Y.shape[-1], 2.0)
        w[0] = 1.0
        w[-1] = 1.0
        lhs = np.sum(y.astype(np.float64) ** 2, axis=-1)
        rhs = np.sum(w * np.abs(Y.astype(np.complex128)) ** 2, axis=-1) / 2048
        np.testing.assert_allclose(lhs, rhs, rtol=1e-5)

    def test_stft_boxcar_energy_absolute(self, random_signal):
        """Absolute Parseval: boxcar window, hop=n_fft, center=False ->
        STFT energy equals signal energy exactly (catches constant miscale
        that a relative-scaling check cannot)."""
        n = 4096
        y = random_signal[:n]
        S = magnitude(stft(y, n_fft=512, hop_length=512, window="boxcar",
                           center=False))
        Snp = np.asarray(S, dtype=np.float64)
        w = np.full(S.shape[0], 2.0)
        w[0] = 1.0
        w[-1] = 1.0
        stft_energy = float((w[:, None] * Snp**2).sum() / 512)
        sig_energy = float(np.sum(y.astype(np.float64) ** 2))
        np.testing.assert_allclose(stft_energy, sig_energy, rtol=1e-4)

    def test_stft_energy_proportional(self, random_signal):
        """STFT energy scales with signal energy (window/overlap factor)."""
        S1 = magnitude(stft(random_signal, n_fft=1024, hop_length=256))
        S2 = magnitude(stft(2.0 * random_signal, n_fft=1024, hop_length=256))
        e1 = float(jnp.sum(S1**2))
        e2 = float(jnp.sum(S2**2))
        np.testing.assert_allclose(e2 / e1, 4.0, rtol=1e-4)


class TestLinearity:
    def test_additive(self, random_signal, sine_signal):
        a = np.asarray(stft(random_signal, n_fft=512))
        b = np.asarray(stft(sine_signal, n_fft=512))
        ab = np.asarray(stft(random_signal + sine_signal, n_fft=512))
        np.testing.assert_allclose(ab, a + b, atol=1e-3)

    def test_scaling(self, random_signal):
        a = np.asarray(stft(random_signal, n_fft=512))
        b = np.asarray(stft(3.5 * random_signal, n_fft=512))
        np.testing.assert_allclose(b, 3.5 * a, atol=1e-3)

    def test_full_linearity(self, random_signal, chirp_signal):
        a = np.asarray(stft(random_signal, n_fft=512))
        c = np.asarray(stft(chirp_signal, n_fft=512))
        comb = np.asarray(stft(2.0 * random_signal - 0.5 * chirp_signal, n_fft=512))
        np.testing.assert_allclose(comb, 2.0 * a - 0.5 * c, atol=1e-3)


class TestToneLocalization:
    @pytest.mark.parametrize("freq", [440.0, 1000.0, 4000.0])
    def test_peak_bin(self, freq, sr):
        t = np.arange(sr) / sr
        y = np.sin(2 * np.pi * freq * t).astype(np.float32)
        S = np.asarray(magnitude(stft(y, n_fft=2048, hop_length=512)))
        expected_bin = freq * 2048 / sr
        peak_bins = S[:, 5:-5].argmax(axis=0)
        assert np.abs(peak_bins - expected_bin).max() <= 1

    def test_energy_concentration(self, sr):
        t = np.arange(sr) / sr
        y = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
        S = np.asarray(magnitude(stft(y, n_fft=2048, hop_length=512))) ** 2
        b = int(round(1000.0 * 2048 / sr))
        frame = S[:, S.shape[1] // 2]
        concentration = frame[b - 3 : b + 4].sum() / frame.sum()
        assert concentration > 0.9

    def test_dc_offset(self):
        y = np.full(8192, 0.7, np.float32)
        S = np.asarray(magnitude(stft(y, n_fft=1024, hop_length=256)))
        # all energy in bin 0
        mid = S[:, S.shape[1] // 2]
        assert mid[0] > 100 * mid[5:].max()


class TestEdgeCases:
    def test_signal_shorter_than_nfft(self):
        y = np.random.default_rng(0).standard_normal(300).astype(np.float32)
        S = stft(y, n_fft=1024, hop_length=256)
        assert S.shape[0] == 513 and S.shape[1] >= 1

    def test_hop_one(self):
        y = np.random.default_rng(0).standard_normal(256).astype(np.float32)
        S = stft(y, n_fft=64, hop_length=1)
        assert S.shape == (33, 257)

    def test_hop_equals_nfft(self, random_signal):
        # rectangular window + hop=n_fft is trivially invertible
        S2 = stft(random_signal, n_fft=512, hop_length=512, window="boxcar")
        rec = np.asarray(istft(S2, hop_length=512, window="boxcar",
                               length=len(random_signal)))
        np.testing.assert_allclose(rec, random_signal, atol=1e-5)

    @pytest.mark.parametrize("n_fft", [64, 256, 1024, 4096, 8192])
    def test_nfft_sweep_roundtrip(self, random_signal, n_fft):
        S = stft(random_signal, n_fft=n_fft)
        rec = np.asarray(istft(S, n_fft=n_fft, length=len(random_signal)))
        assert np.abs(rec - random_signal).max() <= 2e-5


class TestNumericalStability:
    @pytest.mark.parametrize("scale", [1e-7, 1.0, 1e4])
    def test_no_nan_inf(self, random_signal, scale):
        y = (random_signal * scale).astype(np.float32)
        S = np.asarray(magnitude(stft(y, n_fft=1024)))
        assert np.isfinite(S).all()
        m = np.asarray(melspectrogram(y, n_mels=64))
        assert np.isfinite(m).all()

    def test_db_roundtrip_extreme(self):
        S = np.array([1e-9, 1e-3, 1.0, 1e6], np.float32)
        db = power_to_db(S, top_db=None)
        back = np.asarray(db_to_power(db))
        np.testing.assert_allclose(back, np.maximum(S, 1e-10), rtol=1e-3)

    def test_silence(self):
        y = np.zeros(22050, np.float32)
        S = np.asarray(magnitude(stft(y)))
        assert (S == 0).all()
        rec = np.asarray(istft(stft(y), length=22050))
        assert (np.abs(rec) <= 1e-7).all()


class TestWindowProperties:
    @pytest.mark.parametrize("name", ["hann", "hamming", "blackman", "bartlett"])
    def test_symmetry_exact(self, name):
        w = np.asarray(get_window(name, 1025, fftbins=False))
        np.testing.assert_array_equal(w, w[::-1])

    @pytest.mark.parametrize("name", ["hann", "hamming", "blackman"])
    def test_endpoints(self, name):
        w = np.asarray(get_window(name, 101, fftbins=False), dtype=np.float64)
        expected_end = {"hann": 0.0, "hamming": 0.08, "blackman": 0.0}[name]
        np.testing.assert_allclose(w[0], expected_end, atol=1e-7)
        np.testing.assert_allclose(w[-1], expected_end, atol=1e-7)
        np.testing.assert_allclose(w[50], 1.0, atol=1e-7)  # center peak

    @pytest.mark.parametrize("name", ["hann", "hamming", "blackman", "bartlett"])
    def test_non_negative(self, name):
        # blackman endpoints are ~-1.4e-17, matching scipy byte-for-byte
        # (see ops/windows.py:_general_cosine_np); allow f64 rounding noise.
        assert (np.asarray(get_window(name, 2048)) >= -1e-16).all()

    def test_periodic_vs_symmetric_relationship(self):
        per = np.asarray(get_window("hann", 64, fftbins=True))
        sym = np.asarray(get_window("hann", 65, fftbins=False))
        np.testing.assert_array_equal(per, sym[:-1])


class TestMelProperties:
    def test_mel_scale_monotonic(self):
        f = np.linspace(0, 11025, 2000)
        m = hz_to_mel(f)
        assert (np.diff(m) > 0).all()

    def test_mel_hz_inverse(self):
        m = np.linspace(0, 45, 500)
        np.testing.assert_allclose(hz_to_mel(mel_to_hz(m)), m, atol=1e-8)

    def test_triangular_filter_shape(self):
        fb = np.asarray(mel_filterbank(22050, 2048, n_mels=40, norm=None))
        for row in fb[2:38]:
            peak = row.argmax()
            nz = np.flatnonzero(row)
            rising = row[nz[0] : peak + 1]
            falling = row[peak : nz[-1] + 1]
            assert (np.diff(rising) >= -1e-7).all()
            assert (np.diff(falling) <= 1e-7).all()

    def test_filterbank_covers_spectrum(self):
        fb = np.asarray(mel_filterbank(22050, 2048, n_mels=128, norm=None))
        coverage = fb.sum(axis=0)
        # every interior bin is covered by at least one filter
        assert (coverage[2:-2] > 0).all()
