"""Tests: fourier_tempogram, poly_features, stack_memory, mfcc_to_mel/audio."""

import numpy as np
import pytest

import mlx_audio_primitives_tpu as ap

SR = 22050
HOP = 512


class TestFourierTempogram:
    def test_click_train_peak_bin(self):
        # envelope with period-8 impulses: tempogram bin k peaks where
        # k * fps / win matches 1/8 frames^-1 -> k = win/8
        win = 128
        env = np.tile(np.r_[1.0, np.zeros(7)], 80).astype(np.float32)
        T = np.abs(np.asarray(ap.fourier_tempogram(
            onset_envelope=env, sr=SR, hop_length=HOP, win_length=win)))
        assert T.shape == (win // 2 + 1, len(env) + 1)
        mid = T[:, T.shape[1] // 3 : 2 * T.shape[1] // 3]
        # ignore DC; first harmonic of the impulse train is at bin 16
        peak = 1 + int(np.argmax(mid[1:].mean(axis=1)))
        assert peak == win // 8

    def test_matches_stft_directly(self):
        # librosa formulation: linear_ramp-pad the envelope by win//2
        # each side, then an UNcentered stft at hop 1
        rng = np.random.default_rng(0)
        env = rng.uniform(0, 1, 200).astype(np.float32)
        T = np.asarray(ap.fourier_tempogram(onset_envelope=env,
                                            win_length=64))
        padded = np.pad(env, 32, mode="linear_ramp", end_values=0.0)
        D = np.asarray(ap.stft(padded, n_fft=64, hop_length=1,
                               center=False))
        np.testing.assert_allclose(np.abs(T), np.abs(D), atol=1e-5)
        # interior frames unaffected by the boundary convention
        Dc = np.asarray(ap.stft(env, n_fft=64, hop_length=1))
        np.testing.assert_allclose(np.abs(T)[:, 40:-40],
                                   np.abs(Dc)[:, 40:-40], atol=1e-5)

    def test_from_audio_shape(self, sine_signal):
        T = ap.fourier_tempogram(y=sine_signal, sr=SR, win_length=128)
        assert T.shape[0] == 65

    def test_errors(self):
        with pytest.raises(ValueError):
            ap.fourier_tempogram()


class TestPolyFeatures:
    def test_matches_polyfit(self):
        rng = np.random.default_rng(1)
        S = rng.uniform(0, 1, (1025, 12)).astype(np.float32)
        for order in (0, 1, 2):
            ours = np.asarray(ap.poly_features(S=S, sr=SR, n_fft=2048,
                                               order=order))
            freq = np.linspace(0, SR / 2, 1025)
            ref = np.polyfit(freq, S.astype(np.float64), order)
            assert ours.shape == (order + 1, 12)
            scale = np.abs(ref).max(axis=1, keepdims=True) + 1e-12
            np.testing.assert_allclose(ours / scale, ref / scale, atol=5e-4)

    def test_exact_on_polynomial_spectrum(self):
        # spectrum that IS a line in frequency: fit must recover it
        freq = np.linspace(0, SR / 2, 513)
        S = (3e-5 * freq + 0.75)[:, None].astype(np.float32)
        c = np.asarray(ap.poly_features(S=S, sr=SR, n_fft=1024, order=1))
        np.testing.assert_allclose(c[0, 0], 3e-5, rtol=1e-3)
        np.testing.assert_allclose(c[1, 0], 0.75, rtol=1e-3)

    def test_custom_freq_grid(self):
        rng = np.random.default_rng(2)
        S = rng.uniform(0, 1, (64, 6)).astype(np.float32)
        f = np.linspace(100.0, 8000.0, 64)
        ours = np.asarray(ap.poly_features(S=S, sr=SR, order=1, freq=f))
        ref = np.polyfit(f, S.astype(np.float64), 1)
        scale = np.abs(ref).max(axis=1, keepdims=True) + 1e-12
        np.testing.assert_allclose(ours / scale, ref / scale, atol=5e-4)

    def test_batched_from_audio(self, sine_signal):
        Y = np.stack([sine_signal, sine_signal])
        c = np.asarray(ap.poly_features(y=Y, sr=SR, order=2))
        assert c.shape[:2] == (2, 3)

    def test_errors(self):
        with pytest.raises(ValueError):
            ap.poly_features(S=np.ones((10, 2), np.float32), order=-1)
        with pytest.raises(ValueError):
            ap.poly_features(S=np.ones((10, 2), np.float32), order=1,
                             freq=np.ones(5))


class TestStackMemory:
    def test_basic_delay(self):
        X = np.arange(12, dtype=np.float32).reshape(2, 6)
        out = np.asarray(ap.stack_memory(X, n_steps=3, delay=2))
        assert out.shape == (6, 6)
        np.testing.assert_array_equal(out[:2], X)
        np.testing.assert_array_equal(out[2:4, 2:], X[:, :-2])
        np.testing.assert_array_equal(out[2:4, :2], 0)
        np.testing.assert_array_equal(out[4:6, 4:], X[:, :-4])

    def test_negative_delay_future(self):
        X = np.arange(8, dtype=np.float32).reshape(1, 8)
        out = np.asarray(ap.stack_memory(X, n_steps=2, delay=-3))
        np.testing.assert_array_equal(out[0], X[0])
        np.testing.assert_array_equal(out[1, :-3], X[0, 3:])
        np.testing.assert_array_equal(out[1, -3:], 0)

    def test_n_steps_one_identity(self):
        X = np.random.default_rng(0).uniform(0, 1, (3, 5)).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(ap.stack_memory(X, 1)), X)

    def test_errors(self):
        with pytest.raises(ValueError):
            ap.stack_memory(np.ones((2, 3), np.float32), n_steps=0)
        with pytest.raises(ValueError):
            ap.stack_memory(np.ones((2, 3), np.float32), delay=0)


class TestMfccInversion:
    def test_roundtrip_mel(self):
        """mfcc -> mfcc_to_mel recovers the mel spectrogram well when all
        coefficients are kept (only the top_db clamp is lossy)."""
        rng = np.random.default_rng(3)
        y = rng.standard_normal(SR).astype(np.float32)
        n_mels = 64
        M = np.asarray(ap.melspectrogram(y, sr=SR, n_mels=n_mels))
        C = np.asarray(ap.mfcc(y=y, sr=SR, n_mfcc=n_mels, n_mels=n_mels))
        M_rec = np.asarray(ap.mfcc_to_mel(C, n_mels=n_mels))
        # compare in dB where the forward's top_db=80 clamp is inactive
        db = 10 * np.log10(np.maximum(M, 1e-10))
        keep = db > db.max() - 79
        db_rec = 10 * np.log10(np.maximum(M_rec, 1e-10))
        np.testing.assert_allclose(db_rec[keep], db[keep], atol=2e-2)

    def test_truncation_smooths(self):
        rng = np.random.default_rng(4)
        y = rng.standard_normal(SR).astype(np.float32)
        C = np.asarray(ap.mfcc(y=y, sr=SR, n_mfcc=13, n_mels=64))
        M_rec = np.asarray(ap.mfcc_to_mel(C, n_mels=64))
        assert M_rec.shape[0] == 64
        assert np.all(np.isfinite(M_rec)) and np.all(M_rec >= 0)

    def test_lifter_undone(self):
        rng = np.random.default_rng(5)
        y = rng.standard_normal(SR).astype(np.float32)
        C0 = np.asarray(ap.mfcc(y=y, sr=SR, n_mfcc=20))
        CL = np.asarray(ap.mfcc(y=y, sr=SR, n_mfcc=20, lifter=22))
        a = np.asarray(ap.mfcc_to_mel(C0))
        b = np.asarray(ap.mfcc_to_mel(CL, lifter=22))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)

    def test_norm_none_roundtrip(self):
        rng = np.random.default_rng(6)
        y = rng.standard_normal(SR).astype(np.float32)
        n_mels = 32
        C = np.asarray(
            ap.mfcc(y=y, sr=SR, n_mfcc=n_mels, n_mels=n_mels, norm=None)
        )
        # scipy idct(type=2, norm=None) normalization: x = idct(dct(x))/(2N)
        M_rec = np.asarray(
            ap.mfcc_to_mel(C / (2.0 * n_mels), n_mels=n_mels, norm=None)
        )
        M = np.asarray(ap.melspectrogram(y, sr=SR, n_mels=n_mels))
        db = 10 * np.log10(np.maximum(M, 1e-10))
        keep = db > db.max() - 79
        db_rec = 10 * np.log10(np.maximum(M_rec, 1e-10))
        np.testing.assert_allclose(db_rec[keep], db[keep], atol=5e-2)

    def test_mfcc_to_audio_runs(self):
        rng = np.random.default_rng(7)
        y = rng.standard_normal(SR // 2).astype(np.float32)
        C = np.asarray(ap.mfcc(y=y, sr=SR, n_mfcc=20, n_fft=1024,
                               hop_length=256, n_mels=64))
        rec = np.asarray(ap.mfcc_to_audio(
            C, n_mels=64, sr=SR, n_fft=1024, hop_length=256, n_iter=4,
            length=len(y),
        ))
        assert rec.shape == y.shape and np.all(np.isfinite(rec))

    def test_errors(self):
        with pytest.raises(ValueError):
            ap.mfcc_to_mel(np.ones((40, 5), np.float32), n_mels=20)
        with pytest.raises(ValueError):
            ap.mfcc_to_mel(np.ones((5, 5), np.float32), dct_type=3)
        with pytest.raises(ValueError):
            ap.mfcc_to_mel(np.ones((5, 5), np.float32), norm="bad")
