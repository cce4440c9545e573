"""Mel scale / filterbank / melspectrogram parity (port of reference
`tests/test_mel.py`). Oracle: float64 NumPy implementation of librosa's
documented algorithms (oracles.py) + torch cross-val of the pipeline."""

import numpy as np
import pytest

from mlx_audio_primitives_tpu import (
    hz_to_mel,
    mel_filterbank,
    mel_to_hz,
    melspectrogram,
)

from oracles import hz_to_mel_np, mel_filterbank_np, mel_to_hz_np, melspectrogram_np


class TestMelScale:
    @pytest.mark.parametrize("htk", [False, True])
    def test_hz_mel_roundtrip(self, htk):
        f = np.linspace(0, 11025, 1000)
        np.testing.assert_allclose(
            mel_to_hz(hz_to_mel(f, htk=htk), htk=htk), f, atol=1e-6
        )

    @pytest.mark.parametrize("htk", [False, True])
    def test_matches_librosa_formula(self, htk):
        f = np.array([0.0, 200.0, 440.0, 1000.0, 4000.0, 11025.0])
        np.testing.assert_allclose(hz_to_mel(f, htk=htk), hz_to_mel_np(f, htk=htk))
        m = np.array([0.0, 5.0, 15.0, 25.0, 45.0])
        np.testing.assert_allclose(mel_to_hz(m, htk=htk), mel_to_hz_np(m, htk=htk))

    def test_monotonic(self):
        f = np.linspace(0, 11025, 500)
        assert (np.diff(hz_to_mel(f)) > 0).all()

    def test_slaney_breakpoint(self):
        # linear below 1 kHz: mel(500) should be exactly 500/(200/3)
        np.testing.assert_allclose(hz_to_mel(500.0), 500.0 / (200.0 / 3))


class TestMelFilterbank:
    @pytest.mark.parametrize("n_mels", [40, 64, 128])
    @pytest.mark.parametrize("htk", [False, True])
    def test_matches_librosa_algorithm(self, n_mels, htk):
        ours = np.asarray(mel_filterbank(22050, 2048, n_mels=n_mels, htk=htk))
        ref = mel_filterbank_np(22050, 2048, n_mels=n_mels, htk=htk)
        np.testing.assert_allclose(ours, ref.astype(np.float32), atol=1e-7)

    def test_norm_none(self):
        ours = np.asarray(mel_filterbank(22050, 2048, n_mels=64, norm=None))
        ref = mel_filterbank_np(22050, 2048, n_mels=64, norm=None)
        np.testing.assert_allclose(ours, ref.astype(np.float32), atol=1e-7)

    def test_fmin_fmax(self):
        ours = np.asarray(mel_filterbank(22050, 1024, n_mels=40, fmin=80.0, fmax=8000.0))
        ref = mel_filterbank_np(22050, 1024, n_mels=40, fmin=80.0, fmax=8000.0)
        np.testing.assert_allclose(ours, ref.astype(np.float32), atol=1e-7)

    def test_shape(self):
        assert mel_filterbank(22050, 2048, n_mels=128).shape == (128, 1025)

    def test_cached_buffer_identity(self):
        assert mel_filterbank(22050, 2048) is mel_filterbank(22050, 2048)

    def test_filters_nonnegative_and_triangular(self):
        fb = np.asarray(mel_filterbank(22050, 2048, n_mels=64, norm=None))
        assert (fb >= 0).all()
        # each filter has exactly one contiguous support with a single peak
        for row in fb[5:60]:
            nz = np.flatnonzero(row > 0)
            assert (np.diff(nz) == 1).all()
            peak = row.argmax()
            assert (np.diff(row[nz[0] : peak + 1]) >= -1e-9).all()
            assert (np.diff(row[peak : nz[-1] + 1]) <= 1e-9).all()

    def test_validation(self):
        with pytest.raises(ValueError):
            mel_filterbank(22050, 2048, n_mels=0)
        with pytest.raises(ValueError):
            mel_filterbank(22050, 2048, fmin=-1.0)
        with pytest.raises(ValueError):
            mel_filterbank(22050, 2048, fmin=5000.0, fmax=1000.0)
        with pytest.raises(ValueError):
            mel_filterbank(22050, 2048, fmax=20000.0)
        with pytest.raises(ValueError):
            mel_filterbank(22050, 2048, norm="l2")


class TestMelSpectrogram:
    @pytest.mark.parametrize("power", [1.0, 2.0])
    def test_matches_oracle(self, random_signal, power):
        ours = np.asarray(melspectrogram(random_signal, power=power))
        ref = melspectrogram_np(random_signal, power=power)
        np.testing.assert_allclose(ours, ref, rtol=5e-4, atol=5e-4 * ref.max())

    def test_shape(self, random_signal):
        m = melspectrogram(random_signal, n_mels=80, hop_length=512)
        assert m.shape == (80, 1 + len(random_signal) // 512)

    def test_batched_matches_single(self, batch_signals):
        mb = np.asarray(melspectrogram(batch_signals, n_mels=64))
        for i in range(batch_signals.shape[0]):
            ms = np.asarray(melspectrogram(batch_signals[i], n_mels=64))
            np.testing.assert_allclose(mb[i], ms, rtol=1e-5, atol=1e-5)

    def test_nonnegative(self, random_signal):
        assert (np.asarray(melspectrogram(random_signal)) >= -1e-9).all()

    def test_fft_vs_matmul_mode(self, random_signal):
        a = np.asarray(melspectrogram(random_signal, fft_mode="fft"))
        b = np.asarray(melspectrogram(random_signal, fft_mode="matmul"))
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3 * a.max())

    def test_torch_crossval(self, random_signal):
        """Cross-validate mel pipeline vs torch.stft + our f64 filterbank."""
        import torch

        n_fft, hop = 1024, 256
        spec = torch.stft(
            torch.from_numpy(random_signal),
            n_fft=n_fft,
            hop_length=hop,
            window=torch.hann_window(n_fft, periodic=True),
            center=True,
            pad_mode="constant",
            return_complex=True,
        )
        fb = mel_filterbank_np(22050, n_fft, n_mels=64)
        ref = fb @ (spec.abs().numpy().astype(np.float64) ** 2)
        ours = np.asarray(
            melspectrogram(random_signal, n_fft=n_fft, hop_length=hop, n_mels=64)
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3 * ref.max())

    def test_htk_pipeline(self, sine_signal):
        ours = np.asarray(melspectrogram(sine_signal, htk=True, n_mels=40))
        ref = melspectrogram_np(sine_signal, n_mels=40, htk=True)
        np.testing.assert_allclose(ours, ref, rtol=5e-4, atol=5e-4 * ref.max())

    def test_sine_peak_in_correct_band(self, sine_signal):
        m = np.asarray(melspectrogram(sine_signal, n_mels=128))
        fb = mel_filterbank_np(22050, 2048, n_mels=128)
        centers = np.array(
            [np.argmax(row) for row in fb]
        ) * (22050 / 2) / (2048 // 2)
        band = m.mean(axis=1).argmax()
        assert abs(centers[band] - 440.0) < 100.0
