"""Independent cross-validation vs torch (port of reference
`tests/test_torchaudio_crossval.py`, SURVEY.md §4 pillar 2).

torchaudio is not installed in this environment; torch.stft / torch.istft /
torch window factories provide the same independent-oracle role (torchaudio's
transforms are built on them).
"""

import numpy as np
import pytest
import torch

from mlx_audio_primitives_tpu import get_window, istft, magnitude, mfcc, stft


def mel_filterbank_oracle(sr: int, n_fft: int, n_mels: int) -> np.ndarray:
    """(n_mels, n_bins) slaney mel bank from transformers.audio_utils —
    a third-party transcription of librosa's algorithm (different authors
    than this repo AND than tests/oracles.py), keeping this file free of
    same-author oracles."""
    import transformers.audio_utils as au

    fb = au.mel_filter_bank(
        num_frequency_bins=n_fft // 2 + 1,
        num_mel_filters=n_mels,
        min_frequency=0.0,
        max_frequency=sr / 2,
        sampling_rate=sr,
        norm="slaney",
        mel_scale="slaney",
    )
    return fb.T


class TestSTFTCrossval:
    @pytest.mark.parametrize("n_fft,hop", [(512, 128), (1024, 256), (2048, 512)])
    def test_stft_matches_torch(self, random_signal, n_fft, hop):
        ours = np.asarray(stft(random_signal, n_fft=n_fft, hop_length=hop,
                               pad_mode="reflect"))
        ref = torch.stft(
            torch.from_numpy(random_signal), n_fft, hop,
            window=torch.hann_window(n_fft, periodic=True),
            center=True, pad_mode="reflect", return_complex=True,
        ).numpy()
        np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)

    def test_batched_stft_matches_torch(self, batch_signals):
        """Every batch element matches torch's per-signal transform
        (reference crossval covers batch semantics the same way)."""
        n_fft, hop = 1024, 256
        ours = np.asarray(
            stft(batch_signals, n_fft=n_fft, hop_length=hop,
                 pad_mode="reflect")
        )
        win = torch.hann_window(n_fft, periodic=True)
        for b in range(batch_signals.shape[0]):
            ref = torch.stft(
                torch.from_numpy(np.asarray(batch_signals[b])), n_fft, hop,
                window=win, center=True, pad_mode="reflect",
                return_complex=True,
            ).numpy()
            np.testing.assert_allclose(ours[b], ref, atol=2e-3, rtol=1e-3)

    def test_stft_center_false_matches_torch(self, random_signal):
        ours = np.asarray(
            stft(random_signal, n_fft=512, hop_length=128, center=False)
        )
        ref = torch.stft(
            torch.from_numpy(random_signal), 512, 128,
            window=torch.hann_window(512, periodic=True),
            center=False, return_complex=True,
        ).numpy()
        np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)

    def test_stft_win_length_lt_nfft_matches_torch(self, random_signal):
        """win_length < n_fft: both sides center-pad the window to n_fft."""
        n_fft, win_length, hop = 1024, 400, 256
        ours = np.asarray(
            stft(random_signal, n_fft=n_fft, hop_length=hop,
                 win_length=win_length, pad_mode="reflect")
        )
        ref = torch.stft(
            torch.from_numpy(random_signal), n_fft, hop,
            win_length=win_length,
            window=torch.hann_window(win_length, periodic=True),
            center=True, pad_mode="reflect", return_complex=True,
        ).numpy()
        np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)

    def test_magnitude_matches(self, chirp_signal):
        ours = np.asarray(magnitude(stft(chirp_signal, n_fft=1024,
                                         pad_mode="reflect")))
        ref = torch.stft(
            torch.from_numpy(chirp_signal), 1024, 256,
            window=torch.hann_window(1024, periodic=True),
            center=True, pad_mode="reflect", return_complex=True,
        ).abs().numpy()
        np.testing.assert_allclose(ours, ref, atol=2e-3)


class TestWindowCrossval:
    def test_hann_matches_torch(self):
        ours = np.asarray(get_window("hann", 1024, fftbins=True))
        ref = torch.hann_window(1024, periodic=True).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_hamming_matches_torch(self):
        ours = np.asarray(get_window("hamming", 512, fftbins=True))
        ref = torch.hamming_window(512, periodic=True).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_blackman_matches_torch(self):
        ours = np.asarray(get_window("blackman", 2048, fftbins=True))
        ref = torch.blackman_window(2048, periodic=True).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_symmetric_windows_at_least_as_symmetric_as_torch(self):
        """Asymmetry of our f64-built windows is <= torch's float32 windows
        (the reference asserts the same, crossval `:191-272`)."""
        ours = np.asarray(get_window("hann", 1023, fftbins=False),
                          dtype=np.float64)
        ours_asym = np.abs(ours - ours[::-1]).max()
        t = torch.hann_window(1023, periodic=False).numpy().astype(np.float64)
        torch_asym = np.abs(t - t[::-1]).max()
        assert ours_asym == 0.0
        assert ours_asym <= torch_asym


class TestMelCrossval:
    def test_melspectrogram_vs_torch_pipeline(self, random_signal):
        from mlx_audio_primitives_tpu import melspectrogram

        n_fft, hop, n_mels = 1024, 256, 80
        ours = np.asarray(
            melspectrogram(random_signal, sr=22050, n_fft=n_fft,
                           hop_length=hop, n_mels=n_mels)
        )
        spec = torch.stft(
            torch.from_numpy(random_signal), n_fft, hop,
            window=torch.hann_window(n_fft, periodic=True),
            center=True, pad_mode="constant", return_complex=True,
        )
        fb = mel_filterbank_oracle(22050, n_fft, n_mels)
        ref = fb @ (spec.abs().numpy().astype(np.float64) ** 2)
        np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3 * ref.max())


class TestRoundTripCrossval:
    def test_roundtrip_error_ratio_vs_torch(self, random_signal):
        """Our ISTFT round-trip error is within 10x of torch's
        (reference crossval `:275-322` uses the same ratio bound)."""
        n_fft, hop = 1024, 256
        ours_S = stft(random_signal, n_fft=n_fft, hop_length=hop,
                      pad_mode="reflect")
        ours_rec = np.asarray(istft(ours_S, hop_length=hop,
                                    length=len(random_signal)))
        ours_err = np.abs(ours_rec - random_signal).max()

        win = torch.hann_window(n_fft, periodic=True)
        t_S = torch.stft(torch.from_numpy(random_signal), n_fft, hop,
                         window=win, center=True, pad_mode="reflect",
                         return_complex=True)
        t_rec = torch.istft(t_S, n_fft, hop, window=win, center=True,
                            length=len(random_signal)).numpy()
        t_err = np.abs(t_rec - random_signal).max()
        assert ours_err <= max(10 * t_err, 1e-5)

    def test_istft_output_matches_torch(self, random_signal):
        """Feed torch's OWN spectrum to our istft: the reconstructions must
        agree sample-for-sample (not just both be near the original) —
        direct evidence the overlap-add + envelope normalization matches."""
        n_fft, hop = 1024, 256
        win = torch.hann_window(n_fft, periodic=True)
        t_S = torch.stft(torch.from_numpy(random_signal), n_fft, hop,
                         window=win, center=True, pad_mode="reflect",
                         return_complex=True)
        ours_rec = np.asarray(
            istft(t_S.numpy(), hop_length=hop, length=len(random_signal))
        )
        t_rec = torch.istft(t_S, n_fft, hop, window=win, center=True,
                            length=len(random_signal)).numpy()
        np.testing.assert_allclose(ours_rec, t_rec, atol=1e-4)


class TestMFCCCrossval:
    def test_mfcc_pipeline_torch_oracle(self, random_signal):
        """MFCC vs an independent torch+scipy composition of the same
        definition (the driver's 'MFCC torchaudio cross-val' config)."""
        import scipy.fft

        n_fft, hop, n_mels, n_mfcc = 1024, 256, 64, 13
        ours = np.asarray(
            mfcc(random_signal, sr=22050, n_mfcc=n_mfcc, n_fft=n_fft,
                 hop_length=hop, n_mels=n_mels)
        )
        spec = torch.stft(
            torch.from_numpy(random_signal), n_fft, hop,
            window=torch.hann_window(n_fft, periodic=True),
            center=True, pad_mode="constant", return_complex=True,
        )
        fb = mel_filterbank_oracle(22050, n_fft, n_mels)
        mel = fb @ (spec.abs().numpy().astype(np.float64) ** 2)
        db = 10 * np.log10(np.maximum(mel, 1e-10))
        db = np.maximum(db, db.max() - 80.0)
        ref = scipy.fft.dct(db, type=2, axis=0, norm="ortho")[:n_mfcc]
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-2)
