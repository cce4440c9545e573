"""STFT/ISTFT parity (port of reference `tests/test_stft.py`).

Oracles: float64 NumPy STFT (librosa algorithm, see oracles.py) and
torch.stft cross-validation.
"""

import numpy as np
import pytest
import torch

from mlx_audio_primitives_tpu import check_nola, istft, magnitude, phase, stft

from oracles import istft_np, stft_np


def _np(x):
    return np.asarray(x)


class TestSTFTParity:
    @pytest.mark.parametrize("n_fft,hop", [(512, 128), (1024, 256), (2048, 512), (2048, 441)])
    def test_matches_numpy_oracle(self, random_signal, n_fft, hop):
        ours = _np(stft(random_signal, n_fft=n_fft, hop_length=hop))
        ref = stft_np(random_signal, n_fft=n_fft, hop_length=hop)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-4)

    def test_matmul_and_fft_modes_agree(self, random_signal):
        a = _np(stft(random_signal, fft_mode="fft"))
        b = _np(stft(random_signal, fft_mode="matmul"))
        np.testing.assert_allclose(a, b, atol=2e-3)

    def test_center_false(self, random_signal):
        ours = _np(stft(random_signal, n_fft=1024, hop_length=256, center=False))
        ref = stft_np(random_signal, n_fft=1024, hop_length=256, center=False)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-4)

    @pytest.mark.parametrize("pad_mode", ["constant", "reflect", "edge"])
    def test_pad_modes(self, random_signal, pad_mode):
        ours = _np(stft(random_signal, n_fft=512, hop_length=128, pad_mode=pad_mode))
        ref = stft_np(random_signal, n_fft=512, hop_length=128, pad_mode=pad_mode)
        np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-4)

    def test_win_length_less_than_nfft(self, random_signal):
        ours = _np(stft(random_signal, n_fft=2048, hop_length=512, win_length=1024))
        ref = stft_np(random_signal, n_fft=2048, hop_length=512, win_length=1024)
        np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-4)

    @pytest.mark.parametrize("window", ["hann", "hamming", "blackman"])
    def test_windows(self, random_signal, window):
        ours = _np(stft(random_signal, n_fft=1024, window=window))
        ref = stft_np(random_signal, n_fft=1024, window=window)
        np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-4)

    def test_array_window(self, random_signal):
        win = np.hanning(1024).astype(np.float32)
        ours = _np(stft(random_signal, n_fft=1024, window=win))
        ref = stft_np(random_signal, n_fft=1024, window=win.astype(np.float64))
        np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-4)

    def test_batched_matches_single(self, batch_signals):
        batched = _np(stft(batch_signals, n_fft=1024, hop_length=256))
        for i in range(batch_signals.shape[0]):
            single = _np(stft(batch_signals[i], n_fft=1024, hop_length=256))
            np.testing.assert_allclose(batched[i], single, atol=1e-5)

    def test_torch_crossval(self, random_signal):
        n_fft, hop = 1024, 256
        ours = _np(stft(random_signal, n_fft=n_fft, hop_length=hop, pad_mode="reflect"))
        t = torch.stft(
            torch.from_numpy(random_signal),
            n_fft=n_fft,
            hop_length=hop,
            window=torch.hann_window(n_fft, periodic=True),
            center=True,
            pad_mode="reflect",
            return_complex=True,
        ).numpy()
        np.testing.assert_allclose(ours, t, atol=2e-3, rtol=1e-3)

    def test_shape_1d(self, random_signal):
        S = stft(random_signal, n_fft=2048, hop_length=512)
        n_frames = 1 + len(random_signal) // 512
        assert S.shape == (1025, n_frames)

    def test_shape_2d(self, batch_signals):
        S = stft(batch_signals, n_fft=2048, hop_length=512)
        assert S.shape[0] == 4 and S.shape[1] == 1025

    def test_small_hop(self, short_signal):
        # hop=1 exercises the gather fallback (chunk count > unroll limit)
        ours = _np(stft(short_signal[:256], n_fft=128, hop_length=1))
        ref = stft_np(short_signal[:256].astype(np.float64), n_fft=128, hop_length=1)
        np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-4)

    def test_invalid_params_raise(self, random_signal):
        with pytest.raises(ValueError):
            stft(random_signal, n_fft=1024, hop_length=0)
        with pytest.raises(ValueError):
            stft(random_signal, n_fft=1024, win_length=2048)
        with pytest.raises(ValueError):
            stft(random_signal, n_fft=1024, hop_length=4096)
        with pytest.raises(ValueError):
            stft(random_signal, pad_mode="wrap")
        with pytest.raises(ValueError):
            stft(random_signal[:100], n_fft=1024, center=False)


class TestISTFT:
    @pytest.mark.parametrize("n_fft,hop", [(512, 128), (1024, 256), (2048, 512)])
    def test_roundtrip(self, random_signal, n_fft, hop):
        S = stft(random_signal, n_fft=n_fft, hop_length=hop)
        y = _np(istft(S, hop_length=hop, length=len(random_signal)))
        assert y.shape == random_signal.shape
        err = np.abs(y - random_signal).max()
        assert err <= 1e-5, f"round-trip max err {err}"

    def test_roundtrip_30s(self):
        """Driver headline config: 30 s @ 22.05 kHz round-trip err <= 1e-5."""
        rng = np.random.default_rng(1)
        y = rng.standard_normal(30 * 22050).astype(np.float32)
        S = stft(y, n_fft=2048, hop_length=512)
        rec = _np(istft(S, hop_length=512, length=len(y)))
        assert np.abs(rec - y).max() <= 1e-5

    def test_matches_numpy_oracle(self, random_signal):
        S_np = stft_np(random_signal, n_fft=1024, hop_length=256)
        ours = _np(istft(S_np.astype(np.complex64), hop_length=256))
        ref = istft_np(S_np, hop_length=256)
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_no_center_roundtrip(self, random_signal):
        S = stft(random_signal, n_fft=1024, hop_length=256, center=False)
        y = _np(istft(S, hop_length=256, center=False))
        # interior samples (beyond one frame of edge taper) reconstruct
        inner = slice(1024, y.shape[0] - 1024)
        np.testing.assert_allclose(y[inner], random_signal[: y.shape[0]][inner], atol=1e-4)

    def test_length_pad_and_crop(self, random_signal):
        S = stft(random_signal, n_fft=1024, hop_length=256)
        y_short = istft(S, hop_length=256, length=1000)
        assert y_short.shape == (1000,)
        y_long = istft(S, hop_length=256, length=30000)
        assert y_long.shape == (30000,)

    def test_batched(self, batch_signals):
        S = stft(batch_signals, n_fft=1024, hop_length=256)
        y = _np(istft(S, hop_length=256, length=batch_signals.shape[1]))
        assert y.shape == batch_signals.shape
        assert np.abs(y - batch_signals).max() <= 1e-5

    def test_win_length_roundtrip(self, random_signal):
        S = stft(random_signal, n_fft=1024, hop_length=256, win_length=512)
        y = _np(istft(S, hop_length=256, win_length=512, length=len(random_signal)))
        np.testing.assert_allclose(y, random_signal, atol=1e-4)

    def test_invalid_ndim_raises(self):
        with pytest.raises(ValueError):
            istft(np.zeros((2, 3, 4, 5), np.complex64))

    def test_matmul_mode_roundtrip(self, random_signal):
        S = stft(random_signal, n_fft=1024, hop_length=256, fft_mode="matmul")
        y = _np(istft(S, hop_length=256, length=len(random_signal), fft_mode="matmul"))
        assert np.abs(y - random_signal).max() <= 5e-5


class TestMagnitudePhase:
    def test_magnitude_and_phase_reconstruct(self, random_signal):
        S = stft(random_signal, n_fft=512)
        m, p = _np(magnitude(S)), _np(phase(S))
        rec = m * np.exp(1j * p)
        np.testing.assert_allclose(rec, _np(S), atol=1e-4)

    def test_magnitude_nonnegative(self, random_signal):
        assert (_np(magnitude(stft(random_signal))) >= 0).all()


class TestCheckNola:
    def test_hann_ok(self):
        assert check_nola("hann", 512, 2048)

    def test_hop_too_large_fails(self):
        assert not check_nola("hann", 2048, 2048)

    def test_matches_scipy(self):
        import scipy.signal as sps

        for win, hop, n_fft in [("hann", 512, 2048), ("hamming", 1000, 2048),
                                ("blackman", 256, 1024), ("boxcar", 1024, 1024)]:
            ours = check_nola(win, hop, n_fft)
            ref = bool(sps.check_NOLA(win, n_fft, n_fft - hop))
            assert ours == ref, (win, hop, n_fft)


class TestSmallHopISTFT:
    def test_istft_tiny_hop_fori_branch(self, short_signal):
        """hop=1 with n_fft=128 gives C=128 chunks > the unroll limit,
        exercising overlap_add's fori_loop branch (the stft-side twin has a
        dedicated test; this covers the inverse)."""
        y = short_signal[:256]
        S = stft(y, n_fft=128, hop_length=1)
        rec = _np(istft(S, hop_length=1, n_fft=128, length=len(y)))
        assert np.abs(rec - y).max() <= 1e-5

    def test_istft_hop2_roundtrip(self, short_signal):
        y = short_signal[:512]
        S = stft(y, n_fft=256, hop_length=2)
        rec = _np(istft(S, hop_length=2, n_fft=256, length=len(y)))
        assert np.abs(rec - y).max() <= 1e-5


class TestMagnitudeSpectrogram:
    """Fused |stft| path (no complex intermediate) vs magnitude(stft(.))."""

    @pytest.mark.parametrize("n_fft,hop", [(512, 128), (400, 160)])
    def test_matches_composed(self, n_fft, hop):
        from mlx_audio_primitives_tpu.ops.stft import magnitude_spectrogram

        rng = np.random.default_rng(31)
        y = rng.standard_normal((3, 4000)).astype(np.float32)
        fused = np.asarray(magnitude_spectrogram(y, n_fft=n_fft, hop_length=hop))
        composed = np.asarray(magnitude(stft(y, n_fft=n_fft, hop_length=hop)))
        assert fused.shape == composed.shape
        # on TPU the two sides ride different transform paths (fused radix
        # vs XLA FFT): scale-aware tolerance (observed 3e-6 relative)
        np.testing.assert_allclose(
            fused, composed, atol=max(1e-4, 1e-5 * float(composed.max()))
        )

    def test_1d_and_validation(self):
        from mlx_audio_primitives_tpu.ops.stft import magnitude_spectrogram

        rng = np.random.default_rng(32)
        y = rng.standard_normal(4000).astype(np.float32)
        out = np.asarray(magnitude_spectrogram(y, n_fft=512, hop_length=128))
        assert out.shape == (257, 1 + 4000 // 128)
        with pytest.raises(ValueError):
            magnitude_spectrogram(y, n_fft=512, hop_length=0)
        with pytest.raises(ValueError):
            magnitude_spectrogram(y, n_fft=512, hop_length=128, pad_mode="bogus")

    def test_pure_tone_magnitude_is_finite(self, sine_signal):
        # regression: the packed-power path (`bluestein.packed_power_rows`)
        # cancels E + Ef -/+ 2F to ~0 on a tone's silent bins; rounding used
        # to land a few ULP negative and sqrt turned it into NaN
        from mlx_audio_primitives_tpu import melspectrogram
        from mlx_audio_primitives_tpu.ops.stft import magnitude_spectrogram

        m = np.asarray(magnitude_spectrogram(sine_signal, n_fft=1024,
                                             hop_length=256))
        assert np.isfinite(m).all()
        # mel power=1 sqrts the same packed powers
        mel1 = np.asarray(melspectrogram(sine_signal, n_fft=1024,
                                         hop_length=256, power=1.0,
                                         use_pallas=False))
        assert np.isfinite(mel1).all()
