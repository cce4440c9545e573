"""Reassigned-spectrogram tests: ground-truth physics of the method.

The Auger-Flandrin identities make exact predictions no grid-based
spectrogram can satisfy: every cell near a pure tone reassigns to the
tone's exact frequency (regardless of which bin measured it), every cell
near a click reassigns to the click's exact instant. These tests pin
those invariants plus a scalar-oracle check of the correction formulas.
"""

import numpy as np
import pytest

from mlx_audio_primitives_tpu import reassigned_spectrogram

SR, N_FFT, HOP = 22050, 2048, 512


class TestReassignPhysics:
    def test_tone_snaps_to_true_frequency(self):
        f0 = 440.7  # deliberately off bin center (bin spacing 10.77 Hz)
        t = np.arange(SR) / SR
        y = np.sin(2 * np.pi * f0 * t).astype(np.float32)
        freqs, times, mags = reassigned_spectrogram(y, sr=SR, n_fft=N_FFT,
                                                    hop_length=HOP)
        freqs, mags = np.asarray(freqs), np.asarray(mags)
        k = int(round(f0 / (SR / N_FFT)))
        mid = slice(8, mags.shape[1] - 8)
        # the peak bin AND its neighbors all reassign to the true tone
        for kk in (k - 2, k, k + 2):
            est = np.nanmedian(freqs[kk, mid])
            np.testing.assert_allclose(est, f0, atol=0.05)

    def test_click_snaps_to_true_time(self):
        y = np.zeros(SR, np.float32)
        y[11025] = 1.0
        freqs, times, mags = reassigned_spectrogram(y, sr=SR, n_fft=N_FFT,
                                                    hop_length=HOP,
                                                    ref_power=1e-10)
        times = np.asarray(times)
        # frames whose window covers the click (click at frame 21.5,
        # window spans +-2 frames): reassigned times snap exactly
        for fr in (20, 21, 22, 23):
            est = np.nanmedian(times[100:900, fr])
            np.testing.assert_allclose(est, 0.5, atol=2e-3)

    def test_chirp_tracks_instantaneous_frequency(self):
        # linear chirp 500 -> 2000 Hz over 1 s
        t = np.arange(SR) / SR
        phase = 2 * np.pi * (500 * t + 750 * t * t)
        y = np.sin(phase).astype(np.float32)
        freqs, times, mags = reassigned_spectrogram(y, sr=SR, n_fft=N_FFT,
                                                    hop_length=HOP)
        freqs, times, mags = map(np.asarray, (freqs, times, mags))
        F = mags.shape[1]
        for fr in range(10, F - 10, 8):
            k = int(np.argmax(mags[:, fr]))
            t_hat = times[k, fr]
            f_hat = freqs[k, fr]
            f_true = 500 + 1500 * t_hat  # d(phase)/dt / 2pi at t_hat
            np.testing.assert_allclose(f_hat, f_true, rtol=5e-3)

    def test_low_power_cells_nan(self):
        t = np.arange(SR // 2) / SR
        y = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        freqs, times, _ = reassigned_spectrogram(y, sr=SR, ref_power=1e-4)
        freqs = np.asarray(freqs)
        # far-away bins are below threshold -> NaN
        assert np.all(np.isnan(freqs[800:, 10]))
        assert np.isfinite(freqs[int(round(440 / (SR / N_FFT))), 10])

    def test_clip_bounds(self):
        rng = np.random.default_rng(0)
        y = rng.standard_normal(SR // 2).astype(np.float32)
        freqs, times, _ = reassigned_spectrogram(y, sr=SR, ref_power=0.0)
        freqs, times = np.asarray(freqs), np.asarray(times)
        assert np.nanmin(freqs) >= 0 and np.nanmax(freqs) <= SR / 2
        assert np.nanmin(times) >= 0 and np.nanmax(times) <= 0.5 + 1e-6

    def test_batched(self):
        t = np.arange(SR // 2) / SR
        y = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        Y = np.stack([y, np.roll(y, 100)])
        freqs, times, mags = reassigned_spectrogram(Y, sr=SR)
        assert np.asarray(mags).shape[0] == 2
        f0_single = np.asarray(reassigned_spectrogram(y, sr=SR)[0])
        fb = np.asarray(freqs)[0]
        m = np.asarray(mags)[0]
        assert (np.isfinite(fb) == np.isfinite(f0_single)).mean() > 0.99
        # compare where the energy is meaningful: near-threshold cells
        # amplify f32 path differences (corr ~ x/|S|^2 with |S|^2 ~ 1e-6)
        strong = np.isfinite(fb) & np.isfinite(f0_single) & (
            m > 1e-2 * m.max()
        )
        assert strong.sum() > 100
        np.testing.assert_allclose(fb[strong], f0_single[strong], atol=1e-2)

    def test_scalar_oracle_formulas(self):
        """Corrections vs a direct f64 three-window DFT on one frame."""
        rng = np.random.default_rng(1)
        y = rng.standard_normal(SR // 2).astype(np.float32)
        freqs, times, mags = reassigned_spectrogram(
            y, sr=SR, n_fft=512, hop_length=128, ref_power=0.0, clip=False)
        freqs = np.asarray(freqs)
        n = np.arange(512)
        h = 0.5 - 0.5 * np.cos(2 * np.pi * n / 512)
        H = np.fft.fft(h)
        kk = np.fft.fftfreq(512) * 512
        dh = np.real(np.fft.ifft(H * 2j * np.pi * kk / 512))
        fr = 40
        ypad = np.pad(y.astype(np.float64), (256, 256))
        seg = ypad[fr * 128 : fr * 128 + 512]
        Fh = np.fft.rfft(seg * h)
        Fdh = np.fft.rfft(seg * dh)
        for k in (30, 100, 200):
            corr = np.imag(Fdh[k] * np.conj(Fh[k])) / abs(Fh[k]) ** 2
            want = k * SR / 512 - corr * SR / (2 * np.pi)
            np.testing.assert_allclose(freqs[k, fr], want, atol=0.5)

    def test_errors(self):
        with pytest.raises(ValueError):
            reassigned_spectrogram(np.zeros(1000, np.float32), ref_power=-1)
        with pytest.raises(ValueError):
            reassigned_spectrogram(np.zeros(1000, np.float32), hop_length=0)
