"""pYIN tests: ground-truth voicing + pitch on synthetic signals.

librosa is unavailable, so the tests pin the algorithm's defining
behaviors from the pYIN paper (Mauch & Dixon 2014): correct f0 on clean
and noisy tones, correct voicing segmentation on tone/silence
alternations, graceful all-unvoiced output on noise, and chirp tracking
within the Viterbi transition band.
"""

import numpy as np
import pytest

from mlx_audio_primitives_tpu import pyin

SR = 22050


def tone(f, dur=1.0, amp=1.0):
    t = np.arange(int(SR * dur)) / SR
    return (amp * np.sin(2 * np.pi * f * t)).astype(np.float32)


class TestPyinPitch:
    @pytest.mark.parametrize("f0", [110.0, 220.0, 440.0])
    def test_clean_tone(self, f0):
        f, vflag, vprob = pyin(tone(f0), fmin=65.0, fmax=1000.0, sr=SR)
        mid = slice(6, len(f) - 6)
        assert vflag[mid].mean() > 0.95
        est = np.nanmedian(f[mid])
        # decoded at 0.1-semitone bins -> within ~0.6%
        np.testing.assert_allclose(est, f0, rtol=0.008)

    def test_noisy_tone_still_tracked(self):
        rng = np.random.default_rng(0)
        y = tone(220.0) + 0.3 * rng.standard_normal(SR).astype(np.float32)
        f, vflag, vprob = pyin(y, fmin=65.0, fmax=1000.0, sr=SR)
        mid = slice(6, len(f) - 6)
        assert vflag[mid].mean() > 0.8
        # noise scatters the per-frame decode across neighboring 0.1-semi
        # bins; the median lands within ~2%
        np.testing.assert_allclose(np.nanmedian(f[mid]), 220.0, rtol=0.02)

    def test_chirp_tracked(self):
        t = np.arange(SR) / SR
        phase = 2 * np.pi * (200 * t + 150 * t * t)  # 200 -> 500 Hz
        y = np.sin(phase).astype(np.float32)
        f, vflag, _ = pyin(y, fmin=65.0, fmax=1000.0, sr=SR)
        F = len(f)
        hop = 512
        for fr in range(8, F - 8, 6):
            t_fr = fr * hop / SR
            f_true = 200 + 300 * t_fr
            if vflag[fr]:
                np.testing.assert_allclose(f[fr], f_true, rtol=0.04)


class TestPyinVoicing:
    def test_noise_is_unvoiced(self):
        rng = np.random.default_rng(1)
        y = rng.standard_normal(SR).astype(np.float32)
        f, vflag, vprob = pyin(y, fmin=65.0, fmax=1000.0, sr=SR)
        assert vflag.mean() < 0.35
        assert np.nanmean(vprob) < 0.5

    def test_silence_is_unvoiced_with_nan(self):
        y = np.zeros(SR, np.float32)
        f, vflag, vprob = pyin(y, fmin=65.0, fmax=500.0, sr=SR)
        assert not vflag.any()
        assert np.all(np.isnan(f))

    def test_segmentation_tone_silence_tone(self):
        seg = tone(330.0, 0.5)
        y = np.concatenate([seg, np.zeros(SR // 2, np.float32), seg])
        f, vflag, vprob = pyin(y, fmin=65.0, fmax=1000.0, sr=SR)
        F = len(f)
        third = F // 3
        assert vflag[4 : third - 4].mean() > 0.9
        assert vflag[third + 4 : 2 * third - 4].mean() < 0.2
        assert vflag[2 * third + 4 : F - 4].mean() > 0.9
        np.testing.assert_allclose(
            np.nanmedian(f[: third - 4]), 330.0, rtol=0.01
        )

    def test_fill_na_value(self):
        y = np.concatenate([tone(220.0, 0.4), np.zeros(SR // 2, np.float32)])
        f, vflag, _ = pyin(y, fmin=65.0, fmax=500.0, sr=SR, fill_na=0.0)
        assert np.all(f[~vflag] == 0.0)


class TestPyinApi:
    def test_batched(self):
        Y = np.stack([tone(220.0, 0.5), tone(440.0, 0.5)])
        f, vflag, vprob = pyin(Y, fmin=65.0, fmax=1000.0, sr=SR)
        assert f.shape == vflag.shape == vprob.shape
        assert f.shape[0] == 2
        np.testing.assert_allclose(np.nanmedian(f[0, 4:-4]), 220.0,
                                   rtol=0.01)
        np.testing.assert_allclose(np.nanmedian(f[1, 4:-4]), 440.0,
                                   rtol=0.01)

    def test_voiced_prob_ordering(self):
        rng = np.random.default_rng(2)
        clean = tone(220.0, 0.5)
        noisy = (0.1 * rng.standard_normal(len(clean))).astype(np.float32)
        _, _, p_clean = pyin(clean, fmin=65.0, fmax=1000.0, sr=SR)
        _, _, p_noise = pyin(noisy, fmin=65.0, fmax=1000.0, sr=SR)
        assert np.mean(p_clean) > np.mean(p_noise)

    def test_errors(self):
        y = tone(220.0, 0.3)
        with pytest.raises(ValueError):
            pyin(y, fmin=500.0, fmax=100.0, sr=SR)
        with pytest.raises(ValueError):
            pyin(y, fmin=0.0, fmax=100.0, sr=SR)
        with pytest.raises(ValueError):
            pyin(y, fmin=65.0, fmax=1000.0, sr=SR, switch_prob=2.0)
        with pytest.raises(ValueError):
            pyin(y, fmin=65.0, fmax=1000.0, sr=SR, resolution=0.0)
