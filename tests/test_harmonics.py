"""interp_harmonics / salience tests vs numpy.interp oracles + physics."""

import numpy as np
import pytest

from mlx_audio_primitives_tpu import interp_harmonics, salience

SR, N_FFT = 22050, 2048


def _oracle_interp(x, freqs, harmonics, fill=0.0):
    n_h = len(harmonics)
    out = np.zeros((n_h,) + x.shape)
    for hi, h in enumerate(harmonics):
        for t in range(x.shape[-1]):
            out[hi, :, t] = np.interp(
                np.asarray(harmonics[hi]) * freqs, freqs, x[:, t],
                left=fill, right=fill,
            )
        # np.interp clamps; emulate fill outside the grid
        tgt = h * freqs
        bad = (tgt < freqs[0]) | (tgt > freqs[-1])
        out[hi, bad, :] = fill
    return out


class TestInterpHarmonics:
    def test_matches_numpy_interp(self):
        rng = np.random.default_rng(0)
        x = rng.uniform(0, 1, (129, 7)).astype(np.float32)
        freqs = np.linspace(0, SR / 2, 129)
        ours = np.asarray(interp_harmonics(x, freqs, (1, 2, 3)))
        ref = _oracle_interp(x.astype(np.float64), freqs, [1, 2, 3])
        np.testing.assert_allclose(ours, ref, atol=2e-6)

    def test_nonuniform_grid(self):
        rng = np.random.default_rng(1)
        freqs = np.sort(rng.uniform(10, 1000, 64))
        x = rng.uniform(0, 1, (64, 4)).astype(np.float32)
        ours = np.asarray(interp_harmonics(x, freqs, (1, 1.5, 2)))
        ref = _oracle_interp(x.astype(np.float64), freqs, [1, 1.5, 2])
        np.testing.assert_allclose(ours, ref, atol=2e-6)

    def test_identity_harmonic(self):
        rng = np.random.default_rng(2)
        x = rng.uniform(0, 1, (32, 5)).astype(np.float32)
        freqs = np.linspace(1, 100, 32)
        one = np.asarray(interp_harmonics(x, freqs, (1,)))[0]
        np.testing.assert_allclose(one, x, atol=1e-6)

    def test_batched(self):
        rng = np.random.default_rng(3)
        x = rng.uniform(0, 1, (2, 64, 6)).astype(np.float32)
        freqs = np.linspace(0, 1000, 64)
        out = np.asarray(interp_harmonics(x, freqs, (1, 2)))
        assert out.shape == (2, 2, 64, 6)
        np.testing.assert_allclose(
            out[:, 0], np.asarray(interp_harmonics(x[0], freqs, (1, 2))),
            atol=1e-6,
        )

    def test_errors(self):
        with pytest.raises(ValueError):
            interp_harmonics(np.ones(5, np.float32), np.arange(5.0))
        with pytest.raises(ValueError):
            interp_harmonics(np.ones((5, 2), np.float32), np.zeros(5))
        with pytest.raises(ValueError):
            interp_harmonics(np.ones((5, 2), np.float32), np.arange(4.0))


class TestSalience:
    def test_harmonic_tone_peaks_at_f0(self):
        """Harmonic-rich spectrum: salience peaks at f0, NOT at the
        (stronger-in-isolation) second harmonic."""
        freqs = np.linspace(0, SR / 2, 1025)
        S = np.zeros((1025, 3), np.float32)
        f0 = 440.0
        for h, amp in [(1, 0.6), (2, 1.0), (3, 0.5), (4, 0.3)]:
            k = int(round(h * f0 / (SR / N_FFT)))
            S[k] = amp
        sal = np.asarray(salience(S, freqs, (1, 2, 3, 4),
                                  filter_peaks=False))
        k0 = int(round(f0 / (SR / N_FFT)))
        assert int(np.argmax(sal[:, 0])) == k0

    def test_weights_and_normalization(self):
        freqs = np.linspace(0, 1000, 65)
        rng = np.random.default_rng(4)
        S = rng.uniform(0, 1, (65, 4)).astype(np.float32)
        a = np.asarray(salience(S, freqs, (1,), weights=np.asarray([2.0]),
                                filter_peaks=False))
        b = np.asarray(salience(S, freqs, (1,), filter_peaks=False))
        np.testing.assert_allclose(a, b, atol=1e-6)  # weights normalize

    def test_filter_peaks(self):
        freqs = np.linspace(0, 1000, 33)
        S = np.zeros((33, 2), np.float32)
        S[10] = 1.0
        sal = np.asarray(salience(S, freqs, (1,), fill_value=np.nan))
        assert np.isfinite(sal[10]).all()
        assert np.isnan(sal[5]).all()

    def test_errors(self):
        with pytest.raises(ValueError):
            salience(np.ones((8, 2), np.float32), np.arange(8.0) + 1,
                     (1, 2), weights=np.ones(3))
