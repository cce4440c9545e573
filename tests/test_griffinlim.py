"""Griffin-Lim tests (port of reference `tests/test_griffinlim.py`)."""

import numpy as np
import pytest

from mlx_audio_primitives_tpu import griffinlim, magnitude, stft
from mlx_audio_primitives_tpu.ops.griffinlim import griffinlim_iter


def _spec_mse(y_rec, S_target, n_fft, hop):
    S_rec = np.asarray(magnitude(stft(y_rec, n_fft=n_fft, hop_length=hop)))
    S_t = np.asarray(S_target)
    m = min(S_rec.shape[-1], S_t.shape[-1])
    return float(np.mean((S_rec[..., :m] - S_t[..., :m]) ** 2))


class TestGriffinLim:
    def test_reconstruction_quality(self, chirp_signal):
        n_fft, hop = 1024, 256
        S = magnitude(stft(chirp_signal, n_fft=n_fft, hop_length=hop))
        y = griffinlim(S, n_iter=32, hop_length=hop, random_state=0)
        mse = _spec_mse(np.asarray(y), S, n_fft, hop)
        ref_power = float(np.mean(np.asarray(S) ** 2))
        assert mse < 0.05 * ref_power, f"mse {mse} vs power {ref_power}"

    def test_more_iterations_improve(self, sine_signal):
        n_fft, hop = 1024, 256
        S = magnitude(stft(sine_signal, n_fft=n_fft, hop_length=hop))
        m2 = _spec_mse(np.asarray(griffinlim(S, n_iter=2, hop_length=hop, random_state=1)), S, n_fft, hop)
        m32 = _spec_mse(np.asarray(griffinlim(S, n_iter=32, hop_length=hop, random_state=1)), S, n_fft, hop)
        assert m32 < m2

    def test_output_shape_default(self, random_signal):
        S = magnitude(stft(random_signal, n_fft=1024, hop_length=256))
        y = griffinlim(S, n_iter=2, hop_length=256)
        n_frames = S.shape[-1]
        assert y.shape == ((n_frames - 1) * 256,)

    def test_length(self, random_signal):
        S = magnitude(stft(random_signal, n_fft=1024, hop_length=256))
        y = griffinlim(S, n_iter=2, hop_length=256, length=22050)
        assert y.shape == (22050,)

    def test_reproducible_with_seed(self, sine_signal):
        S = magnitude(stft(sine_signal, n_fft=512))
        a = np.asarray(griffinlim(S, n_iter=3, random_state=42))
        b = np.asarray(griffinlim(S, n_iter=3, random_state=42))
        np.testing.assert_array_equal(a, b)

    def test_zeros_init(self, sine_signal):
        S = magnitude(stft(sine_signal, n_fft=512))
        y = np.asarray(griffinlim(S, n_iter=4, init="zeros"))
        assert np.isfinite(y).all()

    def test_momentum_zero_classic(self, sine_signal):
        S = magnitude(stft(sine_signal, n_fft=512))
        y = np.asarray(griffinlim(S, n_iter=4, momentum=0.0, random_state=0))
        assert np.isfinite(y).all()

    def test_batched(self, batch_signals):
        S = magnitude(stft(batch_signals, n_fft=1024, hop_length=256))
        y = griffinlim(S, n_iter=2, hop_length=256, random_state=0)
        assert y.shape[0] == 4

    def test_batched_matches_single(self, batch_signals):
        S = magnitude(stft(batch_signals[:2], n_fft=512, hop_length=128))
        yb = np.asarray(griffinlim(S, n_iter=3, hop_length=128, init="zeros"))
        ys = np.asarray(griffinlim(S[0], n_iter=3, hop_length=128, init="zeros"))
        np.testing.assert_allclose(yb[0], ys, atol=1e-4)

    def test_perfect_magnitude_converges(self, sine_signal):
        """With a consistent magnitude, GL converges to low relative
        spectral error (reconstruction is only defined up to phase shift,
        so convergence is measured in the magnitude domain)."""
        n_fft, hop = 1024, 256
        S = magnitude(stft(sine_signal, n_fft=n_fft, hop_length=hop))
        y = griffinlim(S, n_iter=64, hop_length=hop, random_state=0,
                       length=len(sine_signal))
        mse = _spec_mse(np.asarray(y), S, n_fft, hop)
        rel = mse / float(np.mean(np.asarray(S) ** 2))
        assert rel < 0.01, f"relative spectral MSE {rel}"

    def test_validation(self, sine_signal):
        S = magnitude(stft(sine_signal, n_fft=512))
        with pytest.raises(ValueError):
            griffinlim(S, n_iter=0)
        with pytest.raises(ValueError):
            griffinlim(S, momentum=1.5)
        with pytest.raises(ValueError):
            griffinlim(S, init="fourier")


class TestGriffinLimIter:
    def test_single_step_decreases_error(self, sine_signal):
        n_fft, hop = 1024, 256
        S = magnitude(stft(sine_signal, n_fft=n_fft, hop_length=hop))
        rng = np.random.default_rng(0)
        angles = rng.uniform(-np.pi, np.pi, S.shape).astype(np.float32)
        errs = []
        tprev = None
        for _ in range(5):
            angles, rebuilt, err = griffinlim_iter(
                S, angles, hop_length=hop, win_length=n_fft, n_fft=n_fft, tprev=tprev
            )
            tprev = rebuilt
            errs.append(float(err))
        assert errs[-1] < errs[0]

    def test_shapes(self, sine_signal):
        S = magnitude(stft(sine_signal, n_fft=512, hop_length=128))
        angles = np.zeros(S.shape, np.float32)
        na, rb, err = griffinlim_iter(S, angles, 128, 512, 512)
        assert na.shape == S.shape and rb.shape == S.shape and err.shape == ()
