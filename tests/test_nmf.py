"""On-device NMF (decompose) tests: objective descent, exact-recovery,
supervised template mode."""

import numpy as np
import pytest

from mlx_audio_primitives_tpu import decompose, melspectrogram


def _frob(S, W, H):
    return float(np.linalg.norm(S - np.asarray(W) @ np.asarray(H)))


class TestDecompose:
    def test_reconstructs_synthetic_lowrank(self):
        rng = np.random.default_rng(0)
        Wt = rng.uniform(0, 1, (64, 4)).astype(np.float32)
        Ht = rng.uniform(0, 1, (4, 100)).astype(np.float32)
        S = Wt @ Ht
        W, H = decompose(S, n_components=4, n_iter=500)
        rel = _frob(S, W, H) / np.linalg.norm(S)
        assert rel < 0.02

    def test_objective_descends(self):
        rng = np.random.default_rng(1)
        S = rng.uniform(0, 1, (48, 60)).astype(np.float32)
        errs = [
            _frob(S, *decompose(S, n_components=6, n_iter=n))
            for n in (1, 10, 100)
        ]
        assert errs[0] > errs[1] > errs[2]

    def test_nonnegative_outputs(self):
        rng = np.random.default_rng(2)
        S = rng.uniform(0, 1, (32, 40)).astype(np.float32)
        W, H = decompose(S, n_components=5)
        assert float(np.asarray(W).min()) >= 0
        assert float(np.asarray(H).min()) >= 0

    def test_deterministic_seed(self):
        rng = np.random.default_rng(3)
        S = rng.uniform(0, 1, (32, 40)).astype(np.float32)
        W1, H1 = decompose(S, n_components=3, n_iter=50, seed=7)
        W2, H2 = decompose(S, n_components=3, n_iter=50, seed=7)
        np.testing.assert_array_equal(np.asarray(W1), np.asarray(W2))
        np.testing.assert_array_equal(np.asarray(H1), np.asarray(H2))

    def test_supervised_fixed_templates(self):
        """fit_W=False: activations recover a known mixture of fixed
        templates."""
        rng = np.random.default_rng(4)
        Wt = rng.uniform(0.1, 1.0, (64, 3)).astype(np.float32)
        Ht = rng.uniform(0.0, 1.0, (3, 50)).astype(np.float32)
        S = Wt @ Ht
        W, H = decompose(S, n_components=3, n_iter=500, W=Wt, fit_W=False)
        np.testing.assert_array_equal(np.asarray(W), Wt)
        # multiplicative updates converge sublinearly in the parameters;
        # the reconstruction converges much faster
        np.testing.assert_allclose(np.asarray(H), Ht, atol=2e-2)
        assert _frob(S, W, H) / np.linalg.norm(S) < 1e-3

    def test_on_mel_spectrogram(self):
        # two alternating tones -> rank-2-ish mel spectrogram: 2-component
        # NMF should reconstruct well
        sr = 22050
        t = np.arange(sr // 4) / sr
        a = np.sin(2 * np.pi * 440 * t)
        b = np.sin(2 * np.pi * 880 * t)
        y = np.concatenate([a, b, a, b]).astype(np.float32)
        S = np.asarray(melspectrogram(y, sr=sr, n_mels=64))
        W, H = decompose(S, n_components=2, n_iter=300)
        rel = _frob(S, W, H) / np.linalg.norm(S)
        assert rel < 0.05

    def test_errors(self):
        with pytest.raises(ValueError):
            decompose(np.ones((4, 4, 4), np.float32))
        with pytest.raises(ValueError):
            decompose(-np.ones((4, 4), np.float32))
        with pytest.raises(ValueError):
            decompose(np.ones((4, 4), np.float32), n_components=2,
                      W=np.ones((4, 3), np.float32))
