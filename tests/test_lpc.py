"""LPC (Burg) tests vs an independent float64 transliteration of the
published Burg recursion (librosa.lpc's algorithm), plus AR-model physics."""

import numpy as np
import pytest
import scipy.signal

from mlx_audio_primitives_tpu import lpc


def _burg_oracle(y, order):
    """Scalar float64 Burg recursion (librosa.lpc semantics)."""
    y = np.asarray(y, dtype=np.float64)
    ar = np.zeros(order + 1)
    ar[0] = 1.0
    fwd = y[1:].copy()
    bwd = y[:-1].copy()
    den = np.dot(fwd, fwd) + np.dot(bwd, bwd)
    for i in range(order):
        reflect = 0.0 if den <= 0 else -2.0 * np.dot(bwd, fwd) / den
        prev = ar.copy()
        for j in range(1, i + 2):
            ar[j] = prev[j] + reflect * prev[i + 1 - j]
        fwd_new = fwd + reflect * bwd
        bwd_new = bwd + reflect * fwd
        den = (1.0 - reflect**2) * den - fwd_new[0] ** 2 - bwd_new[-1] ** 2
        fwd = fwd_new[1:]
        bwd = bwd_new[:-1]
    return ar


class TestLpcOracle:
    @pytest.mark.parametrize("order", [2, 8, 16])
    def test_matches_oracle_noise(self, order):
        rng = np.random.default_rng(0)
        y = rng.standard_normal(1024).astype(np.float32)
        ours = np.asarray(lpc(y, order))
        ref = _burg_oracle(y, order)
        np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)

    def test_matches_oracle_speechlike(self):
        # AR(4) process driven by noise — the canonical LPC workload
        rng = np.random.default_rng(1)
        e = rng.standard_normal(4096)
        a_true = np.array([1.0, -2.2137, 2.3304, -1.2622, 0.2606])
        y = scipy.signal.lfilter([1.0], a_true, e).astype(np.float32)
        ours = np.asarray(lpc(y, 4))
        ref = _burg_oracle(y, 4)
        np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=5e-3)
        # and both should sit near the true AR polynomial
        np.testing.assert_allclose(ours, a_true, atol=5e-2)

    def test_batched_matches_loop(self):
        rng = np.random.default_rng(2)
        Y = rng.standard_normal((5, 512)).astype(np.float32)
        batched = np.asarray(lpc(Y, 8))
        assert batched.shape == (5, 9)
        for b in range(5):
            np.testing.assert_allclose(
                batched[b], np.asarray(lpc(Y[b], 8)), atol=1e-6
            )

    def test_axis_argument(self):
        rng = np.random.default_rng(3)
        Y = rng.standard_normal((3, 256)).astype(np.float32)
        a_last = np.asarray(lpc(Y, 6))
        a_first = np.asarray(lpc(Y.T, 6, axis=0))
        np.testing.assert_allclose(a_first.T, a_last, atol=1e-6)


class TestLpcPhysics:
    def test_leading_one(self):
        rng = np.random.default_rng(4)
        a = np.asarray(lpc(rng.standard_normal(300).astype(np.float32), 10))
        assert a[0] == 1.0

    def test_whitening(self):
        # filtering the AR process by its own LPC polynomial must whiten
        # it: residual variance ~ driving-noise variance, far below signal
        rng = np.random.default_rng(5)
        e = rng.standard_normal(8192)
        y = scipy.signal.lfilter([1.0], [1.0, -1.6, 0.8], e)
        y32 = y.astype(np.float32)
        a = np.asarray(lpc(y32, 2)).astype(np.float64)
        resid = scipy.signal.lfilter(a, [1.0], y)[10:]
        assert resid.var() < 0.2 * y.var()
        np.testing.assert_allclose(resid.var(), 1.0, rtol=0.1)

    def test_stability_sine(self):
        # pure tone: poles on (near) the unit circle, coefficients finite
        t = np.arange(2048) / 22050
        y = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        a = np.asarray(lpc(y, 8))
        assert np.all(np.isfinite(a))

    def test_errors(self):
        with pytest.raises(ValueError):
            lpc(np.zeros(10, np.float32), 0)
        with pytest.raises(ValueError):
            lpc(np.zeros(5, np.float32), 8)
        with pytest.raises(ValueError):
            lpc(np.float32(1.0), 2)
