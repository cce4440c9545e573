"""MFCC / DCT / delta parity (port of reference `tests/test_mfcc.py`).

Oracles: scipy.fft.dct, scipy.signal.savgol_filter, f64 NumPy mel pipeline.
"""

import numpy as np
import pytest
import scipy.fft
import scipy.signal

from mlx_audio_primitives_tpu import dct, delta, melspectrogram, mfcc, power_to_db

from oracles import dct_basis_np, melspectrogram_np


class TestDCT:
    @pytest.mark.parametrize("norm", ["ortho", None])
    def test_matches_scipy_full(self, norm):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((16, 40)).astype(np.float32)
        ours = np.asarray(dct(x, norm=norm))
        ref = scipy.fft.dct(x.astype(np.float64), type=2, norm=norm, axis=-1)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    def test_truncated_coefficients(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((8, 128)).astype(np.float32)
        ours = np.asarray(dct(x, n=20))
        full = scipy.fft.dct(x.astype(np.float64), type=2, norm="ortho", axis=-1)
        np.testing.assert_allclose(ours, full[:, :20], rtol=1e-4, atol=1e-4)

    def test_axis_argument(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((40, 16)).astype(np.float32)
        ours = np.asarray(dct(x, axis=0))
        ref = scipy.fft.dct(x.astype(np.float64), type=2, norm="ortho", axis=0)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    def test_basis_matches_formula(self):
        ours = np.asarray(dct(np.eye(32, dtype=np.float32)))
        ref = dct_basis_np(32, 32).T
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_only_type2(self):
        with pytest.raises(ValueError):
            dct(np.zeros(8, np.float32), type=3)


class TestMFCC:
    def test_matches_oracle_pipeline(self, random_signal):
        ours = np.asarray(mfcc(random_signal, n_mfcc=13))
        mel = melspectrogram_np(random_signal)
        db = 10.0 * np.log10(np.maximum(mel, 1e-10))
        db = np.maximum(db, db.max() - 80.0)
        ref = scipy.fft.dct(db, type=2, norm="ortho", axis=0)[:13]
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-2)

    def test_shape(self, random_signal):
        m = mfcc(random_signal, n_mfcc=20)
        assert m.shape[0] == 20

    def test_batched(self, batch_signals):
        # NOTE: batched == per-item only holds when the top_db clamp does not
        # bind differently (power_to_db's top_db uses the global array max,
        # same as librosa and the reference `convert.py:54-57`); these
        # equal-level signals keep it inactive.
        mb = np.asarray(mfcc(batch_signals, n_mfcc=13))
        assert mb.shape[:2] == (4, 13)
        ms = np.asarray(mfcc(batch_signals[0], n_mfcc=13))
        np.testing.assert_allclose(mb[0], ms, rtol=1e-4, atol=1e-4)

    def test_batched_topdb_clamp_is_global(self, batch_signals):
        """Documented (reference-parity) semantics: the dB dynamic-range clamp
        is relative to the GLOBAL max, so a loud batch item raises the floor
        for a quiet one — mixed-level batches are NOT item-independent."""
        y = np.stack([batch_signals[0], 1e-4 * batch_signals[0]])
        mb = np.asarray(mfcc(y, n_mfcc=13))
        ms = np.asarray(mfcc(y[1], n_mfcc=13))
        assert np.abs(mb[1] - ms).max() > 1.0  # clamp binds differently

    def test_precomputed_S_skips_db(self, random_signal):
        S_db = np.asarray(power_to_db(melspectrogram(random_signal)))
        ours = np.asarray(mfcc(S=S_db, n_mfcc=13))
        ref = scipy.fft.dct(S_db.astype(np.float64), type=2, norm="ortho", axis=0)[:13]
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)

    def test_lifter(self, random_signal):
        base = np.asarray(mfcc(random_signal, n_mfcc=13, lifter=0))
        lifted = np.asarray(mfcc(random_signal, n_mfcc=13, lifter=22))
        n = np.arange(13)
        lift = 1 + (22 / 2.0) * np.sin(np.pi * (n + 1) / 22)
        np.testing.assert_allclose(lifted, base * lift[:, None], rtol=1e-4, atol=1e-4)

    def test_requires_input(self):
        with pytest.raises(ValueError):
            mfcc()

    def test_invalid_nmfcc(self, random_signal):
        with pytest.raises(ValueError):
            mfcc(random_signal, n_mfcc=0)


class TestDelta:
    @pytest.mark.parametrize("order", [1, 2])
    @pytest.mark.parametrize("width", [5, 9])
    def test_matches_scipy_interp(self, order, width):
        rng = np.random.default_rng(3)
        x = rng.standard_normal((13, 100)).astype(np.float32)
        ours = np.asarray(delta(x, width=width, order=order))
        ref = scipy.signal.savgol_filter(
            x, width, polyorder=order, deriv=order, axis=-1, mode="interp"
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)

    @pytest.mark.parametrize("mode", ["nearest", "mirror", "constant", "wrap"])
    def test_matches_scipy_other_modes(self, mode):
        rng = np.random.default_rng(4)
        x = rng.standard_normal((7, 50)).astype(np.float32)
        ours = np.asarray(delta(x, width=9, order=1, mode=mode))
        ref = scipy.signal.savgol_filter(
            x, 9, polyorder=1, deriv=1, axis=-1, mode=mode
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)

    def test_polyorder_kwarg(self):
        rng = np.random.default_rng(5)
        x = rng.standard_normal(64).astype(np.float32)
        ours = np.asarray(delta(x, width=9, order=1, polyorder=3))
        ref = scipy.signal.savgol_filter(
            x, 9, polyorder=3, deriv=1, axis=-1, mode="interp"
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)

    def test_axis_argument(self):
        rng = np.random.default_rng(6)
        x = rng.standard_normal((30, 13)).astype(np.float32)
        ours = np.asarray(delta(x, width=5, order=1, axis=0))
        ref = scipy.signal.savgol_filter(x, 5, polyorder=1, deriv=1, axis=0)
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)

    def test_batched_3d(self):
        rng = np.random.default_rng(7)
        x = rng.standard_normal((2, 13, 80)).astype(np.float32)
        ours = np.asarray(delta(x))
        ref = scipy.signal.savgol_filter(x, 9, polyorder=1, deriv=1, axis=-1)
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)

    def test_validation(self):
        x = np.zeros((4, 50), np.float32)
        with pytest.raises(ValueError):
            delta(x, width=4)  # even
        with pytest.raises(ValueError):
            delta(x, width=1)  # < 3
        with pytest.raises(ValueError):
            delta(x, width=51)  # > axis length with interp
        with pytest.raises(ValueError):
            delta(x, order=0)

    def test_constant_signal_zero_delta(self):
        x = np.full((3, 40), 5.0, np.float32)
        np.testing.assert_allclose(np.asarray(delta(x)), 0.0, atol=1e-5)

    def test_linear_ramp_unit_slope(self):
        x = np.arange(60, dtype=np.float32)[None, :]
        np.testing.assert_allclose(np.asarray(delta(x, width=9, order=1)), 1.0, atol=1e-4)
