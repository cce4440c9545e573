"""librosa.util workhorse tests (normalize/localmax/peak_pick/...)."""

import numpy as np
import pytest

from mlx_audio_primitives_tpu import util as u


class TestNormalize:
    def test_inf_norm(self):
        rng = np.random.default_rng(0)
        X = rng.standard_normal((8, 5)).astype(np.float32)
        out = np.asarray(u.normalize(X))
        np.testing.assert_allclose(np.abs(out).max(axis=0), 1.0, atol=1e-6)

    @pytest.mark.parametrize("p", [1, 2, 3])
    def test_p_norms(self, p):
        rng = np.random.default_rng(1)
        X = rng.standard_normal((6, 4)).astype(np.float32)
        out = np.asarray(u.normalize(X, norm=p, axis=0))
        lens = (np.abs(out) ** p).sum(axis=0) ** (1 / p)
        np.testing.assert_allclose(lens, 1.0, atol=1e-5)

    def test_zero_norm_counts(self):
        X = np.asarray([[1.0, 0.0], [1.0, 0.0], [0.0, 0.0]], np.float32)
        out = np.asarray(u.normalize(X, norm=0))
        np.testing.assert_allclose(out[:, 0], [0.5, 0.5, 0.0])

    def test_fill_modes(self):
        X = np.zeros((4, 2), np.float32)
        X[:, 0] = [3, 0, 0, 0]
        keep = np.asarray(u.normalize(X, norm=2))
        assert np.all(keep[:, 1] == 0)  # below threshold, left as-is
        zero = np.asarray(u.normalize(X, norm=2, fill=False))
        assert np.all(zero[:, 1] == 0)
        filled = np.asarray(u.normalize(X, norm=2, fill=True))
        np.testing.assert_allclose(filled[:, 1], 0.5)  # 4**-0.5
        np.testing.assert_allclose(np.abs(filled[:, 0]), [1, 0, 0, 0],
                                   atol=1e-6)

    def test_none_passthrough_and_axis1(self):
        rng = np.random.default_rng(2)
        X = rng.standard_normal((3, 7)).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(u.normalize(X, norm=None)),
                                      X)
        out = np.asarray(u.normalize(X, norm=1, axis=1))
        np.testing.assert_allclose(np.abs(out).sum(axis=1), 1.0, atol=1e-5)

    def test_errors(self):
        with pytest.raises(ValueError):
            u.normalize(np.ones((2, 2), np.float32), norm=-2)
        with pytest.raises(ValueError):
            u.normalize(np.ones((2, 2), np.float32), threshold=-1.0)
        with pytest.raises(ValueError):
            u.normalize(np.ones((2, 2), np.float32), norm=0, fill=True)


class TestLocalExtrema:
    def test_localmax_semantics(self):
        x = np.asarray([1.0, 3.0, 2.0, 2.0, 5.0, 5.0, 4.0, 6.0], np.float32)
        m = np.asarray(u.localmax(x, axis=-1))
        # librosa: > prev, >= next; x[0] never; last iff beats predecessor
        np.testing.assert_array_equal(
            m, [False, True, False, False, True, False, False, True]
        )

    def test_localmin_mirror(self):
        x = np.asarray([3.0, 1.0, 2.0, 2.0, 0.0, 0.0, 4.0], np.float32)
        m = np.asarray(u.localmin(x, axis=-1))
        np.testing.assert_array_equal(
            m, [False, True, False, False, True, False, False]
        )

    def test_axis(self):
        rng = np.random.default_rng(3)
        X = rng.standard_normal((5, 6)).astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(u.localmax(X, axis=0)),
            np.asarray(u.localmax(X.T, axis=-1)).T,
        )


class TestPeakPick:
    def test_oracle_loop(self):
        rng = np.random.default_rng(4)
        x = rng.uniform(0, 1, 200).astype(np.float32)
        got = u.peak_pick(x, 3, 3, 5, 5, 0.1, 4)
        # scalar transliteration of librosa's documented conditions
        want, last = [], -999
        for n in range(len(x)):
            lo_m, hi_m = max(0, n - 3), min(len(x), n + 3)
            lo_a, hi_a = max(0, n - 5), min(len(x), n + 5)
            if (x[n] == x[lo_m:hi_m].max()
                    and x[n] >= x[lo_a:hi_a].mean() + 0.1
                    and n - last > 4):
                want.append(n)
                last = n
        np.testing.assert_array_equal(got, want)

    def test_errors(self):
        with pytest.raises(ValueError):
            u.peak_pick(np.ones((2, 3), np.float32), 1, 1, 1, 1, 0.0, 1)
        with pytest.raises(ValueError):
            u.peak_pick(np.ones(10, np.float32), 1, 0, 1, 1, 0.0, 1)


class TestFixLengthZeroCrossings:
    def test_fix_length(self):
        x = np.arange(10, dtype=np.float32)
        assert np.asarray(u.fix_length(x, 6)).shape == (6,)
        out = np.asarray(u.fix_length(x, 14))
        assert out.shape == (14,) and np.all(out[10:] == 0)
        np.testing.assert_array_equal(np.asarray(u.fix_length(x, 10)), x)

    def test_zero_crossings(self):
        x = np.asarray([1.0, -1.0, -1.0, 1e-12, 2.0], np.float32)
        z = np.asarray(u.zero_crossings(x))
        # sub-threshold 1e-12 clips to +0 -> no crossing into it from -1?
        # signbit(0.0)=False vs signbit(-1)=True -> crossing at index 3
        np.testing.assert_array_equal(z, [True, True, False, True, False])
        z2 = np.asarray(u.zero_crossings(x, pad=False))
        assert not z2[0]
