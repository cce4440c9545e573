"""Recurrence/cross-similarity tests vs a scalar numpy k-NN oracle."""

import numpy as np
import pytest

from mlx_audio_primitives_tpu import cross_similarity, recurrence_matrix


def _oracle_recurrence(X, k, width, metric="euclidean", sym=False,
                       mode="connectivity"):
    d, t = X.shape
    D = np.zeros((t, t))
    for i in range(t):
        for j in range(t):
            if metric == "euclidean":
                D[i, j] = np.linalg.norm(X[:, i] - X[:, j])
            else:
                a, b = X[:, i], X[:, j]
                D[i, j] = 1 - a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    keep = np.zeros((t, t), bool)
    for i in range(t):
        cand = [j for j in range(t) if abs(i - j) >= width]
        order = sorted(cand, key=lambda j: D[i, j])
        thresh = D[i, order[k - 1]]
        for j in cand:
            if D[i, j] <= thresh:
                keep[i, j] = True
    if sym:
        keep &= keep.T
    if mode == "connectivity":
        return keep.astype(float)
    if mode == "distance":
        return np.where(keep, D, 0.0)
    bw = np.median(D[keep])
    return np.where(keep, np.exp(-D / bw), 0.0)


@pytest.fixture(scope="module")
def feats():
    rng = np.random.default_rng(0)
    return rng.standard_normal((6, 24)).astype(np.float32)


class TestRecurrence:
    @pytest.mark.parametrize("metric", ["euclidean", "cosine"])
    @pytest.mark.parametrize("mode", ["connectivity", "distance",
                                      "affinity"])
    def test_matches_oracle(self, feats, metric, mode):
        k, width = 4, 2
        ours = np.asarray(recurrence_matrix(
            feats, k=k, width=width, metric=metric, mode=mode))
        ref = _oracle_recurrence(feats.astype(np.float64), k, width,
                                 metric, mode=mode)
        np.testing.assert_allclose(ours, ref, atol=2e-4)

    def test_sym_mutual_only(self, feats):
        R = np.asarray(recurrence_matrix(feats, k=3, sym=True))
        np.testing.assert_array_equal(R, R.T)

    def test_band_excluded(self, feats):
        R = np.asarray(recurrence_matrix(feats, k=3, width=3))
        t = R.shape[0]
        for i in range(t):
            for j in range(max(0, i - 2), min(t, i + 3)):
                assert R[i, j] == 0

    def test_repeated_structure_detected(self):
        # A B A pattern: the two A sections should cross-link
        rng = np.random.default_rng(1)
        A = rng.uniform(0, 1, (8, 10)).astype(np.float32)
        B = rng.uniform(0, 1, (8, 10)).astype(np.float32)
        X = np.concatenate([A, B, A], axis=1)
        R = np.asarray(recurrence_matrix(X, k=2, width=3))
        # frame i in first A matches frame i+20 in second A
        hits = sum(R[i, i + 20] > 0 for i in range(10))
        assert hits >= 9

    def test_default_k(self, feats):
        R = np.asarray(recurrence_matrix(feats))
        t = feats.shape[1]
        k = int(2 * np.ceil(np.sqrt(t - 1)))
        assert np.all(R.sum(axis=1) >= min(k, t - 1))

    def test_errors(self, feats):
        with pytest.raises(ValueError):
            recurrence_matrix(feats, metric="mahalanobis")
        with pytest.raises(ValueError):
            recurrence_matrix(feats, mode="bad")
        with pytest.raises(ValueError):
            recurrence_matrix(feats, width=20)


class TestCrossSimilarity:
    def test_identical_sequences_diagonal(self, feats):
        C = np.asarray(cross_similarity(feats, feats, k=1))
        np.testing.assert_array_equal(np.diag(C), 1.0)

    def test_shape_and_kNN_count(self, feats):
        Y = feats[:, :15]
        C = np.asarray(cross_similarity(feats, Y, k=3))
        assert C.shape == (24, 15)
        np.testing.assert_array_equal(C.sum(axis=1) >= 3, True)

    def test_modes(self, feats):
        Y = feats[:, :10]
        C = np.asarray(cross_similarity(feats, Y, k=2))
        A = np.asarray(cross_similarity(feats, Y, k=2, mode="affinity"))
        # every connectivity edge carries a positive affinity weight
        # (distance-mode zeros are ambiguous for exact-duplicate frames,
        # the same dense-representation caveat librosa documents)
        np.testing.assert_array_equal(A > 0, C > 0)
        assert np.all((A >= 0) & (A <= 1))

    def test_errors(self, feats):
        with pytest.raises(ValueError):
            cross_similarity(feats, feats[:3])


class TestNNFilter:
    def test_mean_matches_manual(self, feats):
        from mlx_audio_primitives_tpu import nn_filter, recurrence_matrix

        R = np.asarray(recurrence_matrix(feats, k=3, mode="affinity"))
        out = np.asarray(nn_filter(feats, rec=R))
        Rw = R + np.eye(R.shape[0])
        ref = (feats.astype(np.float64) @ Rw.T) / Rw.sum(axis=1)[None, :]
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_median_matches_manual(self, feats):
        from mlx_audio_primitives_tpu import nn_filter, recurrence_matrix

        R = np.asarray(recurrence_matrix(feats, k=3))
        out = np.asarray(nn_filter(feats, rec=R, aggregate="median"))
        keep = (R + np.eye(R.shape[0])) > 0
        ref = np.stack(
            [np.median(feats[:, keep[t]], axis=1)
             for t in range(R.shape[0])], axis=1,
        )
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_denoises_repeated_structure(self):
        """Frames repeating across the clip: nn_filter averages away the
        independent noise (the REPET-SIM mechanism)."""
        rng = np.random.default_rng(0)
        clean = rng.uniform(0, 1, (8, 10)).astype(np.float32)
        X = np.tile(clean, (1, 4)) + 0.3 * rng.standard_normal(
            (8, 40)
        ).astype(np.float32)
        from mlx_audio_primitives_tpu import nn_filter

        out = np.asarray(nn_filter(X, k=3, width=5, mode="affinity"))
        tiled = np.tile(clean, (1, 4))
        assert (np.abs(out - tiled).mean()
                < 0.85 * np.abs(X - tiled).mean())

    def test_errors(self, feats):
        from mlx_audio_primitives_tpu import nn_filter

        with pytest.raises(ValueError):
            nn_filter(feats, rec=np.ones((3, 3), np.float32))
        with pytest.raises(ValueError):
            nn_filter(feats, aggregate="mode")


class TestSync:
    def test_beat_sync_chroma(self):
        from mlx_audio_primitives_tpu import sync

        rng = np.random.default_rng(1)
        C = rng.uniform(0, 1, (12, 20)).astype(np.float32)
        out = np.asarray(sync(C, [5, 10, 15]))
        assert out.shape == (12, 4)
        np.testing.assert_allclose(out[:, 0], C[:, :5].mean(axis=1),
                                   atol=1e-6)
        np.testing.assert_allclose(out[:, 2], C[:, 10:15].mean(axis=1),
                                   atol=1e-6)

    def test_no_pad(self):
        from mlx_audio_primitives_tpu import sync

        C = np.arange(20, dtype=np.float32).reshape(2, 10)
        out = np.asarray(sync(C, [2, 6], pad=False))
        assert out.shape == (2, 1)
        np.testing.assert_allclose(out[:, 0], C[:, 2:6].mean(axis=1))

    def test_duplicate_boundaries_kept(self):
        # librosa util.sync keeps duplicate boundaries: each requested
        # segment yields a column, empty segments emitting zeros
        from mlx_audio_primitives_tpu import sync

        C = np.arange(10, dtype=np.float32)[None]
        out = np.asarray(sync(C, [4, 4, 8]))
        assert out.shape == (1, 4)
        np.testing.assert_allclose(out[0, 0], C[0, :4].mean())
        assert out[0, 1] == 0.0  # empty [4, 4) segment
        np.testing.assert_allclose(out[0, 2], C[0, 4:8].mean())

    def test_aggregates(self):
        from mlx_audio_primitives_tpu import sync

        C = np.asarray([[1.0, 5.0, 3.0, 9.0]], np.float32)
        assert float(np.asarray(sync(C, [4], aggregate="max",
                                     pad=True))[0, 0]) == 9.0
        assert float(np.asarray(sync(C, [4], aggregate="median"))[0, 0]) == 4.0

    def test_errors(self):
        from mlx_audio_primitives_tpu import sync

        C = np.ones((2, 10), np.float32)
        with pytest.raises(ValueError):
            sync(C, [5, 3])
        with pytest.raises(ValueError):
            sync(C, [99])
        with pytest.raises(ValueError):
            sync(C, [5], aggregate="mode")
