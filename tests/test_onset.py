"""Onset strength + onset detection tests.

Oracle: a sequential, scalar-loop float64 peak picker implementing
librosa's five `peak_pick` conditions verbatim (independent of the
vectorized library code), plus click-track property tests (detected onsets
within one frame of the ground-truth click positions).
"""

from __future__ import annotations

import numpy as np
import pytest

from mlx_audio_primitives_tpu.ops.onset import (
    _peak_pick_mask,
    onset_detect,
    onset_strength,
)

SR = 22050
HOP = 512


def click_track(times, sr=SR, dur=2.0, freq=1000.0, click_len=0.02):
    """Silence with short decaying tone bursts at the given times."""
    y = np.zeros(int(sr * dur), dtype=np.float32)
    n = int(sr * click_len)
    t = np.arange(n) / sr
    click = (np.sin(2 * np.pi * freq * t) * np.exp(-t / 0.005)).astype(np.float32)
    for tt in times:
        s = int(tt * sr)
        y[s : s + n] += click[: len(y) - s]
    return y


def _oracle_peak_pick(x, pre_max, post_max, pre_avg, post_avg, delta, wait):
    """Sequential scalar implementation of librosa's peak_pick conditions."""
    x = np.asarray(x, dtype=np.float64)
    peaks = []
    last = -wait - 1
    for n in range(len(x)):
        lo_m, hi_m = max(0, n - pre_max), min(len(x), n + post_max)
        lo_a, hi_a = max(0, n - pre_avg), min(len(x), n + post_avg)
        if x[n] != x[lo_m:hi_m].max():
            continue
        if x[n] < x[lo_a:hi_a].mean() + delta:
            continue
        if n - last <= wait:
            continue
        peaks.append(n)
        last = n
    return np.array(peaks, dtype=int)


class TestOnsetStrength:
    def test_shape_and_nonneg(self):
        y = click_track([0.25, 0.75, 1.25])
        env = np.asarray(onset_strength(y))
        assert env.ndim == 1
        assert np.all(env >= 0)

    def test_click_frames_are_peaks(self):
        times = [0.3, 0.8, 1.4]
        env = np.asarray(onset_strength(click_track(times)))
        for tt in times:
            f = int(round(tt * SR / HOP))
            w = env[max(0, f - 2) : f + 3]
            # the onset frame region carries (near-)maximal strength
            assert w.max() >= 0.9 * env.max() * 0.5
            assert w.max() > np.median(env) + 1e-3

    def test_silence_is_zero(self):
        env = np.asarray(onset_strength(np.zeros(SR, dtype=np.float32)))
        np.testing.assert_allclose(env, 0.0, atol=1e-6)

    def test_batch_matches_single(self):
        y0 = click_track([0.3, 0.9])
        y1 = click_track([0.5, 1.1])
        envb = np.asarray(onset_strength(np.stack([y0, y1])))
        np.testing.assert_allclose(
            envb[0], np.asarray(onset_strength(y0)), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            envb[1], np.asarray(onset_strength(y1)), rtol=1e-5, atol=1e-6
        )

    def test_center_false_shifts(self):
        y = click_track([0.5])
        e_c = np.asarray(onset_strength(y, center=True))
        e_n = np.asarray(onset_strength(y, center=False))
        assert e_c.shape == e_n.shape
        off = 2048 // (2 * HOP)
        # centered envelope = uncentered delayed by the compensation offset
        np.testing.assert_allclose(e_c[off:], e_n[: len(e_n) - off],
                                   rtol=1e-5, atol=1e-6)

    def test_max_size_reference_reduces_flux(self):
        rng = np.random.default_rng(0)
        y = rng.standard_normal(SR).astype(np.float32) * 0.1
        e1 = np.asarray(onset_strength(y, max_size=1))
        e5 = np.asarray(onset_strength(y, max_size=5))
        # max-filtered reference can only shrink the rectified difference
        assert e5.sum() <= e1.sum() + 1e-5

    def test_detrend_zero_mean_trend(self):
        y = click_track([0.3, 0.7, 1.1, 1.5])
        env = np.asarray(onset_strength(y, detrend=True))
        n = len(env)
        x = np.arange(n) - (n - 1) / 2
        slope = (env * x).sum() / (x * x).sum()
        assert abs(slope) < 1e-6
        assert abs(env.mean()) < 1e-6

    def test_s_protocol(self):
        from mlx_audio_primitives_tpu import melspectrogram, power_to_db

        y = click_track([0.4, 1.0])
        S_db = power_to_db(melspectrogram(y))
        e_s = np.asarray(onset_strength(S=S_db))
        e_y = np.asarray(onset_strength(y))
        np.testing.assert_allclose(e_s, e_y, rtol=1e-4, atol=1e-5)

    def test_errors(self):
        with pytest.raises(ValueError):
            onset_strength(None)
        with pytest.raises(ValueError):
            onset_strength(np.zeros(1000, np.float32), lag=0)


class TestPeakPickMask:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_matches_sequential_oracle(self, seed):
        rng = np.random.default_rng(seed)
        x = np.maximum(0, rng.standard_normal(200)).astype(np.float32)
        kw = dict(pre_max=3, post_max=3, pre_avg=5, post_avg=5, wait=4)
        mask = np.asarray(
            _peak_pick_mask(x[None], delta=0.3, **{**kw,
                            "post_max": kw["post_max"] - 1,
                            "post_avg": kw["post_avg"] - 1})
        )[0]
        got = np.flatnonzero(mask)
        want = _oracle_peak_pick(x, delta=0.3, **kw)
        np.testing.assert_array_equal(got, want)

    def test_wait_zero(self):
        x = np.array([0, 1, 0, 1, 0, 1, 0], dtype=np.float32)
        mask = np.asarray(
            _peak_pick_mask(x[None], pre_max=1, post_max=1, pre_avg=2,
                            post_avg=2, delta=0.1, wait=0)
        )[0]
        np.testing.assert_array_equal(np.flatnonzero(mask), [1, 3, 5])

    def test_wait_debounce(self):
        x = np.array([0, 1, 0, 1, 0, 1, 0], dtype=np.float32)
        mask = np.asarray(
            _peak_pick_mask(x[None], pre_max=1, post_max=1, pre_avg=2,
                            post_avg=2, delta=0.1, wait=2)
        )[0]
        # greedy: take 1, skip 3 (within wait), take 5
        np.testing.assert_array_equal(np.flatnonzero(mask), [1, 5])


class TestOnsetDetect:
    def test_detects_clicks(self):
        times = [0.3, 0.8, 1.4]
        onsets = onset_detect(click_track(times))
        assert len(onsets) == len(times)
        for tt, f in zip(times, onsets):
            assert abs(f - tt * SR / HOP) <= 2.0

    def test_units(self):
        y = click_track([0.5, 1.2])
        fr = onset_detect(y)
        sm = onset_detect(y, units="samples")
        tm = onset_detect(y, units="time")
        np.testing.assert_array_equal(sm, fr * HOP)
        np.testing.assert_allclose(tm, fr * HOP / SR)
        with pytest.raises(ValueError):
            onset_detect(y, units="fortnights")

    def test_envelope_passthrough(self):
        env = np.zeros(100, dtype=np.float32)
        env[[20, 60]] = 1.0
        onsets = onset_detect(onset_envelope=env, sr=SR, hop_length=HOP)
        np.testing.assert_array_equal(onsets, [20, 60])

    def test_silence_no_onsets(self):
        # normalize=False: an all-zero envelope yields no peaks above delta
        onsets = onset_detect(
            onset_envelope=np.zeros(50, np.float32), normalize=False
        )
        assert len(onsets) == 0

    def test_backtrack(self):
        env = np.array([0.5, 0.2, 0.0, 0.1, 0.4, 1.0, 0.3, 0.0, 0.0, 0.0],
                       dtype=np.float32)
        plain = onset_detect(onset_envelope=env, normalize=False, delta=0.2)
        back = onset_detect(onset_envelope=env, normalize=False, delta=0.2,
                            backtrack=True)
        assert 5 in plain
        # onset at 5 backtracks to the local minimum at 2
        assert 2 in back

    def test_errors(self):
        with pytest.raises(ValueError):
            onset_detect(None)
        with pytest.raises(ValueError):
            onset_detect(onset_envelope=np.zeros((2, 50), np.float32))


class TestOnsetBacktrackPublic:
    def test_matches_internal(self):
        from mlx_audio_primitives_tpu import onset_backtrack

        energy = np.array([0.5, 0.2, 0.0, 0.1, 0.4, 1.0, 0.3], np.float64)
        out = onset_backtrack([5], energy)
        np.testing.assert_array_equal(out, [2])

    def test_empty(self):
        from mlx_audio_primitives_tpu import onset_backtrack

        assert onset_backtrack([], np.ones(10)).size == 0
