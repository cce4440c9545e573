"""Beat tracking tests: click-track ground truth + a scalar DP oracle.

librosa is not installed in this image; the oracle is an independent
scalar transliteration of the published Ellis (2007) dynamic program the
implementation models, evaluated in float64.
"""

import numpy as np
import pytest

from mlx_audio_primitives_tpu import beat_track
from mlx_audio_primitives_tpu.ops.beat import _beat_dp, _local_score

SR = 22050
HOP = 512


def click_track(bpm, dur=10.0, sr=SR, jitter=0.0, seed=0):
    """Impulse train at the given tempo (clicks = 1-sample spikes)."""
    rng = np.random.default_rng(seed)
    y = np.zeros(int(dur * sr), np.float32)
    step = 60.0 / bpm
    t = step / 2
    truth = []
    while t < dur:
        tt = t + (rng.uniform(-jitter, jitter) if jitter else 0.0)
        k = int(tt * sr)
        if k < len(y):
            y[k] = 1.0
            truth.append(k)
        t += step
    return y, np.asarray(truth)


def _dp_oracle(localscore, period, tightness):
    """Scalar float64 Ellis DP (the algorithm's published recurrence)."""
    F = len(localscore)
    lo, hi = 2 * period, max(int(round(period / 2.0)), 1)
    offs = np.arange(-lo, -hi + 1)
    txwt = -tightness * np.log(-offs / period) ** 2
    cumscore = np.zeros(F)
    backlink = np.zeros(F, int)
    thresh = 0.01 * localscore.max()
    first = True
    for i in range(F):
        cand = txwt.copy()
        for k, j in enumerate(offs):
            if i + j >= 0:
                cand[k] += cumscore[i + j]
        best = int(np.argmax(cand))
        cumscore[i] = localscore[i] + cand[best]
        if first and localscore[i] < thresh:
            backlink[i] = -1
        else:
            backlink[i] = i + offs[best]
            first = False
    return cumscore, backlink


class TestBeatDpOracle:
    @pytest.mark.parametrize("period,tightness", [(22, 100.0), (10, 400.0)])
    def test_matches_scalar_dp(self, period, tightness):
        rng = np.random.default_rng(0)
        ls = rng.uniform(0, 1, 300).astype(np.float32)
        cum, back = _beat_dp(
            np.asarray(ls), period=period, tightness=tightness
        )
        cum_o, back_o = _dp_oracle(ls.astype(np.float64), period, tightness)
        np.testing.assert_allclose(np.asarray(cum), cum_o, rtol=1e-4,
                                   atol=1e-3)
        np.testing.assert_array_equal(np.asarray(back), back_o)

    def test_localscore_gaussian_smooth(self):
        import scipy.signal

        rng = np.random.default_rng(1)
        oe = rng.uniform(0, 1, 200).astype(np.float32)
        period = 20
        ours = np.asarray(_local_score(np.asarray(oe), period=period))
        x = oe / oe.std(ddof=1)
        t = np.arange(-period, period + 1)
        win = np.exp(-0.5 * (t * 32.0 / period) ** 2)
        ref = scipy.signal.convolve(x.astype(np.float64), win, "same")
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


class TestBeatTrackPhysics:
    @pytest.mark.parametrize("bpm", [90, 120, 150])
    def test_recovers_click_beats(self, bpm):
        y, truth = click_track(bpm, dur=12.0)
        est_bpm, beats = beat_track(y=y, sr=SR, hop_length=HOP,
                                    units="samples")
        # tempo within 5% (or a metrical factor — exclude by construction)
        assert abs(est_bpm - bpm) / bpm < 0.05
        # most interior true clicks have an estimated beat within 80 ms
        hits = sum(
            1 for t in truth[1:-1]
            if beats.size and np.abs(beats - t).min() < 0.08 * SR
        )
        assert hits >= 0.8 * (len(truth) - 2)

    def test_beat_spacing_matches_period(self):
        y, _ = click_track(120, dur=12.0)
        est_bpm, beats = beat_track(y=y, sr=SR, units="frames")
        assert beats.size >= 10
        spacing = np.diff(beats)
        period = 60.0 * SR / (est_bpm * HOP)
        assert np.abs(np.median(spacing) - period) <= 1.5

    def test_explicit_bpm(self):
        y, _ = click_track(120, dur=8.0)
        est_bpm, beats = beat_track(y=y, sr=SR, bpm=120.0)
        assert est_bpm == 120.0
        assert beats.size >= 8

    def test_units(self):
        y, _ = click_track(120, dur=6.0)
        _, bf = beat_track(y=y, sr=SR, units="frames")
        _, bs = beat_track(y=y, sr=SR, units="samples")
        _, bt = beat_track(y=y, sr=SR, units="time")
        np.testing.assert_array_equal(bs, bf * HOP)
        np.testing.assert_allclose(bt, bf * HOP / SR)

    def test_silence(self):
        bpm, beats = beat_track(
            onset_envelope=np.zeros(200, np.float32), sr=SR
        )
        assert bpm == 0.0 and beats.size == 0

    def test_jittered_clicks_still_tracked(self):
        y, truth = click_track(110, dur=12.0, jitter=0.01, seed=3)
        est_bpm, beats = beat_track(y=y, sr=SR, units="samples")
        assert abs(est_bpm - 110) / 110 < 0.08
        assert beats.size >= 15

    def test_errors(self):
        with pytest.raises(ValueError):
            beat_track()
        with pytest.raises(ValueError):
            beat_track(onset_envelope=np.zeros((2, 100), np.float32))
        with pytest.raises(ValueError):
            beat_track(onset_envelope=np.ones(100, np.float32), bpm=-3.0)
        with pytest.raises(ValueError):
            beat_track(onset_envelope=np.ones(100, np.float32),
                       units="parsecs")
