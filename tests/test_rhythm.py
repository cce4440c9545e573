"""Tempogram + tempo estimation tests.

Ground truth comes from synthesized click tracks at known BPM; the
tempogram's lag structure is checked directly (peak at the beat period in
frames), and `tempo` must recover the BPM within one lag bin's resolution.
"""

from __future__ import annotations

import numpy as np
import pytest

from mlx_audio_primitives_tpu.ops.rhythm import tempo, tempo_frequencies, tempogram

SR = 22050
HOP = 512


def click_track(bpm, sr=SR, dur=8.0, freq=1000.0):
    y = np.zeros(int(sr * dur), dtype=np.float32)
    n = int(sr * 0.02)
    t = np.arange(n) / sr
    click = (np.sin(2 * np.pi * freq * t) * np.exp(-t / 0.005)).astype(np.float32)
    period = 60.0 / bpm
    k = 1
    while k * period * sr + n < len(y):
        s = int(k * period * sr)
        y[s : s + n] += click
        k += 1
    return y


class TestTempoFrequencies:
    def test_values(self):
        bpms = tempo_frequencies(8, hop_length=HOP, sr=SR)
        assert np.isinf(bpms[0])
        # lag i frames -> 60 * sr / (hop * i) BPM
        np.testing.assert_allclose(bpms[1], 60.0 * SR / HOP)
        np.testing.assert_allclose(bpms[4], 60.0 * SR / (HOP * 4))

    def test_monotone_decreasing(self):
        bpms = tempo_frequencies(32, HOP, SR)[1:]
        assert np.all(np.diff(bpms) < 0)


class TestTempogram:
    def test_shape_and_norm(self):
        y = click_track(120.0, dur=6.0)
        tg = np.asarray(tempogram(y, sr=SR, hop_length=HOP, win_length=256))
        F = 1 + int(np.ceil(len(y) / HOP))  # envelope frames (center=True)
        assert tg.shape[0] == 256
        assert abs(tg.shape[1] - F) <= 2
        assert np.nanmax(np.abs(tg)) <= 1.0 + 1e-5
        # lag 0 is the (normalized) energy: 1 wherever the window has energy
        mid = tg[:, tg.shape[1] // 2]
        np.testing.assert_allclose(mid[0], 1.0, atol=1e-5)

    def test_beat_period_peak(self):
        bpm = 120.0
        y = click_track(bpm, dur=8.0)
        tg = np.asarray(tempogram(y, sr=SR, hop_length=HOP, win_length=384))
        mean_ac = tg.mean(axis=-1)
        period_frames = int(round(60.0 / bpm * SR / HOP))  # ~43
        # among nontrivial lags, the beat period is a dominant peak
        window = mean_ac[period_frames - 2 : period_frames + 3]
        others = np.concatenate(
            [mean_ac[5 : period_frames - 5],
             mean_ac[period_frames + 5 : 2 * period_frames - 5]]
        )
        assert window.max() > others.max()

    def test_batch_matches_single(self):
        y0, y1 = click_track(100.0, dur=4.0), click_track(140.0, dur=4.0)
        tb = np.asarray(tempogram(np.stack([y0, y1]), sr=SR, win_length=128))
        t0 = np.asarray(tempogram(y0, sr=SR, win_length=128))
        np.testing.assert_allclose(tb[0], t0, rtol=1e-4, atol=1e-5)

    def test_envelope_passthrough(self):
        env = np.zeros(200, dtype=np.float32)
        env[::20] = 1.0
        tg = np.asarray(tempogram(onset_envelope=env, win_length=64))
        assert tg.shape == (64, 200)
        # periodic envelope: the beat lag dominates all other nontrivial
        # lags (hann taper + edge ramps keep absolute values below 1)
        mean_ac = tg.mean(axis=-1)
        assert mean_ac[20] > mean_ac[5:15].max()
        assert mean_ac[20] > mean_ac[25:35].max()

    def test_errors(self):
        with pytest.raises(ValueError):
            tempogram(None)
        with pytest.raises(ValueError):
            tempogram(click_track(120.0, dur=1.0), win_length=0)


class TestTempo:
    @pytest.mark.parametrize("bpm", [90.0, 120.0, 150.0])
    def test_recovers_click_bpm(self, bpm):
        y = click_track(bpm, dur=10.0)
        est = float(tempo(y, sr=SR, hop_length=HOP, start_bpm=bpm)[0])
        # one-lag-bin resolution at the detected period
        period = int(round(60.0 / bpm * SR / HOP))
        res = abs(60.0 * SR / (HOP * period) - 60.0 * SR / (HOP * (period + 1)))
        assert abs(est - bpm) <= max(res, 2.0)

    def test_prior_picks_octave(self):
        # a 60-BPM click is metrically ambiguous with 120 (half/double);
        # the log-normal prior around start_bpm resolves the octave
        y = click_track(60.0, dur=12.0)
        lo = float(tempo(y, sr=SR, start_bpm=60.0)[0])
        assert abs(lo - 60.0) < 4.0

    def test_batch_shape(self):
        y = np.stack([click_track(120.0, dur=6.0), click_track(100.0, dur=6.0)])
        est = tempo(y, sr=SR)
        assert est.shape == (2, 1)

    def test_envelope_input(self):
        env = np.zeros(400, dtype=np.float32)
        period = 20  # frames -> 60*sr/(hop*20) BPM
        env[::period] = 1.0
        want = 60.0 * SR / (HOP * period)
        est = float(tempo(onset_envelope=env, sr=SR, hop_length=HOP,
                          start_bpm=want)[0])
        np.testing.assert_allclose(est, want, rtol=1e-6)


class TestPerFrameTempo:
    def test_constant_clicks_constant_per_frame(self):
        from mlx_audio_primitives_tpu.ops.rhythm import tempo

        env = np.tile(np.r_[1.0, np.zeros(21)], 60).astype(np.float32)
        per = tempo(onset_envelope=env, sr=22050, hop_length=512,
                    aggregate=False)
        glob = tempo(onset_envelope=env, sr=22050, hop_length=512)
        assert per.shape == (len(env),)
        mid = per[len(env) // 4 : 3 * len(env) // 4]
        # interior frames agree with the global estimate
        assert np.median(np.abs(mid - glob[0])) < 1e-6

    def test_tempo_change_tracked(self):
        from mlx_audio_primitives_tpu.ops.rhythm import tempo

        # clicks every 22 frames, then every 11 (double tempo). ACF tempo
        # is metrically ambiguous toward subharmonics (period-11 clicks
        # also peak at lag 22), so anchor the prior at the FAST level: in
        # the slow half lag 11 has no ACF peak and the estimate falls to
        # 117; in the fast half it does and 235 wins.
        a = np.tile(np.r_[1.0, np.zeros(21)], 40)
        b = np.tile(np.r_[1.0, np.zeros(10)], 80)
        env = np.concatenate([a, b]).astype(np.float32)
        per = tempo(onset_envelope=env, sr=22050, hop_length=512,
                    aggregate=False, start_bpm=240.0)
        F = len(env)
        first = np.median(per[F // 8 : 3 * F // 8])
        second = np.median(per[5 * F // 8 : 7 * F // 8])
        np.testing.assert_allclose(second / first, 2.0, rtol=0.1)

    def test_batched_shape(self):
        from mlx_audio_primitives_tpu.ops.rhythm import tempo

        env = np.tile(np.r_[1.0, np.zeros(21)], 40).astype(np.float32)
        per = tempo(onset_envelope=np.stack([env, env]), sr=22050,
                    aggregate=False)
        assert per.shape == (2, len(env))
