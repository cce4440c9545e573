"""YIN pitch tracking tests.

Oracle: a sequential, per-frame float64 textbook YIN (explicit O(W*tau)
difference-function loops — independent of the library's FFT/cumsum
vectorization), plus musical property tests: pure-tone accuracy inside
0.5%, octave correctness on harmonic-rich tones, chirp tracking.
"""

from __future__ import annotations

import numpy as np
import pytest

from mlx_audio_primitives_tpu import yin

SR = 22050


def tone(freq, sr=SR, dur=1.0, phi=0.0):
    t = np.arange(int(sr * dur)) / sr
    return np.sin(2 * np.pi * freq * t + phi).astype(np.float32)


def sawtooth(freq, sr=SR, dur=1.0, n_harm=10):
    t = np.arange(int(sr * dur)) / sr
    y = sum(np.sin(2 * np.pi * freq * k * t) / k for k in range(1, n_harm + 1))
    return (y / np.abs(y).max()).astype(np.float32)


def _oracle_yin_frame(x, W, min_p, max_p, threshold):
    """Textbook YIN on one frame: explicit difference-function loops."""
    x = np.asarray(x, dtype=np.float64)
    d = np.zeros(max_p + 1)
    for tau in range(max_p + 1):
        acc = 0.0
        for j in range(W):
            diff = x[j] - x[j + tau]
            acc += diff * diff
        d[tau] = acc
    cmnd = np.ones(max_p + 1)
    run = 0.0
    for tau in range(1, max_p + 1):
        run += d[tau]
        cmnd[tau] = d[tau] * tau / run if run > 0 else 1.0
    band = cmnd[min_p : max_p + 1]
    # first trough below threshold, else global min
    idx = None
    for n in range(len(band)):
        left = band[n - 1] if n > 0 else np.inf
        right = band[n + 1] if n < len(band) - 1 else np.inf
        if band[n] < left and band[n] <= right and band[n] < threshold:
            idx = n
            break
    if idx is None:
        idx = int(np.argmin(band))
    # parabolic refinement
    shift = 0.0
    if 0 < idx < len(band) - 1:
        l, c, r = band[idx - 1], band[idx], band[idx + 1]
        den = l + r - 2 * c
        if abs(den) > 1e-12:
            shift = np.clip(0.5 * (l - r) / den, -0.5, 0.5)
    return min_p + idx + shift


class TestYinAccuracy:
    @pytest.mark.parametrize("freq", [110.0, 220.0, 440.0, 587.33])
    def test_pure_tone(self, freq):
        f0 = np.asarray(yin(tone(freq), fmin=60, fmax=1000))
        med = np.median(f0)
        assert abs(med - freq) / freq < 0.005

    @pytest.mark.parametrize("freq", [110.0, 220.0])
    def test_harmonic_rich_fundamental(self, freq):
        # sawtooth has strong harmonics; YIN must not octave-jump
        f0 = np.asarray(yin(sawtooth(freq), fmin=60, fmax=1000))
        med = np.median(f0)
        assert abs(med - freq) / freq < 0.01

    def test_chirp_tracks(self):
        sr = SR
        t = np.arange(sr) / sr
        f_inst = 200.0 + 300.0 * t  # 200 -> 500 Hz linear
        phase = 2 * np.pi * np.cumsum(f_inst) / sr
        y = np.sin(phase).astype(np.float32)
        f0 = np.asarray(yin(y, fmin=100, fmax=800))
        F = len(f0)
        # compare mid-frames against the instantaneous frequency
        hop = 512
        for fr in range(4, F - 4):
            expect = 200.0 + 300.0 * (fr * hop / sr)
            assert abs(f0[fr] - expect) / expect < 0.05

    def test_matches_scalar_oracle(self):
        rng = np.random.default_rng(0)
        y = sawtooth(146.83, dur=0.25) + 0.01 * rng.standard_normal(
            int(SR * 0.25)
        ).astype(np.float32)
        frame_length, W, hop = 1024, 512, 256
        fmin, fmax, thr = 80.0, 400.0, 0.1
        f0 = np.asarray(
            yin(y, fmin=fmin, fmax=fmax, frame_length=frame_length,
                win_length=W, hop_length=hop, center=False,
                trough_threshold=thr)
        )
        min_p = max(int(np.floor(SR / fmax)), 1)
        max_p = min(int(np.ceil(SR / fmin)), frame_length - W - 1)
        F = 1 + (len(y) - frame_length) // hop
        assert len(f0) == F
        for fr in range(F):
            x = y[fr * hop : fr * hop + frame_length]
            period = _oracle_yin_frame(x, W, min_p, max_p, thr)
            np.testing.assert_allclose(f0[fr], SR / period, rtol=5e-3)


class TestYinShapes:
    def test_frame_count_center(self):
        y = tone(220.0, dur=0.5)
        f0 = np.asarray(yin(y, fmin=60, fmax=1000))
        assert len(f0) == 1 + len(y) // 512  # center=True, hop=2048//4

    def test_batch_matches_single(self):
        y0, y1 = tone(220.0), tone(330.0)
        fb = np.asarray(yin(np.stack([y0, y1]), fmin=60, fmax=1000))
        np.testing.assert_allclose(
            fb[0], np.asarray(yin(y0, fmin=60, fmax=1000)), rtol=1e-5
        )
        np.testing.assert_allclose(
            fb[1], np.asarray(yin(y1, fmin=60, fmax=1000)), rtol=1e-5
        )

    def test_all_frames_finite_positive(self):
        rng = np.random.default_rng(1)
        y = rng.standard_normal(SR // 2).astype(np.float32)
        f0 = np.asarray(yin(y, fmin=60, fmax=1000))
        assert np.isfinite(f0).all()
        assert (f0 > 0).all()

    def test_silence_stays_in_band(self):
        f0 = np.asarray(yin(np.zeros(SR // 2, np.float32), fmin=60, fmax=1000))
        assert ((f0 >= 50) & (f0 <= 1100)).all()

    def test_errors(self):
        y = tone(220.0, dur=0.2)
        with pytest.raises(ValueError):
            yin(y, fmin=0.0, fmax=100.0)
        with pytest.raises(ValueError):
            yin(y, fmin=500.0, fmax=100.0)
        with pytest.raises(ValueError):
            yin(y, fmin=60, fmax=1000, win_length=2048)  # >= frame_length
        with pytest.raises(ValueError):
            # band empty: fmin far below what frame_length can hold
            yin(y, fmin=1.0, fmax=2.0, frame_length=256)
        with pytest.raises(ValueError):
            yin(tone(220.0, dur=0.01), fmin=60, fmax=1000, center=False)
