"""Brute-force scalar pYIN oracle (VERDICT r3 item 6).

An independent float64 reimplementation of the pYIN semantic spec (Mauch &
Dixon 2014, the algorithm behind librosa.pyin) with per-frame Python loops
and NO shared code with `ops/pyin.py`: the difference function is a literal
double loop, the Beta prior uses scipy.special.betainc (the library
integrates a trapezoid), trough ranking/Boltzmann/Viterbi are explicit
loops. Short signals only — the oracle is O(F * P * W).

This pins the tensorized all-frames-at-once pYIN against an implementation
whose only commonality is the published algorithm; the librosa crossval CI
job (`tests/test_librosa_crossval.py::TestPitch::test_pyin`) adds the
third-party check.
"""

import numpy as np
import pytest
import scipy.special

import mlx_audio_primitives_tpu as ap

SR = 8000  # small sr keeps the period band short


def scalar_pyin(
    y, fmin, fmax, sr, frame_length=1024, win_length=None, hop_length=None,
    n_thresholds=100, beta_parameters=(2.0, 18.0), boltzmann_parameter=2.0,
    resolution=0.1, max_transition_rate=35.92, switch_prob=0.01,
    no_trough_prob=0.01,
):
    if win_length is None:
        win_length = frame_length // 2
    if hop_length is None:
        hop_length = frame_length // 4
    y = np.asarray(y, np.float64)
    pad = frame_length // 2
    y = np.pad(y, pad)  # center, constant

    min_period = max(int(np.floor(sr / fmax)), 1)
    max_period = min(int(np.ceil(sr / fmin)), frame_length - win_length - 1)
    n_frames = 1 + (len(y) - frame_length) // hop_length
    W = win_length

    bins_per_semitone = max(int(round(1.0 / resolution)), 1)
    n_bins = int(np.ceil(12 * bins_per_semitone * np.log2(fmax / fmin))) + 1

    # Beta(a, b) mass per threshold level via the regularized incomplete
    # beta function (scipy), levels t_i = i / n
    a, b = beta_parameters
    t_edges = np.linspace(0.0, 1.0, n_thresholds + 1)
    beta_mass = np.diff(scipy.special.betainc(a, b, t_edges))
    t_levels = t_edges[1:]

    lam = float(boltzmann_parameter)
    obs = np.zeros((n_frames, n_bins))
    voiced_prob = np.zeros(n_frames)

    for f in range(n_frames):
        x = y[f * hop_length : f * hop_length + frame_length]
        # difference function: literal double loop over tau
        d = np.zeros(max_period + 1)
        for tau in range(max_period + 1):
            acc = 0.0
            for j in range(W):
                diff = x[j] - x[j + tau]
                acc += diff * diff
            d[tau] = acc
        # cumulative mean normalization
        cmnd = np.ones(max_period + 1)
        run = 0.0
        for tau in range(1, max_period + 1):
            run += d[tau]
            cmnd[tau] = d[tau] * tau / run if run > 0 else 1.0
        band = cmnd[min_period : max_period + 1]
        P = len(band)

        # troughs: interior local minima (< prev, <= next); global min
        # always admitted
        gmin = int(np.argmin(band))
        troughs = []
        for p in range(P):
            prev = band[p - 1] if p > 0 else band[p] + 1.0
            nxt = band[p + 1] if p < P - 1 else band[p] + 1.0
            if (band[p] < prev and band[p] <= nxt) or p == gmin:
                troughs.append(p)
        dead = band.max() < 1e-7
        if dead:
            troughs = []

        # parabolic period refinement
        def refined_period(p):
            prev = band[p - 1] if p > 0 else band[p] + 1.0
            nxt = band[p + 1] if p < P - 1 else band[p] + 1.0
            denom = prev + nxt - 2.0 * band[p]
            shift = 0.5 * (prev - nxt) / denom if abs(denom) > 1e-38 else 0.0
            return p + min_period + float(np.clip(shift, -0.5, 0.5))

        # threshold integration with Boltzmann rank weighting
        prob = {p: 0.0 for p in troughs}
        empty_mass = 0.0
        for i, t in enumerate(t_levels):
            below = [p for p in troughs if band[p] < t]
            if not below:
                empty_mass += beta_mass[i]
                continue
            N = len(below)
            z = 1.0 - np.exp(-lam * N)
            for r, p in enumerate(below):
                prob[p] += beta_mass[i] * (1 - np.exp(-lam)) * np.exp(
                    -lam * r) / z
        if troughs and not dead:
            prob[gmin] += no_trough_prob * empty_mass

        for p, pr in prob.items():
            f0 = sr / refined_period(p)
            k = int(np.clip(round(12 * bins_per_semitone
                                  * np.log2(max(f0, 1e-38) / fmin)),
                            0, n_bins - 1))
            obs[f, k] += pr
        voiced_prob[f] = min(sum(prob.values()), 1.0)

    # Viterbi over [voiced bins | unvoiced bins]
    frames_per_sec = sr / hop_length
    width = 2 * max(
        int(round(max_transition_rate * 12 * bins_per_semitone
                  / frames_per_sec)), 1) + 1
    width = min(width, 2 * n_bins - 1)
    half = width // 2
    delta_b = np.abs(np.subtract.outer(np.arange(n_bins),
                                       np.arange(n_bins)))
    tri = np.maximum(half + 1 - delta_b, 0).astype(np.float64)
    tri /= tri.sum(axis=1, keepdims=True)
    with np.errstate(divide="ignore"):
        log_local = np.log(tri)
    log_sw = np.log(np.array([[1 - switch_prob, switch_prob],
                              [switch_prob, 1 - switch_prob]]))
    S = 2 * n_bins
    T = np.block([
        [log_sw[0, 0] + log_local, log_sw[0, 1] + log_local],
        [log_sw[1, 0] + log_local, log_sw[1, 1] + log_local],
    ])
    tinylog = np.log(np.finfo(np.float32).tiny)
    logO = np.full((n_frames, S), tinylog)
    for f in range(n_frames):
        for k in range(n_bins):
            if obs[f, k] > 0:
                logO[f, k] = np.log(obs[f, k])
            u = (1.0 - voiced_prob[f]) / n_bins
            logO[f, n_bins + k] = np.log(u) if u > 0 else tinylog

    delta = logO[0] - np.log(S)
    bps = np.zeros((n_frames - 1, S), np.int64)
    for f in range(1, n_frames):
        scores = delta[:, None] + T
        bps[f - 1] = np.argmax(scores, axis=0)
        delta = scores[bps[f - 1], np.arange(S)] + logO[f]
        delta -= delta.max()
    states = np.zeros(n_frames, np.int64)
    states[-1] = int(np.argmax(delta))
    for f in range(n_frames - 2, -1, -1):
        states[f] = bps[f, states[f + 1]]

    voiced = states < n_bins
    freqs = fmin * 2.0 ** (np.arange(n_bins) / (12 * bins_per_semitone))
    f0 = np.where(voiced, freqs[states % n_bins], np.nan)
    return f0, voiced, voiced_prob


@pytest.fixture(scope="module")
def tone_with_silence():
    """0.15 s tone + 0.1 s near-silence + 0.15 s lower tone."""
    t1 = np.arange(int(0.15 * SR)) / SR
    t2 = np.arange(int(0.15 * SR)) / SR
    rng = np.random.default_rng(0)
    seg = np.concatenate([
        np.sin(2 * np.pi * 220.0 * t1),
        1e-5 * rng.standard_normal(int(0.1 * SR)),
        np.sin(2 * np.pi * 150.0 * t2),
    ])
    return seg.astype(np.float32)


class TestScalarOracle:
    def _compare(self, y, **kw):
        kw.setdefault("fmin", 100.0)
        kw.setdefault("fmax", 400.0)
        kw.setdefault("frame_length", 1024)
        f0, vf, vp = ap.pyin(y, sr=SR, **kw)
        f0, vf, vp = np.asarray(f0), np.asarray(vf), np.asarray(vp)
        f0r, vfr, vpr = scalar_pyin(y, sr=SR, **kw)
        assert f0.shape == f0r.shape
        # voicing decisions: allow isolated flips at segment boundaries
        assert (vf == vfr).mean() > 0.9
        both = vf & vfr
        if both.any():
            # identical pitch-bin grid -> agreed frames match to a bin;
            # allow isolated octave flips at voicing boundaries (f32 vs
            # f64 near-ties in the Viterbi), but >=90% must agree and the
            # typical frame must match exactly
            err = np.abs(np.log2(f0[both] / f0r[both]))
            assert (err < 1.5 * 0.1 / 12).mean() >= 0.9
            assert np.median(err) < 1e-6
        np.testing.assert_allclose(vp, vpr, atol=5e-3)

    def test_tone(self):
        t = np.arange(int(0.4 * SR)) / SR
        y = np.sin(2 * np.pi * 220.0 * t).astype(np.float32)
        self._compare(y)

    def test_chirp(self):
        t = np.arange(int(0.4 * SR)) / SR
        phase = 2 * np.pi * (150.0 * t + 0.5 * 150.0 * t**2)
        self._compare(np.sin(phase).astype(np.float32))

    def test_voicing_segmentation(self, tone_with_silence):
        self._compare(tone_with_silence)

    def test_noisy_tone(self):
        rng = np.random.default_rng(3)
        t = np.arange(int(0.4 * SR)) / SR
        y = (np.sin(2 * np.pi * 180.0 * t)
             + 0.1 * rng.standard_normal(len(t))).astype(np.float32)
        self._compare(y)

    def test_nondefault_params(self):
        t = np.arange(int(0.3 * SR)) / SR
        y = np.sin(2 * np.pi * 250.0 * t).astype(np.float32)
        self._compare(y, n_thresholds=50, boltzmann_parameter=1.0,
                      resolution=0.2, switch_prob=0.05)
