"""piptrack tests: scalar librosa-semantics oracle + physical pitch checks.

librosa itself is not installed in this image (zero-egress); the oracle below
is an independent, loop-based transliteration of the documented
librosa.piptrack algorithm (parabolic interpolation over STFT magnitude
columns, threshold-relative local-max peak selection), evaluated in float64.
"""

import numpy as np
import pytest

from mlx_audio_primitives_tpu import piptrack, stft

SR = 22050
N_FFT = 2048


def _oracle_piptrack(S, sr, n_fft, fmin=150.0, fmax=4000.0, threshold=0.1,
                     ref=None):
    """Scalar double-loop librosa.piptrack on one (bins, frames) matrix."""
    S = np.asarray(S, dtype=np.float64)
    n_bins, n_frames = S.shape
    fmin = max(fmin, 0.0)
    fmax = min(fmax, sr / 2.0)
    freqs = np.linspace(0, sr / 2, n_bins)
    tiny = float(np.finfo(np.float32).tiny)

    pitches = np.zeros_like(S)
    mags = np.zeros_like(S)
    for t in range(n_frames):
        col = S[:, t]
        r = col.max() if ref is None else ref
        thr = col * (col > threshold * r)
        for k in range(n_bins):
            # librosa util.localmax with edge padding: > prev, >= next
            prev = thr[k - 1] if k > 0 else thr[0]
            nxt = thr[k + 1] if k < n_bins - 1 else thr[n_bins - 1]
            if not (thr[k] > prev and thr[k] >= nxt):
                continue
            if not (fmin <= freqs[k] < fmax):
                continue
            if 0 < k < n_bins - 1:
                avg = 0.5 * (col[k + 1] - col[k - 1])
                curve = 2 * col[k] - col[k + 1] - col[k - 1]
                shift = avg / (curve + (1.0 if abs(curve) < tiny else 0.0))
                dskew = 0.5 * avg * shift
            else:
                shift = 0.0
                dskew = 0.0
            pitches[k, t] = (k + shift) * sr / n_fft
            mags[k, t] = col[k] + dskew
    return pitches, mags


@pytest.fixture(scope="module")
def tone_spec():
    t = np.arange(SR, dtype=np.float64) / SR
    y = (0.8 * np.sin(2 * np.pi * 440.0 * t)
         + 0.3 * np.sin(2 * np.pi * 1234.5 * t)).astype(np.float32)
    S = np.abs(np.asarray(stft(y, n_fft=N_FFT, hop_length=512)))
    return y, S


class TestPiptrackOracle:
    def test_matches_oracle_tone(self, tone_spec):
        _, S = tone_spec
        p, m = piptrack(S=S, sr=SR, n_fft=N_FFT)
        po, mo = _oracle_piptrack(S, SR, N_FFT)
        np.testing.assert_allclose(np.asarray(p), po, atol=2e-2)
        np.testing.assert_allclose(np.asarray(m), mo, atol=1e-4)

    def test_matches_oracle_random(self):
        rng = np.random.default_rng(0)
        S = rng.uniform(0, 1, size=(257, 16)).astype(np.float32)
        p, m = piptrack(S=S, sr=SR, n_fft=512, fmin=0.0, fmax=11025.0,
                        threshold=0.3)
        po, mo = _oracle_piptrack(S, SR, 512, fmin=0.0, fmax=11025.0,
                                  threshold=0.3)
        # identical peak SETS, then close values at the peaks
        np.testing.assert_array_equal(np.asarray(p) > 0, po > 0)
        np.testing.assert_allclose(np.asarray(p), po, atol=1e-2)
        np.testing.assert_allclose(np.asarray(m), mo, atol=1e-5)

    def test_scalar_ref(self):
        rng = np.random.default_rng(1)
        S = rng.uniform(0, 1, size=(129, 8)).astype(np.float32)
        p, m = piptrack(S=S, sr=SR, n_fft=256, threshold=0.5, ref=1.0,
                        fmin=0.0, fmax=11025.0)
        po, mo = _oracle_piptrack(S, SR, 256, threshold=0.5, ref=1.0,
                                  fmin=0.0, fmax=11025.0)
        np.testing.assert_array_equal(np.asarray(p) > 0, po > 0)
        np.testing.assert_allclose(np.asarray(m), mo, atol=1e-5)


class TestPiptrackPhysics:
    def test_pure_tone_frequency(self, tone_spec):
        y, _ = tone_spec
        p, m = piptrack(y=y, sr=SR, n_fft=N_FFT)
        p, m = np.asarray(p), np.asarray(m)
        # strongest detected pitch per frame should sit at ~440 Hz
        best = p[np.argmax(m, axis=0), np.arange(p.shape[1])]
        mid = best[4:-4]  # skip edge frames
        assert np.abs(np.median(mid) - 440.0) < 3.0

    def test_second_partial_found(self, tone_spec):
        y, _ = tone_spec
        p, _ = piptrack(y=y, sr=SR, n_fft=N_FFT)
        p = np.asarray(p)[:, 4:-4]
        found = p[p > 0]
        assert np.any(np.abs(found - 1234.5) < 5.0)

    def test_band_limits_respected(self, tone_spec):
        y, _ = tone_spec
        p, _ = piptrack(y=y, sr=SR, fmin=1000.0, fmax=2000.0)
        p = np.asarray(p)
        nz = p[p > 0]
        # peaks only at bins whose center frequency is inside [fmin, fmax);
        # parabolic refinement can nudge values slightly below fmin
        assert nz.size > 0
        assert nz.min() >= 1000.0 - SR / N_FFT
        assert nz.max() < 2000.0 + SR / N_FFT

    def test_batched_matches_single(self, tone_spec):
        y, _ = tone_spec
        yb = np.stack([y, np.roll(y, 1000)])
        pb, mb = piptrack(y=yb, sr=SR)
        p0, m0 = piptrack(y=y, sr=SR)
        assert pb.shape == (2,) + p0.shape
        np.testing.assert_allclose(np.asarray(pb)[0], np.asarray(p0),
                                   atol=1e-5)

    def test_threshold_suppresses_noise(self):
        rng = np.random.default_rng(2)
        t = np.arange(SR // 2) / SR
        y = (np.sin(2 * np.pi * 440 * t)
             + 0.01 * rng.standard_normal(len(t))).astype(np.float32)
        p_hi, _ = piptrack(y=y, sr=SR, threshold=0.9)
        p_lo, _ = piptrack(y=y, sr=SR, threshold=0.01)
        assert int((np.asarray(p_hi) > 0).sum()) < int((np.asarray(p_lo) > 0).sum())

    def test_errors(self):
        with pytest.raises(ValueError):
            piptrack()
        with pytest.raises(ValueError):
            piptrack(S=np.zeros((2, 3, 4, 5), np.float32))

    def test_user_S_infers_n_fft(self):
        # librosa infers n_fft = 2*(n_bins-1) from a provided S, ignoring
        # the n_fft argument: a 1 kHz tone passed as a 1024-FFT
        # spectrogram must NOT read as ~500 Hz under the default n_fft
        t = np.arange(SR) / SR
        y = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
        S = np.abs(np.asarray(
            __import__("mlx_audio_primitives_tpu").stft(
                y, n_fft=1024, hop_length=256)))
        p, m = piptrack(S=S, sr=SR, n_fft=2048)  # wrong n_fft on purpose
        p, m = np.asarray(p), np.asarray(m)
        voiced = p[p > 0]
        assert voiced.size
        med = float(np.median(voiced))
        assert abs(med - 1000.0) < 30.0

    def test_tiny_spectrogram(self):
        p, m = piptrack(S=np.ones((2, 4), np.float32), sr=SR, n_fft=2,
                        hop_length=1)
        assert np.asarray(p).shape == (2, 4)
        assert float(np.abs(np.asarray(p)).max()) == 0.0
