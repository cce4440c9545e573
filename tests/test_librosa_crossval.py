"""Cross-validation against ACTUAL librosa (SURVEY.md §4 pillar 1; reference
`tests/test_mel.py:74-237`, `test_features.py`, `test_mfcc.py`).

librosa is not installed in the build image, so every in-image run skips this
module cleanly; the `crossval` CI job (`.github/workflows/ci.yml`) pip-installs
librosa and runs it for real. This converts the ops whose only in-image oracles
are same-author transliterations (cqt, vqt, chroma_cens, tonnetz, pyin,
beat_track, tempo, onset family, piptrack, hpss, phase_vocoder, pcen,
reassigned_spectrogram, trim/split, decompose) into librosa-verified ops.

Tolerance philosophy: exact table math (windows, filterbanks, DCT) asserts
near-bit equality; f32 spectral pipelines assert ~1e-4 absolute against
librosa's f64; decision-style algorithms (beat/onset pickers) assert frame-set
agreement; our CQT family documents its own normalization contract
(`ops/cqt.py` module docstring), so its tests assert peak-bin identity and
column correlation rather than raw values.

NUMERICAL_ACCURACY.md rows marked "verified vs librosa" cite this module; the
tolerances asserted here are those published rows.
"""

import numpy as np
import pytest

librosa = pytest.importorskip("librosa")
import scipy.signal  # noqa: E402

import mlx_audio_primitives_tpu as ap  # noqa: E402

SR = 22050


def _np(x):
    return np.asarray(x)


@pytest.fixture(scope="module")
def noise():
    return np.random.default_rng(42).standard_normal(SR).astype(np.float32)


@pytest.fixture(scope="module")
def tone():
    t = np.arange(SR) / SR
    return np.sin(2 * np.pi * 440.0 * t).astype(np.float32)


@pytest.fixture(scope="module")
def chirp():
    t = np.linspace(0, 1, SR, endpoint=False)
    phase = 2 * np.pi * (100.0 * t + 0.5 * 900.0 * t**2)
    return np.sin(phase).astype(np.float32)


@pytest.fixture(scope="module")
def clicks():
    """Periodic click train at 120 BPM with noise floor — beat/onset fodder."""
    y = 0.01 * np.random.default_rng(3).standard_normal(4 * SR)
    period = int(SR * 60 / 120)
    for k in range(0, 4 * SR - 256, period):
        y[k : k + 256] += np.hanning(256) * np.sin(
            2 * np.pi * 1000 * np.arange(256) / SR
        )
    return y.astype(np.float32)


@pytest.fixture(scope="module")
def speechlike():
    """AM/FM tone + harmonics — voiced/unvoiced structure for pitch tests."""
    t = np.arange(2 * SR) / SR
    f0 = 180.0 + 40.0 * np.sin(2 * np.pi * 0.7 * t)
    phase = 2 * np.pi * np.cumsum(f0) / SR
    voiced = (
        np.sin(phase) + 0.4 * np.sin(2 * phase) + 0.2 * np.sin(3 * phase)
    )
    env = (np.sin(2 * np.pi * 1.3 * t) > -0.3).astype(np.float64)
    env = scipy.signal.fftconvolve(env, np.hanning(1024) / 512, "same")
    rng = np.random.default_rng(5)
    return (voiced * env + 0.02 * rng.standard_normal(len(t))).astype(
        np.float32
    )


# ---------------------------------------------------------------------------
# Core transforms
# ---------------------------------------------------------------------------


class TestSTFT:
    @pytest.mark.parametrize("n_fft,hop", [(512, 128), (1024, 256),
                                           (2048, 512), (2048, 441)])
    def test_stft(self, noise, n_fft, hop):
        ours = _np(ap.stft(noise, n_fft=n_fft, hop_length=hop))
        ref = librosa.stft(noise, n_fft=n_fft, hop_length=hop)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)

    @pytest.mark.parametrize("pad_mode", ["constant", "reflect", "edge"])
    def test_pad_modes(self, noise, pad_mode):
        ours = _np(ap.stft(noise, n_fft=1024, hop_length=256,
                           pad_mode=pad_mode))
        ref = librosa.stft(noise, n_fft=1024, hop_length=256,
                           pad_mode=pad_mode)
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)

    def test_uncentered_and_short_window(self, noise):
        ours = _np(ap.stft(noise, n_fft=1024, hop_length=256,
                           win_length=512, center=False))
        ref = librosa.stft(noise, n_fft=1024, hop_length=256,
                           win_length=512, center=False)
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)

    def test_istft_matches(self, noise):
        S = librosa.stft(noise, n_fft=2048, hop_length=512)
        ours = _np(ap.istft(S, hop_length=512, length=len(noise)))
        ref = librosa.istft(S, hop_length=512, length=len(noise))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_phase_vocoder(self, chirp):
        D = librosa.stft(chirp, n_fft=1024, hop_length=256)
        ours = _np(ap.phase_vocoder(D, rate=1.3, hop_length=256))
        ref = librosa.phase_vocoder(D, rate=1.3, hop_length=256)
        assert ours.shape == ref.shape
        # accumulated f32 phase drifts; compare magnitudes tight, field loose
        np.testing.assert_allclose(np.abs(ours), np.abs(ref),
                                   atol=1e-3, rtol=1e-3)
        err = np.linalg.norm(ours - ref) / np.linalg.norm(ref)
        assert err < 1e-2

    def test_griffinlim_quality(self, tone):
        S = np.abs(librosa.stft(tone, n_fft=1024, hop_length=256))
        ours = _np(ap.griffinlim(S, n_iter=32, hop_length=256))
        ref = librosa.griffinlim(S, n_iter=32, hop_length=256)

        def spec_err(y):
            R = np.abs(librosa.stft(y.astype(np.float32), n_fft=1024,
                                    hop_length=256))
            n = min(R.shape[1], S.shape[1])
            return np.linalg.norm(R[:, :n] - S[:, :n]) / np.linalg.norm(S)

        # random phase init differs by construction; assert comparable
        # spectral convergence instead of waveform equality
        assert spec_err(ours) < max(1.5 * spec_err(ref), 0.05)


class TestWindows:
    @pytest.mark.parametrize("name", ["hann", "hamming", "blackman",
                                      "bartlett", "boxcar"])
    @pytest.mark.parametrize("fftbins", [True, False])
    def test_get_window(self, name, fftbins):
        ours = _np(ap.get_window(name, 1024, fftbins=fftbins))
        ref = librosa.filters.get_window(name, 1024, fftbins=fftbins)
        np.testing.assert_allclose(ours, ref.astype(np.float32), atol=1e-7)


class TestMel:
    @pytest.mark.parametrize("htk", [False, True])
    @pytest.mark.parametrize("norm", ["slaney", None])
    def test_mel_filterbank(self, htk, norm):
        ours = _np(ap.mel_filterbank(SR, 2048, n_mels=128, htk=htk,
                                     norm=norm))
        ref = librosa.filters.mel(sr=SR, n_fft=2048, n_mels=128, htk=htk,
                                  norm=norm)
        np.testing.assert_allclose(ours, ref.astype(np.float32), atol=2e-7)

    def test_hz_mel_roundtrip(self):
        f = np.linspace(0, SR / 2, 101)
        np.testing.assert_allclose(_np(ap.hz_to_mel(f)),
                                   librosa.hz_to_mel(f), atol=1e-3,
                                   rtol=1e-5)
        m = np.linspace(0, 45, 91)
        np.testing.assert_allclose(_np(ap.mel_to_hz(m)),
                                   librosa.mel_to_hz(m), atol=1e-2,
                                   rtol=1e-5)

    def test_melspectrogram(self, noise):
        ours = _np(ap.melspectrogram(noise, sr=SR, n_fft=2048,
                                     hop_length=512))
        ref = librosa.feature.melspectrogram(y=noise, sr=SR, n_fft=2048,
                                             hop_length=512)
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)

    def test_db_conversions(self, noise):
        S = np.abs(librosa.stft(noise, n_fft=1024)) ** 2
        np.testing.assert_allclose(_np(ap.power_to_db(S)),
                                   librosa.power_to_db(S), atol=2e-4)
        np.testing.assert_allclose(
            _np(ap.amplitude_to_db(np.sqrt(S))),
            librosa.amplitude_to_db(np.sqrt(S)), atol=2e-4)

    def test_pcen(self, noise):
        S = librosa.feature.melspectrogram(y=noise, sr=SR).astype(
            np.float32)
        for kw in [dict(), dict(gain=0.8, bias=10.0, power=0.25),
                   dict(max_size=3), dict(max_size=4), dict(b=0.2)]:
            ours = _np(ap.pcen(S, sr=SR, **kw))
            ref = librosa.pcen(S, sr=SR, **kw)
            np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=2e-4)


class TestMFCC:
    def test_mfcc(self, noise):
        ours = _np(ap.mfcc(y=noise, sr=SR, n_mfcc=20))
        ref = librosa.feature.mfcc(y=noise, sr=SR, n_mfcc=20)
        np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-4)

    def test_mfcc_lifter(self, noise):
        ours = _np(ap.mfcc(y=noise, sr=SR, n_mfcc=13, lifter=22))
        ref = librosa.feature.mfcc(y=noise, sr=SR, n_mfcc=13, lifter=22)
        np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-4)

    def test_delta(self, noise):
        M = librosa.feature.mfcc(y=noise, sr=SR).astype(np.float32)
        for order in (1, 2):
            ours = _np(ap.delta(M, width=9, order=order))
            ref = librosa.feature.delta(M, width=9, order=order)
            np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)

    def test_mfcc_to_mel(self, noise):
        M = librosa.feature.mfcc(y=noise, sr=SR, n_mfcc=20).astype(
            np.float32)
        ours = _np(ap.mfcc_to_mel(M, n_mels=128))
        ref = librosa.feature.inverse.mfcc_to_mel(M, n_mels=128)
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)

    def test_mel_to_stft_quality(self, tone):
        M = librosa.feature.melspectrogram(y=tone, sr=SR).astype(np.float32)

        def resid(S):
            mel_fb = librosa.filters.mel(sr=SR, n_fft=2048)
            return np.linalg.norm(mel_fb @ (np.asarray(S) ** 2) - M)

        ours = resid(ap.mel_to_stft(M, sr=SR, n_fft=2048))
        ref = resid(librosa.feature.inverse.mel_to_stft(M, sr=SR,
                                                        n_fft=2048))
        # different NNLS solvers; ours must land within 2x of librosa's
        # reconstruction residual (plus an absolute floor for exact fits)
        assert ours <= 2.0 * ref + 1e-3 * np.linalg.norm(M)


# ---------------------------------------------------------------------------
# Spectral features / time domain
# ---------------------------------------------------------------------------


class TestFeatures:
    def test_centroid_bandwidth_flatness(self, noise):
        np.testing.assert_allclose(
            _np(ap.spectral_centroid(y=noise, sr=SR)),
            librosa.feature.spectral_centroid(y=noise, sr=SR),
            atol=1e-2, rtol=1e-4)
        np.testing.assert_allclose(
            _np(ap.spectral_bandwidth(y=noise, sr=SR)),
            librosa.feature.spectral_bandwidth(y=noise, sr=SR),
            atol=1e-2, rtol=1e-4)
        np.testing.assert_allclose(
            _np(ap.spectral_flatness(y=noise)),
            librosa.feature.spectral_flatness(y=noise),
            atol=1e-5, rtol=1e-3)

    def test_rolloff(self, noise):
        for pct in (0.85, 0.5):
            np.testing.assert_allclose(
                _np(ap.spectral_rolloff(y=noise, sr=SR, roll_percent=pct)),
                librosa.feature.spectral_rolloff(y=noise, sr=SR,
                                                 roll_percent=pct),
                atol=SR / 2048 + 1e-3)

    def test_contrast(self, noise):
        ours = _np(ap.spectral_contrast(y=noise, sr=SR))
        ref = librosa.feature.spectral_contrast(y=noise, sr=SR)
        np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)

    def test_rms_zcr(self, noise):
        np.testing.assert_allclose(_np(ap.rms(noise)),
                                   librosa.feature.rms(y=noise), atol=1e-5)
        np.testing.assert_allclose(
            _np(ap.zero_crossing_rate(noise)),
            librosa.feature.zero_crossing_rate(noise), atol=1e-5)

    def test_poly_features(self, noise):
        ours = _np(ap.poly_features(y=noise, sr=SR, order=2))
        ref = librosa.feature.poly_features(y=noise, sr=SR, order=2)
        np.testing.assert_allclose(ours, ref, atol=1e-2, rtol=1e-2)

    def test_stack_memory_sync(self, noise):
        M = librosa.feature.mfcc(y=noise, sr=SR).astype(np.float32)
        np.testing.assert_allclose(
            _np(ap.stack_memory(M, n_steps=3, delay=2)),
            librosa.util.stack_memory(M, n_steps=3, delay=2), atol=1e-6)
        idx = [5, 10, 10, 30]
        np.testing.assert_allclose(
            _np(ap.sync(M, idx)), librosa.util.sync(M, idx), atol=1e-4)

    def test_preemphasis_deemphasis(self, noise):
        np.testing.assert_allclose(
            _np(ap.preemphasis(noise, coef=0.97)),
            librosa.effects.preemphasis(noise, coef=0.97), atol=1e-6)
        np.testing.assert_allclose(
            _np(ap.deemphasis(noise, coef=0.97)),
            librosa.effects.deemphasis(noise, coef=0.97), atol=1e-4)

    def test_interp_harmonics_salience(self, tone):
        S = np.abs(librosa.stft(tone, n_fft=1024)).astype(np.float32)
        freqs = librosa.fft_frequencies(sr=SR, n_fft=1024)
        h = [1, 2, 3]
        np.testing.assert_allclose(
            _np(ap.interp_harmonics(S, freqs, harmonics=h)),
            librosa.interp_harmonics(S, freqs=freqs, harmonics=h),
            atol=1e-4, rtol=1e-3)
        ours = _np(ap.salience(S, freqs, harmonics=h, fill_value=0.0))
        ref = librosa.salience(S, freqs=freqs, harmonics=h, fill_value=0.0)
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)


class TestEffects:
    def test_hpss(self, clicks):
        S = np.abs(librosa.stft(clicks[: 2 * SR], n_fft=1024,
                                hop_length=256)).astype(np.float32)
        for kw in [dict(), dict(margin=2.0), dict(mask=True),
                   dict(kernel_size=(17, 31))]:
            H, P = ap.hpss(S, **kw)
            Hr, Pr = librosa.decompose.hpss(S, **kw)
            np.testing.assert_allclose(_np(H), Hr, atol=1e-4, rtol=1e-3)
            np.testing.assert_allclose(_np(P), Pr, atol=1e-4, rtol=1e-3)

    def test_trim_split(self, speechlike):
        yt, idx = ap.trim(speechlike, top_db=30)
        yt_ref, idx_ref = librosa.effects.trim(speechlike, top_db=30)
        np.testing.assert_array_equal(np.asarray(idx), idx_ref)
        ours = _np(ap.split(speechlike, top_db=30))
        ref = librosa.effects.split(speechlike, top_db=30)
        np.testing.assert_array_equal(ours, ref)

    def test_mu_law(self, noise):
        x = np.clip(noise, -1, 1)
        ours = _np(ap.mu_compress(x))
        ref = librosa.mu_compress(x, mu=255, quantize=True)
        # f32-vs-f64 companding can land exactly on a bin edge; allow <=1%
        # of samples to sit one code off
        diff = np.abs(ours - ref)
        assert diff.max() <= 1
        assert (diff > 0).mean() < 0.01
        np.testing.assert_allclose(
            _np(ap.mu_expand(ref.astype(np.int32))),
            librosa.mu_expand(ref, mu=255, quantize=True), atol=1e-4)

    def test_lpc(self, speechlike):
        y = speechlike[:4096]
        ours = _np(ap.lpc(y, order=16))
        ref = librosa.lpc(y, order=16)
        np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)


class TestResample:
    @pytest.mark.parametrize("target", [16000, 8000, 44100])
    def test_fft(self, noise, target):
        ours = _np(ap.resample(noise, SR, target, res_type="fft"))
        ref = librosa.resample(noise, orig_sr=SR, target_sr=target,
                               res_type="fft")
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-4)

    def test_polyphase(self, noise):
        ours = _np(ap.resample(noise, SR, 16000, res_type="polyphase"))
        ref = librosa.resample(noise, orig_sr=SR, target_sr=16000,
                               res_type="polyphase")
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-4)

    @pytest.mark.parametrize("res_type", ["kaiser_best", "kaiser_fast"])
    def test_kaiser(self, noise, res_type):
        pytest.importorskip("resampy")
        ours = _np(ap.resample(noise, SR, 16000, res_type=res_type))
        ref = librosa.resample(noise, orig_sr=SR, target_sr=16000,
                               res_type=res_type)
        assert ours.shape == ref.shape
        # resampy's table-interpolated kernel vs our direct polyphase FIR
        # of the same design: identical passband, small kernel diff at edges
        err = np.linalg.norm(ours - ref) / np.linalg.norm(ref)
        assert err < 5e-3


# ---------------------------------------------------------------------------
# Pitch
# ---------------------------------------------------------------------------


class TestPitch:
    def test_yin_tone(self, tone):
        ours = _np(ap.yin(tone, fmin=80, fmax=1000, sr=SR))
        ref = librosa.yin(tone, fmin=80, fmax=1000, sr=SR)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, rtol=2e-3)

    def test_yin_speech(self, speechlike):
        ours = _np(ap.yin(speechlike, fmin=80, fmax=600, sr=SR))
        ref = librosa.yin(speechlike, fmin=80, fmax=600, sr=SR)
        # occasional octave flips on noisy frames; medians must agree
        agree = np.abs(ours - ref) / ref < 0.02
        assert agree.mean() > 0.9

    def test_pyin(self, speechlike):
        f0, vflag, vprob = ap.pyin(speechlike, fmin=80, fmax=600, sr=SR)
        f0r, vflagr, vprobr = librosa.pyin(speechlike, fmin=80, fmax=600,
                                           sr=SR)
        f0, vflag, vprob = _np(f0), _np(vflag), _np(vprob)
        assert f0.shape == f0r.shape
        # voicing decision agreement (F1-style)
        agree = (vflag == vflagr).mean()
        assert agree > 0.85
        both = vflag & vflagr
        if both.any():
            rmse = np.sqrt(np.nanmean((f0[both] - f0r[both]) ** 2))
            assert rmse < 5.0  # Hz, on voiced-agreed frames
        np.testing.assert_allclose(vprob, vprobr, atol=0.15)

    def test_piptrack(self, tone):
        p, m = ap.piptrack(y=tone, sr=SR)
        pr, mr = librosa.piptrack(y=tone, sr=SR)
        p, m = _np(p), _np(m)
        # dominant pitch per frame must agree within a parabolic-interp hair
        ours_best = p[np.argmax(m, axis=0), np.arange(p.shape[1])]
        ref_best = pr[np.argmax(mr, axis=0), np.arange(pr.shape[1])]
        sel = (ours_best > 0) & (ref_best > 0)
        assert sel.mean() > 0.9
        np.testing.assert_allclose(ours_best[sel], ref_best[sel], rtol=5e-3)

    def test_estimate_tuning(self):
        t = np.arange(SR) / SR
        detuned = np.sin(2 * np.pi * 440 * 2 ** (0.3 / 12) * t).astype(
            np.float32)
        ours = ap.estimate_tuning(y=detuned, sr=SR)
        ref = librosa.estimate_tuning(y=detuned, sr=SR)
        assert abs(float(ours) - float(ref)) < 0.05


# ---------------------------------------------------------------------------
# Rhythm / onsets
# ---------------------------------------------------------------------------


class TestRhythm:
    def test_onset_strength(self, clicks):
        ours = _np(ap.onset_strength(clicks, sr=SR))
        ref = librosa.onset.onset_strength(y=clicks, sr=SR)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)

    def test_onset_detect_and_backtrack(self, clicks):
        env = librosa.onset.onset_strength(y=clicks, sr=SR).astype(
            np.float32)
        ours = _np(ap.onset_detect(onset_envelope=env, sr=SR))
        ref = librosa.onset.onset_detect(onset_envelope=env, sr=SR)
        # identical envelope -> identical peak picking
        np.testing.assert_array_equal(ours, ref)
        rms = librosa.feature.rms(y=clicks)[0].astype(np.float32)
        np.testing.assert_array_equal(
            _np(ap.onset_backtrack(ref, rms)),
            librosa.onset.onset_backtrack(ref, rms))

    def test_tempogram(self, clicks):
        ours = _np(ap.tempogram(y=clicks, sr=SR))
        ref = librosa.feature.tempogram(y=clicks, sr=SR)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=5e-3)

    def test_fourier_tempogram(self, clicks):
        ours = _np(np.abs(ap.fourier_tempogram(y=clicks, sr=SR)))
        ref = np.abs(librosa.feature.fourier_tempogram(y=clicks, sr=SR))
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=5e-3, rtol=1e-2)

    def test_tempo(self, clicks):
        ours = float(np.atleast_1d(_np(ap.tempo(y=clicks, sr=SR)))[0])
        ref = float(np.atleast_1d(
            librosa.feature.tempo(y=clicks, sr=SR))[0])
        assert abs(ours - ref) / ref < 0.02

    def test_beat_track(self, clicks):
        tempo_ours, beats_ours = ap.beat_track(y=clicks, sr=SR)
        tempo_ref, beats_ref = librosa.beat.beat_track(y=clicks, sr=SR)
        tempo_ours = float(np.atleast_1d(_np(tempo_ours))[0])
        tempo_ref = float(np.atleast_1d(tempo_ref)[0])
        assert abs(tempo_ours - tempo_ref) / tempo_ref < 0.05
        beats_ours = np.asarray(beats_ours)
        # each of our beats lands within 1 frame of a librosa beat
        dist = np.abs(beats_ours[:, None] - np.asarray(beats_ref)[None, :])
        assert (dist.min(axis=1) <= 1).mean() > 0.9


# ---------------------------------------------------------------------------
# CQT family (documented normalization contract != librosa's; see ops/cqt.py)
# ---------------------------------------------------------------------------


def _colnorm(X, eps=1e-10):
    X = np.abs(np.asarray(X, dtype=np.float64))
    return X / np.maximum(X.max(axis=0, keepdims=True), eps)


class TestCQTFamily:
    def test_cqt_peak_bins_and_shape(self, tone):
        C = _np(np.abs(ap.cqt(tone, sr=SR)))
        Cr = np.abs(librosa.cqt(tone, sr=SR))
        assert C.shape == Cr.shape
        mid = slice(C.shape[1] // 4, 3 * C.shape[1] // 4)
        # 440 Hz = bin 57 from C1 at 12 bins/octave — both peak there
        assert np.argmax(C[:, mid].mean(axis=1)) == np.argmax(
            Cr[:, mid].mean(axis=1))

    def test_cqt_column_correlation(self, chirp):
        C = _colnorm(ap.cqt(chirp, sr=SR))
        Cr = _colnorm(librosa.cqt(chirp, sr=SR))
        n = min(C.shape[1], Cr.shape[1])
        mid = slice(n // 4, 3 * n // 4)
        corr = [np.corrcoef(C[:, j], Cr[:, j])[0, 1]
                for j in range(*mid.indices(n))]
        assert np.median(corr) > 0.95

    def test_chroma_stft(self, chirp):
        ours = _np(ap.chroma_stft(y=chirp, sr=SR, tuning=0.0))
        ref = librosa.feature.chroma_stft(y=chirp, sr=SR, tuning=0.0)
        np.testing.assert_allclose(ours, ref, atol=2e-4)

    def test_chroma_cqt_agreement(self, chirp):
        ours = _np(ap.chroma_cqt(chirp, sr=SR))
        ref = librosa.feature.chroma_cqt(y=chirp, sr=SR)
        n = min(ours.shape[1], ref.shape[1])
        mid = slice(n // 4, 3 * n // 4)
        # norm-normalized chroma: dominant pitch class must agree
        agree = (np.argmax(ours[:, mid], axis=0)
                 == np.argmax(ref[:, mid], axis=0)).mean()
        assert agree > 0.85

    def test_chroma_cens_agreement(self, chirp):
        ours = _np(ap.chroma_cens(y=chirp, sr=SR))
        ref = librosa.feature.chroma_cens(y=chirp, sr=SR)
        n = min(ours.shape[1], ref.shape[1])
        mid = slice(n // 4, 3 * n // 4)
        agree = (np.argmax(ours[:, mid], axis=0)
                 == np.argmax(ref[:, mid], axis=0)).mean()
        assert agree > 0.85

    def test_tonnetz_from_same_chroma(self, chirp):
        # isolate the tonnetz projection itself from the cqt frontend
        chroma = librosa.feature.chroma_cqt(y=chirp, sr=SR).astype(
            np.float32)
        ours = _np(ap.tonnetz(chroma=chroma, sr=SR))
        ref = librosa.feature.tonnetz(chroma=chroma, sr=SR)
        np.testing.assert_allclose(ours, ref, atol=1e-4)


class TestReassigned:
    def test_reassigned_spectrogram(self, chirp):
        f, t, m = ap.reassigned_spectrogram(chirp, sr=SR, n_fft=1024)
        fr, tr, mr = librosa.reassigned_spectrogram(chirp, sr=SR,
                                                    n_fft=1024)
        f, t, m = _np(f), _np(t), _np(m)
        np.testing.assert_allclose(m, mr, atol=1e-4, rtol=1e-3)
        sel = mr > mr.max() * 1e-2
        assert np.nanmedian(np.abs(f[sel] - fr[sel])) < 1.0  # Hz
        assert np.nanmedian(np.abs(t[sel] - tr[sel])) < 1e-3  # s


class TestSegment:
    def test_recurrence_matrix(self, noise):
        M = librosa.feature.mfcc(y=noise, sr=SR).astype(np.float32)
        ours = _np(ap.recurrence_matrix(M, k=5, width=3, sym=True))
        ref = librosa.segment.recurrence_matrix(M, k=5, width=3, sym=True)
        agree = (ours.astype(bool) == np.asarray(ref).astype(bool)).mean()
        assert agree > 0.99  # kNN boundary ties may differ


class TestDecompose:
    def test_nmf_reconstruction_quality(self, clicks):
        S = np.abs(librosa.stft(clicks[:SR], n_fft=512)).astype(np.float32)

        def resid(W, H):
            return (np.linalg.norm(np.asarray(W) @ np.asarray(H) - S)
                    / np.linalg.norm(S))

        W, H = ap.decompose(S, n_components=8)
        comps, acts = librosa.decompose.decompose(S, n_components=8,
                                                  random_state=0)
        # NMF factorizations are non-unique; both must explain S comparably
        assert resid(W, H) < 1.5 * resid(comps, acts) + 0.05
