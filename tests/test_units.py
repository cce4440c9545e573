"""Unit-converter tests (librosa.core.convert semantics)."""

import numpy as np
import pytest

from mlx_audio_primitives_tpu.ops import units as u


class TestTimeAxes:
    def test_frames_samples_roundtrip(self):
        f = np.arange(50)
        s = u.frames_to_samples(f, hop_length=512)
        np.testing.assert_array_equal(s, f * 512)
        np.testing.assert_array_equal(u.samples_to_frames(s, 512), f)

    def test_nfft_offset(self):
        assert u.frames_to_samples(0, 512, n_fft=2048) == 1024
        assert u.samples_to_frames(1024, 512, n_fft=2048) == 0

    def test_time_roundtrip(self):
        t = u.frames_to_time(np.arange(10), sr=22050, hop_length=512)
        back = u.time_to_frames(t, sr=22050, hop_length=512)
        np.testing.assert_array_equal(back, np.arange(10))

    def test_samples_time(self):
        assert u.samples_to_time(22050, 22050) == 1.0
        assert u.time_to_samples(1.0, 22050) == 22050


class TestFrequencyAxes:
    def test_fft_frequencies(self):
        f = u.fft_frequencies(22050, 2048)
        assert f.shape == (1025,)
        assert f[0] == 0.0 and f[-1] == 11025.0
        np.testing.assert_allclose(np.diff(f), 22050 / 2048, rtol=1e-12)

    def test_mel_frequencies_monotone_range(self):
        f = u.mel_frequencies(40, fmin=0.0, fmax=8000.0)
        assert f.shape == (40,)
        assert f[0] == 0.0
        np.testing.assert_allclose(f[-1], 8000.0, rtol=1e-10)
        assert np.all(np.diff(f) > 0)

    def test_mel_frequencies_match_filterbank_grid(self):
        # the mel filterbank's peaks sit on this grid (librosa contract):
        # fdiff construction uses mel_frequencies(n_mels + 2)
        from mlx_audio_primitives_tpu import mel_filterbank

        freqs = u.mel_frequencies(130, 0.0, 11025.0)
        fb = np.asarray(mel_filterbank(22050, 4096, n_mels=128))
        grid = u.fft_frequencies(22050, 4096)
        peaks = grid[np.argmax(fb, axis=1)]
        np.testing.assert_allclose(peaks, freqs[1:-1], atol=6.0)

    def test_fourier_tempo_frequencies(self):
        f = u.fourier_tempo_frequencies(22050, 384, 512)
        assert f.shape == (193,)
        assert f[0] == 0.0
        np.testing.assert_allclose(f[-1], 22050 * 30.0 / 512, rtol=1e-12)


class TestNotes:
    @pytest.mark.parametrize(
        "note,midi",
        [("A4", 69), ("C4", 60), ("C#4", 61), ("Bb4", 70), ("B!4", 70),
         ("A-1", 9), ("G9", 127), ("C", 12), ("f2", 41)],
    )
    def test_note_to_midi(self, note, midi):
        assert u.note_to_midi(note) == midi

    def test_cents_and_round(self):
        assert u.note_to_midi("A4+50") == 70  # rounds half up
        np.testing.assert_allclose(u.note_to_midi("A4+25", round_midi=False),
                                   69.25)

    def test_note_to_hz(self):
        np.testing.assert_allclose(u.note_to_hz("A4"), 440.0)
        np.testing.assert_allclose(u.note_to_hz("A5"), 880.0)
        np.testing.assert_allclose(u.note_to_hz("C4"), 261.6256, rtol=1e-5)

    def test_hz_to_note_roundtrip(self):
        for note in ("C2", "E3", "G7", "A4"):
            assert u.hz_to_note(u.note_to_hz(note), unicode=False) == note

    def test_midi_to_note_spellings(self):
        assert u.midi_to_note(61, unicode=False) == "C#4"
        assert u.midi_to_note(61) == "C♯4"
        assert u.midi_to_note(60, octave=False) == "C"
        assert u.midi_to_note(60.3, cents=True) == "C4+30"

    def test_array_input(self):
        midis = u.note_to_midi(["C4", "E4", "G4"])
        np.testing.assert_array_equal(midis, [60, 64, 67])
        names = u.midi_to_note(np.array([60, 64]), unicode=False)
        assert list(names) == ["C4", "E4"]

    def test_hz_midi_roundtrip(self):
        f = np.array([55.0, 440.0, 1234.5])
        np.testing.assert_allclose(u.midi_to_hz(u.hz_to_midi(f)), f,
                                   rtol=1e-12)

    def test_bad_note(self):
        with pytest.raises(ValueError):
            u.note_to_midi("H4")
        with pytest.raises(ValueError):
            u.note_to_midi("C##x")


class TestWeighting:
    def test_iec_anchor_points(self):
        """Published IEC 61672 table values (dB, tolerance 0.2 dB)."""
        anchors_a = {31.5: -39.4, 100.0: -19.1, 1000.0: 0.0, 4000.0: 1.0,
                     16000.0: -6.6}
        for f, db in anchors_a.items():
            np.testing.assert_allclose(u.A_weighting(f), db, atol=0.2)
        np.testing.assert_allclose(u.C_weighting(1000.0), 0.0, atol=0.05)
        np.testing.assert_allclose(u.C_weighting(31.5), -3.0, atol=0.1)
        np.testing.assert_allclose(u.B_weighting(1000.0), 0.0, atol=0.05)
        np.testing.assert_allclose(u.D_weighting(1000.0), 0.0, atol=0.05)

    def test_min_db_clamp(self):
        assert u.A_weighting(1.0) == -80.0
        assert u.A_weighting(1.0, min_db=None) < -80.0

    def test_dispatch_and_z(self):
        f = np.array([100.0, 1000.0])
        np.testing.assert_array_equal(u.frequency_weighting(f, "A"),
                                      u.A_weighting(f))
        np.testing.assert_array_equal(u.frequency_weighting(f, "Z"), 0.0)
        with pytest.raises(ValueError):
            u.frequency_weighting(f, "Q")

    def test_perceptual_weighting(self):
        from mlx_audio_primitives_tpu import perceptual_weighting, power_to_db

        rng = np.random.default_rng(0)
        S = rng.uniform(0.1, 1, (1025, 8)).astype(np.float32)
        freqs = u.fft_frequencies(22050, 2048)
        out = np.asarray(perceptual_weighting(S, freqs, top_db=None))
        ref = (np.atleast_1d(u.A_weighting(freqs))[:, None]
               + np.asarray(power_to_db(S, top_db=None)))
        np.testing.assert_allclose(out, ref, atol=2e-5)
        with pytest.raises(ValueError):
            perceptual_weighting(S, freqs[:10])
