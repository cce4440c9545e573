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
