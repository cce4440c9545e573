"""Phase vocoder / time_stretch / pitch_shift (`ops/effects.py`).

Oracles: a float64 sequential-loop transcription of the published phase
vocoder algorithm (structurally unlike the library's vectorized cumsum
formulation), plus algorithm-independent signal properties (durations,
dominant-frequency tracking, rate=1 identity).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mlx_audio_primitives_tpu import istft, phase_vocoder, pitch_shift, stft, time_stretch


def _phase_vocoder_loop(D: np.ndarray, rate: float, hop_length: int) -> np.ndarray:
    """Sequential float64 reference: the textbook accumulator loop
    (librosa.phase_vocoder semantics)."""
    n_bins, n_frames = D.shape
    time_steps = np.arange(0, n_frames, rate)
    phi_advance = np.linspace(0, np.pi * hop_length, n_bins)
    out = np.zeros((n_bins, len(time_steps)), dtype=np.complex128)
    phase_acc = np.angle(D[:, 0]).astype(np.float64)
    Dp = np.pad(D, [(0, 0), (0, 2)])
    for t, step in enumerate(time_steps):
        i = int(step)
        cols = Dp[:, i:i + 2]
        alpha = np.mod(step, 1.0)
        mag = (1.0 - alpha) * np.abs(cols[:, 0]) + alpha * np.abs(cols[:, 1])
        out[:, t] = mag * np.exp(1j * phase_acc)
        dphase = np.angle(cols[:, 1]) - np.angle(cols[:, 0]) - phi_advance
        dphase -= 2.0 * np.pi * np.round(dphase / (2.0 * np.pi))
        phase_acc += phi_advance + dphase
    return out


def _dominant_freq(y: np.ndarray, sr: int) -> float:
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    return float(np.fft.rfftfreq(len(y), 1.0 / sr)[np.argmax(spec)])


class TestPhaseVocoder:
    @pytest.mark.parametrize("rate", [0.7, 1.3, 2.0])
    def test_matches_sequential_reference(self, random_signal, rate):
        n_fft, hop = 512, 128
        D = np.asarray(stft(random_signal[:8192], n_fft=n_fft, hop_length=hop))
        ours = np.asarray(phase_vocoder(D, rate, hop_length=hop))
        ref = _phase_vocoder_loop(D, rate, hop)
        assert ours.shape == ref.shape
        # phases ride a prefix sum: compare complex values, scaled tolerance
        assert np.max(np.abs(ours - ref)) < 1e-3 * np.abs(ref).max()

    def test_rate_one_is_identity(self, random_signal):
        n_fft, hop = 1024, 256
        D = np.asarray(stft(random_signal, n_fft=n_fft, hop_length=hop))
        out = np.asarray(phase_vocoder(D, 1.0, hop_length=hop))
        assert out.shape == D.shape
        assert np.max(np.abs(out - D)) < 1e-3 * np.abs(D).max()

    def test_output_frame_count(self):
        D = np.zeros((257, 100), dtype=np.complex64)
        for rate in (0.5, 1.25, 3.0):
            out = phase_vocoder(D, rate, hop_length=128)
            assert out.shape == (257, len(np.arange(0, 100, rate)))

    def test_batched_matches_single(self, batch_signals):
        n_fft, hop = 512, 128
        D = np.asarray(stft(batch_signals[:, :8192], n_fft=n_fft, hop_length=hop))
        out_b = np.asarray(phase_vocoder(D, 1.5, hop_length=hop))
        for b in range(D.shape[0]):
            out_1 = np.asarray(phase_vocoder(D[b], 1.5, hop_length=hop))
            np.testing.assert_allclose(out_b[b], out_1, rtol=0, atol=1e-5)

    def test_magnitude_interpolation(self):
        # two constant-magnitude frames: any fractional step interpolates
        rng = np.random.default_rng(0)
        D = (rng.standard_normal((129, 8)) + 1j * rng.standard_normal((129, 8))).astype(
            np.complex64
        )
        out = np.asarray(phase_vocoder(D, 0.5, hop_length=64))
        # integer steps reproduce the input magnitudes exactly
        np.testing.assert_allclose(
            np.abs(out[:, ::2]), np.abs(D), rtol=2e-5, atol=1e-6
        )

    def test_validation(self):
        D = np.zeros((5, 5), dtype=np.complex64)
        with pytest.raises(ValueError):
            phase_vocoder(D, 0.0)
        with pytest.raises(ValueError):
            phase_vocoder(np.zeros((2, 3, 4, 5), dtype=np.complex64), 1.5)


class TestTimeStretch:
    @pytest.mark.parametrize("rate", [0.5, 0.9, 1.5, 2.0])
    def test_output_length(self, random_signal, rate):
        out = time_stretch(random_signal, rate)
        assert out.shape == (int(round(len(random_signal) / rate)),)

    @pytest.mark.parametrize("rate", [0.5, 2.0])
    def test_tone_keeps_frequency(self, sine_signal, sr, rate):
        out = np.asarray(time_stretch(sine_signal, rate))
        # analyze the interior (edges taper)
        seg = out[len(out) // 4: 3 * len(out) // 4]
        f = _dominant_freq(seg, sr)
        assert abs(f - 440.0) < 10.0, f

    def test_energy_is_preserved_roughly(self, sine_signal):
        out = np.asarray(time_stretch(sine_signal, 1.0))
        # rate=1: stft->istft round trip
        np.testing.assert_allclose(out, sine_signal, atol=1e-4)

    def test_batched(self, batch_signals):
        out = time_stretch(batch_signals, 1.5)
        assert out.shape == (4, int(round(batch_signals.shape[1] / 1.5)))


class TestPitchShift:
    @pytest.mark.parametrize("n_steps,factor", [(12, 2.0), (-12, 0.5), (7, 2 ** (7 / 12))])
    def test_tone_shifts_frequency(self, sine_signal, sr, n_steps, factor):
        out = np.asarray(pitch_shift(sine_signal, sr, n_steps))
        assert out.shape == sine_signal.shape
        seg = out[len(out) // 4: 3 * len(out) // 4]
        f = _dominant_freq(seg, sr)
        assert abs(f - 440.0 * factor) < 0.03 * 440.0 * factor, f

    def test_zero_steps_identity(self, random_signal, sr):
        out = np.asarray(pitch_shift(random_signal, sr, 0))
        np.testing.assert_allclose(out, random_signal, atol=0)

    def test_fractional_steps(self, sine_signal, sr):
        out = np.asarray(pitch_shift(sine_signal, sr, 2.5))
        f = _dominant_freq(out[len(out) // 4: 3 * len(out) // 4], sr)
        expected = 440.0 * 2 ** (2.5 / 12)
        assert abs(f - expected) < 0.03 * expected, f

    def test_batched(self, batch_signals, sr):
        out = pitch_shift(batch_signals, sr, 3)
        assert out.shape == batch_signals.shape

    def test_roundtrip_correlates(self, sine_signal, sr):
        # +5 then -5 semitones lands near the original tone
        up = pitch_shift(sine_signal, sr, 5)
        back = np.asarray(pitch_shift(up, sr, -5))
        f = _dominant_freq(back[len(back) // 4: 3 * len(back) // 4], sr)
        assert abs(f - 440.0) < 10.0, f


class TestPipelineConsistency:
    def test_stretch_istft_equivalence(self, random_signal):
        """time_stretch == manual stft -> phase_vocoder -> istft."""
        rate, n_fft, hop = 1.5, 2048, 512
        D = stft(random_signal, n_fft=n_fft, hop_length=hop)
        Dv = phase_vocoder(D, rate, hop_length=hop)
        manual = np.asarray(
            istft(Dv, hop_length=hop, n_fft=n_fft,
                  length=int(round(len(random_signal) / rate)))
        )
        ours = np.asarray(time_stretch(random_signal, rate))
        np.testing.assert_allclose(ours, manual, rtol=0, atol=1e-6)


class TestTrimSplit:
    @staticmethod
    def _clip():
        sr = 22050
        rng = np.random.default_rng(0)
        sig = 0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)
        quiet = 1e-5 * rng.standard_normal(sr // 2)
        return np.concatenate([quiet, sig, quiet]).astype(np.float32), sr

    def test_trim_removes_silence(self):
        from mlx_audio_primitives_tpu import trim

        y, sr = self._clip()
        yt, idx = trim(y, top_db=30)
        start, end = int(idx[0]), int(idx[1])
        # the loud region spans [sr//2, sr//2 + sr); trim must land within
        # one frame of it
        assert abs(start - sr // 2) <= 2048
        assert abs(end - (sr // 2 + sr)) <= 2048
        assert yt.shape[-1] == end - start
        np.testing.assert_array_equal(np.asarray(yt), y[start:end])

    def test_trim_all_silent(self):
        from mlx_audio_primitives_tpu import trim

        y = np.zeros(4096, np.float32)
        yt, idx = trim(y, ref=1.0, top_db=20)
        assert yt.shape[-1] == 0
        np.testing.assert_array_equal(idx, [0, 0])

    def test_trim_all_loud(self):
        from mlx_audio_primitives_tpu import trim

        y = np.sin(np.linspace(0, 800 * np.pi, 22050)).astype(np.float32)
        yt, idx = trim(y, top_db=60)
        assert int(idx[0]) == 0 and int(idx[1]) == len(y)
        assert yt.shape[-1] == len(y)

    def test_trim_batched_aggregates(self):
        from mlx_audio_primitives_tpu import trim

        y, sr = self._clip()
        Y = np.stack([y, np.zeros_like(y)])
        yt, idx = trim(Y, top_db=30)
        # the aggregated mask follows the loud channel
        assert yt.shape == (2, int(idx[1]) - int(idx[0]))

    def test_split_finds_islands(self):
        from mlx_audio_primitives_tpu import split

        sr = 22050
        t = np.arange(sr // 2) / sr
        burst = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        gap = np.zeros(sr // 2, np.float32)
        y = np.concatenate([gap, burst, gap, burst, gap])
        iv = split(y, ref=1.0, top_db=40)
        assert iv.shape == (2, 2)
        # island k spans [ (2k+1)*sr/2, (2k+2)*sr/2 ) within a frame
        for k in range(2):
            assert abs(int(iv[k, 0]) - (2 * k + 1) * sr // 2) <= 2048
            assert abs(int(iv[k, 1]) - (2 * k + 2) * sr // 2) <= 2048

    def test_split_silent_returns_empty(self):
        from mlx_audio_primitives_tpu import split

        iv = split(np.zeros(8192, np.float32), ref=1.0, top_db=20)
        assert iv.shape == (0, 2)

    def test_split_intervals_cover_signal_energy(self):
        from mlx_audio_primitives_tpu import split

        y, sr = self._clip()
        iv = split(y, top_db=30)
        inside = sum(float(np.sum(y[a:b] ** 2)) for a, b in iv)
        total = float(np.sum(y**2))
        assert inside >= 0.999 * total

    def test_errors(self):
        from mlx_audio_primitives_tpu import split, trim

        with pytest.raises(ValueError):
            trim(np.zeros(100, np.float32), top_db=0)
        with pytest.raises(ValueError):
            split(np.zeros(100, np.float32), frame_length=0)


class TestRemix:
    def test_reorders_intervals(self):
        from mlx_audio_primitives_tpu import remix

        y = np.arange(100, dtype=np.float32)
        out = np.asarray(remix(y, [[50, 60], [0, 10]], align_zeros=False))
        np.testing.assert_array_equal(out, np.r_[y[50:60], y[0:10]])

    def test_align_zeros_snaps(self):
        from mlx_audio_primitives_tpu import remix

        t = np.arange(22050) / 22050
        y = np.sin(2 * np.pi * 100 * t).astype(np.float32)
        out = np.asarray(remix(y, [[1000, 5000]], align_zeros=True))
        # boundaries land at zero crossings: first/last samples near zero
        assert abs(out[0]) < 0.05 and abs(out[-1]) < 0.05

    def test_split_remix_roundtrip(self):
        from mlx_audio_primitives_tpu import remix, split

        sr = 22050
        t = np.arange(sr // 2) / sr
        burst = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        gap = np.zeros(sr // 2, np.float32)
        y = np.concatenate([gap, burst, gap, burst, gap])
        iv = split(y, ref=1.0, top_db=40)
        out = np.asarray(remix(y, iv, align_zeros=False))
        # the remix keeps essentially all the energy in half the samples
        assert out.shape[-1] < 0.6 * len(y)
        assert np.sum(out**2) > 0.99 * np.sum(y**2)

    def test_errors(self):
        from mlx_audio_primitives_tpu import remix

        with pytest.raises(ValueError):
            remix(np.ones(10, np.float32), [[0, 5, 7]])
        with pytest.raises(ValueError):
            remix(np.ones(10, np.float32), [[0, 99]])
