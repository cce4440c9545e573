"""Streaming STFT/ISTFT/log-mel tests (ops/streaming.py).

Alignment contract: a stream primed with silence equals the offline
center=False transform of the signal pre-padded with ``n_fft - hop`` zeros.
"""

import numpy as np
import pytest

from mlx_audio_primitives_tpu import melspectrogram, power_to_db, stft
from mlx_audio_primitives_tpu.ops.streaming import (
    StreamingISTFT,
    StreamingLogMel,
    StreamingSTFT,
)

N_FFT, HOP = 512, 128
PAD = N_FFT - HOP


@pytest.fixture
def signal():
    rng = np.random.default_rng(0)
    return rng.standard_normal(HOP * 64).astype(np.float32)


def _offline_frames(y):
    ypad = np.pad(y, (PAD, 0))
    S = stft(ypad, n_fft=N_FFT, hop_length=HOP, center=False)
    return np.asarray(S).T  # (F, bins)


class TestStreamingSTFT:
    @pytest.mark.parametrize("chunk_hops", [1, 4, 16])
    def test_matches_offline(self, signal, chunk_hops):
        s = StreamingSTFT(n_fft=N_FFT, hop_length=HOP)
        cs = chunk_hops * HOP
        got = []
        for i in range(0, len(signal), cs):
            got.append(np.asarray(s.push(signal[i : i + cs]))[0])
        streamed = np.concatenate(got, axis=0)
        offline = _offline_frames(signal)
        n = min(len(streamed), len(offline))
        np.testing.assert_allclose(streamed[:n], offline[:n], atol=1e-4)

    def test_chunk_not_hop_multiple_raises(self, signal):
        s = StreamingSTFT(n_fft=N_FFT, hop_length=HOP)
        with pytest.raises(ValueError):
            s.push(signal[:100])

    def test_reset(self, signal):
        s = StreamingSTFT(n_fft=N_FFT, hop_length=HOP)
        a = np.asarray(s.push(signal[: 4 * HOP]))
        s.reset()
        b = np.asarray(s.push(signal[: 4 * HOP]))
        np.testing.assert_array_equal(a, b)

    def test_batched(self, signal):
        s = StreamingSTFT(n_fft=N_FFT, hop_length=HOP, batch=2)
        y2 = np.stack([signal, signal * 0.5])
        out = np.asarray(s.push(y2[:, : 8 * HOP]))
        assert out.shape == (2, 8, N_FFT // 2 + 1)
        np.testing.assert_allclose(out[1], 0.5 * out[0], atol=1e-5)


class TestStreamingISTFT:
    def test_roundtrip_interior(self, signal):
        s = StreamingSTFT(n_fft=N_FFT, hop_length=HOP)
        inv = StreamingISTFT(n_fft=N_FFT, hop_length=HOP)
        cs = 8 * HOP
        rec = []
        for i in range(0, len(signal), cs):
            rec.append(np.asarray(inv.push(s.push(signal[i : i + cs])))[0])
        rec = np.concatenate(rec)
        # streamed timeline starts PAD samples before the signal
        aligned = rec[PAD:]
        inner = slice(N_FFT, len(aligned) - N_FFT)
        np.testing.assert_allclose(aligned[inner], signal[: len(aligned)][inner],
                                   atol=1e-3)

    def test_chunked_equals_one_shot_stream(self, signal):
        s1 = StreamingSTFT(n_fft=N_FFT, hop_length=HOP)
        i1 = StreamingISTFT(n_fft=N_FFT, hop_length=HOP)
        one = np.asarray(i1.push(s1.push(signal)))[0]

        s2 = StreamingSTFT(n_fft=N_FFT, hop_length=HOP)
        i2 = StreamingISTFT(n_fft=N_FFT, hop_length=HOP)
        cs = 16 * HOP
        parts = [
            np.asarray(i2.push(s2.push(signal[i : i + cs])))[0]
            for i in range(0, len(signal), cs)
        ]
        np.testing.assert_allclose(np.concatenate(parts), one, atol=1e-4)


class TestStreamingLogMel:
    def test_matches_offline_interior(self, signal):
        m = StreamingLogMel(sr=22050, n_fft=N_FFT, hop_length=HOP, n_mels=40)
        got = []
        cs = 8 * HOP
        for i in range(0, len(signal), cs):
            got.append(np.asarray(m.push(signal[i : i + cs]))[0])
        streamed = np.concatenate(got, axis=0)  # (F, n_mels)

        ypad = np.pad(signal, (PAD, 0))
        mel = melspectrogram(ypad, sr=22050, n_fft=N_FFT, hop_length=HOP,
                             n_mels=40, center=False)
        offline = np.asarray(power_to_db(mel, top_db=None)).T
        n = min(len(streamed), len(offline))
        np.testing.assert_allclose(streamed[:n], offline[:n], atol=1e-2)


class TestStreamingEdgeCases:
    def test_hop_equals_nfft_no_carry_growth(self):
        """hop == n_fft means zero overlap: the carry must stay empty (a
        negative-zero slice once returned the whole chunk, duplicating
        frames and growing state unboundedly)."""
        rng = np.random.default_rng(0)
        y = rng.standard_normal(8 * 256).astype(np.float32)
        s = StreamingSTFT(n_fft=256, hop_length=256, window="boxcar")
        got = []
        for i in range(0, len(y), 4 * 256):
            out = np.asarray(s.push(y[i : i + 4 * 256]))[0]
            assert out.shape[0] == 4  # exactly chunk/hop frames, every push
            got.append(out)
        assert s.carry.shape == (1, 0)
        streamed = np.concatenate(got, axis=0)
        offline = np.asarray(
            stft(y, n_fft=256, hop_length=256, window="boxcar", center=False)
        ).T
        np.testing.assert_allclose(streamed, offline, atol=1e-4)

    def test_invalid_hop_raises(self):
        with pytest.raises(ValueError):
            StreamingSTFT(n_fft=256, hop_length=0)
        with pytest.raises(ValueError):
            StreamingISTFT(n_fft=256, hop_length=512)
