"""Streaming STFT/ISTFT/log-mel tests (ops/streaming.py).

Alignment contract: a stream primed with silence equals the offline
center=False transform of the signal pre-padded with ``n_fft - hop`` zeros.
"""

import numpy as np
import pytest

from mlx_audio_primitives_tpu import istft, melspectrogram, mfcc, power_to_db, stft
from mlx_audio_primitives_tpu.ops.streaming import (
    StreamingChroma,
    StreamingISTFT,
    StreamingLogMel,
    StreamingMFCC,
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


class TestStreamingISTFTExact:
    """Streamed ISTFT == offline istft over the FULL signal (incl. edges).

    The stream carries the true squared-window envelope, so the first and
    last ``n_fft - hop`` samples are normalized identically to offline."""

    @pytest.mark.parametrize("block_frames", [1, 5, 16])
    def test_full_signal_equals_offline(self, signal, block_frames):
        import scipy.signal

        S = np.asarray(stft(signal, n_fft=N_FFT, hop_length=HOP, center=False))
        frames = S.T  # (F, bins)
        offline = np.asarray(istft(S, hop_length=HOP, center=False))

        inv = StreamingISTFT(n_fft=N_FFT, hop_length=HOP)
        parts = []
        for i in range(0, len(frames), block_frames):
            parts.append(np.asarray(inv.push(frames[None, i : i + block_frames]))[0])
        parts.append(np.asarray(inv.flush())[0])
        streamed = np.concatenate(parts)

        assert streamed.shape == offline.shape
        # True f64 window-sum envelope: at the outermost samples it decays
        # to ~1e-9, where BOTH offline and streamed outputs are f32 rounding
        # noise amplified by 1/env — so assert the envelope-weighted error
        # (i.e. the unnormalized OLA agreement) everywhere, and tight
        # per-sample equality wherever the reconstruction is well-posed.
        w = scipy.signal.get_window("hann", N_FFT, fftbins=True)
        env = np.zeros(len(offline))
        for f in range(len(frames)):
            e = min(f * HOP + N_FFT, len(offline))
            env[f * HOP : e] += (w * w)[: e - f * HOP]
        d = np.abs(streamed - offline)
        assert (d * np.maximum(env, 1e-8)).max() < 5e-6
        assert d[env > 1e-5].max() < 5e-5
        np.testing.assert_allclose(streamed, offline, atol=2e-3)

    def test_flush_resets(self, signal):
        S = np.asarray(stft(signal, n_fft=N_FFT, hop_length=HOP, center=False)).T
        inv = StreamingISTFT(n_fft=N_FFT, hop_length=HOP)
        a_push = np.asarray(inv.push(S[None, :8]))
        a_flush = np.asarray(inv.flush())
        b_push = np.asarray(inv.push(S[None, :8]))
        b_flush = np.asarray(inv.flush())
        np.testing.assert_array_equal(a_push, b_push)
        np.testing.assert_array_equal(a_flush, b_flush)

    def test_hop_equals_nfft_flush_empty(self):
        inv = StreamingISTFT(n_fft=256, hop_length=256, window="boxcar")
        rng = np.random.default_rng(3)
        y = rng.standard_normal(4 * 256).astype(np.float32)
        S = np.asarray(stft(y, n_fft=256, hop_length=256, window="boxcar",
                            center=False)).T
        out = np.asarray(inv.push(S[None]))[0]
        tail = np.asarray(inv.flush())
        assert tail.shape == (1, 0)
        np.testing.assert_allclose(out, y, atol=1e-4)


class TestStreamingMFCC:
    def test_matches_offline(self, signal):
        n_mfcc, n_mels = 13, 40
        m = StreamingMFCC(sr=22050, n_fft=N_FFT, hop_length=HOP,
                          n_mfcc=n_mfcc, n_mels=n_mels)
        cs = 8 * HOP
        got = []
        for i in range(0, len(signal), cs):
            got.append(np.asarray(m.push(signal[i : i + cs]))[0])
        streamed = np.concatenate(got, axis=0)  # (F, n_mfcc)

        ypad = np.pad(signal, (PAD, 0))
        mel = melspectrogram(ypad, sr=22050, n_fft=N_FFT, hop_length=HOP,
                             n_mels=n_mels, center=False)
        # top_db=None: the stream cannot know the global max (class docstring)
        offline = np.asarray(
            mfcc(S=power_to_db(mel, top_db=None), n_mfcc=n_mfcc)
        ).T
        n = min(len(streamed), len(offline))
        np.testing.assert_allclose(streamed[:n], offline[:n], atol=1e-2)

    def test_lifter_matches_offline(self, signal):
        n_mfcc, n_mels, lifter = 13, 40, 22
        m = StreamingMFCC(sr=22050, n_fft=N_FFT, hop_length=HOP,
                          n_mfcc=n_mfcc, n_mels=n_mels, lifter=lifter)
        streamed = np.asarray(m.push(signal))[0]
        ypad = np.pad(signal, (PAD, 0))
        mel = melspectrogram(ypad, sr=22050, n_fft=N_FFT, hop_length=HOP,
                             n_mels=n_mels, center=False)
        offline = np.asarray(
            mfcc(S=power_to_db(mel, top_db=None), n_mfcc=n_mfcc, lifter=lifter)
        ).T
        n = min(len(streamed), len(offline))
        np.testing.assert_allclose(streamed[:n], offline[:n], atol=1e-2)

    def test_lifter_negative_raises(self):
        with pytest.raises(ValueError):
            StreamingMFCC(lifter=-1)


class TestStreamingChroma:
    def test_matches_offline(self, signal):
        from mlx_audio_primitives_tpu import chroma_stft

        c = StreamingChroma(sr=22050, n_fft=N_FFT, hop_length=HOP)
        cs = 8 * HOP
        got = []
        for i in range(0, len(signal), cs):
            got.append(np.asarray(c.push(signal[i : i + cs]))[0])
        streamed = np.concatenate(got, axis=0)  # (F, 12)

        ypad = np.pad(signal, (PAD, 0))
        offline = np.asarray(
            chroma_stft(ypad, sr=22050, n_fft=N_FFT, hop_length=HOP,
                        center=False, fft_mode="fft")
        ).T
        n = min(len(streamed), len(offline))
        np.testing.assert_allclose(streamed[:n], offline[:n], atol=2e-4)

    def test_reset(self, signal):
        c = StreamingChroma(sr=22050, n_fft=N_FFT, hop_length=HOP)
        a = np.asarray(c.push(signal[: 8 * HOP]))
        c.reset()
        b = np.asarray(c.push(signal[: 8 * HOP]))
        np.testing.assert_allclose(a, b)


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


class TestStreamingPitch:
    """StreamingPitch == offline pitch_detect_acf(center=False) frame for
    frame, modulo the grid shift of the silence-primed carry: stream frame
    j covers samples [j*hop - (frame-hop), j*hop + hop), so offline frame 0
    is stream frame C'-1 (C' = frame/hop)."""

    def test_matches_offline_uncentered(self):
        from mlx_audio_primitives_tpu import pitch_detect_acf
        from mlx_audio_primitives_tpu.ops.streaming import StreamingPitch

        sr, frame, hop = 22050, 2048, 512
        t = np.arange(4 * frame) / sr
        y = (np.sin(2 * np.pi * 220.0 * t)
             + 0.05 * np.random.default_rng(0).standard_normal(t.size)
             ).astype(np.float32)

        sp = StreamingPitch(sr=sr, frame_length=frame, hop_length=hop)
        f0s, vs = [], []
        chunk = 4 * hop
        for i in range(0, len(y), chunk):
            f0, v = sp.push(y[None, i : i + chunk])
            f0s.append(np.asarray(f0))
            vs.append(np.asarray(v))
        f0_s = np.concatenate(f0s, axis=1)[0]
        v_s = np.concatenate(vs, axis=1)[0]

        f0_o, v_o = pitch_detect_acf(y, sr=sr, frame_length=frame,
                                     hop_length=hop, center=False)
        f0_o, v_o = np.asarray(f0_o), np.asarray(v_o)
        shift = frame // hop - 1
        n = len(f0_o)
        avail = min(n, f0_s.shape[0] - shift)
        np.testing.assert_allclose(f0_s[shift : shift + avail], f0_o[:avail],
                                   atol=1e-3)
        np.testing.assert_array_equal(v_s[shift : shift + avail], v_o[:avail])

    def test_detects_tone_and_resets(self):
        from mlx_audio_primitives_tpu.ops.streaming import StreamingPitch

        sr = 22050
        t = np.arange(8192) / sr
        tone = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
        sp = StreamingPitch(sr=sr)
        f0, v = sp.push(tone[None, : 8 * 512])
        f0, v = np.asarray(f0)[0], np.asarray(v)[0]
        # frames past the silence-primed carry hear the tone
        assert v[-3:].all()
        np.testing.assert_allclose(f0[-3:], 440.0, atol=12.0)
        sp.reset()
        f0b, _ = sp.push(tone[None, : 8 * 512])
        np.testing.assert_array_equal(np.asarray(f0b)[0], f0)

    def test_chunk_validation(self):
        from mlx_audio_primitives_tpu.ops.streaming import StreamingPitch

        sp = StreamingPitch()
        with pytest.raises(ValueError):
            sp.push(np.zeros((1, 513), np.float32))
        with pytest.raises(ValueError):
            sp.push(np.zeros((1, 0), np.float32))
        with pytest.raises(ValueError):
            StreamingPitch(fmin=500.0, fmax=100.0)
        with pytest.raises(ValueError, match="frame_length"):
            StreamingPitch(frame_length=2048, hop_length=4096)


class TestStreamingResample:
    @pytest.mark.parametrize(
        "up,down",
        [(160, 441), (441, 160), (2, 3), (3, 2), (1, 4), (4, 1), (320, 882)],
    )
    def test_matches_offline_constant(self, up, down):
        """pushes + flush == resample_poly(..., padtype='constant') exactly."""
        from mlx_audio_primitives_tpu import resample_poly
        from mlx_audio_primitives_tpu.ops.streaming import StreamingResample

        import math

        g = math.gcd(up, down)
        dn = down // g
        rng = np.random.default_rng(0)
        chunk = 16 * dn  # big enough that the first push clears m0 for up=1
        n = 6 * chunk
        y = rng.standard_normal((2, n)).astype(np.float32)

        r = StreamingResample(up=up, down=down, batch=2)
        outs = [np.asarray(r.push(y[:, i : i + chunk])) for i in range(0, n, chunk)]
        outs.append(np.asarray(r.flush()))
        got = np.concatenate(outs, axis=1)
        want = np.asarray(resample_poly(y, up, down, padtype="constant"))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=2e-6)

    def test_variable_chunk_sizes(self):
        from mlx_audio_primitives_tpu import resample_poly
        from mlx_audio_primitives_tpu.ops.streaming import StreamingResample

        rng = np.random.default_rng(1)
        up, down = 160, 441
        sizes = [4 * 441, 441, 2 * 441, 7 * 441]
        y = rng.standard_normal((1, sum(sizes))).astype(np.float32)
        r = StreamingResample(up=up, down=down, batch=1)
        outs, pos = [], 0
        for s in sizes:
            outs.append(np.asarray(r.push(y[:, pos : pos + s])))
            pos += s
        outs.append(np.asarray(r.flush()))
        got = np.concatenate(outs, axis=1)
        want = np.asarray(resample_poly(y, up, down, padtype="constant"))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=2e-6)

    def test_identity_stream(self):
        from mlx_audio_primitives_tpu.ops.streaming import StreamingResample

        r = StreamingResample(up=3, down=3)
        y = np.ones((1, 32), np.float32)
        np.testing.assert_array_equal(np.asarray(r.push(y)), y)
        assert r.flush().shape == (1, 0)

    def test_validation(self):
        from mlx_audio_primitives_tpu.ops.streaming import StreamingResample

        r = StreamingResample(up=160, down=441)
        with pytest.raises(ValueError, match="k\\*441"):
            r.push(np.zeros((1, 100), np.float32))
        with pytest.raises(ValueError, match="first chunk"):
            # 441 input samples -> 160 output < m0 is impossible here
            # (m0 ~ 11), so use a tiny ratio where one chunk can't clear m0
            r2 = StreamingResample(up=1, down=50)
            r2.push(np.zeros((1, 50), np.float32))

    def test_reset_after_flush(self):
        from mlx_audio_primitives_tpu import resample_poly
        from mlx_audio_primitives_tpu.ops.streaming import StreamingResample

        rng = np.random.default_rng(2)
        y = rng.standard_normal((1, 10 * 441)).astype(np.float32)
        r = StreamingResample(up=160, down=441)
        first = np.concatenate(
            [np.asarray(r.push(y)), np.asarray(r.flush())], axis=1
        )
        second = np.concatenate(
            [np.asarray(r.push(y)), np.asarray(r.flush())], axis=1
        )
        np.testing.assert_array_equal(first, second)
        want = np.asarray(resample_poly(y, 160, 441, padtype="constant"))
        np.testing.assert_allclose(first, want, rtol=1e-5, atol=2e-6)


class TestStreamingPCEN:
    def test_matches_offline_exactly(self, signal):
        from mlx_audio_primitives_tpu import pcen
        from mlx_audio_primitives_tpu.ops.streaming import StreamingPCEN

        p = StreamingPCEN(sr=22050, n_fft=N_FFT, hop_length=HOP, n_mels=40)
        cs = 8 * HOP
        got = []
        for i in range(0, len(signal), cs):
            got.append(np.asarray(p.push(signal[i : i + cs]))[0])
        streamed = np.concatenate(got, axis=0)  # (F, n_mels)

        ypad = np.pad(signal, (PAD, 0))
        M = melspectrogram(ypad, sr=22050, n_fft=N_FFT, hop_length=HOP,
                           n_mels=40, center=False, fft_mode="fft")
        offline = np.asarray(pcen(np.asarray(M), sr=22050,
                                  hop_length=HOP)).T
        n = min(len(streamed), len(offline))
        # PCEN is causal: streamed == offline, not just asymptotically
        np.testing.assert_allclose(streamed[:n], offline[:n], atol=5e-5)

    def test_single_frame_chunks(self, signal):
        from mlx_audio_primitives_tpu.ops.streaming import StreamingPCEN

        p = StreamingPCEN(sr=22050, n_fft=N_FFT, hop_length=HOP, n_mels=24)
        q = StreamingPCEN(sr=22050, n_fft=N_FFT, hop_length=HOP, n_mels=24)
        big = np.asarray(p.push(signal[: 16 * HOP]))[0]
        small = np.concatenate(
            [np.asarray(q.push(signal[i * HOP : (i + 1) * HOP]))[0]
             for i in range(16)], axis=0,
        )
        np.testing.assert_allclose(small, big, atol=2e-5)

    def test_reset(self, signal):
        from mlx_audio_primitives_tpu.ops.streaming import StreamingPCEN

        p = StreamingPCEN(sr=22050, n_fft=N_FFT, hop_length=HOP)
        a = np.asarray(p.push(signal[: 8 * HOP]))
        p.reset()
        b = np.asarray(p.push(signal[: 8 * HOP]))
        np.testing.assert_array_equal(a, b)
