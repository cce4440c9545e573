"""frame/rms/preemphasis/deemphasis parity (port of reference
`tests/test_framing.py`). Oracle: scipy.signal.lfilter + direct formulas."""

import numpy as np
import pytest
import scipy.signal

from mlx_audio_primitives_tpu import deemphasis, frame, preemphasis, rms


class TestFrame:
    def test_shape_1d(self, random_signal):
        f = frame(random_signal, 2048, 512)
        assert f.shape == (1 + (22050 - 2048) // 512, 2048)

    def test_shape_2d(self, batch_signals):
        f = frame(batch_signals, 1024, 256)
        assert f.shape == (4, 1 + (22050 - 1024) // 256, 1024)

    def test_content(self, short_signal):
        f = np.asarray(frame(short_signal, 256, 128))
        for i in range(f.shape[0]):
            np.testing.assert_array_equal(f[i], short_signal[i * 128 : i * 128 + 256])

    def test_hop_one(self, short_signal):
        f = np.asarray(frame(short_signal[:64], 16, 1))
        assert f.shape == (49, 16)
        np.testing.assert_array_equal(f[5], short_signal[5:21])

    def test_too_short_raises(self):
        with pytest.raises(ValueError):
            frame(np.zeros(10, np.float32), 100, 10)

    def test_axis_validation(self, random_signal):
        with pytest.raises(ValueError):
            frame(random_signal, 256, 128, axis=0)

    @pytest.mark.parametrize(
        "frame_length,hop",
        # (2048, 1/2/3) genuinely reach the k = ceil(8/hop) >= 3 shifted
        # sub-gather variant (C > 64 AND hop < 8); the (64, <=3) rows take
        # the unrolled-chunks path and pin the branch boundary itself.
        [(64, 1), (64, 2), (64, 3), (512, 5), (512, 7), (512, 8),
         (2048, 1), (2048, 2), (2048, 3),
         (2048, 7), (2048, 13), (2048, 31), (2048, 63), (2048, 65)],
    )
    def test_tiny_hop_row_gather_exact(self, frame_length, hop):
        """The small-hop path (C > 64 chunks: row gather, with the k-shifted
        sub-gather variant for hop < 8) must be bit-exact vs direct indexing
        across branch boundaries."""
        rng = np.random.default_rng(7)
        L = 4097
        y = rng.standard_normal((2, L)).astype(np.float32)
        got = np.asarray(frame(y, frame_length, hop))
        F = 1 + (L - frame_length) // hop
        idx = np.arange(F)[:, None] * hop + np.arange(frame_length)[None, :]
        np.testing.assert_array_equal(got, y[:, idx])


class TestRMS:
    def test_matches_formula(self, random_signal):
        ours = np.asarray(rms(random_signal, frame_length=2048, hop_length=512))
        y = np.pad(random_signal.astype(np.float64), 1024)
        n = 1 + (len(y) - 2048) // 512
        ref = np.array(
            [np.sqrt(np.mean(y[t * 512 : t * 512 + 2048] ** 2)) for t in range(n)]
        )
        assert ours.shape == (1, n)
        np.testing.assert_allclose(ours[0], ref, rtol=1e-4)

    def test_batched(self, batch_signals):
        r = rms(batch_signals)
        assert r.shape[0] == 4 and r.shape[1] == 1

    def test_no_center(self, random_signal):
        r = np.asarray(rms(random_signal, center=False))
        assert r.shape == (1, 1 + (22050 - 2048) // 512)

    def test_constant_signal(self):
        r = np.asarray(rms(np.full(8192, 0.5, np.float32), center=False))
        np.testing.assert_allclose(r, 0.5, rtol=1e-5)


class TestPreemphasis:
    def test_matches_lfilter_default_zi(self, random_signal):
        ours = np.asarray(preemphasis(random_signal, coef=0.97))
        zi = 2 * random_signal[0:1] - random_signal[1:2]
        ref, _ = scipy.signal.lfilter(
            [1.0, -0.97], [1.0], random_signal.astype(np.float64), zi=zi.astype(np.float64)
        )
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_explicit_zi(self, random_signal):
        ours = np.asarray(preemphasis(random_signal, coef=0.95, zi=0.5))
        ref, _ = scipy.signal.lfilter(
            [1.0, -0.95], [1.0], random_signal.astype(np.float64), zi=np.array([0.5])
        )
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_return_zf_matches_lfilter(self, random_signal):
        # zf is the scipy lfilter state -coef*y[-1], NOT the raw last sample
        out, zf = preemphasis(random_signal, coef=0.97, return_zf=True)
        zi = 2 * random_signal[0:1] - random_signal[1:2]
        _, zf_ref = scipy.signal.lfilter(
            [1.0, -0.97], [1.0], random_signal.astype(np.float64),
            zi=zi.astype(np.float64),
        )
        np.testing.assert_allclose(np.asarray(zf), zf_ref, atol=1e-5)

    def test_zf_chains_chunked_streaming(self, random_signal):
        # regression: zf used to be the raw last sample, which broke the
        # documented zi/zf streaming contract at every chunk boundary
        y = random_signal[:1000]
        a, zf = preemphasis(y[:400], coef=0.97, return_zf=True)
        b = preemphasis(y[400:], coef=0.97, zi=zf)
        chunked = np.concatenate([np.asarray(a), np.asarray(b)])
        full = np.asarray(preemphasis(y, coef=0.97))
        np.testing.assert_allclose(chunked, full, atol=1e-5)

    def test_batched(self, batch_signals):
        out = np.asarray(preemphasis(batch_signals))
        for i in range(4):
            single = np.asarray(preemphasis(batch_signals[i]))
            np.testing.assert_allclose(out[i], single, atol=1e-6)

    def test_coef_validation(self, random_signal):
        with pytest.raises(ValueError):
            preemphasis(random_signal, coef=1.5)


class TestDeemphasis:
    def test_roundtrip(self, random_signal):
        emph = preemphasis(random_signal, coef=0.97)
        back = np.asarray(deemphasis(emph, coef=0.97))
        np.testing.assert_allclose(back, random_signal, atol=2e-4)

    def test_explicit_zi_matches_lfilter(self, random_signal):
        y = random_signal[:4096]
        ours = np.asarray(deemphasis(y, coef=0.9, zi=0.25))
        ref, _ = scipy.signal.lfilter(
            [1.0], [1.0, -0.9], y.astype(np.float64), zi=np.array([0.25])
        )
        np.testing.assert_allclose(ours, ref, atol=2e-4)

    def test_return_zf_matches_lfilter(self, random_signal):
        y = random_signal[:1000]
        _, zf = deemphasis(y, coef=0.9, zi=0.0, return_zf=True)
        _, zf_ref = scipy.signal.lfilter(
            [1.0], [1.0, -0.9], y.astype(np.float64), zi=np.array([0.0])
        )
        np.testing.assert_allclose(np.asarray(zf), zf_ref, atol=2e-4)

    def test_batched_roundtrip(self, batch_signals):
        emph = preemphasis(batch_signals)
        back = np.asarray(deemphasis(emph))
        np.testing.assert_allclose(back, batch_signals, atol=2e-4)

    def test_streaming_chunks(self, random_signal):
        """zi/zf chaining reconstructs the full-filter output."""
        y = random_signal[:2000]
        full = np.asarray(deemphasis(y, coef=0.9, zi=0.0))
        a, zf = deemphasis(y[:1000], coef=0.9, zi=0.0, return_zf=True)
        b = deemphasis(y[1000:], coef=0.9, zi=zf)
        chunked = np.concatenate([np.asarray(a), np.asarray(b)])
        np.testing.assert_allclose(chunked, full, atol=2e-4)

    def test_coef_validation(self, random_signal):
        with pytest.raises(ValueError):
            deemphasis(random_signal, coef=-0.1)
