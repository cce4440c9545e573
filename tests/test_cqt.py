"""Constant-Q transform tests.

No third-party CQT oracle is available in this environment, so the tests
pin the documented normalization contract (tone amplitude A at a bin's
center frequency -> |C| ~= A/2), geometric bin spacing, constant-Q
bandwidth behavior, octave localization, and a scalar-loop time-domain
correlation oracle for a handful of (bin, frame) coefficients.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from mlx_audio_primitives_tpu.ops.cqt import (
    _C1,
    cqt,
    cqt_filter_length,
    cqt_frequencies,
    pseudo_cqt,
)

SR = 22050


def tone(freq, sr=SR, dur=1.0, amp=1.0):
    t = np.arange(int(sr * dur)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestCqtFrequencies:
    def test_geometric_spacing(self):
        f = cqt_frequencies(84)
        ratios = f[1:] / f[:-1]
        np.testing.assert_allclose(ratios, 2.0 ** (1.0 / 12.0), rtol=1e-12)

    def test_anchor_c1(self):
        f = cqt_frequencies(84)
        assert abs(f[0] - _C1) < 1e-9
        # bin 45 = A4 = 440 Hz (C1 = MIDI 24, A4 = MIDI 69)
        np.testing.assert_allclose(f[45], 440.0, rtol=1e-10)

    def test_tuning(self):
        f = cqt_frequencies(12, tuning=1.0)
        f0 = cqt_frequencies(12, tuning=0.0)
        np.testing.assert_allclose(f, f0 * 2.0 ** (1.0 / 12.0), rtol=1e-12)

    def test_filter_length_monotone(self):
        assert cqt_filter_length(SR, _C1) > cqt_filter_length(SR, 4 * _C1)


class TestCqt:
    def test_shape(self):
        C = cqt(tone(440.0))
        assert C.shape[0] == 84
        assert np.iscomplexobj(np.asarray(C))
        Cb = cqt(np.stack([tone(440.0), tone(220.0)]))
        assert Cb.shape[:2] == (2, 84)

    @pytest.mark.parametrize("midi_off,freq", [(33, 220.0), (45, 440.0),
                                               (57, 880.0)])
    def test_tone_bin_localization(self, midi_off, freq):
        # A220/A440/A880 land on bins 33/45/57 above C1... (A is +9 from C)
        k = midi_off + 12  # C1-based index: A1=21? compute directly instead
        f = cqt_frequencies(84)
        k = int(np.argmin(np.abs(f - freq)))
        C = np.abs(np.asarray(cqt(tone(freq))))
        med = np.median(C, axis=-1)
        assert int(np.argmax(med)) == k

    def test_amplitude_contract(self):
        # |C| ~= A/2 at the matching bin for a unit tone
        f = cqt_frequencies(84)
        k = int(np.argmin(np.abs(f - 440.0)))
        for amp in (1.0, 0.3):
            C = np.abs(np.asarray(cqt(tone(float(f[k]), amp=amp))))
            med = float(np.median(C[k]))
            assert abs(med - amp / 2) < 0.05 * amp

    def test_octave_separation(self):
        C = np.abs(np.asarray(cqt(tone(220.0))))
        f = cqt_frequencies(84)
        k = int(np.argmin(np.abs(f - 220.0)))
        med = np.median(C, axis=-1)
        # half-way bin (tritone, 6 semitones up) is far below the peak
        assert med[k + 6] < 0.05 * med[k]

    def test_constant_q_bandwidth(self):
        # relative bandwidth (in bins) is frequency-independent: the peak's
        # immediate neighbors hold a similar fraction of the peak at low
        # and high bins
        f = cqt_frequencies(84)
        out = []
        for freq in (110.0, 880.0):
            k = int(np.argmin(np.abs(f - freq)))
            med = np.median(np.abs(np.asarray(cqt(tone(freq)))), axis=-1)
            out.append(med[k + 1] / med[k])
        assert abs(out[0] - out[1]) < 0.2

    def test_scalar_correlation_oracle(self):
        """A few coefficients vs direct time-domain correlation (f64)."""
        from mlx_audio_primitives_tpu.ops.cqt import (
            _cqt_q,
            _cqt_window,
            _cqt_setup,
        )

        sr = SR
        y = tone(220.0, dur=0.7) + 0.5 * tone(330.0, dur=0.7)
        hop = 512
        n_bins, bpo = 48, 12
        fmin, n_fft = _cqt_setup(sr, n_bins, None, bpo, 1.0, 0.0)
        C = np.asarray(cqt(y, sr=sr, hop_length=hop, n_bins=n_bins))
        freqs = cqt_frequencies(n_bins)
        Q = _cqt_q(bpo, 1.0)
        ypad = np.concatenate(
            [np.zeros(n_fft // 2), y.astype(np.float64), np.zeros(n_fft // 2)]
        )
        F = C.shape[-1]
        for k in (20, 27, 31):  # 220 Hz bin ~ 27, 330 ~ 34 in this range
            ilen = min(int(np.ceil(Q * sr / freqs[k])), n_fft)
            w = _cqt_window(ilen)
            t = np.arange(ilen) - (ilen - 1) / 2.0
            h = w * np.exp(2j * np.pi * freqs[k] * t / sr)
            h /= np.sum(np.abs(h))
            for fr in (F // 3, F // 2):
                center = fr * hop + n_fft // 2  # frame center in ypad
                start = center - n_fft // 2 + (n_fft - ilen) // 2
                seg = ypad[start : start + ilen]
                want = np.sum(np.conj(h) * seg)
                got = C[k, fr]
                # f32 FFT+GEMM noise floor at n_fft=16384 measured at
                # 8.9e-6 absolute across a (bins x frames) sweep; the
                # discarded negative-frequency filter content is ~1e-6 rel
                # (hann sidelobe 2Q bins out). Round 2's 1e-2 bound
                # conflated that absolute floor with relative error.
                assert abs(got - want) <= 3e-5 + 2e-4 * abs(want)

    def test_nyquist_guard(self):
        with pytest.raises(ValueError):
            cqt(tone(440.0), n_bins=120)  # top bin above Nyquist

    def test_errors(self):
        with pytest.raises(ValueError):
            cqt(tone(440.0), hop_length=0)
        with pytest.raises(ValueError):
            cqt(tone(440.0), n_bins=0)


class TestPseudoCqt:
    def test_matches_cqt_magnitude_on_tones(self):
        y = tone(440.0)
        f = cqt_frequencies(84)
        k = int(np.argmin(np.abs(f - 440.0)))
        Cm = np.abs(np.asarray(cqt(y)))
        P = np.asarray(pseudo_cqt(y))
        assert P.shape == Cm.shape
        assert not np.iscomplexobj(P)
        # peak bin agrees; scale is an upper bound within ~3x (triangle
        # inequality + rectangular-frame leakage, see docstring)
        assert int(np.argmax(np.median(P, axis=-1))) == k
        assert np.median(P[k]) >= np.median(Cm[k]) * 0.99
        assert np.median(P[k]) <= np.median(Cm[k]) * 3.0

    def test_batch(self):
        Pb = np.asarray(pseudo_cqt(np.stack([tone(220.0), tone(440.0)])))
        P0 = np.asarray(pseudo_cqt(tone(220.0)))
        np.testing.assert_allclose(Pb[0], P0, rtol=1e-4, atol=1e-6)


class TestVqt:
    def test_gamma_zero_matches_alpha_q_cqt(self):
        """gamma=0 is a constant-Q bank (with the alpha-based Q): peak
        bin and magnitude contract hold exactly like cqt."""
        from mlx_audio_primitives_tpu import vqt

        y = tone(440.0)
        V = np.abs(np.asarray(jnp.abs(vqt(y, gamma=0.0))))
        k = int(np.argmin(np.abs(cqt_frequencies(84) - 440.0)))
        med = np.median(V, axis=-1)
        assert int(np.argmax(med)) == k
        assert abs(med[k] - 0.5) < 0.05

    def test_default_gamma_erb(self):
        from mlx_audio_primitives_tpu import vqt

        y = tone(220.0)
        V = np.asarray(jnp.abs(vqt(y)))
        k = int(np.argmin(np.abs(cqt_frequencies(84) - 220.0)))
        assert int(np.argmax(np.median(V, axis=-1))) == k

    def test_low_bins_broader_than_cqt(self):
        """ERB gamma shortens low filters -> broader low-frequency bumps:
        a low tone spreads over MORE bins in vqt than cqt."""
        from mlx_audio_primitives_tpu import cqt, vqt

        y = tone(65.4)  # C2
        Vc = np.asarray(jnp.abs(cqt(y)))
        Vv = np.asarray(jnp.abs(vqt(y)))
        mc = np.median(Vc, axis=-1)
        mv = np.median(Vv, axis=-1)
        spread = lambda m: int((m > 0.25 * m.max()).sum())
        assert spread(mv) >= spread(mc)

    def test_batched(self):
        from mlx_audio_primitives_tpu import vqt

        y = tone(440.0, dur=0.5)
        Y = np.stack([y, 0.5 * y])
        V = jnp.abs(vqt(Y))
        assert V.ndim == 3 and V.shape[0] == 2
        np.testing.assert_allclose(
            np.asarray(V[1]), 0.5 * np.asarray(V[0]), atol=1e-5
        )

    def test_scalar_correlation_oracle(self):
        """VQT coefficients vs direct f64 time-domain correlation with the
        variable-Q filters."""
        from mlx_audio_primitives_tpu import vqt
        from mlx_audio_primitives_tpu.ops.cqt import (
            _cqt_window,
            _vqt_alpha,
        )

        sr = SR
        y = tone(220.0, dur=0.7) + 0.5 * tone(330.0, dur=0.7)
        hop, n_bins, bpo = 512, 48, 12
        gamma = 20.0
        alpha = _vqt_alpha(bpo)
        Qa = 1.0 / alpha
        freqs = cqt_frequencies(n_bins)
        max_len = int(np.ceil(Qa * sr / (freqs[0] + gamma / alpha)))
        n_fft = 1 << int(np.ceil(np.log2(max_len)))
        C = np.asarray(
            jnp.stack([
                jnp.real(v := vqt(y, sr=sr, hop_length=hop, n_bins=n_bins,
                                  gamma=gamma)),
                jnp.imag(v),
            ])
        )
        C = C[0] + 1j * C[1]
        ypad = np.concatenate(
            [np.zeros(n_fft // 2), y.astype(np.float64),
             np.zeros(n_fft // 2)]
        )
        F = C.shape[-1]
        for k in (20, 27, 34):
            ilen = min(
                int(np.ceil(Qa * sr / (freqs[k] + gamma / alpha))), n_fft
            )
            w = _cqt_window(ilen)
            t = np.arange(ilen) - (ilen - 1) / 2.0
            h = w * np.exp(2j * np.pi * freqs[k] * t / sr)
            h /= np.sum(np.abs(h))
            for fr in (F // 3, F // 2):
                center = fr * hop + n_fft // 2
                start = center - n_fft // 2 + (n_fft - ilen) // 2
                seg = ypad[start : start + ilen]
                want = np.sum(np.conj(h) * seg)
                got = C[k, fr]
                # looser than the CQT bound on purpose: gamma shortens the
                # low filters to ~4 carrier cycles (vs Q~17 for CQT), so
                # the half-spectrum truncation discards hann leakage only
                # ~75 dB down (measured 6.5e-5 abs at unit amplitude) —
                # inherent to the analytic-filter rfft formulation, not f32
                assert abs(got - want) <= 2e-4 + 5e-4 * abs(want)

    def test_errors(self):
        from mlx_audio_primitives_tpu import vqt

        with pytest.raises(ValueError):
            vqt(tone(440.0), gamma=-1.0)
        with pytest.raises(ValueError):
            vqt(tone(440.0), n_bins=120)
