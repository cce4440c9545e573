"""Chroma filterbank + chromagram tests.

Oracle: an independent, scalar-loop float64 construction of the Ellis
chroma projection (written element-by-element, no shared vectorized code
with the library), plus musical-property tests (pitch-class localization,
octave equivalence) that need no oracle at all.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_primitives_tpu.ops.chroma import (
    chroma_filterbank,
    chroma_stft,
    hz_to_octs,
    octs_to_hz,
)


def _oracle_chroma_fb(sr, n_fft, n_chroma=12, tuning=0.0, ctroct=5.0,
                      octwidth=2.0, norm=2.0, base_c=True):
    """Scalar-loop f64 chroma filterbank (independent of the library code)."""
    a440 = 440.0 * 2.0 ** (tuning / n_chroma)
    frqbins = np.empty(n_fft, dtype=np.float64)
    for i in range(1, n_fft):
        f = sr * i / n_fft
        frqbins[i] = n_chroma * math.log2(f / (a440 / 16.0))
    frqbins[0] = frqbins[1] - 1.5 * n_chroma

    binwidth = np.empty(n_fft, dtype=np.float64)
    for i in range(n_fft - 1):
        binwidth[i] = max(frqbins[i + 1] - frqbins[i], 1.0)
    binwidth[n_fft - 1] = 1.0

    wts = np.empty((n_chroma, n_fft), dtype=np.float64)
    half = round(n_chroma / 2.0)
    for c in range(n_chroma):
        for i in range(n_fft):
            d = ((frqbins[i] - c) + half + 10 * n_chroma) % n_chroma - half
            wts[c, i] = math.exp(-0.5 * (2.0 * d / binwidth[i]) ** 2)

    if norm is not None:
        for i in range(n_fft):
            if norm == np.inf:
                length = max(abs(wts[c, i]) for c in range(n_chroma))
            else:
                length = sum(abs(wts[c, i]) ** norm for c in range(n_chroma)) ** (
                    1.0 / norm
                )
            if length >= np.finfo(np.float64).tiny:
                for c in range(n_chroma):
                    wts[c, i] /= length

    if octwidth is not None:
        for i in range(n_fft):
            w = math.exp(-0.5 * ((frqbins[i] / n_chroma - ctroct) / octwidth) ** 2)
            for c in range(n_chroma):
                wts[c, i] *= w

    if base_c:
        wts = np.roll(wts, -3 * (n_chroma // 12), axis=0)
    return wts[:, : 1 + n_fft // 2].astype(np.float32)


class TestHzToOcts:
    def test_a440_is_octave_4(self):
        # A440 = A4: 4 octaves above the A440/16 anchor
        assert np.allclose(hz_to_octs(440.0), 4.0)

    def test_round_trip(self):
        f = np.array([27.5, 55.0, 261.63, 440.0, 4186.0])
        assert np.allclose(octs_to_hz(hz_to_octs(f)), f, rtol=1e-12)

    def test_tuning_shifts_anchor(self):
        # +1 full chroma bin of tuning raises the anchor by 1/12 octave
        assert np.allclose(
            hz_to_octs(440.0, tuning=1.0, bins_per_octave=12),
            4.0 - 1.0 / 12.0,
        )


class TestChromaFilterbank:
    @pytest.mark.parametrize("n_fft", [512, 1024, 2048])
    @pytest.mark.parametrize("norm", [2.0, np.inf, None])
    def test_matches_scalar_oracle(self, n_fft, norm):
        fb = np.asarray(chroma_filterbank(22050, n_fft, norm=norm))
        ref = _oracle_chroma_fb(22050, n_fft, norm=norm)
        np.testing.assert_allclose(fb, ref, rtol=1e-6, atol=1e-8)

    def test_matches_oracle_options(self):
        fb = np.asarray(
            chroma_filterbank(
                16000, 1024, n_chroma=24, tuning=0.25, ctroct=4.0,
                octwidth=3.0, base_c=False,
            )
        )
        ref = _oracle_chroma_fb(
            16000, 1024, n_chroma=24, tuning=0.25, ctroct=4.0,
            octwidth=3.0, base_c=False,
        )
        np.testing.assert_allclose(fb, ref, rtol=1e-6, atol=1e-8)

    def test_shape_and_nonneg(self):
        fb = np.asarray(chroma_filterbank(22050, 2048))
        assert fb.shape == (12, 1025)
        assert np.all(fb >= 0)

    def test_octwidth_none_keeps_low_bins(self):
        fb_w = np.asarray(chroma_filterbank(22050, 2048))
        fb_n = np.asarray(chroma_filterbank(22050, 2048, octwidth=None))
        # Without octave weighting, high-frequency columns carry more weight
        assert fb_n[:, 900:].sum() > fb_w[:, 900:].sum()

    def test_tone_bin_maps_to_its_class(self):
        # FFT bin nearest 440 Hz projects dominantly onto class A (row 9)
        sr, n_fft = 22050, 4096
        k = round(440.0 * n_fft / sr)
        fb = np.asarray(chroma_filterbank(sr, n_fft))
        assert int(np.argmax(fb[:, k])) == 9

    def test_cached_identity(self):
        a = chroma_filterbank(22050, 2048)
        b = chroma_filterbank(22050, 2048)
        assert a is b


def _tone(freq, sr=22050, dur=1.0):
    t = np.arange(int(sr * dur)) / sr
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


class TestChromaSTFT:
    def test_shape(self):
        C = chroma_stft(_tone(440.0))
        assert C.shape[0] == 12
        Cb = chroma_stft(np.stack([_tone(440.0), _tone(523.25)]))
        assert Cb.shape[:2] == (2, 12)

    @pytest.mark.parametrize(
        "freq,klass",
        [(261.63, 0), (329.63, 4), (392.0, 7), (440.0, 9), (880.0, 9)],
    )
    def test_pitch_class_localization(self, freq, klass):
        C = np.asarray(chroma_stft(_tone(freq)))
        # median over frames, then argmax class
        assert int(np.argmax(np.median(C, axis=-1))) == klass

    def test_octave_equivalence(self):
        C1 = np.asarray(chroma_stft(_tone(220.0)))
        C2 = np.asarray(chroma_stft(_tone(440.0)))
        assert int(np.argmax(np.median(C1, axis=-1))) == int(
            np.argmax(np.median(C2, axis=-1))
        )

    def test_inf_norm_peak_is_one(self):
        C = np.asarray(chroma_stft(_tone(440.0)))
        np.testing.assert_allclose(C.max(axis=0), 1.0, atol=1e-5)

    def test_norm_none_unnormalized(self):
        C = np.asarray(chroma_stft(_tone(440.0), norm=None))
        assert C.max() > 1.0  # raw projected energy

    def test_s_protocol_matches_y(self):
        from mlx_audio_primitives_tpu import magnitude, stft

        y = _tone(440.0)
        S = magnitude(stft(y)) ** 2
        C_s = np.asarray(chroma_stft(S=S, sr=22050))
        C_y = np.asarray(chroma_stft(y, fft_mode="fft"))
        np.testing.assert_allclose(C_s, C_y, rtol=1e-3, atol=2e-4)

    def test_pallas_vs_xla_dispatch_agree(self):
        y = _tone(440.0)
        a = np.asarray(chroma_stft(y))  # auto (pallas on TPU)
        b = np.asarray(chroma_stft(y, use_pallas=False))
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=2e-4)

    def test_batch_matches_single(self):
        y0, y1 = _tone(261.63), _tone(440.0)
        Cb = np.asarray(chroma_stft(np.stack([y0, y1])))
        np.testing.assert_allclose(Cb[0], np.asarray(chroma_stft(y0)),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(Cb[1], np.asarray(chroma_stft(y1)),
                                   rtol=1e-5, atol=1e-6)

    def test_grad_flows(self):
        import jax

        y = jnp.asarray(_tone(440.0, dur=0.25))
        g = jax.grad(lambda x: chroma_stft(x, fft_mode="fft").sum())(y)
        assert np.isfinite(np.asarray(g)).all()

    def test_errors(self):
        with pytest.raises(ValueError):
            chroma_stft(None)
        with pytest.raises(ValueError):
            chroma_stft(S=np.zeros((7, 5)), n_fft=2048)


class TestChromaCQT:
    def test_pitch_class_localization(self):
        from mlx_audio_primitives_tpu.ops.chroma import chroma_cqt

        for freq, klass in [(130.81, 0), (220.0, 9), (440.0, 9)]:
            C = np.asarray(chroma_cqt(_tone(freq)))
            assert C.shape[0] == 12
            assert int(np.argmax(np.median(C, axis=-1))) == klass

    def test_low_frequency_separation(self):
        # 98 Hz (G2) vs 110 Hz (A2): one semitone apart at the low end where
        # STFT chroma blurs; CQT chroma resolves both classes
        from mlx_audio_primitives_tpu.ops.chroma import chroma_cqt

        Cg = np.asarray(chroma_cqt(_tone(98.0)))
        Ca = np.asarray(chroma_cqt(_tone(110.0)))
        assert int(np.argmax(np.median(Cg, axis=-1))) == 7
        assert int(np.argmax(np.median(Ca, axis=-1))) == 9

    def test_merge_bins_per_octave(self):
        from mlx_audio_primitives_tpu.ops.chroma import chroma_cqt

        # 5 octaves at 36 bins/octave: C1..C6 covers the 440 Hz tone
        C = np.asarray(chroma_cqt(_tone(440.0), n_bins=180,
                                  bins_per_octave=36))
        assert C.shape[0] == 12
        assert int(np.argmax(np.median(C, axis=-1))) == 9

    def test_invalid_merge(self):
        from mlx_audio_primitives_tpu.ops.chroma import chroma_cqt

        with pytest.raises(ValueError):
            chroma_cqt(_tone(440.0), bins_per_octave=12, n_chroma=7)


class TestTonnetz:
    def _oracle(self, chroma):
        """f64 transliteration of librosa.feature.tonnetz's projection."""
        chroma = np.asarray(chroma, dtype=np.float64)
        n_chroma = chroma.shape[-2]
        dim_map = np.linspace(0, 12, num=n_chroma, endpoint=False)
        scale = np.asarray([7.0/6, 7.0/6, 3.0/2, 3.0/2, 2.0/3, 2.0/3])
        V = np.multiply.outer(scale, dim_map)
        V[::2] -= 0.5
        R = np.asarray([1.0, 1.0, 1.0, 1.0, 0.5, 0.5])
        phi = R[:, None] * np.cos(np.pi * V)
        l1 = np.abs(chroma).sum(axis=-2, keepdims=True)
        l1 = np.where(l1 < np.finfo(np.float32).tiny, 1.0, l1)
        return phi @ (chroma / l1)

    def test_matches_oracle(self):
        from mlx_audio_primitives_tpu import tonnetz

        rng = np.random.default_rng(0)
        C = rng.uniform(0, 1, size=(12, 20)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(tonnetz(chroma=C)), self._oracle(C), atol=1e-5
        )

    def test_batched_and_bounds(self):
        from mlx_audio_primitives_tpu import tonnetz

        rng = np.random.default_rng(1)
        C = rng.uniform(0, 1, size=(3, 12, 8)).astype(np.float32)
        T = np.asarray(tonnetz(chroma=C))
        assert T.shape == (3, 6, 8)
        # l1-normalized chroma projected on bounded bases: |coord| <= r
        for d, r in enumerate([1.0, 1.0, 1.0, 1.0, 0.5, 0.5]):
            assert np.abs(T[:, d]).max() <= r + 1e-6

    def test_fifth_interval_geometry(self):
        """Pitch classes a fifth apart land close on the fifths circle,
        classes a tritone apart land opposite (Harte et al. 2006)."""
        from mlx_audio_primitives_tpu import tonnetz

        def centroid(klass):
            C = np.zeros((12, 1), np.float32)
            C[klass] = 1.0
            return np.asarray(tonnetz(chroma=C))[:, 0]

        c = centroid(0)
        g = centroid(7)     # perfect fifth
        fs = centroid(6)    # tritone
        d_fifth = np.hypot(*(c[:2] - g[:2]))
        d_tritone = np.hypot(*(c[:2] - fs[:2]))
        assert d_fifth < d_tritone

    def test_from_audio(self, sine_signal):
        from mlx_audio_primitives_tpu import tonnetz

        T = np.asarray(tonnetz(y=sine_signal, sr=22050))
        assert T.shape[0] == 6 and np.all(np.isfinite(T))

    def test_errors(self):
        from mlx_audio_primitives_tpu import tonnetz

        with pytest.raises(ValueError):
            tonnetz()
        with pytest.raises(ValueError):
            tonnetz(chroma=np.zeros((2, 12, 3, 4), np.float32))


class TestChromaCens:
    def _oracle(self, chroma, win_len_smooth=41):
        """f64 transliteration of librosa.feature.chroma_cens
        post-processing (l1 -> quantize -> smooth -> l2)."""
        import scipy.ndimage
        import scipy.signal

        c = np.asarray(chroma, dtype=np.float64)
        l1 = np.abs(c).sum(axis=-2, keepdims=True)
        c = c / np.where(l1 < np.finfo(np.float32).tiny, 1.0, l1)
        q = sum(
            0.25 * (c > s) for s in (0.4, 0.2, 0.1, 0.05)
        )
        if win_len_smooth:
            win = scipy.signal.get_window(
                "hann", win_len_smooth + 2, fftbins=False
            )
            win /= win.sum()
            q = scipy.ndimage.convolve1d(q, win, axis=-1, mode="constant")
        l2 = np.sqrt((q * q).sum(axis=-2, keepdims=True))
        return q / np.where(l2 < np.finfo(np.float32).tiny, 1.0, l2)

    def test_matches_oracle(self):
        from mlx_audio_primitives_tpu import chroma_cens

        rng = np.random.default_rng(0)
        C = rng.uniform(0, 1, size=(12, 100)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(chroma_cens(chroma=C)), self._oracle(C), atol=2e-5
        )

    def test_no_smoothing(self):
        from mlx_audio_primitives_tpu import chroma_cens

        rng = np.random.default_rng(1)
        C = rng.uniform(0, 1, size=(12, 30)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(chroma_cens(chroma=C, win_len_smooth=None)),
            self._oracle(C, win_len_smooth=None),
            atol=2e-6,
        )

    def test_batched(self):
        from mlx_audio_primitives_tpu import chroma_cens

        rng = np.random.default_rng(2)
        C = rng.uniform(0, 1, size=(3, 12, 50)).astype(np.float32)
        out = np.asarray(chroma_cens(chroma=C))
        assert out.shape == C.shape
        np.testing.assert_allclose(out, self._oracle(C), atol=2e-5)

    def test_unit_l2_frames(self):
        from mlx_audio_primitives_tpu import chroma_cens

        rng = np.random.default_rng(3)
        C = rng.uniform(0.1, 1, size=(12, 40)).astype(np.float32)
        out = np.asarray(chroma_cens(chroma=C))
        norms = np.sqrt((out**2).sum(axis=0))
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    def test_from_audio_tempo_robust(self, sine_signal):
        from mlx_audio_primitives_tpu import chroma_cens

        out = np.asarray(chroma_cens(y=sine_signal, sr=22050))
        assert out.shape[0] == 12 and np.all(np.isfinite(out))
        # a steady 440 Hz tone: class A dominates after CENS smoothing
        assert int(np.argmax(out.mean(axis=-1))) == 9

    def test_errors(self):
        from mlx_audio_primitives_tpu import chroma_cens

        with pytest.raises(ValueError):
            chroma_cens()
        with pytest.raises(ValueError):
            chroma_cens(chroma=np.zeros((2, 3, 12, 5), np.float32))


class TestChromaVqt:
    def test_tone_pitch_class(self, sine_signal):
        from mlx_audio_primitives_tpu import chroma_vqt

        C = np.asarray(chroma_vqt(sine_signal, sr=22050))
        assert C.shape[0] == 12
        # 440 Hz = A -> class 9 (base C)
        assert int(np.argmax(np.median(C, axis=-1))) == 9

    def test_gamma_zero_close_to_cqt_chroma(self, sine_signal):
        from mlx_audio_primitives_tpu import chroma_cqt, chroma_vqt

        Cv = np.asarray(chroma_vqt(sine_signal, sr=22050, gamma=0.0))
        Cc = np.asarray(chroma_cqt(sine_signal, sr=22050))
        # both normalized chromagrams agree on the dominant class profile
        assert int(np.argmax(Cv.mean(-1))) == int(np.argmax(Cc.mean(-1)))

    def test_batched(self, sine_signal):
        from mlx_audio_primitives_tpu import chroma_vqt

        Y = np.stack([sine_signal, sine_signal])
        C = chroma_vqt(Y, sr=22050)
        assert C.ndim == 3 and C.shape[:2] == (2, 12)
