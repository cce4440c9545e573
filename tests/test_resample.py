"""Resampling parity vs scipy (port of reference `tests/test_resample.py`)."""

import numpy as np
import pytest
import scipy.signal

from mlx_audio_primitives_tpu import resample, resample_poly


class TestResampleFFT:
    @pytest.mark.parametrize("orig,target", [(44100, 22050), (22050, 44100),
                                             (44100, 16000), (16000, 22050)])
    def test_matches_scipy(self, orig, target):
        rng = np.random.default_rng(0)
        y = rng.standard_normal(8000).astype(np.float32)
        ours = np.asarray(resample(y, orig, target))
        n_out = int(round(len(y) * target / orig))
        ref = scipy.signal.resample(y.astype(np.float64), n_out)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-4)

    def test_same_rate_identity(self, random_signal):
        out = np.asarray(resample(random_signal, 22050, 22050))
        np.testing.assert_array_equal(out, random_signal)

    def test_fix_false_uses_ceil(self):
        y = np.zeros(1001, np.float32)
        out = resample(y, 3, 2, fix=False)
        assert out.shape[0] == int(np.ceil(1001 * 2 / 3))

    def test_scale(self):
        rng = np.random.default_rng(1)
        y = rng.standard_normal(4000).astype(np.float32)
        a = np.asarray(resample(y, 44100, 22050, scale=True))
        b = np.asarray(resample(y, 44100, 22050, scale=False))
        np.testing.assert_allclose(a, b * 0.5, rtol=1e-5)

    def test_batched(self):
        rng = np.random.default_rng(2)
        y = rng.standard_normal((3, 4000)).astype(np.float32)
        out = np.asarray(resample(y, 44100, 22050))
        assert out.shape == (3, 2000)
        single = np.asarray(resample(y[0], 44100, 22050))
        np.testing.assert_allclose(out[0], single, atol=1e-5)

    def test_sine_preserved(self):
        sr, f0 = 44100, 1000.0
        t = np.arange(sr) / sr
        y = np.sin(2 * np.pi * f0 * t).astype(np.float32)
        out = np.asarray(resample(y, sr, 22050))
        t2 = np.arange(len(out)) / 22050
        expected = np.sin(2 * np.pi * f0 * t2)
        # interior samples match the ideal bandlimited result
        np.testing.assert_allclose(out[200:-200], expected[200:-200], atol=1e-2)

    def test_linear_mode(self):
        rng = np.random.default_rng(3)
        y = rng.standard_normal(1000).astype(np.float32)
        ours = np.asarray(resample(y, 4, 3, res_type="linear"))
        t = np.linspace(0, 999, 750)
        lo = np.floor(t).astype(int)
        hi = np.minimum(lo + 1, 999)
        ref = (1 - (t - lo)) * y[lo] + (t - lo) * y[hi]
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_unknown_restype(self, random_signal):
        with pytest.raises(ValueError):
            resample(random_signal, 2, 1, res_type="sinc")

    def test_validation(self, random_signal):
        with pytest.raises(ValueError):
            resample(random_signal, 0, 22050)


class TestResamplePoly:
    @pytest.mark.parametrize("up,down", [(1, 2), (2, 1), (3, 2), (160, 441)])
    def test_matches_scipy(self, up, down):
        rng = np.random.default_rng(4)
        y = rng.standard_normal(5000).astype(np.float32)
        ours = np.asarray(resample_poly(y, up, down))
        ref = scipy.signal.resample_poly(y.astype(np.float64), up, down)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-4)

    def test_44k_to_16k_headline(self):
        """Driver headline config: 44.1 kHz -> 16 kHz polyphase, batched."""
        rng = np.random.default_rng(5)
        y = rng.standard_normal((4, 44100)).astype(np.float32)
        ours = np.asarray(resample_poly(y, 160, 441))
        ref = scipy.signal.resample_poly(y.astype(np.float64), 160, 441, axis=-1)
        assert ours.shape == ref.shape == (4, 16000)
        np.testing.assert_allclose(ours, ref, atol=2e-4)

    def test_gcd_simplification(self):
        rng = np.random.default_rng(6)
        y = rng.standard_normal(3000).astype(np.float32)
        a = np.asarray(resample_poly(y, 4, 2))
        b = np.asarray(resample_poly(y, 2, 1))
        np.testing.assert_array_equal(a, b)

    def test_identity(self, random_signal):
        out = np.asarray(resample_poly(random_signal, 7, 7))
        np.testing.assert_array_equal(out, random_signal)

    def test_validation(self, random_signal):
        with pytest.raises(ValueError):
            resample_poly(random_signal, 0, 2)
        with pytest.raises(ValueError):
            resample_poly(random_signal, 2, 1, padtype="bogus")


class TestResamplePolyPadtypes:
    """All scipy resample_poly padtypes (the reference forwards padtype to
    scipy at `resample.py:281`, so scipy's mode set is the parity surface)."""

    PADTYPES = [
        "constant", "edge", "wrap", "symmetric", "reflect", "smooth",
        "antisymmetric", "antireflect", "line",
        "mean", "median", "maximum", "minimum",
    ]

    @pytest.mark.parametrize("padtype", PADTYPES)
    @pytest.mark.parametrize("up,down", [(3, 2), (160, 441)])
    def test_matches_scipy(self, padtype, up, down):
        rng = np.random.default_rng(7)
        # DC offset + trend make the extension modes actually distinguishable
        y = (rng.standard_normal(2205) + 0.5
             + np.linspace(0, 1, 2205)).astype(np.float32)
        ours = np.asarray(resample_poly(y, up, down, padtype=padtype))
        ref = scipy.signal.resample_poly(
            y.astype(np.float64), up, down, padtype=padtype
        )
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-4)

    def test_modes_differ_at_edges(self):
        rng = np.random.default_rng(8)
        y = (rng.standard_normal(1000) + 1.0).astype(np.float32)
        const = np.asarray(resample_poly(y, 3, 2, padtype="constant"))
        edge = np.asarray(resample_poly(y, 3, 2, padtype="edge"))
        assert np.max(np.abs(const[:20] - edge[:20])) > 1e-3
        np.testing.assert_allclose(const[100:-100], edge[100:-100], atol=1e-5)

    def test_cval(self):
        rng = np.random.default_rng(9)
        y = rng.standard_normal(800).astype(np.float32)
        ours = np.asarray(resample_poly(y, 5, 3, padtype="constant", cval=2.5))
        ref = scipy.signal.resample_poly(
            y.astype(np.float64), 5, 3, padtype="constant", cval=2.5
        )
        np.testing.assert_allclose(ours, ref, atol=2e-4)

    def test_cval_with_other_padtype_raises(self, random_signal):
        with pytest.raises(ValueError):
            resample_poly(random_signal, 5, 3, padtype="edge", cval=1.0)

    def test_length_one_signal_all_modes(self):
        """scipy SIGFPEs on reflect with a 1-sample signal; we must not.
        smooth degenerates to edge (zero slope)."""
        y = np.array([2.0], np.float32)
        for pt in ("constant", "edge", "wrap", "symmetric", "reflect",
                   "smooth", "line", "mean", "median", "maximum", "minimum"):
            out = np.asarray(resample_poly(y, 3, 2, padtype=pt))
            assert out.shape == (2,) and np.all(np.isfinite(out))
        ref_edge = np.asarray(resample_poly(y, 3, 2, padtype="edge"))
        np.testing.assert_allclose(
            np.asarray(resample_poly(y, 3, 2, padtype="smooth")), ref_edge
        )

    def test_anti_modes_short_signal_raises(self):
        y = np.ones(10, dtype=np.float32)
        with pytest.raises(ValueError):
            resample_poly(y, 3, 2, padtype="antisymmetric")

    def test_batched_padtype(self):
        rng = np.random.default_rng(10)
        y = rng.standard_normal((3, 1500)).astype(np.float32)
        ours = np.asarray(resample_poly(y, 2, 3, padtype="line"))
        ref = scipy.signal.resample_poly(
            y.astype(np.float64), 2, 3, axis=-1, padtype="line"
        )
        np.testing.assert_allclose(ours, ref, atol=2e-4)


class TestResampleResTypes:
    """librosa-familiar res_type surface on `resample` (VERDICT r3 item 7):
    'polyphase' (scipy default kaiser-beta-5 FIR) and resampy's
    'kaiser_best'/'kaiser_fast' designs, all on the owned polyphase GEMM.
    Oracle: scipy.signal.resample_poly with the SAME published filter
    design — independent of our frame/GEMM machinery."""

    def test_polyphase_matches_scipy(self, random_signal):
        from mlx_audio_primitives_tpu import resample

        ours = np.asarray(resample(random_signal, 22050, 16000,
                                   res_type="polyphase"))
        ref = scipy.signal.resample_poly(
            random_signal.astype(np.float64), 16000 // 50, 22050 // 50
        )[: len(ours)]
        assert ours.shape == (16000,)
        np.testing.assert_allclose(ours, ref, atol=2e-5)

    @pytest.mark.parametrize("design", ["kaiser_best", "kaiser_fast"])
    def test_kaiser_matches_scipy_designed_fir(self, random_signal, design):
        import math

        from mlx_audio_primitives_tpu import resample
        from mlx_audio_primitives_tpu.ops.resample import (
            _FIR_DESIGNS, _fir_half_len)

        ours = np.asarray(resample(random_signal, 22050, 16000,
                                   res_type=design))
        g = math.gcd(16000, 22050)
        up, down = 16000 // g, 22050 // g
        _, rolloff, beta = _FIR_DESIGNS[design]
        hl = _fir_half_len(up, down, design)
        h = scipy.signal.firwin(2 * hl + 1, rolloff / max(up, down),
                                window=("kaiser", beta))
        ref = scipy.signal.resample_poly(
            random_signal.astype(np.float64), up, down, window=h
        )[: len(ours)]
        assert ours.shape == (16000,)
        np.testing.assert_allclose(ours, ref, atol=2e-5)

    def test_kaiser_tone_passband_unity(self):
        from mlx_audio_primitives_tpu import resample

        t = np.arange(22050) / 22050
        tone = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
        out = np.asarray(resample(tone, 22050, 16000,
                                  res_type="kaiser_best"))
        t2 = np.arange(len(out)) / 16000
        expected = np.sin(2 * np.pi * 1000.0 * t2)
        # interior samples: near-perfect bandlimited interpolation
        np.testing.assert_allclose(out[200:-200], expected[200:-200],
                                   atol=1e-3)

    def test_upsample_roundtrip(self):
        # kaiser_fast's 0.85 rolloff removes the top 15% of the band by
        # design, so round-trip fidelity only holds for bandlimited input
        from mlx_audio_primitives_tpu import resample

        t = np.arange(22050) / 22050
        y = sum(np.sin(2 * np.pi * f * t + 0.1 * f)
                for f in (220.0, 1500.0, 6000.0))
        y = y.astype(np.float32)
        up = np.asarray(resample(y, 22050, 44100, res_type="kaiser_fast"))
        assert up.shape == (44100,)
        back = np.asarray(resample(up, 44100, 22050,
                                   res_type="kaiser_fast"))
        err = np.abs(back[500:-500] - y[500:-500]).max()
        assert err < 5e-3

    def test_non_integer_sr_raises(self, random_signal):
        from mlx_audio_primitives_tpu import resample

        with pytest.raises(ValueError):
            resample(random_signal, 22050.5, 16000, res_type="kaiser_best")

    def test_unknown_res_type_raises(self, random_signal):
        from mlx_audio_primitives_tpu import resample

        with pytest.raises(ValueError):
            resample(random_signal, 22050, 16000, res_type="soxr_hq")
