"""Native C++ table-builder tests (analog of reference
`tests/test_cpp_extension.py`: module-level skip when the native build is
absent keeps the suite green, `:15-18`)."""

import numpy as np
import pytest
import scipy.fft
import scipy.signal

from mlx_audio_primitives_tpu._native import (
    HAS_NATIVE,
    native_dct_basis_t,
    native_hz_to_mel,
    native_mel_to_hz,
    native_mel_filterbank,
    native_window,
)

from oracles import hz_to_mel_np, mel_filterbank_np

pytestmark = pytest.mark.skipif(not HAS_NATIVE, reason="native library not built")


class TestNativeWindows:
    @pytest.mark.parametrize("name", ["hann", "hamming", "blackman", "bartlett"])
    @pytest.mark.parametrize("n,fftbins", [(64, True), (255, False), (2048, True)])
    def test_exact_vs_scipy(self, name, n, fftbins):
        w = native_window(name, n, fftbins, None)
        ref = scipy.signal.get_window(name, n, fftbins=fftbins)
        np.testing.assert_allclose(w, ref, atol=1e-14, rtol=0)

    def test_rectangular(self):
        np.testing.assert_array_equal(
            native_window("rectangular", 100, True, None), np.ones(100)
        )

    def test_kaiser(self):
        w = native_window("kaiser", 512, True, 8.6)
        ref = scipy.signal.get_window(("kaiser", 8.6), 512, fftbins=True)
        np.testing.assert_allclose(w, ref, atol=1e-13)

    def test_length_one(self):
        np.testing.assert_array_equal(native_window("hann", 1, True, None), [1.0])

    def test_unknown_kind_returns_none(self):
        assert native_window("nuttall", 64, True, None) is None


class TestNativeMelFilterbank:
    @pytest.mark.parametrize("htk", [False, True])
    @pytest.mark.parametrize("norm", ["slaney", None])
    def test_matches_librosa_algorithm(self, htk, norm):
        fb = native_mel_filterbank(22050, 1024, 64, 0.0, 11025.0, htk, norm)
        ref = mel_filterbank_np(22050, 1024, n_mels=64, htk=htk, norm=norm)
        np.testing.assert_allclose(fb, ref, atol=1e-12)

    def test_fmin_fmax(self):
        fb = native_mel_filterbank(16000, 512, 26, 100.0, 7000.0, False, "slaney")
        ref = mel_filterbank_np(16000, 512, n_mels=26, fmin=100.0, fmax=7000.0)
        np.testing.assert_allclose(fb, ref, atol=1e-12)

    def test_unknown_norm_returns_none(self):
        assert native_mel_filterbank(22050, 512, 10, 0, 11025, False, "l2") is None


class TestNativeBarkLinearFilterbanks:
    """`csrc/tables.cpp::mapt_bark_filterbank` / `mapt_linear_filterbank`
    vs the NumPy f64 builders in `ops/filterbanks.py` — same construction,
    bit-exact in the served float32 precision (zwicker's Newton iteration
    accumulates ~1-ulp f64 libm differences that vanish in the f32 cast)."""

    @pytest.mark.parametrize("formula", ["zwicker", "traunmuller"])
    @pytest.mark.parametrize("norm", ["slaney", None])
    def test_bark_matches_numpy_builder(self, formula, norm):
        from mlx_audio_primitives_tpu._native import native_bark_filterbank
        import mlx_audio_primitives_tpu.ops.filterbanks as fbmod

        from mlx_audio_primitives_tpu import _native as nat_mod

        if not hasattr(nat_mod._lib, "mapt_bark_filterbank"):
            pytest.skip("stale native build lacks the bark builder symbol")
        nat = native_bark_filterbank(22050, 1024, 24, 0.0, 11025.0, formula, norm)
        assert nat is not None  # symbol present => a None is a real failure
        bmin = fbmod.hz_to_bark(np.array([0.0]), formula=formula)[0]
        bmax = fbmod.hz_to_bark(np.array([11025.0]), formula=formula)[0]
        pts = fbmod.bark_to_hz(np.linspace(bmin, bmax, 26), formula=formula)
        ref = fbmod._triangular_filterbank(pts, 22050, 1024, 24, norm)
        np.testing.assert_allclose(nat, ref, atol=1e-13, rtol=0)
        np.testing.assert_array_equal(
            nat.astype(np.float32), ref.astype(np.float32)
        )

    @pytest.mark.parametrize("norm", ["slaney", None])
    def test_linear_matches_numpy_builder(self, norm):
        from mlx_audio_primitives_tpu._native import native_linear_filterbank
        import mlx_audio_primitives_tpu.ops.filterbanks as fbmod

        from mlx_audio_primitives_tpu import _native as nat_mod

        if not hasattr(nat_mod._lib, "mapt_linear_filterbank"):
            pytest.skip("stale native build lacks the linear builder symbol")
        nat = native_linear_filterbank(16000, 512, 64, 100.0, 8000.0, norm)
        assert nat is not None
        ref = fbmod._triangular_filterbank(
            np.linspace(100.0, 8000.0, 66), 16000, 512, 64, norm
        )
        np.testing.assert_array_equal(nat, ref)

    def test_invalid_args_return_none(self):
        from mlx_audio_primitives_tpu._native import (
            native_bark_filterbank,
            native_linear_filterbank,
        )

        assert native_bark_filterbank(22050, 512, 10, 0, 11025, "mel", "slaney") is None
        assert native_bark_filterbank(22050, 512, 10, 0, 11025, "zwicker", "l2") is None
        assert native_linear_filterbank(22050, 512, 10, 0, 11025, "l2") is None

    def test_public_op_serves_native_table(self):
        """bark_filterbank/linear_filterbank round through the native path
        (values equal the NumPy construction regardless of which built it)."""
        from mlx_audio_primitives_tpu import bark_filterbank, linear_filterbank
        import mlx_audio_primitives_tpu.ops.filterbanks as fbmod

        fb = np.asarray(bark_filterbank(22050, 512, n_bands=24))
        bmin = fbmod.hz_to_bark(np.array([0.0]))[0]
        bmax = fbmod.hz_to_bark(np.array([11025.0]))[0]
        pts = fbmod.bark_to_hz(np.linspace(bmin, bmax, 26))
        ref = fbmod._triangular_filterbank(pts, 22050, 512, 24, "slaney")
        np.testing.assert_array_equal(fb, ref.astype(np.float32))
        lb = np.asarray(linear_filterbank(22050, 512, n_bands=32))
        refl = fbmod._triangular_filterbank(
            np.linspace(0.0, 11025.0, 34), 22050, 512, 32, "slaney"
        )
        np.testing.assert_array_equal(lb, refl.astype(np.float32))


class TestNativeDCT:
    @pytest.mark.parametrize("norm", ["ortho", None])
    def test_matches_scipy(self, norm):
        basis_t = native_dct_basis_t(20, 64, norm)
        ref = scipy.fft.dct(np.eye(64), type=2, norm=norm, axis=-1)[:, :20]
        np.testing.assert_allclose(np.eye(64) @ basis_t, ref, atol=1e-13)


class TestNativeMelScale:
    @pytest.mark.parametrize("htk", [False, True])
    def test_hz_to_mel(self, htk):
        f = np.array([0.0, 200.0, 440.0, 999.9, 1000.0, 4000.0, 11025.0])
        np.testing.assert_allclose(
            native_hz_to_mel(f, htk), hz_to_mel_np(f, htk=htk), atol=1e-12
        )

    @pytest.mark.parametrize("htk", [False, True])
    def test_mel_to_hz_roundtrip(self, htk):
        f = np.array([0.0, 200.0, 440.0, 999.9, 1000.0, 4000.0, 11025.0])
        m = native_hz_to_mel(f, htk)
        np.testing.assert_allclose(native_mel_to_hz(m, htk), f, atol=1e-8)


class TestIntegration:
    def test_library_uses_native_builders(self):
        """The cached public tables equal the native f64 tables cast to f32."""
        from mlx_audio_primitives_tpu import get_window, mel_filterbank
        from mlx_audio_primitives_tpu.utils.cache import clear_all_caches

        clear_all_caches()
        w = np.asarray(get_window("hann", 999))
        ref = native_window("hann", 999, True, None).astype(np.float32)
        np.testing.assert_array_equal(w, ref)

        fb = np.asarray(mel_filterbank(22050, 512, n_mels=20))
        ref = native_mel_filterbank(
            22050, 512, 20, 0.0, 11025.0, False, "slaney"
        ).astype(np.float32)
        np.testing.assert_array_equal(fb, ref)

    def test_kaiser_default_beta_matches_fallback(self):
        """get_window('kaiser', n) must use beta=8.6 on BOTH paths (a native
        'beta or 0.0' coercion once produced a rectangular window)."""
        w = native_window("kaiser", 64, True, None)
        ref = scipy.signal.get_window(("kaiser", 8.6), 64, fftbins=True)
        np.testing.assert_allclose(w, ref, atol=1e-13)
        assert w[0] < 0.01  # tapered, not rectangular
