"""Pallas kernel equivalence tests (analog of reference
`tests/test_cpp_extension.py`: every fast-path kernel vs the always-available
fallback). On CPU these run the kernels in interpret mode (SURVEY.md §4
"TPU translation")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_primitives_tpu import istft, melspectrogram, stft
from mlx_audio_primitives_tpu.kernels.mel_fused import (
    melspectrogram_pallas,
    radix_supported,
)
from mlx_audio_primitives_tpu.kernels.overlap_add import (
    envelope_for_ola,
    overlap_add_pallas,
)
from mlx_audio_primitives_tpu.ops._frames import overlap_add
from mlx_audio_primitives_tpu.ops.mel import mel_filterbank
from mlx_audio_primitives_tpu.ops.stft import _get_padded_window


class TestOverlapAddPallas:
    @pytest.mark.parametrize("n_fft,hop,F", [(512, 128, 40), (2048, 512, 44),
                                             (1024, 256, 17), (384, 128, 9)])
    def test_matches_xla_chunk_ola(self, n_fft, hop, F):
        rng = np.random.default_rng(0)
        fw = jnp.asarray(rng.standard_normal((2, F, n_fft)).astype(np.float32))
        win = _get_padded_window("hann", n_fft, n_fft)
        out_len = n_fft + (F - 1) * hop
        env = envelope_for_ola(win, F, hop, out_len)
        ours = np.asarray(
            overlap_add_pallas(fw, env, hop_length=hop, output_length=out_len)
        )
        ref = np.asarray(overlap_add(fw, hop, out_len)) / np.asarray(env)
        # rtol, not atol: random (non-STFT) frames divided by the ~1e-8
        # envelope edges reach ~1e8, where TPU summation order costs ~1e-7 rel
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("n_fft,hop", [(512, 100), (1024, 160),
                                           (2048, 441), (512, 64),
                                           (1000, 250)])
    def test_arbitrary_hop(self, n_fft, hop):
        # unaligned hops take the in-kernel lane-rotation path
        rng = np.random.default_rng(1)
        F = 30
        fw = jnp.asarray(rng.standard_normal((2, F, n_fft)).astype(np.float32))
        win = _get_padded_window("hann", n_fft, n_fft)
        out_len = n_fft + (F - 1) * hop
        env = envelope_for_ola(win, F, hop, out_len)
        ours = np.asarray(
            overlap_add_pallas(fw, env, hop_length=hop, output_length=out_len)
        )
        ref = np.asarray(overlap_add(fw, hop, out_len)) / np.asarray(env)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    def test_bad_hop_rejected(self):
        fw = jnp.zeros((1, 4, 512), jnp.float32)
        env = jnp.ones((1000,), jnp.float32)
        with pytest.raises(ValueError):
            overlap_add_pallas(fw, env, hop_length=0, output_length=1000)

    def test_tiny_hop_outside_resource_envelope(self):
        # C = ceil(n_fft/hop) > 64 would blow VMEM/compile time: the kernel
        # rejects it and the istft dispatch silently takes the XLA path
        from mlx_audio_primitives_tpu.kernels.overlap_add import ola_supported

        assert not ola_supported(2048, 2)
        assert ola_supported(2048, 512) and ola_supported(2048, 441)
        fw = jnp.zeros((1, 4, 2048), jnp.float32)
        env = jnp.ones((1000,), jnp.float32)
        with pytest.raises(ValueError):
            overlap_add_pallas(fw, env, hop_length=2, output_length=1000)

    def test_istft_tiny_hop_falls_back(self, random_signal):
        y = random_signal[:4096]
        S = stft(y, n_fft=512, hop_length=4)
        a = np.asarray(istft(S, hop_length=4, use_pallas=True, length=len(y)))
        b = np.asarray(istft(S, hop_length=4, use_pallas=False, length=len(y)))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_istft_use_pallas_roundtrip(self, random_signal):
        S = stft(random_signal, n_fft=2048, hop_length=512)
        y = np.asarray(
            istft(S, hop_length=512, length=len(random_signal), use_pallas=True)
        )
        assert np.abs(y - random_signal).max() <= 1e-5

    def test_istft_pallas_matches_xla(self, random_signal):
        S = stft(random_signal, n_fft=1024, hop_length=256)
        a = np.asarray(istft(S, hop_length=256, use_pallas=True))
        b = np.asarray(istft(S, hop_length=256, use_pallas=False))
        np.testing.assert_allclose(a, b, atol=1e-6)


class TestFusedMelPallas:
    def test_matches_xla_pipeline(self, batch_signals):
        ours = np.asarray(
            melspectrogram(batch_signals, n_mels=64, use_pallas=True)
        )
        ref = np.asarray(melspectrogram(batch_signals, n_mels=64, use_pallas=False))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4 * ref.max())

    def test_1d_input(self, random_signal):
        ours = np.asarray(melspectrogram(random_signal, n_mels=32, use_pallas=True))
        ref = np.asarray(melspectrogram(random_signal, n_mels=32, use_pallas=False))
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4 * ref.max())

    def test_kernel_direct(self, batch_signals):
        n_fft, hop, n_mels = 1024, 256, 40
        fb = mel_filterbank(22050, n_fft, n_mels=n_mels)
        win = _get_padded_window("hann", n_fft, n_fft)
        out = np.asarray(
            melspectrogram_pallas(
                jnp.asarray(batch_signals), win, fb.T,
                n_fft=n_fft, hop_length=hop, center=True, pad_mode="constant",
            )
        )
        ref = np.asarray(
            melspectrogram(batch_signals, n_fft=n_fft, hop_length=hop,
                           n_mels=n_mels, use_pallas=False)
        )
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4 * ref.max())

    @pytest.mark.parametrize("n_fft,hop", [(2048, 512), (1024, 256),
                                           (512, 512), (1024, 512),
                                           (1024, 1024), (512, 128),
                                           (2048, 256), (4096, 1024)])
    def test_radix_combinations(self, n_fft, hop):
        # every (C, R2) radix pairing vs the XLA pipeline
        assert radix_supported(n_fft, hop)
        rng = np.random.default_rng(3)
        y = rng.standard_normal((2, 4 * n_fft)).astype(np.float32)
        win = _get_padded_window("hann", n_fft, n_fft)
        fb = mel_filterbank(22050, n_fft, n_mels=64)
        out = np.asarray(
            melspectrogram_pallas(jnp.asarray(y), win, fb.T, n_fft=n_fft,
                                  hop_length=hop, center=True,
                                  pad_mode="constant")
        )
        ref = np.asarray(
            melspectrogram(y, n_fft=n_fft, hop_length=hop, n_mels=64,
                           use_pallas=False, fft_mode="fft")
        )
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4 * ref.max())

    def test_array_window_and_win_length(self, batch_signals):
        # the radix kernel takes any window table, incl. padded win_length
        kw = dict(n_fft=1024, hop_length=256, n_mels=48, win_length=768,
                  window="hamming")
        out = np.asarray(melspectrogram(batch_signals, use_pallas=True, **kw))
        ref = np.asarray(melspectrogram(batch_signals, use_pallas=False, **kw))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4 * ref.max())

    def test_explicit_fft_mode_pins_xla_path(self, batch_signals):
        # regression: an explicit fft_mode used to be silently swallowed by
        # the pallas auto default; it must route to the requested XLA branch
        kw = dict(n_fft=2048, hop_length=512, n_mels=64)
        pinned = np.asarray(melspectrogram(batch_signals, fft_mode="fft", **kw))
        xla = np.asarray(
            melspectrogram(batch_signals, fft_mode="fft", use_pallas=False, **kw)
        )
        assert np.abs(pinned - xla).max() == 0.0

    def test_invalid_fft_mode_rejected_everywhere(self, batch_signals):
        # must raise on every platform, even where pallas dispatch would win
        with pytest.raises(ValueError):
            melspectrogram(batch_signals, n_mels=32, fft_mode="bogus")

    def test_power_one_magnitude_mel(self, batch_signals):
        # power=1 runs in-kernel (sqrt of the packed power before the mel GEMM)
        kw = dict(n_fft=1024, hop_length=256, n_mels=48, power=1.0)
        out = np.asarray(melspectrogram(batch_signals, use_pallas=True, **kw))
        ref = np.asarray(melspectrogram(batch_signals, use_pallas=False, **kw))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4 * ref.max())

    def test_fallback_on_odd_power(self, batch_signals):
        # power not in {1, 2} silently uses the XLA path even with use_pallas=True
        out = melspectrogram(batch_signals, n_mels=32, power=1.5, use_pallas=True)
        ref = melspectrogram(batch_signals, n_mels=32, power=1.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)

    def test_fast_vs_exact_gemm_modes(self, batch_signals):
        # fast_gemm=True (3-pass bf16 split, the default) must agree with
        # the f32-exact HIGHEST kernel to the documented ~2.7e-5 rel class,
        # and the exact kernel must be far tighter vs the XLA pipeline
        n_fft, hop, n_mels = 1024, 256, 40
        fb = mel_filterbank(22050, n_fft, n_mels=n_mels)
        win = _get_padded_window("hann", n_fft, n_fft)
        kw = dict(n_fft=n_fft, hop_length=hop, center=True,
                  pad_mode="constant")
        y = jnp.asarray(batch_signals)
        fast = np.asarray(
            melspectrogram_pallas(y, win, fb.T, fast_gemm=True, **kw)
        )
        exact = np.asarray(
            melspectrogram_pallas(y, win, fb.T, fast_gemm=False, **kw)
        )
        scale = exact.max()
        np.testing.assert_allclose(fast, exact, rtol=1e-4, atol=1e-4 * scale)
        ref = np.asarray(
            melspectrogram(batch_signals, n_fft=n_fft, hop_length=hop,
                           n_mels=n_mels, use_pallas=False, fft_mode="fft")
        )
        assert np.abs(exact - ref).max() <= 2e-6 * scale
        # and the fast mode is what ANALYSIS_FAST_GEMM=None resolves to
        from mlx_audio_primitives_tpu import _config

        assert _config.ANALYSIS_FAST_GEMM is True
        auto = np.asarray(melspectrogram_pallas(y, win, fb.T, **kw))
        np.testing.assert_array_equal(auto, fast)

    def test_kernel_rejects_unsupported_shape(self, batch_signals):
        fb = mel_filterbank(22050, 1024, n_mels=40)
        win = _get_padded_window("hann", 1024, 1024)
        assert not radix_supported(1024, 100)
        with pytest.raises(ValueError):
            melspectrogram_pallas(
                jnp.asarray(batch_signals), win, fb.T,
                n_fft=1024, hop_length=100, center=True, pad_mode="constant",
            )


class TestGriffinLimPallas:
    def test_matches_xla_path(self, random_signal):
        from mlx_audio_primitives_tpu import griffinlim, stft

        S = np.abs(np.asarray(stft(random_signal[:8192], n_fft=1024,
                                   hop_length=256)))
        kw = dict(n_iter=3, hop_length=256, random_state=0)
        a = np.asarray(griffinlim(S, use_pallas=True, **kw))
        b = np.asarray(griffinlim(S, use_pallas=False, **kw))
        # the grouped loop runs 3-pass bf16-split GEMMs by default
        # (_config.ANALYSIS_FAST_GEMM): ~2.7e-5 spectral noise per transform,
        # amplified through 3 phase projections — observed ~6e-4 max abs
        np.testing.assert_allclose(a, b, atol=5e-3)
        # and both paths must converge equally well against the target
        # magnitude (the fast GEMM noise is far below convergence error)
        from mlx_audio_primitives_tpu import stft as _stft

        err_a = np.abs(np.abs(np.asarray(_stft(a, n_fft=1024,
                                               hop_length=256))) - S).mean()
        err_b = np.abs(np.abs(np.asarray(_stft(b, n_fft=1024,
                                               hop_length=256))) - S).mean()
        assert err_a <= err_b * 1.01 + 1e-6

    def test_grouped_loop_momentum_zero_and_length(self, random_signal):
        # exercises the grouped loop's momentum=0 branch and length crop/pad
        from mlx_audio_primitives_tpu import griffinlim, stft

        S = np.abs(np.asarray(stft(random_signal[:8192], n_fft=1024,
                                   hop_length=256)))
        kw = dict(n_iter=2, hop_length=256, momentum=0.0, length=7000,
                  init="zeros")
        a = np.asarray(griffinlim(S, use_pallas=True, **kw))
        b = np.asarray(griffinlim(S, use_pallas=False, **kw))
        assert a.shape == (7000,)
        # the grouped loop runs fast bf16-split + Karatsuba GEMMs (~3e-5
        # per-iteration spectral noise, amplified across 2 iterations)
        np.testing.assert_allclose(a, b, atol=3e-4)


class TestGroupedLayout:
    """The group-layout spectral domain shared by the fused STFT and ISTFT
    kernels (`stft_radix.py::_group_maps`): conversions invert each other and
    the grouped entry points match their natural-layout wrappers."""

    def test_maps_are_inverse_on_consistent_spectra(self):
        from mlx_audio_primitives_tpu.kernels.stft_radix import (
            group_spectrum,
            naturalize_spectrum,
        )

        rng = np.random.default_rng(11)
        n_fft, hop = 1024, 256
        y = rng.standard_normal((2, 10, n_fft)).astype(np.float32)
        S = jnp.fft.rfft(jnp.asarray(y), axis=-1)  # (B, F, n_bins)
        xg = group_spectrum(S, n_fft, hop)
        back = naturalize_spectrum(xg, n_fft, hop)  # (B, n_bins, F)
        np.testing.assert_allclose(
            np.asarray(jnp.swapaxes(back, 1, 2)), np.asarray(S), atol=1e-6
        )

    def test_stft_grouped_matches_natural_wrapper(self, random_signal):
        from mlx_audio_primitives_tpu.kernels.stft_radix import (
            naturalize_spectrum,
            stft_pallas,
            stft_pallas_grouped,
        )

        n_fft, hop = 1024, 256
        y = jnp.asarray(random_signal[:8192])[None]
        win = _get_padded_window("hann", n_fft, n_fft)
        kw = dict(n_fft=n_fft, hop_length=hop, center=True,
                  pad_mode="constant")
        xg = stft_pallas_grouped(y, win, **kw)
        a = np.asarray(naturalize_spectrum(xg, n_fft, hop))
        b = np.asarray(stft_pallas(y, win, **kw))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_grouped_roundtrip_reconstructs(self, random_signal):
        # stft_pallas_grouped -> istft_pallas_grouped with NO layout
        # conversion in between reconstructs the signal
        from mlx_audio_primitives_tpu.kernels.istft_fused import (
            istft_pallas_grouped,
        )
        from mlx_audio_primitives_tpu.kernels.stft_radix import (
            stft_pallas_grouped,
        )
        from mlx_audio_primitives_tpu.ops._frames import window_envelope

        n_fft, hop = 1024, 256
        L = 8192
        y = jnp.asarray(random_signal[:L])[None]
        win = _get_padded_window("hann", n_fft, n_fft)
        xg = stft_pallas_grouped(y, win, n_fft=n_fft, hop_length=hop,
                                 center=True, pad_mode="constant")
        F = xg.shape[1]
        padded_length = L + n_fft
        env = jnp.maximum(
            window_envelope(win, F, hop, padded_length), 1e-8
        )
        rec = istft_pallas_grouped(
            xg, win, env, n_fft=n_fft, hop_length=hop,
            padded_length=padded_length,
        )
        rec = np.asarray(rec)[0, n_fft // 2 : n_fft // 2 + L]
        assert np.abs(rec - random_signal[:L]).max() <= 1e-5


class TestFusedStftPallas:
    # NOTE: comparisons run on device and fetch real scalars — complex64
    # host transfer is unimplemented on the tunneled TPU attachment (see
    # kernels/bluestein.py:48-50), and these tests also run there.

    @staticmethod
    def _rel(a, b):
        return float(jnp.abs(a - b).max() / jnp.abs(b).max())

    @pytest.mark.parametrize("n_fft,hop", [(2048, 512), (1024, 256),
                                           (512, 128), (1024, 1024),
                                           (2048, 256), (4096, 1024)])
    def test_radix_combinations(self, n_fft, hop):
        from mlx_audio_primitives_tpu.kernels.stft_radix import (
            stft_pallas,
            stft_radix_supported,
        )

        assert stft_radix_supported(n_fft, hop)
        rng = np.random.default_rng(5)
        y = rng.standard_normal((2, 4 * n_fft)).astype(np.float32)
        win = _get_padded_window("hann", n_fft, n_fft)
        out = stft_pallas(jnp.asarray(y), win, n_fft=n_fft, hop_length=hop,
                          center=True, pad_mode="constant")
        ref = stft(y, n_fft=n_fft, hop_length=hop, fft_mode="fft")
        assert self._rel(out, ref) < 1e-5

    def test_dispatch_and_fallbacks(self, random_signal):
        # auto dispatch matches XLA; explicit fft_mode pins the XLA branch;
        # unsupported hop falls back silently
        a = stft(random_signal, n_fft=2048, hop_length=512, use_pallas=True)
        b = stft(random_signal, n_fft=2048, hop_length=512, use_pallas=False)
        assert self._rel(a, b) < 1e-5
        c = stft(random_signal, n_fft=2048, hop_length=512, fft_mode="fft")
        assert float(jnp.abs(c - b).max()) == 0.0
        d = stft(random_signal, n_fft=2048, hop_length=441, use_pallas=True)
        e = stft(random_signal, n_fft=2048, hop_length=441, use_pallas=False)
        assert float(jnp.abs(d - e).max()) == 0.0

    def test_roundtrip_through_istft(self, random_signal):
        S = stft(random_signal, n_fft=1024, hop_length=256, use_pallas=True)
        y = np.asarray(istft(S, hop_length=256, length=len(random_signal)))
        assert np.abs(y - random_signal).max() <= 1e-5

    def test_short_signal_raises_valueerror(self):
        # regression: used to hit an opaque ZeroDivisionError in block sizing
        from mlx_audio_primitives_tpu.kernels.stft_radix import stft_pallas

        win = _get_padded_window("hann", 1024, 1024)
        with pytest.raises(ValueError, match="signal length"):
            stft_pallas(jnp.zeros((1, 100), jnp.float32), win, n_fft=1024,
                        hop_length=256, center=False, pad_mode="constant")

    def test_pad_modes_and_win_length(self, random_signal):
        kw = dict(n_fft=1024, hop_length=256, win_length=600,
                  window="hamming", pad_mode="reflect")
        a = stft(random_signal, use_pallas=True, **kw)
        b = stft(random_signal, use_pallas=False, **kw)
        assert self._rel(a, b) < 1e-5

    def test_magnitude_spectrogram_radix_path(self, random_signal):
        from mlx_audio_primitives_tpu.ops.stft import magnitude_spectrogram

        b = np.asarray(magnitude_spectrogram(random_signal, n_fft=1024,
                                             hop_length=256, use_pallas=False))
        # f32-exact GEMMs: tight vs the XLA pipeline
        a = np.asarray(magnitude_spectrogram(random_signal, n_fft=1024,
                                             hop_length=256, use_pallas=True,
                                             fast_gemm=False))
        np.testing.assert_allclose(a, b, atol=1e-5 * b.max())
        # default fast GEMMs: the documented ~2.7e-5 accuracy class
        f = np.asarray(magnitude_spectrogram(random_signal, n_fft=1024,
                                             hop_length=256, use_pallas=True))
        np.testing.assert_allclose(f, b, atol=1e-4 * b.max())

    def test_flatness_keeps_exact_noise_floor(self, sine_signal):
        # spectral_flatness takes log(power) of every bin, so near-silent
        # bins sit at the spectrum's rounding floor. The fused magnitude
        # path must use f32-exact GEMMs there (fast bf16 GEMMs lift the
        # floor ~200x, above flatness's amin clamp on O(1) tonal signals).
        from mlx_audio_primitives_tpu import spectral_flatness
        from mlx_audio_primitives_tpu.ops.stft import magnitude_spectrogram

        kw = dict(n_fft=1024, hop_length=256)
        exact = np.asarray(magnitude_spectrogram(
            sine_signal, use_pallas=True, fast_gemm=False, **kw))
        fast = np.asarray(magnitude_spectrogram(
            sine_signal, use_pallas=True, fast_gemm=True, **kw))
        # noise-floor ordering on the tone's silent bins (robust: median of
        # the smallest decile)
        n_low = max(1, exact.size // 10)
        floor_exact = np.median(np.sort(exact.ravel())[:n_low])
        floor_fast = np.median(np.sort(fast.ravel())[:n_low])
        assert floor_fast > 1.5 * floor_exact
        # flatness from the exact fused magnitude == XLA flatness (log scale)
        fl_a = np.asarray(spectral_flatness(S=exact.astype(np.float64)**2,
                                            **kw))
        xla = np.asarray(magnitude_spectrogram(sine_signal, use_pallas=False,
                                               **kw))
        fl_b = np.asarray(spectral_flatness(S=xla.astype(np.float64)**2, **kw))
        np.testing.assert_allclose(np.log10(fl_a + 1e-30),
                                   np.log10(fl_b + 1e-30), atol=0.5)

    def test_flatness_routes_fast_gemm_off(self, monkeypatch, sine_signal):
        # wiring check: spectral_flatness's spectrogram request must carry
        # fast_gemm=False into the fused magnitude path
        from mlx_audio_primitives_tpu import spectral_flatness
        import mlx_audio_primitives_tpu.ops.features as feat_mod

        seen = {}
        real = feat_mod.magnitude_spectrogram

        def spy(y, **kwargs):
            seen["fast_gemm"] = kwargs.get("fast_gemm")
            return real(y, **kwargs)

        monkeypatch.setattr(feat_mod, "magnitude_spectrogram", spy)
        spectral_flatness(sine_signal, n_fft=1024, hop_length=256)
        assert seen["fast_gemm"] is False


class TestFusedIstftPallas:
    @pytest.mark.parametrize("n_fft,hop", [(2048, 512), (1024, 256),
                                           (512, 128), (2048, 256),
                                           (4096, 1024)])
    def test_roundtrip_all_radix_pairs(self, n_fft, hop):
        from mlx_audio_primitives_tpu.kernels.istft_fused import (
            istft_fused_supported,
        )

        assert istft_fused_supported(n_fft, hop)
        rng = np.random.default_rng(7)
        y = rng.standard_normal(4 * n_fft).astype(np.float32)
        S = stft(y, n_fft=n_fft, hop_length=hop)
        rec = np.asarray(istft(S, hop_length=hop, length=len(y),
                               use_pallas=True))
        assert np.abs(rec - y).max() <= 1e-5
        ref = np.asarray(istft(S, hop_length=hop, length=len(y),
                               use_pallas=False))
        np.testing.assert_allclose(rec, ref, atol=1e-5)

    def test_hop_equals_nfft_boxcar(self):
        # C=1 (single class) with a NOLA-satisfying window
        rng = np.random.default_rng(8)
        y = rng.standard_normal(4096).astype(np.float32)
        S = stft(y, n_fft=1024, hop_length=1024, window="boxcar")
        rec = np.asarray(istft(S, hop_length=1024, window="boxcar",
                               length=len(y), use_pallas=True))
        assert np.abs(rec - y).max() <= 1e-5

    def test_batched_and_array_window(self, batch_signals):
        win = np.hanning(1024).astype(np.float32)  # array window: env in-graph
        S = stft(batch_signals, n_fft=1024, hop_length=256, window=win)
        a = np.asarray(istft(S, hop_length=256, window=win, use_pallas=True))
        b = np.asarray(istft(S, hop_length=256, window=win, use_pallas=False))
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_unsupported_hop_uses_ola_tier(self, random_signal):
        # hop not a 128 multiple: fused gate fails but the OLA kernel tier
        # still applies; result must match pure XLA
        S = stft(random_signal, n_fft=2048, hop_length=441)
        a = np.asarray(istft(S, hop_length=441, use_pallas=True))
        b = np.asarray(istft(S, hop_length=441, use_pallas=False))
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_length_zero_returns_empty(self, random_signal):
        # degenerate length=0 used to ZeroDivisionError in the kernel block
        # sizing; it must return an empty signal like the XLA path
        S = stft(random_signal[:4096], n_fft=1024, hop_length=256,
                 center=False)
        for up in (True, False):
            out = np.asarray(istft(S, hop_length=256, center=False, length=0,
                                   use_pallas=up))
            assert out.shape == (0,)

    def test_mel_kernel_short_signal_raises(self):
        # center=False with L < n_fft: clear ValueError, not ZeroDivisionError
        from mlx_audio_primitives_tpu.kernels.mel_fused import (
            melspectrogram_pallas,
        )
        from mlx_audio_primitives_tpu.ops.mel import mel_filterbank
        from mlx_audio_primitives_tpu.ops.stft import _get_padded_window

        fb = mel_filterbank(22050, 1024, n_mels=32)
        win = _get_padded_window("hann", 1024, 1024)
        with pytest.raises(ValueError, match="signal length"):
            melspectrogram_pallas(
                jnp.zeros((1, 1023), jnp.float32), win, fb.T,
                n_fft=1024, hop_length=256, center=False,
                pad_mode="constant",
            )

    def test_explicit_fft_mode_disables_fused_tier(self, random_signal):
        # an explicit transform request must actually run that XLA transform
        S = stft(random_signal, n_fft=1024, hop_length=256)
        a = np.asarray(istft(S, hop_length=256, fft_mode="matmul"))
        b = np.asarray(istft(S, hop_length=256, use_pallas=False,
                             fft_mode="matmul"))
        np.testing.assert_allclose(a, b, atol=1e-5)


class TestFusedMomentFeatures:
    """The fused-kernel fast paths that fold weight vectors as
    'filterbanks' (interpret mode on CPU — the dispatch gate skips them
    off-TPU, so exercise the internals directly)."""

    def test_centroid_moments_match_explicit_formula(self, random_signal):
        import jax.numpy as jnp

        from mlx_audio_primitives_tpu import magnitude, spectral_centroid, stft
        from mlx_audio_primitives_tpu.ops.features import (
            _get_frequencies,
            _moments_fused,
        )

        y = jnp.asarray(random_signal)[None]
        freq = _get_frequencies(22050, 2048)
        out = _moments_fused(
            y, freq, n_fft=2048, hop_length=512, win_length=None,
            window="hann", center=True, pad_mode="constant",
        )
        # the gate returns None off-TPU via dispatch; force the kernel by
        # checking gate pieces and calling again under use_pallas semantics
        if out is None:
            from mlx_audio_primitives_tpu.kernels.mel_fused import (
                melspectrogram_pallas,
            )
            from mlx_audio_primitives_tpu.ops.stft import _get_padded_window

            win = _get_padded_window("hann", 2048, 2048)
            fb = jnp.stack([jnp.ones_like(freq), freq], axis=1)
            M = melspectrogram_pallas(
                y, win, fb, n_fft=2048, hop_length=512, center=True,
                pad_mode="constant", power=1.0,
            )
            got = np.asarray(M[:, 1:2, :] / (M[:, 0:1, :] + 1e-10))
        else:
            M0, M1 = out
            got = np.asarray(M1 / (M0 + 1e-10))
        S = magnitude(stft(random_signal, n_fft=2048, hop_length=512))
        ref = np.asarray(spectral_centroid(S=np.asarray(S)[None], sr=22050))
        np.testing.assert_allclose(got, ref, rtol=5e-5, atol=5e-3)


class TestSelectExtremes:
    """Small-k extraction kernel vs sort semantics (spectral_contrast path)."""

    @pytest.mark.parametrize(
        "R,W,k", [(100, 440, 9), (7, 19, 1), (64, 75, 2), (33, 298, 6)]
    )
    def test_matches_sort(self, R, W, k):
        from mlx_audio_primitives_tpu.kernels.select_extremes import (
            quantile_extreme_means_pallas,
        )

        rng = np.random.default_rng(0)
        x = rng.random((R, W)).astype(np.float32)
        lo, hi = quantile_extreme_means_pallas(jnp.asarray(x), k_lo=k, k_hi=k)
        s = np.sort(x, axis=-1)
        np.testing.assert_allclose(
            np.asarray(lo), s[:, :k].mean(-1), rtol=1e-6, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(hi), s[:, -k:].mean(-1), rtol=1e-6, atol=1e-6
        )

    def test_ties_count_like_sort(self):
        from mlx_audio_primitives_tpu.kernels.select_extremes import (
            quantile_extreme_means_pallas,
        )

        # 5 duplicated minima and maxima: a sorted slice counts each
        # instance; the per-pass single-instance removal must match
        x = np.full((4, 64), 0.5, np.float32)
        x[:, :5] = 0.125
        x[:, -5:] = 0.875
        lo, hi = quantile_extreme_means_pallas(jnp.asarray(x), k_lo=3, k_hi=3)
        np.testing.assert_allclose(np.asarray(lo), 0.125)
        np.testing.assert_allclose(np.asarray(hi), 0.875)

    def test_gate(self):
        from mlx_audio_primitives_tpu.kernels.select_extremes import (
            MAX_K,
            select_supported,
        )

        assert select_supported(440, 9, 9)
        assert not select_supported(440, MAX_K + 1, 9)
        assert not select_supported(0, 1, 1)

    def test_spectral_contrast_uses_it_transparently(self, random_signal):
        """Public contrast output is sort-equivalent regardless of path."""
        from mlx_audio_primitives_tpu import spectral_contrast

        got = spectral_contrast(y=random_signal, sr=22050)
        assert got.shape[0] == 7
        assert np.all(np.isfinite(np.asarray(got)))

    def test_gate_rejects_k_above_width(self):
        from mlx_audio_primitives_tpu.kernels.select_extremes import (
            select_supported,
        )

        # quantile ~1.0 on a narrow band: n_quantile can exceed the post-
        # drop width; the kernel must route to the clamping sort path
        assert not select_supported(10, 11, 11)
        assert select_supported(10, 10, 10)

    def test_gradient_matches_sort_formulation(self):
        from mlx_audio_primitives_tpu.kernels.select_extremes import (
            quantile_extreme_means_pallas,
        )

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.random((6, 40)).astype(np.float32))
        k = 3

        def via_kernel(v):
            lo, hi = quantile_extreme_means_pallas(v, k_lo=k, k_hi=k)
            return jnp.sum(lo * 2.0 - hi)

        def via_sort(v):
            s = jnp.sort(v, axis=-1)
            return jnp.sum(
                jnp.mean(s[:, :k], -1) * 2.0 - jnp.mean(s[:, -k:], -1)
            )

        g_kernel = jax.grad(via_kernel)(x)
        g_sort = jax.grad(via_sort)(x)
        np.testing.assert_allclose(
            np.asarray(g_kernel), np.asarray(g_sort), rtol=1e-6, atol=1e-7
        )


class TestTransposedEmitAndKaratsuba:
    """Round-4 kernel variants: transposed-emit grouped STFT (coalesced
    row-gather naturalize) and the 3-GEMM Karatsuba complex base."""

    @staticmethod
    def _rel(a, b):
        return float(jnp.abs(a - b).max() / jnp.abs(b).max())

    @pytest.mark.parametrize("n_fft,hop", [(2048, 512), (1024, 256),
                                           (2048, 256)])
    def test_transposed_emit_matches_stft_pallas(self, n_fft, hop):
        from mlx_audio_primitives_tpu.kernels.stft_radix import (
            naturalize_spectrum_t, stft_pallas, stft_pallas_grouped_t)
        from mlx_audio_primitives_tpu.ops.windows import get_window

        rng = np.random.default_rng(0)
        y = jnp.asarray(rng.standard_normal((2, 22050)).astype(np.float32))
        w = get_window("hann", n_fft)
        S_ref = stft_pallas(y, w, n_fft=n_fft, hop_length=hop, center=True,
                            pad_mode="constant")
        xt = stft_pallas_grouped_t(y, w, n_fft=n_fft, hop_length=hop,
                                   center=True, pad_mode="constant")
        S_t = naturalize_spectrum_t(xt, n_fft, hop)
        assert S_t.shape == S_ref.shape
        assert self._rel(S_t, S_ref) < 1e-6

    def test_karatsuba_base_mel(self):
        from mlx_audio_primitives_tpu.kernels.mel_fused import (
            _basis_table, _mel_radix_core, _twiddle_table)
        from mlx_audio_primitives_tpu.ops.mel import mel_filterbank
        from mlx_audio_primitives_tpu.ops.windows import get_window

        rng = np.random.default_rng(1)
        y = jnp.asarray(rng.standard_normal((2, 22050)).astype(np.float32))
        n_fft, hop = 2048, 512
        w = get_window("hann", n_fft)
        T = _twiddle_table(n_fft, hop)
        Bt = _basis_table(hop)
        fb_t = jnp.swapaxes(mel_filterbank(22050, n_fft, 128), 0, 1)
        kw = dict(n_fft=n_fft, hop_length=hop, center=True,
                  pad_mode="constant")
        m0 = _mel_radix_core(y, w, fb_t, T, Bt, kara=False, **kw)
        m1 = _mel_radix_core(y, w, fb_t, T, Bt, kara=True, **kw)
        # 3M complex multiply: one subtractive cancellation, ~2x rounding
        assert self._rel(m1, m0) < 5e-6

    def test_karatsuba_base_stft_t(self):
        from mlx_audio_primitives_tpu.kernels.stft_radix import (
            naturalize_spectrum_t, stft_pallas, stft_pallas_grouped_t)
        from mlx_audio_primitives_tpu.ops.windows import get_window

        rng = np.random.default_rng(2)
        y = jnp.asarray(rng.standard_normal((2, 22050)).astype(np.float32))
        n_fft, hop = 2048, 512
        w = get_window("hann", n_fft)
        S_ref = stft_pallas(y, w, n_fft=n_fft, hop_length=hop, center=True,
                            pad_mode="constant")
        xt = stft_pallas_grouped_t(y, w, n_fft=n_fft, hop_length=hop,
                                   center=True, pad_mode="constant",
                                   kara=True)
        S_k = naturalize_spectrum_t(xt, n_fft, hop)
        assert self._rel(S_k, S_ref) < 5e-6

    def test_basis_table_karatsuba_planes(self):
        from mlx_audio_primitives_tpu.kernels.mel_fused import _basis_table

        Bt = np.asarray(_basis_table.host(512))
        assert Bt.shape == (4, 4, 128, 128)
        np.testing.assert_allclose(Bt[:, 2], Bt[:, 1] - Bt[:, 0], atol=1e-12)
        np.testing.assert_allclose(Bt[:, 3], Bt[:, 0] + Bt[:, 1], atol=1e-12)

    def test_magnitude_t_routing_at_scale(self):
        # F >= 64 routes magnitude through the transposed-emit kernel;
        # must match |stft| bit-close across the routing boundary
        from mlx_audio_primitives_tpu import stft
        from mlx_audio_primitives_tpu.ops.stft import magnitude_spectrogram

        rng = np.random.default_rng(5)
        y = rng.standard_normal((2, 2 * 22050)).astype(np.float32)  # F=173
        fused = np.asarray(magnitude_spectrogram(y, n_fft=2048,
                                                 hop_length=512))
        composed = np.asarray(jnp.abs(stft(y, n_fft=2048, hop_length=512)))
        assert fused.shape == composed.shape
        np.testing.assert_allclose(
            fused, composed, atol=max(1e-4, 1e-5 * float(composed.max()))
        )


class TestIstftIntakes:
    """Round-5 ISTFT intake variants: transposed (`istft_pallas_t`) and
    natural (`istft_pallas_nat`) must reproduce the grouped kernel / XLA
    inverse exactly, stay differentiable, and honor their support gates
    (A/B record: `benchmarks/kernel_ab_r05.json`)."""

    def _setup(self, n_fft, hop, L, B=2, seed=0):
        from mlx_audio_primitives_tpu.ops.stft import (
            WINDOW_SUM_EPSILON,
            window_envelope,
        )

        rng = np.random.default_rng(seed)
        y = rng.standard_normal((B, L)).astype(np.float32)
        S = stft(y, n_fft=n_fft, hop_length=hop, use_pallas=False)
        F = S.shape[2]
        padded = n_fft + (F - 1) * hop
        win = _get_padded_window("hann", n_fft, n_fft)
        env = jnp.maximum(
            window_envelope(win, F, hop, padded), WINDOW_SUM_EPSILON
        )
        return y, jnp.asarray(S), win, env, padded

    @pytest.mark.parametrize("n_fft,hop,L", [(1024, 256, 22050),
                                             (2048, 512, 3 * 22050),
                                             (512, 128, 6000)])
    def test_transposed_intake_matches_grouped(self, n_fft, hop, L):
        from mlx_audio_primitives_tpu.kernels.istft_fused import (
            istft_pallas,
            istft_pallas_t,
            istft_t_supported,
        )

        assert istft_t_supported(n_fft, hop)
        y, S, win, env, padded = self._setup(n_fft, hop, L)
        a = np.asarray(istft_pallas_t(S, win, env, n_fft=n_fft,
                                      hop_length=hop, padded_length=padded))
        b = np.asarray(istft_pallas(jnp.swapaxes(S, 1, 2), win, env,
                                    n_fft=n_fft, hop_length=hop,
                                    padded_length=padded))
        np.testing.assert_array_equal(a, b)  # shared stages -> bitwise
        pad = n_fft // 2
        assert np.abs(a[:, pad:pad + L] - y).max() <= 1e-5

    @pytest.mark.parametrize("n_fft,hop,L", [(1024, 256, 22050),
                                             (2048, 512, 3 * 22050),
                                             (512, 128, 6000),
                                             (2048, 256, 30000)])
    def test_natural_intake_roundtrip(self, n_fft, hop, L):
        from mlx_audio_primitives_tpu.kernels.istft_fused import (
            istft_nat_supported,
            istft_pallas_nat,
        )

        assert istft_nat_supported(n_fft, hop)
        y, S, win, env, padded = self._setup(n_fft, hop, L)
        a = np.asarray(istft_pallas_nat(S, win, env, n_fft=n_fft,
                                        hop_length=hop,
                                        padded_length=padded))
        pad = n_fft // 2
        assert np.abs(a[:, pad:pad + L] - y).max() <= 1e-5

    def test_natural_intake_exact_base_matches_kara_contract(self):
        from mlx_audio_primitives_tpu.kernels.istft_fused import (
            istft_pallas_nat,
        )

        y, S, win, env, padded = self._setup(1024, 256, 22050)
        a = np.asarray(istft_pallas_nat(S, win, env, n_fft=1024,
                                        hop_length=256, padded_length=padded,
                                        kara=False))
        b = np.asarray(istft_pallas_nat(S, win, env, n_fft=1024,
                                        hop_length=256, padded_length=padded,
                                        kara=True))
        pad = 512
        assert np.abs(a[:, pad:pad + 22050] - y).max() <= 1e-5
        assert np.abs(b[:, pad:pad + 22050] - y).max() <= 1e-5

    def test_public_istft_kara_roundtrip(self):
        # the public istft now rides the exact-Karatsuba grouped kernel
        y = np.random.default_rng(3).standard_normal(4 * 22050).astype(
            np.float32)
        S = stft(y, n_fft=2048, hop_length=512)
        rec = np.asarray(istft(S, hop_length=512, length=len(y)))
        assert np.abs(rec - y).max() <= 1e-5

    def test_intake_grads_finite_and_consistent(self):
        from mlx_audio_primitives_tpu.kernels.istft_fused import (
            istft_pallas_nat,
            istft_pallas_t,
        )

        y, S, win, env, padded = self._setup(1024, 256, 8192)
        # loss over the center-cropped region only: the epsilon-clamped
        # envelope tail amplifies ~1e-6 kernel-order differences into
        # 1e-3 output (and larger gradient) deltas outside the crop
        lo, hi = 512, 512 + 8192

        def loss_t(S):
            return jnp.sum(istft_pallas_t(S, win, env, n_fft=1024,
                                          hop_length=256,
                                          padded_length=padded)[:, lo:hi]
                           ** 2)

        def loss_nat(S):
            return jnp.sum(istft_pallas_nat(S, win, env, n_fft=1024,
                                            hop_length=256,
                                            padded_length=padded)[:, lo:hi]
                           ** 2)

        gt = jax.grad(loss_t)(S)
        gn = jax.grad(loss_nat)(S)
        assert np.isfinite(np.asarray(jnp.abs(gt)).sum())
        scale = float(jnp.abs(gt).max())
        np.testing.assert_allclose(np.asarray(jnp.real(gt)),
                                   np.asarray(jnp.real(gn)),
                                   atol=1e-5 * scale)
        np.testing.assert_allclose(np.asarray(jnp.imag(gt)),
                                   np.asarray(jnp.imag(gn)),
                                   atol=1e-5 * scale)

    def test_nat_group_plan_matches_group_maps(self):
        from mlx_audio_primitives_tpu.kernels.istft_fused import (
            _nat_group_plan,
        )
        from mlx_audio_primitives_tpu.kernels.stft_radix import _group_maps

        for n_fft, hop in [(512, 512), (2048, 512), (1024, 256), (512, 128)]:
            S16 = n_fft // 128
            kmap, sgn = _group_maps(n_fft, hop)
            for g, (base, j0, m2, ua, ub) in enumerate(
                    _nat_group_plan(n_fft, hop)):
                for j in range(128):
                    if j < j0:
                        row, sg = base + S16 * j, 1.0
                    else:
                        u = (128 - j) if base == 0 else (127 - j)
                        row, sg = u * S16 + m2, -1.0
                    assert kmap[g * 128 + j] == row
                    assert sgn[g * 128 + j] == sg

    def test_unsupported_shapes_raise(self):
        from mlx_audio_primitives_tpu.kernels.istft_fused import (
            istft_pallas_grouped_t,
            istft_pallas_nat,
        )

        # host-side inputs only: this test checks the SUPPORT GATES, which
        # raise before any device op — keeping the arrays on the host makes
        # it immune to remote-session state (it once failed on the axon
        # tunnel because an unrelated earlier op had poisoned the session
        # and the jnp.zeros here surfaced the UNIMPLEMENTED)
        win = np.zeros(4096, np.float32)
        env = np.ones(8192, np.float32)
        with pytest.raises(ValueError):
            istft_pallas_nat(np.zeros((1, 2049, 8), np.complex64), win,
                             env, n_fft=4096, hop_length=3, padded_length=8192)
        with pytest.raises(ValueError):
            istft_pallas_grouped_t(np.zeros((1, 10, 8), np.float32), win,
                                   env, n_fft=4096, hop_length=3,
                                   padded_length=8192)
