"""Pitch/autocorrelation tests (port of reference `tests/test_pitch.py`)."""

import numpy as np
import pytest

from mlx_audio_primitives_tpu import autocorrelation, periodicity, pitch_detect_acf


def _acf_oracle(y, max_lag=None, normalize=True, center=True):
    y = y.astype(np.float64)
    n = len(y)
    max_lag = n if max_lag is None else min(max_lag, n)
    if center:
        y = y - y.mean()
    nf = 1 << int(np.ceil(np.log2(2 * n - 1)))
    Y = np.fft.rfft(y, n=nf)
    r = np.fft.irfft(Y * np.conj(Y), n=nf)[:max_lag]
    if normalize:
        r = r / max(r[0], 1e-10)
    return r


class TestAutocorrelation:
    def test_fmax_above_sr_does_not_report_f0_equals_sr(self, sine_signal):
        # regression: fmax > sr made min_lag 0, so the trivially-1.0
        # zero-lag ACF won every frame and f0 came out as exactly sr
        from mlx_audio_primitives_tpu import pitch_detect_acf

        f0, voiced = pitch_detect_acf(sine_signal, sr=22050, fmax=44100)
        f0 = np.asarray(f0)
        voiced = np.asarray(voiced)
        assert not np.any(f0[voiced] == 22050.0)
        # the 440 Hz tone is still found
        mid = f0[voiced]
        assert np.abs(np.median(mid) - 440.0) < 20.0

    def test_matches_oracle(self, random_signal):
        ours = np.asarray(autocorrelation(random_signal, max_lag=500))
        ref = _acf_oracle(random_signal, max_lag=500)
        np.testing.assert_allclose(ours, ref, atol=1e-3)

    def test_r0_is_one(self, random_signal):
        r = np.asarray(autocorrelation(random_signal, max_lag=100))
        np.testing.assert_allclose(r[0], 1.0, atol=1e-5)

    def test_unnormalized(self, short_signal):
        ours = np.asarray(autocorrelation(short_signal, max_lag=64, normalize=False))
        ref = _acf_oracle(short_signal, max_lag=64, normalize=False)
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-2)

    def test_no_center(self, short_signal):
        ours = np.asarray(autocorrelation(short_signal, max_lag=64, center=False))
        ref = _acf_oracle(short_signal, max_lag=64, center=False)
        np.testing.assert_allclose(ours, ref, atol=1e-3)

    def test_sine_peak_at_period(self, sine_signal):
        r = np.asarray(autocorrelation(sine_signal, max_lag=200))
        period = 22050 / 440  # ~50.1
        peak = r[30:].argmax() + 30
        assert abs(peak - period) <= 1

    def test_batched(self, batch_signals):
        r = np.asarray(autocorrelation(batch_signals, max_lag=100))
        assert r.shape == (4, 100)
        single = np.asarray(autocorrelation(batch_signals[2], max_lag=100))
        np.testing.assert_allclose(r[2], single, atol=1e-5)

    def test_default_full_lag(self, short_signal):
        assert autocorrelation(short_signal).shape == (1024,)

    @pytest.mark.parametrize(
        "n,max_lag",
        [
            (22050, 512),   # chunked path (n >= Nc, small lag window)
            (22050, 37),    # tiny lag window, Nc floor at 2048
            (8192, 600),    # Nc = 8192 boundary: n == n_chunk exactly
            (6000, 512),    # below the n >= n_chunk gate -> direct path
            (4096, 2048),   # max_lag == n//2 boundary
            (30000, 4096),  # _ACF_CHUNK_MAX_LAG ceiling
        ],
    )
    @pytest.mark.parametrize("center", [True, False])
    def test_chunked_matches_direct(self, n, max_lag, center):
        """The overlap-save dispatch is numerics-only: whichever path the
        gate picks must agree with the direct Wiener-Khinchin core."""
        from mlx_audio_primitives_tpu.ops.pitch import _autocorrelation_core

        rng = np.random.default_rng(7)
        y = rng.standard_normal((3, n)).astype(np.float32)
        got = np.asarray(autocorrelation(y, max_lag=max_lag, center=center))
        want = np.asarray(
            _autocorrelation_core(
                y, max_lag=max_lag, normalize=True, center=center
            )
        )
        assert got.shape == want.shape == (3, max_lag)
        np.testing.assert_allclose(got, want, atol=2e-6)

    def test_chunked_unnormalized_matches_direct(self):
        from mlx_audio_primitives_tpu.ops.pitch import _autocorrelation_core

        rng = np.random.default_rng(8)
        y = (10.0 * rng.standard_normal((2, 22050))).astype(np.float32)
        got = np.asarray(autocorrelation(y, max_lag=300, normalize=False))
        want = np.asarray(
            _autocorrelation_core(y, max_lag=300, normalize=False, center=True)
        )
        # unnormalized ACF values are cancelling f32 sums of ~22k products:
        # the two paths' different summation orders legitimately differ by
        # O(eps * lag-0 energy), so the absolute floor scales with the peak
        # (a fixed 1e-2 floor failed on real TPU at 3.5e-8 of peak)
        np.testing.assert_allclose(
            got, want, rtol=1e-5, atol=2e-6 * float(np.abs(want).max())
        )


class TestPitchDetect:
    def test_sine_440(self, sine_signal):
        f0, voiced = pitch_detect_acf(sine_signal, sr=22050, fmin=80, fmax=1000)
        f0, voiced = np.asarray(f0), np.asarray(voiced)
        assert voiced.mean() > 0.9
        detected = np.median(f0[voiced])
        assert abs(detected - 440.0) < 15.0

    def test_sine_220(self):
        sr = 22050
        t = np.arange(sr) / sr
        y = np.sin(2 * np.pi * 220.0 * t).astype(np.float32)
        f0, voiced = pitch_detect_acf(y, sr=sr, fmin=80, fmax=1000)
        f0 = np.asarray(f0)[np.asarray(voiced)]
        assert abs(np.median(f0) - 220.0) < 8.0

    def test_silence_unvoiced(self):
        y = np.zeros(22050, np.float32)
        f0, voiced = pitch_detect_acf(y)
        assert not np.asarray(voiced).any()
        assert (np.asarray(f0) == 0).all()

    def test_noise_mostly_unvoiced_or_low_conf(self, random_signal):
        _, voiced = pitch_detect_acf(random_signal, threshold=0.6)
        assert np.asarray(voiced).mean() < 0.3

    def test_batched(self, sine_signal):
        y = np.stack([sine_signal, sine_signal])
        f0, voiced = pitch_detect_acf(y, fmin=80, fmax=1000)
        assert np.asarray(f0).shape[0] == 2
        np.testing.assert_allclose(np.asarray(f0)[0], np.asarray(f0)[1])

    def test_validation(self, sine_signal):
        with pytest.raises(ValueError):
            pitch_detect_acf(sine_signal, fmin=1000, fmax=100)
        with pytest.raises(ValueError):
            pitch_detect_acf(sine_signal, frame_length=0)

    def test_first_peak_not_subharmonic(self):
        """A 440 Hz tone must not be detected at 220 (octave error)."""
        sr = 22050
        t = np.arange(sr) / sr
        y = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
        f0, voiced = pitch_detect_acf(y, sr=sr, fmin=50, fmax=2000)
        med = np.median(np.asarray(f0)[np.asarray(voiced)])
        assert med > 330.0  # would be ~220 on octave error


class TestPeriodicity:
    def test_sine_high_noise_low(self, sine_signal, random_signal):
        ps = np.median(np.asarray(periodicity(sine_signal)))
        pn = np.median(np.asarray(periodicity(random_signal)))
        assert ps > 0.8
        assert pn < 0.5
        assert ps > 2 * pn

    def test_shape(self, sine_signal):
        p = periodicity(sine_signal)
        assert p.shape[0] == 1

    def test_silence_zero(self):
        p = np.asarray(periodicity(np.zeros(22050, np.float32)))
        np.testing.assert_allclose(p, 0.0)

    def test_range(self, sine_signal):
        p = np.asarray(periodicity(sine_signal))
        assert (p >= -1e-5).all() and (p <= 1.0 + 1e-4).all()

    def test_batched(self, batch_signals):
        p = periodicity(batch_signals)
        assert p.shape[0] == 4 and p.shape[1] == 1


class TestFusedFramewiseACF:
    """The fused-radix framewise ACF (lag basis as the kernel's
    "filterbank" + exact centering corrections) must match the
    packed-FFT + lag-GEMM path."""

    def test_fused_equals_xla_path(self, sine_signal, random_signal):
        import jax.numpy as jnp

        import mlx_audio_primitives_tpu.ops.pitch as pm

        lo, hi = pm._lag_bounds(22050, 50.0, 2000.0)
        hi = min(hi + 1, 4096)
        C = pm._acf_lag_basis(4096, lo, hi)
        for sig in (sine_signal, random_signal):
            y = jnp.asarray(sig)[None]
            a, va = pm._framewise_acf_xla(
                y, C, frame_length=2048, hop_length=512, lo=lo, hi=hi
            )
            b, vb = pm._framewise_acf_fused(
                y, C, frame_length=2048, hop_length=512, lo=lo, hi=hi
            )
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-6, rtol=0
            )
            np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))

    def test_fused_gate_rejects_non_divisible_hop(self):
        """hop that does not divide frame/n_fft must take the XLA path
        (and still produce correct results end-to-end)."""
        from mlx_audio_primitives_tpu import pitch_detect_acf

        t = np.arange(22050) / 22050.0
        tone = np.sin(2 * np.pi * 330.0 * t).astype(np.float32)
        f0, v = pitch_detect_acf(tone, sr=22050, hop_length=441)
        f0, v = np.asarray(f0), np.asarray(v)
        med = np.median(f0[v])
        assert abs(med - 330.0) < 6.0, med

    def test_fused_handles_large_dc_offset(self):
        """Regression (code review): the post-hoc centering algebra
        catastrophically cancelled in f32 for DC-dominated signals, giving
        wrong pitch on the fused path only. The global-mean pre-subtraction
        (exact, by shift invariance of the centered ACF) must keep both
        paths in agreement."""
        import jax.numpy as jnp

        import mlx_audio_primitives_tpu.ops.pitch as pm
        from mlx_audio_primitives_tpu import pitch_detect_acf

        sr = 22050
        t = np.arange(sr) / sr
        y = (0.9 + 0.001 * np.sin(2 * np.pi * 330.0 * t)).astype(np.float32)
        lo, hi = pm._lag_bounds(sr, 50.0, 2000.0)
        hi = min(hi + 1, 4096)
        C = pm._acf_lag_basis(4096, lo, hi)
        yp = jnp.pad(jnp.asarray(y)[None], ((0, 0), (1024, 1024)))
        a, _ = pm._framewise_acf_xla(yp, C, frame_length=2048, hop_length=512,
                                     lo=lo, hi=hi)
        b, _ = pm._framewise_acf_fused(yp, C, frame_length=2048,
                                       hop_length=512, lo=lo, hi=hi)
        # residual disagreement is the kernel's own f32 rounding on the
        # center-pad EDGE frames (step content dominates their uncentered
        # power); pre-fix this was 2.09 — catastrophic — now ~0.015
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-2, rtol=0)
        f0, v = pitch_detect_acf(y, sr=sr)
        f0, v = np.asarray(f0), np.asarray(v)
        med = np.median(f0[v])
        assert abs(med - 330.0) < 6.0, med

    @pytest.mark.parametrize(
        "frame_length,hop,fmin,fmax",
        [(2048, 512, 50.0, 2000.0), (2048, 256, 80.0, 1000.0),
         (1024, 256, 60.0, 800.0), (1024, 128, 100.0, 3000.0),
         (512, 128, 150.0, 2000.0), (4096, 512, 40.0, 500.0)],
    )
    def test_fused_equals_xla_config_sweep(self, frame_length, hop, fmin, fmax):
        """Fused-vs-XLA agreement across the radix gate's admissible configs
        (interpret mode on CPU), guarding the centering algebra for every
        (C', lo, hi) combination — not just the librosa defaults."""
        import jax.numpy as jnp

        import mlx_audio_primitives_tpu.ops.pitch as pm

        sr = 22050
        n_fft = pm._next_pow2(2 * frame_length - 1)
        lo, hi = pm._lag_bounds(sr, fmin, fmax)
        hi = min(hi + 1, n_fft)
        from mlx_audio_primitives_tpu.kernels.mel_fused import radix_supported

        if not (n_fft % hop == 0 and frame_length % hop == 0
                and hi - 1 <= frame_length
                and radix_supported(n_fft, hop, hi - lo + 1)):
            pytest.skip("outside the fused gate")
        rng = np.random.default_rng(frame_length + hop)
        t = np.arange(3 * frame_length) / sr
        y = (np.sin(2 * np.pi * 220.0 * t)
             + 0.2 * rng.standard_normal(t.size)).astype(np.float32)
        yd = jnp.asarray(y)[None]
        C = pm._acf_lag_basis(n_fft, lo, hi)
        a, va = pm._framewise_acf_xla(
            yd, C, frame_length=frame_length, hop_length=hop, lo=lo, hi=hi
        )
        b, vb = pm._framewise_acf_fused(
            yd, C, frame_length=frame_length, hop_length=hop, lo=lo, hi=hi
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=0)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))

    def test_constant_frames_unvoiced_both_paths(self):
        """Regression (code review round 2): piecewise-constant audio with
        ZERO global mean defeats the DC pre-conditioning, and the old
        absolute r0 > 1e-10 gate let f32 rounding noise through as
        confident ~1.0 ACF values — on BOTH paths (the XLA path's direct
        r0 for an amp-0.9 constant frame is ~1.8e-10). The noise floors
        are now relative: eps^2 * praw (direct) / eps * r_raw (fused)."""
        import jax.numpy as jnp

        import mlx_audio_primitives_tpu.ops.pitch as pm
        from mlx_audio_primitives_tpu import pitch_detect_acf

        y = np.concatenate(
            [np.full(22050, 0.9), np.full(22050, -0.9)]
        ).astype(np.float32)
        lo, hi = pm._lag_bounds(22050, 50.0, 2000.0)
        hi = min(hi + 1, 4096)
        C = pm._acf_lag_basis(4096, lo, hi)
        yd = jnp.asarray(y)[None]
        _, va = pm._framewise_acf_xla(yd, C, frame_length=2048,
                                      hop_length=512, lo=lo, hi=hi)
        _, vb = pm._framewise_acf_fused(yd, C, frame_length=2048,
                                        hop_length=512, lo=lo, hi=hi)
        va, vb = np.asarray(va)[0], np.asarray(vb)[0]
        # only the handful of frames containing the step edge are voiced
        assert va.sum() <= 6 and vb.sum() <= 6, (va.sum(), vb.sum())
        f0, v = pitch_detect_acf(y, sr=22050)
        v = np.asarray(v)
        assert v.mean() < 0.15, v.mean()
