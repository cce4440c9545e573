"""Bluestein arbitrary-length FFT tests (kernels/bluestein.py).

On TPU, XLA lowers non-power-of-2 FFTs to a dense (n, n) DFT matmul (7.8 GB
for n=44100); these verify the chirp-Z replacement against numpy across
length classes and through the public resample/stft paths.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mlx_audio_primitives_tpu import istft, resample, stft
from mlx_audio_primitives_tpu.kernels.bluestein import (
    fft_bluestein,
    ifft_bluestein,
    irfft_len,
    rfft_len,
)


@pytest.mark.parametrize("n", [7, 100, 441, 1000, 22050, 44100])
def test_fft_bluestein_matches_numpy(n):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))).astype(
        np.complex64
    )
    ours = np.asarray(fft_bluestein(jnp.asarray(x), n=n))
    ref = np.fft.fft(x.astype(np.complex128), axis=-1)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(ours, ref, atol=3e-4 * scale)


@pytest.mark.parametrize("n", [100, 441, 44100])
def test_ifft_bluestein_roundtrip(n):
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((1, n)) + 1j * rng.standard_normal((1, n))).astype(
        np.complex64
    )
    back = np.asarray(ifft_bluestein(fft_bluestein(jnp.asarray(x), n=n), n=n))
    np.testing.assert_allclose(back, x, atol=2e-4 * np.abs(x).max())


@pytest.mark.parametrize("n", [128, 441, 6000, 44100])
def test_rfft_len_matches_numpy(n):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, n)).astype(np.float32)
    ours = np.asarray(rfft_len(jnp.asarray(x), n))
    ref = np.fft.rfft(x.astype(np.float64), axis=-1)
    np.testing.assert_allclose(ours, ref, atol=3e-4 * np.abs(ref).max())


@pytest.mark.parametrize("n", [128, 441, 6000, 44100])
def test_irfft_len_matches_numpy(n):
    rng = np.random.default_rng(3)
    X = np.fft.rfft(rng.standard_normal((2, n))).astype(np.complex64)
    ours = np.asarray(irfft_len(jnp.asarray(X), n))
    ref = np.fft.irfft(X.astype(np.complex128), n=n, axis=-1)
    np.testing.assert_allclose(ours, ref, atol=3e-4 * np.abs(ref).max() + 1e-6)


def test_resample_nonpow2_path():
    """44100 -> 16000 FFT resample (both lengths non-pow2) still matches scipy."""
    import scipy.signal

    rng = np.random.default_rng(4)
    y = rng.standard_normal(44100).astype(np.float32)
    ours = np.asarray(resample(y, 44100, 16000))
    ref = scipy.signal.resample(y.astype(np.float64), 16000)
    np.testing.assert_allclose(ours, ref, atol=3e-4)


def test_nonpow2_nfft_stft_roundtrip():
    """Odd n_fft sizes route through Bluestein and still reconstruct."""
    rng = np.random.default_rng(5)
    y = rng.standard_normal(12000).astype(np.float32)
    n_fft, hop = 6000, 1500  # > DFT-GEMM threshold, non-pow2
    S = stft(y, n_fft=n_fft, hop_length=hop)
    rec = np.asarray(istft(S, hop_length=hop, n_fft=n_fft, length=len(y)))
    np.testing.assert_allclose(rec, y, atol=5e-4)


def test_small_nonpow2_uses_dft_gemm():
    """n <= 4096 non-pow2 lengths go through the DFT-GEMM (exact vs numpy)."""
    rng = np.random.default_rng(6)
    x = rng.standard_normal((3, 441)).astype(np.float32)
    ours = np.asarray(rfft_len(jnp.asarray(x), 441))
    ref = np.fft.rfft(x.astype(np.float64), axis=-1)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


class TestPackedTransforms:
    def test_rfft_packed_odd_rows(self):
        from mlx_audio_primitives_tpu.kernels.bluestein import rfft_packed

        rng = np.random.default_rng(7)
        x = rng.standard_normal((5, 256)).astype(np.float32)  # odd rows
        ours = np.asarray(rfft_packed(jnp.asarray(x)))
        ref = np.fft.rfft(x.astype(np.float64), axis=-1)
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_rfft_packed_3d(self):
        from mlx_audio_primitives_tpu.kernels.bluestein import rfft_packed

        rng = np.random.default_rng(8)
        x = rng.standard_normal((3, 7, 128)).astype(np.float32)
        ours = np.asarray(rfft_packed(jnp.asarray(x)))
        ref = np.fft.rfft(x.astype(np.float64), axis=-1)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_irfft_packed_matches_numpy(self):
        from mlx_audio_primitives_tpu.kernels.bluestein import irfft_packed

        rng = np.random.default_rng(9)
        X = np.fft.rfft(rng.standard_normal((6, 512)), axis=-1).astype(np.complex64)
        ours = np.asarray(irfft_packed(jnp.asarray(X), 512))
        ref = np.fft.irfft(X.astype(np.complex128), n=512, axis=-1)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_irfft_packed_nonhermitian_dc_nyquist(self):
        """Complex DC/Nyquist bins must follow irfft's use-real-part rule,
        with no leakage between the packed pair."""
        from mlx_audio_primitives_tpu.kernels.bluestein import irfft_packed

        rng = np.random.default_rng(10)
        X = (rng.standard_normal((4, 65)) + 1j * rng.standard_normal((4, 65))
             ).astype(np.complex64)  # fully complex incl. DC/Nyquist
        ours = np.asarray(irfft_packed(jnp.asarray(X), 128))
        ref = np.fft.irfft(X.astype(np.complex128), n=128, axis=-1)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_roundtrip_packed(self):
        from mlx_audio_primitives_tpu.kernels.bluestein import (
            irfft_packed,
            rfft_packed,
        )

        rng = np.random.default_rng(11)
        x = rng.standard_normal((8, 1024)).astype(np.float32)
        back = np.asarray(irfft_packed(rfft_packed(jnp.asarray(x)), 1024))
        np.testing.assert_allclose(back, x, atol=1e-5)


class TestPackedPower:
    """Direct |rfft|^2 without the hermitian complex unpack
    (`bluestein.packed_power_rows`); feeds the fused mel pipeline."""

    @pytest.mark.parametrize("rows", [2, 5, 8])
    def test_rfft_power_packed_matches_numpy(self, rows):
        from mlx_audio_primitives_tpu.kernels.bluestein import rfft_power_packed

        rng = np.random.default_rng(21)
        x = rng.standard_normal((rows, 512)).astype(np.float32)
        ours = np.asarray(rfft_power_packed(jnp.asarray(x)))
        ref = np.abs(np.fft.rfft(x.astype(np.float64), axis=-1)) ** 2
        np.testing.assert_allclose(ours, ref, atol=1e-2, rtol=1e-4)

    @pytest.mark.parametrize("n", [400, 512, 1000])  # pow2 and not
    def test_rfft_power_len_dispatch(self, n):
        from mlx_audio_primitives_tpu.kernels.bluestein import rfft_power_len

        rng = np.random.default_rng(22)
        x = rng.standard_normal((4, n)).astype(np.float32)
        ours = np.asarray(rfft_power_len(jnp.asarray(x), n))
        ref = np.abs(np.fft.rfft(x.astype(np.float64), axis=-1)) ** 2
        np.testing.assert_allclose(ours, ref, atol=1e-2, rtol=1e-4)

    def test_rfft_power_len_single_row(self):
        from mlx_audio_primitives_tpu.kernels.bluestein import rfft_power_len

        rng = np.random.default_rng(23)
        x = rng.standard_normal(1024).astype(np.float32)
        ours = np.asarray(rfft_power_len(jnp.asarray(x), 1024))
        ref = np.abs(np.fft.rfft(x.astype(np.float64))) ** 2
        np.testing.assert_allclose(ours, ref, atol=1e-2, rtol=1e-4)

    @pytest.mark.parametrize("rows", [3, 6])
    def test_rfft_power_sixstep_matches_numpy(self, rows):
        from mlx_audio_primitives_tpu.kernels.sixstep import rfft_power_sixstep

        rng = np.random.default_rng(24)
        x = rng.standard_normal((rows, 2048)).astype(np.float32)
        ours = np.asarray(rfft_power_sixstep(jnp.asarray(x), 2048))
        ref = np.abs(np.fft.rfft(x.astype(np.float64), axis=-1)) ** 2
        # sixstep runs at Precision.HIGH: wider band than the jnp.fft path
        scale = ref.max()
        assert np.max(np.abs(ours - ref)) / scale < 5e-4


class TestSixStep:
    @pytest.mark.parametrize("n", [256, 1024, 2048, 4096, 16384])
    def test_fft_matches_numpy(self, n):
        from mlx_audio_primitives_tpu.kernels.sixstep import fft_sixstep

        rng = np.random.default_rng(12)
        x = (rng.standard_normal((4, n)) + 1j * rng.standard_normal((4, n))
             ).astype(np.complex64)
        out = np.asarray(fft_sixstep(jnp.asarray(x), n=n))
        ref = np.fft.fft(x.astype(np.complex128), axis=-1)
        # HIGH-precision operating point: ~3e-5 relative
        assert np.abs(out - ref).max() / np.abs(ref).max() < 2e-4

    def test_rfft_irfft_roundtrip(self):
        from mlx_audio_primitives_tpu.kernels.sixstep import (
            irfft_sixstep,
            rfft_sixstep,
        )

        rng = np.random.default_rng(13)
        x = rng.standard_normal((6, 2048)).astype(np.float32)
        back = np.asarray(irfft_sixstep(rfft_sixstep(jnp.asarray(x), 2048), 2048))
        np.testing.assert_allclose(back, x, atol=5e-4)

    def test_stft_sixstep_mode(self):
        rng = np.random.default_rng(14)
        y = rng.standard_normal(8192).astype(np.float32)
        a = np.asarray(jnp.abs(stft(y, n_fft=1024, hop_length=256)))
        b = np.asarray(jnp.abs(stft(y, n_fft=1024, hop_length=256,
                                    fft_mode="sixstep")))
        np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-3)

    def test_sixstep_roundtrip(self):
        rng = np.random.default_rng(15)
        y = rng.standard_normal(8192).astype(np.float32)
        S = stft(y, n_fft=1024, hop_length=256, fft_mode="sixstep")
        rec = np.asarray(istft(S, hop_length=256, length=len(y),
                               fft_mode="sixstep"))
        assert np.abs(rec - y).max() < 5e-4

    def test_unsupported_size_falls_back(self):
        # non-pow2 n_fft with fft_mode='sixstep' silently uses the fft path
        rng = np.random.default_rng(16)
        y = rng.standard_normal(4000).astype(np.float32)
        a = np.asarray(jnp.abs(stft(y, n_fft=500, hop_length=125,
                                    fft_mode="sixstep")))
        b = np.asarray(jnp.abs(stft(y, n_fft=500, hop_length=125)))
        np.testing.assert_allclose(a, b, atol=1e-5)


class TestGeneralGemmFFT:
    """Two-factor GEMM FFT for balanced composite lengths (sixstep.py)."""

    @pytest.mark.parametrize("n", [6000, 11025, 44100, 88200])
    def test_rfft_matches_numpy(self, n):
        from mlx_audio_primitives_tpu.kernels.sixstep import rfft_general

        rng = np.random.default_rng(0)
        x = rng.standard_normal((3, n)).astype(np.float32)
        S = np.asarray(rfft_general(jnp.asarray(x), n))
        ref = np.fft.rfft(x)
        assert np.abs(S - ref).max() / np.abs(ref).max() < 2e-6

    @pytest.mark.parametrize("n", [6000, 11025, 44100])
    def test_rfft_irfft_roundtrip(self, n):
        from mlx_audio_primitives_tpu.kernels.sixstep import (
            irfft_general,
            rfft_general,
        )

        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, n)).astype(np.float32)
        back = np.asarray(irfft_general(rfft_general(jnp.asarray(x), n), n))
        assert np.abs(back - x).max() < 1e-5

    def test_cfft_matches_numpy(self):
        from mlx_audio_primitives_tpu.kernels.sixstep import fft_general

        rng = np.random.default_rng(2)
        z = (rng.standard_normal((2, 6000))
             + 1j * rng.standard_normal((2, 6000))).astype(np.complex64)
        F = np.asarray(fft_general(jnp.asarray(z), n=6000))
        ref = np.fft.fft(z)
        assert np.abs(F - ref).max() / np.abs(ref).max() < 2e-6

    def test_single_row_and_odd_rows(self):
        from mlx_audio_primitives_tpu.kernels.sixstep import rfft_general

        rng = np.random.default_rng(3)
        x1 = rng.standard_normal(6000).astype(np.float32)
        S1 = np.asarray(rfft_general(jnp.asarray(x1), 6000))
        ref1 = np.fft.rfft(x1)
        assert np.abs(S1 - ref1).max() / np.abs(ref1).max() < 2e-6
        x3 = rng.standard_normal((3, 6000)).astype(np.float32)
        S3 = np.asarray(rfft_general(jnp.asarray(x3), 6000))
        assert np.abs(S3 - np.fft.rfft(x3)).max() / np.abs(np.fft.rfft(x3)).max() < 2e-6


class TestDispatchPolicy:
    """Assert WHICH transform path dispatch selects (not just numerics)."""

    def test_rfft_len_pow2_multirow_uses_packed(self, monkeypatch):
        import mlx_audio_primitives_tpu.kernels.bluestein as bl

        called = {}
        orig = bl.rfft_packed
        monkeypatch.setattr(bl, "rfft_packed",
                            lambda x: called.setdefault("packed", True) or orig(x))
        bl.rfft_len(jnp.zeros((4, 256), jnp.float32), 256)
        assert called.get("packed")

    def test_rfft_len_small_nonpow2_uses_gemm(self, monkeypatch):
        import mlx_audio_primitives_tpu.kernels.bluestein as bl

        called = {}
        orig = bl.rdft_matmul
        monkeypatch.setattr(bl, "rdft_matmul",
                            lambda x, n, b=None: called.setdefault("gemm", True)
                            or orig(x, n, b))
        bl.rfft_len(jnp.zeros((2, 441), jnp.float32), 441)
        assert called.get("gemm")

    def test_rfft_len_large_prime_uses_bluestein(self, monkeypatch):
        # 9973 is prime: no balanced factorization, so the general GEMM FFT
        # cannot apply and Bluestein is the only exact-length path
        import mlx_audio_primitives_tpu.kernels.bluestein as bl

        called = {}
        orig = bl.fft_bluestein

        def spy(x, n):
            called["bluestein"] = True
            return orig(x, n=n)

        monkeypatch.setattr(bl, "fft_bluestein", spy)
        bl.rfft_len(jnp.zeros((1, 9973), jnp.float32), 9973)
        assert called.get("bluestein")

    def test_rfft_len_balanced_composite_uses_general(self, monkeypatch):
        # 44100 = 210*210: the two-factor GEMM FFT beats Bluestein 2.3x
        import mlx_audio_primitives_tpu.kernels.bluestein as bl
        import mlx_audio_primitives_tpu.kernels.sixstep as ss

        called = {}
        orig = ss.rfft_general

        def spy(x, n):
            called["general"] = True
            return orig(x, n)

        monkeypatch.setattr(ss, "rfft_general", spy)
        out = bl.rfft_len(jnp.zeros((2, 44100), jnp.float32), 44100)
        assert called.get("general")
        assert out.shape == (2, 44100 // 2 + 1)

    def test_general_supported_contract(self):
        from mlx_audio_primitives_tpu.kernels.sixstep import (
            _split_general,
            general_supported,
        )

        assert general_supported(44100) and _split_general(44100) == (210, 210)
        assert general_supported(88200) and general_supported(11025)
        assert not general_supported(9973)        # prime
        assert not general_supported(2 * 5003)    # 2 x prime: too skewed

    def test_sixstep_supported_contract(self):
        from mlx_audio_primitives_tpu.kernels.sixstep import supported

        assert supported(2048) and supported(16384) and supported(256)
        assert not supported(44100)   # non-pow2
        assert not supported(32768)   # beyond N1,N2 <= 128
        assert not supported(2)       # below minimum

    def test_mel_auto_selects_sixstep_at_scale(self, monkeypatch):
        """The spy only fires at TRACE time, so clear jit caches first."""
        import jax

        import mlx_audio_primitives_tpu.kernels.sixstep as ss
        from mlx_audio_primitives_tpu import melspectrogram

        called = {}
        orig = ss.rfft_power_sixstep

        def spy(x, n):
            called["six"] = True
            return orig(x, n)

        monkeypatch.setattr(ss, "rfft_power_sixstep", spy)
        jax.clear_caches()
        y = np.zeros((8, 22050), np.float32)
        # use_pallas=False: this test pins the XLA-path dispatch policy —
        # on a real TPU the auto default routes to the fused Pallas kernel
        # and sixstep is (correctly) never consulted
        melspectrogram(y, n_fft=2048, hop_length=512, n_mels=32,
                       use_pallas=False)  # 8*44 rows
        assert called.get("six")

    def test_mel_auto_small_batch_stays_on_fft(self, monkeypatch):
        import jax

        import mlx_audio_primitives_tpu.kernels.sixstep as ss
        from mlx_audio_primitives_tpu import melspectrogram

        called = {}

        def spy(x, n):
            called["six"] = True
            raise AssertionError("sixstep selected for a small workload")

        monkeypatch.setattr(ss, "rfft_power_sixstep", spy)
        jax.clear_caches()
        y = np.zeros(22050, np.float32)  # 44 rows < 256
        melspectrogram(y, n_fft=2048, hop_length=512, n_mels=32)
        assert not called.get("six")


class TestVmaSafeRfft:
    """rfft_vma_safe: jnp.fft.rfft with a transpose-free custom-vjp backward."""

    def test_forward_matches_plain_rfft(self):
        import jax.numpy as jnp

        from mlx_audio_primitives_tpu.kernels.bluestein import rfft_vma_safe

        rng = np.random.default_rng(7)
        x = rng.standard_normal((5, 6000)).astype(np.float32)
        got = rfft_vma_safe(jnp.asarray(x))
        want = np.fft.rfft(x.astype(np.float64))
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-3)

    @pytest.mark.parametrize("n", [64, 63, 6000])
    def test_backward_matches_plain_rfft_vjp(self, n):
        """The closed-form adjoint equals jax's own rfft VJP exactly
        (both real- and imaginary-sensitive losses, even and odd n)."""
        import jax
        import jax.numpy as jnp

        from mlx_audio_primitives_tpu.kernels.bluestein import rfft_vma_safe

        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.standard_normal((3, n)).astype(np.float32))

        def loss(fft_fn, x):
            S = fft_fn(x)
            return (
                jnp.sum(jnp.abs(S) ** 2)
                + jnp.sum(jnp.real(S) * 0.3)
                - jnp.sum(jnp.imag(S) * 0.7)
            )

        g_plain = jax.grad(lambda x: loss(lambda v: jnp.fft.rfft(v, axis=-1), x))(x)
        g_safe = jax.grad(lambda x: loss(rfft_vma_safe, x))(x)
        gp = np.asarray(g_plain)
        # scale-aware: on TPU the plain-rfft VJP and the closed-form
        # adjoint accumulate differently (observed 9e-8 relative)
        np.testing.assert_allclose(
            np.asarray(g_safe), gp, rtol=1e-5,
            atol=max(1e-6, 1e-6 * float(np.abs(gp).max())),
        )
