"""Pallas kernel equivalence tests (analog of reference
`tests/test_cpp_extension.py`: every fast-path kernel vs the always-available
fallback). On CPU these run the kernels in interpret mode (SURVEY.md §4
"TPU translation")."""

import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_primitives_tpu import istft, melspectrogram, stft
from mlx_audio_primitives_tpu.kernels.mel_fused import (
    mel_pallas_tables,
    melspectrogram_pallas,
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
        np.testing.assert_allclose(ours, ref, atol=1e-5)

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
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_bad_hop_rejected(self):
        fw = jnp.zeros((1, 4, 512), jnp.float32)
        env = jnp.ones((1000,), jnp.float32)
        with pytest.raises(ValueError):
            overlap_add_pallas(fw, env, hop_length=0, output_length=1000)

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
        basis2 = mel_pallas_tables(n_fft, "hann", n_fft // 2 + 1)
        out = np.asarray(
            melspectrogram_pallas(
                jnp.asarray(batch_signals), fb.T, basis2,
                n_fft=n_fft, hop_length=hop, center=True,
                pad_mode="constant", power=2.0,
            )
        )
        ref = np.asarray(
            melspectrogram(batch_signals, n_fft=n_fft, hop_length=hop,
                           n_mels=n_mels)
        )
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4 * ref.max())

    def test_fallback_on_odd_power(self, batch_signals):
        # power != 2 silently uses the XLA path even with use_pallas=True
        out = melspectrogram(batch_signals, n_mels=32, power=1.0, use_pallas=True)
        ref = melspectrogram(batch_signals, n_mels=32, power=1.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)

    def test_kernel_rejects_bad_power(self, batch_signals):
        fb = mel_filterbank(22050, 1024, n_mels=40)
        basis2 = mel_pallas_tables(1024, "hann", 513)
        with pytest.raises(ValueError):
            melspectrogram_pallas(
                jnp.asarray(batch_signals), fb.T, basis2,
                n_fft=1024, hop_length=256, center=True,
                pad_mode="constant", power=1.0,
            )
