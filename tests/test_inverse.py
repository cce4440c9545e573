"""Mel inversion: NNLS optimality vs scipy, round-trips, audio recovery."""

import numpy as np
import pytest
import scipy.optimize

import jax.numpy as jnp

from mlx_audio_primitives_tpu.ops.inverse import mel_to_audio, mel_to_stft, nnls
from mlx_audio_primitives_tpu.ops.mel import mel_filterbank, melspectrogram

SR, N_FFT, HOP = 22050, 256, 64
N_BINS = N_FFT // 2 + 1


def test_nnls_matches_scipy_optimum():
    """FISTA reaches scipy's exact per-column NNLS objective to ~1e-5."""
    rng = np.random.default_rng(0)
    # overdetermined (m > n) with noise, so the optimum residual is > 0
    A = np.abs(rng.standard_normal((40, 24))).astype(np.float32)
    X_true = np.maximum(rng.standard_normal((24, 6)), 0).astype(np.float32)
    B = (A @ X_true + 0.05 * rng.standard_normal((40, 6))).astype(np.float32)

    X = np.asarray(nnls(A, B, n_iter=800))
    assert X.min() >= 0.0
    ours = np.linalg.norm(A @ X - B, axis=0)
    exact = np.asarray(
        [scipy.optimize.nnls(A.astype(np.float64), B[:, j].astype(np.float64))[1]
         for j in range(6)]
    )
    assert (ours <= exact * (1 + 1e-3) + 1e-4).all(), (ours, exact)
    np.testing.assert_allclose(ours, exact, rtol=1e-3)


def test_nnls_batched_and_validation():
    rng = np.random.default_rng(1)
    A = np.abs(rng.standard_normal((8, 12))).astype(np.float32)
    B = np.abs(rng.standard_normal((3, 8, 5))).astype(np.float32)
    X = nnls(A, B, n_iter=50)
    assert X.shape == (3, 12, 5)
    with pytest.raises(ValueError, match="2-D"):
        nnls(A[0], B)
    with pytest.raises(ValueError, match="match"):
        nnls(A, np.zeros((9, 5), np.float32))
    with pytest.raises(ValueError, match="n_iter"):
        nnls(A, B[0], n_iter=0)


@pytest.mark.parametrize("power", [1.0, 2.0])
def test_mel_to_stft_recovers_mel_projection(power):
    """fb @ mel_to_stft(M)^power must reproduce M (NNLS residual small)."""
    rng = np.random.default_rng(2)
    y = rng.standard_normal(SR // 2).astype(np.float32)
    mel = np.asarray(
        melspectrogram(
            y, sr=SR, n_fft=N_FFT, hop_length=HOP, n_mels=40, power=power
        )
    )
    S = mel_to_stft(mel, sr=SR, n_fft=N_FFT, power=power, nnls_iter=500)
    assert S.shape == (N_BINS, mel.shape[1])
    assert float(jnp.min(S)) >= 0.0
    fb = np.asarray(mel_filterbank(SR, N_FFT, n_mels=40))
    recon = fb @ (np.asarray(S) ** power)
    rel = np.linalg.norm(recon - mel) / np.linalg.norm(mel)
    assert rel < 0.02, rel


def test_mel_to_stft_batched():
    rng = np.random.default_rng(3)
    y = rng.standard_normal((3, SR // 2)).astype(np.float32)
    mel = melspectrogram(y, sr=SR, n_fft=N_FFT, hop_length=HOP, n_mels=32)
    S = mel_to_stft(mel, sr=SR, n_fft=N_FFT, nnls_iter=100)
    assert S.shape == (3, N_BINS, mel.shape[-1])
    # batched == per-item
    S0 = mel_to_stft(mel[0], sr=SR, n_fft=N_FFT, nnls_iter=100)
    np.testing.assert_allclose(np.asarray(S[0]), np.asarray(S0), atol=1e-6)


def test_mel_to_stft_validation():
    with pytest.raises(ValueError, match="power"):
        mel_to_stft(np.zeros((4, 4), np.float32), power=0.0)
    with pytest.raises(ValueError, match="2-D or 3-D"):
        mel_to_stft(np.zeros(4, np.float32))


def test_mel_to_audio_roundtrip():
    """Tone -> mel -> audio: the reconstruction's mel comes back close."""
    t = np.arange(SR // 2) / SR
    y = (
        0.6 * np.sin(2 * np.pi * 440 * t) + 0.3 * np.sin(2 * np.pi * 880 * t)
    ).astype(np.float32)
    mel = melspectrogram(y, sr=SR, n_fft=N_FFT, hop_length=HOP, n_mels=64)
    rec = mel_to_audio(
        mel, sr=SR, n_fft=N_FFT, hop_length=HOP, n_iter=32, length=len(y),
        random_state=0,
    )
    assert rec.shape == (len(y),)
    mel_rec = melspectrogram(rec, sr=SR, n_fft=N_FFT, hop_length=HOP, n_mels=64)
    a = np.asarray(mel).ravel()
    b = np.asarray(mel_rec).ravel()
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel < 0.15, rel
