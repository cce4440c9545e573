"""Independent cross-validation vs ACTUAL torchaudio (SURVEY.md §4 pillar 2;
reference `tests/test_torchaudio_crossval.py:26-322`).

torchaudio is absent from the build image (the in-image stand-in is
`tests/test_torch_crossval.py`, which uses torch.stft/istft directly); the
`crossval` CI job pip-installs torchaudio and runs this module for real.
Everything here compares against torchaudio.transforms — an implementation
with no shared code or authorship with this repo OR with librosa.
"""

import numpy as np
import pytest

torchaudio = pytest.importorskip("torchaudio")
import torch  # noqa: E402

import mlx_audio_primitives_tpu as ap  # noqa: E402

SR = 22050


def _np(x):
    return np.asarray(x)


@pytest.fixture(scope="module")
def noise():
    return np.random.default_rng(42).standard_normal(SR).astype(np.float32)


@pytest.fixture(scope="module")
def tnoise(noise):
    return torch.from_numpy(noise)


class TestSpectrogram:
    @pytest.mark.parametrize("n_fft,hop", [(1024, 256), (2048, 512)])
    def test_power_spectrogram(self, noise, tnoise, n_fft, hop):
        ours = _np(np.abs(ap.stft(noise, n_fft=n_fft, hop_length=hop,
                                  pad_mode="reflect"))) ** 2
        tf = torchaudio.transforms.Spectrogram(
            n_fft=n_fft, hop_length=hop, power=2.0, center=True,
            pad_mode="reflect")
        ref = tf(tnoise).numpy()
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)

    def test_complex_spectrogram(self, noise, tnoise):
        ours = _np(ap.stft(noise, n_fft=1024, hop_length=256,
                           pad_mode="reflect"))
        tf = torchaudio.transforms.Spectrogram(
            n_fft=1024, hop_length=256, power=None, center=True,
            pad_mode="reflect")
        ref = tf(tnoise).numpy()
        np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


class TestMelSpectrogram:
    def test_slaney_melspectrogram(self, noise, tnoise):
        ours = _np(ap.melspectrogram(noise, sr=SR, n_fft=2048,
                                     hop_length=512, n_mels=128,
                                     pad_mode="reflect"))
        tf = torchaudio.transforms.MelSpectrogram(
            sample_rate=SR, n_fft=2048, hop_length=512, n_mels=128,
            norm="slaney", mel_scale="slaney", power=2.0, center=True,
            pad_mode="reflect")
        ref = tf(tnoise).numpy()
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)

    def test_htk_melspectrogram(self, noise, tnoise):
        ours = _np(ap.melspectrogram(noise, sr=SR, n_fft=1024,
                                     hop_length=256, n_mels=64, htk=True,
                                     norm=None, pad_mode="reflect"))
        tf = torchaudio.transforms.MelSpectrogram(
            sample_rate=SR, n_fft=1024, hop_length=256, n_mels=64,
            norm=None, mel_scale="htk", power=2.0, center=True,
            pad_mode="reflect")
        ref = tf(tnoise).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)

    def test_amplitude_to_db(self, noise):
        S = _np(np.abs(ap.stft(noise, n_fft=1024))) ** 2
        tf = torchaudio.transforms.AmplitudeToDB(stype="power", top_db=80.0)
        ref = tf(torch.from_numpy(S)).numpy()
        ours = _np(ap.power_to_db(S, top_db=80.0))
        np.testing.assert_allclose(ours, ref, atol=2e-4)


class TestMFCC:
    def test_mfcc(self, noise, tnoise):
        n_mfcc = 20
        # torchaudio MFCC = dB(mel) -> DCT-II ortho with top_db=None
        # (librosa clips at 80 dB); feed our mfcc the unclipped log-mel
        # via the S= path, which skips its internal power_to_db
        log_mel = ap.power_to_db(
            ap.melspectrogram(noise, sr=SR, n_fft=2048, hop_length=512,
                              n_mels=128, pad_mode="reflect"),
            top_db=None)
        ours = _np(ap.mfcc(S=log_mel, sr=SR, n_mfcc=n_mfcc))
        tf = torchaudio.transforms.MFCC(
            sample_rate=SR, n_mfcc=n_mfcc, dct_type=2, norm="ortho",
            log_mels=False,
            melkwargs=dict(n_fft=2048, hop_length=512, n_mels=128,
                           norm="slaney", mel_scale="slaney", center=True,
                           pad_mode="reflect"))
        ref = tf(tnoise).numpy()
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)


class TestResample:
    @pytest.mark.parametrize("target", [16000, 8000])
    def test_sinc_vs_kaiser_polyphase(self, noise, tnoise, target):
        # different filter designs (torchaudio windowed-sinc vs our
        # scipy-designed kaiser polyphase): identical passband content
        ours = _np(ap.resample(noise, SR, target, res_type="kaiser_best"))
        ref = torchaudio.functional.resample(tnoise, SR, target).numpy()
        n = min(len(ours), len(ref))
        err = (np.linalg.norm(ours[64 : n - 64] - ref[64 : n - 64])
               / np.linalg.norm(ref[64 : n - 64]))
        assert err < 2e-2

    def test_fft_resample_energy(self, noise, tnoise):
        ours = _np(ap.resample(noise, SR, 11025, res_type="fft"))
        ref = torchaudio.functional.resample(tnoise, SR, 11025).numpy()
        assert abs(len(ours) - len(ref)) <= 1
        n = min(len(ours), len(ref))
        # spectral methods vs FIR: compare energy envelopes
        e_ours = float(np.mean(ours[:n] ** 2))
        e_ref = float(np.mean(ref[:n] ** 2))
        assert abs(e_ours - e_ref) / e_ref < 0.05


class TestGriffinLim:
    def test_reconstruction_quality(self):
        t = np.arange(SR) / SR
        tone = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
        S = _np(np.abs(ap.stft(tone, n_fft=1024, hop_length=256)))
        ours = _np(ap.griffinlim(S, n_iter=32, hop_length=256))
        tf = torchaudio.transforms.GriffinLim(n_fft=1024, hop_length=256,
                                              power=1.0, n_iter=32)
        ref = tf(torch.from_numpy(S)).numpy()

        def spec_err(y):
            R = _np(np.abs(ap.stft(y.astype(np.float32), n_fft=1024,
                                   hop_length=256)))
            m = min(R.shape[1], S.shape[1])
            return (np.linalg.norm(R[:, :m] - S[:, :m])
                    / np.linalg.norm(S))

        assert spec_err(ours) < max(1.5 * spec_err(ref), 0.05)
