"""Independent cross-validation vs ACTUAL torchaudio (SURVEY.md §4 pillar 2;
reference `tests/test_torchaudio_crossval.py:26-322`).

Two-tier design (same scheme as `test_librosa_crossval.py`): the ``ap.*``
half of every test executes unconditionally in-image with structural checks
and in-image oracle comparisons (torch.stft IS in-image — see also
`tests/test_torch_crossval.py`); only the torchaudio reference comparison,
fetched through :func:`_ref`, skips per-test when torchaudio is absent. The
`crossval` CI job pip-installs torchaudio and runs the comparisons for real.
Everything here compares against torchaudio.transforms — an implementation
with no shared code or authorship with this repo OR with librosa.
"""

import numpy as np
import pytest
import torch

import mlx_audio_primitives_tpu as ap
import scipy.signal

try:
    import torchaudio
except ImportError:  # build image: comparisons skip per-test via _ref
    torchaudio = None

SR = 22050


def _np(x):
    return np.asarray(x)


def _ref(fn):
    """Evaluate the torchaudio side of a comparison; everything above the
    first `_ref` call in a test has already executed in-image."""
    if torchaudio is None:
        pytest.skip(
            "torchaudio absent: ours-side executed and checked above; the "
            "torchaudio comparison runs in the crossval CI job"
        )
    return fn()


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
        # torch.stft is an in-image oracle for the same conventions
        oracle = (
            torch.stft(tnoise, n_fft=n_fft, hop_length=hop, center=True,
                       pad_mode="reflect",
                       window=torch.hann_window(n_fft),
                       return_complex=True)
            .abs().numpy() ** 2
        )
        assert ours.shape == oracle.shape
        np.testing.assert_allclose(ours, oracle, atol=1e-3, rtol=1e-3)
        ref = _ref(lambda: torchaudio.transforms.Spectrogram(
            n_fft=n_fft, hop_length=hop, power=2.0, center=True,
            pad_mode="reflect")(tnoise).numpy())
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)

    def test_complex_spectrogram(self, noise, tnoise):
        ours = _np(ap.stft(noise, n_fft=1024, hop_length=256,
                           pad_mode="reflect"))
        oracle = torch.stft(
            tnoise, n_fft=1024, hop_length=256, center=True,
            pad_mode="reflect", window=torch.hann_window(1024),
            return_complex=True).numpy()
        np.testing.assert_allclose(ours, oracle, atol=5e-4, rtol=1e-3)
        ref = _ref(lambda: torchaudio.transforms.Spectrogram(
            n_fft=1024, hop_length=256, power=None, center=True,
            pad_mode="reflect")(tnoise).numpy())
        np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


class TestMelSpectrogram:
    def test_slaney_melspectrogram(self, noise, tnoise):
        ours = _np(ap.melspectrogram(noise, sr=SR, n_fft=2048,
                                     hop_length=512, n_mels=128,
                                     pad_mode="reflect"))
        assert ours.shape[0] == 128
        assert np.all(np.isfinite(ours)) and np.all(ours >= 0)
        ref = _ref(lambda: torchaudio.transforms.MelSpectrogram(
            sample_rate=SR, n_fft=2048, hop_length=512, n_mels=128,
            norm="slaney", mel_scale="slaney", power=2.0, center=True,
            pad_mode="reflect")(tnoise).numpy())
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)

    def test_htk_melspectrogram(self, noise, tnoise):
        ours = _np(ap.melspectrogram(noise, sr=SR, n_fft=1024,
                                     hop_length=256, n_mels=64, htk=True,
                                     norm=None, pad_mode="reflect"))
        assert ours.shape[0] == 64
        assert np.all(np.isfinite(ours)) and np.all(ours >= 0)
        ref = _ref(lambda: torchaudio.transforms.MelSpectrogram(
            sample_rate=SR, n_fft=1024, hop_length=256, n_mels=64,
            norm=None, mel_scale="htk", power=2.0, center=True,
            pad_mode="reflect")(tnoise).numpy())
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)

    def test_amplitude_to_db(self, noise):
        S = _np(np.abs(ap.stft(noise, n_fft=1024))) ** 2
        ours = _np(ap.power_to_db(S, top_db=80.0))
        # in-image oracle: f64 log10 with the 80 dB floor
        oracle = 10.0 * np.log10(np.maximum(1e-10, S.astype(np.float64)))
        oracle = np.maximum(oracle, oracle.max() - 80.0)
        np.testing.assert_allclose(ours, oracle, atol=2e-4)
        ref = _ref(lambda: torchaudio.transforms.AmplitudeToDB(
            stype="power", top_db=80.0)(torch.from_numpy(S)).numpy())
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
        assert ours.shape[0] == n_mfcc
        assert np.all(np.isfinite(ours))
        # in-image oracle: the same pipeline in f64 numpy (reflect-padded
        # mel is close enough at this tolerance to the constant-pad oracle
        # only in shape; check the DCT projection instead via energy)
        assert np.argmax(np.abs(ours).mean(axis=1)) == 0  # c0 dominates
        ref = _ref(lambda: torchaudio.transforms.MFCC(
            sample_rate=SR, n_mfcc=n_mfcc, dct_type=2, norm="ortho",
            log_mels=False,
            melkwargs=dict(n_fft=2048, hop_length=512, n_mels=128,
                           norm="slaney", mel_scale="slaney", center=True,
                           pad_mode="reflect"))(tnoise).numpy())
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)


class TestResample:
    @pytest.mark.parametrize("target", [16000, 8000])
    def test_sinc_vs_kaiser_polyphase(self, noise, tnoise, target):
        # different filter designs (torchaudio windowed-sinc vs our
        # scipy-designed kaiser polyphase): identical passband content
        ours = _np(ap.resample(noise, SR, target, res_type="kaiser_best"))
        assert ours.shape == (int(np.ceil(len(noise) * target / SR)),)
        assert np.all(np.isfinite(ours))
        ref = _ref(lambda: torchaudio.functional.resample(
            tnoise, SR, target).numpy())
        n = min(len(ours), len(ref))
        err = (np.linalg.norm(ours[64 : n - 64] - ref[64 : n - 64])
               / np.linalg.norm(ref[64 : n - 64]))
        assert err < 2e-2

    def test_fft_resample_energy(self, noise, tnoise):
        ours = _np(ap.resample(noise, SR, 11025, res_type="fft"))
        # scipy.signal.resample is the exact in-image oracle for 'fft'
        oracle = scipy.signal.resample(noise, len(ours))
        np.testing.assert_allclose(ours, oracle, atol=2e-4)
        ref = _ref(lambda: torchaudio.functional.resample(
            tnoise, SR, 11025).numpy())
        assert abs(len(ours) - len(ref)) <= 1
        n = min(len(ours), len(ref))
        # spectral methods vs FIR: compare energy envelopes
        e_ref = float(np.mean(ref[:n] ** 2))
        assert abs(float(np.mean(ours[:n] ** 2)) - e_ref) / e_ref < 0.05


class TestGriffinLim:
    def test_reconstruction_quality(self):
        t = np.arange(SR) / SR
        tone = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
        S = _np(np.abs(ap.stft(tone, n_fft=1024, hop_length=256)))
        ours = _np(ap.griffinlim(S, n_iter=32, hop_length=256))

        def spec_err(y):
            R = _np(np.abs(ap.stft(y.astype(np.float32), n_fft=1024,
                                   hop_length=256)))
            m = min(R.shape[1], S.shape[1])
            return (np.linalg.norm(R[:, :m] - S[:, :m])
                    / np.linalg.norm(S))

        # in-image: GL-32 on a pure tone must converge on its own terms
        assert spec_err(ours) < 0.35
        ref = _ref(lambda: torchaudio.transforms.GriffinLim(
            n_fft=1024, hop_length=256, power=1.0,
            n_iter=32)(torch.from_numpy(S)).numpy())
        assert spec_err(ours) < max(1.5 * spec_err(ref), 0.05)
