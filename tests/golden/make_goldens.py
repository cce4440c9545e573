"""Generate checked-in golden vectors from INDEPENDENT third-party oracles.

The reference's headline numerical guarantee is byte-exact float32 parity of
windows / mel filterbanks / DCT bases with scipy + librosa
(reference: `NUMERICAL_ACCURACY.md:13-15`, `README.md:435`). librosa is not
installed in this environment, so the oracles are:

- ``scipy.signal.get_window`` — this IS librosa's window source of truth
  (librosa.filters.get_window delegates to it verbatim).
- ``scipy.fft.dct`` — the DCT-II reference librosa compares against.
- ``transformers.audio_utils`` — HuggingFace's independent transcription of
  librosa's mel filterbank / spectrogram / dB conversions (documented
  librosa-compatible, written by different authors than this repo).

Run from the repo root to (re)generate ``tests/golden/goldens.npz``:

    python tests/golden/make_goldens.py

The companion ``tests/test_golden.py`` loads the .npz and asserts byte-level
f32 equality for tables (tolerances only for FFT-dependent pipelines), with
NO import of ``tests/oracles.py`` — closing the same-author oracle loop
flagged in round 1.
"""

from __future__ import annotations

import os

import numpy as np
import scipy.fft
import scipy.signal

WINDOW_NAMES = ["hann", "hamming", "blackman", "bartlett", "boxcar"]
WINDOW_SIZES = [256, 400, 512, 1024, 2048]
KAISER_BETAS = [8.6, 14.0]

# (sr, n_fft, n_mels)
MEL_CONFIGS = [(22050, 2048, 128), (16000, 512, 40), (22050, 1024, 80), (8000, 256, 32)]
MEL_VARIANTS = [("slaney", "slaney"), ("slaney", None), ("htk", None), ("htk", "slaney")]

# (n_mfcc, n_mels, norm)
DCT_CONFIGS = [(20, 128, "ortho"), (13, 64, None), (40, 128, "ortho")]

# (sr, n_fft, n_chroma, tuning, norm) — norm is transformers' `power` arg
CHROMA_CONFIGS = [
    (22050, 2048, 12, 0.0, 2.0),
    (16000, 512, 12, 0.0, 2.0),
    (22050, 1024, 24, 0.0, 2.0),
    (22050, 2048, 12, 0.25, 2.0),
    (22050, 2048, 12, 0.0, 1.0),
]

STFT_SR = 22050


def chirp(sr: int = STFT_SR, f0: float = 100.0, f1: float = 4000.0) -> np.ndarray:
    """Deterministic, formula-defined 1 s chirp (no RNG, no repo imports)."""
    t = np.arange(sr, dtype=np.float64) / sr
    phase = 2 * np.pi * (f0 * t + 0.5 * (f1 - f0) * t * t)
    return np.sin(phase).astype(np.float32)


def main() -> None:
    import transformers.audio_utils as au

    out: dict[str, np.ndarray] = {}

    for name in WINDOW_NAMES:
        for n in WINDOW_SIZES:
            for fftbins in (True, False):
                key = f"window/{name}/{n}/{'periodic' if fftbins else 'symmetric'}"
                out[key] = scipy.signal.get_window(name, n, fftbins=fftbins).astype(
                    np.float32
                )
    for beta in KAISER_BETAS:
        for fftbins in (True, False):
            key = f"window/kaiser{beta}/512/{'periodic' if fftbins else 'symmetric'}"
            out[key] = scipy.signal.get_window(
                ("kaiser", beta), 512, fftbins=fftbins
            ).astype(np.float32)

    for sr, n_fft, n_mels in MEL_CONFIGS:
        for mel_scale, norm in MEL_VARIANTS:
            key = f"mel/{sr}/{n_fft}/{n_mels}/{mel_scale}/{norm}"
            fb = au.mel_filter_bank(
                num_frequency_bins=n_fft // 2 + 1,
                num_mel_filters=n_mels,
                min_frequency=0.0,
                max_frequency=sr / 2,
                sampling_rate=sr,
                norm=norm,
                mel_scale=mel_scale,
            )
            # transformers returns (n_freq, n_mels); librosa/our layout is
            # (n_mels, n_freq).
            out[key] = fb.T.astype(np.float32)

    for n_mfcc, n_mels, norm in DCT_CONFIGS:
        key = f"dct/{n_mfcc}/{n_mels}/{norm}"
        out[key] = (
            scipy.fft.dct(np.eye(n_mels), type=2, norm=norm, axis=0)[:n_mfcc]
        ).astype(np.float32)

    y = chirp()
    out["signal/chirp"] = y
    win = scipy.signal.get_window("hann", 512, fftbins=True)
    out["stft/chirp/mag"] = au.spectrogram(
        y,
        window=win,
        frame_length=512,
        hop_length=128,
        fft_length=512,
        power=1.0,
        center=True,
        pad_mode="reflect",
    ).astype(np.float32)
    mel_fb = au.mel_filter_bank(
        num_frequency_bins=257,
        num_mel_filters=64,
        min_frequency=0.0,
        max_frequency=STFT_SR / 2,
        sampling_rate=STFT_SR,
        norm="slaney",
        mel_scale="slaney",
    )
    out["melspec/chirp/power"] = au.spectrogram(
        y,
        window=win,
        frame_length=512,
        hop_length=128,
        fft_length=512,
        power=2.0,
        center=True,
        pad_mode="reflect",
        mel_filters=mel_fb,
        mel_floor=0.0,
    ).astype(np.float32)

    # End-to-end MFCC: transformers mel power spec -> transformers power_to_db
    # -> scipy DCT-II ortho over the mel axis, first 13 rows. Composes ONLY
    # third-party oracles (the librosa mfcc recipe, reference `mfcc.py:143-287`).
    M_db = au.power_to_db(
        out["melspec/chirp/power"].astype(np.float64),
        reference=1.0, min_value=1e-10, db_range=80.0,
    )
    out["mfcc/chirp/13"] = (
        scipy.fft.dct(M_db, type=2, norm="ortho", axis=0)[:13].astype(np.float32)
    )

    # Chroma filterbanks from transformers' independent transcription of
    # librosa.filters.chroma (round-2 gap: the roadmap ops were pinned only
    # to same-repo oracles). transformers' `power` arg IS librosa's `norm`
    # (L^p column norm); weighting_parameters=(ctroct, octwidth);
    # start_at_c_chroma=base_c. Its return is (n_chroma, 1 + n//2) despite
    # the docstring — no transpose needed for our layout.
    for sr, n_fft, n_chroma, tuning, norm in CHROMA_CONFIGS:
        key = f"chroma/{sr}/{n_fft}/{n_chroma}/{tuning}/{norm}"
        out[key] = au.chroma_filter_bank(
            num_frequency_bins=n_fft,
            num_chroma=n_chroma,
            sampling_rate=sr,
            tuning=tuning,
            power=norm,
            weighting_parameters=(5.0, 2.0),
            start_at_c_chroma=True,
        ).astype(np.float32)
    out["chroma/22050/2048/12/unweighted"] = au.chroma_filter_bank(
        num_frequency_bins=2048,
        num_chroma=12,
        sampling_rate=22050,
        tuning=0.0,
        power=2.0,
        weighting_parameters=None,
        start_at_c_chroma=True,
    ).astype(np.float32)

    # End-to-end chromagram: transformers power spectrogram -> transformers
    # chroma filterbank -> inf-norm per-frame normalization (librosa
    # chroma_stft's default norm). Composes ONLY third-party oracles.
    spec2 = au.spectrogram(
        y,
        window=win,
        frame_length=512,
        hop_length=128,
        fft_length=512,
        power=2.0,
        center=True,
        pad_mode="reflect",
    )
    cfb = au.chroma_filter_bank(
        num_frequency_bins=512, num_chroma=12, sampling_rate=STFT_SR,
        tuning=0.0, power=2.0, weighting_parameters=(5.0, 2.0),
        start_at_c_chroma=True,
    )
    raw = cfb @ spec2
    peak = np.max(np.abs(raw), axis=0, keepdims=True)
    out["chroma_stft/chirp"] = (
        raw / np.where(peak < np.finfo(np.float32).tiny, 1.0, peak)
    ).astype(np.float32)

    # dB conversions on a deterministic grid spanning amin..max regimes.
    S = (np.geomspace(1e-12, 1e4, 64).reshape(8, 8)).astype(np.float32)
    out["db/input"] = S
    out["db/power_ref1_top80"] = au.power_to_db(
        S, reference=1.0, min_value=1e-10, db_range=80.0
    ).astype(np.float32)
    out["db/power_refmax_notop"] = au.power_to_db(
        S, reference=float(S.max()), min_value=1e-10, db_range=None
    ).astype(np.float32)
    out["db/amp_ref1_top80"] = au.amplitude_to_db(
        S, reference=1.0, min_value=1e-5, db_range=80.0
    ).astype(np.float32)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}: {len(out)} arrays")


if __name__ == "__main__":
    main()
