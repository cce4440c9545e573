"""Seeded randomized configuration sweep.

Broad-net shape/edge fuzzing across the (n_fft, hop, win_length, length,
window, center, pad_mode, batch) space: every sampled config must round-trip
STFT->ISTFT within NOLA-permitting tolerance and agree with the float64
NumPy oracle. Catches the class of off-by-one/edge bugs that parametrized
tests with hand-picked values miss.
"""

import numpy as np
import pytest

from mlx_audio_primitives_tpu import check_nola, istft, melspectrogram, stft

from oracles import stft_np

RNG = np.random.default_rng(20260816)

# string windows plus ('kaiser', beta) tuples — scipy.get_window handles both
WINDOWS = ["hann", "hamming", "blackman", ("kaiser", 8.6), ("kaiser", 14.0)]
PAD_MODES = ["constant", "reflect", "edge"]

# n_fft pool spans every rfft_len dispatch branch (kernels/bluestein.py:178-191):
# pow2 (packed / plain rfft), odd + prime <= 4096 (DFT-GEMM), and
# non-pow2 > 4096 (Bluestein chirp-Z). Big sizes are rare to bound runtime.
_NFFT_POOL = [63, 64, 97, 128, 251, 256, 320, 512, 509, 997, 1000, 1024, 2048]
_NFFT_BIG = [4410, 5000, 4441]  # non-pow2 > _DFT_MATMUL_MAX -> Bluestein


def _sample_config(rng):
    if rng.random() < 0.06:
        n_fft = int(rng.choice(_NFFT_BIG))
    else:
        n_fft = int(rng.choice(_NFFT_POOL))
    # hop in [n_fft//8, n_fft], not necessarily a divisor
    hop = int(rng.integers(max(1, n_fft // 8), n_fft + 1))
    # win_length down to n_fft//4 so hop > win_length configs occur
    win_length = int(rng.integers(n_fft // 4, n_fft + 1))
    # include signals SHORTER than n_fft (center=True handles them; the
    # reflect-pad skip below is live for those)
    length = int(rng.integers(max(n_fft // 3, 8), 6 * n_fft))
    window = WINDOWS[int(rng.integers(len(WINDOWS)))]
    return {
        "n_fft": n_fft,
        "hop_length": hop,
        "win_length": win_length,
        "window": window,
        "center": bool(rng.choice([True, False])),
        "pad_mode": str(rng.choice(PAD_MODES)),
        "length": length,
        "batch": int(rng.choice([1, 3, 5, 8])),
    }


# directed configs: one per dispatch branch, immune to sampling luck
_DIRECTED = [
    # pow2, multi-row -> pair-packed complex FFT
    dict(n_fft=1024, hop_length=256, win_length=1024, window="hann",
         center=True, pad_mode="constant", length=4096, batch=2),
    # pow2, single row (1 frame, batch 1) -> plain jnp.fft.rfft
    dict(n_fft=512, hop_length=512, win_length=512, window="hann",
         center=False, pad_mode="constant", length=512, batch=1),
    # odd prime <= 4096 -> DFT-GEMM
    dict(n_fft=997, hop_length=250, win_length=997, window="hamming",
         center=True, pad_mode="reflect", length=3000, batch=1),
    # balanced composite > 4096 (4410 = 63*70) -> two-factor GEMM FFT
    dict(n_fft=4410, hop_length=1103, win_length=4410, window="hann",
         center=True, pad_mode="constant", length=9000, batch=1),
    # prime > 4096 -> Bluestein chirp-Z, worst-case size
    dict(n_fft=4441, hop_length=1111, win_length=4441, window="blackman",
         center=True, pad_mode="edge", length=9000, batch=1),
    # large balanced composite (6000 = 80*75) -> two-factor GEMM FFT, batched
    dict(n_fft=6000, hop_length=1500, win_length=6000, window="hamming",
         center=True, pad_mode="constant", length=15000, batch=2),
    # hop > win_length (gapped analysis) + kaiser tuple window
    dict(n_fft=1024, hop_length=900, win_length=512, window=("kaiser", 8.6),
         center=True, pad_mode="constant", length=5000, batch=5),
]

CONFIGS = _DIRECTED + [_sample_config(RNG) for _ in range(144)]


def _win_id(w):
    return f"k{w[1]:g}" if isinstance(w, tuple) else w[:3]


@pytest.mark.parametrize("cfg", CONFIGS, ids=lambda c: (
    f"n{c['n_fft']}-h{c['hop_length']}-w{c['win_length']}-{_win_id(c['window'])}-"
    f"{'c' if c['center'] else 'nc'}-{c['pad_mode'][:3]}-L{c['length']}-b{c['batch']}"
))
def test_stft_matches_oracle_and_roundtrips(cfg):
    rng = np.random.default_rng(cfg["n_fft"] * 31 + cfg["hop_length"])
    shape = (cfg["batch"], cfg["length"]) if cfg["batch"] > 1 else (cfg["length"],)
    y = rng.standard_normal(shape).astype(np.float32)

    if cfg["length"] < cfg["n_fft"] and not cfg["center"]:
        pytest.skip("center=False requires length >= n_fft (validated error)")
    # reflect padding requires pad <= len-1
    if cfg["center"] and cfg["pad_mode"] == "reflect" and cfg["n_fft"] // 2 >= cfg["length"]:
        pytest.skip("reflect pad larger than signal")

    S = stft(
        y,
        n_fft=cfg["n_fft"],
        hop_length=cfg["hop_length"],
        win_length=cfg["win_length"],
        window=cfg["window"],
        center=cfg["center"],
        pad_mode=cfg["pad_mode"],
    )

    # oracle comparison (first batch element)
    y0 = y[0] if cfg["batch"] > 1 else y
    ref = stft_np(
        y0,
        n_fft=cfg["n_fft"],
        hop_length=cfg["hop_length"],
        win_length=cfg["win_length"],
        window=cfg["window"],
        center=cfg["center"],
        pad_mode=cfg["pad_mode"],
    )
    ours = np.asarray(S[0] if cfg["batch"] > 1 else S)
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(ours, ref, atol=2e-4 * scale)

    # round-trip wherever NOLA permits
    if cfg["center"] and check_nola(
        cfg["window"], cfg["hop_length"], cfg["n_fft"]
    ):
        # win_length<n_fft zero-pads the window, which can break NOLA even
        # when the full-length window satisfies it; check the padded window.
        from mlx_audio_primitives_tpu.ops.stft import _get_padded_window

        win = np.asarray(
            _get_padded_window(cfg["window"], cfg["win_length"], cfg["n_fft"]),
            dtype=np.float64,
        )
        step = cfg["hop_length"]
        binsums = np.zeros(step)
        for start in range(0, cfg["n_fft"] - step + 1, step):
            binsums += win[start : start + step] ** 2
        if cfg["n_fft"] % step:
            binsums[: cfg["n_fft"] % step] += win[-(cfg["n_fft"] % step):] ** 2
        # require a well-conditioned envelope: near-degenerate NOLA would
        # force a vacuously large tolerance (bounded below at 5e-3)
        if binsums.min() > 1e-2:
            rec = np.asarray(
                istft(
                    S,
                    hop_length=cfg["hop_length"],
                    win_length=cfg["win_length"],
                    n_fft=cfg["n_fft"],
                    window=cfg["window"],
                    center=True,
                    length=cfg["length"],
                )
            )
            assert rec.shape == y.shape
            # the final up-to-n_fft samples can lie beyond the last frame's
            # window support and are intrinsically non-reconstructable (the
            # f64 oracle shows identical tail error); compare the covered span
            covered = max(cfg["length"] - cfg["n_fft"], 1)
            err = np.abs(rec[..., :covered] - y[..., :covered]).max()
            # sparse envelopes amplify float error; scale tolerance by 1/min
            # but never past 5e-3 (a broken reconstruction must still fail)
            tol = min(5e-5 / min(binsums.min(), 1.0), 5e-3)
            assert err <= max(tol, 5e-5), (err, binsums.min())


@pytest.mark.parametrize("cfg", CONFIGS[:10], ids=lambda c: (
    f"mel-n{c['n_fft']}-h{c['hop_length']}-b{c['batch']}"
))
def test_mel_finite_and_shaped(cfg):
    rng = np.random.default_rng(1)
    shape = (cfg["batch"], cfg["length"]) if cfg["batch"] > 1 else (cfg["length"],)
    y = rng.standard_normal(shape).astype(np.float32)
    if cfg["length"] < cfg["n_fft"] and not cfg["center"]:
        pytest.skip("center=False requires length >= n_fft")
    if cfg["center"] and cfg["pad_mode"] == "reflect" and cfg["n_fft"] // 2 >= cfg["length"]:
        pytest.skip("reflect pad larger than signal")
    n_mels = min(40, cfg["n_fft"] // 4)
    m = np.asarray(
        melspectrogram(
            y,
            n_fft=cfg["n_fft"],
            hop_length=cfg["hop_length"],
            win_length=cfg["win_length"],
            window=cfg["window"],
            center=cfg["center"],
            pad_mode=cfg["pad_mode"],
            n_mels=n_mels,
        )
    )
    assert np.isfinite(m).all()
    assert m.shape[-2] == n_mels


# ---------------------------------------------------------------------------
# Round-3 op sweep: randomized configs through the analysis-op surface.
# Invariant checks (finite, shaped, in-band, nonnegative where required) —
# the per-op oracle tests live in their own files; this net catches
# edge-config crashes (odd hops, short signals, tiny n_fft, batch mixes).

_R3_RNG = np.random.default_rng(20260820)


def _r3_config(rng):
    sr = int(rng.choice([8000, 16000, 22050]))
    n_fft = int(rng.choice([256, 512, 1024, 2048]))
    hop = int(rng.integers(max(32, n_fft // 8), n_fft // 2 + 1))
    length = int(rng.integers(3 * n_fft, 8 * n_fft))
    batch = int(rng.choice([1, 2, 4]))
    return sr, n_fft, hop, length, batch


R3_CONFIGS = [_r3_config(_R3_RNG) for _ in range(10)]


@pytest.mark.parametrize(
    "cfg", R3_CONFIGS, ids=lambda c: f"sr{c[0]}-n{c[1]}-h{c[2]}-L{c[3]}-b{c[4]}"
)
def test_roundthree_ops_fuzz(cfg):
    import mlx_audio_primitives_tpu as ap

    sr, n_fft, hop, length, batch = cfg
    rng = np.random.default_rng(hash(cfg) % (2**32))
    y = rng.standard_normal((batch, length)).astype(np.float32)
    y1 = y[0]

    # piptrack: pitches in [0, fmax+binwidth], zero off-peak
    p, m = ap.piptrack(y=y, sr=sr, n_fft=n_fft, hop_length=hop)
    p, m = np.asarray(p), np.asarray(m)
    assert np.all(np.isfinite(p)) and np.all(np.isfinite(m))
    assert p.max() < 4000.0 + sr / n_fft and p.min() >= 0.0

    # pcen over a mel spectrogram: finite, nonnegative
    n_mels = min(40, n_fft // 4)
    M = ap.melspectrogram(y, sr=sr, n_fft=n_fft, hop_length=hop,
                          n_mels=n_mels)
    P = np.asarray(ap.pcen(np.asarray(M), sr=sr, hop_length=hop))
    assert np.all(np.isfinite(P)) and np.all(P >= 0)

    # onset/beat chain on the 1-D row: monotone beat frames in range
    env = ap.onset_strength(y1, sr=sr, hop_length=hop, n_fft=n_fft,
                            n_mels=n_mels)
    bpm, beats = ap.beat_track(onset_envelope=np.asarray(env), sr=sr,
                               hop_length=hop)
    assert np.isfinite(bpm)
    if beats.size:
        assert np.all(np.diff(beats) > 0)
        assert beats.min() >= 0 and beats.max() < len(np.asarray(env))

    # lpc: leading one, finite
    a = np.asarray(ap.lpc(y, 8))
    assert a.shape == (batch, 9)
    np.testing.assert_array_equal(a[:, 0], 1.0)
    assert np.all(np.isfinite(a))

    # trim/split: consistent slicing
    yt, idx = ap.trim(y1, top_db=40)
    assert 0 <= idx[0] <= idx[1] <= length
    iv = ap.split(y1, top_db=40)
    assert np.all(iv[:, 0] <= iv[:, 1]) if iv.size else True

    # recurrence over MFCCs: square, zero diagonal band
    C = np.asarray(ap.mfcc(y=y1, sr=sr, n_fft=n_fft, hop_length=hop,
                           n_mfcc=13, n_mels=n_mels))
    if C.shape[1] >= 8:
        R = np.asarray(ap.recurrence_matrix(C, k=2, width=2))
        assert R.shape == (C.shape[1],) * 2
        assert np.trace(R) == 0.0
