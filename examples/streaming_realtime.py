"""Real-time streaming feature service demo.

Simulates a live audio service: many concurrent streams push fixed-size
chunks and receive log-mel frames + pitch estimates back, with warm-path
latency measured against the real-time budget (a chunk of ``k`` hops at
``sr`` covers ``k * hop / sr`` seconds of audio — the push must finish well
inside that). Everything per push runs as ONE cached jit executable per
stage (static chunk shape), so the steady state never recompiles.

Usage:
    python examples/streaming_realtime.py [--streams 64] [--seconds 2.0]

Runs on TPU or CPU. Streamed output equals the offline ops over the
concatenated signal (verified at the end of the run — exactly on CPU where
both sides share one FFT algorithm; to the f32 algorithm-pair tolerance on
TPU where the offline op uses the fused radix kernel).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

# runnable in place from a source checkout (`python examples/<name>.py`)
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main(streams: int = 64, seconds: float = 2.0, sr: int = 16000,
         n_fft: int = 512, hop: int = 128, n_mels: int = 40,
         frames_per_push: int = 8) -> None:
    import jax
    import jax.numpy as jnp

    from mlx_audio_primitives_tpu.ops.streaming import (
        StreamingLogMel,
        StreamingPitch,
    )

    chunk = frames_per_push * hop
    budget_ms = 1e3 * chunk / sr
    n_push = max(int(seconds * sr) // chunk, 2)
    print(
        f"{streams} streams x {n_push} pushes of {chunk} samples "
        f"({budget_ms:.1f} ms of audio each) on {jax.default_backend()}"
    )

    logmel = StreamingLogMel(
        sr=sr, n_fft=n_fft, hop_length=hop, n_mels=n_mels, batch=streams
    )
    pitch = StreamingPitch(
        sr=sr, frame_length=n_fft, hop_length=hop, batch=streams
    )

    rng = np.random.default_rng(0)
    t = np.arange(n_push * chunk) / sr
    # each stream: a different tone + noise, so pitch has something to find
    f0s = rng.uniform(100, 400, size=(streams, 1))
    audio = (
        np.sin(2 * np.pi * f0s * t[None]) + 0.05 * rng.standard_normal((streams, t.size))
    ).astype(np.float32)

    # warm up (compile) once, then measure the steady state
    _ = logmel.push(audio[:, :chunk])
    _ = pitch.push(audio[:, :chunk])
    logmel.reset()
    pitch.reset()

    mel_frames = []
    lat = []
    for i in range(n_push):
        buf = audio[:, i * chunk:(i + 1) * chunk]
        t0 = time.perf_counter()
        frames = logmel.push(buf)
        f0, voiced = pitch.push(buf)
        jax.block_until_ready((frames, f0, voiced))
        lat.append(1e3 * (time.perf_counter() - t0))
        mel_frames.append(frames)
    lat = np.asarray(lat)
    med = float(np.median(lat))
    print(
        f"per-push latency: median {med:.2f} ms, p95 "
        f"{float(np.percentile(lat, 95)):.2f} ms  "
        f"(budget {budget_ms:.1f} ms -> {budget_ms / med:.0f}x realtime, "
        f"{streams} streams at once)"
    )
    f0_last = np.asarray(f0)
    print(
        f"last-push pitch: median abs err "
        f"{float(np.median(np.abs(f0_last.mean(-1) - f0s[:, 0]))):.1f} Hz"
    )

    # exactness: the streamed log-mel equals the offline op over the whole
    # signal (the stream is silence-primed: its first n_fft/hop - 1 frames
    # cover the zero carry, matching offline center=False on padded audio)
    from mlx_audio_primitives_tpu import melspectrogram, power_to_db

    streamed = jnp.concatenate(mel_frames, axis=1)  # (B, F, n_mels)
    pad = np.pad(audio, ((0, 0), (n_fft - hop, 0)))
    offline = power_to_db(
        melspectrogram(
            pad, sr=sr, n_fft=n_fft, hop_length=hop, n_mels=n_mels,
            center=False,
        ),
        top_db=None,
    )  # (B, n_mels, F)
    off = jnp.swapaxes(offline, 1, 2)[:, : streamed.shape[1]]
    # Same FRAMES, different TRANSFORM ALGORITHMS: on TPU the offline op
    # rides the fused radix kernel while the stream's chunks use the XLA
    # FFT; both are f32-exact to ~1e-6 RELATIVE TO EACH FRAME'S PEAK, so
    # a bin 40 dB down legitimately differs by ~1e-2 dB. Compare above a
    # -80 dB floor at the dB bar that algorithm-pair supports (on CPU the
    # paths coincide and the diff is exactly 0).
    floor = float(jnp.max(off)) - 80.0
    err = float(jnp.abs(
        jnp.maximum(streamed, floor) - jnp.maximum(off, floor)
    ).max())
    print(f"streamed vs offline log-mel max |diff| (above -80 dB): {err:.2e}")
    assert err < 2e-2, err

    # PCEN frontend variant: causal by construction, so the streamed
    # output equals offline pcen(melspectrogram(center=False)) EXACTLY
    from mlx_audio_primitives_tpu import pcen
    from mlx_audio_primitives_tpu.ops.streaming import StreamingPCEN

    sp = StreamingPCEN(sr=sr, n_fft=n_fft, hop_length=hop, n_mels=n_mels,
                       batch=streams)
    got = jnp.concatenate(
        [sp.push(audio[:, i * chunk:(i + 1) * chunk]) for i in range(n_push)],
        axis=1,
    )
    offline_pcen = pcen(
        jnp.asarray(melspectrogram(
            pad, sr=sr, n_fft=n_fft, hop_length=hop, n_mels=n_mels,
            center=False,
        )),
        sr=sr, hop_length=hop,
    )
    err_p = float(jnp.abs(
        got - jnp.swapaxes(offline_pcen, 1, 2)[:, : got.shape[1]]
    ).max())
    print(f"streamed vs offline PCEN max |diff|: {err_p:.2e}")
    # PCEN's root compression keeps the comparison well-conditioned even
    # across the two transform algorithms (no log of noise-floor bins)
    assert err_p < 1e-3, err_p


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=2.0)
    a = ap.parse_args()
    main(streams=a.streams, seconds=a.seconds)
