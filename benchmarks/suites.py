"""Per-op benchmark suites vs CPU oracles.

Condensed TPU analog of the reference's ten `bench_*.py` files
(`bench_stft.py`, `bench_mel.py`, `bench_mfcc.py`, `bench_features.py`,
`bench_windows.py`, `bench_resample.py`, `bench_griffinlim.py` — SURVEY.md
§2.4): every public-op family timed on device against the best available CPU
oracle (torch for STFT/mel, scipy for windows/resample/DCT), with accuracy
stats. librosa/torchaudio are not installed in this image; torch.stft and
scipy are the stand-in baselines.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .schemas import BenchmarkResult
from .utils import (
    compute_accuracy,
    rand_signal,
    time_function,
    time_jax_amortized,
)

SR = 22050


def _signal(n=SR, batch=None, seed=0):
    """HOST numpy signal — callers feed both the device op and the torch/
    scipy CPU oracle (torch.from_numpy needs host memory); the device-side
    suites use `utils.rand_signal` instead."""
    rng = np.random.default_rng(seed)
    shape = (n,) if batch is None else (batch, n)
    return rng.standard_normal(shape).astype(np.float32)


def bench_stft() -> list[BenchmarkResult]:
    import torch

    from mlx_audio_primitives_tpu import stft

    y = _signal()
    yd = jax.device_put(jnp.asarray(y))
    n_fft, hop = 2048, 512

    t_ours = time_jax_amortized(
        lambda x: stft(x, n_fft=n_fft, hop_length=hop), yd
    )
    yt = torch.from_numpy(y)
    win = torch.hann_window(n_fft, periodic=True)

    def torch_stft():
        return torch.stft(yt, n_fft, hop, window=win, center=True,
                          pad_mode="constant", return_complex=True)

    t_torch = time_function(torch_stft, warmup=1, runs=5)
    # complex64 device->host transfer is unimplemented on some remote TPU
    # attachments; take |.| on device before transferring.
    acc = compute_accuracy(
        np.asarray(jnp.abs(stft(yd, n_fft=n_fft, hop_length=hop))),
        np.abs(torch_stft().numpy()),
    )
    return [
        BenchmarkResult(
            name=f"stft n_fft={n_fft}",
            time_ms=t_ours * 1e3,
            baseline_name="torch-cpu stft",
            baseline_time_ms=t_torch * 1e3,
            accuracy=acc,
        )
    ]


def bench_istft() -> list[BenchmarkResult]:
    from mlx_audio_primitives_tpu import istft, stft

    y = _signal()
    S = stft(y, n_fft=2048, hop_length=512)
    S = jax.device_put(S)
    t = time_jax_amortized(
        lambda s: istft(s, hop_length=512, length=SR), S
    )
    rec = np.asarray(istft(S, hop_length=512, length=SR))
    acc = compute_accuracy(rec, y)
    return [
        BenchmarkResult(
            name="istft round-trip n_fft=2048",
            time_ms=t * 1e3,
            accuracy=acc,
            extra={"roundtrip_max_err": acc.max_error},
        )
    ]


def bench_mel(batch: int = 64) -> list[BenchmarkResult]:
    import torch

    from mlx_audio_primitives_tpu import melspectrogram
    from mlx_audio_primitives_tpu.ops.mel import _mel_filterbank_table

    y = _signal(batch=batch)
    yd = jax.device_put(jnp.asarray(y))
    t_ours = time_jax_amortized(
        lambda x: melspectrogram(x, sr=SR, n_mels=128), yd
    )
    yt = torch.from_numpy(y)
    win = torch.hann_window(2048, periodic=True)
    fb = torch.from_numpy(
        _mel_filterbank_table.host(SR, 2048, 128, 0.0, SR / 2.0, False, "slaney")
        .astype(np.float32)
    )

    def torch_mel():
        spec = torch.stft(yt, 2048, 512, window=win, center=True,
                          pad_mode="constant", return_complex=True)
        return fb @ (spec.real**2 + spec.imag**2)

    t_torch = time_function(torch_mel, warmup=1, runs=5)
    acc = compute_accuracy(
        np.asarray(melspectrogram(yd, sr=SR, n_mels=128)), torch_mel().numpy()
    )
    return [
        BenchmarkResult(
            name=f"melspectrogram batch={batch} n_mels=128",
            time_ms=t_ours * 1e3,
            baseline_name="torch-cpu mel",
            baseline_time_ms=t_torch * 1e3,
            accuracy=acc,
        )
    ]


def bench_mfcc() -> list[BenchmarkResult]:
    from mlx_audio_primitives_tpu import mfcc

    y = _signal(batch=8)
    yd = jax.device_put(jnp.asarray(y))
    t = time_jax_amortized(lambda x: mfcc(x, sr=SR, n_mfcc=13), yd)
    return [BenchmarkResult(name="mfcc batch=8 n_mfcc=13", time_ms=t * 1e3)]


def bench_windows() -> list[BenchmarkResult]:
    import scipy.signal

    from mlx_audio_primitives_tpu import get_window

    out = []
    for name, n in [("hann", 2048), ("blackman", 4096)]:
        get_window(name, n)  # warm
        t_cached = time_function(lambda: get_window(name, n), warmup=1, runs=20)
        t_scipy = time_function(
            lambda: scipy.signal.get_window(name, n, fftbins=True),
            warmup=1, runs=20,
        )
        out.append(
            BenchmarkResult(
                name=f"get_window {name}-{n} (cached)",
                time_ms=t_cached * 1e3,
                baseline_name="scipy get_window",
                baseline_time_ms=t_scipy * 1e3,
            )
        )
    return out


def bench_filterbank() -> list[BenchmarkResult]:
    from mlx_audio_primitives_tpu import mel_filterbank

    out = []
    for n_mels in (40, 128):
        mel_filterbank(SR, 2048, n_mels=n_mels)  # warm
        t_cached = time_function(
            lambda: mel_filterbank(SR, 2048, n_mels=n_mels), warmup=1, runs=20
        )
        from mlx_audio_primitives_tpu.ops.mel import _mel_filterbank_table

        def cold():
            _mel_filterbank_table._host_builder.cache_clear()
            return _mel_filterbank_table.host(
                SR, 2048, n_mels, 0.0, SR / 2.0, False, "slaney"
            )

        t_cold = time_function(cold, warmup=0, runs=5)
        out.append(
            BenchmarkResult(
                name=f"mel_filterbank n_mels={n_mels} (cached)",
                time_ms=t_cached * 1e3,
                baseline_name="uncached f64 build",
                baseline_time_ms=t_cold * 1e3,
            )
        )
    return out


def bench_resample() -> list[BenchmarkResult]:
    import scipy.signal

    from mlx_audio_primitives_tpu import resample, resample_poly

    y = _signal(n=44100, batch=8)
    yd = jax.device_put(jnp.asarray(y))
    t_poly = time_jax_amortized(lambda x: resample_poly(x, 160, 441), yd)
    t_scipy = time_function(
        lambda: scipy.signal.resample_poly(y, 160, 441, axis=-1),
        warmup=1, runs=5,
    )
    acc = compute_accuracy(
        np.asarray(resample_poly(yd, 160, 441)),
        scipy.signal.resample_poly(y.astype(np.float64), 160, 441, axis=-1),
    )
    t_fft = time_jax_amortized(lambda x: resample(x, 44100, 16000), yd)
    return [
        BenchmarkResult(
            name="resample_poly 44.1k->16k batch=8",
            time_ms=t_poly * 1e3,
            baseline_name="scipy resample_poly",
            baseline_time_ms=t_scipy * 1e3,
            accuracy=acc,
        ),
        BenchmarkResult(name="resample fft 44.1k->16k batch=8", time_ms=t_fft * 1e3),
    ]


def bench_griffinlim() -> list[BenchmarkResult]:
    from mlx_audio_primitives_tpu import griffinlim, magnitude, stft

    y = _signal()
    S = jax.device_put(magnitude(stft(y, n_fft=1024, hop_length=256)))
    t = time_jax_amortized(
        lambda s: griffinlim(s, n_iter=32, hop_length=256, init="zeros"), S, k=3
    )
    return [BenchmarkResult(name="griffinlim 32 iters", time_ms=t * 1e3)]


def bench_features() -> list[BenchmarkResult]:
    from mlx_audio_primitives_tpu import (
        pitch_detect_acf,
        spectral_centroid,
        spectral_contrast,
        zero_crossing_rate,
    )

    y = _signal(batch=8)
    yd = jax.device_put(jnp.asarray(y))
    out = []
    for name, fn in [
        ("spectral_centroid batch=8", lambda x: spectral_centroid(x, sr=SR)),
        ("spectral_contrast batch=8", lambda x: spectral_contrast(x, sr=SR)),
        ("zero_crossing_rate batch=8", lambda x: zero_crossing_rate(x)),
        ("pitch_detect_acf batch=8", lambda x: pitch_detect_acf(x, sr=SR)[0]),
    ]:
        out.append(
            BenchmarkResult(name=name, time_ms=time_jax_amortized(fn, yd) * 1e3)
        )
    return out


def bench_pallas() -> list[BenchmarkResult]:
    """Pallas kernels vs XLA fallback (analog of `bench_cpp_extension.py`)."""
    from mlx_audio_primitives_tpu import istft, melspectrogram, stft

    y = _signal(batch=64)
    yd = jax.device_put(jnp.asarray(y))
    out = []
    t_xla = time_jax_amortized(
        lambda x: melspectrogram(x, sr=SR, n_mels=128, use_pallas=False), yd
    )
    t_pal = time_jax_amortized(
        lambda x: melspectrogram(x, sr=SR, n_mels=128, use_pallas=True), yd
    )
    out.append(
        BenchmarkResult(
            name="melspectrogram pallas-fused batch=64",
            time_ms=t_pal * 1e3,
            baseline_name="xla pipeline",
            baseline_time_ms=t_xla * 1e3,
        )
    )
    S = jax.device_put(stft(_signal(), n_fft=2048, hop_length=512))
    t_x = time_jax_amortized(
        lambda s: istft(s, hop_length=512, use_pallas=False), S
    )
    t_p = time_jax_amortized(
        lambda s: istft(s, hop_length=512, use_pallas=True), S
    )
    out.append(
        BenchmarkResult(
            name="istft fused kernel",
            time_ms=t_p * 1e3,
            baseline_name="xla inverse+OLA",
            baseline_time_ms=t_x * 1e3,
        )
    )
    t_sx = time_jax_amortized(
        lambda x: stft(x, n_fft=2048, hop_length=512, use_pallas=False), yd
    )
    t_sp = time_jax_amortized(
        lambda x: stft(x, n_fft=2048, hop_length=512, use_pallas=True), yd
    )
    out.append(
        BenchmarkResult(
            name="stft radix kernel batch=64",
            time_ms=t_sp * 1e3,
            baseline_name="xla packed fft",
            baseline_time_ms=t_sx * 1e3,
        )
    )
    from mlx_audio_primitives_tpu import griffinlim

    Sm = jax.device_put(
        jax.numpy.abs(stft(_signal(), n_fft=1024, hop_length=256))
    )
    t_gx = time_jax_amortized(
        lambda s: griffinlim(s, n_iter=32, hop_length=256, random_state=0,
                             use_pallas=False), Sm, k=5
    )
    t_gp = time_jax_amortized(
        lambda s: griffinlim(s, n_iter=32, hop_length=256, random_state=0,
                             use_pallas=True), Sm, k=5
    )
    out.append(
        BenchmarkResult(
            name="griffinlim 32it fused kernels in-loop",
            time_ms=t_gp * 1e3,
            baseline_name="xla loop",
            baseline_time_ms=t_gx * 1e3,
        )
    )
    return out


def bench_headline() -> list[BenchmarkResult]:
    """The driver's five measurement configs (BASELINE.md), in one suite."""
    import jax.numpy as jnp

    from mlx_audio_primitives_tpu import (
        griffinlim,
        istft,
        magnitude,
        melspectrogram,
        mfcc,
        pitch_detect_acf,
        power_to_db,
        resample_poly,
        stft,
    )

    out = []

    # 1. STFT->ISTFT round-trip, 30 s mono 22.05 kHz
    y30 = _signal(n=30 * SR, seed=1)
    S30 = stft(y30, n_fft=2048, hop_length=512)
    rec = np.asarray(istft(S30, hop_length=512, length=len(y30)))
    err = float(np.abs(rec - y30).max())
    S30d = jax.device_put(S30)
    t = time_jax_amortized(
        lambda s: istft(s, hop_length=512, length=30 * SR), S30d, k=10
    )
    out.append(
        BenchmarkResult(
            name="headline: 30s STFT->ISTFT round-trip",
            time_ms=t * 1e3,
            extra={"max_err": err, "target_err": 1e-5},
        )
    )

    # 2. batch-64 melspectrogram + power_to_db, n_mels=128
    yb = jax.device_put(jnp.asarray(_signal(batch=64)))
    t = time_jax_amortized(
        lambda x: power_to_db(melspectrogram(x, sr=SR, n_mels=128)), yb
    )
    n_frames = 1 + SR // 512
    out.append(
        BenchmarkResult(
            name="headline: batch-64 mel+db",
            time_ms=t * 1e3,
            extra={"frames_per_sec": 64 * n_frames / t},
        )
    )

    # 3. MFCC pipeline
    t = time_jax_amortized(lambda x: mfcc(x, sr=SR, n_mfcc=13), yb)
    out.append(BenchmarkResult(name="headline: batch-64 mfcc", time_ms=t * 1e3))

    # 4. polyphase 44.1k -> 16k batched
    y44 = jax.device_put(jnp.asarray(_signal(n=44100, batch=8)))
    t = time_jax_amortized(lambda x: resample_poly(x, 160, 441), y44)
    out.append(
        BenchmarkResult(name="headline: batch-8 poly 44.1k->16k", time_ms=t * 1e3)
    )

    # 5. 32-iter Griffin-Lim + pitch tracking
    Sm = jax.device_put(magnitude(stft(_signal(), n_fft=1024, hop_length=256)))
    t = time_jax_amortized(
        lambda s: griffinlim(s, n_iter=32, hop_length=256, init="zeros"), Sm, k=4
    )
    out.append(BenchmarkResult(name="headline: griffinlim 32 iters", time_ms=t * 1e3))
    y1 = jax.device_put(jnp.asarray(_signal()))
    t = time_jax_amortized(lambda x: pitch_detect_acf(x, sr=SR)[0], y1, k=10)
    out.append(BenchmarkResult(name="headline: pitch_detect_acf 1s", time_ms=t * 1e3))
    return out


def bench_fallback() -> list[BenchmarkResult]:
    """Forced-fallback comparisons across every dispatch branch
    (see `benchmarks/fallback.py`)."""
    from .fallback import run_fallback

    return run_fallback()


def bench_streaming() -> list[BenchmarkResult]:
    """Per-push latency of the chunked frontends — the serving number a
    realtime pipeline cares about (wall clock per push incl. dispatch, NOT
    slope-amortized: a stream dispatches one push at a time)."""
    import time as _time

    from mlx_audio_primitives_tpu.ops.streaming import (
        StreamingLogMel,
        StreamingPitch,
        StreamingResample,
    )

    out = []
    rng = np.random.default_rng(0)
    for name, make, hop, k, rate in [
        ("StreamingLogMel push (4 frames)",
         lambda: StreamingLogMel(sr=SR, n_fft=2048, hop_length=512), 512, 4,
         SR),
        ("StreamingPitch push (4 frames)",
         lambda: StreamingPitch(sr=SR, frame_length=2048, hop_length=512),
         512, 4, SR),
        ("StreamingResample push (44.1k->16k, 20 ms)",
         lambda: StreamingResample(up=160, down=441), 441, 2, 44100),
    ]:
        s = make()
        chunk = rng.standard_normal((1, k * hop)).astype(np.float32)
        for _ in range(3):  # warm the executable + tables
            jax.block_until_ready(jax.tree.leaves(s.push(chunk)))
        times = []
        for _ in range(20):
            t0 = _time.perf_counter()
            jax.block_until_ready(jax.tree.leaves(s.push(chunk)))
            times.append(_time.perf_counter() - t0)
        t = float(np.median(times))
        rt = (k * hop / rate) / t  # x realtime per stream
        out.append(
            BenchmarkResult(
                name=name, time_ms=t * 1e3,
                extra={"x_realtime_per_stream": rt},
            )
        )
    # Concurrent-streams scaling: the streaming classes are batch-first, so
    # one chip serves B independent streams per push — per-push wall clock
    # stays ~flat while B grows (the chip is compute-idle at small B; the
    # dispatch floor dominates), giving the streams-per-chip serving number.
    for B in (64, 1024):
        s = StreamingLogMel(sr=SR, n_fft=2048, hop_length=512, batch=B)
        # device-resident chunk: time the COMPUTE per push. (Pushing from a
        # host array adds one H2D copy per push, which on the tunneled debug
        # attachment costs ~100x the op itself — a transport artifact, not a
        # serving cost; production ingest overlaps transfers.)
        chunk = jax.device_put(
            jnp.asarray(rng.standard_normal((B, 4 * 512)).astype(np.float32))
        )
        for _ in range(3):
            jax.block_until_ready(s.push(chunk))
        times = []
        for _ in range(20):
            t0 = _time.perf_counter()
            jax.block_until_ready(s.push(chunk))
            times.append(_time.perf_counter() - t0)
        t = float(np.median(times))
        budget = 4 * 512 / SR  # seconds of audio per push
        out.append(
            BenchmarkResult(
                name=f"StreamingLogMel push (4 frames, {B} streams)",
                time_ms=t * 1e3,
                extra={"realtime_streams_per_chip": B * budget / t},
            )
        )
    return out


# Insertion order = execution order for "run everything": cheap, headline
# suites first, the compile-heavy comparison suites (pallas, fallback) last —
# a flaky remote TPU attachment that drops mid-run then still yields the
# core numbers instead of burning the session on forced-fallback sweeps.
def bench_roadmap() -> list[BenchmarkResult]:
    """Chroma / CQT / onset / YIN — the reference's "Potential Features"
    roadmap, implemented here (no CPU oracle exists in the reference to
    compare against; report absolute device time)."""
    from mlx_audio_primitives_tpu import (
        chroma_cens,
        chroma_stft,
        cqt,
        lpc,
        melspectrogram,
        onset_strength,
        pcen,
        piptrack,
        pseudo_cqt,
        tonnetz,
        yin,
    )

    y = _signal(batch=8)
    yd = jax.device_put(jnp.asarray(y))
    out = []
    for name, fn in [
        ("chroma_stft batch=8", lambda x: chroma_stft(x, sr=SR)),
        ("cqt 84-bin batch=8", lambda x: jnp.abs(cqt(x, sr=SR))),
        ("pseudo_cqt 84-bin batch=8", lambda x: pseudo_cqt(x, sr=SR)),
        ("onset_strength batch=8", lambda x: onset_strength(x, sr=SR)),
        ("yin batch=8", lambda x: yin(x, fmin=60.0, fmax=1000.0, sr=SR)),
        ("piptrack batch=8", lambda x: piptrack(y=x, sr=SR)),
        ("chroma_cens batch=8", lambda x: chroma_cens(y=x, sr=SR)),
        ("tonnetz batch=8", lambda x: tonnetz(y=x, sr=SR)),
        ("pcen-mel batch=8", lambda x: pcen(
            melspectrogram(x, sr=SR, n_mels=128), sr=SR)),
        ("lpc order-16 batch=8", lambda x: lpc(x, 16)),
    ]:
        out.append(
            BenchmarkResult(name=name, time_ms=time_jax_amortized(fn, yd) * 1e3)
        )

    # the two ops with natural scipy/numpy CPU baselines get speedup rows
    import scipy.signal

    Mh = np.asarray(melspectrogram(yd, sr=SR, n_mels=128))
    t_pcen = time_jax_amortized(
        lambda m: pcen(m, sr=SR), jax.device_put(jnp.asarray(Mh))
    )
    tf = 0.4 * SR / 512.0
    b = float((np.sqrt(1 + 4 * tf * tf) - 1) / (2 * tf * tf))

    def pcen_cpu():
        zi = scipy.signal.lfilter_zi([b], [1, b - 1])[..., 0] * Mh[..., 0:1]
        M, _ = scipy.signal.lfilter([b], [1, b - 1], Mh, axis=-1, zi=zi)
        return (2.0**0.5) * np.expm1(
            0.5 * np.log1p(Mh * (1e-6 + M) ** -0.98 / 2.0)
        )

    out.append(
        BenchmarkResult(
            name="pcen (mel in) batch=8",
            time_ms=t_pcen * 1e3,
            baseline_name="scipy lfilter + numpy",
            baseline_time_ms=time_function(pcen_cpu, warmup=1, runs=5) * 1e3,
        )
    )

    from mlx_audio_primitives_tpu import pyin

    t_pyin = time_function(
        lambda: pyin(y[:2], fmin=65.0, fmax=1000.0, sr=SR), warmup=1, runs=3
    )
    out.append(
        BenchmarkResult(name="pyin batch=2 (incl. host backtrace)",
                        time_ms=t_pyin * 1e3)
    )

    t_lpc = time_jax_amortized(lambda x: lpc(x, 16), yd)

    def lpc_cpu():
        # scalar Burg per row (the loop librosa jit-compiles with numba;
        # plain numpy here)
        outs = []
        for row in y:
            r = row.astype(np.float64)
            ar = np.zeros(17)
            ar[0] = 1.0
            fwd, bwd = r[1:].copy(), r[:-1].copy()
            den = fwd @ fwd + bwd @ bwd
            for i in range(16):
                k = 0.0 if den <= 0 else -2.0 * (bwd @ fwd) / den
                prev = ar.copy()
                for j in range(1, i + 2):
                    ar[j] = prev[j] + k * prev[i + 1 - j]
                f_new = fwd + k * bwd
                b_new = bwd + k * fwd
                den = (1 - k * k) * den - f_new[0] ** 2 - b_new[-1] ** 2
                fwd, bwd = f_new[1:], b_new[:-1]
            outs.append(ar)
        return np.asarray(outs)

    out.append(
        BenchmarkResult(
            name="lpc order-16 batch=8 (vs CPU Burg)",
            time_ms=t_lpc * 1e3,
            baseline_name="numpy Burg loop",
            baseline_time_ms=time_function(lpc_cpu, warmup=1, runs=3) * 1e3,
        )
    )
    return out


def bench_compile() -> list[BenchmarkResult]:
    """Compile-time regression gate (round-2 postmortem).

    Round 2's bench timed out because XLA/Mosaic *compile* time — not math —
    blew the driver budget, and nothing in the suite measured it. These rows
    time ``jit(...).lower(x).compile()`` for the headline pipeline in both
    the direct and scan-wrapped (amortized-harness) contexts, plus the
    STFT/ISTFT pair. ``extra`` records trace/lower separately from compile.

    Numbers include whatever compilation caches the process has enabled —
    a warm persistent cache (`utils/warmup.py`) legitimately makes these
    near-zero, which is itself worth seeing in a bench run.
    """
    from mlx_audio_primitives_tpu import istft, melspectrogram, power_to_db, stft

    import time as _time

    y = rand_signal(SR, batch=64)
    S = jax.device_put(stft(y, n_fft=2048, hop_length=512))

    headline = lambda x: power_to_db(
        melspectrogram(x, sr=SR, n_fft=2048, hop_length=512, n_mels=128)
    )

    def scan_wrapped(x):
        def body(carry, _):
            out = headline(x * (1.0 + carry))
            total = jnp.sum(jnp.abs(out)).astype(jnp.float32)
            return total * 1e-20, total

        return jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=24)[1][-1]

    out = []
    for name, fn, arg in [
        ("compile headline direct", headline, y),
        ("compile headline scan-k24", scan_wrapped, y),
        ("compile stft", lambda x: stft(x, n_fft=2048, hop_length=512), y),
        ("compile istft", lambda s: istft(s, hop_length=512, length=SR), S),
    ]:
        t0 = _time.perf_counter()
        lowered = jax.jit(fn).lower(arg)
        t_lower = _time.perf_counter() - t0
        t0 = _time.perf_counter()
        lowered.compile()
        t_compile = _time.perf_counter() - t0
        out.append(
            BenchmarkResult(
                name=name,
                time_ms=t_compile * 1e3,
                extra={"trace_lower_ms": round(t_lower * 1e3, 1)},
            )
        )
    return out


ALL_SUITES = {
    "headline": bench_headline,
    "stft": bench_stft,
    "istft": bench_istft,
    "mel": bench_mel,
    "mfcc": bench_mfcc,
    "windows": bench_windows,
    "filterbank": bench_filterbank,
    "resample": bench_resample,
    "griffinlim": bench_griffinlim,
    "features": bench_features,
    "streaming": bench_streaming,
    "pallas": bench_pallas,
    "fallback": bench_fallback,
    "roadmap": bench_roadmap,
    "compile": bench_compile,
}
SUITE_ORDER = list(ALL_SUITES)
