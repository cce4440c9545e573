#!/usr/bin/env python
"""Headline benchmark: batched mel-spectrogram throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": frames/sec, "unit": "frames/s", "vs_baseline": x}

vs_baseline = speedup over a torch-CPU implementation of the identical
pipeline (torch.stft -> |.|^2 -> mel matmul -> power_to_db), the stand-in for
the driver's torchaudio-CPU baseline (torchaudio is not installed in this
image; this is the same compute torchaudio.transforms.MelSpectrogram does).
Config per BASELINE.md "Measurement configs": batch-64 x 1 s @ 22.05 kHz,
n_fft=2048, hop=512, n_mels=128, power=2, + power_to_db.

Also verifies the ISTFT round-trip max-error target (<= 1e-5) on a 30 s clip
and includes it as an auxiliary field.

Budget discipline (the round-2 postmortem): the driver kills this process at
~480 s, and on a 1-CPU host XLA/Mosaic *compiles* are the budget, not the
math. Three defenses, in order of importance:

1. a **persistent compilation cache** (`utils/warmup.py`) shared by the
   child process AND across driver retry attempts — the first attempt pays
   every compile once and writes it to disk, so even if it is killed
   mid-measurement the retry starts from warm executables (measured on this
   platform: 31.6 s cold -> 2.1 s warm for the headline pipeline);
2. a **deadline** threaded from the parent into the child and into
   `time_jax_amortized` — past it, the slow-but-precise escalation paths are
   skipped and a coarse `time_function` number is reported instead of
   nothing;
3. **one** amortized measurement (more repeat runs of the same two compiled
   loops) instead of round 2's median-of-3 distinct measurements — repeat
   runs are milliseconds, distinct measurements were fresh scan compiles.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

SR = 22050
N_FFT = 2048
HOP = 512
N_MELS = 128
BATCH = 64
WARMUP = 3
RUNS = 20

# Wall-clock budget for the WHOLE bench.py invocation. The driver's hard
# timeout is 480 s; leave headroom for interpreter startup + JSON flush.
TOTAL_BUDGET_S = float(os.environ.get("MAPT_BENCH_BUDGET_S", "440"))
_T0 = time.time()
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_compile_cache")


def _remaining(deadline: float) -> float:
    return deadline - time.time()


def _median_time(fn, runs=RUNS, warmup=WARMUP) -> float:
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def bench_ours(y: np.ndarray, deadline: float) -> tuple[float, str]:
    """Honest seconds-per-batch via the slope-amortized scan harness
    (see benchmarks/utils.py::time_jax_amortized for why: RPC latency floor,
    XLA DCE/factoring/LICM, and non-blocking block_until_ready on async
    PJRT proxies are all neutralized). Returns (seconds, method)."""
    import jax
    import jax.numpy as jnp

    from benchmarks.utils import time_function, time_jax_amortized
    from mlx_audio_primitives_tpu import melspectrogram, power_to_db

    yd = jax.device_put(jnp.asarray(y))
    fn = lambda x: power_to_db(
        melspectrogram(x, sr=SR, n_fft=N_FFT, hop_length=HOP, n_mels=N_MELS)
    )
    if _remaining(deadline) < 45.0:
        # Not enough budget left for the two scan compiles the amortized
        # harness needs cold — report a coarse per-call number (includes the
        # RPC dispatch floor, i.e. a conservative UPPER bound on latency).
        jitted = jax.jit(fn)
        return time_function(lambda: jitted(yd), warmup=2, runs=10), "coarse"
    # One amortized measurement, more repeat runs: runs are ~k*0.14 ms each
    # once compiled, so 9 of them cost nothing vs round 2's 3 distinct
    # measurements at 2 scan compiles apiece.
    t = time_jax_amortized(fn, yd, k=20, runs=9, deadline=deadline)
    return t, "amortized-slope"


def bench_torch_cpu(y: np.ndarray) -> float:
    import torch

    from mlx_audio_primitives_tpu.ops.mel import _mel_filterbank_table

    yt = torch.from_numpy(y)
    window = torch.hann_window(N_FFT, periodic=True)
    fb = torch.from_numpy(
        _mel_filterbank_table.host(SR, N_FFT, N_MELS, 0.0, SR / 2.0, False, "slaney")
        .astype(np.float32)
    )

    def run():
        spec = torch.stft(
            yt, n_fft=N_FFT, hop_length=HOP, window=window, center=True,
            pad_mode="constant", return_complex=True,
        )
        power = spec.real**2 + spec.imag**2
        mel = torch.matmul(fb, power)
        db = 10.0 * torch.log10(torch.clamp(mel, min=1e-10))
        db = torch.maximum(db, db.max() - 80.0)
        return db

    return _median_time(run, runs=11, warmup=2)


def roundtrip_error() -> float:
    import jax

    from mlx_audio_primitives_tpu import istft, stft

    rng = np.random.default_rng(1)
    y = rng.standard_normal(30 * SR).astype(np.float32)
    S = stft(y, n_fft=N_FFT, hop_length=HOP)
    rec = istft(S, hop_length=HOP, length=len(y))
    return float(jax.numpy.abs(rec - jax.numpy.asarray(y)).max())


def _tpu_child(deadline: float) -> None:
    """Child mode: the device-side measurements only, one JSON line.

    Every executable this process compiles lands in the on-disk cache, so a
    retry attempt (fresh interpreter) resumes from warm compiles — the
    round-2 failure mode was three identical cold attempts.
    """
    from mlx_audio_primitives_tpu.utils.warmup import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache(CACHE_DIR)
    import jax

    rng = np.random.default_rng(0)
    y = rng.standard_normal((BATCH, SR)).astype(np.float32)
    t_ours, method = bench_ours(y, deadline)
    # Round-trip check costs two more (cached-after-first-attempt) compiles;
    # skip rather than blow the deadline, parent reports err=NaN.
    err = roundtrip_error() if _remaining(deadline) > 20.0 else float("nan")
    t_scale = bench_ours_scale(deadline)
    scale_fields = {}
    if t_scale is not None:
        scale_fields = {
            "mel_scale_ms": round(t_scale * 1e3, 3),
            **_roofline_fields(t_scale, batch=SCALE_BATCH,
                               samples=SCALE_SECONDS * SR,
                               suffix="_scale"),
        }
    extra = bench_extra_configs(deadline)
    print(json.dumps({
        "t_ours": t_ours, "err": err, "backend": jax.default_backend(),
        "method": method, **_roofline_fields(t_ours), **scale_fields,
        **extra,
    }))


def _roofline_fields(
    t_ours: float, batch: int = BATCH, samples: int = SR,
    suffix: str = "",
) -> dict:
    """Speed-of-light fractions for the measured headline time — pure
    arithmetic against the v5e roofline model (benchmarks/roofline.py), no
    extra device work: exec_eff is the fraction of the as-executed
    radix-GEMM bound achieved, sol_eff the fraction of the algorithmic
    (split-radix FFT + mel GEMM) speed of light."""
    try:
        from benchmarks.roofline import (
            HBM_GBS,
            MXU_F32_TFLOPS,
            VPU_TFLOPS,
            mel_exec_flops_per_frame,
            mel_min_flops_per_frame,
            radix_vpu_flops_per_frame,
        )
        from mlx_audio_primitives_tpu import _config as _lib_config

        F = 1 + samples // HOP
        frames = batch * F
        # traffic: signal in + mel out + the separate power_to_db pass
        # (read + write of the (B, n_mels, F) array)
        bytes_moved = 4 * (batch * samples + 3 * batch * N_MELS * F)
        scale = 0.5 if _lib_config.ANALYSIS_FAST_GEMM else 1.0
        t_mem = bytes_moved / (HBM_GBS * 1e9)
        t_exec = (
            frames * mel_exec_flops_per_frame(N_FFT, HOP, N_MELS) * scale
            / (MXU_F32_TFLOPS * 1e12)
            + frames * radix_vpu_flops_per_frame(N_FFT, HOP) / (VPU_TFLOPS * 1e12)
        )
        t_min = (
            frames * mel_min_flops_per_frame(N_FFT, N_MELS) * scale
            / (MXU_F32_TFLOPS * 1e12)
        )
        return {
            f"exec_efficiency{suffix}": round(max(t_mem, t_exec) / t_ours, 4),
            f"sol_efficiency{suffix}": round(max(t_mem, t_min) / t_ours, 4),
        }
    except Exception:  # never let bookkeeping kill the measurement
        return {}


# Noise-robust scale config (STATUS.md: headline-config times below
# ~0.05 ms are dispatch-noise bounded with a 4.7x session spread; this one
# runs ~2 ms/batch, <10% variance): batch-256 x 4 s clips, same transform.
SCALE_BATCH = 256
SCALE_SECONDS = 4


def bench_ours_scale(deadline: float) -> float | None:
    """Seconds-per-batch for the scale config, or None if the deadline
    can't absorb its (cached-after-first-round) compiles."""
    if _remaining(deadline) < 60.0:
        return None
    import jax
    import jax.numpy as jnp

    from benchmarks.utils import time_jax_amortized
    from mlx_audio_primitives_tpu import melspectrogram, power_to_db

    rng = np.random.default_rng(2)
    y = rng.standard_normal((SCALE_BATCH, SCALE_SECONDS * SR)).astype(
        np.float32)
    yd = jax.device_put(jnp.asarray(y))
    fn = lambda x: power_to_db(
        melspectrogram(x, sr=SR, n_fft=N_FFT, hop_length=HOP, n_mels=N_MELS)
    )
    try:
        return time_jax_amortized(fn, yd, k=8, runs=5, deadline=deadline)
    except Exception:
        return None


def bench_extra_configs(deadline: float) -> dict:
    """The three BASELINE.json measurement configs beyond the headline +
    round-trip: MFCC pipeline, batched kaiser polyphase 44.1->16 kHz, and
    Griffin-Lim-32 + yin pitch tracking. Each is optional (deadline-gated,
    exception-shielded) so a short budget still reports the headline; the
    persistent compile cache makes them ~free from the second attempt on."""
    import jax
    import jax.numpy as jnp

    from benchmarks.utils import time_jax_amortized

    out: dict = {}
    rng = np.random.default_rng(3)

    if _remaining(deadline) > 55.0:
        try:
            from mlx_audio_primitives_tpu import mfcc

            y = jax.device_put(jnp.asarray(
                rng.standard_normal((BATCH, SR)).astype(np.float32)))
            t = time_jax_amortized(
                lambda x: mfcc(x, sr=SR, n_mfcc=20, n_fft=N_FFT,
                               hop_length=HOP, n_mels=N_MELS, lifter=22),
                y, k=12, runs=5, deadline=deadline)
            out["mfcc_ms"] = round(t * 1e3, 3)
        except Exception as e:  # record, don't hide: a deterministic
            # regression must look different from a deadline skip
            out["mfcc_error"] = repr(e)[:200]

    if _remaining(deadline) > 45.0:
        try:
            from mlx_audio_primitives_tpu import resample

            y = jax.device_put(jnp.asarray(
                rng.standard_normal((BATCH, 44100)).astype(np.float32)))
            t = time_jax_amortized(
                lambda x: resample(x, orig_sr=44100, target_sr=16000,
                                   res_type="kaiser_best"),
                y, k=8, runs=5, deadline=deadline)
            out["resample_poly_ms"] = round(t * 1e3, 3)
        except Exception as e:  # record, don't hide: a deterministic
            # regression must look different from a deadline skip
            out["resample_poly_error"] = repr(e)[:200]

    if _remaining(deadline) > 45.0:
        try:
            from mlx_audio_primitives_tpu import griffinlim, stft, yin

            y1 = rng.standard_normal(SR).astype(np.float32)
            mag = jax.device_put(jnp.abs(stft(y1, n_fft=N_FFT,
                                              hop_length=HOP)))
            yd = jax.device_put(jnp.asarray(y1))
            t_gl = time_jax_amortized(
                lambda m: griffinlim(m, n_iter=32, hop_length=HOP),
                mag, k=4, runs=4, deadline=deadline)
            t_yin = time_jax_amortized(
                lambda x: yin(x, fmin=65.0, fmax=2093.0, sr=SR),
                yd, k=8, runs=4, deadline=deadline)
            out["gl32_pitch_ms"] = round((t_gl + t_yin) * 1e3, 3)
        except Exception as e:  # record, don't hide: a deterministic
            # regression must look different from a deadline skip
            out["gl32_pitch_error"] = repr(e)[:200]
    return out


def _run_tpu_measurement(attempts: int = 3) -> dict:
    """Run the device measurements in a fresh subprocess, retrying on
    failure — the remote TPU attachment intermittently drops its session
    mid-process (every subsequent op hangs or fails UNIMPLEMENTED), and a
    fresh interpreter re-establishes it. The persistent compilation cache
    makes retries cheap: attempt 2 reuses every executable attempt 1
    compiled before dying."""
    last = ""
    hard_deadline = _T0 + TOTAL_BUDGET_S
    for i in range(attempts):
        # Reserve ~25 s after the child for the torch baseline + JSON.
        child_budget = _remaining(hard_deadline) - 25.0
        if child_budget < 30.0:
            break
        # The axon tunnel sometimes HANGS rather than dying; a hung attempt
        # would otherwise consume the whole budget and leave nothing for the
        # retry (which re-attaches the TPU session in a fresh interpreter
        # and resumes from the warm compile cache). Cap non-final attempts
        # at half the remaining budget (floor 150 s — enough for a warm
        # child; a compile-bound cold attempt still banks its executables
        # for the next attempt).
        if i < attempts - 1:
            child_budget = min(child_budget, max(190.0, child_budget * 0.55))
        child_deadline = time.time() + child_budget
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--_tpu-child",
                 f"{child_deadline:.3f}"],
                capture_output=True, text=True, timeout=child_budget + 15.0,
            )
        except subprocess.TimeoutExpired:
            last = f"attempt {i + 1}: timeout after {child_budget:.0f}s"
            print(last, file=sys.stderr)
            continue
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                out = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "t_ours" in out:
                return out
        last = f"attempt {i + 1}: rc={proc.returncode}: {proc.stderr[-500:]}"
        print(last, file=sys.stderr)
    raise RuntimeError(f"TPU measurement failed after {attempts} attempts: {last}")


def main() -> None:
    rng = np.random.default_rng(0)
    y = rng.standard_normal((BATCH, SR)).astype(np.float32)
    n_frames = 1 + SR // HOP

    dev = _run_tpu_measurement()
    t_ours = dev["t_ours"]
    t_torch = bench_torch_cpu(y)
    frames_per_sec = BATCH * n_frames / t_ours

    print(
        json.dumps(
            {
                "metric": "batched mel-spectrogram frames/sec/chip (n_fft=2048)",
                "value": round(frames_per_sec, 1),
                "unit": "frames/s",
                "vs_baseline": round(t_torch / t_ours, 2),
                "istft_roundtrip_max_err": dev["err"],
                "ours_ms": round(t_ours * 1e3, 3),
                "torch_cpu_ms": round(t_torch * 1e3, 3),
                "backend": dev["backend"],
                "timing_method": dev.get("method", "amortized-slope"),
                # speed-of-light fractions (benchmarks/roofline.py model):
                # exec = vs the as-executed radix-GEMM bound, sol = vs the
                # algorithmic split-radix-FFT + mel-GEMM minimum
                **{k: dev[k] for k in ("exec_efficiency", "sol_efficiency",
                                       "mel_scale_ms",
                                       "exec_efficiency_scale",
                                       "sol_efficiency_scale",
                                       "mfcc_ms", "resample_poly_ms",
                                       "gl32_pitch_ms")
                   if k in dev},
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--_tpu-child":
        dl = float(sys.argv[2]) if len(sys.argv) > 2 else _T0 + TOTAL_BUDGET_S
        _tpu_child(dl)
    else:
        main()
