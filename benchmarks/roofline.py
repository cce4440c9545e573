"""Speed-of-light (roofline) analysis for the fused kernels.

The scaling-book recipe applied to this library: for each op and workload,
compute the two hardware bounds

    T_mem  = minimum HBM bytes / HBM bandwidth
    T_comp = FLOPs / MXU peak

and report measured time against ``max(T_mem, T_comp)``. Two FLOP counts are
used:

* **algorithmic minimum** — an idealized real FFT (``2.5 * N * log2 N`` per
  frame) plus the mel GEMM. Efficiency against this measures the total
  price of the implementation.
* **as-executed** — the radix-GEMM structure the fused kernels actually run
  (`kernels/mel_fused.py` docstring): per frame, ``R2 * (2 + 4*(NC-1))``
  complex-base dots of shape ``(., 128) @ (128, 128)`` plus ``G`` mel dots
  of ``(., 128) @ (128, n_mels)``. Efficiency against this measures kernel
  quality: how close the GEMMs run to the MXU roofline. The gap between the
  two counts is the deliberate FLOPs-for-MXU trade (TPUs have no FFT unit).

Peaks are nominal TPU v5e: 819 GB/s HBM, 197 TFLOP/s bf16 MXU; the library
runs its accuracy-critical GEMMs at ``Precision.HIGHEST`` (6-pass bf16),
so the effective f32 peak is ~197/6 = 32.8 TFLOP/s.

Run: ``tpu-audio-bench --roofline`` or ``python -m benchmarks.roofline``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from .utils import time_jax_amortized

SR = 22050

# Nominal TPU v5e peaks (per chip).
HBM_GBS = 819.0
MXU_BF16_TFLOPS = 197.0
HIGHEST_PASSES = 6  # Precision.HIGHEST = 6-pass bf16
MXU_F32_TFLOPS = MXU_BF16_TFLOPS / HIGHEST_PASSES
VPU_TFLOPS = 3.9  # (8,128) vregs x 4 ALUs x ~0.94 GHz
LANE = 128


@dataclass
class RooflineRow:
    op: str
    config: str
    measured_ms: float
    t_mem_us: float
    t_comp_exec_us: float
    t_comp_min_us: float
    # fraction of the as-executed roofline achieved (1.0 = at the bound)
    exec_efficiency: float
    # fraction of the algorithmic-minimum speed of light achieved
    sol_efficiency: float

    def as_dict(self) -> dict:
        return {
            "op": self.op,
            "config": self.config,
            "measured_ms": self.measured_ms,
            "t_mem_us": self.t_mem_us,
            "t_comp_exec_us": self.t_comp_exec_us,
            "t_comp_min_us": self.t_comp_min_us,
            "exec_efficiency": self.exec_efficiency,
            "sol_efficiency": self.sol_efficiency,
        }


def _radix_factors(n_fft: int, hop: int) -> tuple[int, int, int, int]:
    C = n_fft // hop
    R2 = hop // LANE
    NC = C // 2 + 1
    G = NC * R2
    return C, R2, NC, G


def mel_exec_flops_per_frame(n_fft: int, hop: int, n_mels: int) -> float:
    """MXU FLOPs per frame the fused mel kernel actually executes."""
    C, R2, NC, G = _radix_factors(n_fft, hop)
    base_dots = R2 * (2 + 4 * (NC - 1))
    mel_dots_flops = G * LANE * n_mels * 2
    return base_dots * LANE * LANE * 2 + mel_dots_flops


def radix_vpu_flops_per_frame(n_fft: int, hop: int) -> float:
    """VPU FLOPs per frame of the radix body's elementwise stages (stage-1
    butterfly + twiddle, stage-2 butterfly, |X|^2) — serialized with the
    GEMMs inside each frame's dependency chain, so they add to T_comp."""
    C, R2, NC, G = _radix_factors(n_fft, hop)
    stage1 = NC * C * hop * 2 + NC * hop * 6
    stage2 = NC * R2 * R2 * LANE * 4
    magsq = G * LANE * 3
    return stage1 + stage2 + magsq


def stft_exec_flops_per_frame(n_fft: int, hop: int) -> float:
    """MXU FLOPs per frame the fused STFT kernel executes (no mel stage)."""
    C, R2, NC, _ = _radix_factors(n_fft, hop)
    base_dots = R2 * (2 + 4 * (NC - 1))
    return base_dots * LANE * LANE * 2


def mel_min_flops_per_frame(n_fft: int, n_mels: int) -> float:
    """Idealized: split-radix real FFT + mel matmul."""
    return 2.5 * n_fft * math.log2(n_fft) + 2 * (n_fft // 2 + 1) * n_mels


def stft_min_flops_per_frame(n_fft: int) -> float:
    return 2.5 * n_fft * math.log2(n_fft)


def _bounds_row(
    op: str,
    config: str,
    measured_s: float,
    bytes_moved: float,
    flops_exec: float,
    flops_min: float,
    flops_vpu: float = 0.0,
) -> RooflineRow:
    t_mem = bytes_moved / (HBM_GBS * 1e9)
    # the VPU stages serialize with the GEMMs inside each frame's chain
    t_exec = flops_exec / (MXU_F32_TFLOPS * 1e12) + flops_vpu / (VPU_TFLOPS * 1e12)
    t_min = flops_min / (MXU_F32_TFLOPS * 1e12)
    bound_exec = max(t_mem, t_exec)
    bound_min = max(t_mem, t_min)
    return RooflineRow(
        op=op,
        config=config,
        measured_ms=measured_s * 1e3,
        t_mem_us=t_mem * 1e6,
        t_comp_exec_us=t_exec * 1e6,
        t_comp_min_us=t_min * 1e6,
        exec_efficiency=bound_exec / measured_s,
        sol_efficiency=bound_min / measured_s,
    )


def run_roofline(configs=None, repeats: int = 2) -> list[RooflineRow]:
    """Measure + bound the fused mel and STFT kernels.

    ``configs``: list of ``(batch, seconds)``; defaults to the headline
    (64, 1) and an at-scale (256, 4) workload. Sub-ms measurements through
    the tunneled attachment are noise-prone — the at-scale row is the
    trustworthy one (see benchmarks/README.md on timing).
    """
    from mlx_audio_primitives_tpu import melspectrogram, stft

    if configs is None:
        configs = [(64, 1), (256, 4)]
    n_fft, hop, n_mels = 2048, 512, 128
    rng = np.random.default_rng(0)
    rows: list[RooflineRow] = []
    for batch, secs in configs:
        n = SR * secs
        y = jax.device_put(
            jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
        )
        F = 1 + n // hop  # center=True
        frames = batch * F
        cfg = f"batch={batch} {secs}s n_fft={n_fft}"
        # sub-100us workloads need a long chain for a clean slope — at k=4
        # tunnel-drift noise once produced exec-eff > 100% (impossible)
        k = 32 if batch * secs <= 64 else 4

        t = min(
            time_jax_amortized(
                lambda x: melspectrogram(x, sr=SR, n_mels=n_mels), y, k=k
            )
            for _ in range(repeats)
        )
        bytes_mel = 4 * (batch * n + batch * n_mels * F)
        # the mel kernel's GEMMs run 3-pass bf16-split by default
        # (_config.ANALYSIS_FAST_GEMM) vs HIGHEST's 6 passes: at the same nominal
        # bf16 MXU peak the executed-FLOP cost is halved
        from mlx_audio_primitives_tpu import _config as _lib_config

        mel_pass_scale = 0.5 if _lib_config.ANALYSIS_FAST_GEMM else 1.0
        rows.append(
            _bounds_row(
                "melspectrogram (fused)", cfg, t, bytes_mel,
                frames * mel_exec_flops_per_frame(n_fft, hop, n_mels)
                * mel_pass_scale,
                # an ideal implementation could use the same 3-pass GEMMs,
                # so the speed-of-light bound scales identically
                frames * mel_min_flops_per_frame(n_fft, n_mels)
                * mel_pass_scale,
                frames * radix_vpu_flops_per_frame(n_fft, hop),
            )
        )

        t = min(
            time_jax_amortized(
                lambda x: stft(x, n_fft=n_fft, hop_length=hop), y, k=k
            )
            for _ in range(repeats)
        )
        bytes_stft = 4 * (batch * n + batch * 2 * (n_fft // 2 + 1) * F)
        rows.append(
            _bounds_row(
                "stft (fused radix)", cfg, t, bytes_stft,
                frames * stft_exec_flops_per_frame(n_fft, hop),
                frames * stft_min_flops_per_frame(n_fft),
                frames * radix_vpu_flops_per_frame(n_fft, hop),
            )
        )

        from mlx_audio_primitives_tpu import istft

        S = jax.device_put(stft(y, n_fft=n_fft, hop_length=hop))
        t = min(
            time_jax_amortized(
                lambda s: istft(s, hop_length=hop, length=n), S, k=k
            )
            for _ in range(repeats)
        )
        # Measured composite: the public istft() first regroups the natural
        # spectrum into the kernel's layout (an HBM round-trip of the
        # (B, F, 2*G*128) group tensor — written by the gather, re-read by
        # the kernel) before the inverse radix GEMMs write the signal.
        # T_mem must include that traffic or exec-eff conflates gather
        # bytes with kernel quality. Round 5 measured this boundary pass
        # at ~20% of HBM roofline in EVERY orientation (row gather ==
        # minor-axis gather == 4.5 ms at b256x4s) and adopted the exact
        # Karatsuba inverse base (kernel 7.4 -> 6.5 ms); the intake
        # reformulations are measured-rejected in
        # benchmarks/kernel_ab_r05.json / docs/KERNELS.md.
        C = n_fft // hop
        G = (C // 2 + 1) * (hop // LANE)
        bytes_istft = 4 * (
            batch * 2 * (n_fft // 2 + 1) * F  # spectrum read (complex64/2)
            + 2 * batch * 2 * G * LANE * F    # group tensor write + re-read
            + batch * n                        # signal out
        )
        rows.append(
            _bounds_row(
                "istft (incl. regroup)", cfg, t, bytes_istft,
                frames * stft_exec_flops_per_frame(n_fft, hop),
                frames * stft_min_flops_per_frame(n_fft),
                frames * radix_vpu_flops_per_frame(n_fft, hop),
            )
        )
    return rows


def format_roofline(rows: list[RooflineRow]) -> str:
    out = [
        "Roofline (v5e nominal: HBM 819 GB/s, MXU f32-HIGHEST "
        f"{MXU_F32_TFLOPS:.1f} TFLOP/s)",
        f"{'op':26s} {'config':26s} {'meas ms':>9s} {'T_mem us':>9s} "
        f"{'T_exec us':>10s} {'T_min us':>9s} {'exec-eff':>9s} {'SoL-eff':>8s}",
    ]
    for r in rows:
        out.append(
            f"{r.op:26s} {r.config:26s} {r.measured_ms:9.3f} "
            f"{r.t_mem_us:9.1f} {r.t_comp_exec_us:10.1f} {r.t_comp_min_us:9.1f} "
            f"{r.exec_efficiency:8.1%} {r.sol_efficiency:7.1%}"
        )
    return "\n".join(out)


if __name__ == "__main__":
    print(format_roofline(run_roofline()))
