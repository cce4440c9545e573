#!/usr/bin/env python
"""Round-4 kernel A/B experiments on the real TPU (VERDICT r3 items 2+3).

Measures, at the headline (batch-64 x 1 s) and noise-robust scale
(batch-256 x 4 s) configs, n_fft=2048 hop=512:

  A. group->natural regroup formulations:
     1. current: grouped kernel + minor-axis gather + transpose
     2. transposed-emit kernel + coalesced row-gather naturalize
     (+ each kernel alone, isolating epilogue cost)
  B. base-GEMM pass count: 4-GEMM complex base vs 3-GEMM Karatsuba
     (mel kernel fast/exact, stft kernel)
  C. the third-decimation-stage question: a (F,128)@(128,128) GEMM with a
     50%-zero block-diagonal matrix vs dense — the MXU does a full
     128-wide pass either way, so basis sparsity (the only thing a
     factored base buys) cannot reduce GEMM time.

Usage: python scripts/kernel_ab.py [--quick]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mlx_audio_primitives_tpu.utils.warmup import (
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache(
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_compile_cache"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.utils import time_jax_amortized  # noqa: E402
from mlx_audio_primitives_tpu.kernels.mel_fused import (  # noqa: E402
    _basis_table,
    _mel_radix_core,
    _twiddle_table,
)
from mlx_audio_primitives_tpu.kernels.stft_radix import (  # noqa: E402
    _stft_radix_core,
    _stft_radix_core_t,
    naturalize_spectrum,
    naturalize_spectrum_t,
)
from mlx_audio_primitives_tpu.ops.mel import mel_filterbank  # noqa: E402
from mlx_audio_primitives_tpu.ops.windows import get_window  # noqa: E402

SR = 22050
N_FFT, HOP = 2048, 512


def t(fn, x, k=12, runs=5, name=""):
    import time as _time

    t0 = _time.time()
    ms = time_jax_amortized(fn, x, k=k, runs=runs) * 1e3  # ms
    print(f"  {name}: {ms:.4f} ms (wall {_time.time() - t0:.0f}s)",
          flush=True)
    return ms


def main():
    quick = "--quick" in sys.argv
    results = {}
    w = get_window("hann", N_FFT)
    T = _twiddle_table(N_FFT, HOP)
    Bt = _basis_table(HOP)
    fb_t = jnp.swapaxes(mel_filterbank(SR, N_FFT, 128), 0, 1)
    kw = dict(n_fft=N_FFT, hop_length=HOP, center=True, pad_mode="constant")

    configs = [("headline_b64x1s", 64, SR)]
    if not quick:
        configs.append(("scale_b256x4s", 256, 4 * SR))

    for name, B, L in configs:
        rng = np.random.default_rng(0)
        y = jax.device_put(
            jnp.asarray(rng.standard_normal((B, L)).astype(np.float32)))
        r = {}

        # --- A: regroup formulations
        r["stft_grouped_kernel_only"] = t(
            lambda x: _stft_radix_core(x, w, T, Bt, **kw), y)
        r["stft_current_natural"] = t(
            lambda x: naturalize_spectrum(
                _stft_radix_core(x, w, T, Bt, **kw), N_FFT, HOP), y)
        r["stft_t_kernel_only"] = t(
            lambda x: _stft_radix_core_t(x, w, T, Bt, **kw), y)
        r["stft_t_natural"] = t(
            lambda x: naturalize_spectrum_t(
                _stft_radix_core_t(x, w, T, Bt, **kw), N_FFT, HOP), y)

        # --- B: base-GEMM pass count (Karatsuba)
        r["stft_grouped_kara"] = t(
            lambda x: _stft_radix_core(x, w, T, Bt, kara=True, **kw), y)
        r["stft_t_kara_natural"] = t(
            lambda x: naturalize_spectrum_t(
                _stft_radix_core_t(x, w, T, Bt, kara=True, **kw),
                N_FFT, HOP), y)
        for fast in (True, False):
            tag = "fast" if fast else "exact"
            r[f"mel_{tag}_4gemm"] = t(
                lambda x: _mel_radix_core(x, w, fb_t, T, Bt,
                                          fast_gemm=fast, **kw), y)
            r[f"mel_{tag}_kara"] = t(
                lambda x: _mel_radix_core(x, w, fb_t, T, Bt,
                                          fast_gemm=fast, kara=True, **kw), y)

        results[name] = {k: round(v, 4) for k, v in r.items()}
        print(name, json.dumps(results[name], indent=1))

    # --- C: dense vs 50%-zero block-diagonal basis INSIDE the kernel —
    # the honest probe for the third-decimation question: the MXU pays a
    # full 128-wide pass regardless of basis sparsity (an XLA-level
    # microbench is not valid here: XLA pattern-matches constant zero
    # blocks, Mosaic operand GEMMs cannot)
    rng = np.random.default_rng(1)
    y = jax.device_put(jnp.asarray(
        rng.standard_normal((64, 2 * SR)).astype(np.float32)))
    Bt_np = np.asarray(_basis_table.host(HOP)).astype(np.float32)
    Bt_bd = Bt_np.copy()
    Bt_bd[:, :, :64, 64:] = 0.0
    Bt_bd[:, :, 64:, :64] = 0.0
    results["blockdiag_basis_in_kernel"] = {
        "dense_ms": round(t(
            lambda x: _mel_radix_core(x, w, fb_t, T, jnp.asarray(Bt_np),
                                      fast_gemm=False, **kw), y,
            name="dense basis"), 4),
        "blockdiag50_ms": round(t(
            lambda x: _mel_radix_core(x, w, fb_t, T, jnp.asarray(Bt_bd),
                                      fast_gemm=False, **kw), y,
            name="blockdiag basis (timing probe, wrong results)"), 4),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "kernel_ab_latest.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
