#!/usr/bin/env python
"""Round-5 ISTFT intake A/B harness (VERDICT r4 items 2+3) on the real TPU.

Reproduces `benchmarks/kernel_ab_r05.json`: at four configs
(n_fft=2048, hop=512), measures

  1. the public istft (swapaxes + minor-axis gather + grouped kernel,
     exact-Karatsuba base since round 5),
  2. the transposed-intake kernel + coalesced row gather,
  3. the natural-intake kernel (no gather anywhere), kara + 4-GEMM exact,

plus the cost decomposition (kernels alone, gathers alone, plane-split
prologue) that shows the regroup tax is the complex64 boundary itself.

Usage: python scripts/kernel_ab_r05.py [--quick]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mlx_audio_primitives_tpu.utils.warmup import (
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache(
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_compile_cache"))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.utils import time_jax_amortized  # noqa: E402
from mlx_audio_primitives_tpu.kernels.istft_fused import (  # noqa: E402
    istft_pallas,
    istft_pallas_grouped,
    istft_pallas_nat,
    istft_pallas_t,
)
from mlx_audio_primitives_tpu.kernels.stft_radix import (  # noqa: E402
    group_spectrum,
    group_spectrum_nat_t,
)
from mlx_audio_primitives_tpu.ops.stft import (  # noqa: E402
    WINDOW_SUM_EPSILON,
    _get_padded_window,
    istft,
    stft,
    window_envelope,
)

SR = 22050
N_FFT, HOP = 2048, 512


def main() -> None:
    quick = "--quick" in sys.argv
    win = _get_padded_window("hann", N_FFT, N_FFT)
    configs = [("b64x1s", 64, 1, 16), ("b64x2s", 64, 2, 12),
               ("b64x4s", 64, 4, 8), ("b256x4s", 256, 4, 4)]
    if quick:
        configs = [configs[0], configs[-1]]
    out: dict = {"istft_intake_formulations": {}, "decomposition": {}}

    for name, B, secs, k in configs:
        L = SR * secs
        rng = np.random.default_rng(0)
        y = jax.device_put(jnp.asarray(
            rng.standard_normal((B, L)).astype(np.float32)))
        S = jax.device_put(stft(y, n_fft=N_FFT, hop_length=HOP))
        F = S.shape[2]
        padded = N_FFT + (F - 1) * HOP
        env = jnp.maximum(window_envelope(win, F, HOP, padded),
                          WINDOW_SUM_EPSILON)

        def t(fn, x):
            ms = time_jax_amortized(fn, x, k=k, runs=5) * 1e3
            return round(ms, 3)

        kw = dict(n_fft=N_FFT, hop_length=HOP, padded_length=padded)
        row = {
            "public_kara_grouped": t(
                lambda s: istft(s, hop_length=HOP, length=L), S),
            "t_intake": t(
                lambda s: istft_pallas_t(s, win, env, **kw), S),
            "nat_kara": t(
                lambda s: istft_pallas_nat(s, win, env, **kw), S),
            "nat_exact_8dot": t(
                lambda s: istft_pallas_nat(s, win, env, kara=False, **kw), S),
        }
        out["istft_intake_formulations"][f"{name}_F{F}"] = row
        print(name, row, flush=True)

        if name == "b256x4s" or (quick and name == configs[-1][0]):
            Sfm = jax.device_put(jnp.swapaxes(S, 1, 2))
            xg = jax.device_put(group_spectrum(Sfm, N_FFT, HOP))
            dec = {
                "grouped_kernel_exact": t(
                    lambda x: istft_pallas_grouped(x, win, env, **kw), xg),
                "grouped_kernel_kara": t(
                    lambda x: istft_pallas_grouped(x, win, env, kara=True,
                                                   **kw), xg),
                "gather_minor_axis": t(
                    lambda s: group_spectrum(jnp.swapaxes(s, 1, 2), N_FFT,
                                             HOP), S),
                "gather_row": t(
                    lambda s: group_spectrum_nat_t(s, N_FFT, HOP), S),
            }
            out["decomposition"][name] = dec
            print("decomposition", dec, flush=True)

        # round-trip sanity on every config
        a = istft_pallas_nat(S, win, env, **kw)
        pad = N_FFT // 2
        err = float(jnp.abs(a[:, pad:pad + L] - y).max())
        assert err <= 1e-5, (name, err)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
