"""Platform detection: TPU topology/generation in place of the reference's
Apple-chip sysctl sniffing (`benchmarks/platform.py:39-166`)."""

from __future__ import annotations

from typing import Any

import jax


def platform_info() -> dict[str, Any]:
    devs = jax.devices()
    info: dict[str, Any] = {
        "backend": jax.default_backend(),
        "num_devices": len(devs),
        "device_kind": devs[0].device_kind if devs else "unknown",
        "jax_version": jax.__version__,
        "python_version": __import__("sys").version.split()[0],
    }
    try:
        import jaxlib

        info["jaxlib_version"] = jaxlib.__version__
    except Exception:
        pass
    try:
        stats = devs[0].memory_stats() or {}
        if "bytes_limit" in stats:
            info["hbm_gb"] = round(stats["bytes_limit"] / 1e9, 1)
    except Exception:
        pass
    return info


def platform_key() -> str:
    """Stable key for the baseline store (e.g. 'tpu-TPU v5 lite-1')."""
    i = platform_info()
    kind = str(i["device_kind"]).replace(" ", "_")
    return f"{i['backend']}-{kind}-{i['num_devices']}"


# Per-generation expected speedup for the headline mel bench, NORMALIZED TO
# TPU v5e = 1.0 — the one generation this table has actually been measured
# on (the reference's analog, `platform.py:151-166` there, cites measured
# Apple chips; we follow that discipline). Unmeasured generations carry an
# `estimated_` prefix in provenance and are derived from published peak
# bf16-MXU TFLOPs ratios (v5e 197 -> v4 275 -> v5p 459 -> v6e 918), which
# upper-bound a MXU-bound kernel and over-predict the memory-bound tails;
# treat them as ceilings, not forecasts.
EXPECTED_SPEEDUP = {
    "TPU v5 lite": 1.0,   # measured: every BENCH_r*.json in this repo
    "TPU v4": 1.4,        # estimated (peak-FLOPs ratio)
    "TPU v5": 2.3,        # estimated (v5p peak ratio)
    "TPU v5p": 2.3,       # estimated
    "TPU v6 lite": 4.7,   # estimated
    "TPU v6e": 4.7,       # estimated
}


def expected_speedup(device_kind: str) -> float:
    # longest prefix wins: 'TPU v5p' must not be shadowed by 'TPU v5'
    for k in sorted(EXPECTED_SPEEDUP, key=len, reverse=True):
        if device_kind.startswith(k):
            return EXPECTED_SPEEDUP[k]
    return 1.0


def format_platform_header() -> str:
    i = platform_info()
    return (
        f"platform: {i['backend']} x{i['num_devices']} ({i['device_kind']}) | "
        f"jax {i['jax_version']}"
    )
