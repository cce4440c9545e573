"""`tpu-audio-bench` CLI.

Analog of reference `benchmarks/run.py:197-453`: suite selection, scaling
sweeps, cache analysis, memory profiling, baseline save/compare with a 10%
regression gate, and table/json/markdown/csv output.
"""

from __future__ import annotations

import argparse
import json
import sys

from .baseline import (
    REGRESSION_THRESHOLD,
    compare_to_baseline,
    has_regressions,
    save_baseline,
)
from .platform import format_platform_header, platform_info, platform_key
from .schemas import BenchmarkMetric, BenchmarkResult, BenchmarkRun


def _fmt_table(results: list[BenchmarkResult]) -> str:
    rows = []
    header = f"{'benchmark':44s} {'ours':>10s} {'baseline':>10s} {'speedup':>8s} {'max err':>10s}"
    rows.append(header)
    rows.append("-" * len(header))
    for r in results:
        base = f"{r.baseline_time_ms:.3f}ms" if r.baseline_time_ms else "-"
        sp = f"{r.speedup:.2f}x" if r.speedup else "-"
        err = f"{r.accuracy.max_error:.2e}" if r.accuracy else "-"
        rows.append(f"{r.name:44s} {r.time_ms:9.3f}ms {base:>10s} {sp:>8s} {err:>10s}")
    return "\n".join(rows)


def _fmt_markdown(results: list[BenchmarkResult]) -> str:
    rows = ["| benchmark | ours (ms) | baseline (ms) | speedup | max err |",
            "|---|---|---|---|---|"]
    for r in results:
        base = f"{r.baseline_time_ms:.3f}" if r.baseline_time_ms else "-"
        sp = f"{r.speedup:.2f}x" if r.speedup else "-"
        err = f"{r.accuracy.max_error:.2e}" if r.accuracy else "-"
        rows.append(f"| {r.name} | {r.time_ms:.3f} | {base} | {sp} | {err} |")
    return "\n".join(rows)


def _fmt_csv(results: list[BenchmarkResult]) -> str:
    rows = ["name,time_ms,baseline_ms,speedup,max_error"]
    for r in results:
        rows.append(
            f"{r.name},{r.time_ms:.6f},"
            f"{r.baseline_time_ms if r.baseline_time_ms else ''},"
            f"{r.speedup if r.speedup else ''},"
            f"{r.accuracy.max_error if r.accuracy else ''}"
        )
    return "\n".join(rows)


def format_results(results: list[BenchmarkResult], fmt: str) -> str:
    if fmt == "json":
        return json.dumps([r.to_dict() for r in results], indent=2)
    if fmt == "markdown":
        return _fmt_markdown(results)
    if fmt == "csv":
        return _fmt_csv(results)
    return _fmt_table(results)


def run_all(suite_names: list[str]) -> list[BenchmarkResult]:
    from .suites import ALL_SUITES

    results: list[BenchmarkResult] = []
    consecutive_runtime_failures = 0
    for name in suite_names:
        fn = ALL_SUITES.get(name)
        if fn is None:
            print(f"unknown suite: {name}; available: {sorted(ALL_SUITES)}",
                  file=sys.stderr)
            continue
        try:
            results.extend(fn())
            consecutive_runtime_failures = 0
        except Exception as e:  # degrade gracefully (reference run.py:444-447)
            print(f"suite {name} failed: {type(e).__name__}: {e}", file=sys.stderr)
            # a dead device session (remote attachments drop) fails every
            # subsequent suite identically — stop wasting the run. Only
            # runtime errors count, and only CONSECUTIVE ones (any other
            # failure kind proves the session still executes work).
            if "RuntimeError" in type(e).__name__:
                consecutive_runtime_failures += 1
                if consecutive_runtime_failures >= 2:
                    print(
                        "two consecutive backend runtime failures — device "
                        "session looks dead; aborting remaining suites",
                        file=sys.stderr,
                    )
                    break
            else:
                consecutive_runtime_failures = 0
    return results


def run_memory() -> list[BenchmarkResult]:
    import numpy as np

    import jax.numpy as jnp

    from mlx_audio_primitives_tpu import melspectrogram
    from mlx_audio_primitives_tpu.utils.memory_profiler import (
        estimate_operation_memory,
        profile_memory,
    )

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((64, 22050)).astype(np.float32))
    _, prof = profile_memory(lambda: melspectrogram(y, n_mels=128))
    est = estimate_operation_memory("mel", 22050, batch=64)
    return [
        BenchmarkResult(
            name="melspectrogram batch=64 memory",
            time_ms=0.0,
            extra={
                "peak_mb": prof.peak_mb,
                "delta_mb": prof.delta_mb,
                "efficiency": prof.efficiency,
                "analytical_estimate_mb": est,
            },
        )
    ]


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="tpu-audio-bench")
    p.add_argument("--suite", nargs="*", default=None,
                   help="suites to run (default: all)")
    p.add_argument("--scaling", action="store_true")
    p.add_argument("--cache-analysis", action="store_true")
    p.add_argument("--memory", action="store_true")
    p.add_argument("--roofline", action="store_true",
                   help="speed-of-light analysis of the fused kernels")
    p.add_argument("--save-baseline", action="store_true")
    p.add_argument("--compare-baseline", action="store_true")
    p.add_argument("--fail-on-regression", action="store_true")
    p.add_argument("--threshold", type=float, default=REGRESSION_THRESHOLD)
    p.add_argument("--output", choices=["table", "json", "markdown", "csv"],
                   default="table")
    args = p.parse_args(argv)

    print(format_platform_header(), file=sys.stderr)

    from .suites import SUITE_ORDER

    results: list[BenchmarkResult] = []
    if args.suite is not None:
        # bare `--suite` (no names) means "all", like omitting the flag —
        # an empty selection would otherwise silently run nothing
        results.extend(run_all(args.suite or SUITE_ORDER))
    elif not (args.scaling or args.cache_analysis or args.memory
              or args.roofline):
        results.extend(run_all(SUITE_ORDER))
    # each optional section degrades independently (like run_all): a flaky
    # attachment failing one section must not discard the collected results
    def _section(flag, name, fn):
        if not flag:
            return
        try:
            results.extend(fn())
        except Exception as e:
            print(f"section {name} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    def _run_scaling():
        from .scaling import run_scaling

        return run_scaling()

    def _run_cache():
        from .cache_analysis import run_cache_analysis

        return run_cache_analysis()

    def _run_roofline():
        from .roofline import format_roofline, run_roofline

        rows = run_roofline()
        print(format_roofline(rows), file=sys.stderr)
        return [
            BenchmarkResult(
                name=f"roofline {r.op} {r.config}",
                time_ms=r.measured_ms,
                extra=r.as_dict(),
            )
            for r in rows
        ]

    _section(args.scaling, "scaling", _run_scaling)
    _section(args.roofline, "roofline", _run_roofline)
    _section(args.cache_analysis, "cache-analysis", _run_cache)
    _section(args.memory, "memory", run_memory)

    print(format_results(results, args.output))

    exit_code = 0
    if args.save_baseline or args.compare_baseline:
        metrics = [
            BenchmarkMetric(name=r.name, value=r.time_ms, unit="ms")
            for r in results
            if r.time_ms > 0
        ]
        run = BenchmarkRun.create(platform_key(), metrics, platform_info())
        if args.compare_baseline:
            comps = compare_to_baseline(run, threshold=args.threshold)
            if not comps:
                print("no baseline for this platform", file=sys.stderr)
            for c in comps:
                flag = "REGRESSION" if c.regressed else "ok"
                print(
                    f"{c.metric}: {c.baseline:.3f} -> {c.current:.3f} ms "
                    f"({c.ratio:.2f}x) [{flag}]",
                    file=sys.stderr,
                )
            if args.fail_on_regression and has_regressions(comps):
                exit_code = 1
        if args.save_baseline:
            save_baseline(run)
            print(f"baseline saved for {run.platform_key}", file=sys.stderr)
    return exit_code


if __name__ == "__main__":
    raise SystemExit(main())
