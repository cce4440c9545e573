"""Benchmark harness tests: schemas, baseline store, regression gate, CLI
formatting (analog of the reference's benchmark plumbing, SURVEY.md §3.5)."""

import json

import numpy as np
import pytest

from benchmarks.baseline import (
    compare_to_baseline,
    has_regressions,
    load_baselines,
    save_baseline,
)
from benchmarks.platform import expected_speedup, platform_info, platform_key
from benchmarks.run import format_results, main
from benchmarks.schemas import (
    AccuracyStats,
    BenchmarkMetric,
    BenchmarkResult,
    BenchmarkRun,
)
from benchmarks.utils import compute_accuracy, time_function


class TestSchemas:
    def test_speedup(self):
        r = BenchmarkResult(name="x", time_ms=2.0, baseline_time_ms=10.0)
        assert r.speedup == 5.0

    def test_run_roundtrip(self):
        run = BenchmarkRun.create(
            "cpu-test-1", [BenchmarkMetric("m", 1.5)], {"backend": "cpu"}
        )
        back = BenchmarkRun.from_dict(run.to_dict())
        assert back.platform_key == "cpu-test-1"
        assert back.metrics[0].value == 1.5


class TestBaselineStore:
    def test_save_load_compare(self, tmp_path):
        path = tmp_path / "baselines.json"
        base = BenchmarkRun.create(
            "cpu-x-1", [BenchmarkMetric("op", 10.0)], {}
        )
        save_baseline(base, path)
        assert "cpu-x-1" in load_baselines(path)

        cur_ok = BenchmarkRun.create("cpu-x-1", [BenchmarkMetric("op", 10.5)], {})
        comps = compare_to_baseline(cur_ok, path)
        assert len(comps) == 1 and not comps[0].regressed

        cur_bad = BenchmarkRun.create("cpu-x-1", [BenchmarkMetric("op", 12.0)], {})
        comps = compare_to_baseline(cur_bad, path)
        assert has_regressions(comps)

    def test_unknown_platform_empty(self, tmp_path):
        cur = BenchmarkRun.create("cpu-y-1", [BenchmarkMetric("op", 1.0)], {})
        assert compare_to_baseline(cur, tmp_path / "none.json") == []

    def test_threshold(self, tmp_path):
        path = tmp_path / "b.json"
        save_baseline(
            BenchmarkRun.create("k", [BenchmarkMetric("op", 10.0)], {}), path
        )
        cur = BenchmarkRun.create("k", [BenchmarkMetric("op", 11.5)], {})
        assert has_regressions(compare_to_baseline(cur, path, threshold=0.10))
        assert not has_regressions(compare_to_baseline(cur, path, threshold=0.20))


class TestPlatform:
    def test_info_fields(self):
        i = platform_info()
        assert "backend" in i and "num_devices" in i and "jax_version" in i

    def test_key_stable(self):
        assert platform_key() == platform_key()

    def test_expected_speedup(self):
        # table normalized to the measured generation (v5e = 1.0); longest
        # prefix wins so 'TPU v5p' is not shadowed by 'TPU v5'
        assert expected_speedup("TPU v5 lite0") == 1.0
        assert expected_speedup("TPU v5p something") == 2.3
        assert expected_speedup("unknown chip") == 1.0


class TestFormatting:
    @pytest.fixture
    def results(self):
        return [
            BenchmarkResult(
                name="op-a", time_ms=1.0, baseline_name="ref",
                baseline_time_ms=5.0,
                accuracy=AccuracyStats(1e-5, 1e-6, 0.999),
            ),
            BenchmarkResult(name="op-b", time_ms=2.0),
        ]

    def test_table(self, results):
        out = format_results(results, "table")
        assert "op-a" in out and "5.00x" in out

    def test_json(self, results):
        parsed = json.loads(format_results(results, "json"))
        assert parsed[0]["speedup"] == 5.0

    def test_markdown(self, results):
        out = format_results(results, "markdown")
        assert out.startswith("| benchmark")

    def test_csv(self, results):
        out = format_results(results, "csv")
        assert out.splitlines()[0].startswith("name,")


class TestUtils:
    def test_time_function(self):
        t = time_function(lambda: sum(range(100)), warmup=1, runs=3)
        assert t >= 0

    def test_compute_accuracy(self):
        a = np.array([1.0, 2.0, 3.0])
        b = np.array([1.0, 2.0, 3.1])
        acc = compute_accuracy(a, b)
        assert abs(acc.max_error - 0.1) < 1e-9
        assert acc.correlation > 0.99


class TestCLI:
    def test_windows_suite_runs(self, capsys):
        code = main(["--suite", "windows", "--output", "json"])
        assert code == 0
        out = capsys.readouterr().out
        parsed = json.loads(out)
        assert any("get_window" in r["name"] for r in parsed)

    def test_unknown_suite_is_graceful(self, capsys):
        code = main(["--suite", "nonexistent"])
        assert code == 0


class TestAmortizedTimer:
    def test_positive_time_for_real_work(self):
        import jax.numpy as jnp

        from benchmarks.utils import time_jax_amortized

        x = jnp.ones((256, 256), jnp.float32)
        t = time_jax_amortized(lambda a: jnp.tanh(a @ a), x, k=10, runs=3)
        assert t > 0 and np.isfinite(t)

    def test_handles_complex_outputs(self):
        import jax.numpy as jnp

        from benchmarks.utils import time_jax_amortized

        x = jnp.ones((8, 256), jnp.float32)
        t = time_jax_amortized(lambda a: jnp.fft.rfft(a, axis=-1), x, k=5, runs=2)
        assert np.isfinite(t) and t > 0


class TestDeepSuites:
    def test_every_registered_cache_has_a_canonical_case(self):
        # the per-table suite must never silently skip a cache: force-import
        # all lazily-registered caches (same imports the suite itself makes)
        import mlx_audio_primitives_tpu.kernels.bluestein  # noqa: F401
        import mlx_audio_primitives_tpu.kernels.dft  # noqa: F401
        import mlx_audio_primitives_tpu.kernels.istft_fused  # noqa: F401
        import mlx_audio_primitives_tpu.kernels.mel_fused  # noqa: F401
        import mlx_audio_primitives_tpu.ops.resample  # noqa: F401
        from mlx_audio_primitives_tpu.utils.cache import _CACHE_REGISTRY

        from benchmarks.cache_analysis import _TABLE_CASES

        registered = {
            c.name for c in _CACHE_REGISTRY
            if not c.name.startswith("test_")  # ad-hoc unit-test caches
        }
        missing = registered - set(_TABLE_CASES)
        assert not missing, f"caches with no canonical bench case: {missing}"

    def test_table_cases_args_are_valid(self):
        # every canonical arg tuple must actually build its table
        import jax

        from benchmarks.cache_analysis import _TABLE_CASES, per_table_cold_warm

        results = per_table_cold_warm()
        assert len(results) >= len(_TABLE_CASES)
        assert all(r.time_ms >= 0 for r in results), [
            r.name for r in results if r.time_ms < 0
        ]
        jax.block_until_ready  # silence unused-import linting

    def test_fallback_suite_registered(self):
        from benchmarks.suites import ALL_SUITES

        assert "fallback" in ALL_SUITES

    def test_scaling_grid_shape(self):
        from benchmarks.scaling import GRID_BATCHES, GRID_LENGTHS

        # reference grid envelope: lengths 8000..176400 x batches 1..32
        assert min(GRID_LENGTHS) <= 8000 and max(GRID_LENGTHS) >= 176400
        assert min(GRID_BATCHES) == 1 and max(GRID_BATCHES) >= 32
