"""Cache, profiler, memory-profiler, and validation subsystem tests
(analogs of the reference's cache benches + profiler module coverage)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mlx_audio_primitives_tpu import get_window, mel_filterbank, melspectrogram
from mlx_audio_primitives_tpu.utils import (
    cache_stats,
    clear_all_caches,
    clear_profiling,
    disable_profiling,
    enable_profiling,
    estimate_operation_memory,
    generate_text_report,
    get_profiling_data,
    profile,
    profile_memory,
    profile_section,
    validate_positive,
    validate_range,
)
from mlx_audio_primitives_tpu.utils.cache import table_cache


class TestTableCache:
    def test_hit_miss_accounting(self):
        clear_all_caches()
        get_window("hann", 777)
        get_window("hann", 777)
        stats = cache_stats()["window"]
        assert stats["misses"] >= 1
        assert stats["hits"] >= 1

    def test_clear_all(self):
        get_window("hamming", 333)
        clear_all_caches()
        assert cache_stats()["window"]["entries"] == 0

    def test_lru_eviction(self):
        @table_cache("test_evict", maxsize=2)
        def builder(n):
            return np.zeros(n)

        a = builder(1)
        builder(2)
        builder(3)  # evicts key 1 (least recently used)
        assert builder.stats["entries"] == 2
        b = builder(1)  # rebuild
        assert b is not a

    def test_lru_hit_refreshes_recency(self):
        """A sequence where LRU and FIFO differ: 1,2,hit(1),3 must evict 2,
        keeping the constantly-hit entry resident."""
        @table_cache("test_lru_refresh", maxsize=2)
        def builder(n):
            return np.zeros(n)

        a1 = builder(1)
        builder(2)
        assert builder(1) is a1          # hit refreshes recency
        builder(3)                       # must evict 2, not 1
        assert builder(1) is a1          # still resident (no rebuild)
        assert builder.stats["entries"] == 2

    def test_first_touch_inside_shard_map_does_not_poison(self):
        """Regression: ensure_compile_time_eval cannot escape a shard_map
        trace, so a table first requested inside one came back as a
        ShardMapTracer — and used to be CACHED, poisoning every later trace
        with a leaked tracer. The tracer must be returned uncached."""
        import jax
        from jax.sharding import PartitionSpec as P

        from mlx_audio_primitives_tpu.parallel.mesh import make_mesh

        @table_cache("test_shardmap_touch", maxsize=4)
        def builder(n):
            return np.arange(n, dtype=np.float64)

        mesh = make_mesh(n_data=2, n_time=4)

        def body(x):
            return x + builder(5)[0]

        x = np.zeros((2, 4), np.float32)
        jax.shard_map(body, mesh=mesh, in_specs=P("data", "time"),
                      out_specs=P("data", "time"))(x)
        assert builder.stats["entries"] == 0  # tracer was NOT cached
        out = builder(5)  # concrete call populates the cache
        assert not isinstance(out, jax.core.Tracer)
        assert builder.stats["entries"] == 1

    def test_host_tier(self):
        fb = mel_filterbank(22050, 1024, n_mels=32)
        from mlx_audio_primitives_tpu.ops.mel import _mel_filterbank_table

        host = _mel_filterbank_table.host(22050, 1024, 32, 0.0, 11025.0, False, "slaney")
        assert host.dtype == np.float64
        np.testing.assert_allclose(np.asarray(fb), host.astype(np.float32))


class TestDispatch:
    def test_kill_switch_disables_pallas(self):
        # MLX_AUDIO_TPU_DISABLE_PALLAS acts at import time — check in a
        # subprocess so the library imports fresh with the env set
        import subprocess
        import sys

        code = (
            "import mlx_audio_primitives_tpu.utils.dispatch as d;"
            "assert not d.HAS_PALLAS;"
            "assert not d.has_pallas_tpu();"
            "assert not d.resolve_use_pallas(True);"
            "print('ok')"
        )
        import os

        env = dict(os.environ, MLX_AUDIO_TPU_DISABLE_PALLAS="1",
                   JAX_PLATFORMS="cpu")
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True, timeout=120)
        # without the switch, HAS_PALLAS must be true in this environment
        from mlx_audio_primitives_tpu.utils import dispatch

        assert dispatch.HAS_PALLAS
        proc = subprocess.run([sys.executable, "-c", code], env=env,
                              capture_output=True, text=True, timeout=120)
        assert proc.returncode == 0, proc.stderr[-500:]
        assert "ok" in proc.stdout

    def test_import_does_not_initialize_backend(self):
        # regression: the HAS_PALLAS_TPU module constant used to call
        # jax.default_backend() at import, breaking distributed init
        import subprocess
        import sys

        code = (
            "import mlx_audio_primitives_tpu;"
            "from jax._src import xla_bridge;"
            "assert not xla_bridge.backends_are_initialized();"
            "print('ok')"
        )
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True, timeout=120)
        assert proc.returncode == 0, proc.stderr[-500:]
        assert "ok" in proc.stdout


class TestWarmup:
    def test_warmup_compiles_requested_ops(self):
        from mlx_audio_primitives_tpu.utils import warmup

        times = warmup(signal_lengths=(4096,), batch_sizes=(1, 2),
                       n_fft=512, hop_length=128, n_mels=16)
        # 4 ops x 2 batch sizes x 1 length
        assert len(times) == 8
        assert all(t >= 0 for t in times.values())
        assert "stft b=2 len=4096" in times

    def test_warmup_rejects_unknown_op(self):
        from mlx_audio_primitives_tpu.utils import warmup

        with pytest.raises(ValueError, match="unknown warmup ops"):
            warmup(ops=("stft", "bogus"))

    def test_persistent_cache_config(self, tmp_path):
        import jax

        from mlx_audio_primitives_tpu.utils import (
            enable_persistent_compilation_cache,
        )

        prev_dir = jax.config.jax_compilation_cache_dir
        prev_size = jax.config.jax_persistent_cache_min_entry_size_bytes
        prev_time = jax.config.jax_persistent_cache_min_compile_time_secs
        try:
            enable_persistent_compilation_cache(str(tmp_path))
            assert jax.config.jax_compilation_cache_dir == str(tmp_path)
            # sub-second DSP executables must not be skipped by jax's
            # min-compile-time storage gate
            assert jax.config.jax_persistent_cache_min_compile_time_secs == 0.0
        finally:
            jax.config.update("jax_compilation_cache_dir", prev_dir)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                              prev_size)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              prev_time)


class TestProfiler:
    def setup_method(self):
        clear_profiling()
        enable_profiling()

    def teardown_method(self):
        disable_profiling()

    def test_profile_section(self, random_signal):
        with profile_section("mel"):
            melspectrogram(random_signal, n_mels=32)
        data = get_profiling_data()
        assert len(data["timings"]["mel"]) == 1

    def test_profile_decorator(self):
        @profile(name="op")
        def op():
            return jnp.ones(10) * 2

        op()
        op()
        assert len(get_profiling_data()["timings"]["op"]) == 2

    def test_cache_accesses_logged(self):
        clear_all_caches()
        get_window("hann", 555)
        get_window("hann", 555)
        acc = get_profiling_data()["cache_accesses"]["window"]
        assert acc["misses"] >= 1 and acc["hits"] >= 1

    def test_text_report(self, random_signal):
        with profile_section("stft"):
            melspectrogram(random_signal, n_mels=32)
        report = generate_text_report()
        assert "stft" in report and "cache hit rates" in report

    def test_zero_overhead_when_disabled(self):
        disable_profiling()
        with profile_section("x"):
            pass
        assert get_profiling_data()["timings"] == {}


class TestMemoryProfiler:
    def test_profile_memory_returns_result(self, random_signal):
        out, prof = profile_memory(
            lambda: melspectrogram(random_signal, n_mels=32)
        )
        assert out.shape[0] == 32
        assert prof.output_bytes == out.nbytes

    def test_analytical_estimates(self):
        est = estimate_operation_memory("mfcc", 22050, batch=64)
        assert est["frames_mb"] > est["input_mb"]
        assert est["total_mb"] > 0
        assert "mfcc_mb" in est

    def test_istft_estimate(self):
        est = estimate_operation_memory("istft", 22050)
        assert "output_mb" in est


class TestValidation:
    def test_validate_positive(self):
        validate_positive(1, "x")
        with pytest.raises(ValueError, match="x must be positive"):
            validate_positive(0, "x")

    def test_validate_range(self):
        validate_range(0.5, "q", low=0.0, high=1.0)
        with pytest.raises(ValueError):
            validate_range(1.5, "q", low=0.0, high=1.0)
        with pytest.raises(ValueError):
            validate_range(0.0, "q", low=0.0, inclusive=False)


class TestTrackedTransfers:
    def test_tracked_converters_log(self):
        import numpy as np

        from mlx_audio_primitives_tpu.utils import (
            clear_profiling,
            disable_profiling,
            enable_profiling,
            get_profiling_data,
            tracked_to_device,
            tracked_to_host,
        )

        clear_profiling()
        enable_profiling()
        try:
            x = tracked_to_device(np.ones(1000, np.float32), context="w")
            back = tracked_to_host(x, context="r")
            assert back.shape == (1000,)
            transfers = get_profiling_data()["transfers"]
            dirs = {t["direction"] for t in transfers}
            assert dirs == {"h2d", "d2h"}
            assert all(t["bytes"] == 4000 for t in transfers)
        finally:
            disable_profiling()

    def test_no_logging_when_disabled(self):
        import numpy as np

        from mlx_audio_primitives_tpu.utils import (
            clear_profiling,
            get_profiling_data,
            tracked_to_device,
        )

        clear_profiling()
        tracked_to_device(np.ones(10, np.float32))
        assert get_profiling_data()["transfers"] == []
