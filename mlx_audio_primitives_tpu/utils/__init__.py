"""Runtime utilities: validation, table caches, dispatch policy, profilers."""

from .cache import TableCache, cache_stats, clear_all_caches, table_cache
from .dispatch import (
    HAS_PALLAS,
    HAS_PALLAS_TPU,
    default_backend,
    is_tpu,
    pallas_interpret_mode,
    resolve_use_pallas,
)
from .profiler import (
    clear_profiling,
    disable_profiling,
    enable_profiling,
    export_json,
    generate_text_report,
    get_profiling_data,
    is_profiling,
    log_cache_access,
    log_sync_point,
    log_transfer,
    profile,
    profile_section,
)
from .memory_profiler import (
    MemoryProfile,
    estimate_operation_memory,
    get_active_memory,
    get_peak_memory,
    profile_memory,
    track_memory,
)
from .validation import validate_non_negative, validate_positive, validate_range

__all__ = [
    "TableCache",
    "table_cache",
    "clear_all_caches",
    "cache_stats",
    "HAS_PALLAS",
    "HAS_PALLAS_TPU",
    "default_backend",
    "is_tpu",
    "pallas_interpret_mode",
    "resolve_use_pallas",
    "validate_positive",
    "validate_non_negative",
    "validate_range",
    "enable_profiling",
    "disable_profiling",
    "clear_profiling",
    "is_profiling",
    "profile",
    "profile_section",
    "log_sync_point",
    "log_transfer",
    "log_cache_access",
    "get_profiling_data",
    "generate_text_report",
    "export_json",
    "MemoryProfile",
    "track_memory",
    "profile_memory",
    "get_active_memory",
    "get_peak_memory",
    "estimate_operation_memory",
]
