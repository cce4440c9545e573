"""Shared fixtures (port of the reference's `tests/conftest.py:12-74`).

Tests run on CPU JAX with 8 virtual devices so the multi-chip sharding suite
exercises real meshes without TPU hardware (SURVEY.md §4 "CI execution").
These env vars must be set before jax initializes its backends.
"""

import os

# Force CPU for tests even when the session environment pins a TPU platform
# (e.g. JAX_PLATFORMS=axon); override with MLX_AUDIO_TEST_PLATFORM if needed.
# jax may already be imported by a sitecustomize hook, so set the config
# directly (safe as long as no backend has been initialized yet).
_platform = os.environ.get("MLX_AUDIO_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", _platform)

import numpy as np
import pytest

if _platform == "axon":
    # The axon remote-TPU tunnel cannot transfer complex arrays to the host
    # (UNIMPLEMENTED), and one failed attempt poisons the whole session.
    # Re-route complex host fetches through two real-valued device ops so
    # `np.asarray(complex_jax_array)` works transparently in tests run with
    # MLX_AUDIO_TEST_PLATFORM=axon (the TPU self-test artifact).
    # Patching `_value` (not `__array__`) also covers jit tracing, which
    # embeds closed-over device constants via `_array_mlir_constant_handler
    # -> val._value`.
    import jax.numpy as _jnp
    from jax._src import array as _jax_array_mod

    # This shim reaches into private jax internals; fail loudly (rather
    # than silently altering values under test) if a jax upgrade moves
    # them. Validated against the pinned image jax; widen deliberately.
    if not (
        hasattr(_jax_array_mod, "ArrayImpl")
        and isinstance(
            getattr(_jax_array_mod.ArrayImpl, "_value", None), property
        )
    ):
        raise RuntimeError(
            "axon complex-transfer shim: jax._src.array.ArrayImpl._value "
            f"is no longer a property under jax {jax.__version__}; "
            "re-validate tests/conftest.py against this jax before "
            "running the TPU self-test."
        )

    _orig_value = _jax_array_mod.ArrayImpl._value

    def _axon_safe_value(self):
        if np.issubdtype(np.dtype(self.dtype), np.complexfloating):
            re = np.asarray(_jnp.real(self))
            im = np.asarray(_jnp.imag(self))
            return (re + 1j * im).astype(np.dtype(self.dtype))
        return _orig_value.fget(self)

    _jax_array_mod.ArrayImpl._value = property(_axon_safe_value)

    # ... and host->device complex transfers are equally unimplemented (the
    # failure surfaces asynchronously at first use — block_until_ready is
    # non-blocking on this async proxy). Build complex device arrays from
    # two real transfers instead.
    _orig_asarray = _jnp.asarray
    _orig_array_fn = _jnp.array

    def _axon_complexify(a):
        re = _orig_asarray(np.ascontiguousarray(a.real, dtype=np.float32))
        im = _orig_asarray(np.ascontiguousarray(a.imag, dtype=np.float32))
        return jax.lax.complex(re, im)

    def _is_host_complex(a):
        return (
            isinstance(a, (np.ndarray, np.generic, complex))
            and np.issubdtype(np.asarray(a).dtype, np.complexfloating)
        )

    def _wanted_dtype(args, kwargs):
        # dtype is the first positional in both jnp.asarray and jnp.array
        # today; pull it from either slot without assuming the rest of
        # the signature (forwarded verbatim below, so drift is safe).
        if "dtype" in kwargs:
            return kwargs["dtype"]
        return args[0] if args else None

    def _axon_asarray(a, *args, **kwargs):
        if _is_host_complex(a):
            out = _axon_complexify(np.asarray(a))
            dtype = _wanted_dtype(args, kwargs)
            return out.astype(dtype) if dtype is not None else out
        return _orig_asarray(a, *args, **kwargs)

    def _axon_array(a, *args, **kwargs):
        if _is_host_complex(a):
            out = _axon_complexify(np.asarray(a))
            dtype = _wanted_dtype(args, kwargs)
            return out.astype(dtype) if dtype is not None else out
        return _orig_array_fn(a, *args, **kwargs)

    _jnp.asarray = _axon_asarray
    _jnp.array = _axon_array


@pytest.fixture(scope="session")
def random_signal() -> np.ndarray:
    """Deterministic 1-second noise signal at 22050 Hz (seed 42)."""
    rng = np.random.default_rng(42)
    return rng.standard_normal(22050).astype(np.float32)


@pytest.fixture(scope="session")
def chirp_signal() -> np.ndarray:
    """100 -> 1000 Hz linear chirp, 1 s at 22050 Hz."""
    sr = 22050
    t = np.linspace(0, 1, sr, endpoint=False)
    f0, f1 = 100.0, 1000.0
    phase = 2 * np.pi * (f0 * t + 0.5 * (f1 - f0) * t**2)
    return np.sin(phase).astype(np.float32)


@pytest.fixture(scope="session")
def short_signal() -> np.ndarray:
    rng = np.random.default_rng(7)
    return rng.standard_normal(1024).astype(np.float32)


@pytest.fixture(scope="session")
def batch_signals() -> np.ndarray:
    rng = np.random.default_rng(123)
    return rng.standard_normal((4, 22050)).astype(np.float32)


@pytest.fixture(scope="session")
def sine_signal() -> np.ndarray:
    sr = 22050
    t = np.arange(sr, dtype=np.float64) / sr
    return np.sin(2 * np.pi * 440.0 * t).astype(np.float32)


@pytest.fixture(scope="session")
def sr() -> int:
    return 22050
