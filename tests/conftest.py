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
