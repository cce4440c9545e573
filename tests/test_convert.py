"""dB conversion parity (port of reference `tests/test_convert.py`).

Oracle: the librosa formulas implemented directly in float64 NumPy.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_primitives_tpu import (
    amplitude_to_db,
    db_to_amplitude,
    db_to_power,
    power_to_db,
)


def _power_to_db_np(S, ref=1.0, amin=1e-10, top_db=80.0):
    S = np.asarray(S, dtype=np.float64)
    ref_value = ref(S) if callable(ref) else ref
    log_spec = 10.0 * np.log10(np.maximum(S, amin) / np.maximum(ref_value, amin))
    if top_db is not None:
        log_spec = np.maximum(log_spec, log_spec.max() - top_db)
    return log_spec


@pytest.fixture
def power_spec():
    rng = np.random.default_rng(0)
    return (rng.random((64, 100)) * 10).astype(np.float32)


def test_power_to_db_matches_oracle(power_spec):
    ours = np.asarray(power_to_db(power_spec))
    ref = _power_to_db_np(power_spec)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_power_to_db_callable_ref(power_spec):
    ours = np.asarray(power_to_db(power_spec, ref=jnp.max))
    ref = _power_to_db_np(power_spec, ref=np.max)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_power_to_db_no_topdb(power_spec):
    ours = np.asarray(power_to_db(power_spec, top_db=None))
    ref = _power_to_db_np(power_spec, top_db=None)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_power_to_db_clips_dynamic_range():
    S = np.array([1e-12, 1.0, 100.0], dtype=np.float32)
    out = np.asarray(power_to_db(S, top_db=40.0))
    assert out.max() - out.min() <= 40.0 + 1e-5


def test_power_db_roundtrip(power_spec):
    db = power_to_db(power_spec, top_db=None)
    back = np.asarray(db_to_power(db))
    np.testing.assert_allclose(back, power_spec, rtol=2e-4)


def test_amplitude_db_roundtrip(power_spec):
    amp = np.sqrt(power_spec)
    db = amplitude_to_db(amp, top_db=None)
    back = np.asarray(db_to_amplitude(db))
    np.testing.assert_allclose(back, amp, rtol=2e-4)


def test_amplitude_is_20log10(power_spec):
    amp = np.sqrt(power_spec)
    a_db = np.asarray(amplitude_to_db(amp, amin=1e-10, top_db=None))
    p_db = np.asarray(power_to_db(power_spec, amin=1e-20, top_db=None))
    np.testing.assert_allclose(a_db, p_db, atol=1e-3)


def test_invalid_topdb_raises(power_spec):
    with pytest.raises(ValueError):
        power_to_db(power_spec, top_db=-5.0)


def test_db_of_ones_is_zero():
    out = np.asarray(power_to_db(np.ones(16, np.float32)))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_precise_log10_edge_semantics():
    """inf/0/negative handling matches jnp.log10 (kernel-level contract)."""
    import jax.numpy as jnp

    from mlx_audio_primitives_tpu.kernels.precise_math import exp10, log10

    x = np.array([np.inf, 0.0, -1.0, 1.0, 1e30], np.float32)
    out = np.asarray(log10(jnp.asarray(x)))
    assert np.isposinf(out[0])
    assert np.isneginf(out[1])
    assert np.isnan(out[2])
    np.testing.assert_allclose(out[3:], [0.0, 30.0], atol=1e-5)
    # exp10 edges match 10.0**x: -inf -> 0 (digital silence round-trips),
    # +inf -> inf, nan -> nan — the range reduction alone would NaN both infs
    e = np.asarray(exp10(jnp.asarray(
        np.array([0.0, 2.0, -np.inf, np.inf, np.nan], np.float32)
    )))
    np.testing.assert_allclose(e[:2], [1.0, 100.0], rtol=1e-6)
    assert e[2] == 0.0
    assert np.isposinf(e[3])
    assert np.isnan(e[4])


class TestMuLaw:
    def test_roundtrip_float(self):
        from mlx_audio_primitives_tpu import mu_compress, mu_expand

        rng = np.random.default_rng(0)
        x = rng.uniform(-1, 1, 1000).astype(np.float32)
        y = mu_expand(mu_compress(x, quantize=False), quantize=False)
        np.testing.assert_allclose(np.asarray(y), x, atol=1e-5)

    def test_quantized_roundtrip_error_bound(self):
        from mlx_audio_primitives_tpu import mu_compress, mu_expand

        rng = np.random.default_rng(1)
        x = rng.uniform(-1, 1, 2000).astype(np.float32)
        codes = np.asarray(mu_compress(x))
        assert codes.dtype == np.int32
        # librosa's digitize binning yields [-127, 128] for mu=255
        assert codes.min() >= -127 and codes.max() <= 128
        rec = np.asarray(mu_expand(codes))
        # librosa's floor-binning (no half-bin offset) allows up to one
        # full companded bin of error: ~0.044 at |x|~1 for mu=255
        assert np.abs(rec - x).max() < 0.05
        # small amplitudes get FINER resolution than uniform 8-bit
        small = np.abs(x) < 0.05
        assert np.abs(rec - x)[small].max() < 2.0 / 255

    def test_monotone_codes(self):
        from mlx_audio_primitives_tpu import mu_compress

        x = np.linspace(-1, 1, 512).astype(np.float32)
        codes = np.asarray(mu_compress(x))
        assert np.all(np.diff(codes) >= 0)

    def test_errors(self):
        from mlx_audio_primitives_tpu import mu_compress, mu_expand

        with pytest.raises(ValueError):
            mu_compress(np.zeros(4, np.float32), mu=0)
        with pytest.raises(ValueError):
            mu_expand(np.zeros(4, np.float32), mu=-1)
