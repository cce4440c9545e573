"""Augmentations: mask geometry, batch independence, SNR accuracy, jit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_primitives_tpu.ops.augment import (
    add_noise,
    freq_mask,
    random_gain,
    spec_augment,
    time_mask,
)


def _feats(B=4, n_mels=32, F=64, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((B, n_mels, F)).astype(np.float32) + 5.0)


def test_time_mask_zeroes_contiguous_frames():
    x = _feats()
    y = np.asarray(time_mask(x, jax.random.key(0), mask_param=20))
    assert y.shape == x.shape
    for b in range(x.shape[0]):
        masked_cols = np.where((y[b] == 0).all(axis=0))[0]
        assert masked_cols.size <= 20
        if masked_cols.size:
            # contiguous range
            assert (np.diff(masked_cols) == 1).all()
            # all OTHER columns untouched
            keep = np.setdiff1d(np.arange(x.shape[-1]), masked_cols)
            np.testing.assert_array_equal(y[b][:, keep], np.asarray(x)[b][:, keep])


def test_freq_mask_zeroes_contiguous_bands():
    x = _feats()
    y = np.asarray(freq_mask(x, jax.random.key(1), mask_param=10))
    for b in range(x.shape[0]):
        rows = np.where((y[b] == 0).all(axis=1))[0]
        assert rows.size <= 10
        if rows.size:
            assert (np.diff(rows) == 1).all()


def test_masks_independent_per_batch_element_and_deterministic():
    x = _feats(B=8)
    y1 = np.asarray(time_mask(x, jax.random.key(2), mask_param=30))
    y2 = np.asarray(time_mask(x, jax.random.key(2), mask_param=30))
    np.testing.assert_array_equal(y1, y2)  # same key -> same masks
    patterns = {tuple((y1[b] == 0).all(axis=0)) for b in range(8)}
    assert len(patterns) > 1  # different masks across the batch
    y3 = np.asarray(time_mask(x, jax.random.key(3), mask_param=30))
    assert not np.array_equal(y1, y3)  # different key -> different masks


def test_mask_param_clipped_and_zero():
    x = _feats(F=8)
    y = time_mask(x, jax.random.key(0), mask_param=1000)  # > F: clipped
    assert np.isfinite(np.asarray(y)).all()
    y0 = time_mask(x, jax.random.key(0), mask_param=0)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(x))


def test_mask_value():
    x = _feats()
    y = np.asarray(
        spec_augment(x, jax.random.key(5), mask_value=-80.0,
                     time_mask_param=30, freq_mask_param=16)
    )
    vals = np.unique(y[~np.isclose(y, np.asarray(x))])
    assert vals.size and np.allclose(vals, -80.0)


def test_spec_augment_jits_and_unbatched():
    x = _feats()[0]  # (n_mels, F), no batch dim
    f = jax.jit(lambda x, k: spec_augment(x, k))
    y = f(x, jax.random.key(0))
    assert y.shape == x.shape


def test_add_noise_snr():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((4, 16000)).astype(np.float32))
    out = add_noise(y, jax.random.key(0), snr_db=10.0)
    noise = np.asarray(out) - np.asarray(y)
    snr = 10 * np.log10(
        np.mean(np.asarray(y) ** 2, -1) / np.mean(noise**2, -1)
    )
    np.testing.assert_allclose(snr, 10.0, atol=0.1)
    # per-sample snr array
    out2 = add_noise(y, jax.random.key(0), snr_db=jnp.asarray([0.0, 10.0, 20.0, 30.0]))
    noise2 = np.asarray(out2) - np.asarray(y)
    snr2 = 10 * np.log10(np.mean(np.asarray(y) ** 2, -1) / np.mean(noise2**2, -1))
    np.testing.assert_allclose(snr2, [0, 10, 20, 30], atol=0.1)


def test_add_noise_silence_stays_quiet():
    y = jnp.zeros((2, 1000), jnp.float32)
    out = np.asarray(add_noise(y, jax.random.key(0), snr_db=20.0))
    assert np.abs(out).max() < 1e-3


def test_random_gain():
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.standard_normal((16, 100)).astype(np.float32))
    out = np.asarray(random_gain(y, jax.random.key(0), -6.0, 6.0))
    g = np.linalg.norm(out, axis=-1) / np.linalg.norm(np.asarray(y), axis=-1)
    g_db = 20 * np.log10(g)
    assert (g_db >= -6 - 1e-4).all() and (g_db <= 6 + 1e-4).all()
    assert g_db.std() > 0.5  # actually random per element
    with pytest.raises(ValueError, match="min_gain_db"):
        random_gain(y, jax.random.key(0), 3.0, -3.0)


def test_validation():
    x = _feats()
    with pytest.raises(ValueError, match="n_masks"):
        time_mask(x, jax.random.key(0), n_masks=0)
    with pytest.raises(ValueError, match="mask_param"):
        freq_mask(x, jax.random.key(0), mask_param=-1)
