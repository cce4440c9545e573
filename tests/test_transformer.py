"""Ring-attention transformer: correctness against single-device oracles.

Three layers of validation on the 8-virtual-device CPU mesh:

1. `ring_attention` inside shard_map == full attention on the gathered
   sequence (the flash-style online softmax and the ppermute ring are pure
   reformulations);
2. the dp x cp train step's loss AND every parameter gradient equal the
   single-device step (vma-tracked autodiff through ppermute / psum, one
   uniform mesh-size rescale);
3. training descends for several steps on both the matmul and fft per-shard
   frontend modes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from mlx_audio_primitives_tpu.models.transformer import (
    init_transformer_params,
    make_cp_train_step,
    ring_attention,
    single_device_cp_oracle,
    sinusoidal_positions,
    transformer_apply,
    transformer_param_sharding,
    _full_attention,
)
from mlx_audio_primitives_tpu.parallel.mesh import (
    batch_time_sharding,
    make_mesh,
)

SR, N_FFT, HOP, N_MELS = 22050, 256, 64, 32


def _data(batch, L, n_classes=6, seed=0):
    rng = np.random.default_rng(seed)
    y = jnp.asarray(rng.standard_normal((batch, L)).astype(np.float32))
    labels = jnp.asarray(
        rng.integers(0, n_classes, size=(batch,)).astype(np.int32)
    )
    return y, labels


@pytest.mark.parametrize("n_time", [2, 4, 8])
def test_ring_attention_matches_full(n_time):
    if n_time > len(jax.devices()):
        pytest.skip("not enough devices")
    mesh = make_mesh(n_data=1, n_time=n_time, devices=jax.devices()[:n_time])
    B, T, H, dh = 2, 8 * n_time, 3, 4
    rng = np.random.default_rng(1)
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, T, H, dh)).astype(np.float32) * 3)
        for _ in range(3)
    )

    ring = shard_map(
        lambda q_, k_, v_: ring_attention(q_, k_, v_, "time"),
        mesh=mesh,
        in_specs=(P(None, "time"), P(None, "time"), P(None, "time")),
        out_specs=P(None, "time"),
    )(q, k, v)
    full = _full_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(ring), np.asarray(full), atol=2e-6, rtol=2e-5
    )


def test_sinusoidal_positions_shape_and_range():
    t = sinusoidal_positions(16, 8)
    assert t.shape == (16, 8)
    assert np.all(np.abs(t) <= 1.0)
    # even dims are sin (0 at pos 0), odd dims cos (1 at pos 0)
    np.testing.assert_allclose(t[0, 0::2], 0.0, atol=1e-12)
    np.testing.assert_allclose(t[0, 1::2], 1.0, atol=1e-12)


def test_transformer_apply_shapes():
    params = init_transformer_params(
        N_MELS, 6, n_frames=32, d_model=16, n_heads=2, d_ff=32, n_blocks=2
    )
    feats = jnp.asarray(
        np.random.default_rng(0)
        .standard_normal((3, N_MELS, 32))
        .astype(np.float32)
    )
    logits = transformer_apply(params, feats)
    assert logits.shape == (3, 6)
    assert np.isfinite(np.asarray(logits)).all()


def test_init_validates_heads():
    with pytest.raises(ValueError, match="divisible"):
        init_transformer_params(8, 2, 4, d_model=10, n_heads=4)


@pytest.mark.parametrize("n_data,n_time", [(2, 4), (4, 2), (1, 8), (2, 2)])
def test_cp_step_matches_single_device(n_data, n_time):
    if n_data * n_time > len(jax.devices()):
        pytest.skip("not enough devices")
    mesh = make_mesh(n_data=n_data, n_time=n_time,
                     devices=jax.devices()[: n_data * n_time])
    n_classes = 6
    B = 2 * n_data
    F_total = 8 * n_time  # tokens; L = F_total * HOP samples
    L = F_total * HOP
    y, labels = _data(B, L, n_classes)

    params = init_transformer_params(
        N_MELS, n_classes, n_frames=F_total,
        d_model=16, n_heads=2, d_ff=32, n_blocks=2,
    )
    step = jax.jit(
        make_cp_train_step(
            mesh, sr=SR, n_fft=N_FFT, hop_length=HOP, n_mels=N_MELS,
            n_classes=n_classes, d_model=16, n_heads=2, d_ff=32, n_blocks=2,
        )
    )
    yd = jax.device_put(y, batch_time_sharding(mesh))
    pd = jax.tree.map(
        jax.device_put, params, transformer_param_sharding(mesh, params)
    )
    new_params, loss = step(pd, yd, labels)

    ref_params, ref_loss = single_device_cp_oracle(
        params, y, labels, sr=SR, n_fft=N_FFT, hop_length=HOP, n_mels=N_MELS
    )
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)
    flat_new = jax.tree.leaves_with_path(new_params)
    flat_ref = dict(
        (jax.tree_util.keystr(kp), v)
        for kp, v in jax.tree.leaves_with_path(ref_params)
    )
    assert len(flat_new) == len(flat_ref)
    for kp, v in flat_new:
        key = jax.tree_util.keystr(kp)
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_ref[key]),
            atol=5e-6, rtol=5e-4, err_msg=key,
        )


@pytest.mark.parametrize("fft_mode", ["matmul", "fft"])
def test_cp_training_descends(fft_mode):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(n_data=2, n_time=4)
    n_classes = 4
    B, F_total = 4, 32
    L = F_total * HOP
    y, labels = _data(B, L, n_classes, seed=3)
    params = init_transformer_params(
        N_MELS, n_classes, n_frames=F_total,
        d_model=16, n_heads=2, d_ff=32, n_blocks=2,
    )
    step = jax.jit(
        make_cp_train_step(
            mesh, sr=SR, n_fft=N_FFT, hop_length=HOP, n_mels=N_MELS,
            n_classes=n_classes, d_model=16, n_heads=2, d_ff=32,
            n_blocks=2, lr=3e-2, fft_mode=fft_mode,
        )
    )
    yd = jax.device_put(y, batch_time_sharding(mesh))
    params = jax.tree.map(
        jax.device_put, params, transformer_param_sharding(mesh, params)
    )
    losses = []
    for _ in range(5):
        params, loss = step(params, yd, labels)
        losses.append(float(loss))
    assert all(np.isfinite(v) for v in losses)
    assert losses[-1] < losses[0], losses
