"""Tensor-parallel training step: correctness against the single-device step.

The tp step's gradients flow through psum / all_gather collectives and
shard_map's vma-tracked autodiff; these tests pin them leaf-by-leaf to the
plain single-device computation on the 8-virtual-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_primitives_tpu.models.convnet import (
    audio_classifier_apply,
    init_audio_classifier_params,
)
from mlx_audio_primitives_tpu.models.pipelines import TrainableLogMelFrontend
from mlx_audio_primitives_tpu.models.tensor_parallel import (
    make_tp_train_step,
    tp_param_sharding,
    tp_param_specs,
    validate_tp_shapes,
)
from mlx_audio_primitives_tpu.parallel.mesh import make_tp_mesh

SR, N_FFT, HOP, N_MELS = 22050, 256, 64, 32


def _frontend():
    return TrainableLogMelFrontend(
        sr=SR, n_fft=N_FFT, hop_length=HOP, n_mels=N_MELS
    )


def _data(batch=4, n=2048, n_classes=8, seed=0):
    rng = np.random.default_rng(seed)
    y = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, n_classes, size=(batch,)).astype(np.int32))
    return y, labels


def _single_device_step(frontend, params, y, labels, lr=1e-2):
    """Plain full-batch SGD step — the oracle for the tp step."""

    def loss_fn(p):
        logits = audio_classifier_apply(frontend, p, y, use_pallas=False)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        return jnp.mean(nll)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    return jax.tree.map(lambda p, g: p - lr * g, params, grads), loss


@pytest.mark.parametrize(
    "n_data,n_model,channels",
    [(2, 2, (8, 16)), (1, 4, (8, 16)), (2, 2, (8,)), (2, 4, (8, 16))],
)
def test_tp_step_matches_single_device(n_data, n_model, channels):
    if n_data * n_model > len(jax.devices()):
        pytest.skip("needs more virtual devices")
    mesh = make_tp_mesh(n_data, n_model, devices=jax.devices()[: n_data * n_model])
    frontend = _frontend()
    n_classes = 8
    params = init_audio_classifier_params(frontend, n_classes, channels=channels)
    y, labels = _data(batch=4, n_classes=n_classes)

    step = jax.jit(
        make_tp_train_step(
            mesh, frontend, n_classes=n_classes, channels=channels,
            use_pallas=False,
        )
    )
    new_tp, loss_tp = step(params, y, labels)
    want, loss_1d = _single_device_step(frontend, params, y, labels)

    np.testing.assert_allclose(float(loss_tp), float(loss_1d), rtol=1e-5)
    flat_tp = jax.tree_util.tree_leaves_with_path(new_tp)
    flat_1d = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(want)
    )
    assert len(flat_tp) == len(flat_1d)
    for key, leaf in flat_tp:
        ref = flat_1d[jax.tree_util.keystr(key)]
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(ref), rtol=2e-4, atol=2e-6,
            err_msg=f"leaf {jax.tree_util.keystr(key)} diverged",
        )


def test_tp_step_descends_with_sharded_placement():
    mesh = make_tp_mesh(2, 2, devices=jax.devices()[:4])
    frontend = _frontend()
    params = init_audio_classifier_params(frontend, 8, channels=(8, 16))
    # place params with their tp shardings (as a real deployment would)
    shardings = tp_param_sharding(mesh, (8, 16))
    shardings = {"frontend": shardings["frontend"], "net": shardings["net"]}
    params = jax.tree.map(jax.device_put, params, shardings)
    y, labels = _data(batch=8, n_classes=8, seed=3)

    step = jax.jit(
        make_tp_train_step(mesh, frontend, n_classes=8, channels=(8, 16),
                           use_pallas=False)
    )
    losses = []
    for _ in range(4):
        params, loss = step(params, y, labels)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_tp_step_large_nfft_vma_safe_rfft():
    """n_fft past the dense-DFT budget (4096): the vma branch of
    melspectrogram_xla must use the transpose-free custom-vjp rfft — plain
    jnp.fft.rfft's transpose rule rejects varying cotangents under
    check_vma shard_map (regression: this config used to crash)."""
    mesh = make_tp_mesh(2, 2, devices=jax.devices()[:4])
    frontend = TrainableLogMelFrontend(
        sr=SR, n_fft=8192, hop_length=2048, n_mels=32
    )
    params = init_audio_classifier_params(frontend, 8, channels=(8, 16))
    y, labels = _data(batch=4, n=9216, n_classes=8)

    step = jax.jit(
        make_tp_train_step(mesh, frontend, n_classes=8, channels=(8, 16),
                           use_pallas=False)
    )
    new_tp, loss_tp = step(params, y, labels)
    want, loss_1d = _single_device_step(frontend, params, y, labels)
    np.testing.assert_allclose(float(loss_tp), float(loss_1d), rtol=1e-5)
    flat_1d = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(want)
    )
    for key, leaf in jax.tree_util.tree_leaves_with_path(new_tp):
        np.testing.assert_allclose(
            np.asarray(leaf),
            np.asarray(flat_1d[jax.tree_util.keystr(key)]),
            rtol=2e-4, atol=2e-6,
            err_msg=f"leaf {jax.tree_util.keystr(key)} diverged",
        )


def test_tp_specs_match_param_tree():
    frontend = _frontend()
    params = init_audio_classifier_params(frontend, 8, channels=(8, 16))
    specs = tp_param_specs((8, 16))
    assert jax.tree_util.tree_structure(
        jax.tree.map(lambda _: 0, params)
    ) == jax.tree_util.tree_structure(
        jax.tree.map(lambda _: 0, specs, is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec))
    )


def test_tp_shape_validation():
    with pytest.raises(ValueError, match="not divisible"):
        validate_tp_shapes(4, (6, 16), 8)
    with pytest.raises(ValueError, match="n_classes"):
        validate_tp_shapes(4, (8, 16), 10)
    validate_tp_shapes(2, (8, 16), 10)  # fine


def test_make_tp_mesh_validation():
    with pytest.raises(ValueError):
        make_tp_mesh(8, 2, devices=jax.devices())  # 16 > 8
    mesh = make_tp_mesh(n_model=2, devices=jax.devices())
    assert mesh.shape == {"data": 4, "model": 2}
