"""Pipeline-parallel training step: correctness against serial execution.

The GPipe fill-drain schedule, the ring ppermute handoff, and the
stage-sharded block gradients must reproduce the serial forward/backward
exactly; these tests pin them on the 8-virtual-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_primitives_tpu.models.pipeline_parallel import (
    deep_classifier_apply,
    init_deep_classifier_params,
    make_pp_train_step,
    pp_param_sharding,
)
from mlx_audio_primitives_tpu.models.pipelines import TrainableLogMelFrontend
from mlx_audio_primitives_tpu.parallel.mesh import make_pp_mesh

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


def _serial_step(frontend, params, y, labels, lr=1e-2):
    """Single-device full-batch SGD step — the pipeline's oracle."""

    def loss_fn(p):
        logits = deep_classifier_apply(frontend, p, y, use_pallas=False)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        return jnp.mean(nll)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    return jax.tree.map(lambda p, g: p - lr * g, params, grads), loss


@pytest.mark.parametrize(
    "n_stage,n_blocks,n_micro",
    [(2, 4, 2), (4, 4, 2), (2, 2, 4), (4, 8, 1), (1, 4, 2)],
)
def test_pp_step_matches_serial(n_stage, n_blocks, n_micro):
    if n_stage > len(jax.devices()):
        pytest.skip("needs more virtual devices")
    mesh = make_pp_mesh(n_stage, devices=jax.devices()[:n_stage])
    frontend = _frontend()
    params = init_deep_classifier_params(frontend, 8, n_blocks=n_blocks, width=8)
    y, labels = _data(batch=4)

    step = jax.jit(
        make_pp_train_step(
            mesh, frontend, n_classes=8, n_blocks=n_blocks, width=8,
            n_microbatches=n_micro, use_pallas=False,
        )
    )
    new_pp, loss_pp = step(params, y, labels)
    want, loss_serial = _serial_step(frontend, params, y, labels)

    np.testing.assert_allclose(float(loss_pp), float(loss_serial), rtol=1e-5)
    flat_pp = jax.tree_util.tree_leaves_with_path(new_pp)
    flat_sr = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(want)
    )
    assert len(flat_pp) == len(flat_sr)
    for key, leaf in flat_pp:
        ref = flat_sr[jax.tree_util.keystr(key)]
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(ref), rtol=2e-4, atol=2e-6,
            err_msg=f"leaf {jax.tree_util.keystr(key)} diverged",
        )


def test_pp_step_descends_with_sharded_placement():
    mesh = make_pp_mesh(4, devices=jax.devices()[:4])
    frontend = _frontend()
    params = init_deep_classifier_params(frontend, 8, n_blocks=4, width=8)
    params = jax.tree.map(jax.device_put, params, pp_param_sharding(mesh))
    y, labels = _data(batch=8, seed=3)

    step = jax.jit(
        make_pp_train_step(mesh, frontend, n_classes=8, n_blocks=4, width=8,
                           n_microbatches=4, use_pallas=False)
    )
    losses = []
    for _ in range(4):
        params, loss = step(params, y, labels)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_pp_validation():
    mesh = make_pp_mesh(4, devices=jax.devices()[:4])
    frontend = _frontend()
    with pytest.raises(ValueError, match="divide over"):
        make_pp_train_step(mesh, frontend, n_blocks=6)
    with pytest.raises(ValueError, match="n_microbatches"):
        make_pp_train_step(mesh, frontend, n_blocks=4, n_microbatches=0)
    with pytest.raises(ValueError, match="needs"):
        make_pp_mesh(16)
