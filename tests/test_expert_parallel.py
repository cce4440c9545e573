"""Expert-parallel (MoE) training step: correctness against the dense step.

The ep step routes tokens to experts across the 'expert' mesh axis with two
``all_to_all`` exchanges; these tests pin its loss and gradients leaf-by-leaf
to the dense single-device computation (same routing groups, same capacity,
so the SAME tokens are dropped) on the 8-virtual-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_primitives_tpu.models.expert_parallel import (
    ep_batch_sharding,
    init_moe_classifier_params,
    make_ep_train_step,
    moe_capacity,
    moe_classifier_apply,
    moe_param_sharding,
    moe_param_specs,
    validate_ep_shapes,
)
from mlx_audio_primitives_tpu.models.pipelines import TrainableLogMelFrontend
from mlx_audio_primitives_tpu.parallel.mesh import make_ep_mesh

SR, N_FFT, HOP, N_MELS = 22050, 256, 64, 32
N_EXPERTS, D_HIDDEN, CF, AUX = 4, 48, 1.25, 0.01


def _frontend():
    return TrainableLogMelFrontend(
        sr=SR, n_fft=N_FFT, hop_length=HOP, n_mels=N_MELS
    )


def _data(batch=8, n=2048, n_classes=8, seed=0):
    rng = np.random.default_rng(seed)
    y = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
    labels = jnp.asarray(
        rng.integers(0, n_classes, size=(batch,)).astype(np.int32)
    )
    return y, labels


def _dense_step(frontend, params, y, labels, n_groups, lr=1e-2):
    """Dense full-batch SGD step — the oracle for the ep step.

    ``n_groups`` replicates the sharded run's independent routing groups so
    capacity dropping matches token for token.
    """

    def loss_fn(p):
        logits, aux = moe_classifier_apply(
            frontend, p, y, N_EXPERTS, capacity_factor=CF,
            n_groups=n_groups, use_pallas=False,
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        return jnp.mean(nll) + AUX * aux

    loss, grads = jax.value_and_grad(loss_fn)(params)
    return jax.tree.map(lambda p, g: p - lr * g, params, grads), loss


@pytest.mark.parametrize(
    "n_data,n_expert", [(2, 2), (1, 4), (2, 4), (4, 2), (1, 1)]
)
def test_ep_step_matches_dense(n_data, n_expert):
    if n_data * n_expert > len(jax.devices()):
        pytest.skip("needs more virtual devices")
    n_dev = n_data * n_expert
    mesh = make_ep_mesh(n_data, n_expert, devices=jax.devices()[:n_dev])
    frontend = _frontend()
    n_classes = 8
    params = init_moe_classifier_params(
        frontend, n_classes, n_experts=N_EXPERTS, d_hidden=D_HIDDEN
    )
    y, labels = _data(batch=8, n_classes=n_classes)

    step = jax.jit(
        make_ep_train_step(
            mesh, frontend, n_classes=n_classes, n_experts=N_EXPERTS,
            d_hidden=D_HIDDEN, capacity_factor=CF, aux_coef=AUX,
            use_pallas=False,
        )
    )
    new_ep, loss_ep = step(params, y, labels)
    want, loss_dense = _dense_step(frontend, params, y, labels, n_groups=n_dev)

    np.testing.assert_allclose(float(loss_ep), float(loss_dense), rtol=1e-5)
    flat_ep = jax.tree_util.tree_leaves_with_path(new_ep)
    flat_dense = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(want)
    )
    assert len(flat_ep) == len(flat_dense)
    for key, leaf in flat_ep:
        ref = flat_dense[jax.tree_util.keystr(key)]
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(ref), rtol=2e-4, atol=2e-6,
            err_msg=f"leaf {jax.tree_util.keystr(key)} diverged",
        )


def test_ep_step_descends_with_sharded_placement():
    mesh = make_ep_mesh(2, 4, devices=jax.devices()[:8])
    frontend = _frontend()
    params = init_moe_classifier_params(
        frontend, 8, n_experts=N_EXPERTS, d_hidden=D_HIDDEN, seed=3
    )
    params = jax.tree.map(jax.device_put, params, moe_param_sharding(mesh))
    y, labels = _data(batch=16, n_classes=8, seed=3)
    y = jax.device_put(y, ep_batch_sharding(mesh))

    step = jax.jit(
        make_ep_train_step(
            mesh, frontend, n_classes=8, n_experts=N_EXPERTS,
            d_hidden=D_HIDDEN, use_pallas=False,
        )
    )
    losses = []
    for _ in range(4):
        params, loss = step(params, y, labels)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_ep_capacity_drops_tokens_deterministically():
    """A tiny capacity drops overflow tokens; the residual carries them."""
    frontend = _frontend()
    params = init_moe_classifier_params(frontend, 8, n_experts=N_EXPERTS)
    y, _ = _data(batch=4)
    logits_tight, _ = moe_classifier_apply(
        frontend, params, y, N_EXPERTS, capacity_factor=0.05,
        use_pallas=False,
    )
    logits_roomy, _ = moe_classifier_apply(
        frontend, params, y, N_EXPERTS, capacity_factor=4.0,
        use_pallas=False,
    )
    assert np.all(np.isfinite(np.asarray(logits_tight)))
    assert np.all(np.isfinite(np.asarray(logits_roomy)))
    # routing must actually change the output when capacity differs
    assert not np.allclose(
        np.asarray(logits_tight), np.asarray(logits_roomy)
    )


def test_moe_capacity_formula():
    assert moe_capacity(100, 4, 1.0) == 25
    assert moe_capacity(100, 4, 1.25) == 32  # ceil(31.25)
    assert moe_capacity(3, 8, 1.0) == 1  # floor of 1


def test_ep_specs_match_param_tree():
    frontend = _frontend()
    params = init_moe_classifier_params(frontend, 8)
    specs = moe_param_specs()
    assert jax.tree_util.tree_structure(
        jax.tree.map(lambda _: 0, params)
    ) == jax.tree_util.tree_structure(
        jax.tree.map(
            lambda _: 0, specs,
            is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec),
        )
    )


def test_ep_shape_validation():
    with pytest.raises(ValueError, match="not divisible"):
        validate_ep_shapes(4, 6, 8, 8)
    with pytest.raises(ValueError, match="batch"):
        validate_ep_shapes(2, 4, 6, 4)
    validate_ep_shapes(2, 4, 8, 4)  # fine
    with pytest.raises(ValueError, match="n_experts"):
        make_ep_train_step(
            make_ep_mesh(1, 2, devices=jax.devices()[:2]), _frontend(),
            n_experts=3,
        )


def test_make_ep_mesh_validation():
    with pytest.raises(ValueError):
        make_ep_mesh(8, 2, devices=jax.devices())  # 16 > 8
    mesh = make_ep_mesh(n_expert=2, devices=jax.devices())
    assert mesh.shape == {"data": 4, "expert": 2}


# ---------------------------------------------------------------------------
# dp x ep x tp: Megatron-sharded experts on the 3-axis mesh

from mlx_audio_primitives_tpu.models.expert_parallel import (  # noqa: E402
    make_ep_tp_train_step,
    moe_batch_sharding,
    moe_tp_param_sharding,
    moe_tp_param_specs,
)
from mlx_audio_primitives_tpu.parallel.mesh import make_moe_mesh  # noqa: E402


@pytest.mark.parametrize(
    "n_data,n_expert,n_model",
    [(2, 2, 2), (1, 4, 2), (1, 2, 4), (2, 1, 4), (8, 1, 1), (1, 1, 8)],
)
def test_ep_tp_step_matches_dense(n_data, n_expert, n_model):
    n_dev = n_data * n_expert * n_model
    if n_dev > len(jax.devices()):
        pytest.skip("needs more virtual devices")
    mesh = make_moe_mesh(
        n_data, n_expert, n_model, devices=jax.devices()[:n_dev]
    )
    frontend = _frontend()
    params = init_moe_classifier_params(
        frontend, 8, n_experts=N_EXPERTS, d_hidden=D_HIDDEN
    )
    y, labels = _data(batch=8, n_classes=8)

    step = jax.jit(
        make_ep_tp_train_step(
            mesh, frontend, n_classes=8, n_experts=N_EXPERTS,
            d_hidden=D_HIDDEN, capacity_factor=CF, aux_coef=AUX,
            use_pallas=False,
        )
    )
    new_p, loss = step(params, y, labels)
    # the 'model' axis never splits tokens: routing groups = data x expert
    want, loss_dense = _dense_step(
        frontend, params, y, labels, n_groups=n_data * n_expert
    )
    np.testing.assert_allclose(float(loss), float(loss_dense), rtol=1e-5)
    fd = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(want)
    )
    for key, leaf in jax.tree_util.tree_leaves_with_path(new_p):
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(fd[jax.tree_util.keystr(key)]),
            rtol=2e-4, atol=2e-6,
            err_msg=f"leaf {jax.tree_util.keystr(key)} diverged",
        )


def test_ep_tp_step_descends_with_sharded_placement():
    mesh = make_moe_mesh(2, 2, 2, devices=jax.devices()[:8])
    frontend = _frontend()
    params = init_moe_classifier_params(
        frontend, 8, n_experts=N_EXPERTS, d_hidden=D_HIDDEN, seed=5
    )
    params = jax.tree.map(jax.device_put, params, moe_tp_param_sharding(mesh))
    y, labels = _data(batch=16, n_classes=8, seed=5)
    y = jax.device_put(y, moe_batch_sharding(mesh))

    step = jax.jit(
        make_ep_tp_train_step(
            mesh, frontend, n_classes=8, n_experts=N_EXPERTS,
            d_hidden=D_HIDDEN, lr=3e-2, use_pallas=False,
        )
    )
    losses = []
    for _ in range(8):
        params, loss = step(params, y, labels)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_ep_tp_validation():
    mesh = make_moe_mesh(1, 2, 2, devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="n_experts"):
        make_ep_tp_train_step(mesh, _frontend(), n_experts=3)
    with pytest.raises(ValueError, match="d_hidden"):
        make_ep_tp_train_step(mesh, _frontend(), n_experts=4, d_hidden=33)
    with pytest.raises(ValueError):
        make_moe_mesh(2, 2, 4, devices=jax.devices())  # 16 > 8


def test_moe_tp_specs_match_param_tree():
    frontend = _frontend()
    params = init_moe_classifier_params(frontend, 8)
    specs = moe_tp_param_specs()
    assert jax.tree_util.tree_structure(
        jax.tree.map(lambda _: 0, params)
    ) == jax.tree_util.tree_structure(
        jax.tree.map(
            lambda _: 0, specs,
            is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec),
        )
    )


def test_ep_step_rejects_indivisible_batch():
    """The factories' steps call validate_ep_shapes, so a bad batch fails
    with the clear message rather than a cryptic shard_map error."""
    import jax

    from mlx_audio_primitives_tpu.models.expert_parallel import (
        make_ep_train_step,
    )
    from mlx_audio_primitives_tpu.models.pipelines import (
        TrainableLogMelFrontend,
    )
    from mlx_audio_primitives_tpu.parallel.mesh import make_ep_mesh

    mesh = make_ep_mesh(2, 2, devices=jax.devices()[:4])
    fe = TrainableLogMelFrontend(sr=22050, n_fft=256, hop_length=64, n_mels=16)
    from mlx_audio_primitives_tpu.models.expert_parallel import (
        init_moe_classifier_params,
    )

    params = init_moe_classifier_params(fe, 8, n_experts=4)
    step = make_ep_train_step(mesh, fe, n_classes=8, n_experts=4,
                              use_pallas=False)
    y = np.zeros((6, 2048), np.float32)  # 6 % 4 != 0
    labels = np.zeros((6,), np.int32)
    with pytest.raises(ValueError, match="not divisible"):
        step(params, y, labels)
