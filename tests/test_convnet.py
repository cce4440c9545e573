"""End-to-end conv audio classifier + checkpoint/resume.

Validates the beyond-parity model family (`models/convnet.py`): the learnable
mel filterbank + conv stack trains end to end under data parallelism on the
8-virtual-device mesh, gradients reach every parameter group, and training
state survives a checkpoint round-trip (`models/checkpoint.py`).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


SR = 8000
N_FFT, HOP, N_MELS, N_CLASSES = 256, 64, 32, 4


def _frontend():
    from mlx_audio_primitives_tpu.models import TrainableLogMelFrontend

    return TrainableLogMelFrontend(
        sr=SR, n_fft=N_FFT, hop_length=HOP, n_mels=N_MELS
    )


def _dataset(batch: int, seed: int = 0):
    """Separable synthetic task: class k = sine at a class-specific pitch
    plus noise. One mel-pattern per class, learnable by a tiny conv net."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, N_CLASSES, size=(batch,)).astype(np.int32)
    freqs = 200.0 * (2.0 ** labels.astype(np.float64))  # 200/400/800/1600 Hz
    t = np.arange(SR, dtype=np.float64) / SR
    y = np.sin(2 * np.pi * freqs[:, None] * t[None, :])
    y = (y + 0.1 * rng.standard_normal((batch, SR))).astype(np.float32)
    return y, labels


class TestConvnetForward:
    def test_logits_shape_and_finite(self):
        from mlx_audio_primitives_tpu.models import (
            audio_classifier_apply,
            init_audio_classifier_params,
        )

        fe = _frontend()
        params = init_audio_classifier_params(fe, N_CLASSES)
        y, _ = _dataset(4)
        logits = np.asarray(audio_classifier_apply(fe, params, jnp.asarray(y)))
        assert logits.shape == (4, N_CLASSES)
        assert np.isfinite(logits).all()

    def test_gradients_reach_all_param_groups(self):
        from mlx_audio_primitives_tpu.models import (
            audio_classifier_apply,
            init_audio_classifier_params,
        )

        fe = _frontend()
        params = init_audio_classifier_params(fe, N_CLASSES)
        y, labels = _dataset(4)
        yd, ld = jnp.asarray(y), jnp.asarray(labels)

        def loss_fn(p):
            logits = audio_classifier_apply(fe, p, yd)
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(jnp.take_along_axis(logp, ld[:, None], axis=-1))

        grads = jax.grad(loss_fn)(params)
        for path, g in jax.tree_util.tree_leaves_with_path(grads):
            g = np.asarray(g)
            assert np.isfinite(g).all(), path
            assert np.abs(g).max() > 0, f"zero grad at {jax.tree_util.keystr(path)}"


class TestConvnetTraining:
    def test_sharded_train_step_descends(self):
        from mlx_audio_primitives_tpu.models import (
            batch_sharding,
            init_audio_classifier_params,
            make_convnet_train_step,
        )
        from mlx_audio_primitives_tpu.parallel import make_mesh

        mesh = make_mesh(n_data=2, n_time=4)  # flattens to 8-way dp here
        fe = _frontend()
        params = init_audio_classifier_params(fe, N_CLASSES)
        y, labels = _dataset(16)
        yd = jax.device_put(jnp.asarray(y), batch_sharding(mesh))
        ld = jax.device_put(jnp.asarray(labels), batch_sharding(mesh))

        step = jax.jit(
            make_convnet_train_step(mesh, fe, n_classes=N_CLASSES, lr=5e-2)
        )
        losses = []
        for _ in range(5):
            params, loss = step(params, yd, ld)
            losses.append(float(loss))
        assert all(np.isfinite(losses)), losses
        assert losses[-1] < losses[0], losses

    def test_sharded_step_matches_single_device(self):
        """pmean-reduced sharded gradients == unsharded full-batch gradients."""
        from mlx_audio_primitives_tpu.models import (
            audio_classifier_apply,
            batch_sharding,
            init_audio_classifier_params,
            make_convnet_train_step,
        )
        from mlx_audio_primitives_tpu.parallel import make_mesh

        mesh = make_mesh(n_data=4, n_time=2)
        fe = _frontend()
        params = init_audio_classifier_params(fe, N_CLASSES)
        y, labels = _dataset(8, seed=3)
        yd = jax.device_put(jnp.asarray(y), batch_sharding(mesh))
        ld = jax.device_put(jnp.asarray(labels), batch_sharding(mesh))

        lr = 1e-2
        step = jax.jit(
            make_convnet_train_step(mesh, fe, n_classes=N_CLASSES, lr=lr)
        )
        p_sharded, loss_sharded = step(params, yd, ld)

        def loss_fn(p):
            logits = audio_classifier_apply(fe, p, jnp.asarray(y))
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(
                jnp.take_along_axis(logp, jnp.asarray(labels)[:, None], axis=-1)
            )

        loss_ref, grads_ref = jax.value_and_grad(loss_fn)(params)
        p_ref = jax.tree.map(lambda p, g: p - lr * g, params, grads_ref)

        np.testing.assert_allclose(
            float(loss_sharded), float(loss_ref), rtol=1e-5
        )
        for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(p_sharded),
            jax.tree_util.tree_leaves_with_path(p_ref),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6,
                err_msg=jax.tree_util.keystr(path),
            )


class TestCheckpoint:
    def test_roundtrip_orbax(self, tmp_path):
        from mlx_audio_primitives_tpu.models import (
            init_audio_classifier_params,
            restore_checkpoint,
            save_checkpoint,
        )

        fe = _frontend()
        params = init_audio_classifier_params(fe, N_CLASSES, seed=7)
        state = {"params": params, "step": 42}
        path = str(tmp_path / "ckpt")
        save_checkpoint(path, state)
        restored = restore_checkpoint(path, target=state)
        assert int(restored["step"]) == 42
        for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(restored["params"]),
            jax.tree_util.tree_leaves_with_path(params),
        ):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=jax.tree_util.keystr(kp)
            )

    def test_overwrite_flag(self, tmp_path):
        from mlx_audio_primitives_tpu.models import save_checkpoint
        from mlx_audio_primitives_tpu.models.checkpoint import HAS_ORBAX

        path = str(tmp_path / "ckpt")
        save_checkpoint(path, {"x": jnp.ones((2,))})
        save_checkpoint(path, {"x": jnp.zeros((2,))})  # overwrite=True default
        if HAS_ORBAX:
            with pytest.raises(Exception):
                save_checkpoint(path, {"x": jnp.ones((2,))}, overwrite=False)

    def test_npz_fallback(self, tmp_path, monkeypatch):
        import mlx_audio_primitives_tpu.models.checkpoint as ck

        monkeypatch.setattr(ck, "HAS_ORBAX", False)
        state = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 2))}}
        path = str(tmp_path / "fallback")
        written = ck.save_checkpoint(path, state)
        assert written.endswith(".npz")
        restored = ck.restore_checkpoint(path, target=state)
        np.testing.assert_array_equal(np.asarray(restored["a"]), np.arange(4.0))
        np.testing.assert_array_equal(
            np.asarray(restored["b"]["c"]), np.ones((2, 2))
        )
        with pytest.raises(ValueError):
            ck.restore_checkpoint(path)
        # same leaf count but different structure must be rejected, not
        # silently misassigned positionally
        bad_target = {"x": jnp.zeros(4), "y": {"z": jnp.zeros((2, 2))}}
        with pytest.raises(ValueError, match="structure"):
            ck.restore_checkpoint(path, target=bad_target)

    def test_restore_onto_sharded_target(self, tmp_path):
        """Orbax restores arrays WITH the target's sharding — checkpoints
        written on one topology reload straight onto a mesh (the multi-chip
        resume story)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from mlx_audio_primitives_tpu.models import (
            restore_checkpoint,
            save_checkpoint,
        )
        from mlx_audio_primitives_tpu.models.checkpoint import HAS_ORBAX
        from mlx_audio_primitives_tpu.parallel import make_mesh

        if not HAS_ORBAX:
            pytest.skip("orbax not available")
        mesh = make_mesh(n_data=8, n_time=1)
        sh = NamedSharding(mesh, P("data"))
        x = jax.device_put(jnp.arange(32.0).reshape(8, 4), sh)
        state = {"x": x, "step": 3}
        path = str(tmp_path / "sharded")
        save_checkpoint(path, state)
        r = restore_checkpoint(path, target=state)
        assert len(r["x"].sharding.device_set) == 8
        np.testing.assert_array_equal(np.asarray(r["x"]), np.asarray(x))

    def test_restore_onto_different_topology(self, tmp_path):
        """A checkpoint saved on one mesh reloads onto a DIFFERENT mesh and
        sharding spec (the resume-after-rescale story): Orbax reshards to
        the target's NamedSharding on load."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from mlx_audio_primitives_tpu.models import (
            restore_checkpoint,
            save_checkpoint,
        )
        from mlx_audio_primitives_tpu.models.checkpoint import HAS_ORBAX
        from mlx_audio_primitives_tpu.parallel import make_mesh

        if not HAS_ORBAX:
            pytest.skip("orbax not available")
        mesh8 = make_mesh(n_data=8, n_time=1)
        x = jax.device_put(
            jnp.arange(64.0).reshape(8, 8), NamedSharding(mesh8, P("data"))
        )
        path = str(tmp_path / "rescale")
        save_checkpoint(path, {"x": x, "step": 1})
        mesh42 = make_mesh(n_data=4, n_time=2)
        tgt = {
            "x": jax.device_put(
                jnp.zeros((8, 8)), NamedSharding(mesh42, P("data", "time"))
            ),
            "step": 0,
        }
        r = restore_checkpoint(path, target=tgt)
        assert r["x"].sharding.spec == P("data", "time")
        np.testing.assert_array_equal(
            np.asarray(r["x"]), np.arange(64.0).reshape(8, 8)
        )

    def test_resume_training_continues_descent(self, tmp_path):
        """Save mid-training, restore, and confirm the loss keeps falling —
        the actual resume contract, not just array equality."""
        from mlx_audio_primitives_tpu.models import (
            batch_sharding,
            init_audio_classifier_params,
            make_convnet_train_step,
            restore_checkpoint,
            save_checkpoint,
        )
        from mlx_audio_primitives_tpu.parallel import make_mesh

        mesh = make_mesh(n_data=8, n_time=1)
        fe = _frontend()
        params = init_audio_classifier_params(fe, N_CLASSES)
        y, labels = _dataset(16, seed=5)
        yd = jax.device_put(jnp.asarray(y), batch_sharding(mesh))
        ld = jax.device_put(jnp.asarray(labels), batch_sharding(mesh))
        step = jax.jit(
            make_convnet_train_step(mesh, fe, n_classes=N_CLASSES, lr=5e-2)
        )
        for _ in range(3):
            params, loss_before = step(params, yd, ld)

        path = str(tmp_path / "resume")
        save_checkpoint(path, {"params": params, "step": 3})
        restored = restore_checkpoint(path, target={"params": params, "step": 3})
        params2 = restored["params"]
        for _ in range(3):
            params2, loss_after = step(params2, yd, ld)
        assert float(loss_after) < float(loss_before), (
            float(loss_before), float(loss_after),
        )
