"""Model presets and vmap compatibility (no mesh/device requirements)."""

import numpy as np


class TestModelPresets:
    def test_all_presets_run(self):
        import numpy as np

        from mlx_audio_primitives_tpu.models import PRESETS

        for name, make in PRESETS.items():
            fe = make()
            y = np.random.default_rng(0).standard_normal(
                (2, fe.sr)
            ).astype(np.float32)
            out = np.asarray(fe(y))
            assert out.shape[0] == 2 and out.shape[1] == fe.n_mels, name
            assert np.isfinite(out).all(), name

    def test_whisper_nonpow2_nfft(self):
        import numpy as np

        from mlx_audio_primitives_tpu.models import whisper_logmel

        fe = whisper_logmel()
        assert fe.n_fft == 400  # rides the DFT-GEMM dispatch
        out = np.asarray(fe(np.zeros((1, 16000), np.float32)))
        assert out.shape[1] == 80


class TestVmapCompat:
    def test_vmap_over_melspectrogram(self):
        """jax.vmap over the 1-D op equals native batching."""
        import numpy as np

        import jax

        from mlx_audio_primitives_tpu import melspectrogram

        y = np.random.default_rng(0).standard_normal((3, 8192)).astype(np.float32)
        native = np.asarray(melspectrogram(y, n_fft=512, hop_length=128, n_mels=32))
        vmapped = np.asarray(
            jax.vmap(
                lambda yy: melspectrogram(yy, n_fft=512, hop_length=128, n_mels=32)
            )(y)
        )
        np.testing.assert_allclose(vmapped, native, rtol=1e-4, atol=1e-4)


class TestTrainableLogMelFrontend:
    """Learnable filterbank: gradients flow through the fused mel kernel's
    custom_vjp (or the XLA fallback path identically)."""

    def _setup(self):
        import jax.numpy as jnp

        from mlx_audio_primitives_tpu.models import TrainableLogMelFrontend

        fe = TrainableLogMelFrontend(n_fft=1024, hop_length=256, n_mels=32)
        params = fe.init_params()
        rng = np.random.default_rng(0)
        y = jnp.asarray(rng.standard_normal((2, 8192)).astype(np.float32))
        return fe, params, y

    def test_forward_matches_melspectrogram(self):
        import jax.numpy as jnp

        from mlx_audio_primitives_tpu import melspectrogram, power_to_db

        fe, params, y = self._setup()
        out = fe.apply(params, y)
        ref = power_to_db(
            melspectrogram(y, n_fft=1024, hop_length=256, n_mels=32),
            top_db=None,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-4
        )

    def test_filterbank_gradient_flows(self):
        import jax
        import jax.numpy as jnp

        fe, params, y = self._setup()

        def loss(p):
            return jnp.mean(fe.apply(p, y) ** 2)

        g = jax.grad(loss)(params)["fb_t"]
        g = np.asarray(g)
        assert g.shape == (513, 32)
        assert np.all(np.isfinite(g))
        assert np.abs(g).max() > 0.0

    def test_one_sgd_step_reduces_loss(self):
        import jax
        import jax.numpy as jnp

        fe, params, y = self._setup()
        target = jnp.zeros_like(fe.apply(params, y)) - 30.0

        # tiny lr: dB-space gradients are ill-conditioned near the amin
        # clamp (d log10 / dx ~ 1/x), so larger steps overshoot
        @jax.jit
        def step(p):
            def loss(p):
                return jnp.mean((fe.apply(p, y) - target) ** 2)

            l, g = jax.value_and_grad(loss)(p)
            return jax.tree.map(lambda a, b: a - 1e-8 * b, p, g), l

        p1, l0 = step(params)
        _, l1 = step(p1)
        assert float(l1) < float(l0)

    def test_non_f32_input_is_cast(self):
        """int16 PCM (the most common raw-audio dtype) must not reach the
        Pallas kernel uncast — it goes through the same float32 promotion
        as every other public op."""
        fe, params, _ = self._setup()
        rng = np.random.default_rng(1)
        pcm = (rng.standard_normal((2, 8192)) * 8192).astype(np.int16)
        out = fe.apply(params, pcm)
        assert np.asarray(out).dtype == np.float32
        ref = fe.apply(params, pcm.astype(np.float32))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_3d_input_rejected(self):
        fe, params, _ = self._setup()
        with np.testing.assert_raises(ValueError):
            fe.apply(params, np.zeros((2, 2, 8192), np.float32))

    def test_use_pallas_kwarg_forces_kernel_branch(self):
        """use_pallas=True runs the fused-kernel branch even off-TPU
        (interpret mode), matching every other kernel-backed public op."""
        fe, params, y = self._setup()
        out_kernel = fe.apply(params, y, use_pallas=True)
        out_xla = fe.apply(params, y, use_pallas=False)
        np.testing.assert_allclose(
            np.asarray(out_kernel), np.asarray(out_xla), atol=2e-4
        )

    def test_wide_filterbank_falls_back_to_xla(self):
        """params whose filterbank width exceeds the kernel's VMEM budget
        must dispatch to the XLA path, not raise — the gate reads the
        actual fb width, not the constructor's n_mels."""
        import jax.numpy as jnp

        from mlx_audio_primitives_tpu.kernels.mel_fused import radix_supported

        fe, params, y = self._setup()
        wide = 4096
        assert not radix_supported(fe.n_fft, fe.hop_length, wide)
        rng = np.random.default_rng(2)
        params_wide = {
            "fb_t": jnp.asarray(
                np.abs(rng.standard_normal((513, wide))).astype(np.float32)
            )
        }
        out = fe.apply(params_wide, y)  # must not raise
        assert out.shape[0] == 2 and out.shape[1] == wide


class TestVmapDispatchGate:
    def test_is_batch_traced_detector(self):
        """The fused-kernel gates must see through vmap: Pallas rejects the
        batching rule's block shapes, so vmapped calls take the XLA path
        (verified equal to native batching at 3e-7 on the real chip)."""
        import jax
        import jax.numpy as jnp

        from mlx_audio_primitives_tpu.utils.dispatch import is_batch_traced

        seen = []

        def probe(x):
            seen.append(is_batch_traced(x))
            return x * 2.0

        jax.vmap(probe)(jnp.ones((2, 4)))
        assert seen == [True]
        assert not is_batch_traced(jnp.ones((2, 4)))
        assert not is_batch_traced(np.ones(3))

    def test_vmap_over_pitch(self, sine_signal):
        import jax

        from mlx_audio_primitives_tpu import pitch_detect_acf

        y = np.stack([sine_signal, sine_signal])
        f0v = jax.vmap(lambda yy: pitch_detect_acf(yy, sr=22050)[0])(
            np.asarray(y)
        )
        f0n, _ = pitch_detect_acf(y, sr=22050)
        np.testing.assert_allclose(np.asarray(f0v), np.asarray(f0n))


class TestTrainablePCENFrontend:
    def test_init_matches_published_pcen(self):
        """At init the learnable frontend equals ops.pcen with defaults."""
        from mlx_audio_primitives_tpu import melspectrogram, pcen
        from mlx_audio_primitives_tpu.models.pipelines import (
            TrainablePCENFrontend,
        )

        fe = TrainablePCENFrontend(sr=22050, n_fft=512, hop_length=128,
                                   n_mels=32)
        params = fe.init_params()
        rng = np.random.default_rng(0)
        y = rng.standard_normal((2, 4096)).astype(np.float32)
        ours = np.asarray(fe.apply(params, y))
        M = melspectrogram(y, sr=22050, n_fft=512, hop_length=128, n_mels=32)
        ref = np.asarray(pcen(np.asarray(M), sr=22050, hop_length=128))
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-3)

    def test_all_parameters_receive_gradients(self):
        import jax
        import jax.numpy as jnp

        from mlx_audio_primitives_tpu.models.pipelines import (
            TrainablePCENFrontend,
        )

        fe = TrainablePCENFrontend(sr=22050, n_fft=512, hop_length=128,
                                   n_mels=32)
        params = fe.init_params()
        rng = np.random.default_rng(1)
        y = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
        g = jax.grad(lambda p: jnp.sum(fe.apply(p, y) ** 2))(params)
        for name, leaf in g.items():
            assert bool(jnp.all(jnp.isfinite(leaf))), name
            assert float(jnp.abs(leaf).max()) > 0, name

    def test_training_reduces_loss(self):
        """Two-class toy task: SGD through the full frontend descends."""
        import jax
        import jax.numpy as jnp

        from mlx_audio_primitives_tpu.models.pipelines import (
            TrainablePCENFrontend,
        )

        fe = TrainablePCENFrontend(sr=22050, n_fft=512, hop_length=128,
                                   n_mels=16)
        params = fe.init_params()
        w = jnp.zeros((16, 2))
        params["head"] = w
        rng = np.random.default_rng(2)
        t = np.arange(4096) / 22050
        y0 = np.stack([np.sin(2 * np.pi * 300 * t),
                       np.sin(2 * np.pi * 3000 * t)]).astype(np.float32)
        y0 += 0.05 * rng.standard_normal(y0.shape).astype(np.float32)
        labels = jnp.asarray([0, 1])

        def loss_fn(p):
            feats = fe.apply(
                {k: v for k, v in p.items() if k != "head"}, y0
            ).mean(axis=-1)  # (B, n_mels)
            logits = feats @ p["head"]
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(logp[jnp.arange(2), labels])

        @jax.jit
        def step(p):
            l, g = jax.value_and_grad(loss_fn)(p)
            return jax.tree.map(lambda a, b: a - 0.05 * b, p, g), l

        losses = []
        for _ in range(12):
            params, l = step(params)
            losses.append(float(l))
        assert losses[-1] < losses[0]
        assert np.isfinite(losses).all()
