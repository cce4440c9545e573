"""Multi-chip sharding tests on the 8-virtual-device CPU mesh.

The reference has no distributed tests (nothing distributed exists,
SURVEY.md §2.3); these validate the TPU-native extension: batch (data)
sharding and time-axis (sequence-parallel) sharding with halo exchange.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_primitives_tpu import melspectrogram, power_to_db, stft
from mlx_audio_primitives_tpu.models import (
    init_classifier_params,
    make_sharded_train_step,
)
from mlx_audio_primitives_tpu.parallel import (
    batch_time_sharding,
    istft_time_sharded,
    logmel_time_sharded,
    make_mesh,
    shard_batch,
    stft_time_sharded,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

N_FFT, HOP = 256, 64


@pytest.fixture(scope="module")
def mesh24():
    return make_mesh(n_data=2, n_time=4)


@pytest.fixture(scope="module")
def signal():
    rng = np.random.default_rng(0)
    return rng.standard_normal((4, 4 * 8 * N_FFT)).astype(np.float32)


class TestBatchSharding:
    def test_melspectrogram_batch_sharded_matches(self, signal):
        mesh = make_mesh(n_data=8, n_time=1)
        ys = shard_batch(jnp.asarray(signal[:2].repeat(4, axis=0)), mesh)
        out = melspectrogram(ys, n_fft=N_FFT, hop_length=HOP, n_mels=32)
        ref = melspectrogram(signal[:2].repeat(4, axis=0), n_fft=N_FFT,
                             hop_length=HOP, n_mels=32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)

    def test_output_is_sharded(self, signal):
        mesh = make_mesh(n_data=8, n_time=1)
        ys = shard_batch(jnp.asarray(signal[:2].repeat(4, axis=0)), mesh)
        out = melspectrogram(ys, n_fft=N_FFT, hop_length=HOP, n_mels=32)
        assert len(out.sharding.device_set) == 8


class TestTimeSharding:
    def test_stft_matches_unsharded(self, mesh24, signal):
        ys = jax.device_put(jnp.asarray(signal), batch_time_sharding(mesh24))
        out = np.asarray(stft_time_sharded(ys, mesh24, n_fft=N_FFT, hop_length=HOP))
        # equivalent single-device computation: center=False on zero-padded y
        L = signal.shape[1]
        ypad = np.pad(signal, ((0, 0), (0, N_FFT - HOP)))
        ref = np.asarray(
            stft(ypad, n_fft=N_FFT, hop_length=HOP, center=False)
        ).swapaxes(1, 2)  # (B, F, bins)
        assert out.shape == (4, L // HOP, N_FFT // 2 + 1)
        np.testing.assert_allclose(out, ref[:, : out.shape[1]], atol=2e-4)

    def test_istft_roundtrip(self, mesh24, signal):
        ys = jax.device_put(jnp.asarray(signal), batch_time_sharding(mesh24))
        S = stft_time_sharded(ys, mesh24, n_fft=N_FFT, hop_length=HOP)
        y_rec = np.asarray(
            istft_time_sharded(S, mesh24, n_fft=N_FFT, hop_length=HOP)
        )
        # interior reconstructs exactly; the first n_fft-hop samples have
        # partial window coverage (no left context), as with center=False
        inner = slice(N_FFT, signal.shape[1] - N_FFT)
        np.testing.assert_allclose(
            y_rec[:, inner], signal[:, inner], atol=1e-4
        )

    def test_logmel_matches_unsharded(self, mesh24, signal):
        ys = jax.device_put(jnp.asarray(signal), batch_time_sharding(mesh24))
        out = np.asarray(
            logmel_time_sharded(ys, mesh24, n_fft=N_FFT, hop_length=HOP, n_mels=32)
        )
        ypad = np.pad(signal, ((0, 0), (0, N_FFT - HOP)))
        mel = melspectrogram(ypad, n_fft=N_FFT, hop_length=HOP, n_mels=32,
                             center=False)
        ref = np.asarray(power_to_db(mel, top_db=None)).swapaxes(1, 2)
        np.testing.assert_allclose(out, ref[:, : out.shape[1]], atol=2e-3)

    def test_validation(self, mesh24, signal):
        with pytest.raises(ValueError):
            stft_time_sharded(signal[:, :1000], mesh24, n_fft=N_FFT)  # not divisible


class TestCenteredTimeSharding:
    """center=True drop-in equality vs the single-device ops (full array,
    librosa defaults, arbitrary length)."""

    # 10007 is prime: no shard-divisibility structure at all
    LENGTHS = [10007, 4 * 8 * N_FFT]

    @pytest.mark.parametrize("L", LENGTHS)
    @pytest.mark.parametrize("fft_mode", ["matmul", "fft", "pallas"])
    def test_stft_equals_single_device(self, mesh24, L, fft_mode):
        # at N_FFT=256/HOP=64 the radix gates fail, so fft_mode="pallas"
        # exercises the graceful fallback to the XLA FFT branch
        rng = np.random.default_rng(7)
        y = rng.standard_normal((4, L)).astype(np.float32)
        out = np.asarray(
            stft_time_sharded(y, mesh24, n_fft=N_FFT, hop_length=HOP,
                              center=True, fft_mode=fft_mode)
        )
        ref = np.asarray(
            stft(y, n_fft=N_FFT, hop_length=HOP, center=True)
        ).swapaxes(1, 2)
        assert out.shape == ref.shape == (4, 1 + L // HOP, N_FFT // 2 + 1)
        np.testing.assert_allclose(out, ref, atol=2e-4)

    def test_stft_win_length_and_pad_mode(self, mesh24):
        rng = np.random.default_rng(8)
        y = rng.standard_normal((2, 6000)).astype(np.float32)
        kw = dict(n_fft=N_FFT, hop_length=HOP, win_length=160,
                  window="hamming", center=True, pad_mode="reflect")
        out = np.asarray(stft_time_sharded(y, mesh24, **kw))
        ref = np.asarray(stft(y, **kw)).swapaxes(1, 2)
        np.testing.assert_allclose(out, ref, atol=2e-4)

    @pytest.mark.parametrize("fft_mode", ["matmul", "fft", "pallas"])
    def test_istft_equals_single_device(self, mesh24, fft_mode):
        from mlx_audio_primitives_tpu import istft

        rng = np.random.default_rng(9)
        L = 10007
        y = rng.standard_normal((2, L)).astype(np.float32)
        S = stft(y, n_fft=N_FFT, hop_length=HOP, center=True)
        rec = np.asarray(
            istft_time_sharded(
                jnp.swapaxes(jnp.asarray(S), 1, 2), mesh24, n_fft=N_FFT,
                hop_length=HOP, center=True, length=L, fft_mode=fft_mode,
            )
        )
        ref = np.asarray(
            istft(S, n_fft=N_FFT, hop_length=HOP, center=True, length=L)
        )
        assert rec.shape == ref.shape == (2, L)
        # full-array equality vs the single-device op, edges included
        np.testing.assert_allclose(rec, ref, atol=1e-4)
        # and a true round-trip back to the input
        np.testing.assert_allclose(rec, y, atol=1e-3)

    @pytest.mark.parametrize("length", [1000, 5000])
    def test_istft_length_respected_uncentered(self, mesh24, length):
        # regression: `length` used to be silently dropped when center=False
        rng = np.random.default_rng(11)
        L = 4096
        y = rng.standard_normal((2, L)).astype(np.float32)
        S = stft_time_sharded(y, mesh24, n_fft=N_FFT, hop_length=HOP,
                              center=False)
        rec = np.asarray(
            istft_time_sharded(S, mesh24, n_fft=N_FFT, hop_length=HOP,
                               center=False, length=length)
        )
        assert rec.shape == (2, length)
        if length > L:
            # the pad tail must be zeros
            assert np.abs(rec[:, L:]).max() == 0.0

    def test_logmel_equals_single_device(self, mesh24):
        rng = np.random.default_rng(10)
        y = rng.standard_normal((2, 9001)).astype(np.float32)
        out = np.asarray(
            logmel_time_sharded(y, mesh24, n_fft=N_FFT, hop_length=HOP,
                                n_mels=32, center=True)
        )
        mel = melspectrogram(y, n_fft=N_FFT, hop_length=HOP, n_mels=32,
                             center=True)
        ref = np.asarray(power_to_db(mel, top_db=None)).swapaxes(1, 2)
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=2e-3)


class TestShardedPallasKernels:
    """fft_mode='pallas': the fused radix kernels dispatch INSIDE the
    shard_map bodies (one kernel per shard, interpret mode on CPU). Uses a
    radix-supported shape (1024/256) so the kernels genuinely engage."""

    NF, H = 1024, 256

    def test_stft_pallas_sharded_equals_single_device(self, mesh24):
        rng = np.random.default_rng(21)
        y = rng.standard_normal((2, 9001)).astype(np.float32)
        out = np.asarray(
            stft_time_sharded(y, mesh24, n_fft=self.NF, hop_length=self.H,
                              center=True, fft_mode="pallas")
        )
        ref = np.asarray(
            stft(y, n_fft=self.NF, hop_length=self.H, center=True)
        ).swapaxes(1, 2)
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=2e-4)

    def test_istft_pallas_sharded_roundtrip(self, mesh24):
        rng = np.random.default_rng(22)
        L = 9001
        y = rng.standard_normal((2, L)).astype(np.float32)
        S = stft(y, n_fft=self.NF, hop_length=self.H, center=True)
        rec = np.asarray(
            istft_time_sharded(
                jnp.swapaxes(jnp.asarray(S), 1, 2), mesh24, n_fft=self.NF,
                hop_length=self.H, center=True, length=L, fft_mode="pallas",
            )
        )
        np.testing.assert_allclose(rec, y, atol=1e-3)

    def test_logmel_pallas_sharded_matches_fft_mode(self, mesh24):
        rng = np.random.default_rng(23)
        y = rng.standard_normal((2, 9001)).astype(np.float32)
        a = np.asarray(
            logmel_time_sharded(y, mesh24, n_fft=self.NF, hop_length=self.H,
                                n_mels=32, center=True, fft_mode="pallas")
        )
        b = np.asarray(
            logmel_time_sharded(y, mesh24, n_fft=self.NF, hop_length=self.H,
                                n_mels=32, center=True, fft_mode="fft")
        )
        np.testing.assert_allclose(a, b, atol=1e-4 * max(1.0, np.abs(b).max()))

    def test_invalid_fft_mode_rejected(self, mesh24):
        y = np.zeros((2, 4096), np.float32)
        with pytest.raises(ValueError, match="fft_mode"):
            stft_time_sharded(y, mesh24, n_fft=self.NF, hop_length=self.H,
                              center=True, fft_mode="bogus")


class TestTrainStep:
    def test_loss_decreases(self, mesh24, signal):
        n_mels, n_classes = 32, 5
        rng = np.random.default_rng(1)
        labels = jnp.asarray(rng.integers(0, n_classes, size=(4,)).astype(np.int32))
        ys = jax.device_put(jnp.asarray(signal), batch_time_sharding(mesh24))
        params = init_classifier_params(n_mels, n_classes)
        step = jax.jit(
            make_sharded_train_step(
                mesh24, n_fft=N_FFT, hop_length=HOP, n_mels=n_mels,
                n_classes=n_classes, lr=0.05,
            )
        )
        losses = []
        for _ in range(5):
            params, loss = step(params, ys, labels)
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        assert all(np.isfinite(losses))

    def test_sharded_grads_match_single_device(self, mesh24, signal):
        """Regression: jax 0.9's vma tracking makes in-body `grad` of a
        replicated param return the cross-device SUM, silently scaling the
        step by the mesh size (descent tests can't catch a scaled gradient).
        The sharded step must equal the explicit single-device SGD step."""
        n_mels, n_classes = 32, 5
        rng = np.random.default_rng(4)
        labels = jnp.asarray(rng.integers(0, n_classes, size=(4,)).astype(np.int32))
        ys = jax.device_put(jnp.asarray(signal), batch_time_sharding(mesh24))
        params = init_classifier_params(n_mels, n_classes)
        lr = 0.05
        step = jax.jit(
            make_sharded_train_step(
                mesh24, n_fft=N_FFT, hop_length=HOP, n_mels=n_mels,
                n_classes=n_classes, lr=lr,
            )
        )
        new_params, loss = step(params, ys, labels)

        feats = jnp.asarray(
            np.asarray(
                logmel_time_sharded(
                    jnp.asarray(signal), mesh24, n_fft=N_FFT, hop_length=HOP,
                    n_mels=n_mels,
                )
            )
        )  # (B, F, n_mels), identical values, unsharded

        def loss_fn(p):
            pooled = jnp.mean(feats, axis=1)
            logits = pooled @ p["w"] + p["b"]
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(
                jnp.take_along_axis(logp, labels[:, None], axis=-1)
            )

        loss_ref, grads = jax.value_and_grad(loss_fn)(params)
        ref_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(new_params[k]), np.asarray(ref_params[k]),
                rtol=1e-4, atol=1e-6, err_msg=k,
            )

    def test_pallas_frontend_trains_identically(self, mesh24):
        # the fused mel kernel as the per-shard frontend (fft_mode='pallas',
        # radix-supported shape): the whole 5-step training trajectory must
        # match the XLA-FFT frontend branch (features agree to fp32 noise,
        # so the identical-seed trajectories coincide)
        n_fft, hop, n_mels, n_classes = 1024, 256, 32, 5
        L = 4 * 8 * n_fft
        rng = np.random.default_rng(2)
        y = jnp.asarray(rng.standard_normal((4, L)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, n_classes, size=(4,)).astype(np.int32))
        ys = jax.device_put(y, batch_time_sharding(mesh24))
        trajectories = {}
        for mode in ("fft", "pallas"):
            params = init_classifier_params(n_mels, n_classes)
            step = jax.jit(
                make_sharded_train_step(
                    mesh24, n_fft=n_fft, hop_length=hop, n_mels=n_mels,
                    n_classes=n_classes, lr=0.005, fft_mode=mode,
                )
            )
            losses = []
            for _ in range(5):
                params, loss = step(params, ys, labels)
                losses.append(float(loss))
            assert all(np.isfinite(losses)), (mode, losses)
            trajectories[mode] = losses
        np.testing.assert_allclose(
            trajectories["pallas"], trajectories["fft"], rtol=1e-4
        )


class TestDataParallelHelper:
    def test_data_parallel_wraps_and_matches(self):
        import numpy as np

        from mlx_audio_primitives_tpu import melspectrogram
        from mlx_audio_primitives_tpu.parallel import data_parallel, make_mesh

        mesh = make_mesh(n_data=8, n_time=1)
        fn = data_parallel(
            lambda y: melspectrogram(y, n_fft=256, hop_length=64, n_mels=16),
            mesh,
        )
        y = np.random.default_rng(0).standard_normal((8, 2048)).astype(np.float32)
        out = fn(y)
        ref = melspectrogram(y, n_fft=256, hop_length=64, n_mels=16)
        assert len(out.sharding.device_set) == 8
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)

    def test_data_parallel_rejects_batched_kwarg(self):
        # a batched array via kwarg would be closed over UN-sharded (each
        # shard would see the full batch) — must be rejected, not corrupted
        import numpy as np

        from mlx_audio_primitives_tpu.parallel import data_parallel, make_mesh

        mesh = make_mesh(n_data=8, n_time=1)
        fn = data_parallel(lambda y, gain=None: y * gain, mesh)
        y = np.ones((8, 4), np.float32)
        with pytest.raises(TypeError, match="looks batched"):
            fn(y, gain=np.arange(8, dtype=np.float32).reshape(8, 1))
        # non-batched kwarg arrays are fine (replicated)
        out = fn(y, gain=np.float32(2.0))
        assert np.asarray(out).max() == 2.0

    def test_data_parallel_griffinlim_grouped_loop(self):
        # the entire group-layout Griffin-Lim fori_loop (fused STFT + fused
        # ISTFT per iteration) runs per shard inside data_parallel
        import numpy as np

        from mlx_audio_primitives_tpu import griffinlim, stft
        from mlx_audio_primitives_tpu.parallel import data_parallel, make_mesh

        mesh = make_mesh(n_data=8, n_time=1)
        rng = np.random.default_rng(5)
        y = rng.standard_normal((8, 8192)).astype(np.float32)
        S = np.abs(np.asarray(stft(y, n_fft=1024, hop_length=256)))
        fn = data_parallel(
            lambda s: griffinlim(s, n_iter=2, hop_length=256, init="zeros",
                                 use_pallas=True), mesh)
        out = np.asarray(fn(S))
        ref = np.asarray(griffinlim(S, n_iter=2, hop_length=256,
                                    init="zeros", use_pallas=False))
        assert out.shape == ref.shape
        # the grouped loop runs 3-pass bf16-split GEMMs by default
        # (_config.ANALYSIS_FAST_GEMM) — ~2.7e-5 spectral noise per fused
        # transform, amplified through the phase projections
        np.testing.assert_allclose(out, ref, atol=5e-3)

    def test_data_parallel_with_fused_kernel(self):
        # the fused mel kernel (radix-supported shape, forced on) runs as a
        # per-shard device-local kernel inside data_parallel's shard_map
        import numpy as np

        from mlx_audio_primitives_tpu import melspectrogram
        from mlx_audio_primitives_tpu.parallel import data_parallel, make_mesh

        mesh = make_mesh(n_data=8, n_time=1)
        fn = data_parallel(
            lambda y: melspectrogram(y, n_fft=1024, hop_length=256,
                                     n_mels=32, use_pallas=True),
            mesh,
        )
        y = np.random.default_rng(1).standard_normal((8, 8192)).astype(np.float32)
        out = fn(y)
        ref = melspectrogram(y, n_fft=1024, hop_length=256, n_mels=32,
                             use_pallas=False)
        assert len(out.sharding.device_set) == 8
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref),
            rtol=1e-4, atol=1e-4 * float(np.abs(np.asarray(ref)).max()),
        )
