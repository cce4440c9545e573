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
