"""PCEN tests vs an independent scipy-composed float64 oracle.

The oracle composes only third-party pieces (scipy.signal.lfilter for the
one-pole smoother, numpy for the compression law), transliterating the
published PCEN definition (Wang et al. 2017) with librosa's
stabilizations (log1p/expm1 forms, lfilter_zi initialization).
"""

import numpy as np
import pytest
import scipy.ndimage
import scipy.signal

from mlx_audio_primitives_tpu import melspectrogram, pcen

SR = 22050
HOP = 512


def _oracle_pcen(S, sr=SR, hop_length=HOP, gain=0.98, bias=2.0, power=0.5,
                 time_constant=0.4, eps=1e-6, b=None, max_size=1, zi=None):
    S = np.asarray(S, dtype=np.float64)
    if b is None:
        t = time_constant * sr / float(hop_length)
        b = (np.sqrt(1 + 4 * t * t) - 1) / (2 * t * t)
    ref = S
    if max_size > 1:
        ref = scipy.ndimage.maximum_filter1d(S, max_size, axis=-2,
                                             mode="nearest")
    if zi is None:
        zi_full = (
            scipy.signal.lfilter_zi([b], [1, b - 1])[..., 0]
            * ref[..., 0:1]
        )
    else:
        zi_full = np.asarray(zi, np.float64)[..., None]
    M, zf = scipy.signal.lfilter([b], [1, b - 1], ref, axis=-1, zi=zi_full)
    smooth = (eps + M) ** (-gain)
    if power == 0:
        out = np.log1p(S * smooth)
    elif bias == 0:
        with np.errstate(divide="ignore"):
            out = np.exp(power * (np.log(S) + np.log(smooth)))
    else:
        out = (bias**power) * np.expm1(power * np.log1p(S * smooth / bias))
    return out, zf[..., 0]


@pytest.fixture(scope="module")
def melspec():
    rng = np.random.default_rng(0)
    y = rng.standard_normal(2 * SR).astype(np.float32)
    return np.asarray(melspectrogram(y, sr=SR, n_mels=64))


class TestPcenOracle:
    def test_defaults_match(self, melspec):
        ours = np.asarray(pcen(melspec))
        ref, _ = _oracle_pcen(melspec)
        np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)

    @pytest.mark.parametrize(
        "kw",
        [
            dict(gain=0.8, bias=10.0, power=0.25),
            dict(power=0.0),
            dict(bias=0.0),
            dict(b=0.2),
            dict(time_constant=0.06),
            dict(max_size=3),
            # even size: scipy's origin-0 window is LEFT-biased
            dict(max_size=4),
        ],
    )
    def test_variants_match(self, melspec, kw):
        ours = np.asarray(pcen(melspec, **kw))
        ref, _ = _oracle_pcen(melspec, **kw)
        np.testing.assert_allclose(ours, ref, atol=3e-5, rtol=2e-4)

    def test_batched(self, melspec):
        S3 = np.stack([melspec, 2.0 * melspec])
        ours = np.asarray(pcen(S3))
        ref, _ = _oracle_pcen(S3)
        assert ours.shape == S3.shape
        np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)

    def test_streaming_chunks_equal_offline(self, melspec):
        offline = np.asarray(pcen(melspec))
        mid = melspec.shape[-1] // 3
        c1, zf = pcen(melspec[..., :mid], return_zf=True)
        c2 = pcen(melspec[..., mid:], zi=np.asarray(zf))
        np.testing.assert_allclose(
            np.concatenate([np.asarray(c1), np.asarray(c2)], axis=-1),
            offline, atol=1e-5, rtol=1e-5,
        )
        # and the state convention is scipy's
        _, zf_ref = _oracle_pcen(melspec[..., :mid])
        np.testing.assert_allclose(np.asarray(zf), zf_ref, atol=1e-5,
                                   rtol=1e-4)


class TestPcenPhysics:
    def test_gain_normalizes_level(self):
        # PCEN's point: a 20 dB level difference mostly cancels
        rng = np.random.default_rng(1)
        S = rng.uniform(0.1, 1.0, (64, 200)).astype(np.float32)
        a = np.asarray(pcen(S))
        b = np.asarray(pcen(100.0 * S))
        # steady-state outputs are close despite the 100x input gap
        np.testing.assert_allclose(
            a[:, 50:].mean(), b[:, 50:].mean(), rtol=0.12
        )

    def test_nonnegative_and_finite(self, melspec):
        out = np.asarray(pcen(melspec))
        assert np.all(np.isfinite(out)) and np.all(out >= 0)

    def test_errors(self, melspec):
        with pytest.raises(ValueError):
            pcen(melspec, gain=-1)
        with pytest.raises(ValueError):
            pcen(melspec, eps=0.0)
        with pytest.raises(ValueError):
            pcen(melspec, b=1.5)
        with pytest.raises(ValueError):
            pcen(melspec, max_size=1000)
        with pytest.raises(ValueError):
            pcen(np.ones(5, np.float32))


class TestPcenGrad:
    def test_grad_flows(self, melspec):
        """PCEN's reason to exist is trainable frontends — the whole chain
        (incl. the associative-scan smoother) must be differentiable."""
        import jax
        import jax.numpy as jnp

        S = jnp.asarray(melspec)
        g = jax.grad(lambda s: jnp.sum(pcen(s)))(S)
        assert g.shape == S.shape
        assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.abs(g).max()) > 0

    def test_grad_matches_finite_difference(self):
        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        S = jnp.asarray(rng.uniform(0.5, 1.0, (4, 6)).astype(np.float32))
        f = lambda s: jnp.sum(pcen(s) ** 2)
        g = np.asarray(jax.grad(f)(S))
        eps = 1e-3
        for idx in [(0, 0), (2, 3), (3, 5)]:
            e = np.zeros(S.shape, np.float32)
            e[idx] = eps
            fd = (float(f(S + e)) - float(f(S - e))) / (2 * eps)
            np.testing.assert_allclose(g[idx], fd, rtol=5e-2, atol=1e-4)
