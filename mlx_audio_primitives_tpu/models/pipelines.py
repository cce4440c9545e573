"""Flagship composed pipelines.

The reference has no model zoo — its "models" are the composed DSP pipelines
(melspectrogram -> dB -> MFCC, SURVEY.md §3.3). This module packages those as
reusable callables with pre-resolved tables (window / filterbank / DFT basis)
so repeated calls hit one cached XLA executable, plus a multi-chip training
step around the log-mel frontend used to validate dp x sp sharding.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .._config import MATMUL_PRECISION
from ..ops.convert import power_to_db
from ..ops.mel import melspectrogram
from ..ops.mfcc import mfcc
from ..parallel.mesh import DATA_AXIS, TIME_AXIS
from ..parallel.time_shard import logmel_time_sharded

ArrayLike = Any


class LogMelFrontend:
    """Batched log-mel feature extractor (the library's flagship pipeline).

    ``(batch, samples) -> (batch, n_mels, n_frames)`` in dB. One fused jit:
    frame -> window -> rDFT GEMM -> power -> mel GEMM -> log.

    ``top_db`` defaults to None: the dB dynamic-range clamp is relative to
    the GLOBAL array max (librosa semantics), so enabling it makes a batch
    item's features depend on its batch-mates — undesirable for a training
    frontend. Set it explicitly for librosa-style per-call clipping.
    """

    def __init__(
        self,
        sr: int = 22050,
        n_fft: int = 2048,
        hop_length: int = 512,
        win_length: int | None = None,
        n_mels: int = 128,
        fmin: float = 0.0,
        fmax: float | None = None,
        htk: bool = False,
        norm: str | None = "slaney",
        top_db: float | None = None,
    ):
        self.sr, self.n_fft, self.hop_length = sr, n_fft, hop_length
        self.win_length = win_length
        self.n_mels, self.fmin, self.fmax = n_mels, fmin, fmax
        self.htk, self.norm = htk, norm
        self.top_db = top_db

    def __call__(self, y: ArrayLike) -> jax.Array:
        mel = melspectrogram(
            y,
            sr=self.sr,
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            win_length=self.win_length,
            n_mels=self.n_mels,
            fmin=self.fmin,
            fmax=self.fmax,
            htk=self.htk,
            norm=self.norm,
        )
        return power_to_db(mel, top_db=self.top_db)


class MFCCPipeline:
    """Batched MFCC extractor: mel -> dB -> DCT-II -> liftering."""

    def __init__(
        self,
        sr: int = 22050,
        n_mfcc: int = 13,
        n_fft: int = 2048,
        hop_length: int = 512,
        n_mels: int = 128,
        lifter: int = 0,
    ):
        self.sr, self.n_mfcc = sr, n_mfcc
        self.n_fft, self.hop_length = n_fft, hop_length
        self.n_mels, self.lifter = n_mels, lifter

    def __call__(self, y: ArrayLike) -> jax.Array:
        return mfcc(
            y,
            sr=self.sr,
            n_mfcc=self.n_mfcc,
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            n_mels=self.n_mels,
            lifter=self.lifter,
        )


class TrainableLogMelFrontend:
    """Log-mel frontend with a LEARNABLE filterbank.

    Gradients flow through the fused Pallas mel kernel — its
    XLA-composition VJP (`kernels/mel_fused.py::_mel_vjp_fn`) computes the
    cotangent with respect to the filterbank argument, so the filterbank can
    be trained end-to-end like any other parameter (a common production
    pattern: initialize at the mel bank, let the task reshape it).

    ``init_params()`` returns ``{"fb_t": (n_bins, n_mels)}`` initialized to
    the slaney mel bank; ``apply(params, y)`` returns ``(B, n_mels, F)`` dB
    features, differentiable in both ``params`` and ``y``.
    """

    def __init__(
        self,
        sr: int = 22050,
        n_fft: int = 2048,
        hop_length: int = 512,
        n_mels: int = 128,
        window: str = "hann",
    ):
        self.sr, self.n_fft, self.hop_length = sr, n_fft, hop_length
        self.n_mels = n_mels
        from ..ops.stft import _get_padded_window

        self.win = _get_padded_window(window, n_fft, n_fft)

    def init_params(self) -> dict[str, jax.Array]:
        from ..ops.mel import mel_filterbank

        fb = mel_filterbank(self.sr, self.n_fft, n_mels=self.n_mels)
        return {"fb_t": jnp.asarray(fb).T}

    def apply(
        self, params: dict, y: ArrayLike, use_pallas: bool | None = None,
        db: bool = True,
    ) -> jax.Array:
        from ..kernels.mel_fused import (
            melspectrogram_pallas,
            melspectrogram_xla,
            radix_supported,
        )
        from .._config import REAL_DTYPE
        from ..ops.stft import _as_batched
        from ..utils import dispatch

        y, input_is_1d = _as_batched(y, self.n_fft, True)
        # gate on the ACTUAL filterbank width: trained params may not match
        # the constructor's n_mels, and the kernel's VMEM budget depends on it
        fb_t = jnp.asarray(params["fb_t"], dtype=REAL_DTYPE)
        if (
            dispatch.resolve_use_pallas(use_pallas, default_on_tpu=True)
            and not dispatch.is_batch_traced(y, fb_t)
            and radix_supported(self.n_fft, self.hop_length, fb_t.shape[1])
        ):
            mel = melspectrogram_pallas(
                y, self.win, fb_t, n_fft=self.n_fft,
                hop_length=self.hop_length, center=True, pad_mode="constant",
            )
        else:
            mel = melspectrogram_xla(
                y, self.win, fb_t, n_fft=self.n_fft,
                hop_length=self.hop_length, center=True, pad_mode="constant",
            )
        out = power_to_db(mel, top_db=None) if db else mel
        return out[0] if input_is_1d else out


# ---------------------------------------------------------------------------
# Multi-chip training step (dp over 'data', sp over 'time')


def init_classifier_params(
    n_mels: int, n_classes: int, seed: int = 0
) -> dict[str, jax.Array]:
    rng = np.random.default_rng(seed)
    return {
        "w": jnp.asarray(
            (rng.standard_normal((n_mels, n_classes)) / np.sqrt(n_mels)).astype(
                np.float32
            )
        ),
        "b": jnp.zeros((n_classes,), jnp.float32),
    }


def make_sharded_train_step(
    mesh: Mesh,
    sr: int = 22050,
    n_fft: int = 2048,
    hop_length: int = 512,
    n_mels: int = 128,
    n_classes: int = 10,
    lr: float = 1e-2,
    fft_mode: str = "matmul",
):
    """SGD step of a log-mel + linear classifier, sharded dp x sp.

    Exercises every parallelism primitive the library uses on real meshes:
    the log-mel frontend runs time-sharded with ``ppermute`` halo exchange
    (sequence parallelism), frame-pooling reduces over 'time' with ``psum``,
    the loss and gradients reduce over 'data' with ``pmean`` (data
    parallelism), and parameters stay replicated. Returns
    ``step(params, y, labels) -> (new_params, loss)``, jittable with batch
    sharded (data, time).
    """
    t_size = mesh.shape[TIME_AXIS]

    def step(params, y, labels):
        feats = logmel_time_sharded(
            y, mesh, sr=sr, n_fft=n_fft, hop_length=hop_length, n_mels=n_mels,
            fft_mode=fft_mode,
        )  # (B, F, n_mels) sharded (data, time, -)

        def sharded_loss_and_grads(params, feats, labels):
            def body(p, f_local, lab_local):
                def loss_fn(p):
                    # mean-pool over ALL frames: local sum + psum over time
                    pooled = lax.psum(jnp.sum(f_local, axis=1), TIME_AXIS)
                    n_frames_total = f_local.shape[1] * t_size
                    pooled = pooled / n_frames_total  # (B_l, n_mels)
                    logits = (
                        jnp.matmul(pooled, p["w"], precision=MATMUL_PRECISION)
                        + p["b"]
                    )
                    logp = jax.nn.log_softmax(logits, axis=-1)
                    nll = -jnp.take_along_axis(
                        logp, lab_local[:, None], axis=-1
                    )[:, 0]
                    return jnp.mean(nll)

                loss, grads = jax.value_and_grad(loss_fn)(p)
                loss = lax.pmean(loss, DATA_AXIS)
                # The params sit DOWNSTREAM of the time-axis psum (pooled
                # features are complete on every time shard), so each time
                # shard computes the full, identical gradient; pmean over
                # 'time' is a consistency no-op and pmean over 'data' is the
                # data-parallel average.
                grads = jax.tree.map(
                    lambda g: lax.pmean(g, (DATA_AXIS, TIME_AXIS)), grads
                )
                return loss, grads

            # check_vma=False: jax 0.9's varying-manual-axes tracking makes
            # in-body `grad` of a replicated param return the cross-device
            # SUM (the cotangent is auto-psummed to restore invariance), so
            # the explicit psum/pmean above would double-count. With vma
            # tracking off, grads stay local and the collectives mean what
            # they say. Regression-tested against the single-device step in
            # `tests/test_parallel.py`.
            return shard_map(
                body,
                mesh=mesh,
                in_specs=(P(), P(DATA_AXIS, TIME_AXIS, None), P(DATA_AXIS)),
                out_specs=(P(), P()),
                check_vma=False,
            )(params, feats, labels)

        loss, grads = sharded_loss_and_grads(params, feats, labels)
        new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return new_params, loss

    return step


class TrainablePCENFrontend:
    """PCEN-mel frontend with LEARNABLE per-channel compression.

    The Wang et al. (2017) trainable frontend: on top of the (optionally
    learnable) mel filterbank, each mel channel owns its own PCEN gain,
    bias, root-compression power, and smoother coefficient — all trained
    end-to-end. Positivity/range constraints are enforced by
    parameterization (softplus for gain/bias/power, sigmoid for the
    smoother coefficient), so plain SGD cannot step out of the valid
    region. Gradients flow through everything: the fused mel kernel's
    VJP, the associative-scan smoother (:func:`~.ops.pcen.pcen_smoother`),
    and the expm1/log1p compression.

    ``init_params()`` -> ``{"fb_t", "gain_raw", "bias_raw", "power_raw",
    "b_logit"}`` initialized at the published defaults
    (gain 0.98, bias 2, power 0.5, b from a 0.4 s time constant);
    ``apply(params, y)`` -> ``(B, n_mels, F)`` PCEN features.
    """

    def __init__(
        self,
        sr: int = 22050,
        n_fft: int = 2048,
        hop_length: int = 512,
        n_mels: int = 128,
        window: str = "hann",
        eps: float = 1e-6,
    ):
        self.mel = TrainableLogMelFrontend(
            sr=sr, n_fft=n_fft, hop_length=hop_length, n_mels=n_mels,
            window=window,
        )
        self.n_mels = n_mels
        self.eps = float(eps)
        t_frames = 0.4 * sr / float(hop_length)
        self._b0 = float(
            (np.sqrt(1.0 + 4.0 * t_frames**2) - 1.0) / (2.0 * t_frames**2)
        )

    @staticmethod
    def _inv_softplus(x: float) -> float:
        return float(np.log(np.expm1(x)))

    def init_params(self) -> dict[str, jax.Array]:
        m = self.n_mels
        p = self.mel.init_params()
        p["gain_raw"] = jnp.full((m,), self._inv_softplus(0.98))
        p["bias_raw"] = jnp.full((m,), self._inv_softplus(2.0))
        p["power_raw"] = jnp.full((m,), self._inv_softplus(0.5))
        p["b_logit"] = jnp.full(
            (m,), float(np.log(self._b0 / (1.0 - self._b0)))
        )
        return p

    def apply(
        self, params: dict, y: ArrayLike, use_pallas: bool | None = None
    ) -> jax.Array:
        from ..ops.pcen import pcen_smoother

        # mel POWER (the log/dB step of the parent class is replaced by
        # the PCEN compression law); the learned filterbank can project
        # negative values and PCEN's compression law needs nonnegative
        # energies (log1p/`**-gain` otherwise NaN within two SGD steps)
        mel = jnp.maximum(
            self.mel.apply(params, y, use_pallas=use_pallas, db=False), 0.0
        )
        gain = jax.nn.softplus(params["gain_raw"])[:, None]
        bias = jax.nn.softplus(params["bias_raw"])[:, None]
        power = jax.nn.softplus(params["power_raw"])[:, None]
        b = jax.nn.sigmoid(params["b_logit"])
        M = pcen_smoother(mel, b)
        smooth = (self.eps + M) ** (-gain)
        return (bias**power) * jnp.expm1(
            power * jnp.log1p(mel * smooth / bias)
        )
