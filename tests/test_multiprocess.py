"""Two-process CPU-mesh coverage (VERDICT r4 item 6).

Every other parallelism test runs a single-process 8-virtual-device mesh;
this one spawns TWO OS processes (4 devices each) joined through
``jax.distributed.initialize`` with a localhost coordinator and gloo CPU
collectives — the multi-host path the library's lazy-import fix exists for
(``mlx_audio_primitives_tpu/__init__.py`` keeps ``jax.distributed`` usable
by never initializing a backend at import). The worker lays the mesh out so
the sharded frontend's halo ppermute crosses the process boundary (the
DCN-analog half of SURVEY §2.3), and both processes must agree on the same
descending losses as the single-process reference.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multiprocess_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _clean_env() -> dict:
    env = dict(os.environ)
    # the axon sitecustomize pins JAX_PLATFORMS=axon process-wide; workers
    # must come up as plain CPU with their own device-count flag
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    return env


def test_two_process_mesh_trains_and_matches_single_process():
    port = _free_port()
    env = _clean_env()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(port)],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)

    losses = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("LOSSES ")][-1]
        losses.append(tuple(float(v) for v in line.split()[1:]))

    # both processes observe the same global losses
    assert losses[0] == pytest.approx(losses[1], abs=1e-5)
    loss0, loss1 = losses[0]
    assert np.isfinite(loss0) and np.isfinite(loss1)
    # the cross-process step must actually descend
    assert loss1 < loss0

    # and match the single-process 8-virtual-device reference: the conftest
    # already gives THIS process an 8-device CPU platform
    import jax
    import jax.numpy as jnp

    from mlx_audio_primitives_tpu.models import (
        init_classifier_params,
        make_sharded_train_step,
    )
    from mlx_audio_primitives_tpu.parallel import batch_time_sharding, make_mesh

    mesh = make_mesh(n_data=4, n_time=2)
    sr, n_fft, hop, n_mels, n_classes = 22050, 256, 64, 64, 10
    B, L = 8, 2 * 8 * 256
    rng = np.random.default_rng(0)
    y = jax.device_put(
        jnp.asarray(rng.standard_normal((B, L)).astype(np.float32)),
        batch_time_sharding(mesh),
    )
    labels = jnp.asarray(rng.integers(0, n_classes, size=(B,)).astype(np.int32))
    params = init_classifier_params(n_mels, n_classes)
    step = jax.jit(
        make_sharded_train_step(
            mesh, sr=sr, n_fft=n_fft, hop_length=hop, n_mels=n_mels,
            n_classes=n_classes,
        )
    )
    new_params, ref0 = step(params, y, labels)
    _, ref1 = step(new_params, y, labels)
    assert loss0 == pytest.approx(float(ref0), abs=5e-4)
    assert loss1 == pytest.approx(float(ref1), abs=5e-4)
