"""Worker for the two-process CPU-mesh test (NOT a pytest module).

Launched twice by `tests/test_multiprocess.py` with a localhost coordinator:
each process owns 4 virtual CPU devices and joins an 8-device global mesh
laid out so the 'time' axis PAIRS devices across the process boundary —
the sharded log-mel frontend's ppermute halo exchange therefore rides the
cross-process (DCN-analog) path, the half of SURVEY §2.3 that the
single-process dryrun cannot reach.

Usage: python multiprocess_worker.py <process_id> <coordinator_port>
Prints: LOSSES <loss0> <loss1>
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mlx_audio_primitives_tpu.models import (  # noqa: E402
    init_classifier_params,
    make_sharded_train_step,
)
from mlx_audio_primitives_tpu.parallel import batch_time_sharding  # noqa: E402

assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

# mesh[d, t]: time partner t=0/1 lives on a DIFFERENT process (device t*4+d),
# so the frontend's halo ppermute crosses the process boundary
devs = np.empty((4, 2), dtype=object)
for d in range(4):
    for t in range(2):
        devs[d, t] = jax.devices()[t * 4 + d]
mesh = Mesh(devs, ("data", "time"))

sr, n_fft, hop, n_mels, n_classes = 22050, 256, 64, 64, 10
B = 2 * 4
L = 2 * 8 * n_fft

rng = np.random.default_rng(0)
y_host = rng.standard_normal((B, L)).astype(np.float32)
labels_host = rng.integers(0, n_classes, size=(B,)).astype(np.int32)

sharding = batch_time_sharding(mesh)
y = jax.make_array_from_callback(
    (B, L), sharding, lambda idx: jnp.asarray(y_host[idx])
)
lab_sharding = jax.sharding.NamedSharding(
    mesh, jax.sharding.PartitionSpec("data")
)
labels = jax.make_array_from_callback(
    (B,), lab_sharding, lambda idx: jnp.asarray(labels_host[idx])
)

params = init_classifier_params(n_mels, n_classes)
step = jax.jit(
    make_sharded_train_step(
        mesh, sr=sr, n_fft=n_fft, hop_length=hop, n_mels=n_mels,
        n_classes=n_classes,
    )
)
new_params, loss0 = step(params, y, labels)
_, loss1 = step(new_params, y, labels)
jax.block_until_ready(loss1)
print(f"LOSSES {float(loss0):.6f} {float(loss1):.6f}", flush=True)
