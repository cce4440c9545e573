"""Tour of the six parallelism axes on a device mesh.

Each section builds the relevant mesh, shards data/parameters with
`jax.sharding` PartitionSpecs, and runs a few training steps whose
collectives (psum / pmean / all_gather / all_to_all / ppermute) ride ICI on
real hardware:

  dp      data parallelism            batch over 'data'
  sp      sequence (signal) sharding  samples over 'time', halo ppermute
  tp      tensor parallelism          Megatron col/row-parallel convs
  pp      pipeline parallelism        GPipe fill-drain over a (stage,) mesh
  ep      expert parallelism          Switch MoE, all_to_all token routing
  cp      context parallelism         ring attention over frame tokens

Usage:
    # 8 virtual CPU devices (works anywhere):
    python examples/multichip_parallelism.py --virtual 8
    # or on a real multi-chip TPU slice, just:
    python examples/multichip_parallelism.py
"""

from __future__ import annotations

import argparse
import os
import sys

# runnable in place from a source checkout (`python examples/<name>.py`)
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def _provision_virtual(n: int) -> None:
    """Must run before jax initializes a backend."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = [
        f
        for f in os.environ.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append(f"--xla_force_host_platform_device_count={n}")
    os.environ["XLA_FLAGS"] = " ".join(flags)
    import jax

    jax.config.update("jax_platforms", "cpu")


def run_tour(steps: int = 4) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mlx_audio_primitives_tpu import models, parallel

    n = len(jax.devices())
    rng = np.random.default_rng(0)
    sr, n_fft, hop, n_mels, n_cls = 22050, 256, 64, 32, 6

    def losses_of(step, params, y, labels, k=steps):
        out = []
        for _ in range(k):
            params, loss = step(params, y, labels)
            out.append(float(loss))
        return out

    # --- dp x sp: linear classifier over the time-sharded log-mel frontend
    n_time = 4 if n % 4 == 0 else (2 if n % 2 == 0 else 1)
    mesh = parallel.make_mesh(n_data=n // n_time, n_time=n_time)
    B, L = 2 * mesh.shape["data"], n_time * 8 * n_fft
    y = jax.device_put(
        jnp.asarray(rng.standard_normal((B, L)).astype(np.float32)),
        parallel.batch_time_sharding(mesh),
    )
    labels = jnp.asarray(rng.integers(0, n_cls, (B,)).astype(np.int32))
    params = models.init_classifier_params(n_mels, n_cls)
    step = jax.jit(
        models.make_sharded_train_step(
            mesh, sr=sr, n_fft=n_fft, hop_length=hop, n_mels=n_mels,
            n_classes=n_cls,
        )
    )
    print(f"dp x sp   {dict(mesh.shape)}: losses "
          f"{['%.3f' % v for v in losses_of(step, params, y, labels)]}")

    # --- tp: Megatron-sharded conv classifier
    n_model = 2 if n % 2 == 0 else 1
    tp_mesh = parallel.make_tp_mesh(n // n_model, n_model)
    frontend = models.TrainableLogMelFrontend(
        sr=sr, n_fft=n_fft, hop_length=hop, n_mels=n_mels
    )
    tp_params = models.init_audio_classifier_params(frontend, 8, channels=(8, 16))
    tp_params = jax.tree.map(
        jax.device_put, tp_params, models.tp_param_sharding(tp_mesh, (8, 16))
    )
    Bt = 2 * tp_mesh.shape["data"]
    yt = jax.device_put(
        jnp.asarray(rng.standard_normal((Bt, 8 * n_fft)).astype(np.float32)),
        jax.sharding.NamedSharding(tp_mesh, jax.sharding.PartitionSpec("data")),
    )
    lt = jnp.asarray(rng.integers(0, 8, (Bt,)).astype(np.int32))
    tp_step = jax.jit(
        models.make_tp_train_step(tp_mesh, frontend, n_classes=8, channels=(8, 16))
    )
    print(f"tp        {dict(tp_mesh.shape)}: losses "
          f"{['%.3f' % v for v in losses_of(tp_step, tp_params, yt, lt)]}")

    # --- pp: GPipe fill-drain
    n_stage = min(4, n)
    pp_mesh = parallel.make_pp_mesh(n_stage)
    pp_params = models.init_deep_classifier_params(
        frontend, 8, n_blocks=n_stage * 2, width=8
    )
    pp_params = jax.tree.map(
        jax.device_put, pp_params, models.pp_param_sharding(pp_mesh)
    )
    yp = jnp.asarray(np.asarray(yt))
    pp_step = jax.jit(
        models.make_pp_train_step(
            pp_mesh, frontend, n_classes=8, n_blocks=n_stage * 2, width=8,
            n_microbatches=2,
        )
    )
    print(f"pp        {dict(pp_mesh.shape)}: losses "
          f"{['%.3f' % v for v in losses_of(pp_step, pp_params, yp, lt)]}")

    # --- ep: Switch MoE with all_to_all routing
    n_exp = 4 if n % 4 == 0 else (2 if n % 2 == 0 else 1)
    ep_mesh = parallel.make_ep_mesh(n // n_exp, n_exp)
    n_experts = 2 * max(n_exp, 2)
    ep_params = models.init_moe_classifier_params(
        frontend, 8, n_experts=n_experts, d_hidden=32
    )
    ep_params = jax.tree.map(
        jax.device_put, ep_params, models.moe_param_sharding(ep_mesh)
    )
    Be = 2 * n
    ye = jax.device_put(
        jnp.asarray(rng.standard_normal((Be, 8 * n_fft)).astype(np.float32)),
        models.ep_batch_sharding(ep_mesh),
    )
    le = jnp.asarray(rng.integers(0, 8, (Be,)).astype(np.int32))
    ep_step = jax.jit(
        models.make_ep_train_step(
            ep_mesh, frontend, n_classes=8, n_experts=n_experts, d_hidden=32,
            lr=3e-2,
        )
    )
    print(f"ep        {dict(ep_mesh.shape)} E={n_experts}: losses "
          f"{['%.3f' % v for v in losses_of(ep_step, ep_params, ye, le)]}")

    # --- cp: ring-attention transformer on the (data, time) mesh
    F_tok = n_time * 8
    Lc = F_tok * hop
    yc = jax.device_put(
        jnp.asarray(
            rng.standard_normal((B, Lc)).astype(np.float32)
        ),
        parallel.batch_time_sharding(mesh),
    )
    cp_params = models.init_transformer_params(
        n_mels, n_cls, n_frames=F_tok, d_model=16, n_heads=2, d_ff=32,
        n_blocks=2,
    )
    cp_params = jax.tree.map(
        jax.device_put, cp_params,
        models.transformer_param_sharding(mesh, cp_params),
    )
    cp_step = jax.jit(
        models.make_cp_train_step(
            mesh, sr=sr, n_fft=n_fft, hop_length=hop, n_mels=n_mels,
            n_classes=n_cls, d_model=16, n_heads=2, d_ff=32, n_blocks=2,
            lr=3e-2,
        )
    )
    print(f"cp (ring) {dict(mesh.shape)}: losses "
          f"{['%.3f' % v for v in losses_of(cp_step, cp_params, yc, labels)]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--virtual", type=int, default=0,
                    help="provision N virtual CPU devices first")
    ap.add_argument("--steps", type=int, default=4)
    a = ap.parse_args()
    if a.virtual:
        _provision_virtual(a.virtual)
    import jax

    if len(jax.devices()) == 1:
        sys.stderr.write(
            "note: one device found — every 'mesh' is 1x1; run with "
            "--virtual 8 to see real sharding\n"
        )
    run_tour(steps=a.steps)
