"""Multi-HOST (multi-process SPMD) dryrun: one sharded train step over DCN.

Validates the multi-controller path that `mesh.multihost` enables in
production — `jax.distributed.initialize` (DCN), a global ('data','model')
mesh spanning every process's devices, `shard_state`/`shard_batch`
placement, and one full stage-2 training step (forward, weighted CE,
backward, two-group SGD, BN stats) — without TPU pods: each process hosts
virtual CPU devices, and the collectives run over the same multi-controller
runtime a pod uses (Gloo/TCP standing in for DCN).

Run N processes, any machine(s):

    python scripts/multihost_dryrun.py --coordinator 127.0.0.1:9876 \
        --num-processes 2 --process-id {0,1} [--local-devices 4]

Every process prints the same loss (the mesh is global, the program SPMD);
exit 0 = the multi-host story compiles and executes. The reference has no
multi-node anything (SURVEY.md §2.8: single-process DataParallel only);
tests/test_multihost.py drives this script as a 2-process integration test.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True,
                    help="host:port of process 0's coordinator service")
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--local-devices", type=int, default=4,
                    help="virtual CPU devices hosted by THIS process")
    ap.add_argument("--model-parallel", type=int, default=2)
    args = ap.parse_args(argv)

    # virtual-device bootstrap must precede the first backend query; the
    # axon plugin ignores JAX_PLATFORMS, so force CPU via jax.config
    # (CLAUDE.md / tests/conftest.py)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags +
            f" --xla_force_host_platform_device_count={args.local_devices}"
        ).strip()
    # runnable straight from a checkout (scripts/ is not on sys.path)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    import jax

    jax.config.update("jax_platforms", "cpu")

    from tmrnet_tpu.parallel.mesh import initialize_multihost

    initialize_multihost(coordinator=args.coordinator,
                         num_processes=args.num_processes,
                         process_id=args.process_id)

    n = len(jax.devices())
    want = args.num_processes * args.local_devices
    assert n == want, f"global device count {n} != {want}"

    import jax.numpy as jnp

    from tmrnet_tpu.config import MeshConfig, ModelConfig, TrainConfig
    from tmrnet_tpu.models.tmrnet import build_model
    from tmrnet_tpu.parallel.mesh import make_mesh, shard_batch, shard_state
    from tmrnet_tpu.train.optim import make_optimizer
    from tmrnet_tpu.train.state import create_train_state
    from tmrnet_tpu.train.steps import make_stage2_steps

    mp = args.model_parallel if n % args.model_parallel == 0 else 1
    mesh = make_mesh(MeshConfig(data_parallel=n // mp, model_parallel=mp))

    cfg = ModelConfig(backbone="resnet50", head="tmr", num_classes=7,
                      hidden_dim=512, compute_dtype="float32")
    model = build_model(cfg)
    b, t = max(2, n), 2
    clips = jnp.zeros((b, t, 64, 64, 3), jnp.float32)
    memory = jnp.zeros((b, 8, 512), jnp.float32)
    labels = jnp.zeros((b,), jnp.int32)

    # identical PRNG on every process -> identical replicated init values,
    # so shard_state/shard_batch device_puts satisfy the multi-controller
    # contract (each process contributes its addressable shards of the
    # same global value)
    variables = model.init(jax.random.PRNGKey(0), clips, memory)
    tx = make_optimizer(TrainConfig(optimizer="sgd", lr=1e-3),
                        variables["params"],
                        slow_modules=("backbone", "encoder"))
    state = create_train_state(model, variables, tx)
    state = shard_state(mesh, state, use_tp=(mp > 1))
    clips, memory = (shard_batch(mesh, a) for a in (clips, memory))
    labels = shard_batch(mesh, labels)

    train_step, _ = make_stage2_steps()
    state, metrics = train_step(state, clips, memory, labels,
                                jax.random.PRNGKey(1))
    # metrics are replicated -> addressable on every process
    loss = float(jax.device_get(metrics["loss"]))
    print(f"multihost_dryrun proc {args.process_id}/{args.num_processes}: "
          f"mesh={dict(mesh.shape)} loss={loss:.6f} "
          f"step={int(jax.device_get(state.step))}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
