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
    ap.add_argument("--model-parallel", type=int, default=None,
                    help="model (TP) axis width. Default: 2 in step mode, "
                         "1 in the full-training modes (pass 2 there to "
                         "prove TP composes with local-feed data loading)")
    ap.add_argument("--mode", choices=("step", "stage1", "stage2", "eval"),
                    default="step",
                    help="step: one sharded stage-2 train step; stage1: a "
                         "full train_stage1 run with per-process local "
                         "data loading (each process decodes only the "
                         "batch rows its devices consume); stage2: "
                         "clip-engine LFB build + train_stage2 the same "
                         "way (memory gathers + bank scatter included); "
                         "eval: distributed corpus protocol evaluation "
                         "(videos partitioned across processes, "
                         "eval/distributed.py)")
    ap.add_argument("--workdir", default=None,
                    help="stage1 mode: SHARED checkpoint/work dir (orbax "
                         "multi-controller saves coordinate through it)")
    ap.add_argument("--interleave-data-axis", action="store_true",
                    help="stage1 mode: build the mesh with processes "
                         "INTERLEAVED along the data axis, so "
                         "process_local_bounds raises and _BatchFeed falls "
                         "back to the full global feed (the documented "
                         "fallback path)")
    ap.add_argument("--epochs", type=int, default=2,
                    help="stage1 mode: epoch count (large values let a "
                         "preemption test SIGTERM one controller mid-run)")
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

    if args.mode == "stage1":
        return stage1_data_parallel(args, n)
    if args.mode == "stage2":
        return stage2_data_parallel(args, n)
    if args.mode == "eval":
        return eval_distributed(args, n)

    import jax.numpy as jnp

    from tmrnet_tpu.config import MeshConfig, ModelConfig, TrainConfig
    from tmrnet_tpu.models.tmrnet import build_model
    from tmrnet_tpu.parallel.mesh import make_mesh, shard_batch, shard_state
    from tmrnet_tpu.train.optim import make_optimizer
    from tmrnet_tpu.train.state import create_train_state
    from tmrnet_tpu.train.steps import make_stage2_steps

    mp = args.model_parallel if args.model_parallel else 2
    mp = mp if n % mp == 0 else 1
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
    # same global value). COMMIT the variables to this process's device 0
    # like orbax-restored checkpoints are: shard_state must route
    # committed leaves through the host (parallel/mesh.py::host_local)
    variables = jax.device_put(model.init(jax.random.PRNGKey(0), clips,
                                          memory),
                               jax.local_devices()[0])
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


def build_synthetic_stage1(workdir: str, epochs: int = 2):
    """Deterministic tiny stage-1 setup, identical on every process that
    calls it (seeded in-memory frames — no shared data disk needed; only
    the checkpoint dir is shared). Also imported by tests/test_multihost.py
    so the single-process comparison run uses the identical dataset."""
    import numpy as np

    from tmrnet_tpu.config import (
        DataConfig,
        ExperimentConfig,
        ModelConfig,
        TrainConfig,
    )
    from tmrnet_tpu.data.manifests import Manifest, VideoRecord
    from tmrnet_tpu.data.pipeline import ClipDataset, array_frame_loader

    seq, hw = 4, 24
    rng = np.random.RandomState(0)
    store, videos = {}, []
    for v in range(3):
        paths = [f"v{v}/f{j}" for j in range(20)]
        labels = ((np.arange(20) // 5) + v) % 4
        for p, lab in zip(paths, labels):
            base = np.full((hw, hw, 3), 40 + 50 * lab, np.uint8)
            noise = rng.randint(0, 25, base.shape).astype(np.uint8)
            store[p] = np.clip(base + noise, 0, 255).astype(np.uint8)
        videos.append(VideoRecord(f"v{v}", paths, labels.astype(np.int64)))
    manifest = Manifest(videos)
    loader = array_frame_loader(store)
    cfg = ExperimentConfig(
        data=DataConfig(batch_clips=8, num_workers=2, prefetch=1),
        model=ModelConfig(backbone="tiny", stage_sizes=(1, 1), width=8,
                          hidden_dim=16, num_classes=4, head="stage1",
                          compute_dtype="float32"),
        train=TrainConfig(epochs=epochs, optimizer="sgd", lr=0.02,
                          schedule="constant", seed=0, log_every=1000,
                          checkpoint_dir=os.path.join(workdir, "ckpt")),
    )
    train_ds = ClipDataset(manifest, seq, frame_loader=loader)
    val_ds = ClipDataset(manifest, seq, frame_loader=loader)
    return cfg, train_ds, val_ds


def build_synthetic_stage2(workdir: str, epochs: int = 2):
    """Stage-2 twin of build_synthetic_stage1: TMRNet head + a tiny memory
    window, LFB cache in the (shared) workdir."""
    import dataclasses
    import os as _os

    from tmrnet_tpu.config import MemoryConfig

    cfg, train_ds, val_ds = build_synthetic_stage1(workdir, epochs)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, head="tmr"),
        # async saves here so the two-process test also proves orbax's
        # AsyncCheckpointer coordinates across controllers
        train=dataclasses.replace(cfg.train, async_checkpoint=True),
        memory=MemoryConfig(window=4,
                            cache_path=_os.path.join(workdir, "lfb.npz")))
    return cfg, train_ds, val_ds


def stage2_extractor(cfg, train_ds):
    """Frozen extractor variables from a seeded stage-1 init (identical on
    every process / the single-process comparison run — stage-2 parity
    needs shared weights, not a trained model)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tmrnet_tpu.models.tmrnet import build_model

    m1 = build_model(dataclasses.replace(cfg.model, head="stage1"))
    sample, _ = train_ds.get_clip(0)
    v1 = m1.init(jax.random.PRNGKey(0),
                 jnp.asarray(sample[None], jnp.float32))
    sub = {"params": {"backbone": v1["params"]["backbone"],
                      "encoder": v1["params"]["encoder"]},
           "batch_stats": {"backbone": v1["batch_stats"]["backbone"]}}
    # COMMIT the leaves to this process's device 0, like orbax-restored
    # checkpoints are: build_lfb must route them through the host before
    # replicating over the global mesh (parallel/mesh.py::host_local) —
    # uncommitted init output would hide that path
    return jax.device_put(sub, jax.local_devices()[0])


def print_history(tag: str, pid, hist) -> None:
    for h in hist:
        print(f"{tag} proc {pid}: epoch={h.epoch} "
              f"train_loss={h.train_loss:.6f} train_acc={h.train_acc:.6f} "
              f"val_loss={h.val_loss:.6f} val_acc={h.val_acc:.6f}",
              flush=True)


def stage2_data_parallel(args, n: int) -> int:
    """Clip-engine LFB build + train_stage2, both over the global mesh with
    per-process local batch slices — covers the memory-window gathers on
    the replicated bank, the update_bank scatter, and the process-0 bank
    cache write that the stage-1 mode doesn't touch."""
    assert args.workdir, "--mode stage2 requires --workdir (shared dir)"
    import numpy as np

    from tmrnet_tpu.config import MeshConfig
    from tmrnet_tpu.parallel.mesh import make_mesh
    from tmrnet_tpu.train.loop import build_lfb, train_stage2

    cfg, train_ds, val_ds = build_synthetic_stage2(args.workdir, args.epochs)
    mp = args.model_parallel or 1   # TP axis: opt-in for the training modes
    mesh = make_mesh(MeshConfig(data_parallel=n // mp, model_parallel=mp))
    bank = build_lfb(cfg, stage2_extractor(cfg, train_ds), train_ds,
                     force=True, mesh=mesh)
    print(f"stage2 proc {args.process_id}: "
          f"bank_sum={float(np.abs(np.asarray(bank.features)).sum()):.4f}",
          flush=True)
    _state, hist = train_stage2(cfg, train_ds, bank, val_ds, bank, mesh=mesh)
    print_history("stage2", args.process_id, hist)
    return 0


def build_synthetic_eval():
    """Deterministic tiny corpus-eval setup, identical on every process (and
    in the single-process comparison run of tests/test_multihost_eval.py):
    5 memory-dependent synthetic videos (data/synthetic.py) + a seeded TMR
    model. Returns (cfg, videos uint8 list, labels list, variables,
    extractor_variables)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tmrnet_tpu.config import (
        DataConfig,
        EvalConfig,
        ExperimentConfig,
        MemoryConfig,
        ModelConfig,
    )
    from tmrnet_tpu.data.synthetic import generate_video
    from tmrnet_tpu.models.tmrnet import build_model

    seq, hw = 4, 24
    cfg = ExperimentConfig(
        data=DataConfig(sequence_length=seq, crop_size=hw, resize=hw,
                        mean=(0.5, 0.5, 0.5), std=(0.25, 0.25, 0.25)),
        model=ModelConfig(backbone="tiny", stage_sizes=(1, 1), width=8,
                          hidden_dim=16, num_classes=7, head="tmr",
                          compute_dtype="float32"),
        memory=MemoryConfig(window=4),
        # chunk < every process's local frame total, so the flat-stream
        # launches are shape-identical however the videos are partitioned
        eval=EvalConfig(corpus=True, corpus_chunk=64),
    )
    rng = np.random.default_rng(7)
    vids, labs = [], []
    for _ in range(5):
        frames, labels = generate_video(rng, dur_range=(5, 9), hw=hw)
        vids.append(frames)
        labs.append(labels)
    model = build_model(cfg.model)
    clips = jnp.zeros((1, seq, hw, hw, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(3), clips,
                           jnp.zeros((1, 4, 16)))
    ev = {"params": {"backbone": variables["params"]["backbone"],
                     "encoder": variables["params"]["encoder"]},
          "batch_stats": {"backbone": variables["batch_stats"]["backbone"]}}
    return cfg, vids, labs, variables, ev


def eval_distributed(args, n: int) -> int:
    """Distributed corpus protocol evaluation: this process runs its video
    partition on a process-LOCAL mesh, predictions all-gather, and every
    process prints the identical protocol table + a prediction checksum
    (compared byte-for-byte against a single-process run by
    tests/test_multihost_eval.py)."""
    import hashlib

    import jax
    import numpy as np

    from tmrnet_tpu.config import CHOLEC80_PHASES, MeshConfig
    from tmrnet_tpu.eval.distributed import run_corpus_distributed
    from tmrnet_tpu.eval.metrics import evaluate_protocol
    from tmrnet_tpu.parallel.mesh import make_mesh

    cfg, vids, labs, variables, ev = build_synthetic_eval()
    local = jax.local_devices()
    mesh = (make_mesh(MeshConfig(data_parallel=len(local)), devices=local)
            if len(local) > 1 else None)
    results = run_corpus_distributed(
        cfg, variables, ev, [v.shape[0] for v in vids],
        lambda i: vids[i], mesh=mesh)
    seq = cfg.data.sequence_length
    gts = [l[seq - 1:] for l in labs]
    preds = [p for p, _ in results]
    rep = evaluate_protocol(gts, preds, protocol="cholec80",
                            phase_names=CHOLEC80_PHASES)
    digest = hashlib.sha256(
        np.concatenate(preds).astype(np.int64).tobytes()).hexdigest()[:16]
    print(f"eval proc {args.process_id}: preds_sha={digest}", flush=True)
    print(rep.format_table(), flush=True)
    return 0


def stage1_data_parallel(args, n: int) -> int:
    """Full train_stage1 over the global mesh with PER-PROCESS LOCAL data
    loading: _fit's _BatchFeed detects a mesh spanning processes, each process's
    ClipLoader assembles only its process_local_bounds slice of every
    global batch, and global_batch_from_local stitches the slices
    (train/loop.py). Orbax checkpoints coordinate through the shared
    --workdir. Every process must print identical epoch stats."""
    assert args.workdir, "--mode stage1 requires --workdir (shared dir)"
    import jax

    from tmrnet_tpu.config import MeshConfig
    from tmrnet_tpu.parallel.mesh import make_mesh
    from tmrnet_tpu.train.loop import train_stage1

    cfg, train_ds, val_ds = build_synthetic_stage1(args.workdir, args.epochs)
    mp = args.model_parallel or 1   # TP axis: opt-in for the training modes
    devices = None
    if args.interleave_data_axis:
        # processes interleaved along the data axis: each process's batch
        # rows are then NON-contiguous, process_local_bounds raises, and
        # _BatchFeed must fall back to the full global feed (shard_batch)
        devs = jax.devices()
        per, np_ = args.local_devices, args.num_processes
        devices = [devs[j * per + k] for k in range(per) for j in range(np_)]
    mesh = make_mesh(MeshConfig(data_parallel=n // mp, model_parallel=mp),
                     devices=devices)
    _state, hist = train_stage1(cfg, train_ds, val_ds, mesh=mesh)
    print_history("stage1", args.process_id, hist)
    return 0


if __name__ == "__main__":
    sys.exit(main())
