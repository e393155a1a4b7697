"""Multi-HOST (multi-controller) integration: two real processes, one mesh.

Everything else in the suite validates SPMD on a single-process virtual
mesh; these tests spawn TWO OS processes that each host 4 virtual CPU
devices, rendezvous through `jax.distributed.initialize` (the
`mesh.multihost` / DCN path, parallel/mesh.py::initialize_multihost), and
run real work over the global 8-device mesh — the collectives cross the
process boundary over the same multi-controller runtime a TPU pod uses.

Two levels:
  * one sharded stage-2 train step on a dp=4 x tp=2 mesh (both
    controllers must compute the identical replicated loss);
  * a FULL train_stage1 run with per-process LOCAL data loading — each
    process's ClipLoader assembles only the batch rows its own devices
    consume (parallel/mesh.py::process_local_bounds +
    global_batch_from_local via train/loop.py::_BatchFeed), orbax
    checkpoints coordinate through a shared dir, and the epoch stats must
    match a single-process 8-device run of the identical config.

The reference has no multi-node story at all (SURVEY.md §2.8: one-process
torch DataParallel); this is the rebuild's DCN evidence.
"""

import glob
import importlib.util
import json
import os
import re
import signal
import socket
import subprocess
import sys
import time

_SCRIPT = os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                       "multihost_dryrun.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn_pair(extra_args):
    port = _free_port()
    env = dict(os.environ)
    # each process bootstraps its own 4-device virtual CPU platform; the
    # parent suite's XLA_FLAGS (8 devices) must not leak through
    env.pop("XLA_FLAGS", None)
    return [
        subprocess.Popen(
            [sys.executable, _SCRIPT, "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(i),
             "--local-devices", "4"] + extra_args,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for i in range(2)
    ]


def _run_pair(extra_args):
    procs = _spawn_pair(extra_args)
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
    return outs


def test_two_process_train_step_matches_single_process():
    outs = _run_pair([])
    losses = []
    for out in outs:
        m = re.search(r"mesh=\{'data': 4, 'model': 2\} loss=([0-9.]+) step=1",
                      out)
        assert m, f"missing result line:\n{out}"
        losses.append(float(m.group(1)))
    # SPMD: every controller computes the same replicated loss
    assert losses[0] == losses[1]


_EPOCH_RE = re.compile(
    r"stage\d proc \d: epoch=(\d+) train_loss=([0-9.]+) train_acc=([0-9.]+) "
    r"val_loss=([0-9.]+) val_acc=([0-9.]+)")


def _epoch_stats(out):
    stats = [tuple(float(g) for g in m.groups())
             for m in _EPOCH_RE.finditer(out)]
    assert stats, f"no epoch lines:\n{out}"
    return stats


def test_two_process_stage1_local_data_loading(tmp_path):
    """Full stage-1 training, 2 controllers, per-process local batch slices:
    results must equal the single-process 8-device run bit for bit modulo
    f32 collective scheduling (tight tolerance)."""
    shared = tmp_path / "shared"
    shared.mkdir()
    outs = _run_pair(["--mode", "stage1", "--workdir", str(shared)])
    s0, s1 = _epoch_stats(outs[0]), _epoch_stats(outs[1])
    # SPMD: both controllers see identical replicated stats
    assert s0 == s1, f"controllers disagree:\n{outs[0]}\n{outs[1]}"

    # single-process reference run: same dataset/config (imported from the
    # dryrun script), dp=8 mesh over this pytest process's virtual devices
    spec = importlib.util.spec_from_file_location("multihost_dryrun", _SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from tmrnet_tpu.config import MeshConfig
    from tmrnet_tpu.parallel.mesh import make_mesh
    from tmrnet_tpu.train.loop import train_stage1

    single = tmp_path / "single"
    single.mkdir()
    cfg, train_ds, val_ds = mod.build_synthetic_stage1(str(single))
    mesh = make_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    _state, hist = train_stage1(cfg, train_ds, val_ds, mesh=mesh)
    assert len(hist) == len(s0)
    for h, (epoch, tr_loss, tr_acc, va_loss, va_acc) in zip(hist, s0):
        assert h.epoch == int(epoch)
        assert abs(h.train_loss - tr_loss) < 1e-3 * max(1.0, tr_loss)
        assert abs(h.val_loss - va_loss) < 1e-3 * max(1.0, va_loss)
        assert abs(h.train_acc - tr_acc) < 1e-3
        assert abs(h.val_acc - va_acc) < 1e-3

    # the multi-controller checkpoint landed complete in the SHARED dir
    from tmrnet_tpu.utils.checkpoint import CheckpointManager

    ckpt = CheckpointManager(str(shared / "ckpt"))
    assert ckpt.latest_step() is not None
    assert os.path.exists(ckpt.best_dir)


def test_two_process_stage2_lfb_and_memory_training(tmp_path):
    """Clip-engine LFB build + stage-2 (memory) training across 2
    controllers with local batch slices: bank and epoch stats must match
    the single-process 8-device run, and process 0 must have written a
    fetchable bank cache to the shared dir."""
    shared = tmp_path / "shared"
    shared.mkdir()
    outs = _run_pair(["--mode", "stage2", "--workdir", str(shared)])
    s0, s1 = _epoch_stats(outs[0]), _epoch_stats(outs[1])
    assert s0 == s1, f"controllers disagree:\n{outs[0]}\n{outs[1]}"
    sums = [float(re.search(r"bank_sum=([0-9.]+)", o).group(1)) for o in outs]
    assert sums[0] == sums[1]
    assert os.path.exists(shared / "lfb.npz")  # process-0 cache write

    spec = importlib.util.spec_from_file_location("multihost_dryrun", _SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    import numpy as np

    from tmrnet_tpu.config import MeshConfig
    from tmrnet_tpu.parallel.mesh import make_mesh
    from tmrnet_tpu.train.loop import build_lfb, train_stage2

    single = tmp_path / "single"
    single.mkdir()
    cfg, train_ds, val_ds = mod.build_synthetic_stage2(str(single))
    mesh = make_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    bank = build_lfb(cfg, mod.stage2_extractor(cfg, train_ds), train_ds,
                     force=True, mesh=mesh)
    ref_sum = float(np.abs(np.asarray(bank.features)).sum())
    assert abs(ref_sum - sums[0]) < 1e-3 * max(1.0, ref_sum)
    _state, hist = train_stage2(cfg, train_ds, bank, val_ds, bank, mesh=mesh)
    assert len(hist) == len(s0)
    for h, (epoch, tr_loss, tr_acc, va_loss, va_acc) in zip(hist, s0):
        assert h.epoch == int(epoch)
        assert abs(h.train_loss - tr_loss) < 1e-3 * max(1.0, tr_loss)
        assert abs(h.val_loss - va_loss) < 1e-3 * max(1.0, va_loss)
        assert abs(h.train_acc - tr_acc) < 1e-3
        assert abs(h.val_acc - va_acc) < 1e-3


def test_two_process_preemption_stops_both_controllers(tmp_path):
    """SIGTERM delivered to ONE controller only: the collective stop check
    (train/loop.py::_global_stop) must spread the preemption so BOTH
    controllers leave at the same step boundary, checkpoint together
    (orbax barriers would deadlock otherwise), and exit 0."""
    shared = tmp_path / "shared"
    shared.mkdir()
    procs = _spawn_pair(["--mode", "stage1", "--workdir", str(shared),
                         "--epochs", "200"])
    try:
        # wait for training to actually make progress (first epoch's
        # checkpoint appears), then preempt controller 0 alone
        deadline = time.time() + 480
        while time.time() < deadline:
            if glob.glob(str(shared / "ckpt" / "step_*.json")):
                break
            if any(p.poll() is not None for p in procs):
                break  # a child died early; fall through to the asserts
            time.sleep(0.5)
        else:
            raise AssertionError("no checkpoint appeared within 480 s")
        procs[0].send_signal(signal.SIGTERM)
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for q in procs:
            q.kill()
        raise
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
    s0, s1 = _epoch_stats(outs[0]), _epoch_stats(outs[1])
    # both controllers unwound at the same boundary with identical stats,
    # long before the nominal 200 epochs
    assert s0 == s1
    assert len(s0) < 200
    # the preemption checkpoint is consistent in the shared dir
    metas = sorted(glob.glob(str(shared / "ckpt" / "step_*.json")))
    assert metas
    with open(metas[-1]) as f:
        meta = json.load(f)["metrics"]
    assert "epoch" in meta


def test_metric_logger_writes_on_primary_only(tmp_path, monkeypatch):
    """Multi-controller runs construct a MetricLogger on every process;
    only process 0 may own the metrics.jsonl / TB / image writers (shared
    filesystems would interleave concurrent appends). Stdout logging stays
    per-process."""
    import jax

    from tmrnet_tpu.utils.logging import MetricLogger

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    log = MetricLogger(str(tmp_path / "logs"), use_tensorboard=False,
                       quiet=True)
    log.log(0, {"x": 1.0})
    assert log.log_dir is None
    assert not (tmp_path / "logs").exists()

    monkeypatch.setattr(jax, "process_index", lambda: 0)
    log0 = MetricLogger(str(tmp_path / "logs"), use_tensorboard=False,
                        quiet=True)
    log0.log(0, {"x": 1.0})
    assert (tmp_path / "logs" / "metrics.jsonl").exists()


def test_mesh_for_passes_explicit_rendezvous(monkeypatch):
    """mesh.coordinator / num_processes / process_id reach
    jax.distributed.initialize for manual multi-controller launches;
    the defaults map to auto-detection (all None)."""
    import dataclasses

    from tmrnet_tpu import cli
    from tmrnet_tpu.config import ExperimentConfig, MeshConfig

    seen = {}

    def fake_init(coordinator=None, num_processes=None, process_id=None):
        seen.update(coordinator=coordinator, num_processes=num_processes,
                    process_id=process_id)

    monkeypatch.setattr("tmrnet_tpu.parallel.mesh.initialize_multihost",
                        fake_init)
    cfg = ExperimentConfig(mesh=MeshConfig(
        multihost=True, coordinator="h:1", num_processes=2, process_id=1))
    cli._mesh_for(cfg)
    assert seen == {"coordinator": "h:1", "num_processes": 2,
                    "process_id": 1}

    seen.clear()
    cli._mesh_for(dataclasses.replace(cfg, mesh=MeshConfig(multihost=True)))
    assert seen == {"coordinator": None, "num_processes": None,
                    "process_id": None}


def test_two_process_resume_continues_from_checkpoint(tmp_path):
    """Multi-controller RESTORE: a finished 2-epoch two-controller run
    relaunched with --epochs 4 must resume from the shared orbax
    checkpoint (epochs 2-3 only), agree across controllers, and match the
    tail of an uninterrupted single-process 4-epoch run — restore happens
    before shard_state, so every process restores the full replicated
    state from the shared dir."""
    shared = tmp_path / "shared"
    shared.mkdir()
    _run_pair(["--mode", "stage1", "--workdir", str(shared), "--epochs", "2"])
    outs = _run_pair(["--mode", "stage1", "--workdir", str(shared),
                      "--epochs", "4"])
    s0, s1 = _epoch_stats(outs[0]), _epoch_stats(outs[1])
    assert s0 == s1, f"controllers disagree:\n{outs[0]}\n{outs[1]}"
    assert [int(e[0]) for e in s0] == [2, 3], f"not a resume:\n{outs[0]}"

    spec = importlib.util.spec_from_file_location("multihost_dryrun", _SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from tmrnet_tpu.config import MeshConfig
    from tmrnet_tpu.parallel.mesh import make_mesh
    from tmrnet_tpu.train.loop import train_stage1

    single = tmp_path / "single"
    single.mkdir()
    cfg, train_ds, val_ds = mod.build_synthetic_stage1(str(single), epochs=4)
    mesh = make_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    _state, hist = train_stage1(cfg, train_ds, val_ds, mesh=mesh)
    for h, (epoch, tr_loss, tr_acc, va_loss, va_acc) in zip(hist[2:], s0):
        assert h.epoch == int(epoch)
        assert abs(h.train_loss - tr_loss) < 1e-3 * max(1.0, tr_loss)
        assert abs(h.val_loss - va_loss) < 1e-3 * max(1.0, va_loss)
        assert abs(h.train_acc - tr_acc) < 1e-3
        assert abs(h.val_acc - va_acc) < 1e-3


_CLI_CHILD = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
from tmrnet_tpu.cli import main
sys.exit(main(sys.argv[1:]))
"""


def test_two_process_cli_train_bank(tmp_path):
    """The USER-FACING multihost path: two processes run the real CLI
    (`train-bank --set mesh.multihost=true` with explicit rendezvous
    knobs) against a shared synthetic frame tree. Covers argument parsing,
    _mesh_for's init-before-logger ordering, MetricLogger single-writer
    gating, per-process local data loading, and the shared checkpoint —
    none of which the dryrun script exercises."""
    import csv

    import numpy as np

    try:
        import cv2
    except ImportError:  # pragma: no cover
        import pytest

        pytest.skip("cv2 unavailable")

    root = tmp_path
    rows = []
    for v in range(2):
        d = root / "frames" / str(v + 1)
        d.mkdir(parents=True)
        for j in range(16):
            lab = (j // 5) % 3
            img = np.full((32, 32, 3), 40 + 60 * lab, np.uint8)
            p = str(d / f"f{j:04d}.png")
            cv2.imwrite(p, img)
            rows.append((p, lab, v))
    with open(root / "train.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["frame", "class", "id"])
        for p, lab, v in rows:
            w.writerow([p, lab, v])

    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    args = [
        "train-bank",
        "--train-manifest", str(root / "train.csv"),
        "--val-manifest", str(root / "train.csv"),
        "--log-dir", str(root / "logs"),
        "--set", "model.backbone=tiny", "--set", "model.stage_sizes=1,1",
        "--set", "model.width=8", "--set", "model.hidden_dim=16",
        "--set", "model.num_classes=3", "--set", "model.compute_dtype=float32",
        "--set", "data.sequence_length=4", "--set", "data.batch_clips=8",
        "--set", "data.crop_size=32", "--set", "data.resize=32",
        "--set", "train.epochs=2", "--set", "train.log_every=1000",
        "--set", f"train.checkpoint_dir={root / 'ckpt'}",
        "--set", "mesh.multihost=true",
        "--set", f"mesh.coordinator=127.0.0.1:{port}",
        "--set", "mesh.num_processes=2",
    ]
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CLI_CHILD] + args
            + ["--set", f"mesh.process_id={i}"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))))
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
    # both controllers report the identical best epoch
    bests = [re.search(r"best epoch (\d+): val_acc=([0-9.]+)", o)
             for o in outs]
    assert all(bests), f"missing best line:\n{outs[0]}\n{outs[1]}"
    assert bests[0].groups() == bests[1].groups()
    # shared checkpoint landed; exactly ONE process wrote the metrics file
    assert os.path.exists(root / "ckpt" / "best")
    jsonl = root / "logs" / "metrics.jsonl"
    assert jsonl.exists()
    lines = [json.loads(l) for l in open(jsonl)]
    epochs = [l for l in lines if "epoch/train_loss" in l]
    assert len(epochs) == 2, f"duplicated writers? {len(epochs)} epoch rows"


def test_two_process_stage2_with_tensor_parallel(tmp_path):
    """TP composes with local-feed multi-controller training: a dp=2 x tp=2
    global mesh over two controllers (each process owns one full data row
    pair + a model-axis half) runs the LFB build + stage-2 training and
    matches a single-process run on the SAME dp=4(->2)xtp=2 mesh shape —
    the TP rules shard the NLBlock/fc GEMMs, so this proves the sharded
    head math and the local batch slices agree across controllers."""
    shared = tmp_path / "shared"
    shared.mkdir()
    outs = _run_pair(["--mode", "stage2", "--workdir", str(shared),
                      "--model-parallel", "2"])
    s0, s1 = _epoch_stats(outs[0]), _epoch_stats(outs[1])
    assert s0 == s1, f"controllers disagree:\n{outs[0]}\n{outs[1]}"
    sums = [float(re.search(r"bank_sum=([0-9.]+)", o).group(1)) for o in outs]
    assert sums[0] == sums[1]

    spec = importlib.util.spec_from_file_location("multihost_dryrun", _SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    import numpy as np

    from tmrnet_tpu.config import MeshConfig
    from tmrnet_tpu.parallel.mesh import make_mesh
    from tmrnet_tpu.train.loop import build_lfb, train_stage2

    single = tmp_path / "single"
    single.mkdir()
    cfg, train_ds, val_ds = mod.build_synthetic_stage2(str(single))
    mesh = make_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    bank = build_lfb(cfg, mod.stage2_extractor(cfg, train_ds), train_ds,
                     force=True, mesh=mesh)
    ref_sum = float(np.abs(np.asarray(bank.features)).sum())
    assert abs(ref_sum - sums[0]) < 1e-3 * max(1.0, ref_sum)
    _state, hist = train_stage2(cfg, train_ds, bank, val_ds, bank, mesh=mesh)
    assert len(hist) == len(s0)
    for h, (epoch, tr_loss, tr_acc, va_loss, va_acc) in zip(hist, s0):
        assert h.epoch == int(epoch)
        assert abs(h.train_loss - tr_loss) < 1e-3 * max(1.0, tr_loss)
        assert abs(h.val_loss - va_loss) < 1e-3 * max(1.0, va_loss)
        assert abs(h.train_acc - tr_acc) < 1e-3
        assert abs(h.val_acc - va_acc) < 1e-3
