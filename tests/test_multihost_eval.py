"""Multi-controller evaluation + >=4-process hardening (VERDICT r3 #2/#3).

Real OS processes, virtual CPU devices, jax.distributed rendezvous — the
same harness as tests/test_multihost.py, covering:

* 2-process distributed corpus protocol evaluation: videos partition
  across controllers, predictions all-gather, and BOTH processes print a
  protocol table byte-identical to the single-process run's.
* 4-process x 2-device local-feed stage-1 training + cross-controller
  resume (everything else in the suite stops at 2 processes).
* the process-interleaved mesh fallback: process_local_bounds raises, the
  trainer feeds full global batches instead, results unchanged.
"""

import importlib.util
import os
import re
import socket
import subprocess
import sys

import pytest

_SCRIPT = os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                       "multihost_dryrun.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_procs(num_processes: int, local_devices: int, extra_args,
               timeout: int = 540):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # children host their own virtual devices
    procs = [
        subprocess.Popen(
            [sys.executable, _SCRIPT, "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", str(num_processes), "--process-id", str(i),
             "--local-devices", str(local_devices)] + extra_args,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for i in range(num_processes)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
    return outs


def _load_dryrun():
    spec = importlib.util.spec_from_file_location("multihost_dryrun", _SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_EPOCH_RE = re.compile(
    r"stage\d proc \d: epoch=(\d+) train_loss=([0-9.]+) train_acc=([0-9.]+) "
    r"val_loss=([0-9.]+) val_acc=([0-9.]+)")


def _epoch_stats(out):
    stats = [tuple(float(g) for g in m.groups())
             for m in _EPOCH_RE.finditer(out)]
    assert stats, f"no epoch lines:\n{out}"
    return stats


def _table_of(out: str) -> str:
    i = out.index("=" * 48)
    return out[i:].strip()


def test_two_process_corpus_eval_matches_single_process():
    """Distributed protocol evaluation: both controllers print the same
    prediction checksum and a protocol table BYTE-IDENTICAL to the
    single-process run over the same manifest."""
    outs = _run_procs(2, 4, ["--mode", "eval"])
    shas = [re.search(r"preds_sha=([0-9a-f]+)", o).group(1) for o in outs]
    assert shas[0] == shas[1]
    tables = [_table_of(o) for o in outs]
    assert tables[0] == tables[1]

    # single-process reference: identical synthetic setup, plain engine
    import hashlib

    import numpy as np

    mod = _load_dryrun()
    from tmrnet_tpu.eval.infer import VideoInference
    from tmrnet_tpu.eval.metrics import evaluate_protocol

    cfg, vids, labs, variables, ev = mod.build_synthetic_eval()
    results = VideoInference(cfg, variables, ev).run_corpus(
        vids, chunk=cfg.eval.corpus_chunk)
    seq = cfg.data.sequence_length
    rep = evaluate_protocol([l[seq - 1:] for l in labs],
                            [p for p, _ in results], protocol="cholec80")
    digest = hashlib.sha256(np.concatenate(
        [p for p, _ in results]).astype(np.int64).tobytes()).hexdigest()[:16]
    assert digest == shas[0], "distributed preds differ from single-process"
    assert rep.format_table() == tables[0]


def test_three_process_corpus_eval_uneven_partition():
    """3 controllers x 2 devices over 5 videos: the longest-first partition
    is uneven (2/2/1), and every process still prints the identical
    prediction checksum and protocol table."""
    outs = _run_procs(3, 2, ["--mode", "eval"])
    shas = {re.search(r"preds_sha=([0-9a-f]+)", o).group(1) for o in outs}
    assert len(shas) == 1, f"checksums diverge: {shas}"
    tables = {_table_of(o) for o in outs}
    assert len(tables) == 1

    # sanity: the partition really is uneven at these counts
    from tmrnet_tpu.eval.distributed import partition_videos

    mod = _load_dryrun()
    _cfg, vids, _labs, _v, _ev = mod.build_synthetic_eval()
    parts = partition_videos([v.shape[0] for v in vids], 3)
    assert sorted(len(p) for p in parts) == [1, 2, 2]


def test_four_process_stage1_local_feed_and_resume(tmp_path):
    """4 controllers x 2 devices: local-feed training agrees across all
    four processes, and a relaunch resumes from the shared checkpoint."""
    shared = tmp_path / "shared"
    shared.mkdir()
    outs = _run_procs(4, 2, ["--mode", "stage1", "--workdir", str(shared),
                             "--epochs", "2"])
    stats = [_epoch_stats(o) for o in outs]
    assert all(s == stats[0] for s in stats[1:]), "controllers disagree"
    assert [int(e[0]) for e in stats[0]] == [0, 1]

    # resume across 4 controllers: only epochs 2-3 run
    outs2 = _run_procs(4, 2, ["--mode", "stage1", "--workdir", str(shared),
                              "--epochs", "4"])
    stats2 = [_epoch_stats(o) for o in outs2]
    assert all(s == stats2[0] for s in stats2[1:])
    assert [int(e[0]) for e in stats2[0]] == [2, 3], "not a resume"

    # the global mesh is the same dp=8 as the single-process comparison
    mod = _load_dryrun()
    from tmrnet_tpu.config import MeshConfig
    from tmrnet_tpu.parallel.mesh import make_mesh
    from tmrnet_tpu.train.loop import train_stage1

    single = tmp_path / "single"
    single.mkdir()
    cfg, train_ds, val_ds = mod.build_synthetic_stage1(str(single), epochs=4)
    mesh = make_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    _state, hist = train_stage1(cfg, train_ds, val_ds, mesh=mesh)
    full = stats[0] + stats2[0]
    assert len(hist) == len(full)
    for h, (epoch, tr_loss, tr_acc, va_loss, va_acc) in zip(hist, full):
        assert h.epoch == int(epoch)
        assert abs(h.train_loss - tr_loss) < 1e-3 * max(1.0, tr_loss)
        assert abs(h.val_loss - va_loss) < 1e-3 * max(1.0, va_loss)
        assert abs(h.train_acc - tr_acc) < 1e-3
        assert abs(h.val_acc - va_acc) < 1e-3


_CLI_CHILD = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
from tmrnet_tpu.cli import main
sys.exit(main(sys.argv[1:]))
"""


_CLI_OV = []
for _s in ("data.crop_size=20", "data.resize=24",
           "data.mean=0.5,0.5,0.5", "data.std=0.25,0.25,0.25",
           "data.sequence_length=6", "data.batch_clips=8",
           "data.num_workers=2", "data.prefetch=2",
           "model.backbone=tiny", "model.hidden_dim=32",
           "model.compute_dtype=float32", "memory.window=8",
           "train.seed=0", "train.schedule=constant",
           "train.log_every=1000", "train.epochs=1", "train.lr=0.001"):
    _CLI_OV += ["--set", _s]


def _run_cli(argv):
    from tmrnet_tpu.cli import main as cli_main

    assert cli_main([str(a) for a in argv]) == 0, argv


@pytest.fixture(scope="module")
def cli_workdir(tmp_path_factory):
    """Shared synthetic dataset + trained stage-1/TMR checkpoints for the
    user-facing CLI multihost tests (built once, in-process)."""
    work = str(tmp_path_factory.mktemp("cli_mh"))
    _run_cli(["synth", "--out-dir", work, "--train", 2, "--val", 1,
              "--test", 3, "--hw", 24, "--dur-min", 8, "--dur-max", 12,
              "--seed", 0])
    for split in ("train", "val", "test"):
        _run_cli(["manifest", "--frames", f"{work}/frames-{split}",
                  "--annotations", f"{work}/annotations",
                  "--stride", 1, "--out", f"{work}/{split}.pkl"])
    s1 = f"{work}/ckpt-s1"
    _run_cli(["train-bank", "--train-manifest", f"{work}/train.pkl",
              "--val-manifest", f"{work}/val.pkl",
              "--log-dir", f"{work}/logs-s1", *_CLI_OV,
              "--set", "train.lr=0.05",
              "--set", f"train.checkpoint_dir={s1}"])
    for split in ("train", "val"):
        _run_cli(["build-lfb", "--manifest", f"{work}/{split}.pkl",
                  "--ckpt", s1, "--out", f"{work}/lfb_{split}.npz",
                  *_CLI_OV])
    tmr = f"{work}/ckpt-tmr"
    _run_cli(["train-tmr", "--train-manifest", f"{work}/train.pkl",
              "--val-manifest", f"{work}/val.pkl",
              "--lfb", f"{work}/lfb_train.npz",
              "--val-lfb", f"{work}/lfb_val.npz",
              "--stage1-ckpt", s1, "--log-dir", f"{work}/logs-tmr",
              *_CLI_OV, "--set", f"train.checkpoint_dir={tmr}"])
    return work


def _run_cli_children(args, work, num_processes=2):
    """Launch `num_processes` real CLI children with rendezvous knobs."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    mh = ["--set", "mesh.multihost=true",
          "--set", f"mesh.coordinator=127.0.0.1:{port}",
          "--set", f"mesh.num_processes={num_processes}"]
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CLI_CHILD] + [str(a) for a in args]
            + mh + ["--set", f"mesh.process_id={i}"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))))
        for i in range(num_processes)
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
    return outs


def test_two_process_cli_test_matches_single_process(cli_workdir):
    """The USER-FACING distributed-eval path from docs/SCALING.md: two
    processes run the real CLI (`test --set mesh.multihost=true` with
    rendezvous knobs) against a shared manifest + trained checkpoints, and
    process 0's preds.npz is identical to a single-process run's."""
    import json

    import numpy as np

    work = cli_workdir
    test_args = ["test", "--manifest", f"{work}/test.pkl",
                 "--ckpt", f"{work}/ckpt-tmr",
                 "--extractor-ckpt", f"{work}/ckpt-s1", *_CLI_OV]
    _run_cli(test_args + ["--out", f"{work}/preds_single.npz"])

    outs = _run_cli_children(test_args + ["--out", f"{work}/preds_mh.npz"],
                             work)
    # process 0 is the single writer/reporter (process 1 exits quietly)
    j0 = [ln for ln in outs[0].splitlines() if ln.startswith("{")]
    assert "clip_accuracy" in json.loads(j0[-1]), outs[0]
    assert not [ln for ln in outs[1].splitlines()
                if ln.startswith("{") and "clip_accuracy" in ln], outs[1]

    single = np.load(f"{work}/preds_single.npz")
    mh_out = np.load(f"{work}/preds_mh.npz")
    np.testing.assert_array_equal(single["preds"], mh_out["preds"])
    np.testing.assert_allclose(single["scores"], mh_out["scores"],
                               rtol=1e-6)
    np.testing.assert_array_equal(single["rows"], mh_out["rows"])


def test_two_process_cli_build_lfb_matches_single_process(cli_workdir):
    """Distributed bank build: two processes run the real CLI
    (`build-lfb --set mesh.multihost=true`), each extracting its video
    partition with the video engine (one backbone pass per frame), and
    process 0's .npz bank equals the single-process video build's."""
    import numpy as np

    work = cli_workdir
    lfb_args = ["build-lfb", "--manifest", f"{work}/test.pkl",
                "--ckpt", f"{work}/ckpt-s1", "--engine", "video", *_CLI_OV]
    _run_cli(lfb_args + ["--out", f"{work}/lfb_single.npz"])

    outs = _run_cli_children(lfb_args + ["--out", f"{work}/lfb_mh.npz"],
                             work)
    assert "bank:" in outs[0]
    assert "bank:" not in outs[1]          # one writer/reporter

    single = np.load(f"{work}/lfb_single.npz")
    mh_out = np.load(f"{work}/lfb_mh.npz")
    np.testing.assert_array_equal(single["first_rows"],
                                  mh_out["first_rows"])
    np.testing.assert_allclose(single["features"], mh_out["features"],
                               rtol=1e-6, atol=1e-7)
    assert float(np.abs(mh_out["features"]).sum()) > 0  # not all-zero


def test_interleaved_mesh_falls_back_to_global_feed(tmp_path):
    """A mesh whose data axis interleaves the two processes: the local-feed
    optimization is impossible (process_local_bounds raises), _BatchFeed
    falls back to full global batches, and training still completes with
    both controllers in agreement."""
    shared = tmp_path / "shared"
    shared.mkdir()
    outs = _run_procs(2, 4, ["--mode", "stage1", "--workdir", str(shared),
                             "--interleave-data-axis"])
    s0, s1 = _epoch_stats(outs[0]), _epoch_stats(outs[1])
    assert s0 == s1, f"controllers disagree:\n{outs[0]}\n{outs[1]}"
    assert [int(e[0]) for e in s0] == [0, 1]


def test_three_process_cli_test_matches_single_process(cli_workdir):
    """VERDICT r4 weak #4: the user-facing CLI multihost eval at >=3
    processes (the API was 3-proc tested; the round-4 orbax restore bug was
    only visible at CLI level, so the CLI path needs the same lens). Three
    controllers split the 3 test videos 1/1/1; process 0's preds.npz is
    identical to a single-process run's and the other processes stay
    silent."""
    import json

    import numpy as np

    work = cli_workdir
    test_args = ["test", "--manifest", f"{work}/test.pkl",
                 "--ckpt", f"{work}/ckpt-tmr",
                 "--extractor-ckpt", f"{work}/ckpt-s1", *_CLI_OV]
    _run_cli(test_args + ["--out", f"{work}/preds_single3.npz"])

    outs = _run_cli_children(test_args + ["--out", f"{work}/preds_mh3.npz"],
                             work, num_processes=3)
    j0 = [ln for ln in outs[0].splitlines() if ln.startswith("{")]
    assert "clip_accuracy" in json.loads(j0[-1]), outs[0]
    for out in outs[1:]:
        assert not [ln for ln in out.splitlines()
                    if ln.startswith("{") and "clip_accuracy" in ln], out

    single = np.load(f"{work}/preds_single3.npz")
    mh_out = np.load(f"{work}/preds_mh3.npz")
    np.testing.assert_array_equal(single["preds"], mh_out["preds"])
    np.testing.assert_allclose(single["scores"], mh_out["scores"],
                               rtol=1e-6)
    np.testing.assert_array_equal(single["rows"], mh_out["rows"])


def test_two_process_cli_stream_matches_single_process(cli_workdir):
    """VERDICT r4 missing #3 (multihost serving): `stream --set
    mesh.multihost=true` partitions the manifest's streams across
    controllers — each process runs its own single-controller engine over
    its local devices, rows all-gather, process 0 writes the merged JSONL.
    Per-stream prediction sequences are identical to the single-process
    run (the merged file groups rows per video; the live tick interleaving
    is process-local)."""
    import json

    work = cli_workdir
    stream_args = ["stream", "--manifest", f"{work}/test.pkl",
                   "--ckpt", f"{work}/ckpt-tmr",
                   "--extractor-ckpt", f"{work}/ckpt-s1", *_CLI_OV]
    _run_cli(stream_args + ["--out", f"{work}/stream_single.jsonl"])

    outs = _run_cli_children(
        stream_args + ["--out", f"{work}/stream_mh.jsonl"], work)
    j0 = [ln for ln in outs[0].splitlines() if ln.startswith("{")]
    summary = json.loads(j0[-1])
    assert summary["processes"] == 2, outs[0]
    assert not [ln for ln in outs[1].splitlines()
                if ln.startswith("{") and "clip_accuracy" in ln], outs[1]

    def rows_by_video(path):
        by = {}
        for ln in open(path):
            r = json.loads(ln)
            by.setdefault(r["video"], []).append(
                (r["frame"], r["pred"], r["valid"]))
        return {k: sorted(v) for k, v in by.items()}

    single = rows_by_video(f"{work}/stream_single.jsonl")
    merged = rows_by_video(f"{work}/stream_mh.jsonl")
    assert single == merged
