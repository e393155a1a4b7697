"""CLI integration: the full serve chain (test -> export -> evaluate) through
the command-line interface on a tiny config with real files on disk."""

import json

import numpy as np
import pytest

from tmrnet_tpu.cli import main
from tmrnet_tpu.config import (
    DataConfig,
    EvalConfig,
    ExperimentConfig,
    MemoryConfig,
    ModelConfig,
    TrainConfig,
)
from tests.test_cli import _write_frames_tree


@pytest.fixture(scope="module")
def tiny_cfg_json(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cfg")
    cfg = ExperimentConfig(
        data=DataConfig(batch_clips=8, num_workers=2, prefetch=1,
                        sequence_length=4, resize=48, crop_size=48),
        model=ModelConfig(backbone="tiny", stage_sizes=(1, 1), width=8,
                          hidden_dim=16, num_classes=7, head="tmr",
                          compute_dtype="float32"),
        memory=MemoryConfig(window=4, load_cached=False),
        train=TrainConfig(epochs=1, checkpoint_dir=str(tmp / "ckpt")),
        eval=EvalConfig(batch_clips=8),
    )
    p = tmp / "cfg.json"
    p.write_text(cfg.to_json())
    return str(p)


def test_cli_test_export_evaluate_chain(tmp_path, tiny_cfg_json, capsys):
    frames_dir, ann_dir = _write_frames_tree(tmp_path, n_videos=2, seconds=20)
    manifest = tmp_path / "test_paths.pkl"
    assert main(["manifest", "--frames", str(frames_dir),
                 "--annotations", str(ann_dir), "--out", str(manifest)]) == 0
    capsys.readouterr()

    preds_path = tmp_path / "preds.npz"
    lfb_path = tmp_path / "lfb_test.npz"
    assert main(["test", "--config", tiny_cfg_json,
                 "--manifest", str(manifest),
                 "--lfb", str(lfb_path), "--out", str(preds_path)]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["num_clips"] == 2 * (20 - 3)
    assert len(out["precision_per_class"]) == 7
    assert preds_path.exists() and lfb_path.exists()

    data = np.load(preds_path)
    assert data["preds"].shape == (34,)
    assert data["scores"].shape == (34, 7)

    pred_dir, gt_dir = tmp_path / "phase", tmp_path / "gt-phase"
    assert main(["export", "--config", tiny_cfg_json,
                 "--manifest", str(manifest), "--preds", str(preds_path),
                 "--pred-dir", str(pred_dir), "--gt-dir", str(gt_dir)]) == 0
    capsys.readouterr()

    json_out = tmp_path / "report.json"
    assert main(["evaluate", "--pred-dir", str(pred_dir),
                 "--gt-dir", str(gt_dir), "--fps", "1",
                 "--json-out", str(json_out)]) == 0
    rep = json.loads(json_out.read_text())
    assert 0.0 <= rep["mean_accuracy"] <= 100.0
    assert len(rep["jaccard_per_phase"]) == 7


def test_cli_build_lfb_command(tmp_path, tiny_cfg_json, capsys):
    frames_dir, ann_dir = _write_frames_tree(tmp_path, n_videos=1, seconds=10)
    manifest = tmp_path / "m.pkl"
    main(["manifest", "--frames", str(frames_dir), "--annotations",
          str(ann_dir), "--out", str(manifest)])
    out_path = tmp_path / "bank.npz"
    assert main(["build-lfb", "--config", tiny_cfg_json,
                 "--manifest", str(manifest), "--out", str(out_path)]) == 0
    assert out_path.exists()
    from tmrnet_tpu.memory.lfb import load_bank

    bank = load_bank(str(out_path))
    assert bank.num_rows == 10 - 3
    assert bank.feature_dim == 16


def test_cli_train_bank_smoke(tmp_path, tiny_cfg_json, capsys):
    """CLI train-bank end-to-end on a tiny synthetic dataset (1 epoch)."""
    import dataclasses as dc

    from tmrnet_tpu.config import ExperimentConfig

    frames_dir, ann_dir = _write_frames_tree(tmp_path, n_videos=2, seconds=12)
    manifest = tmp_path / "tv.pkl"
    main(["manifest", "--frames", str(frames_dir), "--annotations",
          str(ann_dir), "--out", str(manifest), "--train-videos", "1"])
    capsys.readouterr()

    cfg = ExperimentConfig.from_json(open(tiny_cfg_json).read())
    cfg = dc.replace(
        cfg,
        model=dc.replace(cfg.model, head="stage1"),
        train=dc.replace(cfg.train, epochs=1,
                         checkpoint_dir=str(tmp_path / "ckpt_bank")),
    )
    cfg_path = tmp_path / "bank_cfg.json"
    cfg_path.write_text(cfg.to_json())

    rc = main(["train-bank", "--config", str(cfg_path),
               "--train-manifest", str(manifest),
               "--log-dir", str(tmp_path / "runs")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "best epoch" in out
    import os

    assert os.path.exists(str(tmp_path / "ckpt_bank"))


def test_cli_two_stage_with_orbax_checkpoints(tmp_path, tiny_cfg_json, capsys):
    """CLI chain with orbax checkpoints crossing heads: train-bank ->
    build-lfb --ckpt -> train-tmr --stage1-ckpt (subtree transplant)."""
    import dataclasses as dc

    from tmrnet_tpu.config import ExperimentConfig

    frames_dir, ann_dir = _write_frames_tree(tmp_path, n_videos=2, seconds=12)
    manifest = tmp_path / "tv.pkl"
    main(["manifest", "--frames", str(frames_dir), "--annotations",
          str(ann_dir), "--out", str(manifest), "--train-videos", "1"])

    base = ExperimentConfig.from_json(open(tiny_cfg_json).read())
    bank_dir = str(tmp_path / "ckpt_s1")
    cfg1 = dc.replace(base, model=dc.replace(base.model, head="stage1"),
                      train=dc.replace(base.train, epochs=1,
                                       checkpoint_dir=bank_dir))
    p1 = tmp_path / "c1.json"
    p1.write_text(cfg1.to_json())
    assert main(["train-bank", "--config", str(p1),
                 "--train-manifest", str(manifest),
                 "--log-dir", str(tmp_path / "r1")]) == 0

    lfb = tmp_path / "bank.npz"
    assert main(["build-lfb", "--config", str(p1), "--manifest", str(manifest),
                 "--ckpt", bank_dir, "--out", str(lfb)]) == 0

    cfg2 = dc.replace(base, model=dc.replace(base.model, head="tmr"),
                      train=dc.replace(base.train, epochs=1,
                                       checkpoint_dir=str(tmp_path / "ckpt_s2")))
    p2 = tmp_path / "c2.json"
    p2.write_text(cfg2.to_json())
    assert main(["train-tmr", "--config", str(p2),
                 "--train-manifest", str(manifest), "--lfb", str(lfb),
                 "--stage1-ckpt", bank_dir,
                 "--log-dir", str(tmp_path / "r2")]) == 0
    out = capsys.readouterr().out
    assert "best epoch" in out


def test_cli_test_video_engine_matches_clip(tmp_path, tiny_cfg_json, capsys):
    import json as _json

    frames_dir, ann_dir = _write_frames_tree(tmp_path, n_videos=1, seconds=12)
    manifest = tmp_path / "m.pkl"
    main(["manifest", "--frames", str(frames_dir), "--annotations",
          str(ann_dir), "--out", str(manifest)])
    capsys.readouterr()

    out_clip = tmp_path / "p_clip.npz"
    assert main(["test", "--config", tiny_cfg_json, "--manifest",
                 str(manifest), "--lfb", str(tmp_path / "b.npz"),
                 "--out", str(out_clip)]) == 0
    capsys.readouterr()
    out_video = tmp_path / "p_video.npz"
    assert main(["test", "--config", tiny_cfg_json, "--manifest",
                 str(manifest), "--engine", "video",
                 "--out", str(out_video)]) == 0
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    a = np.load(out_clip)["preds"]
    b = np.load(out_video)["preds"]
    np.testing.assert_array_equal(a, b)
    assert res["num_clips"] == len(b)


def test_cli_stream_matches_video_engine(tmp_path, tiny_cfg_json, capsys):
    """`stream` (online per-frame JSONL) must emit the same predictions as
    `test --engine video` for frames >= seq_len-1, in manifest order."""
    import json as _json

    frames_dir, ann_dir = _write_frames_tree(tmp_path, n_videos=2, seconds=12)
    manifest = tmp_path / "m.pkl"
    main(["manifest", "--frames", str(frames_dir), "--annotations",
          str(ann_dir), "--out", str(manifest)])
    capsys.readouterr()

    out_video = tmp_path / "p_video.npz"
    assert main(["test", "--config", tiny_cfg_json, "--manifest",
                 str(manifest), "--engine", "video",
                 "--out", str(out_video)]) == 0
    capsys.readouterr()

    out_jsonl = tmp_path / "stream.jsonl"
    assert main(["stream", "--config", tiny_cfg_json, "--manifest",
                 str(manifest), "--out", str(out_jsonl)]) == 0
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    rows = [_json.loads(l) for l in out_jsonl.read_text().splitlines()]
    assert summary["streams"] == 2
    # 8 virtual devices -> auto dp8 mesh; slots round up to the data axis
    assert summary["slots"] == 8
    # warmup rows (first seq-1 frames per video) are valid=False, pred=None
    seq = 4
    by_video = {}
    for r in rows:
        by_video.setdefault(r["video"], []).append(r)
    stream_preds = []
    for vid in sorted(by_video):
        vrows = sorted(by_video[vid], key=lambda r: r["frame"])
        assert all(not r["valid"] and r["pred"] is None
                   for r in vrows[:seq - 1])
        assert all(r["valid"] for r in vrows[seq - 1:])
        stream_preds.extend(r["pred"] for r in vrows[seq - 1:])
    np.testing.assert_array_equal(np.load(out_video)["preds"],
                                  np.asarray(stream_preds))
    assert summary["predictions"] == len(stream_preds)

    # the streaming JSONL feeds the same export -> protocol-scoring chain
    pred_dir, gt_dir = tmp_path / "sphase", tmp_path / "sgt"
    assert main(["export", "--config", tiny_cfg_json, "--manifest",
                 str(manifest), "--preds", str(out_jsonl),
                 "--pred-dir", str(pred_dir), "--gt-dir", str(gt_dir)]) == 0
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["num_videos"] == 2
    rep_json = tmp_path / "srep.json"
    assert main(["evaluate", "--pred-dir", str(pred_dir), "--gt-dir",
                 str(gt_dir), "--fps", "1", "--json-out",
                 str(rep_json)]) == 0
    rep = _json.loads(rep_json.read_text())
    assert 0.0 <= rep["mean_accuracy"] <= 100.0


def test_cli_video_engine_corpus_parity(tmp_path, tiny_cfg_json, capsys):
    """`test --engine video --set eval.corpus=true` (flat-stream corpus
    engine, lazy per-video loading) must produce the same npz as the
    per-video engine."""
    frames_dir, ann_dir = _write_frames_tree(tmp_path, n_videos=3, seconds=9)
    manifest = tmp_path / "m.pkl"
    main(["manifest", "--frames", str(frames_dir), "--annotations",
          str(ann_dir), "--out", str(manifest)])
    capsys.readouterr()

    out_a, out_b = tmp_path / "a.npz", tmp_path / "b.npz"
    assert main(["test", "--config", tiny_cfg_json, "--manifest",
                 str(manifest), "--engine", "video",
                 "--out", str(out_a)]) == 0
    assert main(["test", "--config", tiny_cfg_json, "--manifest",
                 str(manifest), "--engine", "video",
                 "--set", "eval.corpus=true",
                 "--set", "eval.corpus_chunk=16",
                 "--out", str(out_b)]) == 0
    capsys.readouterr()
    a, b = np.load(out_a), np.load(out_b)
    np.testing.assert_array_equal(a["preds"], b["preds"])
    np.testing.assert_allclose(a["scores"], b["scores"], atol=1e-5,
                               rtol=1e-4)


def test_cli_stream_slot_multiplexing(tmp_path, tiny_cfg_json, capsys):
    """`stream --max-streams 1` serves all videos sequentially through ONE
    compiled slot (recycled via reset_streams when each video ends) and must
    emit exactly the same rows as the default one-slot-per-video run."""
    import json as _json

    frames_dir, ann_dir = _write_frames_tree(tmp_path, n_videos=3, seconds=10)
    manifest = tmp_path / "m.pkl"
    main(["manifest", "--frames", str(frames_dir), "--annotations",
          str(ann_dir), "--out", str(manifest)])
    capsys.readouterr()

    def run(extra, out_name):
        out = tmp_path / out_name
        # pin dp=1: under the auto mesh (8 CPU devices) slot counts round up
        # to the data axis, which would hide the 1-slot multiplexing behavior
        assert main(["stream", "--config", tiny_cfg_json, "--manifest",
                     str(manifest), "--set", "mesh.data_parallel=1",
                     "--out", str(out)] + extra) == 0
        summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        rows = sorted((_json.loads(l) for l in out.read_text().splitlines()),
                      key=lambda r: (r["video"], r["frame"]))
        return summary, rows

    ref_summary, ref_rows = run([], "wide.jsonl")
    mux_summary, mux_rows = run(["--max-streams", "1"], "mux.jsonl")

    assert ref_summary["slots"] == 3 and mux_summary["slots"] == 1
    assert mux_rows == ref_rows
    assert mux_summary["predictions"] == ref_summary["predictions"]
    assert mux_summary["clip_accuracy"] == ref_summary["clip_accuracy"]
    # one slot serving 3 equal-length videos back-to-back
    assert mux_summary["steps"] == 3 * ref_summary["steps"]


def test_cli_serve_daemon(tmp_path, tiny_cfg_json, capsys):
    """`serve` end to end through the CLI: a protocol file with join, tick,
    end, and recycle events produces prediction rows on stdout and a summary
    (with latency stats) on stderr; state checkpoints land in --state-dir."""
    import json as _json

    from pathlib import Path

    frames_dir, _ = _write_frames_tree(tmp_path, n_videos=2, seconds=8)
    vids = sorted(p for p in Path(frames_dir).iterdir() if p.is_dir())
    v0 = sorted(vids[0].glob("*"))
    v1 = sorted(vids[1].glob("*"))

    proto = tmp_path / "events.jsonl"
    with open(proto, "w") as f:
        for t in range(6):
            f.write(_json.dumps({"id": "or-1", "image": str(v0[t])}) + "\n")
            if t < 4:
                f.write(_json.dumps({"id": "or-2",
                                     "image": str(v1[t])}) + "\n")
            if t == 4:
                f.write(_json.dumps({"id": "or-2", "end": True}) + "\n")
                f.write(_json.dumps({"id": "or-3",
                                     "image": str(v1[0])}) + "\n")
            f.write(_json.dumps({"step": True}) + "\n")

    sdir = tmp_path / "sstate"
    assert main(["serve", "--config", tiny_cfg_json, "--input", str(proto),
                 "--slots", "2", "--probs", "--state-dir", str(sdir),
                 "--set", "mesh.data_parallel=1"]) == 0
    cap = capsys.readouterr()
    rows = [_json.loads(l) for l in cap.out.splitlines()]
    ids = sorted({r["id"] for r in rows if "error" not in r})
    assert ids == ["or-1", "or-2", "or-3"]
    assert any(r["valid"] and len(r["probs"]) == 7 for r in rows)
    summary = _json.loads(cap.err.strip().splitlines()[-1])["summary"]
    assert summary["ticks"] == 6 and "latency_ms" in summary
    assert (sdir / "state.npz").exists()


def test_cli_serve_listen_tcp(tmp_path, tiny_cfg_json, capsys, monkeypatch):
    """`serve --listen` through the CLI: a TCP client drives one stream and
    reads its rows off the socket; the bound address is advertised on
    stderr; --listen + --input is rejected before any model work."""
    import json as _json
    import socket
    import threading
    import time as _time

    from pathlib import Path

    import pytest

    with pytest.raises(SystemExit, match="exclusive"):
        main(["serve", "--config", tiny_cfg_json, "--input", "x.jsonl",
              "--listen", "127.0.0.1:0"])
    capsys.readouterr()

    frames_dir, _ = _write_frames_tree(tmp_path, n_videos=1, seconds=8)
    v0 = sorted(sorted(Path(frames_dir).iterdir())[0].glob("*"))

    # capture the server instance the CLI builds (port 0 = ephemeral; the
    # in-process test needs the bound port before stderr is readable)
    from tmrnet_tpu.eval import serve_net

    created = []
    real = serve_net.JsonlTcpServer

    class _Spy(real):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            created.append(self)

    monkeypatch.setattr(serve_net, "JsonlTcpServer", _Spy)

    got = {}

    def client():
        deadline = _time.monotonic() + 120
        while not created:
            assert _time.monotonic() < deadline, "server never started"
            _time.sleep(0.05)
        srv = created[0]
        sock = socket.create_connection(("127.0.0.1", srv.port),
                                        timeout=120)
        f = sock.makefile("r")
        try:
            for t in range(3):
                sock.sendall(_json.dumps(
                    {"id": "or-1", "image": str(v0[t])}).encode() + b"\n")
                sock.sendall(b'{"step": true}\n')
                got.setdefault("rows", []).append(_json.loads(f.readline()))
        finally:
            sock.shutdown(socket.SHUT_RDWR)
            f.close()
            sock.close()
            srv.stop()   # ends serve_loop -> main() returns

    th = threading.Thread(target=client)
    th.start()
    # main() stays on the main thread (cmd_serve installs signal handlers)
    assert main(["serve", "--config", tiny_cfg_json,
                 "--listen", "127.0.0.1:0", "--slots", "1",
                 "--set", "mesh.data_parallel=1"]) == 0
    th.join(timeout=30)
    assert not th.is_alive()

    rows = got["rows"]
    assert [r["frame"] for r in rows] == [0, 1, 2]
    assert all(r["id"] == "or-1" and "error" not in r for r in rows)
    cap = capsys.readouterr()
    listening = next(_json.loads(l)["listening"]
                     for l in cap.err.splitlines() if "listening" in l)
    assert listening["port"] == created[0].port
    summary = _json.loads(cap.err.strip().splitlines()[-1])["summary"]
    assert summary["rows"] == 3
    # the client's Disconnect races the shutdown sentinel: the stream is
    # either ended by it (0) or still mapped at exit (1) — never negative
    assert summary["live_streams"] in (0, 1)


def test_cli_train_bank_explicit_mesh(tmp_path, tiny_cfg_json, capsys):
    """CLI builds a dp4 x tp2 mesh from --set overrides and trains through it
    (VERDICT r1 item 2: multi-device execution reachable from the CLI)."""
    import dataclasses as dc

    from tmrnet_tpu.config import ExperimentConfig

    frames_dir, ann_dir = _write_frames_tree(tmp_path, n_videos=2, seconds=12)
    manifest = tmp_path / "tv.pkl"
    main(["manifest", "--frames", str(frames_dir), "--annotations",
          str(ann_dir), "--out", str(manifest), "--train-videos", "1"])
    capsys.readouterr()

    cfg = ExperimentConfig.from_json(open(tiny_cfg_json).read())
    cfg = dc.replace(
        cfg,
        model=dc.replace(cfg.model, head="stage1"),
        train=dc.replace(cfg.train, epochs=1,
                         checkpoint_dir=str(tmp_path / "ckpt_mesh")),
    )
    cfg_path = tmp_path / "mesh_cfg.json"
    cfg_path.write_text(cfg.to_json())

    rc = main(["train-bank", "--config", str(cfg_path),
               "--train-manifest", str(manifest),
               "--set", "mesh.data_parallel=4",
               "--set", "mesh.model_parallel=2",
               "--log-dir", str(tmp_path / "runs")])
    assert rc == 0
    assert "best epoch" in capsys.readouterr().out


def test_cli_mesh_batch_divisibility_error(tmp_path, tiny_cfg_json, capsys):
    frames_dir, ann_dir = _write_frames_tree(tmp_path, n_videos=2, seconds=12)
    manifest = tmp_path / "tv.pkl"
    main(["manifest", "--frames", str(frames_dir), "--annotations",
          str(ann_dir), "--out", str(manifest), "--train-videos", "1"])
    capsys.readouterr()
    with pytest.raises(SystemExit, match="divisible"):
        main(["train-bank", "--config", tiny_cfg_json,
              "--train-manifest", str(manifest),
              "--set", "mesh.data_parallel=3",
              "--log-dir", str(tmp_path / "runs")])


def test_cli_parity_command_from_torch_pth(tmp_path, capsys):
    """The one-command parity recipe: a reference-format .pth (synthetic
    weights, full TMRNet structure) + frames dir -> Main.m-format table."""
    import torch

    from tests.test_e2e_logits_parity import TorchTMRNet

    frames_dir, ann_dir = _write_frames_tree(tmp_path, n_videos=2, seconds=15)
    manifest = tmp_path / "test_paths.pkl"
    main(["manifest", "--frames", str(frames_dir),
          "--annotations", str(ann_dir), "--out", str(manifest)])
    capsys.readouterr()

    pth = tmp_path / "tmrnet.pth"
    torch.save(TorchTMRNet().state_dict(), str(pth))

    json_out = tmp_path / "parity.json"
    rc = main(["parity", "--manifest", str(manifest),
               "--torch-ckpt", str(pth),
               "--workdir", str(tmp_path / "pw"),
               "--json-out", str(json_out),
               "--set", "model.backbone=tiny", "--set", "model.stage_sizes=1,1",
               "--set", "model.width=8", "--set", "model.hidden_dim=32",
               "--set", "model.num_classes=7", "--set", "model.head=tmr",
               "--set", "memory.window=6",
               "--set", "data.sequence_length=4", "--set", "data.crop_size=48",
               "--set", "data.resize=56", "--set", "data.batch_clips=8",
               "--set", "data.num_workers=2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Phase|" in out and "Mean jaccard" in out
    rep = json.loads(json_out.read_text())
    assert 0.0 <= rep["mean_accuracy"] <= 100.0
    assert len(rep["jaccard_per_phase"]) == 7
    assert (tmp_path / "pw" / "predictions.npz").exists()


def test_cli_test_video_engine_batched_matches_sequential(tmp_path,
                                                          tiny_cfg_json,
                                                          capsys):
    """eval.video_batch > 1 groups same-bucket videos through run_videos;
    outputs must equal the per-video engine (mixed lengths included)."""
    frames_dir, ann_dir = _write_frames_tree(tmp_path, n_videos=3, seconds=12)
    # make lengths differ: drop frames from one video
    import os

    v3 = sorted(os.listdir(frames_dir / "video03"))
    for f in v3[-4:]:
        os.remove(frames_dir / "video03" / f)
    manifest = tmp_path / "m.pkl"
    main(["manifest", "--frames", str(frames_dir), "--annotations",
          str(ann_dir), "--out", str(manifest)])
    capsys.readouterr()

    out_seq = tmp_path / "p_seq.npz"
    assert main(["test", "--config", tiny_cfg_json, "--manifest",
                 str(manifest), "--engine", "video",
                 "--out", str(out_seq)]) == 0
    capsys.readouterr()
    out_bat = tmp_path / "p_bat.npz"
    assert main(["test", "--config", tiny_cfg_json, "--manifest",
                 str(manifest), "--engine", "video",
                 "--set", "eval.video_batch=3",
                 "--out", str(out_bat)]) == 0
    capsys.readouterr()
    np.testing.assert_array_equal(np.load(out_seq)["preds"],
                                  np.load(out_bat)["preds"])
    np.testing.assert_allclose(np.load(out_seq)["scores"],
                               np.load(out_bat)["scores"],
                               atol=1e-5, rtol=1e-4)


def test_cli_ref_pickle_roundtrip(tmp_path, tiny_cfg_json, capsys):
    """Reference prediction-pickle interop: `test --ref-pickle` writes the
    reference's pickle pair (`test_..._2fc_copy.py:443-450`), and `export`
    consumes a reference-format .pkl, producing the same txt tree as the
    npz path."""
    import pickle

    frames_dir, ann_dir = _write_frames_tree(tmp_path, n_videos=2, seconds=12)
    manifest = tmp_path / "tp.pkl"
    assert main(["manifest", "--frames", str(frames_dir),
                 "--annotations", str(ann_dir), "--out", str(manifest)]) == 0
    capsys.readouterr()

    preds_path = tmp_path / "preds.npz"
    ref_pkl = tmp_path / "model_test.pkl"
    assert main(["test", "--config", tiny_cfg_json,
                 "--manifest", str(manifest), "--lfb",
                 str(tmp_path / "lfb.npz"), "--out", str(preds_path),
                 "--ref-pickle", str(ref_pkl)]) == 0
    capsys.readouterr()
    with open(ref_pkl, "rb") as f:
        ref_preds = pickle.load(f)
    npz = np.load(preds_path)
    assert ref_preds == [int(x) for x in npz["preds"]]
    # the reference score pickle holds per-clip MAX softmax probabilities
    # (`test_..._2fc_copy.py:421-426`), one scalar per clip
    with open(str(ref_pkl) + ".score.pkl", "rb") as f:
        scores = pickle.load(f)
    assert isinstance(scores, list) and all(
        isinstance(s, float) for s in scores)
    np.testing.assert_allclose(scores, npz["scores"].max(axis=1),
                               atol=1e-7)

    def run_export(preds_file, tag):
        pd, gd = tmp_path / f"p{tag}", tmp_path / f"g{tag}"
        assert main(["export", "--config", tiny_cfg_json,
                     "--manifest", str(manifest), "--preds", str(preds_file),
                     "--pred-dir", str(pd), "--gt-dir", str(gd)]) == 0
        capsys.readouterr()
        import os

        return {f: open(os.path.join(pd, f)).read()
                for f in sorted(os.listdir(pd))}

    assert run_export(preds_path, "npz") == run_export(ref_pkl, "pkl")

    # the REAL reference on-disk format holds 0-d torch tensors
    # (`test_..._2fc_copy.py:424`: preds.append(preds[i].data.cpu())) —
    # export must consume that too
    import torch

    torch_pkl = tmp_path / "model_test_torch.pkl"
    with open(torch_pkl, "wb") as f:
        pickle.dump([torch.tensor(int(x)) for x in npz["preds"]], f)
    assert run_export(torch_pkl, "tpkl") == run_export(preds_path, "npz")


def test_cli_train_preempted_empty_history_exits_clean(
        tmp_path, tiny_cfg_json, capsys, monkeypatch):
    """A preemption before the first completed epoch returns an empty
    history; the CLI must exit 0 with a resume hint, not crash on
    max() of an empty sequence (found by the SIGTERM e2e drive)."""
    import tmrnet_tpu.train.loop as loop_mod

    frames_dir, ann_dir = _write_frames_tree(tmp_path, n_videos=2, seconds=8)
    manifest = tmp_path / "tv.pkl"
    main(["manifest", "--frames", str(frames_dir), "--annotations",
          str(ann_dir), "--out", str(manifest), "--train-videos", "1"])
    capsys.readouterr()

    monkeypatch.setattr(loop_mod, "train_stage1",
                        lambda *a, **k: (None, []))
    rc = main(["train-bank", "--config", tiny_cfg_json,
               "--train-manifest", str(manifest)])
    assert rc == 0
    assert "preempted" in capsys.readouterr().out


def test_cli_train_bank_device_normalize(tmp_path, tiny_cfg_json, capsys):
    """The uint8 training wire (data.device_normalize): the dataset emits
    raw uint8 and the jitted step normalizes — one epoch end to end."""
    import dataclasses as dc

    from tmrnet_tpu.config import ExperimentConfig

    frames_dir, ann_dir = _write_frames_tree(tmp_path, n_videos=1, seconds=10)
    manifest = tmp_path / "tv.pkl"
    main(["manifest", "--frames", str(frames_dir), "--annotations",
          str(ann_dir), "--out", str(manifest), "--train-videos", "1"])
    capsys.readouterr()

    cfg = ExperimentConfig.from_json(open(tiny_cfg_json).read())
    cfg = dc.replace(
        cfg,
        model=dc.replace(cfg.model, head="stage1"),
        data=dc.replace(cfg.data, device_normalize=True),
        train=dc.replace(cfg.train, epochs=1,
                         checkpoint_dir=str(tmp_path / "ckpt_u8")),
    )
    cfg_path = tmp_path / "u8_cfg.json"
    cfg_path.write_text(cfg.to_json())
    rc = main(["train-bank", "--config", str(cfg_path),
               "--train-manifest", str(manifest)])
    assert rc == 0
    assert "best epoch" in capsys.readouterr().out


def test_cli_test_rejects_lfb_head_and_stray_bank_flags(tiny_cfg_json):
    """Misconfiguration guards in cmd_test (ADVICE r4): head='lfb' emits
    features, not logits — scoring it must refuse loudly (previously the
    memoryless gate matched it and softmax'd hidden_dim pseudo-classes);
    and a frame-only head passed an explicit --lfb bank must error instead
    of silently ignoring it (a likely mis-set model.head). Both guards
    fire before any file access."""
    import pytest

    with pytest.raises(SystemExit, match="feature extractor"):
        main(["test", "--config", tiny_cfg_json, "--manifest", "nope.pkl",
              "--ckpt", "nope", "--set", "model.head=lfb"])
    with pytest.raises(SystemExit, match="frame-only"):
        main(["test", "--config", tiny_cfg_json, "--manifest", "nope.pkl",
              "--ckpt", "nope", "--set", "model.head=stage1",
              "--lfb", "bank.npz"])


def test_clip_inference_rejects_lfb_head(tiny_cfg_json):
    """ClipInference shares the same gate: constructing it with the
    extractor head raises instead of silently producing garbage scores."""
    import pytest

    from tmrnet_tpu.config import ExperimentConfig
    from tmrnet_tpu.eval.infer import ClipInference

    import dataclasses as dc

    cfg = ExperimentConfig.from_json(open(tiny_cfg_json).read())
    cfg = dc.replace(cfg, model=dc.replace(cfg.model, head="lfb"))
    with pytest.raises(ValueError, match="feature extractor"):
        ClipInference(cfg, variables={})
