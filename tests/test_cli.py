"""CLI tests: config plumbing, overrides, and the manifest/export/evaluate
subcommands end-to-end on synthetic files (heavy train paths are covered by
test_e2e_training)."""

import json
import os
import pickle

import numpy as np
import pytest

from tmrnet_tpu.cli import apply_override, build_parser, load_config, main
from tmrnet_tpu.config import CHOLEC80_PHASES, ExperimentConfig


def test_apply_override_types():
    cfg = ExperimentConfig()
    cfg = apply_override(cfg, "data.batch_clips=64")
    assert cfg.data.batch_clips == 64
    cfg = apply_override(cfg, "train.lr=0.001")
    assert cfg.train.lr == 0.001
    cfg = apply_override(cfg, "model.backbone=resnest50")
    assert cfg.model.backbone == "resnest50"
    cfg = apply_override(cfg, "train.resume=false")
    assert cfg.train.resume is False
    cfg = apply_override(cfg, "model.stage_sizes=1,1")
    assert cfg.model.stage_sizes == (1, 1)
    cfg = apply_override(cfg, "name=exp42")
    assert cfg.name == "exp42"


def test_load_config_roundtrip(tmp_path):
    cfg = ExperimentConfig().replace(name="roundtrip")
    p = tmp_path / "cfg.json"
    p.write_text(cfg.to_json())
    args = build_parser().parse_args(
        ["train-bank", "--config", str(p), "--set", "train.epochs=3"])
    loaded = load_config(args)
    assert loaded.name == "roundtrip"
    assert loaded.train.epochs == 3


def test_preset_selection():
    args = build_parser().parse_args(["train-tmr", "--preset", "tmr-resnest50",
                                      "--lfb", "x.npz"])
    cfg = load_config(args)
    assert cfg.model.backbone == "resnest50"
    assert cfg.train.lr == 5e-7


def _write_frames_tree(tmp_path, n_videos=2, seconds=30):
    import cv2

    frames_dir = tmp_path / "frames"
    ann_dir = tmp_path / "ann"
    ann_dir.mkdir()
    rng = np.random.RandomState(0)
    for v in range(1, n_videos + 1):
        vdir = frames_dir / f"video{v:02d}"
        vdir.mkdir(parents=True)
        with open(ann_dir / f"video{v:02d}-phase.txt", "w") as f:
            f.write("Frame\tPhase\n")
            for k in range(seconds * 25):
                f.write(f"{k}\t{CHOLEC80_PHASES[(k // 250) % 7]}\n")
        for k in range(0, seconds * 25, 25):
            img = rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
            cv2.imwrite(str(vdir / f"frame{k}.png"), img)
    return frames_dir, ann_dir


def test_manifest_export_evaluate_pipeline(tmp_path, capsys):
    frames_dir, ann_dir = _write_frames_tree(tmp_path)
    manifest_path = tmp_path / "test_paths.pkl"
    assert main(["manifest", "--frames", str(frames_dir),
                 "--annotations", str(ann_dir),
                 "--out", str(manifest_path)]) == 0
    assert manifest_path.exists()

    # fabricate perfect clip predictions and export
    from tmrnet_tpu.data.manifests import load_pickle_manifest

    m, _ = load_pickle_manifest(str(manifest_path))
    seq = 10
    preds = np.concatenate([
        v.labels[seq - 1:] for v in m.videos])
    preds_path = tmp_path / "preds.npz"
    np.savez(preds_path, preds=preds, scores=np.zeros((len(preds), 7)),
             rows=np.arange(len(preds)))

    pred_dir, gt_dir = tmp_path / "phase", tmp_path / "gt-phase"
    assert main(["export", "--manifest", str(manifest_path),
                 "--preds", str(preds_path),
                 "--pred-dir", str(pred_dir), "--gt-dir", str(gt_dir)]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["num_videos"] == 2

    json_out = tmp_path / "report.json"
    assert main(["evaluate", "--pred-dir", str(pred_dir),
                 "--gt-dir", str(gt_dir), "--fps", "1",
                 "--json-out", str(json_out)]) == 0
    rep = json.loads(json_out.read_text())
    # only the first seq-1 padded frames of each video can be wrong
    assert rep["mean_accuracy"] > 90.0


def test_stats_command(tmp_path, capsys):
    frames_dir, ann_dir = _write_frames_tree(tmp_path, n_videos=1, seconds=5)
    manifest_path = tmp_path / "m.pkl"
    main(["manifest", "--frames", str(frames_dir), "--annotations",
          str(ann_dir), "--out", str(manifest_path)])
    capsys.readouterr()
    assert main(["stats", "--manifest", str(manifest_path)]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["mean"]) == 3 and 0.3 < out["mean"][0] < 0.7
    # the worker-pool decode path accumulates in order: identical stats
    assert main(["stats", "--manifest", str(manifest_path),
                 "--workers", "2"]) == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2 == out
    # population / no-resize escape hatches run and differ in kind
    assert main(["stats", "--manifest", str(manifest_path),
                 "--population", "--no-resize"]) == 0
    out3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out3["std"]) == 3


def test_doctor_basic(capsys):
    assert main(["doctor"]) == 0
    out = capsys.readouterr().out
    assert "versions" in out and "devices" in out
    assert "doctor:" in out and " 0 fail" in out


def test_doctor_artifacts(tmp_path, capsys):
    import jax.numpy as jnp

    from tmrnet_tpu.data.manifests import Manifest, VideoRecord, \
        save_pickle_manifest
    from tmrnet_tpu.memory.lfb import FeatureBank, save_bank

    m = Manifest([VideoRecord("v1", [str(tmp_path / "missing.png")] * 12,
                              np.zeros(12, np.int64))])
    man_path = tmp_path / "m.pkl"
    save_pickle_manifest(str(man_path), m)
    bank = FeatureBank.create(10, [12], 512, jnp.float32)
    lfb_path = tmp_path / "b.npz"
    save_bank(str(lfb_path), bank)
    ckpt_dir = tmp_path / "ckpts"
    ckpt_dir.mkdir()

    assert main(["doctor", "--manifest", str(man_path),
                 "--lfb", str(lfb_path), "--checkpoint", str(ckpt_dir)]) == 0
    out = capsys.readouterr().out
    assert "1 videos, 12 frames" in out          # manifest loads
    assert "first frame missing" in out          # ...but paths warn
    assert "(3, 512)" in out                     # 12 frames, seq 10 -> 3 clips
    assert "no steps found" in out               # empty ckpt dir warns

    # corrupt artifacts are hard failures
    bad = tmp_path / "bad.npz"
    bad.write_bytes(b"not an npz")
    assert main(["doctor", "--lfb", str(bad)]) == 1
    assert "1 fail" in capsys.readouterr().out


def test_doctor_mesh_and_smoke(capsys):
    assert main(["doctor", "--mesh", "--smoke",
                 "--set", "mesh.data_parallel=4",
                 "--set", "mesh.model_parallel=2"]) == 0
    out = capsys.readouterr().out
    assert "'data': 4" in out and "'model': 2" in out
    assert "jit matmul" in out


def test_export_roundtrip_fuzz(tmp_path):
    """Random manifests (including videos shorter than seq_len) through
    export -> read-back -> evaluate: per-video row counts must equal video
    length, warmup positions pad with phase 0, and a wrong prediction count
    must raise rather than shift every later video."""
    from tmrnet_tpu.data.indexing import clips_per_video
    from tmrnet_tpu.data.manifests import Manifest, VideoRecord
    from tmrnet_tpu.eval.export import export_predictions, load_exported
    from tmrnet_tpu.eval.metrics import evaluate_protocol

    rng = np.random.RandomState(3)
    seq = 10
    for case in range(8):
        lengths = rng.randint(1, 40, size=rng.randint(1, 6))
        videos = [
            VideoRecord(f"v{i:02d}", [f"f{k}.png" for k in range(n)],
                        rng.randint(0, 7, n).astype(np.int64))
            for i, n in enumerate(lengths)]
        m = Manifest(videos)
        n_clips = int(clips_per_video(seq, lengths).sum())
        preds = rng.randint(0, 7, n_clips).astype(np.int64)
        pred_dir = str(tmp_path / f"c{case}" / "pred")
        gt_dir = str(tmp_path / f"c{case}" / "gt")
        stats = export_predictions(m, preds, seq, pred_dir, gt_dir, fps=25)
        assert stats["num_frames"] == int(lengths.sum())

        gts, ps = load_exported(pred_dir, gt_dir,
                                [v.video_id for v in m.videos])
        ofs = 0
        for v, g, p in zip(videos, gts, ps):
            assert len(g) == len(p) == len(v)
            np.testing.assert_array_equal(g, v.labels)
            pad = min(seq - 1, len(v))
            np.testing.assert_array_equal(p[:pad], 0)  # warmup padding
            k = len(v) - pad
            np.testing.assert_array_equal(p[pad:], preds[ofs:ofs + k])
            ofs += k
        assert ofs == n_clips

        rep = evaluate_protocol(gts, ps, fps=1)   # scorer accepts roundtrip
        assert 0.0 <= rep.mean_accuracy <= 100.0

        with pytest.raises(ValueError):
            export_predictions(m, np.append(preds, 0), seq, pred_dir, gt_dir)


def test_evaluate_video_range_and_relaxed_seconds(tmp_path, capsys):
    """--video-range applies Main.m's numeric-range iteration to the gt-dir
    listing; --relaxed-seconds reaches the scorer (0 = strict boundaries)."""
    from tmrnet_tpu.eval.metrics import write_phase_file

    gt_dir, pred_dir = tmp_path / "gt", tmp_path / "pred"
    gt = np.array([0] * 20 + [1] * 20)
    pred = gt.copy()
    pred[20:25] = 0  # 5 late frames: forgiven at 10 s relax, wrong at 0 s
    for vid in ("video41", "video57"):
        write_phase_file(str(gt_dir / f"{vid}-phase.txt"), gt, fps=1)
        write_phase_file(str(pred_dir / f"{vid}-phase.txt"), pred, fps=1)

    json_out = tmp_path / "r.json"
    assert main(["evaluate", "--pred-dir", str(pred_dir), "--gt-dir",
                 str(gt_dir), "--fps", "1", "--video-range", "50", "80",
                 "--json-out", str(json_out)]) == 0
    capsys.readouterr()
    rep = json.loads(json_out.read_text())
    assert rep["videos"] == ["video57"]          # 41 filtered out
    assert rep["mean_accuracy"] == 100.0         # relaxed: late frames forgiven

    assert main(["evaluate", "--pred-dir", str(pred_dir), "--gt-dir",
                 str(gt_dir), "--fps", "1", "--relaxed-seconds", "0",
                 "--json-out", str(json_out)]) == 0
    capsys.readouterr()
    rep = json.loads(json_out.read_text())
    assert rep["mean_accuracy"] < 100.0          # strict: the 5 frames count

    with pytest.raises(SystemExit):              # empty range fails loudly
        main(["evaluate", "--pred-dir", str(pred_dir), "--gt-dir",
              str(gt_dir), "--video-range", "1", "2"])


def test_manifest_config_root_fallback(tmp_path, capsys):
    """--frames/--annotations default to data.data_root/annotation_root;
    an extension-less --out follows data.manifest_format."""
    frames_dir, ann_dir = _write_frames_tree(tmp_path, n_videos=1, seconds=5)
    out = tmp_path / "manifest_noext"
    assert main(["manifest", "--out", str(out),
                 "--set", f"data.data_root={frames_dir}",
                 "--set", f"data.annotation_root={ann_dir}",
                 "--set", "data.manifest_format=csv"]) == 0
    capsys.readouterr()
    text = out.read_text()
    assert text.startswith("frame,class,id")     # csv via manifest_format

    with pytest.raises(SystemExit):              # missing root fails loudly
        main(["manifest", "--out", str(tmp_path / "x.pkl"),
              "--set", "data.data_root=/nonexistent"])


def test_export_ckpt_roundtrip(tmp_path, capsys):
    """export-ckpt writes a reference-format .pth that converts back to the
    identical variable tree (the migration path OUT of this framework)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tmrnet_tpu.config import (DataConfig, ExperimentConfig,
                                   MemoryConfig, ModelConfig, TrainConfig)
    from tmrnet_tpu.models.tmrnet import build_model
    from tmrnet_tpu.models.torch_import import (
        convert_reference_checkpoint, load_torch_state_dict)
    from tmrnet_tpu.train.optim import make_optimizer
    from tmrnet_tpu.train.state import create_train_state
    from tmrnet_tpu.utils.checkpoint import CheckpointManager

    cfg = ExperimentConfig(
        data=DataConfig(sequence_length=3, crop_size=16),
        model=ModelConfig(backbone="tiny", stage_sizes=(1, 1), width=8,
                          hidden_dim=16, num_classes=4, head="tmr",
                          compute_dtype="float32"),
        memory=MemoryConfig(window=4),
        train=TrainConfig(checkpoint_dir=str(tmp_path / "ck")))
    model = build_model(cfg.model)
    variables = model.init(jax.random.PRNGKey(7),
                           jnp.zeros((1, 3, 16, 16, 3)),
                           jnp.zeros((1, 4, 16)))
    tx = make_optimizer(cfg.train, variables["params"])
    state = create_train_state(model, variables, tx)
    CheckpointManager(cfg.train.checkpoint_dir).save(state, step=1,
                                                     is_best=True)

    out = tmp_path / "model.pth"
    cfg_json = tmp_path / "cfg.json"
    cfg_json.write_text(cfg.to_json())
    assert main(["export-ckpt", "--config", str(cfg_json),
                 "--ckpt", cfg.train.checkpoint_dir, "--out", str(out)]) == 0
    capsys.readouterr()

    sd = load_torch_state_dict(str(out))
    back = convert_reference_checkpoint(sd, "tmr", stage_sizes=(1, 1))
    import numpy as _np

    def cmp(a, b, path=""):
        if isinstance(a, dict):
            for k in a:
                cmp(a[k], b[k], f"{path}/{k}")
        else:
            _np.testing.assert_allclose(_np.asarray(a), _np.asarray(b),
                                        atol=0, rtol=0, err_msg=path)

    cmp(back["params"], variables["params"])
    cmp(back["batch_stats"], variables["batch_stats"])


def test_export_name_fmt(tmp_path, capsys):
    """--name-fmt 'video{vid}-phase.txt' produces the exact Main.m file
    names from bare-number video ids (a real cutMargin tree)."""
    from tmrnet_tpu.data.manifests import Manifest, VideoRecord, \
        save_pickle_manifest

    m = Manifest([VideoRecord("41", [f"cutMargin/41/{25 * k}.jpg"
                                     for k in range(12)],
                              np.zeros(12, np.int64))])
    man = tmp_path / "m.pkl"
    save_pickle_manifest(str(man), m)
    preds = np.zeros(3, np.int64)  # 12 frames, seq 10 -> 3 clips
    npz = tmp_path / "p.npz"
    np.savez(npz, preds=preds, scores=np.zeros((3, 7)), rows=np.arange(3))
    pred_dir, gt_dir = tmp_path / "phase", tmp_path / "gt"
    assert main(["export", "--manifest", str(man), "--preds", str(npz),
                 "--pred-dir", str(pred_dir), "--gt-dir", str(gt_dir),
                 "--name-fmt", "video{vid}-phase.txt"]) == 0
    capsys.readouterr()
    assert (pred_dir / "video41-phase.txt").exists()
    assert (gt_dir / "video41-phase.txt").exists()


def test_real_layout_protocol_rehearsal(tmp_path, capsys):
    """The real-data chain in one pass: bare-number cutMargin dirs walk in
    NUMERIC order into the manifest, export with --name-fmt produces
    Main.m's video<N>-phase.txt names, and evaluate --video-range scores
    exactly the protocol's numeric window."""
    import cv2

    from tmrnet_tpu.data.manifests import load_pickle_manifest

    frames_dir = tmp_path / "cutMargin"
    ann_dir = tmp_path / "ann"
    ann_dir.mkdir()
    rng = np.random.RandomState(0)
    for vid in (2, 10, 41, 42):   # 2,10 sort numerically; 41,42 in range
        d = frames_dir / str(vid)
        d.mkdir(parents=True)
        with open(ann_dir / f"{vid}-phase.txt", "w") as f:
            f.write("Frame\tPhase\n")
            for k in range(15 * 25):
                f.write(f"{k}\t{CHOLEC80_PHASES[(k // 125) % 7]}\n")
        for k in range(0, 15 * 25, 25):
            cv2.imwrite(str(d / f"{k}.jpg"),
                        rng.randint(0, 255, (32, 32, 3), dtype=np.uint8))

    man = tmp_path / "test_paths.pkl"
    assert main(["manifest", "--frames", str(frames_dir), "--annotations",
                 str(ann_dir), "--out", str(man)]) == 0
    capsys.readouterr()
    m, _ = load_pickle_manifest(str(man))
    assert [v.video_id for v in m.videos] == ["2", "10", "41", "42"]

    seq = 10
    preds = np.concatenate([v.labels[seq - 1:] for v in m.videos])
    npz = tmp_path / "p.npz"
    np.savez(npz, preds=preds, scores=np.zeros((len(preds), 7)),
             rows=np.arange(len(preds)))
    pred_dir, gt_dir = tmp_path / "phase", tmp_path / "gt-phase"
    assert main(["export", "--manifest", str(man), "--preds", str(npz),
                 "--pred-dir", str(pred_dir), "--gt-dir", str(gt_dir),
                 "--name-fmt", "video{vid}-phase.txt"]) == 0
    capsys.readouterr()
    assert sorted(os.listdir(gt_dir)) == [
        f"video{v}-phase.txt" for v in (10, 2, 41, 42)]  # lexical listing

    out = tmp_path / "rep.json"
    assert main(["evaluate", "--pred-dir", str(pred_dir), "--gt-dir",
                 str(gt_dir), "--fps", "1", "--video-range", "41", "80",
                 "--json-out", str(out)]) == 0
    capsys.readouterr()
    rep = json.loads(out.read_text())
    assert rep["videos"] == ["video41", "video42"]  # 2 and 10 filtered
    assert rep["mean_accuracy"] > 90.0  # only warmup padding can be wrong
