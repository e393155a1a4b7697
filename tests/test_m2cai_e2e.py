"""M2CAI (8-phase) end-to-end smoke: the full CLI workflow on a tiny
synthetic 8-phase dataset (VERDICT r2 #9) — manifest --protocol m2cai ->
train-bank -> build-lfb -> train-tmr -> test -> export -> evaluate
--protocol m2cai. Proves the 8-class path through every stage, beyond the
metric unit tests (reference protocol: `matlab-eval/Main_m2cai.m:1-106`)."""

import json

import numpy as np

from tmrnet_tpu.cli import main
from tmrnet_tpu.config import (
    M2CAI_PHASES,
    DataConfig,
    EvalConfig,
    ExperimentConfig,
    MemoryConfig,
    ModelConfig,
    TrainConfig,
)

SEQ = 4


def _write_m2cai_frames_tree(tmp_path, n_videos=2, seconds=16):
    """8-phase variant of tests.test_cli._write_frames_tree."""
    import cv2

    frames_dir = tmp_path / "frames"
    ann_dir = tmp_path / "ann"
    ann_dir.mkdir()
    rng = np.random.RandomState(3)
    for v in range(1, n_videos + 1):
        vdir = frames_dir / f"video{v:02d}"
        vdir.mkdir(parents=True)
        with open(ann_dir / f"video{v:02d}-phase.txt", "w") as f:
            f.write("Frame\tPhase\n")
            for k in range(seconds * 25):
                f.write(f"{k}\t{M2CAI_PHASES[(k // 100) % 8]}\n")
        for k in range(0, seconds * 25, 25):
            img = rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
            cv2.imwrite(str(vdir / f"frame{k}.png"), img)
    return frames_dir, ann_dir


def test_m2cai_full_workflow(tmp_path, capsys):
    frames_dir, ann_dir = _write_m2cai_frames_tree(tmp_path)
    manifest = tmp_path / "m2cai.pkl"
    assert main(["manifest", "--protocol", "m2cai",
                 "--frames", str(frames_dir), "--annotations", str(ann_dir),
                 "--out", str(manifest), "--train-videos", "1"]) == 0
    capsys.readouterr()

    base = ExperimentConfig(
        data=DataConfig(batch_clips=8, num_workers=2, prefetch=1,
                        sequence_length=SEQ, resize=48, crop_size=48,
                        num_classes=8, phase_names=M2CAI_PHASES),
        model=ModelConfig(backbone="tiny", stage_sizes=(1, 1), width=8,
                          hidden_dim=16, num_classes=8, head="tmr",
                          compute_dtype="float32"),
        memory=MemoryConfig(window=4, load_cached=False),
        train=TrainConfig(epochs=1, checkpoint_dir=str(tmp_path / "ck")),
        eval=EvalConfig(batch_clips=8),
    )
    import dataclasses as dc

    s1 = dc.replace(base, model=dc.replace(base.model, head="stage1"),
                    train=dc.replace(base.train,
                                     checkpoint_dir=str(tmp_path / "ck1")))
    p1 = tmp_path / "c1.json"
    p1.write_text(s1.to_json())
    assert main(["train-bank", "--config", str(p1),
                 "--train-manifest", str(manifest),
                 "--log-dir", str(tmp_path / "r1")]) == 0
    capsys.readouterr()

    lfb = tmp_path / "bank.npz"
    assert main(["build-lfb", "--config", str(p1),
                 "--manifest", str(manifest),
                 "--ckpt", str(tmp_path / "ck1"), "--out", str(lfb)]) == 0
    capsys.readouterr()

    s2 = dc.replace(base, train=dc.replace(base.train,
                                           checkpoint_dir=str(tmp_path / "ck2")))
    p2 = tmp_path / "c2.json"
    p2.write_text(s2.to_json())
    assert main(["train-tmr", "--config", str(p2),
                 "--train-manifest", str(manifest), "--lfb", str(lfb),
                 "--stage1-ckpt", str(tmp_path / "ck1"),
                 "--log-dir", str(tmp_path / "r2")]) == 0
    capsys.readouterr()

    preds_path = tmp_path / "preds.npz"
    assert main(["test", "--config", str(p2), "--manifest", str(manifest),
                 "--ckpt", str(tmp_path / "ck2"),
                 "--out", str(preds_path)]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["precision_per_class"]) == 8
    scores = np.load(preds_path)["scores"]
    assert scores.shape[1] == 8

    pred_dir, gt_dir = tmp_path / "phase", tmp_path / "gt-phase"
    assert main(["export", "--config", str(p2), "--manifest", str(manifest),
                 "--preds", str(preds_path), "--pred-dir", str(pred_dir),
                 "--gt-dir", str(gt_dir)]) == 0
    capsys.readouterr()

    report = tmp_path / "report.json"
    assert main(["evaluate", "--protocol", "m2cai",
                 "--pred-dir", str(pred_dir), "--gt-dir", str(gt_dir),
                 "--fps", "1", "--json-out", str(report)]) == 0
    rep = json.loads(report.read_text())
    assert len(rep["jaccard_per_phase"]) == 8
    assert 0.0 <= rep["mean_accuracy"] <= 100.0
