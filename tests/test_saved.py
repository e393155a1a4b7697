"""AOT artifact export (eval/saved.py + CLI export-model): the serialized
StableHLO inference step must reproduce the live model bit-for-bit across
every head and survive a disk round trip with its sidecar."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tmrnet_tpu.config import (
    DataConfig,
    ExperimentConfig,
    MemoryConfig,
    ModelConfig,
)
from tmrnet_tpu.data.device_feed import DevicePrep
from tmrnet_tpu.eval.saved import export_inference, load_artifact, save_artifact
from tmrnet_tpu.models.tmrnet import build_model

SEQ, HW, HID, WIN = 4, 32, 16, 3


def _cfg(head, device_normalize=False):
    return ExperimentConfig(
        model=ModelConfig(backbone="tiny", stage_sizes=(1, 1), width=8,
                          hidden_dim=HID, num_classes=7, head=head,
                          compute_dtype="float32"),
        data=DataConfig(crop_size=HW, resize=HW, sequence_length=SEQ,
                        device_normalize=device_normalize),
        memory=MemoryConfig(window=WIN))


def _variables(cfg):
    model = build_model(cfg.model)
    clips = jnp.zeros((1, SEQ, HW, HW, 3), jnp.float32)
    args = (clips,)
    if cfg.model.head in ("tmr", "nl_only"):
        args = (clips, jnp.zeros((1, WIN, HID)))
    return model, model.init(jax.random.PRNGKey(0), *args)


def test_tmr_artifact_roundtrip_parity(tmp_path):
    cfg = _cfg("tmr")
    model, variables = _variables(cfg)
    blob, meta = export_inference(cfg, variables, batch=2,
                                  platforms=("cpu",))
    path = str(tmp_path / "model.bin")
    save_artifact(path, blob, meta)
    art = load_artifact(path)
    assert art.head == "tmr"
    assert art.meta["inputs"][0]["shape"] == [2, SEQ, HW, HW, 3]

    rng = np.random.RandomState(0)
    clips = rng.rand(2, SEQ, HW, HW, 3).astype(np.float32)
    mem = rng.rand(2, WIN, HID).astype(np.float32)
    preds, probs = art(clips, mem)

    prep = DevicePrep(cfg.data, jnp.float32)
    logits = model.apply(variables, prep(jnp.asarray(clips)),
                         jnp.asarray(mem), train=False)
    want = jax.nn.softmax(logits, -1)
    np.testing.assert_array_equal(np.asarray(preds),
                                  np.argmax(np.asarray(want), -1))
    np.testing.assert_allclose(np.asarray(probs), np.asarray(want),
                               rtol=1e-6, atol=1e-7)


def test_stage1_artifact_scores_last_frame(tmp_path):
    cfg = _cfg("stage1")
    model, variables = _variables(cfg)
    blob, meta = export_inference(cfg, variables, batch=3,
                                  platforms=("cpu",))
    path = str(tmp_path / "s1.bin")
    save_artifact(path, blob, meta)
    art = load_artifact(path)

    clips = np.random.RandomState(1).rand(3, SEQ, HW, HW, 3).astype(
        np.float32)
    preds, probs = art(clips)
    logits = model.apply(variables, jnp.asarray(clips), train=False)
    want = jax.nn.softmax(np.asarray(logits)[:, -1], -1)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(want),
                               rtol=1e-6, atol=1e-7)
    assert np.asarray(preds).shape == (3,)


def test_lfb_artifact_returns_features(tmp_path):
    cfg = _cfg("lfb")
    model, variables = _variables(cfg)
    blob, meta = export_inference(cfg, variables, batch=2,
                                  platforms=("cpu",))
    path = str(tmp_path / "lfb.bin")
    save_artifact(path, blob, meta)
    art = load_artifact(path)
    clips = np.random.RandomState(2).rand(2, SEQ, HW, HW, 3).astype(
        np.float32)
    feats = art(clips)
    want = model.apply(variables, jnp.asarray(clips), train=False)
    np.testing.assert_allclose(np.asarray(feats), np.asarray(want),
                               rtol=1e-6, atol=1e-7)
    assert np.asarray(feats).shape == (2, HID)


def test_uint8_wire_under_device_normalize(tmp_path):
    """device_normalize artifacts take raw uint8 frames and normalize
    inside — the serve/stream wire convention."""
    cfg = _cfg("stage1", device_normalize=True)
    model, variables = _variables(cfg)
    blob, meta = export_inference(cfg, variables, batch=1,
                                  platforms=("cpu",))
    assert meta["inputs"][0]["dtype"] == "uint8"
    path = str(tmp_path / "u8.bin")
    save_artifact(path, blob, meta)
    art = load_artifact(path)
    clips = np.random.RandomState(3).randint(
        0, 255, (1, SEQ, HW, HW, 3), np.uint8)
    preds, probs = art(clips)
    prep = DevicePrep(cfg.data, jnp.float32)
    logits = model.apply(variables, prep(jnp.asarray(clips)), train=False)
    want = jax.nn.softmax(np.asarray(logits)[:, -1], -1)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(want),
                               rtol=1e-6, atol=1e-7)


def test_wrong_shape_rejected(tmp_path):
    cfg = _cfg("lfb")
    _, variables = _variables(cfg)
    blob, meta = export_inference(cfg, variables, batch=2,
                                  platforms=("cpu",))
    path = str(tmp_path / "m.bin")
    save_artifact(path, blob, meta)
    art = load_artifact(path)
    with pytest.raises(ValueError):
        art(np.zeros((5, SEQ, HW, HW, 3), np.float32))  # batch mismatch


def test_cli_export_model(tmp_path, capsys):
    """CLI end-to-end: export-model writes the artifact + sidecar; it
    reloads and runs (random-init weights — the artifact mechanics are
    what's under test)."""
    from tmrnet_tpu.cli import main

    cfg = _cfg("tmr")
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(cfg.to_json())
    out = tmp_path / "model.bin"
    rc = main(["export-model", "--config", str(cfg_path),
               "--out", str(out), "--batch", "2", "--platforms", "cpu"])
    assert rc == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["bytes"] > 0 and line["head"] == "tmr"
    assert os.path.exists(out) and os.path.exists(str(out) + ".json")

    art = load_artifact(str(out))
    preds, probs = art(np.zeros((2, SEQ, HW, HW, 3), np.float32),
                       np.zeros((2, WIN, HID), np.float32))
    assert np.asarray(preds).shape == (2,)
    assert np.asarray(probs).shape == (2, 7)


def test_doctor_validates_artifact(tmp_path, capsys):
    from tmrnet_tpu.cli import main

    cfg = _cfg("lfb")
    _, variables = _variables(cfg)
    blob, meta = export_inference(cfg, variables, batch=1,
                                  platforms=("cpu",))
    path = str(tmp_path / "ok.bin")
    save_artifact(path, blob, meta)
    assert main(["doctor", "--artifact", path]) == 0
    out = capsys.readouterr().out
    assert "head=lfb" in out

    # sidecar missing -> advisory warn, still exit 0
    os.remove(path + ".json")
    assert main(["doctor", "--artifact", path]) == 0
    assert "sidecar" in capsys.readouterr().out

    bad = tmp_path / "junk.bin"
    bad.write_bytes(b"not an artifact")
    assert main(["doctor", "--artifact", str(bad)]) == 1


def test_cli_export_model_fold_bn_parity(tmp_path, capsys):
    """--fold-bn artifacts carry no BN yet match the unfolded artifact's
    probabilities within float rounding."""
    from tmrnet_tpu.cli import main

    cfg = _cfg("stage1")
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(cfg.to_json())
    outs = {}
    for name, extra in (("plain", []), ("folded", ["--fold-bn"])):
        out = tmp_path / f"{name}.bin"
        assert main(["export-model", "--config", str(cfg_path),
                     "--out", str(out), "--batch", "1",
                     "--platforms", "cpu"] + extra) == 0
        outs[name] = load_artifact(str(out))
    capsys.readouterr()
    clips = np.random.RandomState(7).rand(1, SEQ, HW, HW, 3).astype(
        np.float32)
    _, p_plain = outs["plain"](clips)
    _, p_fold = outs["folded"](clips)
    np.testing.assert_allclose(np.asarray(p_fold), np.asarray(p_plain),
                               rtol=2e-4, atol=2e-5)


def test_stream_artifact_matches_live_engine(tmp_path):
    """export_stream + ArtifactStreamEngine reproduce StreamingInference
    step-for-step, including active-mask freezing and slot resets."""
    from tmrnet_tpu.eval.saved import ArtifactStreamEngine, export_stream
    from tmrnet_tpu.eval.stream import StreamingInference

    cfg = _cfg("tmr")
    model, variables = _variables(cfg)
    extractor = {
        "params": {"backbone": variables["params"]["backbone"],
                   "encoder": variables["params"]["encoder"]},
        "batch_stats": {"backbone": variables["batch_stats"]["backbone"]},
    }
    live = StreamingInference(cfg, variables, extractor)
    blob, meta = export_stream(cfg, variables, extractor, num_slots=2,
                               platforms=("cpu",))
    path = str(tmp_path / "stream.bin")
    save_artifact(path, blob, meta)
    art = ArtifactStreamEngine(load_artifact(path))
    assert art.slots == 2 and art.seq == SEQ and art.window == WIN

    rng = np.random.RandomState(5)
    s_live, s_art = live.init_state(2), art.init_state(2)
    for t in range(SEQ + 3):
        frames = rng.rand(2, HW, HW, 3).astype(np.float32)
        active = np.array([True, t % 2 == 0])  # slot 1 drops alternate ticks
        s_live, p1, pr1, v1 = live.step(s_live, frames, active)
        s_art, p2, pr2, v2 = art.step(s_art, frames, active)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
        np.testing.assert_allclose(np.asarray(pr1), np.asarray(pr2),
                                   rtol=1e-6, atol=1e-7)
        if t == SEQ:   # recycle slot 0 mid-run on both engines
            mask = np.array([True, False])
            s_live = live.reset_streams(s_live, mask)
            s_art = art.reset_streams(s_art, mask)

    with pytest.raises(ValueError, match="slots"):
        art.init_state(3)


def test_serve_cli_from_artifact(tmp_path, capsys):
    """The full daemon runs from ONE artifact file: export-model --stream,
    then serve --artifact with no checkpoints or model config."""
    import cv2

    from tmrnet_tpu.cli import main

    cfg = _cfg("tmr")
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(cfg.to_json())
    out = tmp_path / "stream.bin"
    assert main(["export-model", "--config", str(cfg_path), "--stream",
                 "--slots", "2", "--out", str(out),
                 "--platforms", "cpu"]) == 0
    capsys.readouterr()

    rng = np.random.RandomState(6)
    frames = []
    for t in range(SEQ + 2):
        p = str(tmp_path / f"f{t}.png")
        cv2.imwrite(p, rng.randint(0, 255, (HW, HW, 3), np.uint8))
        frames.append(p)
    proto = tmp_path / "events.jsonl"
    with open(proto, "w") as f:
        for t, p in enumerate(frames):
            f.write(json.dumps({"id": "or-1", "image": p}) + "\n")
            f.write(json.dumps({"step": True}) + "\n")

    # --slots deliberately left at its default (16): the artifact's baked-in
    # 2 must win
    assert main(["serve", "--artifact", str(out), "--input", str(proto),
                 "--probs"]) == 0
    cap = capsys.readouterr()
    rows = [json.loads(l) for l in cap.out.splitlines()]
    assert len(rows) == SEQ + 2
    valid = [r for r in rows if r["valid"]]
    assert len(valid) == 3  # frames seq-1 .. seq+1
    assert all(len(r["probs"]) == 7 for r in valid)


def test_stream_cli_from_artifact_matches_live(tmp_path, capsys):
    """`stream --artifact` reproduces the checkpoint-path `stream` run
    row-for-row (same random-init weights via the shared seed)."""
    import cv2

    from tmrnet_tpu.cli import main

    cfg = _cfg("tmr")
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(cfg.to_json())

    frames_dir = tmp_path / "frames"
    ann = tmp_path / "ann"
    ann.mkdir()
    rng = np.random.RandomState(8)
    phases = ["Preparation", "CalotTriangleDissection", "ClippingCutting",
              "GallbladderDissection", "GallbladderPackaging",
              "CleaningCoagulation", "GallbladderRetraction"]
    for v in (1, 2):
        vdir = frames_dir / f"video{v:02d}"
        vdir.mkdir(parents=True)
        with open(ann / f"video{v:02d}-phase.txt", "w") as f:
            f.write("Frame\tPhase\n")
            for k in range(7 * 25):
                f.write(f"{k}\t{phases[(k // 50) % 7]}\n")
        for k in range(0, 7 * 25, 25):
            cv2.imwrite(str(vdir / f"frame{k}.png"),
                        rng.randint(0, 255, (HW, HW, 3), np.uint8))
    manifest = tmp_path / "m.pkl"
    main(["manifest", "--frames", str(frames_dir), "--annotations",
          str(ann), "--out", str(manifest)])
    capsys.readouterr()

    art = tmp_path / "stream.bin"
    assert main(["export-model", "--config", str(cfg_path), "--stream",
                 "--slots", "2", "--out", str(art),
                 "--platforms", "cpu"]) == 0
    capsys.readouterr()

    out_live = tmp_path / "live.jsonl"
    assert main(["stream", "--config", str(cfg_path),
                 "--manifest", str(manifest), "--out", str(out_live),
                 "--set", "mesh.data_parallel=1"]) == 0
    out_art = tmp_path / "art.jsonl"
    assert main(["stream", "--artifact", str(art),
                 "--manifest", str(manifest), "--out", str(out_art)]) == 0
    capsys.readouterr()
    assert out_live.read_text() == out_art.read_text()


def test_doctor_reports_stream_artifact(tmp_path, capsys):
    from tmrnet_tpu.cli import main
    from tmrnet_tpu.eval.saved import export_stream

    cfg = _cfg("tmr")
    _, variables = _variables(cfg)
    extractor = {
        "params": {"backbone": variables["params"]["backbone"],
                   "encoder": variables["params"]["encoder"]},
        "batch_stats": {"backbone": variables["batch_stats"]["backbone"]},
    }
    blob, meta = export_stream(cfg, variables, extractor, num_slots=2,
                               platforms=("cpu",))
    path = str(tmp_path / "s.bin")
    save_artifact(path, blob, meta)
    assert main(["doctor", "--artifact", path]) == 0
    out = capsys.readouterr().out
    assert "kind=stream slots=2" in out and "jax=" in out
