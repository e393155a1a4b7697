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
