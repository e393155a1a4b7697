"""Reference-command translator (tmrnet_tpu/migrate.py): every emitted
command must be accepted by the real CLI parser with resolvable --set keys,
and the unit conversions (frame batches -> clips, sgdadjust -> schedule,
multi -> trunk_lr_scale) must match docs/MIGRATION.md."""

import shlex

import pytest

from tmrnet_tpu.cli import build_parser, load_config
from tmrnet_tpu.migrate import MigrateError, translate


def _validate(cmd: str):
    """Parse an emitted command through the real CLI parser and resolve its
    --set keys against the config tree (placeholders like <videos-dir> are
    opaque strings to argparse)."""
    tokens = shlex.split(cmd)
    assert tokens[:3] == ["python", "-m", "tmrnet_tpu"]
    args = build_parser().parse_args(tokens[3:])
    if getattr(args, "set", None) or getattr(args, "preset", None):
        load_config(args)   # raises on an unknown dotted key
    return args


def _sets(args) -> dict:
    return dict(s.split("=", 1) for s in (args.set or []))


def test_stage1_canonical():
    out = translate(shlex.split(
        "python train_singlenet_phase_1fc.py -t 100 -v 40 -e 25 -w 8 "
        "-f 0 -c 1 -l 5e-4 -o 1 --sgdadjust 0 --sgdstep 3 --sgdgamma 0.5"))
    (cmd,) = out["commands"]
    args = _validate(cmd)
    assert args.cmd == "train-bank" and args.preset == "memorybank"
    s = _sets(args)
    assert s["data.batch_clips"] == "10"       # 100 frames / 10
    assert s["eval.batch_clips"] == "4"
    assert s["train.epochs"] == "25"
    assert s["data.use_flip"] == "false"
    assert s["train.optimizer"] == "adam"
    assert s["train.schedule"] == "step"
    assert s["train.step_size"] == "3" and s["train.gamma"] == "0.5"
    assert any("FRAMES" in n for n in out["notes"])


def test_stage2_resnet_two_commands_and_model_path():
    out = translate(shlex.split(
        "python 'Training TMRNet/train_non-local_mutiConv_resnet.py' "
        "-t 90 --LFB_l 30 --multi 0 --model_path ./LFB/FBmodel/x.pth "
        "--load_LFB False"))
    bl, tt = [_validate(c) for c in out["commands"]]
    assert bl.cmd == "build-lfb" and tt.cmd == "train-tmr"
    assert bl.preset == tt.preset == "tmr-resnet50"
    assert bl.torch_ckpt == "./LFB/FBmodel/x.pth"
    assert tt.torch_init == "./LFB/FBmodel/x.pth"
    assert tt.lfb == bl.out
    s = _sets(tt)
    assert s["memory.window"] == "30"
    assert s["data.batch_clips"] == "9"
    assert s["train.trunk_lr_scale"] == "1.0"
    # load_LFB False: no skip-the-build note
    assert not any("skip the build-lfb" in n for n in out["notes"])


def test_stage2_variants_pick_presets():
    for script, preset in [
            ("train_non-local_mutiConv_resnest.py", "tmr-resnest50"),
            ("train_only_non-local_pretrained.py", "tmr-nl-only")]:
        out = translate(["python", script, "--LFB_l", "40"])
        for c in out["commands"]:
            assert _validate(c).preset == preset
        assert any("skip the build-lfb" in n for n in out["notes"])


def test_fork_stage1_csv_flags():
    out = translate(shlex.split(
        "python train_memorybank.py --csv_train tr.csv --csv_valid va.csv "
        "--train_bs 100 --num_frames 10 --epochs 5 --lr 1e-3"))
    (cmd,) = out["commands"]
    args = _validate(cmd)
    assert args.train_manifest == "tr.csv" and args.val_manifest == "va.csv"
    s = _sets(args)
    assert s["data.batch_clips"] == "10" and s["train.lr"] == "1e-3"
    assert any("broken as published" in n for n in out["notes"])


def test_eval_drivers():
    out = translate(shlex.split(
        "python test_singlenet_phase_non-local_pretrained_2fc_copy.py "
        "-n model.pth -t 1600 -c 3 --LFB_l 30"))
    (cmd,) = out["commands"]
    args = _validate(cmd)
    assert args.cmd == "test" and args.preset == "tmr-resnet50"
    assert args.torch_ckpt == "model.pth"
    s = _sets(args)
    assert s["eval.batch_clips"] == "160"
    assert s["data.test_crop_type"] == "3"     # the base driver's resize id
    assert s["memory.window"] == "30"

    out6 = translate(shlex.split(
        "python test_singlenet_phase_non-local_pretrained_2fc_copy"
        "_mutiConv6_3.py --csv test.csv --model m.pth --lfb_model lfb.pth"))
    (cmd6,) = out6["commands"]
    a6 = _validate(cmd6)
    assert a6.manifest == "test.csv" and a6.torch_ckpt == "m.pth"
    assert a6.extractor_torch_ckpt == "lfb.pth"
    assert _sets(a6)["model.num_classes"] == "6"

    outr = translate(["python", "test_singlenet_phase_non-local_pretrained"
                      "_2fc_copy_mutiConv6_resnest.py", "-n", "r.pth"])
    assert _validate(outr["commands"][0]).preset == "tmr-resnest50"


def test_tools_and_matlab():
    for refcmd, sub in [
            ("python export_phase_copy.py -n preds.pkl", "export"),
            ("python update_get_paths_labels.py --data /d "
             "--test_label t.pkl", "manifest"),
            ("python get_paths_labels.py", "manifest"),
            ("python meanStd.py", "stats"),
            ("python video2frame_cutmargin.py", "prepare"),
            ("octave Main.m", "evaluate"),
            ("octave Main_m2cai.m", "evaluate")]:
        out = translate(shlex.split(refcmd))
        args = _validate(out["commands"][0])
        assert args.cmd == sub, refcmd
    exp = translate(shlex.split("python export_phase_copy.py -n p.pkl"))
    a = _validate(exp["commands"][0])
    assert a.preds == "p.pkl" and a.name_fmt == "video{vid}-phase.txt"
    m2 = translate(["octave", "Main_m2cai.m"])
    assert _validate(m2["commands"][0]).protocol == "m2cai"
    up = translate(shlex.split(
        "python update_get_paths_labels.py --data /d --test_label t.pkl"))
    a = _validate(up["commands"][0])
    assert a.frames == "/d/frames" and a.out == "t.pkl"


def test_video_direct_and_errors():
    out = translate(shlex.split(
        "python test-resnet.py --mount_point /videos -t 90"))
    bl, tt = [_validate(c) for c in out["commands"]]
    assert tt.cmd == "train-tmr" and tt.videos == "/videos"
    assert any("broken as published" in n for n in out["notes"])

    out1 = translate(["python", "test-new-ds.py", "--mount_point", "/v"])
    assert _validate(out1["commands"][0]).cmd == "train-bank"

    with pytest.raises(MigrateError, match="unknown reference script"):
        translate(["python", "not_a_driver.py"])
    with pytest.raises(MigrateError, match="no reference script"):
        translate(["ls", "-la"])
    # unknown flags become notes, not crashes
    out = translate(["python", "train_singlenet_phase_1fc.py",
                     "--mystery", "7"])
    assert any("unrecognized" in n for n in out["notes"])


def test_gpu_flag_and_bool_quirk_notes():
    out = translate(shlex.split(
        "python train_singlenet_phase_1fc.py -g True --nesterov False"))
    s = _sets(_validate(out["commands"][0]))
    assert s["train.nesterov"] == "false"
    assert any("no equivalent" in n for n in out["notes"])
    assert any("type=bool" in n for n in out["notes"])


def test_cli_migrate_command(capsys):
    from tmrnet_tpu.cli import main

    assert main(["migrate", "--cmd",
                 "python train_non-local_mutiConv_resnet.py -t 90"]) == 0
    outlines = capsys.readouterr().out.splitlines()
    cmds = [l for l in outlines if not l.startswith("#")]
    assert len(cmds) == 2 and all("tmrnet_tpu" in c for c in cmds)
    # positional form with the -- separator
    assert main(["migrate", "--", "octave", "Main.m"]) == 0
    out = capsys.readouterr().out
    assert "evaluate" in out
    with pytest.raises(SystemExit):
        main(["migrate"])
    with pytest.raises(SystemExit):
        main(["migrate", "--cmd", "python not_a_driver.py"])
