"""Smoke tests for the driver entry points: bench.py and __graft_entry__.py.

The round driver runs `python bench.py` on the real chip and
`__graft_entry__.entry()` / `dryrun_multichip(n)` to validate the build; a
regression in either surfaces only at round end, so every bench mode gets a
tiny-shape CPU run here (--img 64, the knob added for exactly this purpose).
The e2e and cholec80 modes are exercised through their underlying engines
(ClipInference / run_videos / corpus_features) in test_inference and
test_cli_inference; their bench wrappers stay TPU-only because they pin the
real 250->224 transform and 1500+-frame protocol lengths.
"""

import json
import sys

import pytest

sys.path.insert(0, ".")  # repo root: bench.py / __graft_entry__.py live there

import bench  # noqa: E402


def _run(capsys, argv):
    bench.main(argv)
    lines = [ln for ln in capsys.readouterr().out.strip().splitlines()
             if ln.startswith("{")]
    assert lines, "bench printed no JSON line"
    out = json.loads(lines[-1])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in out, f"missing {key} in {out}"
    assert out["value"] > 0
    return out


TINY = ["--img", "64", "--window", "4"]


def test_bench_clip_mode(capsys):
    out = _run(capsys, TINY + ["--batch-clips", "2", "--iters", "2",
                               "--warmup", "1"])
    assert out["metric"] == "cholec80_test_inference_frames_per_sec_per_chip"


def test_bench_video_mode(capsys):
    out = _run(capsys, TINY + ["--mode", "video", "--video-frames", "32",
                               "--iters", "5"])
    assert "video_inference" in out["metric"]


def test_bench_lfb_mode(capsys):
    out = _run(capsys, TINY + ["--mode", "lfb", "--video-frames", "32",
                               "--iters", "5"])
    assert out["metric"] == "lfb_build_frames_per_sec_per_chip"


def test_bench_train_mode(capsys):
    out = _run(capsys, TINY + ["--mode", "train", "--train-batch", "2",
                               "--iters", "2"])
    assert out["metric"] == "tmrnet_stage2_train_frames_per_sec_per_chip"


def test_bench_stream_mode(capsys):
    out = _run(capsys, TINY + ["--mode", "stream", "--stream-batch", "2",
                               "--iters", "3"])
    assert out["metric"] == "tmrnet_streaming_latency_ms_per_step"


def test_bench_stream_decode_requires_224():
    with pytest.raises(SystemExit):
        bench.main(["--mode", "stream", "--img", "64", "--stream-decode", "2",
                    "--iters", "1"])


def test_graft_entry_lowers():
    """entry() must stay jit-traceable — the driver compile-checks it."""
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    lowered = jax.jit(fn).lower(*args)
    assert tuple(lowered.out_info.shape) == (2, 7)


def test_graft_dryrun_multichip():
    """The full dp x tp train step + sequence-parallel video pass on the
    8-device virtual mesh — exactly what the driver records in MULTICHIP."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)
