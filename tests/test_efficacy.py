"""Learning efficacy: the stage-1 -> LFB -> stage-2 pipeline LEARNS temporal
structure (VERDICT r3 #1). Runs the synthetic memory-dependent task
(data/synthetic.py) end-to-end through the REAL CLI — synth, manifest,
train-bank, build-lfb, train-tmr, test, export, evaluate — and asserts the
memory head beats the frame-only stage-1 baseline by a clear margin.

The task is constructed so a memoryless model cannot exceed a known
accuracy ceiling (ambiguous phase pairs are pixel-identical; only the
phase history disambiguates — see data/synthetic.py). Full-scale numbers
with two seeds and the nl_only ablation live in docs/QUALITY.md
(scripts/efficacy_study.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from efficacy_study import run_study  # noqa: E402

pytestmark = pytest.mark.slow


def test_memory_head_beats_frame_only_baseline(tmp_path):
    rows = run_study(str(tmp_path), seed=0, videos=(6, 2, 3),
                     epochs1=4, epochs2=4, heads=("tmr",))
    by = {r["arm"]: r for r in rows}
    s1, tmr = by["stage1"], by["tmr"]

    # the baseline learned the learnable part (well above 1/7 chance) ...
    assert s1["clip_accuracy"] > 0.5, f"stage1 failed to learn: {s1}"
    # ... but stays at/below the provable memoryless ceiling — if it beats
    # the ceiling, the ambiguous pairs are distinguishable and the task no
    # longer measures memory (e.g. a rendering regression)
    from tmrnet_tpu.data.synthetic import frame_only_ceiling

    assert s1["clip_accuracy"] <= frame_only_ceiling() + 0.08, (
        f"baseline beat the memoryless ceiling — task broken: {s1}")
    # ... and its REMAINING errors are confined to the designed ambiguous
    # pairs (1<->4, 3<->6): a baseline confused elsewhere means the task's
    # learnable part failed to train, not that memory is missing
    import numpy as np

    from tmrnet_tpu.data.indexing import clip_start_indices
    from tmrnet_tpu.data.manifests import load_pickle_manifest

    m, _ = load_pickle_manifest(str(tmp_path / "test.pkl"))
    starts = clip_start_indices(10, m.video_lengths)
    y = m.flat_labels()[starts + 9]
    p = np.load(str(tmp_path / "preds-stage1-s0.npz"))["preds"]
    err = p != y
    pairs = {(1, 4), (4, 1), (3, 6), (6, 3)}
    within = sum(1 for a, b in zip(y[err], p[err])
                 if (int(a), int(b)) in pairs)
    frac = within / max(int(err.sum()), 1)
    assert frac >= 0.8, (
        f"only {frac:.2f} of baseline errors sit on the designed pairs — "
        f"the baseline is broken, not memoryless-limited")
    # ... but the memory head resolves what the baseline cannot, by a
    # margin well clear of run-to-run noise (measured ~0.22 at this size;
    # VERDICT r4 tightened the gate from 0.05)
    margin = tmr["clip_accuracy"] - s1["clip_accuracy"]
    assert margin >= 0.15, (
        f"memory gave no clear gain: stage1={s1['clip_accuracy']:.4f} "
        f"tmr={tmr['clip_accuracy']:.4f} (margin {margin:+.4f})")
    # the ported protocol scorer sees the same ordering, on accuracy AND
    # on Jaccard (segment-overlap), by a real margin (points out of 100)
    assert tmr["protocol_accuracy"] > s1["protocol_accuracy"], (s1, tmr)
    assert tmr["protocol_jaccard"] >= s1["protocol_jaccard"] + 5.0, (s1, tmr)


def test_multiscale_timeconv_ranks_heads(tmp_path):
    """VERDICT r4 #1: the multi-scale task RANKS tmr vs nl_only at the
    architecture level. On the designed pair (phases 5 vs 11, close vs far
    X->Y gap) nl_only reads an unordered row multiset and is provably at
    chance, while TimeConv's k=7 branch spans the close conjunction: the
    head-level study (frozen stage-1 bank features, Adam, binary on the
    pair) must separate them by a wide margin, and the CONSTRUCTED k=7
    witness kernel must score the pair near-perfectly. A TimeConv
    regression that degraded-but-didn't-break the pyramid fails here and
    nowhere else. Measured at this size: tmr 1.00, nl_only ~0.55-0.69
    (finite-sample wobble around its 0.5 ceiling), witness AUC 1.0."""
    from headlevel_multiscale import main as headlevel_main
    from timeconv_witness import auc, pair_windows, witness_statistic, xy_detectors

    work = str(tmp_path / "mshead")
    headlevel_main(["--work", work, "--seeds", "0",
                    "--train-videos", "10", "--test-videos", "4",
                    "--steps", "800"])
    import json

    rows = {r["head"]: r for r in json.load(
        open(os.path.join(work, "headlevel_results.json")))}
    tmr, nl = rows["tmr"], rows["nl_only"]
    assert tmr["test_acc"] >= 0.9, rows
    assert nl["test_acc"] <= 0.8, rows
    assert tmr["test_acc"] - nl["test_acc"] >= 0.2, rows

    u, v = xy_detectors(work)
    lt, yb = pair_windows(work, "test")
    a = auc(witness_statistic(lt, u, v), 1 - yb)
    assert a >= 0.97, f"constructed TimeConv witness lost the pair: AUC {a}"
