"""Tests for the relaxed-boundary metric port (reference Evaluate.m / Main.m)."""

import numpy as np
import pytest

from tmrnet_tpu.eval.metrics import (
    VideoScores,
    _runs,
    aggregate_videos,
    classification_metrics,
    evaluate_protocol,
    read_phase_file,
    relaxed_evaluate,
    write_phase_file,
)


def test_runs_segmentation():
    m = np.array([0, 1, 1, 0, 1, 0, 0, 1, 1, 1], dtype=bool)
    assert _runs(m) == [(1, 3), (4, 5), (7, 10)]
    assert _runs(np.zeros(4, dtype=bool)) == []
    assert _runs(np.ones(3, dtype=bool)) == [(0, 3)]


def test_perfect_prediction():
    gt = np.array([0] * 20 + [1] * 30 + [2] * 25)
    s = relaxed_evaluate(gt, gt.copy(), fps=1)
    assert s.accuracy == 100.0
    np.testing.assert_allclose(s.jaccard[:3], 100.0)
    assert np.isnan(s.jaccard[3:]).all()  # phases absent from GT -> NaN
    np.testing.assert_allclose(s.precision[:3], 100.0)
    np.testing.assert_allclose(s.recall[:3], 100.0)


def test_late_transition_forgiven():
    # GT switches 0->1 at frame 30; prediction is 5 frames late. Within the
    # 10-frame relaxed boundary of the phase-1 run, diff==-1 is forgiven.
    gt = np.array([0] * 30 + [1] * 30)
    pred = np.array([0] * 35 + [1] * 25)
    s = relaxed_evaluate(gt, pred, fps=1)
    assert s.accuracy == 100.0
    np.testing.assert_allclose(s.jaccard[:2], 100.0)


def test_late_transition_beyond_boundary_not_forgiven():
    # 15 frames late: only frames within oriT=10 of the run start are eligible.
    gt = np.array([0] * 30 + [1] * 40)
    pred = np.array([0] * 45 + [1] * 25)
    s = relaxed_evaluate(gt, pred, fps=1)
    # 5 frames remain wrong (positions 40..44 are outside the first 10 of the run)
    assert s.accuracy == pytest.approx(100.0 * 65 / 70)


def test_early_transition_quirk_vs_intended():
    # Prediction enters phase 1 five frames early (diff==1 at end of phase-0 run).
    gt = np.array([0] * 30 + [1] * 30)
    pred = np.array([0] * 25 + [1] * 35)
    # Intended semantics: the last 10 frames of the phase-0 run forgive diff==1.
    s_intended = relaxed_evaluate(gt, pred, fps=1, quirk_compat=False)
    assert s_intended.accuracy == 100.0
    # Quirk semantics: the mask from the last 10 frames is applied to the FIRST
    # 10 frames of the run, where diff==0 already, so nothing is forgiven.
    s_quirk = relaxed_evaluate(gt, pred, fps=1, quirk_compat=True)
    assert s_quirk.accuracy == pytest.approx(100.0 * 55 / 60)


def test_phase4_jump_two_forgiven_cholec80():
    # GT run of phase 5 (0-based 4) ending; prediction jumps to phase 6 (0-based
    # 5, diff=+1) and phase 7 (0-based 6, diff=+2) early: both forgiven for
    # phases 4/5 (1-based) per Evaluate.m:38-40. Use intended mode so the
    # relaxation lands on the run tail.
    gt = np.array([4] * 30 + [6] * 20)
    pred = np.array([4] * 22 + [6] * 28)
    s = relaxed_evaluate(gt, pred, fps=1, quirk_compat=False)
    assert s.accuracy == 100.0
    # diff=+2 case
    gt2 = np.array([3] * 30 + [5] * 20)
    pred2 = np.array([3] * 22 + [5] * 28)
    s2 = relaxed_evaluate(gt2, pred2, fps=1, quirk_compat=False)
    assert s2.accuracy == 100.0


def test_phase6_late_minus_two_forgiven():
    # 1-based phase 6 (0-based 5) forgives diff in {-1,-2} at run start.
    gt = np.array([3] * 20 + [5] * 30)
    pred = np.array([3] * 26 + [5] * 24)  # diff=-2 for 6 frames at start of run
    s = relaxed_evaluate(gt, pred, fps=1)
    assert s.accuracy == 100.0
    # General phase (1-based 2) does NOT forgive -2:
    gt2 = np.array([3] * 20 + [1] * 30)
    pred2 = np.array([3] * 26 + [1] * 24)
    s2 = relaxed_evaluate(gt2, pred2, fps=1)
    assert s2.accuracy < 100.0


def test_short_phase_clamps_boundary():
    # Run shorter than oriT: t clamps to run length; all of it is eligible.
    gt = np.array([0] * 5 + [1] * 50)
    pred = np.array([0] * 2 + [1] * 53)  # early by 3 within a 5-frame run
    s = relaxed_evaluate(gt, pred, fps=1, quirk_compat=False)
    assert s.accuracy == 100.0


def test_jaccard_union_semantics():
    # Phase 1 (0-based 0): GT frames 0..9, pred claims 0..14 (5 false pos far
    # from any relaxation since phase 2's run start forgives -1 only in first
    # 10... actually those ARE within first 10 of phase-2 run and diff==-1, so
    # use a jump of 2 to defeat relaxation).
    gt = np.array([0] * 10 + [2] * 40)
    pred = np.array([0] * 15 + [2] * 35)  # diff=-2 at frames 10..14
    s = relaxed_evaluate(gt, pred, fps=1)
    # union for phase 0: frames 0..14 -> 15; tp = 10 -> jaccard 66.67
    assert s.jaccard[0] == pytest.approx(100.0 * 10 / 15)
    assert s.precision[0] == pytest.approx(100.0 * 10 / 15)
    assert s.recall[0] == pytest.approx(100.0)
    assert s.accuracy == pytest.approx(100.0 * 45 / 50)


def test_precision_inf_when_no_predictions_clamped_in_aggregate():
    # Phase forgiven by relaxation but never predicted -> tp>0, sumPred=0 -> Inf,
    # clamped to 100 in aggregation (Main.m:67-68).
    gt = np.array([0] * 12 + [1] * 30)
    pred = np.array([0] * 42)  # never predicts phase 1; first 10 of run forgiven
    s = relaxed_evaluate(gt, pred, fps=1)
    assert np.isinf(s.precision[1])
    rep = aggregate_videos([s], phase_names=("a", "b", "c", "d", "e", "f", "g"))
    assert rep.precision_per_phase[1] == 100.0


def test_m2cai_protocol_shifted_phases():
    # m2cai 1-based phase 5 (0-based 4) forgives early {1,2}; and has 8 phases.
    gt = np.array([4] * 30 + [6] * 20)
    pred = np.array([4] * 22 + [6] * 28)
    s = relaxed_evaluate(gt, pred, fps=1, protocol="m2cai", quirk_compat=False)
    assert s.accuracy == 100.0
    assert s.jaccard.size == 8


def test_aggregate_matches_hand_computation():
    v1 = relaxed_evaluate(np.array([0] * 50), np.array([0] * 50))
    v2 = relaxed_evaluate(
        np.array([0] * 25 + [1] * 25), np.array([0] * 20 + [1] * 30),
        quirk_compat=False)
    rep = aggregate_videos([v1, v2])
    # accuracy: v1=100, v2=100 (5 early diff=+1 frames forgiven)
    assert rep.mean_accuracy == pytest.approx(100.0)
    # phase 0 jaccard: v1 100; v2: pred phase0 frames 0..19, gt 0..24 ->
    # union 25, tp 25 (all updated diffs zero) -> 100
    assert rep.jaccard_per_phase[0] == pytest.approx(100.0)
    # mean_jaccard is plain mean over phases -> NaN (phases absent everywhere)
    assert np.isnan(rep.mean_jaccard)
    # precision uses nanmean -> finite
    assert rep.mean_precision == pytest.approx(100.0)
    assert isinstance(rep.format_table(), str)


def test_phase_file_roundtrip(tmp_path):
    labels = np.array([0, 0, 1, 2, 2, 6])
    p = str(tmp_path / "video41-phase.txt")
    write_phase_file(p, labels, fps=25, header=True)
    frames, labs = read_phase_file(p)
    np.testing.assert_array_equal(labs, labels)
    np.testing.assert_array_equal(frames, 25 * np.arange(len(labels)))


def test_phase_file_reads_names(tmp_path):
    p = str(tmp_path / "gt.txt")
    with open(p, "w") as f:
        f.write("Frame\tPhase\n0\tPreparation\n25\tClippingCutting\n")
    _, labs = read_phase_file(p)
    np.testing.assert_array_equal(labs, [0, 2])


def test_evaluate_protocol_end_to_end():
    rng = np.random.RandomState(0)
    gts, preds = [], []
    for _ in range(4):
        gt = np.repeat(rng.permutation(7), rng.randint(15, 40, size=7))
        noise = rng.rand(gt.size) < 0.05
        pred = np.where(noise, rng.randint(0, 7, gt.size), gt)
        gts.append(gt)
        preds.append(pred)
    rep = evaluate_protocol(gts, preds, protocol="cholec80")
    assert 80.0 < rep.mean_accuracy <= 100.0
    assert rep.accuracy_per_video.shape == (4,)
    assert len(rep.phase_names) == 7


def test_classification_metrics_against_sklearn():
    sklearn = pytest.importorskip("sklearn.metrics")
    rng = np.random.RandomState(1)
    y, p = rng.randint(0, 5, 200), rng.randint(0, 5, 200)
    m = classification_metrics(y, p, 5)
    np.testing.assert_allclose(
        m["precision"],
        sklearn.precision_score(y, p, average=None, labels=range(5), zero_division=0),
    )
    np.testing.assert_allclose(
        m["recall"],
        sklearn.recall_score(y, p, average=None, labels=range(5), zero_division=0),
    )
    assert m["accuracy"] == pytest.approx(sklearn.accuracy_score(y, p))


def test_single_phase_video():
    # whole video is one phase: other phases NaN, that phase 100
    gt = np.full(120, 3)
    s = relaxed_evaluate(gt, gt.copy())
    assert s.accuracy == 100.0
    assert s.jaccard[3] == 100.0
    assert np.isnan(np.delete(s.jaccard, 3)).all()
    rep = aggregate_videos([s])
    assert np.isnan(rep.mean_jaccard)  # plain mean over NaN phases, like Main.m
    assert rep.mean_accuracy == 100.0


def test_multiple_transitions_each_get_relaxation():
    # consecutive increasing transitions: each new run's start forgives the
    # late diff==-1 independently
    gt = np.array([0] * 20 + [1] * 20 + [2] * 20)
    pred = np.array([0] * 22 + [1] * 20 + [2] * 18)  # 2 frames late, twice
    s = relaxed_evaluate(gt, pred, quirk_compat=False)
    assert s.accuracy == 100.0


def test_decreasing_transition_not_forgiven():
    # the protocol forgives late entries (diff -1 at run start) and early
    # advances (diff +1 at run end) — never a return to a LOWER phase
    gt = np.array([0] * 20 + [1] * 20 + [0] * 20)
    pred = np.array([0] * 22 + [1] * 16 + [0] * 22)
    s = relaxed_evaluate(gt, pred, quirk_compat=False)
    assert s.accuracy == pytest.approx(100.0 * 58 / 60)


def test_quirk_default_is_matlab_behavior():
    # default call must use quirk semantics (what published numbers used)
    gt = np.array([0] * 30 + [1] * 30)
    pred = np.array([0] * 25 + [1] * 35)
    assert relaxed_evaluate(gt, pred).accuracy == relaxed_evaluate(
        gt, pred, quirk_compat=True).accuracy


def test_phase_file_m2cai_names_map_to_m2cai_ids(tmp_path):
    """M2CAI name-labeled files must decode with M2CAI ids — the 7 shared
    names map to DIFFERENT ids there (Preparation is 1 after
    TrocarPlacement=0), so the default cholec80-first mapping would shift
    every shared phase by one (review r3 finding)."""
    from tmrnet_tpu.config import M2CAI_PHASES

    p = str(tmp_path / "gt.txt")
    with open(p, "w") as f:
        f.write("Frame\tPhase\n0\tTrocarPlacement\n25\tPreparation\n"
                "50\tCalotTriangleDissection\n75\tGallbladderRetraction\n")
    _, labs = read_phase_file(p, phase_names=M2CAI_PHASES)
    np.testing.assert_array_equal(labs, [0, 1, 2, 7])


def test_phase_file_matlab_compat_drops_first_row(tmp_path):
    """ReadPhaseLabel.m does fgets() before textscan, dropping line 1 even
    of headerless files (the reference's exports ARE headerless); the
    matlab_compat flag reproduces that."""
    labels = np.array([3, 1, 2, 0])
    p = str(tmp_path / "video41-phase.txt")
    write_phase_file(p, labels, fps=25, header=False)
    _, labs = read_phase_file(p)                       # default: keep row 0
    np.testing.assert_array_equal(labs, labels)
    _, labs = read_phase_file(p, matlab_compat=True)   # MATLAB: lose row 0
    np.testing.assert_array_equal(labs, labels[1:])
    # with a header both agree
    write_phase_file(p, labels, fps=25, header=True)
    _, labs = read_phase_file(p, matlab_compat=True)
    np.testing.assert_array_equal(labs, labels)


def test_relaxed_evaluate_empty_video_yields_nan():
    from tmrnet_tpu.eval.metrics import relaxed_evaluate

    sc = relaxed_evaluate(np.zeros(0, np.int64), np.zeros(0, np.int64))
    assert np.isnan(sc.accuracy) and np.isnan(sc.jaccard).all()


def test_classification_metrics_rejects_out_of_range():
    from tmrnet_tpu.eval.metrics import classification_metrics

    with pytest.raises(ValueError, match="labels outside"):
        classification_metrics(np.array([0, -1]), np.array([0, 1]), 7)
    with pytest.raises(ValueError, match="preds outside"):
        classification_metrics(np.array([0, 1]), np.array([0, 7]), 7)


# ---------------------------------------------------------------------------
# Differential fuzz: the vectorized port vs an independent per-element
# transliteration of Evaluate.m / Evaluate_m2cai.m (explicit loops, MATLAB
# logical-index-assign semantics, auto-grown updatedDiff, x/0 -> Inf).
# ---------------------------------------------------------------------------

_ORACLE_RELAX = {
    "cholec80": (7, {4: ((-1,), (1, 2)), 5: ((-1,), (1, 2)),
                     6: ((-1, -2), (1, 2)), 7: ((-1, -2), (1, 2))}),
    "m2cai": (8, {5: ((-1,), (1, 2)), 6: ((-1,), (1, 2)),
                  7: ((-1, -2), (1, 2)), 8: ((-1, -2), (1, 2))}),
}


def _matlab_oracle(gt0, pred0, protocol, ori_t, quirk):
    nph, relax = _ORACLE_RELAX[protocol]
    gt = np.asarray(gt0, int) + 1
    pred = np.asarray(pred0, int) + 1
    n = len(gt)
    diff = pred - gt
    updated = np.zeros(n, int)  # every position is in exactly one run below
    for phase in range(1, nph + 1):
        late, early = relax.get(phase, ((-1,), (1,)))
        s = 0
        while s < n:
            if gt[s] != phase:
                s += 1
                continue
            e = s
            while e + 1 < n and gt[e + 1] == phase:
                e += 1
            cur = diff[s:e + 1].copy()
            t = min(ori_t, len(cur))
            mask_late = [cur[i] in late for i in range(t)]
            for i in range(t):
                if mask_late[i]:
                    cur[i] = 0
            # mask over the LAST t (evaluated before any assignment) ...
            mask_early = [cur[len(cur) - t + i] in early for i in range(t)]
            for i in range(t):
                if mask_early[i]:
                    if quirk:      # ... assigned to the FIRST t (MATLAB)
                        cur[i] = 0
                    else:          # intended semantics
                        cur[len(cur) - t + i] = 0
            updated[s:e + 1] = cur
            s = e + 1
    jac = np.full(nph, np.nan)
    prc = np.full(nph, np.nan)
    rcl = np.full(nph, np.nan)
    for phase in range(1, nph + 1):
        gt_pos = [i for i in range(n) if gt[i] == phase]
        if not gt_pos:
            continue
        pred_pos = [i for i in range(n) if pred[i] == phase]
        union = sorted(set(gt_pos) | set(pred_pos))
        tp = sum(1 for i in union if updated[i] == 0)
        jac[phase - 1] = 100.0 * tp / len(union)
        sum_pred = len(pred_pos)
        if sum_pred == 0:
            prc[phase - 1] = np.nan if tp == 0 else np.inf
        else:
            prc[phase - 1] = 100.0 * tp / sum_pred
        rcl[phase - 1] = 100.0 * tp / len(gt_pos)
    acc = 100.0 * int((updated == 0).sum()) / n
    return jac, prc, rcl, acc


def _random_stream(rng, nph, n):
    """Mostly-monotonic phase progressions with boundary noise (the realistic
    shape) or fully random labels (the adversarial shape)."""
    if rng.rand() < 0.3:
        return rng.randint(0, nph, size=n), rng.randint(0, nph, size=n)
    bounds = np.sort(rng.choice(np.arange(1, n), size=min(nph - 1, n - 1),
                                replace=False))
    gt = np.zeros(n, int)
    for b in bounds:
        gt[b:] += 1
    gt = np.minimum(gt, nph - 1)
    shift = rng.randint(-3, 4, size=n)
    pred = np.clip(gt + np.where(rng.rand(n) < 0.4, shift, 0), 0, nph - 1)
    return gt, pred


def test_fuzz_against_matlab_transliteration():
    rng = np.random.RandomState(7)
    for protocol, nph in (("cholec80", 7), ("m2cai", 8)):
        for case in range(120):
            n = rng.randint(1, 90)
            gt, pred = _random_stream(rng, nph, n)
            ori_t = int(rng.choice([1, 3, 10, 25]))
            for quirk in (True, False):
                got = relaxed_evaluate(gt, pred, fps=ori_t,
                                       protocol=protocol,
                                       relaxed_seconds=1,
                                       quirk_compat=quirk)
                jac, prc, rcl, acc = _matlab_oracle(gt, pred, protocol,
                                                    ori_t, quirk)
                ctx = f"{protocol} case {case} quirk={quirk} n={n} t={ori_t}"
                np.testing.assert_allclose(got.jaccard, jac, err_msg=ctx)
                np.testing.assert_allclose(got.precision, prc, err_msg=ctx)
                np.testing.assert_allclose(got.recall, rcl, err_msg=ctx)
                np.testing.assert_allclose(got.accuracy, acc, err_msg=ctx)
