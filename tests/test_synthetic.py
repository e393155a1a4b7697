"""Unit tests for the synthetic memory-dependent dataset generator
(data/synthetic.py) — the substrate of the learning efficacy study."""

import os

import numpy as np
import pytest

from tmrnet_tpu.data.synthetic import (
    PHASE_TOKENS,
    ambiguous_phases,
    frame_only_ceiling,
    generate_video,
    render_frames,
    write_synthetic_dataset,
)


def test_token_map_structure():
    """The default token map has exactly two ambiguous pairs whose
    PREDECESSOR phases render distinctly — the property that makes the
    task solvable with memory and unsolvable without."""
    assert ambiguous_phases() == [1, 3, 4, 6]
    tokens = PHASE_TOKENS
    assert tokens[1] == tokens[4] and tokens[3] == tokens[6]
    # predecessors of each ambiguous pair are distinct
    assert tokens[0] != tokens[3]   # phase 1 vs phase 4 lookback
    assert tokens[2] != tokens[5]   # phase 3 vs phase 6 lookback


def test_ambiguous_phases_render_identically_distributed():
    """Paired phases must be pixel-indistinguishable in distribution: same
    palette color, same noise process."""
    rng = np.random.default_rng(0)
    a = render_frames(np.full(64, PHASE_TOKENS[1]), 16, rng)
    rng = np.random.default_rng(0)
    b = render_frames(np.full(64, PHASE_TOKENS[4]), 16, rng)
    np.testing.assert_array_equal(a, b)


def test_generate_video_shapes_and_monotone_labels():
    rng = np.random.default_rng(1)
    frames, labels = generate_video(rng, dur_range=(5, 8), hw=16)
    assert frames.shape == (len(labels), 16, 16, 3)
    assert frames.dtype == np.uint8
    assert labels[0] == 0 and labels[-1] == 6
    assert (np.diff(labels) >= 0).all()          # monotonic phase progress
    assert set(np.unique(labels)) == set(range(7))
    durs = np.bincount(labels)
    assert durs.min() >= 5 and durs.max() <= 8


def test_write_dataset_feeds_the_real_manifest_builder(tmp_path):
    """The on-disk layout must round-trip through the production manifest
    walker (packed .npy + annotation txts, numeric video ids)."""
    from tmrnet_tpu.config import CHOLEC80_PHASES
    from tmrnet_tpu.data.manifests import build_manifest_from_frames

    out = write_synthetic_dataset(str(tmp_path), {"train": 2, "test": 1},
                                  seed=3, dur_range=(5, 7), hw=16)
    m = build_manifest_from_frames(out["train"], out["annotations"],
                                   CHOLEC80_PHASES, sample_stride=1)
    assert [v.video_id for v in m.videos] == ["1", "2"]
    mt = build_manifest_from_frames(out["test"], out["annotations"],
                                    CHOLEC80_PHASES, sample_stride=1)
    assert [v.video_id for v in mt.videos] == ["3"]
    # labels round-trip exactly and frames load through the packed reader
    from tmrnet_tpu.data.pipeline import load_frame

    v = m.videos[0]
    raw = np.load(os.path.join(out["train"], "1.npy"))
    assert len(v) == raw.shape[0] == len(v.labels)
    np.testing.assert_array_equal(load_frame(v.frame_paths[4]), raw[4])
    assert v.labels[0] == 0 and v.labels[-1] == 6


def test_frame_only_ceiling_formula():
    # seq as long as the max duration -> every clip sees the predecessor
    assert frame_only_ceiling(seq=26, dur_range=(15, 25)) == 1.0
    # seq=1, all-ambiguous map -> pure coin flip on ambiguous frames
    c = frame_only_ceiling(num_phases=2, seq=1, dur_range=(10, 10),
                           tokens=(0, 0))
    assert c == pytest.approx(0.5)
    # defaults sit in a plausible band
    c = frame_only_ceiling()
    assert 0.75 < c < 0.9


# ---------------------------------------------------------------------------
# multi-scale task (VERDICT r4 #1)


def test_multiscale_spec_invariants_hold():
    """The C1-C5 arithmetic that makes the task's claims PROVABLE (no row
    spans both markers; k=7 bridges only the close gap; the other block
    stays out of the window; no start-clamp multiplicity leak; matched
    durations) — and the checker actually rejects violations."""
    from tmrnet_tpu.data.synthetic import (
        MULTISCALE_SPEC,
        check_multiscale_spec,
    )

    check_multiscale_spec()  # the shipped spec passes

    def edited(i, lo, hi):
        s = [list(x) for x in MULTISCALE_SPEC]
        s[i][1], s[i][2] = lo, hi
        return [tuple(x) for x in s]

    with pytest.raises(ValueError, match="C1"):
        check_multiscale_spec(edited(2, 1, 2))      # a row spans X+Y
    with pytest.raises(ValueError, match="C2"):
        check_multiscale_spec(edited(2, 3, 12))     # close gap too wide
    with pytest.raises(ValueError, match="C2"):
        check_multiscale_spec(edited(8, 6, 9))      # far gap bridgeable
    with pytest.raises(ValueError, match="C3"):
        check_multiscale_spec(edited(6, 5, 8))      # old T leaks in
    with pytest.raises(ValueError, match="C4"):
        check_multiscale_spec(edited(0, 10, 12))    # start clamp leak
    with pytest.raises(ValueError, match="C5"):
        check_multiscale_spec(edited(5, 6, 8))      # pair durations differ
    with pytest.raises(ValueError, match="C6"):
        check_multiscale_spec(edited(2, 3, 6))      # strong rows out of span


def test_multiscale_video_structure():
    """Generated videos are one monotone pass over the 12 phases with
    durations inside the spec and the paired phases pixel-identically
    TOKENED (same palette color)."""
    from tmrnet_tpu.data.synthetic import (
        MULTISCALE_SPEC,
        generate_video_multiscale,
    )

    rng = np.random.default_rng(3)
    frames, labels = generate_video_multiscale(rng)
    assert labels.min() == 0 and labels.max() == 11
    assert (np.diff(labels) >= 0).all()
    for p, (tok, lo, hi) in enumerate(MULTISCALE_SPEC):
        n = int((labels == p).sum())
        assert lo <= n <= hi, (p, n)
    # paired phases share their token; mean color identical up to the
    # per-frame brightness jitter (+-12 uniform; short phases average only
    # a handful of draws, so allow ~3 sigma of the mean difference)
    for a, b in ((1, 7), (2, 8), (5, 11)):
        ca = frames[labels == a].astype(np.float64).mean(axis=(0, 1, 2))
        cb = frames[labels == b].astype(np.float64).mean(axis=(0, 1, 2))
        np.testing.assert_allclose(ca, cb, atol=15.0)
        # and both are FAR from every other token's base color
    from tmrnet_tpu.data.synthetic import MULTISCALE_SPEC, _PALETTE

    toks = [s[0] for s in MULTISCALE_SPEC]
    for a, b in ((1, 7), (2, 8), (5, 11)):
        assert toks[a] == toks[b]
        others = [t for t in set(toks) if t != toks[a]]
        ca = frames[labels == a].astype(np.float64).mean(axis=(0, 1, 2))
        for t in others:
            assert np.abs(ca - _PALETTE[t]).max() > 40


def test_multiscale_ceilings():
    """The pair is a provable coin flip for set-wise readers; the
    Monte-Carlo frame-only Bayes ceiling sits just below 0.5 — ambiguous
    pairs are coin flips AND pure-F clips split across four phases
    (lead/close gap/fill/far gap), pulling the posterior max under 1/2
    (measured 0.484 at the shipped spec)."""
    from tmrnet_tpu.data.synthetic import (
        multiscale_frame_only_ceiling,
        multiscale_pair_ceiling,
    )

    assert multiscale_pair_ceiling() == 0.5
    c = multiscale_frame_only_ceiling(n_mc=500)
    assert 0.42 < c < 0.55, c


def test_multiscale_writer_feeds_manifest_builder(tmp_path):
    """task='multiscale' writes the standard packed layout with NUMERIC
    labels, consumed by the real manifest builder unchanged."""
    from tmrnet_tpu.data.manifests import build_manifest_from_frames
    from tmrnet_tpu.data.synthetic import write_synthetic_dataset

    out = write_synthetic_dataset(str(tmp_path), {"test": 2}, seed=1,
                                  task="multiscale")
    m = build_manifest_from_frames(out["test"], out["annotations"],
                                   phase_names=[], sample_stride=1)
    assert len(m.videos) == 2
    labs = m.flat_labels()
    assert labs.min() == 0 and labs.max() == 11
