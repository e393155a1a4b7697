"""Unit tests for eval/distributed.py (multi-controller protocol eval) and
the process_local_bounds non-contiguous guard. The real 2-/4-process
integration runs live in tests/test_multihost_eval.py (slow tier)."""

import numpy as np
import pytest

from tmrnet_tpu.eval.distributed import (
    gather_video_results,
    partition_videos,
    run_corpus_distributed,
)


def test_partition_videos_deterministic_and_balanced():
    lengths = [5500, 1500, 3000, 2000, 4000, 2500, 1800, 3500]
    a = partition_videos(lengths, 3)
    b = partition_videos(lengths, 3)
    assert a == b                                    # deterministic
    flat = sorted(i for part in a for i in part)
    assert flat == list(range(len(lengths)))         # exact cover
    loads = [sum(lengths[i] for i in part) for part in a]
    # greedy longest-first keeps the spread well under one max video
    assert max(loads) - min(loads) <= max(lengths)
    # more parts than videos: empty tails, no crash
    parts = partition_videos([10, 20], 4)
    assert sum(len(p) for p in parts) == 2
    with pytest.raises(ValueError):
        partition_videos(lengths, 0)


def test_partition_videos_single_part_is_identity():
    assert partition_videos([3, 1, 2], 1) == [[0, 1, 2]]


def test_gather_video_results_single_process_roundtrip():
    """With one process the gather is a pure reshape: per-video results in,
    per-video results out, short videos (< seq) come back empty."""
    lengths = [10, 3, 7]
    seq, ncls = 4, 5
    rng = np.random.default_rng(0)
    local = {}
    for i, n in enumerate(lengths):
        k = max(0, n - seq + 1)
        local[i] = (rng.integers(0, ncls, k),
                    rng.random((k, ncls), dtype=np.float32))
    out = gather_video_results(local, [0, 0, 0], lengths, seq, ncls)
    assert len(out) == 3
    for i, (p, s) in enumerate(out):
        k = max(0, lengths[i] - seq + 1)
        assert p.shape == (k,) and s.shape == (k, ncls)
        np.testing.assert_array_equal(p, local[i][0])
        np.testing.assert_allclose(s, local[i][1])
    assert out[1][0].size == 0       # 3-frame video has no clip positions


def test_run_corpus_distributed_single_process_matches_engine():
    """process_count()==1: the distributed wrapper must equal a plain
    run_corpus call (same engine, same chunking)."""
    import dataclasses

    from tmrnet_tpu.config import EvalConfig, ExperimentConfig, MemoryConfig
    from tmrnet_tpu.data.synthetic import generate_video
    from tmrnet_tpu.eval.infer import VideoInference
    from tmrnet_tpu.models.tmrnet import build_model

    import jax
    import jax.numpy as jnp

    hw, seq = 24, 4
    cfg = ExperimentConfig(
        data=dataclasses.replace(ExperimentConfig().data,
                                 sequence_length=seq, crop_size=hw,
                                 resize=hw, mean=(0.5, 0.5, 0.5),
                                 std=(0.25, 0.25, 0.25)),
        model=dataclasses.replace(ExperimentConfig().model,
                                  backbone="tiny", stage_sizes=(1, 1),
                                  width=8, hidden_dim=16, num_classes=7,
                                  head="tmr", compute_dtype="float32"),
        memory=MemoryConfig(window=4),
        eval=EvalConfig(corpus=True, corpus_chunk=32),
    )
    rng = np.random.default_rng(1)
    vids = [generate_video(rng, dur_range=(4, 6), hw=hw)[0]
            for _ in range(3)]
    model = build_model(cfg.model)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, seq, hw, hw, 3)),
                           jnp.zeros((1, 4, 16)))
    ev = {"params": {"backbone": variables["params"]["backbone"],
                     "encoder": variables["params"]["encoder"]},
          "batch_stats": {"backbone": variables["batch_stats"]["backbone"]}}
    lengths = [v.shape[0] for v in vids]
    got = run_corpus_distributed(cfg, variables, ev, lengths,
                                 lambda i: vids[i])
    want = VideoInference(cfg, variables, ev).run_corpus(
        vids, chunk=cfg.eval.corpus_chunk)
    assert len(got) == len(want)
    for (gp, gs), (wp, ws) in zip(got, want):
        np.testing.assert_array_equal(gp, wp)
        np.testing.assert_allclose(gs, ws, rtol=1e-6)


def test_run_lfb_distributed_single_process_matches_video_build(tmp_path):
    """process_count()==1: the distributed bank builder must equal the
    plain video-engine build_lfb (same features, same first_rows), and
    write an identical .npz cache."""
    import dataclasses

    from tmrnet_tpu.config import ExperimentConfig
    from tmrnet_tpu.data.synthetic import write_synthetic_dataset
    from tmrnet_tpu.data.manifests import build_manifest_from_frames
    from tmrnet_tpu.data.pipeline import ClipDataset
    from tmrnet_tpu.data.transforms import EvalTransform
    from tmrnet_tpu.eval.distributed import run_lfb_distributed
    from tmrnet_tpu.models.tmrnet import build_model
    from tmrnet_tpu.train.loop import build_lfb
    from tmrnet_tpu.config import CHOLEC80_PHASES

    import jax
    import jax.numpy as jnp

    hw, seq = 24, 4
    out = write_synthetic_dataset(str(tmp_path), {"t": 3}, seed=5,
                                  dur_range=(4, 6), hw=hw)
    m = build_manifest_from_frames(out["t"], out["annotations"],
                                   CHOLEC80_PHASES, sample_stride=1)
    cfg = ExperimentConfig(
        data=dataclasses.replace(ExperimentConfig().data,
                                 sequence_length=seq, crop_size=20,
                                 resize=hw, mean=(0.5, 0.5, 0.5),
                                 std=(0.25, 0.25, 0.25)),
        model=dataclasses.replace(ExperimentConfig().model,
                                  backbone="tiny", stage_sizes=(1, 1),
                                  width=8, hidden_dim=16, num_classes=7,
                                  compute_dtype="float32"),
    )
    tf = EvalTransform(20, hw, 1, cfg.data.mean, cfg.data.std,
                       normalize=False)
    ds = ClipDataset(m, seq, transform=tf)
    model = build_model(dataclasses.replace(cfg.model, head="lfb"))
    variables = model.init(jax.random.PRNGKey(2),
                           jnp.zeros((1, seq, 20, 20, 3)))

    got = run_lfb_distributed(cfg, variables, ds,
                              cache_path=str(tmp_path / "mh.npz"))
    want = build_lfb(cfg, variables, ds, engine="video",
                     cache_path=str(tmp_path / "single.npz"), force=True)
    np.testing.assert_array_equal(np.asarray(got.first_rows),
                                  np.asarray(want.first_rows))
    np.testing.assert_allclose(np.asarray(got.features),
                               np.asarray(want.features), rtol=1e-6,
                               atol=1e-7)
    a = np.load(tmp_path / "mh.npz")
    b = np.load(tmp_path / "single.npz")
    np.testing.assert_allclose(a["features"], b["features"], rtol=1e-6,
                               atol=1e-7)
    assert np.abs(a["features"]).sum() > 0


def test_process_local_bounds_noncontiguous_raises(monkeypatch):
    """A mesh whose data axis interleaves processes gives this process
    non-contiguous batch rows; the guard must raise (callers fall back to
    the full global feed) instead of silently mislabeling rows."""
    import tmrnet_tpu.parallel.mesh as pm

    class FakeSharding:
        def addressable_devices_indices_map(self, shape):
            return {"d0": (slice(0, 2),), "d1": (slice(4, 6),)}

    monkeypatch.setattr(pm, "batch_sharding",
                        lambda mesh, data_axis=None: FakeSharding())
    with pytest.raises(ValueError, match="contiguous"):
        pm.process_local_bounds(object(), 8)


def test_process_local_bounds_contiguous_ok(monkeypatch):
    import tmrnet_tpu.parallel.mesh as pm

    class FakeSharding:
        def addressable_devices_indices_map(self, shape):
            return {"d0": (slice(4, 6),), "d1": (slice(6, 8),)}

    monkeypatch.setattr(pm, "batch_sharding",
                        lambda mesh, data_axis=None: FakeSharding())
    assert pm.process_local_bounds(object(), 8) == (4, 8)
