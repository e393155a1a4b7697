"""Failure handling and concurrency determinism."""

import threading

import numpy as np
import pytest

from tmrnet_tpu.data.manifests import Manifest, VideoRecord
from tmrnet_tpu.data.pipeline import ClipDataset, ClipLoader, array_frame_loader


def _manifest(n_videos=2, frames=20, hw=16):
    rng = np.random.RandomState(0)
    store, videos = {}, []
    for v in range(n_videos):
        paths = [f"v{v}/f{j}" for j in range(frames)]
        for p in paths:
            store[p] = rng.randint(0, 255, (hw, hw, 3)).astype(np.uint8)
        videos.append(VideoRecord(
            f"v{v}", paths, (np.arange(frames) % 7).astype(np.int64)))
    return Manifest(videos), store


def test_intermittent_decode_failures_yield_zero_frames_not_crashes():
    manifest, store = _manifest()
    calls = {"n": 0}
    lock = threading.Lock()
    base = array_frame_loader(store)

    def flaky(path):
        with lock:
            calls["n"] += 1
            fail = calls["n"] % 5 == 0
        if fail:
            raise IOError("transient decode failure")
        return base(path)

    ds = ClipDataset(manifest, 4, frame_loader=flaky, error_policy="zeros")
    loader = ClipLoader(ds, batch_clips=8, num_workers=4)
    total = 0
    for clips, labels, rows, pad in loader.epoch(0):
        assert np.isfinite(clips).all()
        total += len(rows) - pad
    assert total == ds.num_clips


def test_loader_deterministic_across_worker_counts():
    manifest, store = _manifest()
    ds = ClipDataset(manifest, 4, frame_loader=array_frame_loader(store))
    outs = []
    for workers in (1, 4, 8):
        loader = ClipLoader(ds, batch_clips=8, shuffle=True, seed=3,
                            num_workers=workers)
        batches = list(loader.epoch(2))
        outs.append((np.concatenate([b[0].ravel() for b in batches]),
                     np.concatenate([b[2] for b in batches])))
    for clips, rows in outs[1:]:
        np.testing.assert_array_equal(rows, outs[0][1])
        np.testing.assert_array_equal(clips, outs[0][0])


def test_transform_determinism_under_threading():
    # same clip, many threads, identical outputs (no hidden shared RNG state)
    from tmrnet_tpu.data.transforms import TrainTransform

    clip = np.random.RandomState(0).randint(
        0, 255, (4, 250, 250, 3)).astype(np.uint8)
    tf = TrainTransform()
    results = [None] * 8

    def work(i):
        results[i] = tf(clip, epoch=1, clip_id=42)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(8)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    for r in results[1:]:
        np.testing.assert_array_equal(r, results[0])
