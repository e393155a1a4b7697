"""Multi-controller protocol evaluation (VERDICT r3 #2).

The corpus engine is embarrassingly parallel over videos: each video's
prediction stream depends on nothing outside that video. This module lifts
the engines' single-controller gate for exactly that case — WITHOUT
touching the engines: every process runs an unmodified, process-LOCAL
`VideoInference` over its own partition of the test videos, and the
per-clip predictions are all-gathered so every process (in particular
process 0, which writes the npz / export tree / protocol table) holds the
full, identically-ordered result list. Outputs are byte-identical to a
single-process run over the same manifest (tests/test_multihost_eval.py).

Reference workload being scaled out: the 40-video Cholec80 test pass of
`code/eval/python/test_singlenet_phase_non-local_pretrained_2fc_copy.py:273-457`.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from tmrnet_tpu.config import ExperimentConfig


def partition_videos(lengths: Sequence[int], num_parts: int
                     ) -> List[List[int]]:
    """Deterministic balanced partition of video indices by frame count:
    longest-first greedy into the currently lightest part (ties broken by
    part index). Every process computes the identical partition from the
    shared manifest, so ownership needs no coordination."""
    if num_parts < 1:
        raise ValueError(f"num_parts must be >= 1, got {num_parts}")
    order = sorted(range(len(lengths)), key=lambda i: (-int(lengths[i]), i))
    parts: List[List[int]] = [[] for _ in range(num_parts)]
    loads = [0] * num_parts
    for i in order:
        p = min(range(num_parts), key=lambda j: (loads[j], j))
        parts[p].append(i)
        loads[p] += int(lengths[i])
    return [sorted(p) for p in parts]


def _distributed_initialized() -> bool:
    """True iff jax.distributed.initialize already ran in this process."""
    try:
        from jax._src import distributed

        return distributed.global_state.client is not None
    except Exception:  # pragma: no cover - private-API drift fallback
        return False


def local_eval_mesh(cfg: ExperimentConfig):
    """Initialize the multi-controller runtime and return a PROCESS-LOCAL
    mesh over this process's devices (None with one local device): the
    engines stay single-controller; the distribution is over videos, not
    within a program. Call BEFORE the first backend query (weight restore,
    device listing) — jax.distributed.initialize comes first."""
    from tmrnet_tpu.parallel.mesh import initialize_multihost

    m = cfg.mesh
    # Only skip init when the runtime is ALREADY initialized — swallowing
    # every RuntimeError would also hide genuine rendezvous failures
    # (XlaRuntimeError is a RuntimeError subclass), and a process whose
    # init silently failed would recompute the full eval as process 0 and
    # race the real process 0 on the output files.
    if not _distributed_initialized():
        initialize_multihost(
            coordinator=m.coordinator or None,
            num_processes=None if m.num_processes < 0 else m.num_processes,
            process_id=None if m.process_id < 0 else m.process_id)
    import jax

    local = jax.local_devices()
    if len(local) <= 1:
        return None
    from tmrnet_tpu.parallel.mesh import make_mesh

    return make_mesh(cfg.mesh, devices=local)


def gather_video_results(
    local: dict,
    owner_of: Sequence[int],
    lengths: Sequence[int],
    seq_len: int,
    num_classes: int,
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """All-gather per-video (preds, probs) across processes.

    local: {video_index: (preds (k,), probs (k, C))} for the videos THIS
    process ran. owner_of: video index -> owning process (from
    partition_videos — identical on every process). Returns the full
    ordered [(preds, probs)] list on EVERY process."""
    import jax
    from jax.experimental import multihost_utils

    nv = len(lengths)
    ks = [max(0, int(n) - seq_len + 1) for n in lengths]
    maxk = max(ks, default=0)
    preds = np.full((nv, max(maxk, 1)), -1, np.int32)
    probs = np.zeros((nv, max(maxk, 1), num_classes), np.float32)
    for i, (p, s) in local.items():
        k = ks[i]
        if k:
            preds[i, :k] = np.asarray(p, np.int32)
            probs[i, :k] = np.asarray(s, np.float32)
    if jax.process_count() > 1:
        # one tiled gather per array: (V, L) -> (P, V, L); each video's row
        # is then read from its owner's slot (exactly one owner per video)
        g_preds = np.asarray(multihost_utils.process_allgather(preds))
        g_probs = np.asarray(multihost_utils.process_allgather(probs))
        preds = np.stack([g_preds[owner_of[i], i] for i in range(nv)])
        probs = np.stack([g_probs[owner_of[i], i] for i in range(nv)])
    return [(preds[i, :ks[i]].astype(np.int64), probs[i, :ks[i]])
            for i in range(nv)]


def run_lfb_distributed(cfg: ExperimentConfig, extractor_variables, ds,
                        cache_path: Optional[str] = None, mesh=None):
    """Video-engine LFB build partitioned over controllers.

    Each process runs the video-engine extractor (ONE backbone pass per
    frame — seq_len x less work than the clip-wise multi-controller build
    that `train.loop.build_lfb` falls back to on a global mesh) over its
    own video partition with a process-LOCAL `VideoInference`; the
    per-video feature blocks all-gather so every process returns the full
    bank; process 0 writes the .npz cache. Features are byte-identical to
    the single-process video build: each video's math is independent of
    which process computes it (tests/test_multihost_eval.py).

    The gather is owner-sliced: each process ships only its OWNED rows
    (padded to the max per-process row count), ~(rows/P x hidden) instead
    of the full matrix — at the reference's scale (150k rows x 512 f32)
    that is ~300 MB/P per process over DCN instead of ~300 MB each.

    mesh: optional PROCESS-LOCAL mesh (`local_eval_mesh`)."""
    import jax
    import jax.numpy as jnp

    from tmrnet_tpu.eval.infer import VideoInference
    from tmrnet_tpu.memory.lfb import FeatureBank, save_bank
    from tmrnet_tpu.train.loop import (
        framewise_transform_for_video_build,
        load_video_frames,
    )

    from tmrnet_tpu.data.indexing import clips_per_video

    tf = framewise_transform_for_video_build(ds)
    lengths = ds.manifest.video_lengths
    bank = FeatureBank.create(ds.seq_len, lengths, cfg.model.hidden_dim)
    total, dim = bank.features.shape
    first_of = np.concatenate(
        [[0], np.cumsum(clips_per_video(ds.seq_len, lengths))]
    ).astype(np.int64)

    parts = partition_videos(lengths, jax.process_count())
    mine = parts[jax.process_index()]
    feats = np.zeros((total, dim), np.float32)
    row_owner = np.zeros((total,), np.int64)
    for p, vids in enumerate(parts):
        for i in vids:
            row_owner[first_of[i]:first_of[i + 1]] = p
    if mine:
        eng = VideoInference(cfg, extractor_variables, extractor_variables,
                             mesh=mesh)
        pending = []
        for i in mine:
            frames = load_video_frames(ds, ds.manifest.videos[i])
            if tf is not None:
                frames = tf(frames)
            # keep the values on device until every video is dispatched
            # (one fetch per video AFTER dispatch, not inside the loop)
            pending.append((i, eng.bank_features(frames)))
        for i, vals in pending:
            k = first_of[i + 1] - first_of[i]
            if k:
                feats[first_of[i]:first_of[i + 1]] = (
                    np.asarray(vals).astype(np.float32))
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        # owner-sliced all-gather: every process sends only the rows it
        # owns, padded to the max owned-row count (allgather needs one
        # static shape); receivers scatter each slot back by ownership
        own_rows = [np.flatnonzero(row_owner == p)
                    for p in range(jax.process_count())]
        maxn = max((len(r) for r in own_rows), default=0)
        send = np.zeros((max(maxn, 1), dim), np.float32)
        mine_rows = own_rows[jax.process_index()]
        send[:len(mine_rows)] = feats[mine_rows]
        g = np.asarray(multihost_utils.process_allgather(send))
        for p, rows in enumerate(own_rows):
            feats[rows] = g[p, :len(rows)]
    bank = FeatureBank(features=jnp.asarray(feats),
                       first_rows=bank.first_rows)
    if cache_path and jax.process_index() == 0:
        save_bank(cache_path, bank)
    return bank


def run_corpus_distributed(
    cfg: ExperimentConfig,
    variables,
    extractor_variables,
    lengths: Sequence[int],
    load_video: Callable[[int], np.ndarray],
    mesh=None,
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Whole-test-set inference partitioned over controllers.

    lengths: per-video frame counts in manifest order. load_video:
    video index -> (N_i, H, W, 3) transformed frames (called lazily, only
    for this process's videos). mesh: optional PROCESS-LOCAL mesh
    (local_eval_mesh). Returns the full [(preds, probs)] list, identical
    on every process and byte-identical to a single-process run_corpus."""
    import jax

    from tmrnet_tpu.eval.infer import VideoInference

    parts = partition_videos(lengths, jax.process_count())
    owner_of = [0] * len(lengths)
    for p, vids in enumerate(parts):
        for i in vids:
            owner_of[i] = p
    mine = parts[jax.process_index()]
    local: dict = {}
    if mine:
        engine = VideoInference(cfg, variables, extractor_variables,
                                mesh=mesh)
        outs = engine.run_corpus(
            [(lambda i=i: load_video(i)) for i in mine],
            lengths=[lengths[i] for i in mine],
            chunk=cfg.eval.corpus_chunk)
        local = dict(zip(mine, outs))
    return gather_video_results(local, owner_of, lengths,
                                cfg.data.sequence_length,
                                cfg.model.num_classes)
