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


def local_eval_mesh(cfg: ExperimentConfig):
    """Initialize the multi-controller runtime and return a PROCESS-LOCAL
    mesh over this process's devices (None with one local device): the
    engines stay single-controller; the distribution is over videos, not
    within a program. Call BEFORE the first backend query (weight restore,
    device listing) — jax.distributed.initialize comes first."""
    from tmrnet_tpu.parallel.mesh import initialize_multihost

    m = cfg.mesh
    try:
        initialize_multihost(
            coordinator=m.coordinator or None,
            num_processes=None if m.num_processes < 0 else m.num_processes,
            process_id=None if m.process_id < 0 else m.process_id)
    except RuntimeError:
        pass  # already initialized earlier in this process
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
