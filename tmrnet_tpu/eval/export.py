"""Prediction export: per-video phase txt files for the relaxed-boundary
scorer (reference `eval/python/export_phase_copy.py`).

For each test video the first seq_len-1 frame positions have no clip
prediction; they are padded with phase 0 exactly like the reference (`:56-60`).
Rows are `fps*k <TAB> phase` with a parallel gt-phase/ tree, and the count
invariant num_labels == num_preds + (seq-1)*num_videos is asserted (`:32`).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from tmrnet_tpu.data.manifests import Manifest
from tmrnet_tpu.eval.metrics import write_phase_file


def export_predictions(
    manifest: Manifest,
    clip_preds: np.ndarray,
    seq_len: int,
    pred_dir: str,
    gt_dir: Optional[str] = None,
    fps: int = 25,
    video_name_fmt: str = "{vid}-phase.txt",
) -> Dict[str, float]:
    """clip_preds: concatenated per-clip predictions in bank-row order
    (video-major). Writes one txt per video; returns summary stats including
    the recomputed frame accuracy (reference `:83-89`)."""
    from tmrnet_tpu.data.indexing import clips_per_video

    lengths = manifest.video_lengths
    num_clips = clips_per_video(seq_len, lengths).tolist()
    expected = sum(num_clips)
    if len(clip_preds) != expected:
        raise ValueError(
            f"prediction count mismatch: got {len(clip_preds)}, expected "
            f"{expected} (= sum of per-video clip counts); the reference "
            f"invariant num_labels == num_preds + (seq-1)*num_videos fails")

    os.makedirs(pred_dir, exist_ok=True)
    if gt_dir:
        os.makedirs(gt_dir, exist_ok=True)

    correct = 0
    total = 0
    ofs = 0
    for video, n_clip in zip(manifest.videos, num_clips):
        # pad the first seq_len-1 positions with phase 0 (reference `:56-60`)
        per_frame = np.concatenate([
            np.zeros(min(seq_len - 1, len(video)), np.int64),
            np.asarray(clip_preds[ofs:ofs + n_clip], np.int64),
        ])
        ofs += n_clip
        name = video_name_fmt.format(vid=video.video_id)
        write_phase_file(os.path.join(pred_dir, name), per_frame, fps=fps)
        if gt_dir:
            write_phase_file(os.path.join(gt_dir, name), video.labels, fps=fps)
        correct += int((per_frame == video.labels[: len(per_frame)]).sum())
        total += len(per_frame)
    return {"frame_accuracy": correct / max(total, 1),
            "num_videos": len(lengths), "num_frames": total}


def load_exported(pred_dir: str, gt_dir: str,
                  video_ids: Sequence[str],
                  video_name_fmt: str = "{vid}-phase.txt",
                  phase_names: Optional[Sequence[str]] = None,
                  matlab_compat: bool = False
                  ) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """Read back exported pred/gt txt pairs for scoring. phase_names: the
    protocol's name->id order for name-labeled gt files (pass M2CAI_PHASES
    for m2cai — shared names map to different ids there); matlab_compat
    drops each file's first row like `ReadPhaseLabel.m:8`."""
    from tmrnet_tpu.eval.metrics import read_phase_file

    gts, preds = [], []
    for vid in video_ids:
        name = video_name_fmt.format(vid=vid)
        _, g = read_phase_file(os.path.join(gt_dir, name), phase_names,
                               matlab_compat)
        _, p = read_phase_file(os.path.join(pred_dir, name), phase_names,
                               matlab_compat)
        if g.shape != p.shape:
            raise ValueError(f"gt/pred length mismatch for {vid}")
        gts.append(g)
        preds.append(p)
    return gts, preds
