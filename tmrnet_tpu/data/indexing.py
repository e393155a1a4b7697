"""Clip-index machinery.

Reimplements the reference's index algebra (SURVEY.md section 2.2/2.4) as
vectorized numpy/jnp:

* clip starts that never cross a video boundary
  (reference `get_useful_start_idx`, `train_singlenet_phase_1fc.py:235-242`);
* start-index -> dense LFB-row mapping
  (reference `train_non-local_mutiConv_resnet.py:643-660`);
* the per-clip memory-window gather of the previous `window` LFB rows
  (reference `get_long_feature`, `train_non-local_mutiConv_resnet.py:298-326`).

Two window modes:
  clamped (default) -- lookback stops at the video's first clip, repeating the
      earliest available feature: row[k] = max(r - k, first_row(video)).
      This is the paper's intent and is a closed-form jnp expression, so the
      gather lives on-device.
  reference-quirk -- byte-compatible with the reference dict walk, whose
      lookback silently crosses video boundaries through the seq_len-1
      non-start tail frames of the previous video (SURVEY.md 2.9-8).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def clip_start_indices(seq_len: int, video_lengths: Sequence[int]) -> np.ndarray:
    """Global frame indices at which a seq_len-frame clip may start.

    Each video of length n contributes n + 1 - seq_len starts, so no clip
    crosses a video boundary. Matches reference `get_useful_start_idx`.
    """
    starts: List[np.ndarray] = []
    base = 0
    for n in video_lengths:
        if n >= seq_len:
            starts.append(base + np.arange(n + 1 - seq_len, dtype=np.int64))
        base += n
    if not starts:
        return np.zeros((0,), dtype=np.int64)
    return np.concatenate(starts)


def expand_clip_indices(starts: Sequence[int], seq_len: int) -> np.ndarray:
    """Flat per-frame index list: [s, s+1, ..., s+seq_len-1] per start.

    Matches the SeqSampler feed (reference `train_memorybank.py:170-176`).
    """
    starts = np.asarray(starts, dtype=np.int64)
    return (starts[:, None] + np.arange(seq_len, dtype=np.int64)[None, :]).reshape(-1)


def clips_per_video(seq_len: int, video_lengths: Sequence[int]) -> np.ndarray:
    """Number of clip positions (= LFB rows) per video."""
    lengths = np.asarray(video_lengths, dtype=np.int64)
    return np.maximum(lengths + 1 - seq_len, 0)


def video_first_rows(seq_len: int, video_lengths: Sequence[int]) -> np.ndarray:
    """First LFB row index of each video (exclusive cumsum of clips_per_video)."""
    cpv = clips_per_video(seq_len, video_lengths)
    if cpv.size == 0:   # np.concatenate([[0], ...]) would yield length 1
        return np.zeros(0, dtype=np.int64)
    return np.concatenate([[0], np.cumsum(cpv)[:-1]]).astype(np.int64)


def rows_to_video_ids(num_rows: int, seq_len: int,
                      video_lengths: Sequence[int]) -> np.ndarray:
    """Map each LFB row to its video id."""
    cpv = clips_per_video(seq_len, video_lengths)
    return np.repeat(np.arange(len(cpv), dtype=np.int64), cpv)[:num_rows]


def memory_window_rows(rows, first_rows, window: int):
    """Clamped memory window: for bank row r with video first-row f, the rows of
    the previous `window` clips, oldest-feature-repeated at video start.

    Works on numpy or jax arrays (pure elementwise max), so it can run inside
    a jitted gather. Returns shape rows.shape + (window,), ordered k=1..window
    (most recent first), matching the reference's long_feature ordering.
    """
    import jax.numpy as jnp

    xp = jnp if not isinstance(rows, np.ndarray) else np
    rows = rows[..., None]
    first = first_rows[..., None]
    ks = xp.arange(1, window + 1, dtype=rows.dtype)
    return xp.maximum(rows - ks, first)


def quirk_window_table(seq_len: int, video_lengths: Sequence[int],
                       window: int) -> np.ndarray:
    """Precomputed (num_rows, window) reference-quirk window table for a whole
    dataset: row r's memory window rows under the reference's dict walk
    (cross-video lookback included). Indexed per batch as table[rows]; the
    gather itself stays on device."""
    starts = clip_start_indices(seq_len, video_lengths)
    return memory_window_rows_reference(starts, seq_len, video_lengths, window)


def memory_window_rows_reference(
    start_frames: Sequence[int],
    seq_len: int,
    video_lengths: Sequence[int],
    window: int,
) -> np.ndarray:
    """Reference-exact window rows via the dict walk, including cross-video
    lookback and repeat-last-valid gap filling (`get_long_feature`,
    `train_non-local_mutiConv_resnet.py:298-326`). Host-side only; used for
    parity tests and the compat flag.
    """
    all_starts = clip_start_indices(seq_len, video_lengths)
    start_to_row = {int(s): i for i, s in enumerate(all_starts.tolist())}
    out = np.zeros((len(start_frames), window), dtype=np.int64)
    for b, s in enumerate(start_frames):
        s = int(s)
        last_valid = start_to_row[s]
        for k in range(window):
            frame = s - k - 1
            row = start_to_row.get(frame)
            if row is not None:
                out[b, k] = row
                last_valid = row
            else:
                out[b, k] = last_valid
    return out
