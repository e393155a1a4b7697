"""Dataset channel statistics (the reference's meanStd.py tool,
`Training memory bank model/meanStd.py:27-63`): per-channel mean/std over all
frames, computed streaming in one pass (sum / sum-of-squares accumulators
in float64 — at uint8/255 value range the raw-moment variance is exact to
~1e-12, and the clamp below only guards the theoretical negative-epsilon
case)."""

from __future__ import annotations

from typing import Callable, Iterable, Tuple

import numpy as np


def channel_stats(frames: Iterable[np.ndarray]) -> Tuple[np.ndarray, np.ndarray]:
    """frames: iterable of HxWx3 uint8 arrays -> (mean, std) in [0,1] scale,
    population std over all pixels (matching the reference's aggregate)."""
    n = 0
    s = np.zeros(3, np.float64)
    ss = np.zeros(3, np.float64)
    for img in frames:
        x = img.reshape(-1, img.shape[-1]).astype(np.float64) / 255.0
        n += x.shape[0]
        s += x.sum(axis=0)
        ss += (x * x).sum(axis=0)
    if n == 0:
        raise ValueError("no frames")
    mean = s / n
    var = ss / n - mean * mean
    return mean.astype(np.float32), np.sqrt(np.maximum(var, 0)).astype(np.float32)
