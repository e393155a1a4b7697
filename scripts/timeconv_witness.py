"""Constructive expressivity witness for the TimeConv multi-scale claim.

The multi-scale task (`data/synthetic.py::MULTISCALE_SPEC`) separates the
two memory heads ARCHITECTURALLY: nl_only reads the window as an unordered
row multiset and the designed pair's multisets are identically distributed
(provably chance, C5), while TimeConv computes per-row features from up to
7 adjacent rows and so CAN represent the close-vs-far X->Y gap. This
script proves the "CAN" by constructing the weights instead of learning
them:

    k=7 kernel, one channel: taps at offsets -3..-1 carry u (a linear
    X-ness detector), taps +1..+3 carry v (a Y-ness detector), both
    estimated from held-out rows by least squares. At a window position
    between a close X->Y pair, the left taps see X rows and the right taps
    see Y rows, so the channel fires ~(3u+3v); inside a lone marker it
    fires ~3u or ~3v; for the far gap no position ever sees both within
    +-3. The max over window positions therefore separates the pair.

Reported: AUC of that max-statistic on held-out pair windows (expect ~1.0)
and the accuracy of the best threshold. Together with the measured
learning runs (scripts/headlevel_multiscale.py) this separates
EXPRESSIVITY (witnessed here) from LEARNABILITY (what gradient descent
finds): docs/QUALITY.md "Multi-scale".

Usage: python scripts/timeconv_witness.py --work /tmp/mshead
(reuses the assets headlevel_multiscale.py builds).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def xy_detectors(work: str):
    """Least-squares linear detectors of X-ness / Y-ness on TRAIN bank rows.

    Targets are CONTAINMENT: a row is X-ish when any frame of its clip lies
    in an X phase (1/7). With containment, the last X-containing row and
    the first Y-containing row of a block are gap-(seq-2) = 1-2 rows apart
    for the close gap (within a k=7 tap span) vs >= 9 for the far gap —
    the distances the module docstring's construction relies on."""
    from tmrnet_tpu.data.indexing import clip_start_indices
    from tmrnet_tpu.data.manifests import load_pickle_manifest
    from tmrnet_tpu.data.synthetic import MULTISCALE_SEQ
    from tmrnet_tpu.memory.lfb import load_bank

    m, _ = load_pickle_manifest(f"{work}/train.pkl")
    bank = load_bank(f"{work}/lfb_train.npz")
    feats = np.asarray(bank.features, np.float64)
    starts = clip_start_indices(MULTISCALE_SEQ, m.video_lengths)
    labels = m.flat_labels()
    spans = labels[starts[:, None] + np.arange(MULTISCALE_SEQ)[None, :]]
    A = np.concatenate([feats, np.ones((len(feats), 1))], 1)

    def fit(target):
        w, *_ = np.linalg.lstsq(A, target.astype(np.float64), rcond=None)
        return w

    u = fit(np.isin(spans, (1, 7)).any(1))   # clip contains an X frame
    v = fit(np.isin(spans, (3, 9)).any(1))   # clip contains a Y frame
    return u, v


def pair_windows(work: str, split: str):
    from scripts.headlevel_multiscale import pair_tensors

    _, lt, yb = pair_tensors(work, split)
    return np.asarray(lt, np.float64), yb


def witness_statistic(lt: np.ndarray, u: np.ndarray, v: np.ndarray,
                      half: int = 3) -> np.ndarray:
    """max over window positions of (sum of X-ness at offsets -half..-1 +
    sum of Y-ness at offsets +1..+half) — exactly a single k=7 TimeConv
    channel with the constructed taps, reduced over positions.

    NOTE on orientation: window rows are ordered MOST-RECENT-FIRST
    (memory_window_rows, k=1..window), so 'X before Y in time' means the
    X rows sit at LARGER window indices than the Y rows."""
    n, w, f = lt.shape
    ones = np.ones((n, w, 1))
    la = np.concatenate([lt, ones], -1)
    xness = la @ u   # (n, w)
    yness = la @ v
    stat = np.full((n,), -np.inf)
    for p in range(w):
        lo_y, hi_y = max(p - half, 0), p          # more recent rows: Y side
        lo_x, hi_x = p + 1, min(p + half, w - 1) + 1   # older rows: X side
        if lo_y == hi_y or lo_x == hi_x:
            continue
        s = yness[:, lo_y:hi_y].sum(1) + xness[:, lo_x:hi_x].sum(1)
        stat = np.maximum(stat, s)
    return stat


def auc(stat: np.ndarray, y: np.ndarray) -> float:
    order = np.argsort(stat)
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(stat) + 1)
    pos = y == 1
    n1, n0 = int(pos.sum()), int((~pos).sum())
    if not n1 or not n0:
        return float("nan")
    return float((ranks[pos].sum() - n1 * (n1 + 1) / 2) / (n1 * n0))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--work", required=True)
    args = ap.parse_args(argv)
    u, v = xy_detectors(args.work)
    out = {}
    for split in ("train", "test"):
        lt, yb = pair_windows(args.work, split)
        s = witness_statistic(lt, u, v)
        # close gap (class 5 = label 0) has the conjunction -> HIGHER stat;
        # score AUC for the close class
        a = auc(s, 1 - yb)
        ths = np.unique(s)
        accs = [np.mean((s >= t) == (yb == 0)) for t in ths]
        out[split] = {"auc_close": round(a, 4),
                      "best_threshold_acc": round(float(max(accs)), 4),
                      "n": len(yb)}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
