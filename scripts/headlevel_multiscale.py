"""Head-level architecture ranking on the multi-scale task (VERDICT r4 #1).

Trains ONLY the memory head — TimeConv + NLBlock + the TMRNet classifier
stack, i.e. `models/tmrnet.py::TMRNet` minus the clip encoder — on FROZEN
stage-1 bank features, as a binary classifier restricted to the designed
ambiguous pair (phases 5 vs 11 of `data/synthetic.py::MULTISCALE_SPEC`).

Why head-only: the end-to-end stage-2 study optimizes a 12-way objective
through a near-uniform attention softmax with SGD at reference
hyperparameters; whether that OPTIMIZATION finds the close-gap conjunction
is a separate question from whether the ARCHITECTURE can express and learn
it. This experiment isolates the architectural claim the paper makes for
the multi-scale TimeConv pyramid (reference `Training TMRNet/
NLBlock_MutiConv6_3.py:43-79`):

* nl_only (no TimeConv) reads the window through single-query attention
  with no positional encoding — its logits are a function of the row
  MULTISET, and the two classes' multisets are identically distributed
  (C5 in data/synthetic.py), so its pair accuracy is provably ~0.5.
* tmr's TimeConv computes per-row features from up to 7 adjacent rows
  BEFORE attention, so it can represent "X-row within k of a Y-row" —
  exactly the close/far gap distinction.

The run builds its own dataset + stage-1 extractor + banks through the
real CLI (synth -> manifest -> train-bank -> build-lfb), then trains the
two heads with Adam on the pair clips only. Results: docs/QUALITY.md
"Multi-scale". Runs on CPU (tiny backbone; forces jax_platforms=cpu).

Usage:  python scripts/headlevel_multiscale.py --work /tmp/mshead --seeds 0 1
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402
from flax import linen as nn  # noqa: E402

from scripts.efficacy_study import common_overrides, run_cli  # noqa: E402
from tmrnet_tpu.data.indexing import (  # noqa: E402
    clip_start_indices,
    rows_to_video_ids,
    video_first_rows,
)
from tmrnet_tpu.data.manifests import load_pickle_manifest  # noqa: E402
from tmrnet_tpu.data.synthetic import (  # noqa: E402
    MULTISCALE_PAIR,
    MULTISCALE_SEQ,
    MULTISCALE_WINDOW,
)
from tmrnet_tpu.memory.lfb import gather_memory_windows, load_bank  # noqa: E402
from tmrnet_tpu.models.blocks import NLBlock, TimeConv  # noqa: E402

_xavier = nn.initializers.xavier_uniform()


class HeadOnly(nn.Module):
    """TMRNet's post-encoder stack (`models/tmrnet.py::TMRNet`, reference
    `train_non-local_mutiConv_resnet.py:208-253`) over frozen features:
    st = the clip's own bank row, lt = its memory window. Dropout off —
    this is an expressivity experiment, not a regularization study."""

    hidden: int
    use_time_conv: bool
    num_classes: int = 2

    @nn.compact
    def __call__(self, st: jax.Array, lt: jax.Array) -> jax.Array:
        if self.use_time_conv:
            lt = TimeConv(self.hidden, name="time_conv")(lt)
        y1 = NLBlock(self.hidden, dropout=0.0, name="nl_block")(
            st, lt, deterministic=True)
        y = jnp.concatenate([st, y1], axis=-1)
        y = nn.Dense(self.hidden, kernel_init=_xavier, name="fc_h_c")(y)
        y = nn.relu(y)
        return nn.Dense(self.num_classes, kernel_init=_xavier, name="fc_c")(y)


def build_assets(work: str, videos=(24, 2, 8), seed: int = 0,
                 epochs1: int = 6, lr1: float = 0.05) -> None:
    """Dataset + stage-1 extractor + train/test banks via the real CLI."""
    ov = common_overrides(work, seed, task="multiscale")
    if not os.path.exists(f"{work}/test.pkl"):
        run_cli(["synth", "--out-dir", work, "--train", videos[0],
                 "--val", videos[1], "--test", videos[2], "--hw", 32,
                 "--seed", 0, "--task", "multiscale"])
        for split in ("train", "val", "test"):
            run_cli(["manifest", "--frames", f"{work}/frames-{split}",
                     "--annotations", f"{work}/annotations",
                     "--stride", 1, "--out", f"{work}/{split}.pkl"])
    s1 = f"{work}/ckpt-stage1"
    if not os.path.exists(os.path.join(s1, "best.json")):
        run_cli(["train-bank", "--train-manifest", f"{work}/train.pkl",
                 "--val-manifest", f"{work}/val.pkl",
                 "--log-dir", f"{work}/logs-s1", *ov,
                 "--set", f"train.epochs={epochs1}",
                 "--set", f"train.lr={lr1}",
                 "--set", f"train.checkpoint_dir={s1}"])
    for split in ("train", "test"):
        if not os.path.exists(f"{work}/lfb_{split}.npz"):
            run_cli(["build-lfb", "--manifest", f"{work}/{split}.pkl",
                     "--ckpt", s1, "--out", f"{work}/lfb_{split}.npz", *ov])


def pair_tensors(work: str, split: str):
    """(st, window, binary label) for every clip of the designed pair,
    using the SAME row/window mapping as the engines (memory/lfb.py)."""
    m, _ = load_pickle_manifest(f"{work}/{split}.pkl")
    bank = load_bank(f"{work}/lfb_{split}.npz")
    seq = MULTISCALE_SEQ
    starts = clip_start_indices(seq, m.video_lengths)
    y = m.flat_labels()[starts + seq - 1]
    rows = np.arange(len(starts), dtype=np.int64)
    vids = rows_to_video_ids(len(rows), seq, m.video_lengths)
    firsts = video_first_rows(seq, m.video_lengths)[vids]
    mask = np.isin(y, MULTISCALE_PAIR)
    rows, firsts = rows[mask], firsts[mask]
    lt = gather_memory_windows(bank.features, jnp.asarray(rows),
                               jnp.asarray(firsts), MULTISCALE_WINDOW)
    st = bank.features[rows]
    yb = (y[mask] == MULTISCALE_PAIR[1]).astype(np.int64)
    return np.asarray(st), np.asarray(lt), yb


def train_head(st, lt, y, st_te, lt_te, y_te, use_time_conv: bool,
               seed: int, hidden: int, steps: int = 3000,
               batch: int = 128, lr: float = 1e-3) -> dict:
    model = HeadOnly(hidden=hidden, use_time_conv=use_time_conv)
    params = model.init(jax.random.key(seed), st[:2], lt[:2])
    tx = optax.adam(lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, sb, lb, yb):
        def loss_fn(p):
            logits = model.apply(p, sb, lb)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yb).mean()
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    @jax.jit
    def acc(params, sb, lb, yb):
        return (model.apply(params, sb, lb).argmax(-1) == yb).mean()

    rng = np.random.default_rng(seed)
    st, lt, y = map(jnp.asarray, (st, lt, y))
    n = st.shape[0]
    for i in range(steps):
        idx = rng.integers(0, n, size=min(batch, n))
        params, opt, loss = step(params, opt, st[idx], lt[idx], y[idx])
    return {"head": "tmr" if use_time_conv else "nl_only", "seed": seed,
            "train_acc": float(acc(params, st, lt, y)),
            "test_acc": float(acc(params, jnp.asarray(st_te),
                                  jnp.asarray(lt_te), jnp.asarray(y_te)))}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--work", required=True)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1])
    ap.add_argument("--train-videos", type=int, default=24)
    ap.add_argument("--test-videos", type=int, default=8)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--hidden", type=int, default=32)
    args = ap.parse_args(argv)
    os.makedirs(args.work, exist_ok=True)
    build_assets(args.work, videos=(args.train_videos, 2, args.test_videos))
    st, lt, y = pair_tensors(args.work, "train")
    st_te, lt_te, y_te = pair_tensors(args.work, "test")
    print(f"pair clips: train={len(y)} (pos {int(y.sum())}) "
          f"test={len(y_te)} (pos {int(y_te.sum())})")
    rows = []
    for seed in args.seeds:
        for tc in (True, False):
            r = train_head(st, lt, y, st_te, lt_te, y_te, tc, seed,
                           args.hidden, steps=args.steps)
            rows.append(r)
            print(json.dumps(r))
    with open(os.path.join(args.work, "headlevel_results.json"), "w") as f:
        json.dump(rows, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
