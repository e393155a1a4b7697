"""Learning efficacy study: prove the stage-1 -> LFB -> stage-2 pipeline
actually LEARNS temporal structure, end-to-end through the real CLI.

The reference method exists because long-term memory should beat a
frame-only model (`train_non-local_mutiConv_resnet.py:208-253`); with no
real Cholec80 assets in this environment, this study demonstrates it on
the synthetic memory-dependent task of `tmrnet_tpu/data/synthetic.py`:
phases 1/4 and 3/6 are pixel-identical, disambiguated only by the phase
that came before — which sits outside the 10-frame clip but inside the
30-row memory window.

Every step runs through `python -m tmrnet_tpu ...` (in-process): synth ->
manifest -> train-bank -> test(stage1 baseline) -> build-lfb(train,val) ->
train-tmr(tmr, nl_only) -> test -> export -> evaluate (the ported Main.m
protocol). Results land in docs/QUALITY.md.

Usage:  python scripts/efficacy_study.py --work /tmp/efficacy --seeds 0 1
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tmrnet_tpu.cli import main as cli_main  # noqa: E402


def run_cli(argv) -> str:
    """One in-process CLI invocation; returns captured stdout."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main([str(a) for a in argv])
    out = buf.getvalue()
    if rc != 0:
        raise RuntimeError(f"CLI {argv[0]} failed rc={rc}:\n{out}")
    return out


def last_json(text: str) -> dict:
    lines = [ln for ln in text.strip().splitlines() if ln.startswith("{")]
    return json.loads(lines[-1]) if lines else {}


def common_overrides(work: str, seed: int, hw: int = 32, hidden: int = 32,
                     batch: int = 16, backbone: str = "tiny",
                     compute_dtype: str = "float32",
                     task: str = "pairs", extra_sets=()) -> list:
    """Config shared by every arm. The tiny defaults are CPU-runnable (the
    task's structure, not its scale, is what the study measures); pass
    --full-scale to the CLI for the real ResNet-50 at 224px on the TPU
    (docs/QUALITY.md 'Full scale'). task='multiscale' switches to the
    12-phase tmr-vs-nl_only ranking task (window 40, data/synthetic.py
    MULTISCALE_SPEC)."""
    sets = [
        f"data.crop_size={224 if hw >= 224 else hw - 4}",
        f"data.resize={hw}",
        "data.mean=0.5,0.5,0.5", "data.std=0.25,0.25,0.25",
        f"data.batch_clips={batch}", "data.num_workers=2", "data.prefetch=2",
        f"model.backbone={backbone}", f"model.hidden_dim={hidden}",
        f"model.compute_dtype={compute_dtype}",
        f"train.seed={seed}", "train.schedule=constant",
        "train.log_every=1000",
    ]
    if task == "multiscale":
        from tmrnet_tpu.data.synthetic import MULTISCALE_SEQ, MULTISCALE_WINDOW

        sets += ["model.num_classes=12",
                 f"memory.window={MULTISCALE_WINDOW}",
                 f"data.sequence_length={MULTISCALE_SEQ}"]
    else:
        sets.append("memory.window=30")
    sets.extend(extra_sets)
    return [x for s in sets for x in ("--set", s)]


def train_and_score(work: str, seed: int, head: str, stage1_dir: str,
                    epochs: int, lr: float, scale: dict = {},
                    task: str = "pairs", stage2_sets=()) -> dict:
    """Stage-2 training (tmr | nl_only) + protocol scoring of the result.
    stage2_sets: extra overrides applied ONLY to the stage-2 arms (e.g.
    train.optimizer=adam to ablate the head optimizer while keeping the
    stage-1 baseline arm canonical)."""
    ckpt = os.path.join(work, f"ckpt-{head}-s{seed}")
    s2 = {**scale, "extra_sets":
          tuple(scale.get("extra_sets", ())) + tuple(stage2_sets)}
    ov = common_overrides(work, seed, task=task, **s2)
    run_cli(["train-tmr",
             "--train-manifest", f"{work}/train.pkl",
             "--val-manifest", f"{work}/val.pkl",
             "--lfb", f"{work}/lfb_train.npz",
             "--val-lfb", f"{work}/lfb_val.npz",
             "--stage1-ckpt", stage1_dir,
             "--log-dir", f"{work}/logs-{head}-s{seed}",
             *ov, "--set", f"model.head={head}",
             "--set", f"train.epochs={epochs}", "--set", f"train.lr={lr}",
             "--set", f"train.checkpoint_dir={ckpt}"])
    return score_arm(work, seed, head, ckpt, extractor=stage1_dir,
                     scale=s2, task=task)


def multiscale_metrics(manifest_path: str, preds_path: str,
                       seq: int = 0) -> dict:
    """Task-specific scores for the 12-phase multiscale task: accuracy on
    the DESIGNED pair (phases 5 vs 11 — provably a coin flip for any model
    reading the window as an unordered row multiset, incl. nl_only), plus
    unrelaxed macro-Jaccard over all phases. The 7-phase reference
    protocol scorer doesn't apply here."""
    import numpy as np

    from tmrnet_tpu.data.indexing import clip_start_indices
    from tmrnet_tpu.data.manifests import load_pickle_manifest
    from tmrnet_tpu.data.synthetic import (
        MULTISCALE_PAIR,
        MULTISCALE_SEQ,
        MULTISCALE_SPEC,
    )

    seq = seq or MULTISCALE_SEQ
    m, _ = load_pickle_manifest(manifest_path)
    starts = clip_start_indices(seq, m.video_lengths)
    y = m.flat_labels()[starts + seq - 1]
    p = np.load(preds_path)["preds"]
    assert len(p) == len(y), (len(p), len(y))
    mask = np.isin(y, MULTISCALE_PAIR)
    nph = len(MULTISCALE_SPEC)
    jac = []
    for c in range(nph):
        inter = int(((p == c) & (y == c)).sum())
        union = int(((p == c) | (y == c)).sum())
        if union:
            jac.append(inter / union)
    return {"pair_accuracy": float((p[mask] == y[mask]).mean()),
            "macro_jaccard": float(np.mean(jac))}


def score_arm(work: str, seed: int, arm: str, ckpt: str,
              extractor: str = "", scale: dict = {},
              task: str = "pairs") -> dict:
    """test -> export -> evaluate for one trained arm; returns its numbers.
    (multiscale: test -> pair/jaccard scores — the reference protocol
    scorer is 7-phase.)"""
    ov = common_overrides(work, seed, task=task, **scale)
    head = "stage1" if arm == "stage1" else arm
    preds = f"{work}/preds-{arm}-s{seed}.npz"
    argv = ["test", "--manifest", f"{work}/test.pkl", "--ckpt", ckpt,
            "--out", preds, *ov, "--set", f"model.head={head}"]
    if extractor:
        argv += ["--extractor-ckpt", extractor]
    t = last_json(run_cli(argv))
    if task == "multiscale":
        ms = multiscale_metrics(f"{work}/test.pkl", preds)
        return {"arm": arm, "seed": seed, "task": task,
                "clip_accuracy": t["clip_accuracy"], **ms}
    pred_dir = f"{work}/eval-{arm}-s{seed}/phase"
    gt_dir = f"{work}/eval-{arm}-s{seed}/gt-phase"
    run_cli(["export", "--manifest", f"{work}/test.pkl", "--preds", preds,
             "--pred-dir", pred_dir, "--gt-dir", gt_dir])
    jout = f"{work}/protocol-{arm}-s{seed}.json"
    run_cli(["evaluate", "--pred-dir", pred_dir, "--gt-dir", gt_dir,
             "--json-out", jout])
    with open(jout) as f:
        rep = json.load(f)
    return {"arm": arm, "seed": seed,
            "clip_accuracy": t["clip_accuracy"],
            "protocol_accuracy": rep["mean_accuracy"],
            "protocol_jaccard": rep["mean_jaccard"]}


def run_study(work: str, seed: int = 0, videos=(8, 2, 4),
              epochs1: int = 6, epochs2: int = 6,
              lr1: float = 0.05, lr2: float = 0.001,
              heads=("tmr", "nl_only"), hw: int = 32,
              dur=(15, 25), scale: dict = {}, task: str = "pairs",
              stage2_sets=()) -> list:
    """Full pipeline for one seed. Returns one result dict per arm
    (stage1 + each stage-2 head)."""
    os.makedirs(work, exist_ok=True)
    # 1) dataset + manifests (data seed fixed: every seed trains on the
    #    same videos; train.seed varies init/shuffles/augs)
    hw = scale.get("hw", hw)
    if not os.path.exists(f"{work}/test.pkl"):
        run_cli(["synth", "--out-dir", work, "--train", videos[0],
                 "--val", videos[1], "--test", videos[2], "--hw", hw,
                 "--dur-min", dur[0], "--dur-max", dur[1], "--seed", 0,
                 "--task", task])
        for split in ("train", "val", "test"):
            run_cli(["manifest", "--frames", f"{work}/frames-{split}",
                     "--annotations", f"{work}/annotations",
                     "--stride", 1, "--out", f"{work}/{split}.pkl"])
    ov = common_overrides(work, seed, task=task, **scale)

    # 2) stage-1 memory-bank model (the frame-only baseline arm)
    s1 = f"{work}/ckpt-stage1-s{seed}"
    run_cli(["train-bank", "--train-manifest", f"{work}/train.pkl",
             "--val-manifest", f"{work}/val.pkl",
             "--log-dir", f"{work}/logs-s1-s{seed}", *ov,
             "--set", f"train.epochs={epochs1}", "--set", f"train.lr={lr1}",
             "--set", f"train.checkpoint_dir={s1}"])
    results = [score_arm(work, seed, "stage1", s1, scale=scale, task=task)]

    # 3) LFB banks from the frozen stage-1 extractor
    for split in ("train", "val"):
        run_cli(["build-lfb", "--manifest", f"{work}/{split}.pkl",
                 "--ckpt", s1, "--out", f"{work}/lfb_{split}.npz", *ov])

    # 4) stage-2 heads over the bank
    for head in heads:
        results.append(train_and_score(work, seed, head, s1, epochs2, lr2,
                                       scale=scale, task=task,
                                       stage2_sets=stage2_sets))
    return results


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--work", required=True)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1])
    ap.add_argument("--epochs1", type=int, default=6)
    ap.add_argument("--epochs2", type=int, default=6)
    ap.add_argument("--lr1", type=float, default=0.05)
    # stage-2 heads sit on a residual attention stack: 0.02 was measured to
    # destabilize around step ~50 (loss -> 1e21 -> NaN); 1e-3 trains to
    # val_acc 1.0 in two epochs on the synthetic task
    ap.add_argument("--lr2", type=float, default=0.001)
    ap.add_argument("--train-videos", type=int, default=8)
    ap.add_argument("--val-videos", type=int, default=2)
    ap.add_argument("--test-videos", type=int, default=4)
    ap.add_argument("--dur-min", type=int, default=15,
                    help="phase duration range; shorter videos keep the "
                         "host/tunnel-bound full-scale run tractable")
    ap.add_argument("--dur-max", type=int, default=25)
    ap.add_argument("--heads", nargs="+", default=["tmr", "nl_only"])
    ap.add_argument("--task", choices=("pairs", "multiscale"),
                    default="pairs",
                    help="'multiscale' runs the 12-phase tmr-vs-nl_only "
                         "ranking task (window 40; --dur-min/--dur-max "
                         "ignored — the spec fixes durations)")
    ap.add_argument("--full-scale", action="store_true",
                    help="the real ResNet-50 at 224px crops, bf16 — run on "
                         "the TPU host (docs/QUALITY.md 'Full scale')")
    ap.add_argument("--set", dest="extra_sets", action="append", default=[],
                    help="extra key=value config overrides applied to every "
                         "arm (e.g. --set train.grad_clip=5.0)")
    ap.add_argument("--stage2-set", dest="stage2_sets", action="append",
                    default=[],
                    help="extra overrides applied only to the stage-2 arms "
                         "(e.g. --stage2-set train.optimizer=adam keeps the "
                         "stage-1 baseline canonical)")
    args = ap.parse_args(argv)
    scale = ({"hw": 250, "hidden": 512, "backbone": "resnet50",
              "compute_dtype": "bfloat16"} if args.full_scale else {})
    if args.extra_sets:
        scale = {**scale, "extra_sets": tuple(args.extra_sets)}
    all_rows = []
    for seed in args.seeds:
        rows = run_study(args.work, seed,
                         videos=(args.train_videos, args.val_videos,
                                 args.test_videos),
                         epochs1=args.epochs1, epochs2=args.epochs2,
                         lr1=args.lr1, lr2=args.lr2, heads=tuple(args.heads),
                         dur=(args.dur_min, args.dur_max), scale=scale,
                         task=args.task,
                         stage2_sets=tuple(args.stage2_sets))
        all_rows.extend(rows)
        for r in rows:
            print(json.dumps(r))
    with open(os.path.join(args.work, "efficacy_results.json"), "w") as f:
        json.dump(all_rows, f, indent=2)
    # margin summary
    by_arm = {}
    for r in all_rows:
        by_arm.setdefault(r["arm"], []).append(r["clip_accuracy"])
    base = sum(by_arm["stage1"]) / len(by_arm["stage1"])
    for arm, accs in sorted(by_arm.items()):
        mean = sum(accs) / len(accs)
        print(f"{arm:8s} clip_acc mean={mean:.4f} "
              f"(margin vs stage1: {mean - base:+.4f}) seeds={accs}")
    if args.task == "multiscale":
        by_pair = {}
        for r in all_rows:
            by_pair.setdefault(r["arm"], []).append(r["pair_accuracy"])
        for arm, accs in sorted(by_pair.items()):
            mean = sum(accs) / len(accs)
            print(f"{arm:8s} pair_acc mean={mean:.4f} seeds="
                  f"{[round(a, 4) for a in accs]}  (setwise ceiling 0.5)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
