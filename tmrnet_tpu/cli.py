"""One CLI for the whole workflow, replacing the reference's five argparse
drivers (SURVEY.md section 5, config notes):

  prepare    videos -> 1-fps cutmargin frames on disk
  manifest   frames+annotations -> pickle/CSV manifest (get_paths_labels.py)
  stats      channel mean/std over a manifest (meanStd.py)
  train-bank stage-1 memory-bank training  (train_singlenet_phase_1fc.py)
  build-lfb  frozen-extractor feature bank (--load_LFB workflow)
  train-tmr  stage-2 TMRNet / only-non-local training
  test       batched test inference -> predictions .npz + accuracy
  stream     online streaming inference, one frame per stream per step
  serve      serving daemon: JSONL frame events on stdin -> preds on stdout
  parity     reference .pth + frames -> Main.m protocol table, one command
  export     predictions -> video<N>-phase.txt trees (export_phase_copy.py)
  evaluate   relaxed-boundary protocol scoring (MATLAB Main.m, in Python)
  export-ckpt checkpoint -> reference-format torch .pth (migration out)
  export-model inference step -> portable StableHLO artifact (jax.export)
  pack       image-tree manifest -> raw per-video .npy packs (zero-decode)
  synth      synthetic memory-dependent dataset (learning efficacy study)
  migrate    reference command line -> equivalent tmrnet-tpu command(s)
  doctor     environment + artifact diagnostics (no reference equivalent)

Config: --preset <name> selects a BASELINE config; --config <json> loads a
full ExperimentConfig; --set a.b=c applies dotted overrides.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
from collections import deque
from typing import Any, List, Optional

import numpy as np

from tmrnet_tpu.config import (
    CHOLEC80_PHASES,
    M2CAI_PHASES,
    ExperimentConfig,
    apply_override,
    get_preset,
)


def load_config(args) -> ExperimentConfig:
    if getattr(args, "config", None):
        with open(args.config) as f:
            cfg = ExperimentConfig.from_json(f.read())
    elif getattr(args, "preset", None):
        cfg = get_preset(args.preset)
    else:
        cfg = ExperimentConfig()
    for o in getattr(args, "set", None) or []:
        cfg = apply_override(cfg, o)
    return cfg


def _add_config_args(p: argparse.ArgumentParser) -> None:
    from tmrnet_tpu.config import PRESETS

    p.add_argument("--preset", choices=sorted(PRESETS))
    p.add_argument("--config", help="path to ExperimentConfig json")
    p.add_argument("--set", action="append", metavar="KEY=VALUE",
                   help="dotted config override, repeatable")


def _phase_names(protocol: str):
    return CHOLEC80_PHASES if protocol == "cholec80" else M2CAI_PHASES


def _load_manifest(path: str, split: str = "train"):
    from tmrnet_tpu.data.manifests import load_csv_manifest, load_pickle_manifest

    if path.endswith(".csv"):
        return load_csv_manifest(path)
    primary, secondary = load_pickle_manifest(path)
    if split == "val" and secondary is not None:
        return secondary
    return primary


def _mesh_for(cfg, batch: Optional[int] = None, what: str = "data.batch_clips"):
    """Build the device mesh when the config or the host calls for one.

    Mirrors the reference drivers' default multi-GPU behavior (DataParallel
    over all visible devices, `train_non-local_mutiConv_resnet.py:710-778`):
    with >1 visible device a data-parallel mesh is built automatically;
    explicit `--set mesh.data_parallel=N` / `mesh.model_parallel=N` force one
    regardless. Returns None on a single default device (plain jit path)."""
    m = cfg.mesh
    if m.multihost:
        # DCN init must precede the first backend query
        from tmrnet_tpu.parallel.mesh import initialize_multihost

        initialize_multihost(
            coordinator=m.coordinator or None,
            num_processes=None if m.num_processes < 0 else m.num_processes,
            process_id=None if m.process_id < 0 else m.process_id)
    import jax

    n_dev = len(jax.devices())
    explicit = m.data_parallel != -1 or m.model_parallel > 1
    if not explicit and n_dev <= 1:
        return None
    from tmrnet_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(m)
    dp = mesh.shape[m.data_axis]
    if batch is None:
        batch = cfg.data.batch_clips
    # batch=0: caller aligns its own batch to the axis (e.g. stream slots)
    if batch and batch % dp != 0:
        raise SystemExit(
            f"{what}={batch} must be divisible by "
            f"the data-parallel axis ({dp}); adjust {what}")
    return mesh


def _extractor_subset(variables):
    """Slice full model variables down to the frozen extractor's tree
    (backbone + encoder params, backbone batch_stats)."""
    return {"params": {k: variables["params"][k]
                       for k in ("backbone", "encoder")},
            "batch_stats": {"backbone":
                            variables["batch_stats"]["backbone"]}}


def _extractor_for(cfg, args, variables):
    """Frozen-extractor variables for inference/serving commands: restored
    from the dedicated --extractor-(torch-)ckpt when given, else subset from
    the main weights."""
    ev = variables
    e_ckpt = getattr(args, "extractor_ckpt", None)
    e_torch = getattr(args, "extractor_torch_ckpt", None)
    if e_ckpt or e_torch:
        head = "stage1" if e_ckpt else "lfb"
        _, ev = _restore_variables(cfg, head, e_ckpt, e_torch,
                                   cfg.data.crop_size)
    return _extractor_subset(ev)


def _clip_labels(manifest, seq_len: int) -> np.ndarray:
    """Concatenated per-clip last-frame labels in bank-row order (one
    definition — accuracy and the per-class report must agree)."""
    parts = [v.labels[seq_len - 1:][: max(0, len(v) + 1 - seq_len)]
             for v in manifest.videos]
    return np.concatenate(parts) if parts else np.zeros(0, np.int64)


def _dataset(cfg, manifest, train: bool, device_normalize: bool = False):
    """device_normalize + data.device_normalize: the dataset emits raw
    uint8 clips (4x fewer host->device bytes) and (x - mean)/std runs
    in-jit — ClipInference/build_lfb always prep; the train/eval steps
    prep too (train/steps.py), keyed on the same config knob."""
    from tmrnet_tpu.data.pipeline import ClipDataset
    from tmrnet_tpu.data.transforms import EvalTransform, TrainTransform

    d = cfg.data
    if train:
        tf = TrainTransform(d.crop_size, d.resize, d.use_flip,
                            d.rotate_degrees, d.color_jitter,
                            hue=d.color_jitter_hue, mean=d.mean, std=d.std,
                            use_native=d.use_native_preproc,
                            normalize=not (device_normalize
                                           and d.device_normalize))
    else:
        tf = EvalTransform(d.crop_size, d.resize, d.test_crop_type,
                           d.mean, d.std,
                           normalize=not (device_normalize
                                          and d.device_normalize))
    return ClipDataset(manifest, d.sequence_length, transform=tf)


def _video_dataset(cfg, videos_dir: str, annotation_root: str, train: bool):
    """Video-direct dataset (the fork's HystDataset direction,
    `test-resnet.py:139-203`, without its bugs): clips decode straight from
    the video files; labels come from the phase annotations at source fps,
    sampled every data.source_fps // data.fps frames."""
    from tmrnet_tpu.data.manifests import read_phase_annotation
    from tmrnet_tpu.data.pipeline import VideoClipDataset
    from tmrnet_tpu.data.transforms import (
        VideoEvalTransform,
        VideoTrainTransform,
    )
    from tmrnet_tpu.data.video import VideoClipReader, probe_num_frames

    if not annotation_root:
        raise SystemExit("--videos requires --annotations <dir>")
    d = cfg.data
    from tmrnet_tpu.data.manifests import _natural_key

    stride = max(1, d.source_fps // d.fps)
    name_to_id = {n: i for i, n in enumerate(d.phase_names)}
    paths, counts, labels = [], [], []
    for fname in sorted(os.listdir(videos_dir), key=_natural_key):
        if not fname.endswith((".mp4", ".avi", ".mkv")):
            continue
        vid = os.path.splitext(fname)[0]
        ann_path = os.path.join(annotation_root, f"{vid}-phase.txt")
        if not os.path.exists(ann_path):
            continue
        ann = read_phase_annotation(ann_path, name_to_id)
        raw = probe_num_frames(os.path.join(videos_dir, fname))
        # VideoClipReader decodes sampled frames 0..n-1 CONTIGUOUSLY, so
        # labels must be the contiguous annotated prefix — skipping gaps
        # (sparse ks) would silently shift every label against its frame
        n_sampled = -(-raw // stride)
        n = 0
        while n < n_sampled and stride * n in ann:
            n += 1
        if n == 0:
            print(f"warning: {fname}: annotations do not cover frame 0; "
                  f"skipping video", file=sys.stderr)
            continue
        if n < n_sampled:
            print(f"warning: {fname}: annotations end at sampled frame "
                  f"{n}/{n_sampled}; truncating", file=sys.stderr)
        paths.append(os.path.join(videos_dir, fname))
        counts.append(n)
        labels.append(np.asarray([ann[stride * k] for k in range(n)],
                                 np.int64))
    if not paths:
        raise SystemExit(f"no annotated videos found under {videos_dir}")
    reader = VideoClipReader(paths, counts, d.sequence_length, stride=stride)
    tf = (VideoTrainTransform(d.crop_size) if train
          else VideoEvalTransform(d.crop_size))
    return VideoClipDataset(reader, labels, transform=tf)


def _restore_variables(cfg, head: str, ckpt_dir: Optional[str],
                       torch_ckpt: Optional[str], sample_hw: int = 224):
    """Load model variables from an orbax dir (best/) or a torch .pth."""
    import jax
    import jax.numpy as jnp

    from tmrnet_tpu.models.tmrnet import build_model

    mcfg = dataclasses.replace(cfg.model, head=head)
    model = build_model(mcfg)
    clips = jnp.zeros((1, cfg.data.sequence_length, sample_hw, sample_hw, 3))
    args = (clips,)
    if head in ("tmr", "nl_only"):
        args = (clips, jnp.zeros((1, cfg.memory.window, mcfg.hidden_dim)))
    variables = model.init(jax.random.PRNGKey(0), *args)
    if torch_ckpt:
        from tmrnet_tpu.models.torch_import import (
            convert_reference_checkpoint,
            load_torch_state_dict,
            merge_variables,
        )

        sd = load_torch_state_dict(torch_ckpt)
        conv = convert_reference_checkpoint(sd, head, cfg.model.stage_sizes)
        variables = {c: merge_variables(variables[c], conv.get(c, {}))
                     for c in variables}
    elif ckpt_dir:
        from tmrnet_tpu.utils.checkpoint import CheckpointManager

        # weights-only PARTIAL restore: no optimizer template is built at
        # all, so checkpoint loading for eval / cross-stage init is
        # independent of train.optimizer and of the trainer's param groups
        # (the round-4 opt-group mismatch silently restored opt leaves from
        # the checkpoint's sharding file; an optimizer-family mismatch was
        # a loud structure crash — both classes are unrepresentable here)
        variables = CheckpointManager(ckpt_dir).restore_weights(variables)
    return model, variables


# ---------------------------------------------------------------------------
# subcommands
# ---------------------------------------------------------------------------


def cmd_prepare(args) -> int:
    from concurrent.futures import ThreadPoolExecutor

    from tmrnet_tpu.data.video import extract_frames, extract_frames_packed

    from tmrnet_tpu.data.manifests import _natural_key

    videos = sorted(
        (f for f in os.listdir(args.videos)
         if f.endswith((".mp4", ".avi", ".mkv"))), key=_natural_key)
    if args.pack:
        os.makedirs(args.out, exist_ok=True)

    def one(v: str):
        name = os.path.splitext(v)[0]
        if args.pack:
            out = os.path.join(args.out, name + ".npy")
            n = extract_frames_packed(os.path.join(args.videos, v), out,
                                      stride=args.stride, size=args.size,
                                      cut_margin=not args.no_cutmargin)
            return name, n, out
        out = os.path.join(args.out, name)
        written = extract_frames(os.path.join(args.videos, v), out,
                                 stride=args.stride, size=args.size,
                                 cut_margin=not args.no_cutmargin)
        return name, len(written), out

    # videos are independent; decode (ffmpeg/cv2) and the native cutmargin
    # both release the GIL, so threads scale on many-core hosts (the
    # reference preprocesses one video at a time end to end)
    workers = args.workers or min(len(videos) or 1, os.cpu_count() or 1)
    with ThreadPoolExecutor(max_workers=workers) as pool:
        for name, n, out in pool.map(one, videos):
            print(f"{name}: {n} frames -> {out}")
    return 0


def cmd_manifest(args) -> int:
    from tmrnet_tpu.data.manifests import (
        build_manifest_from_frames,
        save_csv_manifest,
        save_pickle_manifest,
        split_manifest,
    )

    cfg = load_config(args)
    frames = args.frames or cfg.data.data_root
    annotations = args.annotations or cfg.data.annotation_root
    if not os.path.isdir(frames):
        raise SystemExit(f"frames dir not found: {frames} "
                         f"(pass --frames or set data.data_root)")
    phases = _phase_names(args.protocol)
    m = build_manifest_from_frames(frames, annotations, phases,
                                   sample_stride=args.stride)
    print(f"{len(m.videos)} videos, {m.num_frames} frames")
    # format by extension; an extension-less --out follows
    # data.manifest_format ('pickle' | 'csv')
    as_csv = (args.out.endswith(".csv")
              or (not args.out.endswith((".pkl", ".pickle"))
                  and cfg.data.manifest_format == "csv"))
    if as_csv:
        save_csv_manifest(args.out, m)
    elif args.train_videos:
        a, b = split_manifest(m, (0, args.train_videos),
                              (args.train_videos, len(m.videos)))
        save_pickle_manifest(args.out, a, b)
    else:
        save_pickle_manifest(args.out, m)
    print(f"wrote {args.out}")
    return 0


def cmd_synth(args) -> int:
    """Generate the synthetic memory-dependent dataset of the learning
    efficacy study (data/synthetic.py, docs/QUALITY.md): packed .npy video
    splits + phase annotations, consumable by `manifest --stride 1` and
    every downstream command unchanged."""
    from tmrnet_tpu.data.synthetic import (
        MULTISCALE_PAIR,
        MULTISCALE_SPEC,
        MULTISCALE_WINDOW,
        ambiguous_phases,
        check_multiscale_spec,
        frame_only_ceiling,
        multiscale_frame_only_ceiling,
        multiscale_pair_ceiling,
        write_synthetic_dataset,
    )

    splits = {"train": args.train, "val": args.val, "test": args.test}
    splits = {k: v for k, v in splits.items() if v > 0}
    if not splits:
        raise SystemExit("nothing to generate: all of --train/--val/--test "
                         "are 0")
    dur = (args.dur_min, args.dur_max)
    if args.task == "multiscale":
        from tmrnet_tpu.data.synthetic import MULTISCALE_SEQ

        check_multiscale_spec()
        out = write_synthetic_dataset(args.out_dir, splits, seed=args.seed,
                                      hw=args.hw, task="multiscale")
        print(json.dumps({
            "out": out,
            "videos": sum(splits.values()),
            "task": "multiscale",
            "num_phases": len(MULTISCALE_SPEC),
            "seq": MULTISCALE_SEQ,
            "window": MULTISCALE_WINDOW,
            "designed_pair": list(MULTISCALE_PAIR),
            "pair_ceiling_setwise": multiscale_pair_ceiling(),
            "frame_only_ceiling": round(
                multiscale_frame_only_ceiling(), 4),
        }))
        return 0
    out = write_synthetic_dataset(args.out_dir, splits, seed=args.seed,
                                  num_phases=args.phases, dur_range=dur,
                                  hw=args.hw)
    print(json.dumps({
        "out": out,
        "videos": sum(splits.values()),
        "ambiguous_phases": ambiguous_phases()[: args.phases],
        "frame_only_ceiling": round(
            frame_only_ceiling(args.phases, args.seq, dur), 4),
    }))
    return 0


def cmd_pack(args) -> int:
    """Pack a manifest's frame images into per-video raw uint8 .npy files
    plus a manifest whose paths read them back ('<file>.npy#<idx>',
    data/packed.py). Kills the per-frame image decode the reference pays on
    every epoch (PNG trees from `code/video2frame_cutmargin.py:55-81`) —
    the measured bottleneck of the disk->logits path on weak hosts. The
    packed manifest drops into every subcommand unchanged."""
    from tmrnet_tpu.data.manifests import (
        load_csv_manifest,
        load_pickle_manifest,
        save_csv_manifest,
        save_pickle_manifest,
    )
    from tmrnet_tpu.data.packed import pack_manifest, split_packed_path

    if args.manifest.endswith(".csv"):
        splits = [load_csv_manifest(args.manifest)]
    else:
        primary, secondary = load_pickle_manifest(args.manifest)
        splits = [primary] + ([secondary] if secondary is not None else [])
    ids = [v.video_id for m in splits for v in m.videos]
    if len(set(ids)) != len(ids):
        dup = sorted({i for i in ids if ids.count(i) > 1})
        raise SystemExit(f"video ids shared across splits {dup}: their "
                         "packed .npy files would collide")
    packed = [pack_manifest(m, args.out_dir, workers=args.workers or None)
              for m in splits]
    if args.manifest_out.endswith(".csv"):
        if len(packed) > 1:
            raise SystemExit("a CSV manifest holds one split; pack the "
                             "6-list pickle to a .pkl instead")
        save_csv_manifest(args.manifest_out, packed[0])
    else:
        save_pickle_manifest(args.manifest_out, packed[0],
                             packed[1] if len(packed) > 1 else None)
    files = sorted({split_packed_path(p)[0]
                    for m in packed for p in m.flat_paths()})
    print(json.dumps({
        "videos": sum(len(m.videos) for m in packed),
        "frames": sum(m.num_frames for m in packed),
        "packed_files": len(files),
        "bytes": sum(os.path.getsize(f) for f in files),
        "manifest": args.manifest_out,
    }))
    return 0


def cmd_stats(args) -> int:
    from tmrnet_tpu.data.pipeline import load_frame
    from tmrnet_tpu.data.stats import channel_stats, resize_224

    m = _load_manifest(args.manifest)
    paths = m.flat_paths()[:: max(1, args.subsample)]
    per_image = not args.population

    def load(p):
        img = load_frame(p)
        return img if args.no_resize else resize_224(img)

    workers = args.workers or min(len(paths) or 1, os.cpu_count() or 1)
    if workers > 1:
        # decode releases the GIL; the accumulator consumes in order
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=workers) as pool:
            mean, std = channel_stats(pool.map(load, paths, chunksize=16),
                                      per_image=per_image)
    else:
        mean, std = channel_stats((load(p) for p in paths),
                                  per_image=per_image)
    print(json.dumps({"mean": mean.tolist(), "std": std.tolist(),
                      "frames": len(paths)}))
    return 0


def cmd_train_bank(args) -> int:
    from tmrnet_tpu.train.loop import train_stage1
    from tmrnet_tpu.utils.logging import MetricLogger

    cfg = load_config(args)
    if args.videos:
        train_ds = _video_dataset(cfg, args.videos, args.annotations, True)
        val_ds = (_video_dataset(cfg, args.val_videos, args.annotations, False)
                  if args.val_videos else None)
    else:
        train_m = _load_manifest(args.train_manifest or cfg.data.manifest_path)
        val_m = (_load_manifest(args.val_manifest, "val")
                 if args.val_manifest else
                 _load_manifest(args.train_manifest or cfg.data.manifest_path,
                                "val"))
        train_ds = _dataset(cfg, train_m, True, device_normalize=True)
        val_ds = _dataset(cfg, val_m, False, device_normalize=True)
    mesh = _mesh_for(cfg)  # before the logger: multihost init sets process_index
    log = MetricLogger(args.log_dir)
    init = None
    if args.torch_init:
        _, variables = _restore_variables(cfg, "stage1", None, args.torch_init,
                                          cfg.data.crop_size)
        init = variables
    state, hist = train_stage1(cfg, train_ds, val_ds,
                               init_variables=init, mesh=mesh,
                               log=log)
    if not hist:
        # preempted (SIGTERM/^C) before the first epoch completed: the
        # replay checkpoint is saved; resume by re-running the command
        print("preempted before any completed epoch; checkpoint saved — "
              "re-run to resume")
        return 0
    best = max(hist, key=lambda h: h.val_acc)
    print(f"best epoch {best.epoch}: val_acc={best.val_acc:.4f}")
    return 0


def cmd_build_lfb(args) -> int:
    from tmrnet_tpu.train.loop import build_lfb

    cfg = load_config(args)
    if args.engine is None:
        # default = video engine (seq_len x less backbone work, identical
        # features — VERDICT r2 #2); auto-fall back to clip when only it
        # applies (video-direct datasets, non-deterministic crop types)
        args.engine = ("clip" if args.videos
                       or cfg.data.test_crop_type not in (1, 2, 3) else "video")
    if args.engine == "video" and args.videos:
        # fail before the (slow) dataset probe and checkpoint restore
        raise SystemExit("build-lfb --engine video needs a frame manifest")
    # multi-controller bank build: videos partition across processes, each
    # runs a process-LOCAL video-engine extractor (one backbone pass per
    # frame), feature blocks all-gather, process 0 writes the cache
    # (eval/distributed.py; byte-identical to the single-process build).
    # Init DCN before the first backend query (the restore below).
    dist_mesh = None
    if cfg.mesh.multihost:
        if args.engine != "video":
            raise SystemExit(
                "multi-controller build-lfb partitions videos across "
                "processes with --engine video (the clip engine instead "
                "shards batches over one global mesh — pass an explicit "
                "mesh via train-tmr's in-training build for that)")
        from tmrnet_tpu.eval.distributed import local_eval_mesh

        dist_mesh = local_eval_mesh(cfg)
    if args.videos:
        ds = _video_dataset(cfg, args.videos, args.annotations, False)
    elif args.manifest:
        ds = _dataset(cfg, _load_manifest(args.manifest), False,
                      device_normalize=True)  # build_lfb preps in-jit
    else:
        raise SystemExit("build-lfb needs --manifest or --videos")
    # orbax checkpoints carry the stage-1 structure (restore must match);
    # torch .pth conversion handles subsets directly with the lfb head
    head = "stage1" if args.ckpt else "lfb"
    _, variables = _restore_variables(cfg, head, args.ckpt, args.torch_ckpt,
                                      cfg.data.crop_size)
    extractor = _extractor_subset(variables)
    if cfg.mesh.multihost:
        from tmrnet_tpu.eval.distributed import run_lfb_distributed

        bank = run_lfb_distributed(cfg, extractor, ds,
                                   cache_path=args.out, mesh=dist_mesh)
        import jax

        if jax.process_index() != 0:
            return 0   # every process holds the bank; one writer/reporter
    else:
        bank = build_lfb(cfg, extractor, ds, cache_path=args.out, force=True,
                         engine=args.engine,
                         mesh=_mesh_for(cfg, batch=0 if args.engine == "video"
                                        else cfg.data.batch_clips))
    print(f"bank: {bank.num_rows} rows x {bank.feature_dim} -> {args.out}")
    return 0


def cmd_train_tmr(args) -> int:
    from tmrnet_tpu.memory.lfb import load_bank
    from tmrnet_tpu.train.loop import train_stage2
    from tmrnet_tpu.utils.logging import MetricLogger

    cfg = load_config(args)
    if args.videos:
        train_ds = _video_dataset(cfg, args.videos, args.annotations, True)
        val_m = None
    else:
        train_m = _load_manifest(args.train_manifest or cfg.data.manifest_path)
        train_ds = _dataset(cfg, train_m, True, device_normalize=True)
        val_m = (_load_manifest(args.val_manifest, "val") if args.val_manifest
                 else None)
    # .pkl paths load the reference's g_LFB_* pickles (validated against
    # the dataset's clip count); .npz is the native cache
    bank = load_bank(args.lfb, seq_len=cfg.data.sequence_length,
                     video_lengths=train_ds.manifest.video_lengths)
    val_bank = (load_bank(args.val_lfb) if args.val_lfb else None)
    init = None
    if args.torch_init:
        # reference stage-1/stage-2 .pth: convert whatever subset exists
        _, init = _restore_variables(cfg, cfg.model.head, None,
                                     args.torch_init, cfg.data.crop_size)
    elif args.stage1_ckpt:
        # orbax stage-1 checkpoint: restore with the stage-1 structure, then
        # transplant the shared trunk+lstm subtrees into a fresh TMR init
        # (the strict=False bootstrap of the reference,
        # `train_non-local_mutiConv_resnet.py:707,774`)
        from tmrnet_tpu.models.torch_import import merge_variables

        _, s1 = _restore_variables(cfg, "stage1", args.stage1_ckpt, None,
                                   cfg.data.crop_size)
        _, init = _restore_variables(cfg, cfg.model.head, None, None,
                                     cfg.data.crop_size)
        shared = _extractor_subset(s1)
        init = {c: merge_variables(init[c], shared.get(c, {})) for c in init}
    mesh = _mesh_for(cfg)  # before the logger: multihost init sets process_index
    log = MetricLogger(args.log_dir)
    state, hist = train_stage2(
        cfg, train_ds, bank,
        _dataset(cfg, val_m, False, device_normalize=True)
        if val_m else None, val_bank,
        init_variables=init, mesh=mesh, log=log)
    if not hist:
        # preempted (SIGTERM/^C) before the first epoch completed: the
        # replay checkpoint is saved; resume by re-running the command
        print("preempted before any completed epoch; checkpoint saved — "
              "re-run to resume")
        return 0
    best = max(hist, key=lambda h: h.val_acc)
    print(f"best epoch {best.epoch}: val_acc={best.val_acc:.4f}")
    return 0


def cmd_test(args) -> int:
    from tmrnet_tpu.eval.infer import ClipInference
    from tmrnet_tpu.memory.lfb import load_bank
    from tmrnet_tpu.train.loop import build_lfb

    cfg = load_config(args)
    # memoryless heads (stage1): frame-only protocol scoring — no bank, no
    # memory gather; the clip engine handles it (the efficacy study's
    # baseline arm, docs/QUALITY.md). memoryless_head refuses head='lfb'
    # (a feature extractor, not a classifier).
    from tmrnet_tpu.eval.infer import memoryless_head

    try:
        memoryless = memoryless_head(cfg.model.head)
    except ValueError as e:
        raise SystemExit(str(e))
    if memoryless:
        if args.engine not in (None, "clip"):
            raise SystemExit(
                f"--engine {args.engine} runs the memory head; "
                f"model.head={cfg.model.head} scores with --engine clip")
        if args.lfb or args.load_lfb:
            # an explicitly passed bank would be silently unused — likely a
            # mis-set model.head while scoring a stage-2 checkpoint
            raise SystemExit(
                f"model.head={cfg.model.head} is frame-only and cannot "
                "consume --lfb/--load-lfb; drop the bank flags or set "
                "--set model.head=tmr|nl_only")
        args.engine = "clip"
    if args.engine is None:
        # default = corpus (strictly faster at protocol scale, parity-proven,
        # lazy host RAM — VERDICT r2 #2); auto-fall back to the clip engine
        # for the cases only it supports (multi-crop eval, the reference
        # cross-video quirk, an explicit prebuilt-bank workflow)
        if (cfg.data.test_crop_type not in (1, 2, 3)
                or cfg.memory.compat_cross_video
                or args.lfb or args.load_lfb):
            # multi-crop (5/10) and random-crop (0) protocols need the
            # per-clip transform path; corpus/video transform once per
            # video, which would silently change crop-type-0 outputs
            args.engine = "clip"
        else:
            args.engine = "corpus"
    if args.engine == "corpus":  # first-class alias for the corpus engine
        cfg = dataclasses.replace(
            cfg, eval=dataclasses.replace(cfg.eval, corpus=True))
        args.engine = "video"
    # multi-controller protocol evaluation: videos partition across
    # processes, each runs a process-LOCAL corpus engine, predictions
    # all-gather, process 0 writes the outputs (eval/distributed.py;
    # byte-identical to the single-process run). Init DCN before the
    # first backend query (the weight restore below).
    dist_mesh = None
    distributed = cfg.mesh.multihost
    if distributed:
        if args.engine != "video" or not cfg.eval.corpus:
            raise SystemExit(
                "multi-controller test runs --engine corpus only (videos "
                "are partitioned across processes; other engines are "
                "single-controller — docs/SCALING.md 'Multi-host')")
        from tmrnet_tpu.eval.distributed import local_eval_mesh

        dist_mesh = local_eval_mesh(cfg)
    m = _load_manifest(args.manifest)
    ds = _dataset(cfg, m, False, device_normalize=True)
    _, variables = _restore_variables(cfg, cfg.model.head, args.ckpt,
                                      args.torch_ckpt, cfg.data.crop_size)
    bank = None
    if args.engine == "video" or memoryless:
        pass  # fused video pass builds its own bank; stage1 reads none
    elif args.lfb and os.path.exists(args.lfb):
        # .pkl = reference g_LFB pickle, validated against the manifest
        bank = load_bank(args.lfb, seq_len=cfg.data.sequence_length,
                         video_lengths=m.video_lengths)
    else:
        bank = build_lfb(cfg, _extractor_for(cfg, args, variables), ds,
                         cache_path=args.lfb, force=not args.load_lfb,
                         mesh=_mesh_for(cfg))
    if args.engine == "video":
        # full-video engine: backbone once per frame, LFB build fused (no
        # separate bank needed)
        from tmrnet_tpu.data.transforms import EvalTransform
        from tmrnet_tpu.eval.infer import VideoInference

        extractor2 = _extractor_for(cfg, args, variables)
        if cfg.data.test_crop_type not in (1, 2, 3):
            # crop 5/10 (multi-crop) and crop 0 (per-frame random crops)
            # both need the per-clip transform path; the video engines
            # transform once per whole video, which would silently change
            # crop-0 outputs vs the reference protocol
            raise SystemExit(
                f"--engine video/corpus needs a deterministic frame-wise "
                f"crop (test_crop_type 1/2/3, got "
                f"{cfg.data.test_crop_type}); use --engine clip")
        if cfg.memory.compat_cross_video:
            raise SystemExit(
                "--engine video builds per-video memory windows; the "
                "reference cross-video quirk (memory.compat_cross_video) "
                "requires --engine clip")
        engine = (None if distributed else
                  VideoInference(cfg, variables, extractor2,
                                 mesh=_mesh_for(cfg, batch=0)))
        d = cfg.data
        tf = EvalTransform(d.crop_size, d.resize, d.test_crop_type,
                           d.mean, d.std,
                           normalize=not d.device_normalize)
        from tmrnet_tpu.data.pipeline import load_frame

        def load_video(video):
            frames = np.stack([load_frame(pth) for pth in video.frame_paths])
            return tf(frames)  # per-frame deterministic eval transform

        results = [None] * len(m.videos)
        vb = max(1, cfg.eval.video_batch)
        if distributed:
            from tmrnet_tpu.eval.distributed import run_corpus_distributed

            results = run_corpus_distributed(
                cfg, variables, extractor2,
                [len(v) for v in m.videos],
                lambda i: load_video(m.videos[i]), mesh=dist_mesh)
        elif cfg.eval.corpus:
            # flat-stream corpus engine: zero per-video backbone padding,
            # lazy loading (one video in host RAM at a time)
            results = engine.run_corpus(
                [(lambda v=v: load_video(v)) for v in m.videos],
                lengths=[len(v) for v in m.videos],
                chunk=cfg.eval.corpus_chunk)
        elif vb > 1:
            # group same-bucket videos and run B per compiled program
            # (outputs equal per-video runs; parity-tested in run_videos)
            groups = {}
            for vi, video in enumerate(m.videos):
                groups.setdefault(engine.bucket_frames(len(video)),
                                  []).append(vi)
            for _bucket, vis in sorted(groups.items()):
                for c in range(0, len(vis), vb):
                    chunk = vis[c:c + vb]
                    outs = engine.run_videos(
                        [load_video(m.videos[vi]) for vi in chunk])
                    for vi, out in zip(chunk, outs):
                        results[vi] = out
        else:
            for vi, video in enumerate(m.videos):
                results[vi] = engine.run_video(load_video(video))
        res_preds = np.concatenate([r[0] for r in results])
        res_scores = np.concatenate([r[1] for r in results])
        labels_cat = _clip_labels(m, cfg.data.sequence_length)
        from tmrnet_tpu.eval.infer import InferenceResult

        res = InferenceResult(
            preds=res_preds, scores=res_scores,
            rows=np.arange(len(res_preds)),
            accuracy=float((res_preds == labels_cat).mean())
            if res_preds.size else 0.0)
    else:
        res = ClipInference(
            cfg, variables, bank,
            mesh=_mesh_for(cfg, batch=cfg.eval.batch_clips,
                           what="eval.batch_clips")).run(ds)
    if distributed:
        import jax

        if jax.process_index() != 0:
            return 0   # every process holds the results; one writer
    np.savez(args.out, preds=res.preds, scores=res.scores, rows=res.rows)
    if args.ref_pickle:
        # reference prediction-pickle pair (<name>.pkl + <name>.score.pkl,
        # `test_..._2fc_copy.py:443-450`) so reference tooling
        # (export_phase_copy.py) can consume predictions made here
        import pickle

        with open(args.ref_pickle, "wb") as f:
            pickle.dump([int(x) for x in res.preds], f)
        # the reference's score pickle holds the per-clip MAX softmax
        # probability (`possibility, preds = torch.max(...)`,
        # `test_..._2fc_copy.py:421-426`), not the full score row
        with open(args.ref_pickle + ".score.pkl", "wb") as f:
            pickle.dump([float(x) for x in res.scores.max(axis=1)], f)
    # per-class precision/recall like the reference's sklearn report
    # (`train_singlenet_phase_1fc.py:655-658`)
    from tmrnet_tpu.eval.metrics import classification_metrics

    labels = _clip_labels(m, cfg.data.sequence_length)
    cm = classification_metrics(labels, res.preds, cfg.model.num_classes)
    print(json.dumps({
        "clip_accuracy": res.accuracy,
        "num_clips": int(res.preds.size),
        "precision_per_class": np.round(cm["precision"], 4).tolist(),
        "recall_per_class": np.round(cm["recall"], 4).tolist(),
        "out": args.out,
    }))
    return 0


def _stream_artifact_engine(path: str):
    """Load an export-model --stream artifact as a serving engine, turning
    deserialization failures into a clear exit instead of a stack trace."""
    from tmrnet_tpu.eval.saved import ArtifactStreamEngine, load_artifact

    try:
        return ArtifactStreamEngine(load_artifact(path))
    except ValueError:
        raise
    except Exception as e:
        raise SystemExit(
            f"--artifact {path}: not a loadable artifact ({e}); preflight "
            "with `doctor --artifact` — re-export if the jax version "
            "changed (sidecar records the producer)")


def cmd_stream(args) -> int:
    """Online streaming inference (the deployment shape of surgical phase
    recognition — the reference has no serving path, its test drivers are
    offline batch jobs): play every manifest video as a parallel 1-fps
    stream through eval/stream.py's jitted per-frame step and write one JSONL
    row per (video, frame) as predictions become available. Outputs match
    `test --engine video` exactly from the first full clip onward
    (parity-tested)."""
    from tmrnet_tpu.data.pipeline import load_frame
    from tmrnet_tpu.data.transforms import EvalTransform
    from tmrnet_tpu.eval.stream import StreamingInference

    cfg = load_config(args)
    m = _load_manifest(args.manifest)
    # Multi-controller streaming: streams are embarrassingly parallel (each
    # stream's ring state is independent), so the scale-out is pure work
    # partitioning — the manifest's videos split across processes exactly
    # like distributed eval (eval/distributed.py), each process runs its own
    # single-controller engine over its local devices, and process 0 merges
    # the gathered rows (grouped per video in manifest order; the live
    # tick-interleaved order is process-local). docs/SCALING.md "Streaming".
    # Init DCN before the first backend query (the weight restore below).
    distributed = cfg.mesh.multihost
    dist_mesh = None
    if distributed:
        from tmrnet_tpu.eval.distributed import local_eval_mesh

        dist_mesh = local_eval_mesh(cfg)
    engine = None
    if args.artifact:
        # model-code-free: the exported stream step is the model and its
        # sidecar carries the data pipeline it was exported with
        engine = _stream_artifact_engine(args.artifact)
        if engine.meta.get("config"):
            cfg = type(cfg).from_json(json.dumps(engine.meta["config"]))
    else:
        _, variables = _restore_variables(cfg, cfg.model.head, args.ckpt,
                                          args.torch_ckpt,
                                          cfg.data.crop_size)
        extractor = _extractor_for(cfg, args, variables)
    if cfg.data.test_crop_type not in (1, 2, 3):
        raise SystemExit(
            "stream needs a deterministic frame-wise crop (test_crop_type "
            f"1/2/3, got {cfg.data.test_crop_type}): multi-crop and per-clip "
            "random crops have no streaming equivalent")

    d = cfg.data
    tf = EvalTransform(d.crop_size, d.resize, d.test_crop_type, d.mean,
                       d.std, normalize=not d.device_normalize)
    n_videos = len(m.videos)
    if n_videos == 0:
        raise SystemExit("manifest has no videos")
    lengths = [len(v.frame_paths) for v in m.videos]
    seq = d.sequence_length

    if args.max_steps:
        lengths = [min(n, args.max_steps) for n in lengths]

    if distributed:
        import jax

        from tmrnet_tpu.eval.distributed import partition_videos

        my_videos = partition_videos(
            lengths, jax.process_count())[jax.process_index()]
        # distributed rows buffer per video and merge at the end, so every
        # frame needs a slot in the gathered (preds) array; -1 = no pred
        dist_preds = {v: np.full(lengths[v], -1, np.int64)
                      for v in my_videos}
    else:
        my_videos = list(range(n_videos))

    # Fixed-B slot multiplexing: videos queue for `--max-streams` compiled
    # slots; a finished video's slot is recycled in place (reset_streams), so
    # one program serves any number of videos and finished streams stop
    # burning compute. Default B = 64 slots: one-slot-per-video on the full
    # 40-video protocol at 250^2 uint8 would demand ~28 GB of host RAM
    # (VERDICT r2 #6); -1 restores it explicitly.
    n_mine = max(len(my_videos), 1)
    if engine is not None:
        # the artifact bakes its slot count; surplus slots idle on blanks
        num_slots = engine.slots
    else:
        max_streams = n_mine if args.max_streams < 0 else args.max_streams
        num_slots = min(max_streams or n_mine, n_mine)
        # Under a mesh, streams shard over the data axis: round the slot
        # count up to the axis size — surplus slots idle on blank frames.
        # Multihost runs use the PROCESS-LOCAL mesh (streams are partitioned
        # across controllers; each engine stays single-controller).
        mesh = dist_mesh if distributed else _mesh_for(cfg, batch=0)
        if mesh is not None:
            dp = mesh.shape[cfg.mesh.data_axis]
            num_slots = -(-num_slots // dp) * dp
        engine = StreamingInference(cfg, variables, extractor, mesh=mesh)
    state = engine.init_state(num_slots)

    # Videos decode lazily as their slot starts and free when it ends, so
    # host RAM holds at most num_slots (default <=64) decoded videos.
    loaded: dict = {}

    def assign(v: int) -> int:
        # decode only the streamed prefix: --max-steps caps lengths[v],
        # and decoding the full 5k-frame video for a 100-step run was
        # 50x the needed work on this host-bound path
        paths = m.videos[v].frame_paths[: lengths[v]]
        loaded[v] = tf(np.stack([load_frame(p) for p in paths]))
        return v

    pending = deque(my_videos)
    slot_video = [assign(pending.popleft()) if pending else -1
                  for _ in range(num_slots)]
    slot_t = [0] * num_slots
    blank = (np.zeros_like(next(iter(loaded.values()))[0]) if loaded
             else None)
    correct = total = steps = 0
    f = open(args.out, "w") if not distributed else None
    try:
        while any(v >= 0 for v in slot_video):
            frames = np.stack([loaded[v][slot_t[i]] if v >= 0 else blank
                               for i, v in enumerate(slot_video)])
            state, preds, probs, valid = engine.step(state, frames)
            preds, valid = np.asarray(preds), np.asarray(valid)
            steps += 1
            reset = [False] * num_slots
            for i, v in enumerate(slot_video):
                if v < 0:
                    continue
                t, video = slot_t[i], m.videos[v]
                ok = bool(valid[i]) and t >= seq - 1
                if f is not None:
                    f.write(json.dumps({
                        "video": video.video_id, "frame": t,
                        "pred": int(preds[i]) if ok else None,
                        "valid": ok}) + "\n")
                elif ok:
                    dist_preds[v][t] = int(preds[i])
                if ok:
                    correct += int(preds[i] == video.labels[t])
                    total += 1
                slot_t[i] += 1
                if slot_t[i] >= lengths[v]:  # video done -> recycle the slot
                    reset[i] = True
                    del loaded[v]
                    slot_video[i] = (assign(pending.popleft())
                                     if pending else -1)
                    slot_t[i] = 0
            if any(reset):
                state = engine.reset_streams(state, reset)
    finally:
        if f is not None:
            f.close()
    if distributed:
        # merge: all-gather the per-video prediction rows (same machinery
        # as distributed eval, k = every frame), then process 0 writes the
        # JSONL grouped per video in manifest order and owns the summary
        from tmrnet_tpu.eval.distributed import (
            gather_video_results,
            partition_videos,
        )

        parts = partition_videos(lengths, jax.process_count())
        owner_of = [0] * n_videos
        for p, vids in enumerate(parts):
            for i in vids:
                owner_of[i] = p
        local = {v: (pr, np.zeros((len(pr), 1), np.float32))
                 for v, pr in dist_preds.items()}
        merged = gather_video_results(local, owner_of, lengths,
                                      seq_len=1, num_classes=1)
        if jax.process_index() == 0:
            correct = total = 0
            with open(args.out, "w") as fo:
                for v, (pr, _) in enumerate(merged):
                    video = m.videos[v]
                    for t in range(lengths[v]):
                        ok = pr[t] >= 0
                        fo.write(json.dumps({
                            "video": video.video_id, "frame": int(t),
                            "pred": int(pr[t]) if ok else None,
                            "valid": bool(ok)}) + "\n")
                        if ok:
                            correct += int(pr[t] == video.labels[t])
                            total += 1
            acc = correct / total if total else 0.0
            print(json.dumps({
                "streams": n_videos, "slots": num_slots,
                "processes": jax.process_count(), "steps": int(steps),
                "clip_accuracy": round(acc, 6),
                "predictions": total, "out": args.out}))
        return 0
    acc = correct / total if total else 0.0
    print(json.dumps({"streams": n_videos, "slots": num_slots,
                      "steps": int(steps),
                      "clip_accuracy": round(acc, 6),
                      "predictions": total, "out": args.out}))
    return 0


def cmd_serve(args) -> int:
    """Serving daemon: JSONL protocol on stdin/stdout — or over TCP with
    --listen (eval/serve_net.py) — over B compiled stream slots
    (eval/serve.py). Streams join on first frame, leave on "end", and any
    number of them multiplex onto the fixed slots; `{"step": true}` runs
    one tick. The reference has no serving path at all."""
    if args.listen and args.input != "-":
        # fail before the (slow) model restore and engine build
        raise SystemExit("--listen and --input are exclusive "
                         "(TCP clients replace the input file)")
    from tmrnet_tpu.data.pipeline import load_frame
    from tmrnet_tpu.data.transforms import EvalTransform
    from tmrnet_tpu.eval.serve import serve_loop
    from tmrnet_tpu.eval.stream import StreamingInference

    cfg = load_config(args)
    if args.artifact:
        # model-code-free serving: the exported stream step IS the model,
        # and its sidecar carries the data pipeline it was exported with
        # (crop, normalization, wire dtype) — no checkpoints, no mesh
        engine = _stream_artifact_engine(args.artifact)
        if engine.meta.get("config"):
            cfg = type(cfg).from_json(json.dumps(engine.meta["config"]))
        num_slots = engine.slots
        if args.slots not in (0, num_slots):
            print(json.dumps({"note": f"--slots {args.slots} ignored: the "
                              f"artifact bakes in {num_slots} slots"}),
                  file=sys.stderr, flush=True)
    else:
        _, variables = _restore_variables(cfg, cfg.model.head, args.ckpt,
                                          args.torch_ckpt,
                                          cfg.data.crop_size)
        extractor = _extractor_for(cfg, args, variables)
        num_slots = args.slots
        mesh = _mesh_for(cfg, batch=0)
        if mesh is not None:
            dp = mesh.shape[cfg.mesh.data_axis]
            num_slots = -(-num_slots // dp) * dp
        engine = StreamingInference(cfg, variables, extractor, mesh=mesh)
    if cfg.data.test_crop_type not in (1, 2, 3):
        raise SystemExit(
            "serve needs a deterministic frame-wise crop (test_crop_type "
            f"1/2/3, got {cfg.data.test_crop_type}): multi-crop and per-clip "
            "random crops have no streaming equivalent")

    d = cfg.data
    tf = EvalTransform(d.crop_size, d.resize, d.test_crop_type, d.mean,
                       d.std, normalize=not d.device_normalize)

    server = None
    if args.listen:
        from tmrnet_tpu.eval.serve_net import JsonlTcpServer

        host, _, port = args.listen.rpartition(":")
        server = JsonlTcpServer(host or "127.0.0.1", int(port))
        # advertise the bound address (port may have been 0 = ephemeral)
        print(json.dumps({"listening": {"host": server.host,
                                        "port": server.port}}),
              file=sys.stderr, flush=True)

    # SIGTERM (the standard daemon shutdown) must unwind through
    # serve_loop's finally so the state checkpoint is written — but never
    # mid-tick, where it would checkpoint half-updated bookkeeping; the
    # guard defers the exit to the tick boundary
    import signal

    guard = {"busy": False, "stop": False}

    def _on_term(*_):
        if guard["busy"]:
            guard["stop"] = True
            if server is not None:
                server.stop()   # unblock lines() so the boundary arrives
        else:
            sys.exit(0)

    signal.signal(signal.SIGTERM, _on_term)
    # SIGINT gets the same deferred-exit treatment: a ^C mid-tick would
    # otherwise checkpoint rings one tick ahead of frame_idx (ADVICE r2)
    signal.signal(signal.SIGINT, _on_term)

    in_f = sys.stdin if args.input == "-" else open(args.input)
    crop = cfg.data.crop_size
    try:
        summary = serve_loop(
            engine, num_slots,
            server.lines() if server is not None else in_f,
            server if server is not None else sys.stdout,
            lambda p: tf(np.stack([load_frame(p)]))[0],
            emit_probs=args.probs,
            # pay the first compile at startup, not on the first request
            warmup_shape=None if args.no_warmup else (crop, crop, 3),
            warmup_dtype=np.uint8 if d.device_normalize else np.float32,
            state_dir=args.state_dir,
            checkpoint_every=args.checkpoint_every,
            term_guard=guard,
            decode_workers=args.decode_workers,
            decode_timeout=args.decode_timeout,
            tick_interval=args.tick_interval,
            idle_ticks=args.idle_ticks,
            stats_every=args.stats_every,
            # readiness: warmup compiles done, steady-state latency from
            # here — probes should key on this line, not on "listening"
            on_ready=lambda: print(json.dumps({"ready": True}),
                                   file=sys.stderr, flush=True))
    finally:
        if server is not None:
            server.stop()
        if in_f is not sys.stdin:
            in_f.close()
    print(json.dumps({"summary": summary}), file=sys.stderr)
    return 0


def cmd_parity(args) -> int:
    """One command from a reference .pth + frames to the Main.m-format
    protocol table: build the bank with the (frozen) extractor weights, run
    clip inference with reference-exact memory windows, export the phase
    trees, and score with the relaxed-boundary protocol. Ready for the day
    the published Dropbox checkpoints (/root/reference/README.md:91) and the
    Cholec80 test set are both on disk."""
    import dataclasses as dc

    from tmrnet_tpu.eval.export import export_predictions, load_exported
    from tmrnet_tpu.eval.infer import ClipInference
    from tmrnet_tpu.eval.metrics import evaluate_protocol
    from tmrnet_tpu.train.loop import build_lfb

    cfg = load_config(args)
    # reference-exact memory windows unless the user explicitly overrode
    if not any((o or "").startswith("memory.compat_cross_video")
               for o in (getattr(args, "set", None) or [])):
        cfg = dc.replace(cfg, memory=dc.replace(cfg.memory,
                                                compat_cross_video=True))
    m = _load_manifest(args.manifest)
    ds = _dataset(cfg, m, False, device_normalize=True)
    _, variables = _restore_variables(cfg, cfg.model.head, None,
                                      args.torch_ckpt, cfg.data.crop_size)
    extractor = _extractor_for(cfg, args, variables)
    os.makedirs(args.workdir, exist_ok=True)
    bank = build_lfb(cfg, extractor, ds,
                     cache_path=args.lfb or os.path.join(args.workdir,
                                                         "lfb.npz"),
                     force=not args.load_lfb, mesh=_mesh_for(cfg))
    res = ClipInference(
        cfg, variables, bank,
        mesh=_mesh_for(cfg, batch=cfg.eval.batch_clips,
                       what="eval.batch_clips")).run(ds)
    np.savez(os.path.join(args.workdir, "predictions.npz"),
             preds=res.preds, scores=res.scores, rows=res.rows)
    pred_dir = os.path.join(args.workdir, "phase")
    gt_dir = os.path.join(args.workdir, "gt-phase")
    export_predictions(m, res.preds, cfg.data.sequence_length,
                       pred_dir=pred_dir, gt_dir=gt_dir,
                       fps=cfg.eval.export_fps)
    gts, preds = load_exported(pred_dir, gt_dir,
                               [v.video_id for v in m.videos],
                               phase_names=_phase_names(args.protocol))
    rep = evaluate_protocol(gts, preds, protocol=args.protocol,
                            quirk_compat=True)
    print(rep.format_table())
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({
                "clip_accuracy": res.accuracy,
                "mean_accuracy": rep.mean_accuracy,
                "std_accuracy": rep.std_accuracy,
                "mean_jaccard": rep.mean_jaccard,
                "std_jaccard": rep.std_jaccard,
                "mean_precision": rep.mean_precision,
                "mean_recall": rep.mean_recall,
                "jaccard_per_phase": rep.jaccard_per_phase.tolist(),
            }, f, indent=2)
    return 0


def cmd_export(args) -> int:
    from tmrnet_tpu.eval.export import export_predictions

    cfg = load_config(args)
    m = _load_manifest(args.manifest)
    if args.preds.endswith(".jsonl"):
        # stream-command output: one row per (video, frame); valid rows carry
        # the clip prediction for that frame position. Reassemble into
        # bank-row (video-major, frame-ascending) order.
        by_video = {}
        with open(args.preds) as f:
            for line in f:
                r = json.loads(line)
                if r.get("valid"):
                    by_video.setdefault(r["video"], []).append(
                        (r["frame"], r["pred"]))
        parts = []
        for v in m.videos:
            rows = sorted(by_video.get(v.video_id, []))
            parts.append(np.asarray([p for _, p in rows], np.int64))
        preds = (np.concatenate(parts) if parts
                 else np.zeros(0, np.int64))
    elif args.preds.endswith((".pkl", ".pickle")):
        # reference test-driver output: a pickled list of per-clip argmax
        # predictions (`test_..._2fc_copy.py:424,443-450`). The real files
        # hold 0-d torch TENSORS (preds[i].data.cpu()), so unpickling
        # needs torch importable — fail with a hint, not a stack trace.
        import pickle

        try:
            with open(args.preds, "rb") as f:
                obj = pickle.load(f)
        except ModuleNotFoundError as e:
            raise SystemExit(
                f"unpickling {args.preds} needs the '{e.name}' package "
                f"(reference prediction pickles store torch tensors): "
                f"pip install {e.name}")
        preds = np.asarray([int(np.asarray(v)) for v in obj], np.int64)
    else:
        preds = np.load(args.preds)["preds"]
    stats = export_predictions(m, preds, cfg.data.sequence_length,
                               pred_dir=args.pred_dir, gt_dir=args.gt_dir,
                               fps=cfg.eval.export_fps,
                               video_name_fmt=args.name_fmt)
    print(json.dumps(stats))
    return 0


def cmd_evaluate(args) -> int:
    import re

    from tmrnet_tpu.eval.export import load_exported
    from tmrnet_tpu.eval.metrics import evaluate_protocol

    cfg = load_config(args)
    protocol = args.protocol or cfg.eval.protocol
    relaxed = (args.relaxed_seconds if args.relaxed_seconds is not None
               else cfg.eval.relaxed_seconds)
    video_ids = args.videos or sorted(
        f[: -len("-phase.txt")] for f in os.listdir(args.gt_dir)
        if f.endswith("-phase.txt"))
    # Main.m / Main_m2cai.m iterate a NUMERIC video range (41:80 / 1:14);
    # an explicit --video-range (or the preset's eval.test_videos) applies
    # the same selection to the gt-dir listing. Ids without a trailing
    # number can't match a numeric range and are dropped.
    vrange = args.video_range or (
        tuple(cfg.eval.test_videos)
        if (getattr(args, "preset", None) or getattr(args, "config", None))
        else None)
    if not args.videos and vrange:
        def num(vid):
            m = re.search(r"(\d+)\D*$", vid)
            return int(m.group(1)) if m else None

        video_ids = [v for v in video_ids
                     if num(v) is not None and vrange[0] <= num(v) <= vrange[1]]
        if not video_ids:
            raise SystemExit(
                f"no videos in {args.gt_dir} fall in range {vrange}; "
                f"pass --videos or widen --video-range")
    gts, preds = load_exported(args.pred_dir, args.gt_dir, video_ids,
                               phase_names=_phase_names(protocol),
                               matlab_compat=args.matlab_compat)
    rep = evaluate_protocol(gts, preds, protocol=protocol,
                            fps=args.fps,
                            quirk_compat=not args.no_quirk,
                            relaxed_seconds=relaxed)
    print(rep.format_table())
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({
                "mean_accuracy": rep.mean_accuracy,
                "std_accuracy": rep.std_accuracy,
                "mean_jaccard": rep.mean_jaccard,
                "std_jaccard": rep.std_jaccard,
                "mean_precision": rep.mean_precision,
                "mean_recall": rep.mean_recall,
                "jaccard_per_phase": rep.jaccard_per_phase.tolist(),
                "precision_per_phase": rep.precision_per_phase.tolist(),
                "recall_per_phase": rep.recall_per_phase.tolist(),
                "accuracy_per_video": rep.accuracy_per_video.tolist(),
                "videos": list(video_ids),
            }, f, indent=2)
    return 0


def cmd_export_ckpt(args) -> int:
    """Checkpoint -> reference-format torch .pth (the inverse of
    --torch-ckpt import), so models trained here load into the PyTorch
    reference tooling via its plain load_state_dict."""
    import torch

    from tmrnet_tpu.models.torch_import import export_reference_checkpoint

    cfg = load_config(args)
    head = cfg.model.head
    _, variables = _restore_variables(cfg, head, args.ckpt, None,
                                      cfg.data.crop_size)
    sd = export_reference_checkpoint(variables, head,
                                     stage_sizes=cfg.model.stage_sizes)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, args.out)
    print(f"wrote {args.out} ({len(sd)} tensors, head={head})")
    return 0


def cmd_export_model(args) -> int:
    """Serialize the jitted inference step to a portable StableHLO
    artifact (jax.export) with the weights baked in: a deployment host
    runs the model with plain JAX — no model code, no checkpoint load,
    no matching framework version (eval/saved.py). The reference
    re-instantiates the torch model from source and loads a .pth per run
    (`test_..._2fc_copy.py:371-379`); this is the TorchScript/ONNX-style
    export it never had."""
    from tmrnet_tpu.eval.saved import (
        export_inference,
        export_stream,
        save_artifact,
    )

    cfg = load_config(args)
    head = cfg.model.head
    _, variables = _restore_variables(cfg, head, args.ckpt, args.torch_ckpt,
                                      cfg.data.crop_size)
    platforms = tuple(p.strip() for p in args.platforms.split(",")
                      if p.strip())
    if args.stream:
        # the serve daemon's per-tick step (both trunks + rings + head):
        # `serve --artifact <out>` then runs with no model code at all
        if head not in ("tmr", "nl_only"):
            raise SystemExit(f"--stream needs a memory head (tmr/nl_only), "
                             f"got {head!r}")
        if args.fold_bn:
            raise SystemExit("--fold-bn is not supported with --stream "
                             "(the stream step reads train-layout "
                             "variables); export without it")
        extractor = _extractor_for(cfg, args, variables)
        batch = args.slots
        blob, meta = export_stream(cfg, variables, extractor, batch,
                                   platforms)
    else:
        if args.fold_bn:
            # BN is an affine map at inference: fold it into the conv
            # weights so the artifact carries no BN ops (models/fold_bn)
            from tmrnet_tpu.models.fold_bn import fold_variables

            variables = fold_variables(variables)
            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, folded=True))
        batch = args.batch or cfg.eval.batch_clips
        blob, meta = export_inference(cfg, variables, batch, platforms)
    save_artifact(args.out, blob, meta)
    print(json.dumps({"out": args.out, "bytes": len(blob), "head": head,
                      "kind": meta.get("kind", "clip"),
                      "batch": batch, "platforms": list(platforms),
                      "inputs": meta["inputs"]}))
    return 0


def cmd_migrate(args) -> int:
    """Translate a reference command line into the equivalent tmrnet-tpu
    command(s) — docs/MIGRATION.md's flag mapping as a tool (migrate.py)."""
    import shlex

    from tmrnet_tpu.migrate import MigrateError, translate

    tokens = shlex.split(args.cmd) if args.cmd else list(args.tokens or [])
    if tokens and tokens[0] == "--":
        tokens = tokens[1:]
    if not tokens:
        raise SystemExit("pass the reference command: migrate -- python "
                         "train_non-local_mutiConv_resnet.py -t 90 ... "
                         "(or --cmd '...')")
    try:
        out = translate(tokens)
    except MigrateError as e:
        raise SystemExit(str(e))
    for note in out["notes"]:
        print(f"# {note}")
    for cmd in out["commands"]:
        print(cmd)
    return 0


def cmd_doctor(args) -> int:
    """Environment/artifact diagnostics before a long job: versions, devices,
    optional deps, the native preprocess lib, and (when pointed at them)
    manifest / checkpoint / feature-bank artifacts. The reference has no
    equivalent (failures there surface mid-epoch as stack traces); exit is
    nonzero iff a hard check fails, warns are advisory."""
    import importlib
    import platform as _platform

    counts = {"ok": 0, "warn": 0, "FAIL": 0}

    def add(status: str, name: str, detail: str) -> None:
        counts[status] += 1
        print(f"[{status:>4}] {name}: {detail}", flush=True)

    import jax

    det = (f"python {_platform.python_version()}, jax {jax.__version__}, "
           f"numpy {np.__version__}")
    for mod in ("flax", "optax", "orbax.checkpoint"):
        try:
            m = importlib.import_module(mod)
            det += f", {mod.split('.')[0]} {getattr(m, '__version__', '?')}"
        except Exception:
            pass
    add("ok", "versions", det)

    try:
        devs = jax.devices()
        det = f"{len(devs)} x {devs[0].platform} ({devs[0].device_kind})"
        if jax.process_count() > 1:
            # multi-controller runtime (mesh.multihost): say who we are
            det += (f", process {jax.process_index()}/{jax.process_count()}"
                    f" ({len(jax.local_devices())} local)")
        add("ok", "devices", det)
    except Exception as e:  # no backend at all is a hard failure
        add("FAIL", "devices", f"jax backend init failed: {e}")

    for mod, why in (("PIL", "frame decode (prepare / frame pipeline)"),
                     ("torch", ".pth import/export + TensorBoard logging")):
        try:
            importlib.import_module(mod)
            add("ok", mod, "importable")
        except ImportError:
            add("warn", mod, f"not importable — {why} unavailable")

    from tmrnet_tpu.data import native

    if native.available():
        add("ok", "native", "libtmrnet_data.so built and loadable")
    else:
        add("warn", "native",
            "C++ preprocess lib unavailable (numpy fallback active; "
            "check a C compiler is on PATH)")

    from tmrnet_tpu.utils.compile_cache import cache_info

    ci = cache_info(args.compile_cache or None)
    import jax as _jax

    enabled = bool(_jax.config.jax_compilation_cache_dir)
    add("ok", "compile-cache",
        f"{'ON' if enabled else 'off'} ({ci['dir']}: {ci['entries']} "
        f"entries, {ci['bytes'] / 1e6:.1f} MB)"
        + ("" if enabled else " — --compile-cache persists executables "
           "across restarts (skip on remote-compile/axon hosts: their "
           "service cache is faster — docs/PERFORMANCE.md)"))

    if args.manifest:
        try:
            from tmrnet_tpu.data.packed import packed_file_of

            m = _load_manifest(args.manifest)
            vids = list(m.videos)
            if not args.manifest.endswith(".csv"):
                # a 6-list pickle carries train AND val: validate both
                from tmrnet_tpu.data.manifests import load_pickle_manifest

                val = load_pickle_manifest(args.manifest)[1]
                if val is not None:
                    vids += list(val.videos)
            missing = sum(
                1 for v in vids
                if v.frame_paths and not os.path.exists(
                    packed_file_of(v.frame_paths[0]) or v.frame_paths[0]))
            det = (f"{len(vids)} videos, "
                   f"{sum(len(v.frame_paths) for v in vids)} frames")
            # packed manifests: validate every referenced index against the
            # pack's real length (a header-only mmap read per file) — an
            # out-of-range index would otherwise fail mid-epoch
            bad_packs = []
            for v in vids:
                packs = {}
                for p in v.frame_paths:
                    f = packed_file_of(p)
                    if f and os.path.exists(f):
                        packs.setdefault(f, []).append(
                            int(p.rpartition("#")[2]))
                for f, idxs in packs.items():
                    n = int(np.load(f, mmap_mode="r").shape[0])
                    if max(idxs) >= n:
                        bad_packs.append(
                            f"{v.video_id} ({os.path.basename(f)}: frame "
                            f"{max(idxs)} >= {n})")
            if bad_packs:
                add("FAIL", "manifest",
                    f"{det}; packed index out of range for "
                    f"{len(bad_packs)} video(s): {bad_packs[:3]} — the "
                    "manifest and packs are out of sync (re-run pack)")
            elif missing:
                add("warn", "manifest",
                    f"{det}; first frame missing on disk for {missing} "
                    f"video(s) — paths may be relative to another root")
            else:
                add("ok", "manifest", det)
        except Exception as e:
            add("FAIL", "manifest", f"{args.manifest}: {e}")

    if args.checkpoint:
        try:
            from tmrnet_tpu.utils.checkpoint import CheckpointManager

            cm = CheckpointManager(args.checkpoint)
            step = cm.latest_step()
            if step is None:
                add("warn", "checkpoint", f"{args.checkpoint}: no steps found")
            else:
                meta = json.dumps(cm.metadata(step))
                add("ok", "checkpoint",
                    f"latest step {step}, meta {meta[:120]}")
        except Exception as e:
            add("FAIL", "checkpoint", f"{args.checkpoint}: {e}")

    if args.lfb:
        try:
            from tmrnet_tpu.memory.lfb import load_bank

            bank = load_bank(args.lfb)  # .npz native or reference .pkl
            add("ok", "lfb",
                f"bank ({bank.num_rows}, {bank.feature_dim}) "
                f"{bank.features.dtype}")
        except Exception as e:
            add("FAIL", "lfb", f"{args.lfb}: {e}")

    if args.artifact:
        try:
            from tmrnet_tpu.eval.saved import load_artifact

            art = load_artifact(args.artifact)
            ins = art.meta.get("inputs")
            plats = art.meta.get("platforms", "?")
            if art.meta.get("kind") == "stream":
                ident = (f"kind=stream slots={art.meta.get('slots')} "
                         f"seq={art.meta.get('seq')} "
                         f"window={art.meta.get('window')}")
            else:
                ident = f"head={art.head or '?'}"
            det = (f"{ident} platforms={plats} "
                   f"jax={art.meta.get('jax_version', '?')} inputs={ins}")
            if not os.path.exists(args.artifact + ".json"):
                add("warn", "artifact",
                    det + " — sidecar .json missing (calling convention "
                          "unknown to loaders)")
            else:
                add("ok", "artifact", det)
        except Exception as e:
            add("FAIL", "artifact", f"{args.artifact}: {e}")

    if args.mesh:
        try:
            cfg = load_config(args)
            mesh = _mesh_for(cfg, batch=0)
            if mesh is None:
                add("ok", "mesh", "single device, plain jit path (no mesh)")
            else:
                add("ok", "mesh",
                    f"{dict(mesh.shape)} over {mesh.devices.size} devices")
        except Exception as e:
            add("FAIL", "mesh", str(e))

    if args.smoke:
        # tiny jit matmul through the real backend; device->host fetch for
        # the sync (jax.block_until_ready returns early on tunneled hosts)
        try:
            import time

            import jax.numpy as jnp

            x = jnp.ones((256, 256), jnp.bfloat16)
            f = jax.jit(lambda a: a @ a)
            t0 = time.perf_counter()
            np.asarray(f(x))
            t1 = time.perf_counter()
            np.asarray(f(x))
            t2 = time.perf_counter()
            add("ok", "smoke",
                f"jit matmul compile+run {t1 - t0:.2f}s, cached {t2 - t1:.3f}s")
        except Exception as e:
            add("FAIL", "smoke", f"jit execution failed: {e}")

    print(f"doctor: {counts['ok']} ok, {counts['warn']} warn, "
          f"{counts['FAIL']} fail")
    return 1 if counts["FAIL"] else 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="tmrnet-tpu", description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--compile-cache", nargs="?", const="", metavar="DIR",
                   help="persist compiled XLA executables to DIR (default "
                        "~/.cache/tmrnet_tpu/xla or $TMRNET_COMPILE_CACHE); "
                        "restarted jobs skip recompiling every program "
                        "they've compiled before")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("prepare", help="videos -> 1fps cutmargin frames")
    sp.add_argument("--videos", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--stride", type=int, default=25)
    sp.add_argument("--size", type=int, default=250)
    sp.add_argument("--no-cutmargin", action="store_true")
    sp.add_argument("--pack", action="store_true",
                    help="write one raw uint8 <video>.npy per video instead "
                         "of a PNG tree (zero-decode reads, data/packed.py); "
                         "`manifest --frames` walks packs and dirs alike")
    sp.add_argument("--workers", type=int, default=0,
                    help="videos extracted in parallel (0 = one per core)")
    sp.set_defaults(fn=cmd_prepare)

    sp = sub.add_parser("manifest", help="frames dir -> manifest pickle/CSV")
    _add_config_args(sp)
    sp.add_argument("--frames", help="default: data.data_root")
    sp.add_argument("--annotations", help="default: data.annotation_root")
    sp.add_argument("--out", required=True)
    sp.add_argument("--protocol", default="cholec80",
                    choices=["cholec80", "m2cai"])
    sp.add_argument("--stride", type=int, default=25)
    sp.add_argument("--train-videos", type=int, default=0,
                    help="first N videos to the train split (0 = single split)")
    sp.set_defaults(fn=cmd_manifest)

    sp = sub.add_parser("synth", help="generate the synthetic memory-"
                                      "dependent dataset (efficacy study)")
    sp.add_argument("--out-dir", required=True)
    sp.add_argument("--train", type=int, default=8,
                    help="train-split videos (frames-train/)")
    sp.add_argument("--val", type=int, default=2)
    sp.add_argument("--test", type=int, default=4)
    sp.add_argument("--task", choices=("pairs", "multiscale"),
                    default="pairs",
                    help="'pairs' = the memory-required task; 'multiscale' "
                         "= the 12-phase tmr-vs-nl_only ranking task "
                         "(fixed spec; run with memory.window="
                         "MULTISCALE_WINDOW and data.sequence_length="
                         "MULTISCALE_SEQ from data/synthetic.py)")
    sp.add_argument("--phases", type=int, default=7)
    sp.add_argument("--dur-min", type=int, default=15,
                    help="min frames per phase")
    sp.add_argument("--dur-max", type=int, default=25)
    sp.add_argument("--hw", type=int, default=32, help="frame side length")
    sp.add_argument("--seq", type=int, default=10,
                    help="clip length, only for the printed frame-only "
                         "ceiling estimate")
    sp.add_argument("--seed", type=int, default=0)
    sp.set_defaults(fn=cmd_synth)

    sp = sub.add_parser("pack", help="frame images -> per-video raw .npy "
                                     "(zero-decode reads)")
    sp.add_argument("--manifest", required=True,
                    help="source manifest (pickle or CSV; frames may be any "
                         "image tree)")
    sp.add_argument("--out-dir", required=True,
                    help="directory for the <video_id>.npy packs")
    sp.add_argument("--manifest-out", required=True,
                    help="where to write the packed manifest (.pkl keeps "
                         "the source's split structure; .csv for one split)")
    sp.add_argument("--workers", type=int, default=0,
                    help="videos packed in parallel (0 = min(8, cores))")
    sp.set_defaults(fn=cmd_pack)

    sp = sub.add_parser("stats", help="channel mean/std (meanStd tool)")
    sp.add_argument("--workers", type=int, default=0,
                    help="parallel frame decodes (0 = one per core)")
    sp.add_argument("--manifest", required=True)
    sp.add_argument("--subsample", type=int, default=1)
    sp.add_argument("--no-resize", action="store_true",
                    help="skip the reference's 224x224 resize step")
    sp.add_argument("--population", action="store_true",
                    help="population std over all pixels instead of the "
                         "reference's mean of per-image stds")
    sp.set_defaults(fn=cmd_stats)

    sp = sub.add_parser("train-bank", help="stage-1 memory-bank training")
    _add_config_args(sp)
    sp.add_argument("--train-manifest")
    sp.add_argument("--val-manifest")
    sp.add_argument("--videos", help="train straight from video files "
                                     "(video-direct path) instead of a "
                                     "frames manifest")
    sp.add_argument("--val-videos")
    sp.add_argument("--annotations",
                    help="phase annotation dir (required with --videos)")
    sp.add_argument("--torch-init", help="reference .pth to initialize from")
    sp.add_argument("--log-dir", default="./runs/train-bank")
    sp.set_defaults(fn=cmd_train_bank)

    sp = sub.add_parser("build-lfb", help="build the feature bank")
    _add_config_args(sp)
    sp.add_argument("--manifest")
    sp.add_argument("--videos", help="build from video files (video-direct)")
    sp.add_argument("--annotations")
    sp.add_argument("--ckpt", help="stage-1 orbax checkpoint dir")
    sp.add_argument("--torch-ckpt", help="stage-1 reference .pth")
    sp.add_argument("--engine", choices=["clip", "video"], default=None,
                    help="'video' builds the bank at one backbone pass per "
                         "frame (seq_len x less compute, identical "
                         "features; frame manifests, crop types 1/2). "
                         "Default: video, falling back to clip for "
                         "video-direct datasets or random crop types")
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_build_lfb)

    sp = sub.add_parser("train-tmr", help="stage-2 TMRNet training")
    _add_config_args(sp)
    sp.add_argument("--train-manifest")
    sp.add_argument("--val-manifest")
    sp.add_argument("--videos", help="train straight from video files "
                                     "(video-direct path)")
    sp.add_argument("--annotations",
                    help="phase annotation dir (required with --videos)")
    sp.add_argument("--lfb", required=True)
    sp.add_argument("--val-lfb")
    sp.add_argument("--stage1-ckpt")
    sp.add_argument("--torch-init")
    sp.add_argument("--log-dir", default="./runs/train-tmr")
    sp.set_defaults(fn=cmd_train_tmr)

    sp = sub.add_parser("test", help="test-set inference -> predictions npz")
    _add_config_args(sp)
    sp.add_argument("--manifest", required=True)
    sp.add_argument("--ckpt")
    sp.add_argument("--torch-ckpt")
    sp.add_argument("--extractor-ckpt")
    sp.add_argument("--extractor-torch-ckpt")
    sp.add_argument("--lfb", help="test-set bank cache path")
    sp.add_argument("--load-lfb", action="store_true")
    sp.add_argument("--engine", choices=["clip", "video", "corpus"],
                    default=None,
                    help="'clip' = reference-protocol batched clips over a "
                         "prebuilt bank; 'video' = full-video engine "
                         "(backbone once per frame, LFB build fused); "
                         "'corpus' = video engine with the whole-set "
                         "flat-stream trunk (eval.corpus=true). Default: "
                         "corpus, falling back to clip for multi-crop, "
                         "compat_cross_video, or --lfb workflows")
    sp.add_argument("--out", default="./predictions.npz")
    sp.add_argument("--ref-pickle",
                    help="also write predictions in the reference's pickle "
                         "format (<path> + <path>.score.pkl) for its "
                         "export_phase_copy.py tooling")
    sp.set_defaults(fn=cmd_test)

    sp = sub.add_parser("stream", help="online streaming inference "
                                       "(one frame/stream/step, JSONL out)")
    _add_config_args(sp)
    sp.add_argument("--manifest", required=True)
    sp.add_argument("--ckpt")
    sp.add_argument("--torch-ckpt")
    sp.add_argument("--extractor-ckpt")
    sp.add_argument("--extractor-torch-ckpt")
    sp.add_argument("--artifact",
                    help="run from an export-model --stream artifact "
                         "instead of model code + checkpoints (slot count "
                         "and data pipeline come from its sidecar)")
    sp.add_argument("--max-steps", type=int, default=0,
                    help="cap the number of streamed frames per video")
    sp.add_argument("--max-streams", type=int, default=64,
                    help="serve all videos through this many compiled "
                         "stream slots, recycling a slot when its video "
                         "ends (default 64 caps host RAM at ~64 decoded "
                         "videos; -1 = one slot per video)")
    sp.add_argument("--out", default="./stream_preds.jsonl")
    sp.set_defaults(fn=cmd_stream)

    sp = sub.add_parser("serve", help="serving daemon: JSONL frame events "
                                      "on stdin -> predictions on stdout")
    _add_config_args(sp)
    sp.add_argument("--ckpt")
    sp.add_argument("--torch-ckpt")
    sp.add_argument("--extractor-ckpt")
    sp.add_argument("--extractor-torch-ckpt")
    sp.add_argument("--slots", type=int, default=16,
                    help="compiled stream slots (max concurrent streams)")
    sp.add_argument("--artifact",
                    help="serve from an export-model --stream artifact "
                         "instead of model code + checkpoints (slot count "
                         "and data pipeline come from its sidecar)")
    sp.add_argument("--probs", action="store_true",
                    help="include per-class probabilities in output rows")
    sp.add_argument("--input", default="-",
                    help="protocol input file ('-' = stdin)")
    sp.add_argument("--no-warmup", action="store_true",
                    help="skip the startup compile-warmup step")
    sp.add_argument("--state-dir",
                    help="checkpoint serving state here (crash recovery: "
                         "a restarted daemon resumes live streams)")
    sp.add_argument("--checkpoint-every", type=int, default=64,
                    help="ticks between serving-state checkpoints")
    sp.add_argument("--decode-workers", type=int, default=4,
                    help="frame-decode pool threads (0 = decode inline in "
                         "the protocol loop)")
    sp.add_argument("--decode-timeout", type=float, default=5.0,
                    help="seconds before a tick drops a frame whose decode "
                         "hasn't finished (the stream freezes that tick)")
    sp.add_argument("--tick-interval", type=float, default=0.0,
                    help="self-ticking: flush pending frames every this "
                         "many wall-clock seconds (1.0 for 1-fps OR feeds) "
                         "instead of waiting for {\"step\": true} lines; "
                         "0 = client-driven ticks only")
    sp.add_argument("--stats-every", type=int, default=0,
                    help="print a JSON stats heartbeat (tick, rows, live "
                         "streams, rolling latency p50/p95) to stderr "
                         "every N ticks; 0 = only the exit summary")
    sp.add_argument("--idle-ticks", type=int, default=0,
                    help="evict a stream that contributed no frame to this "
                         "many consecutive ticks (abandoned feeds free "
                         "their slots; one {'evicted': true} row is "
                         "emitted); 0 = streams live until end/disconnect")
    sp.add_argument("--listen", metavar="HOST:PORT",
                    help="serve the JSONL protocol over TCP instead of "
                         "stdin/stdout: any number of clients connect, "
                         "each stream's rows route to the connection that "
                         "owns it, and a dropped connection frees its "
                         "streams' slots (port 0 = ephemeral, bound "
                         "address printed to stderr)")
    sp.set_defaults(fn=cmd_serve)

    sp = sub.add_parser("parity", help="reference .pth + frames -> Main.m "
                                       "protocol table in one command")
    _add_config_args(sp)
    sp.add_argument("--manifest", required=True,
                    help="test manifest (pickle/CSV) over the frames dirs")
    sp.add_argument("--torch-ckpt", required=True,
                    help="reference stage-2 .pth (TMRNet weights)")
    sp.add_argument("--extractor-torch-ckpt",
                    help="reference stage-1 .pth for the LFB extractor "
                         "(defaults to --torch-ckpt's trunk+lstm)")
    sp.add_argument("--lfb", help="bank cache path (default workdir/lfb.npz)")
    sp.add_argument("--load-lfb", action="store_true")
    sp.add_argument("--workdir", default="./parity")
    sp.add_argument("--protocol", default="cholec80",
                    choices=["cholec80", "m2cai"])
    sp.add_argument("--json-out")
    sp.set_defaults(fn=cmd_parity)

    sp = sub.add_parser("export", help="predictions (npz or stream jsonl) "
                                       "-> phase txt trees")
    _add_config_args(sp)
    sp.add_argument("--manifest", required=True)
    sp.add_argument("--preds", required=True,
                    help=".npz from `test` or .jsonl from `stream`")
    sp.add_argument("--pred-dir", default="./eval/phase")
    sp.add_argument("--gt-dir", default="./eval/gt-phase")
    sp.add_argument("--name-fmt", default="{vid}-phase.txt",
                    help="per-video file name; a real cutMargin tree has "
                         "bare-number video ids, so pass "
                         "'video{vid}-phase.txt' to produce the exact "
                         "names MATLAB Main.m iterates (video41..video80)")
    sp.set_defaults(fn=cmd_export)

    sp = sub.add_parser("evaluate", help="relaxed-boundary protocol scoring")
    _add_config_args(sp)
    sp.add_argument("--pred-dir", required=True)
    sp.add_argument("--gt-dir", required=True)
    sp.add_argument("--protocol", default=None,
                    choices=["cholec80", "m2cai"],
                    help="default: the config's eval.protocol (cholec80)")
    sp.add_argument("--fps", type=int, default=None)
    sp.add_argument("--videos", nargs="*")
    sp.add_argument("--relaxed-seconds", type=int, default=None,
                    help="boundary relaxation (default eval.relaxed_seconds"
                         " = 10, Evaluate.m:13)")
    sp.add_argument("--video-range", nargs=2, type=int, metavar=("LO", "HI"),
                    help="score only gt files whose trailing video number "
                         "falls in [LO, HI] (Main.m's 41:80 / Main_m2cai.m's "
                         "1:14 iteration); a --preset defaults this to its "
                         "eval.test_videos")
    sp.add_argument("--no-quirk", action="store_true",
                    help="use intended (non-MATLAB-quirk) early relaxation")
    sp.add_argument("--json-out")
    sp.add_argument("--matlab-compat", action="store_true",
                    help="drop each phase file's first row like "
                         "ReadPhaseLabel.m's unconditional fgets (reference "
                         "exports are headerless, so Main.m silently loses "
                         "frame 0 per video)")
    sp.set_defaults(fn=cmd_evaluate)

    sp = sub.add_parser("export-ckpt", help="checkpoint -> reference-format "
                                            "torch .pth")
    _add_config_args(sp)
    sp.add_argument("--ckpt", required=True,
                    help="orbax checkpoint dir (best/ preferred)")
    sp.add_argument("--out", required=True, help="output .pth path")
    sp.set_defaults(fn=cmd_export_ckpt)

    sp = sub.add_parser("export-model",
                        help="serialize the jitted inference step to a "
                             "portable StableHLO artifact (weights baked "
                             "in; runs anywhere with plain JAX)")
    _add_config_args(sp)
    sp.add_argument("--ckpt", help="orbax checkpoint dir (best/ preferred)")
    sp.add_argument("--torch-ckpt", help="reference .pth to convert + export")
    sp.add_argument("--out", required=True,
                    help="artifact path (sidecar <out>.json carries the "
                         "calling convention)")
    sp.add_argument("--batch", type=int, default=0,
                    help="exported batch size (fixed shape; default "
                         "eval.batch_clips). Export one artifact per "
                         "deployed batch size")
    sp.add_argument("--platforms", default="cpu,tpu",
                    help="comma-separated lowering targets (default "
                         "cpu,tpu)")
    sp.add_argument("--fold-bn", action="store_true",
                    help="fold BatchNorm into conv weights before export "
                         "(inference-only; removes every BN op from the "
                         "artifact)")
    sp.add_argument("--stream", action="store_true",
                    help="export the serve daemon's per-tick stream step "
                         "instead of the clip step (run with `serve "
                         "--artifact <out>`)")
    sp.add_argument("--slots", type=int, default=16,
                    help="--stream: slot count baked into the artifact "
                         "(default 16)")
    sp.add_argument("--extractor-ckpt",
                    help="--stream: frozen extractor from a stage-1 orbax "
                         "checkpoint (default: subset of the main weights)")
    sp.add_argument("--extractor-torch-ckpt",
                    help="--stream: frozen extractor from a reference .pth")
    sp.set_defaults(fn=cmd_export_model)

    sp = sub.add_parser("migrate", help="reference command line -> the "
                        "equivalent tmrnet-tpu command(s)")
    sp.add_argument("--cmd", help="the reference command as one quoted "
                    "string (alternative to positional tokens)")
    sp.add_argument("tokens", nargs=argparse.REMAINDER,
                    help="the reference command, e.g. "
                         "migrate -- python train_non-local_mutiConv_"
                         "resnet.py -t 90 -e 25 --LFB_l 30")
    sp.set_defaults(fn=cmd_migrate)

    sp = sub.add_parser("doctor", help="environment + artifact diagnostics")
    _add_config_args(sp)
    sp.add_argument("--manifest", help="validate a manifest pickle/CSV")
    sp.add_argument("--checkpoint", help="validate a checkpoint directory")
    sp.add_argument("--lfb", help="validate a feature-bank .npz")
    sp.add_argument("--artifact",
                    help="validate an export-model StableHLO artifact "
                         "(deserializes + reports calling convention)")
    sp.add_argument("--mesh", action="store_true",
                    help="build the config's device mesh and report its shape")
    sp.add_argument("--smoke", action="store_true",
                    help="compile+run a tiny jit matmul on the real backend "
                         "(first compile on a tunneled TPU can take minutes)")
    sp.set_defaults(fn=cmd_doctor)

    return p


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    if args.compile_cache is not None or os.environ.get("TMRNET_COMPILE_CACHE"):
        from tmrnet_tpu.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache(args.compile_cache or None)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
