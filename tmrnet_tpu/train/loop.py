"""Trainer orchestration: the epoch loops for both stages + LFB build.

Replaces the reference's five copy-pasted 700-1000-line drivers (SURVEY.md 2.5)
with three functions over shared machinery:

  train_stage1  -- memory-bank model (reference train_singlenet_phase_1fc.py)
  build_lfb     -- frozen-extractor bank build (reference LFB build,
                   `train_non-local_mutiConv_resnet.py:679-768`) streamed
                   on-device, with .npz cache honoring the --load_LFB workflow
  train_stage2  -- TMRNet head training (reference
                   train_non-local_mutiConv_resnet.py / _resnest.py /
                   train_only_non-local_pretrained.py, selected by config)

Shared semantics kept from the reference: class-balanced weighted CE on each
clip's last frame, two-group lr (trunk at lr/10), per-epoch shuffled clip
starts, full validation pass per epoch, best checkpoint by val accuracy with
train-accuracy tiebreak, StepLR / ReduceLROnPlateau scheduling.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tmrnet_tpu.config import ExperimentConfig
from tmrnet_tpu.data.pipeline import ClipDataset, ClipLoader
from tmrnet_tpu.memory.lfb import (
    FeatureBank,
    gather_memory_windows,
    load_bank,
    save_bank,
    update_bank,
)
from tmrnet_tpu.models.tmrnet import build_model
from tmrnet_tpu.train.losses import balanced_class_weights
from tmrnet_tpu.train.optim import (
    make_optimizer,
    make_schedule,
    set_learning_rate,
    slow_modules_for_head,
)
from tmrnet_tpu.train.state import TrainState, create_train_state
from tmrnet_tpu.train.steps import make_stage1_steps, make_stage2_steps
from tmrnet_tpu.utils.checkpoint import BestTracker, CheckpointManager
from tmrnet_tpu.utils.logging import MetricLogger, Timer


@dataclasses.dataclass
class EpochStats:
    epoch: int
    train_loss: float
    train_acc: float
    val_loss: float
    val_acc: float
    lr: float
    seconds: float


def _maybe_shard(mesh, state, *arrays):
    if mesh is None:
        return state, arrays
    from tmrnet_tpu.parallel.mesh import shard_batch, shard_state

    if state is not None:
        state = shard_state(mesh, state)
    return state, tuple(shard_batch(mesh, a) for a in arrays)


def _init_state(cfg: ExperimentConfig, model, sample_inputs,
                init_variables=None, slow_modules=("backbone",),
                rng_seed: int = 0) -> TrainState:
    if init_variables is None:
        init_variables = model.init(jax.random.PRNGKey(rng_seed), *sample_inputs)
    tx = make_optimizer(cfg.train, init_variables["params"], slow_modules)
    return create_train_state(model, init_variables, tx)


def _make_memory_fn(cfg: ExperimentConfig, ds: Optional[ClipDataset],
                    bank: Optional[FeatureBank], window: int
                    ) -> Optional[Callable]:
    """rows -> (B, window, F) memory gather for one dataset/bank pair.

    Default: clamped on-device window (paper intent). With
    `memory.compat_cross_video` the reference's dict-walk semantics are used —
    lookback silently crosses video boundaries through the previous video's
    tail frames (`train_non-local_mutiConv_resnet.py:298-326`) — via a
    precomputed host table; the gather itself stays on device."""
    if bank is None or ds is None:
        return None
    if cfg.memory.compat_cross_video:
        from tmrnet_tpu.data.indexing import quirk_window_table

        table = quirk_window_table(ds.seq_len, ds.manifest.video_lengths,
                                   window).astype(np.int32)

        def fn(rows):
            return jnp.take(bank.features, jnp.asarray(table[rows]), axis=0)

        return fn
    first_rows_all = ds.first_rows

    def fn(rows):
        return gather_memory_windows(
            bank.features, jnp.asarray(rows, jnp.int32),
            jnp.asarray(first_rows_all[rows], jnp.int32), window)

    return fn


class _BatchFeed:
    """clips/labels host->device placement for the epoch loops.

    Single process: plain asarray (no mesh) or batch-dim sharding over the
    mesh (shard_batch). Multi-controller (the mesh spans processes): each
    process's loader assembles only its local_rows slice of every
    (identical, seeded) global batch, and put() stitches the slices into
    one global jax.Array with zero cross-process data motion
    (parallel/mesh.py::global_batch_from_local). fetch() returns global
    host values either way — batch-sharded eval outputs span processes, so
    the multi-controller path all-gathers them to replicated first."""

    def __init__(self, mesh, batch: int):
        self.mesh = mesh
        self.batch = batch
        self.local_rows = None
        self._rep = None
        # multi-controller machinery engages only when THIS mesh actually
        # spans processes — a process-local mesh in a multi-process
        # runtime must not join cross-process collectives
        self.multi = False
        if mesh is not None:
            from tmrnet_tpu.parallel.mesh import (
                mesh_spans_processes,
                process_local_bounds,
            )

            self.multi = mesh_spans_processes(mesh)
            if self.multi:
                try:
                    self.local_rows = process_local_bounds(mesh, batch)
                except ValueError:
                    # process-interleaved custom mesh: every process loads
                    # the full global batch (shard_batch contract) instead
                    self.local_rows = None

    def put(self, *arrays):
        if self.mesh is None:
            out = tuple(jnp.asarray(a) for a in arrays)
        elif self.local_rows is not None:
            from tmrnet_tpu.parallel.mesh import global_batch_from_local

            out = global_batch_from_local(self.mesh, *arrays,
                                          global_batch=self.batch)
            out = out if isinstance(out, tuple) else (out,)
        else:
            from tmrnet_tpu.parallel.mesh import shard_batch

            out = shard_batch(self.mesh, *arrays)
            out = out if isinstance(out, tuple) else (out,)
        return out[0] if len(out) == 1 else out

    def fetch(self, x) -> np.ndarray:
        if getattr(x, "is_fully_addressable", True):
            return np.asarray(x)
        # batch-sharded output spanning processes: all-gather to a
        # replicated array (fetchable on every process), one tiny
        # compiler-inserted collective per call
        if self._rep is None:
            from tmrnet_tpu.parallel.mesh import replicated_sharding

            self._rep = jax.jit(lambda a: a,
                                out_shardings=replicated_sharding(self.mesh))
        return np.asarray(self._rep(x))


# multi-controller stop-flag cadence: the all-gather is a blocking host
# sync (the same per-step fetch pattern the device accumulators removed,
# measured 1.76x on a tunneled host), so it runs every K steps — worst-case
# preemption response lags K steps (~1 s), well inside any SIGTERM grace
_STOP_CHECK_EVERY = 8


def _global_stop(stop: Optional[dict], multi: bool = False) -> bool:
    """Collective preemption check: with a mesh spanning controllers a
    SIGTERM may land on one process only; a process-local stop would have
    that process enter the checkpoint barrier while its peers keep
    training — a deadlock. Every process calls this at the same boundaries
    (every _STOP_CHECK_EVERY steps, and once after each epoch's
    bookkeeping), so the tiny all-gather keeps them in lockstep and ANY
    process's signal stops all of them. multi=False (single controller or
    process-local mesh): just the local flag, no collective."""
    flag = bool(stop is not None and stop.get("stop"))
    if multi:
        from jax.experimental import multihost_utils

        flag = bool(np.any(multihost_utils.process_allgather(
            np.asarray([flag]))))
        if flag and stop is not None:
            stop["stop"] = True   # adopt a peer's preemption locally
    return flag


@jax.jit
def _accumulate_metrics(acc, m):
    """Device-side running (loss_sum, correct, count) — one tiny dispatched
    add per step instead of a blocking device->host fetch (a fetch costs up
    to ~30 ms on a tunneled host against a ~72 ms step; VERDICT r2 #4)."""
    return (acc[0] + m["loss"], acc[1] + m["correct"], acc[2] + m["count"])


def _run_epoch_train(train_step, state, loader, epoch, rng,
                     memory_fn: Optional[Callable] = None,
                     feed: Optional[_BatchFeed] = None,
                     log: Optional[MetricLogger] = None, log_every: int = 50,
                     minibatch_val: Optional[Callable] = None,
                     minibatch_val_every: int = 0, log_images_every: int = 0,
                     stop: Optional[dict] = None):
    acc = None  # device-resident (loss_sum, correct, count)
    interrupted = False
    prev_loss, prev_count = 0.0, 0   # last log snapshot (host floats)
    timer = Timer()
    feed = feed or _BatchFeed(None, loader.batch)
    for i, (host_clips, labels, rows, pad) in enumerate(loader.epoch(epoch)):
        step_rng = jax.random.fold_in(rng, epoch * 100003 + i)
        clips, labels = feed.put(host_clips, labels)
        if memory_fn is not None:
            state, m = train_step(state, clips, memory_fn(rows),
                                  labels, step_rng)
        else:
            state, m = train_step(state, clips, labels, step_rng)
        # loss already masks padding (label -1); m["count"] == len(rows)-pad
        acc = ((m["loss"], m["correct"], m["count"]) if acc is None
               else _accumulate_metrics(acc, m))
        timer.add_frames((len(rows) - pad) * clips.shape[1])
        if (log is not None and log_images_every
                and i % log_images_every == 0):
            # first locally-assembled clip as an input-sequence snapshot
            # (reference Comet log_image, `test-resnet.py:737-746`)
            log.log_images(int(state.step), "train/input_sequence",
                           np.asarray(host_clips[0]))
        if log is not None and (i + 1) % log_every == 0:
            # the only host sync between logs; report the SINCE-LAST-LOG
            # window so the curve keeps per-batch resolution instead of an
            # epoch-cumulative average that dilutes late-epoch spikes
            tot_loss, tot_count = float(acc[0]), int(acc[2])
            n = max(tot_count - prev_count, 1)
            log.log(int(state.step),
                    {"loss": (tot_loss - prev_loss) / n,
                     "fps": timer.fps}, prefix="train/")
            prev_loss, prev_count = tot_loss, tot_count
        if (minibatch_val is not None and minibatch_val_every
                and (i + 1) % minibatch_val_every == 0):
            vm = minibatch_val(state)
            if log is not None:
                log.log(int(state.step), vm, prefix="val_minibatch/")
        if stop is not None:
            # single controller: free local check every step. Mesh spanning
            # controllers: collective check every _STOP_CHECK_EVERY steps
            # (all processes hit the same boundaries — same loader length)
            due = (not feed.multi
                   or i % _STOP_CHECK_EVERY == _STOP_CHECK_EVERY - 1)
            if due and _global_stop(stop, feed.multi):
                # preemption signal (on ANY controller): the step that was
                # in flight has been applied; leave at this step boundary
                # so the caller can checkpoint a consistent state
                # (train.preempt_save)
                interrupted = True
                break
    if acc is None:
        return state, 0.0, 0.0, interrupted
    count = max(int(acc[2]), 1)
    return state, float(acc[0]) / count, int(acc[1]) / count, interrupted


def _run_epoch_eval(eval_step, state, loader,
                    memory_fn: Optional[Callable] = None,
                    feed: Optional[_BatchFeed] = None):
    loss_sum, correct, count = 0.0, 0, 0
    all_preds, all_labels, all_rows = [], [], []
    feed = feed or _BatchFeed(None, loader.batch)
    for clips, labels, rows, pad in loader.epoch(0):
        dclips, dlabels = feed.put(clips, labels)
        if memory_fn is not None:
            m = eval_step(state, dclips, memory_fn(rows), dlabels)
        else:
            m = eval_step(state, dclips, dlabels)
        b = len(rows) - pad
        losses = feed.fetch(m["losses"])[:b]
        preds = feed.fetch(m["preds"])[:b]
        if feed.local_rows is not None:
            # multi-controller: host labels cover only this process's
            # slice — global labels come straight from manifest metadata
            # when the dataset exposes them (no decode, no device fetch);
            # pad rows sit past [:b] so the -1 marks don't matter here
            ds = getattr(loader, "ds", None)
            if hasattr(ds, "clip_labels"):
                labels = ds.clip_labels[rows]
            else:
                labels = feed.fetch(dlabels)
        loss_sum += float(losses.sum())
        correct += int((preds == labels[:b]).sum())
        count += b
        all_preds.append(preds)
        all_labels.append(labels[:b])
        all_rows.append(rows[:b])
    preds = np.concatenate(all_preds) if all_preds else np.zeros(0, np.int64)
    labels = np.concatenate(all_labels) if all_labels else np.zeros(0, np.int64)
    rows = np.concatenate(all_rows) if all_rows else np.zeros(0, np.int64)
    return (loss_sum / max(count, 1), correct / max(count, 1),
            preds, labels, rows)


def _fit(cfg: ExperimentConfig, model, train_ds: ClipDataset,
         val_ds: Optional[ClipDataset], use_memory: bool,
         bank: Optional[FeatureBank], slow_modules,
         init_variables=None, mesh=None,
         log: Optional[MetricLogger] = None,
         val_bank: Optional[FeatureBank] = None
         ) -> Tuple[TrainState, List[EpochStats]]:
    t = cfg.train
    window = cfg.memory.window
    sample_clips, _ = train_ds.get_clip(0)
    sample_clips = jnp.asarray(sample_clips[None]).astype(jnp.float32)
    sample_inputs = (sample_clips,)
    if use_memory:
        sample_inputs = (sample_clips,
                         jnp.zeros((1, window, cfg.model.hidden_dim)))
    state = _init_state(cfg, model, sample_inputs, init_variables,
                        slow_modules, t.seed)
    if mesh is not None:
        # shard BEFORE any restore: orbax then restores straight into the
        # global shardings (each process reads only its shards from the
        # shared dir). Restoring into process-local arrays and re-sharding
        # afterwards is an unsupported cross-host device_put.
        state, _ = _maybe_shard(mesh, state)

    ckpt = CheckpointManager(t.checkpoint_dir, keep=t.keep_checkpoints,
                             use_async=t.async_checkpoint)
    start_epoch = 0
    resume_meta: Dict = {}
    if t.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        resume_meta = ckpt.metadata(ckpt.latest_step()).get("metrics", {})
        start_epoch = int(resume_meta.get("epoch", -1)) + 1

    class_weights = (balanced_class_weights(train_ds.manifest.flat_labels(),
                                            cfg.model.num_classes)
                     if t.class_weighting else None)
    make_steps = make_stage2_steps if use_memory else make_stage1_steps
    prep = None
    if cfg.data.device_normalize:
        # uint8 training feed: the dataset's transform leaves clips raw
        # uint8 and (x - mean)/std runs inside the jitted step (4x fewer
        # host->device bytes; same DevicePrep convention as inference)
        from tmrnet_tpu.data.device_feed import DevicePrep

        prep = DevicePrep(cfg.data, jnp.dtype(cfg.model.compute_dtype))
    train_step, eval_step = make_steps(class_weights, "sum",
                                       label_smoothing=t.label_smoothing,
                                       donate=t.donate_state, prep=prep)

    # multi-controller: each process's loaders assemble only the batch rows
    # its own devices consume (feed.local_rows; single-process = full batch)
    feed = _BatchFeed(mesh, cfg.data.batch_clips)
    train_loader = ClipLoader(train_ds, cfg.data.batch_clips, shuffle=True,
                              num_workers=cfg.data.num_workers,
                              prefetch=cfg.data.prefetch, seed=t.seed,
                              drop_remainder=True,
                              use_processes=cfg.data.use_process_workers,
                              local_rows=feed.local_rows)
    val_loader = (ClipLoader(val_ds, cfg.data.batch_clips, shuffle=False,
                             num_workers=cfg.data.num_workers,
                             prefetch=cfg.data.prefetch,
                             use_processes=cfg.data.use_process_workers,
                             local_rows=feed.local_rows)
                  if val_ds is not None else None)

    if mesh is not None:
        # the feature bank must live on the mesh's device set, or the jitted
        # step sees inputs committed to incompatible devices; replicate it
        # (Cholec80-scale bank is ~90 MB bf16 — cheap next to activations)
        from tmrnet_tpu.parallel.mesh import host_local, replicated_sharding

        rep = replicated_sharding(mesh)

        def _replicate(feats):
            if feed.multi:
                # committed features (caller's own device_put) can't
                # cross-host device_put — take them through the host
                feats = host_local(feats)
            return jax.device_put(feats, rep)

        if bank is not None:
            bank = FeatureBank(features=_replicate(bank.features),
                               first_rows=bank.first_rows)
        if val_bank is not None:
            val_bank = FeatureBank(features=_replicate(val_bank.features),
                                   first_rows=val_bank.first_rows)

    schedule = make_schedule(t)
    if start_epoch and hasattr(schedule, "scale"):
        # restore the plateau schedule's host state — a fresh instance
        # would silently revert lr to base_lr after the first resumed
        # epoch (review r3)
        for k in ("best", "bad_epochs", "scale"):
            if f"sched_{k}" in resume_meta:
                setattr(schedule, k, resume_meta[f"sched_{k}"])
    tracker = BestTracker()
    if start_epoch:
        # re-seed the selection rule from the saved best, so the first
        # post-resume epoch can't overwrite the real best checkpoint
        bm = ckpt.best_metadata().get("metrics", {})
        tracker.best_val = float(bm.get("val_acc", -1.0))
        tracker.best_train = float(bm.get("train_acc", -1.0))
        tracker.best_epoch = int(bm.get("epoch", -1))
    rng = jax.random.PRNGKey(t.seed)
    memory_fn = (_make_memory_fn(cfg, train_ds, bank, window)
                 if use_memory else None)
    val_memory_fn = (_make_memory_fn(
        cfg, val_ds, val_bank if val_bank is not None else bank, window)
        if use_memory and val_ds is not None else None)
    history: List[EpochStats] = []

    minibatch_val = None
    if t.val_minibatch_every and val_ds is not None:
        vb_clips, vb_labels, vb_rows, vb_pad = next(iter(val_loader.epoch(0)))
        vb_clips, vb_dlabels = feed.put(vb_clips, vb_labels)
        if feed.local_rows is not None:
            # global labels from manifest metadata (see _run_epoch_eval)
            vb_labels = (val_ds.clip_labels[vb_rows]
                         if hasattr(val_ds, "clip_labels")
                         else feed.fetch(vb_dlabels))

        def minibatch_val(st):
            if use_memory:
                m = eval_step(st, vb_clips, val_memory_fn(vb_rows),
                              vb_dlabels)
            else:
                m = eval_step(st, vb_clips, vb_dlabels)
            b = len(vb_rows) - vb_pad
            preds = feed.fetch(m["preds"])[:b]
            return {"loss": float(feed.fetch(m["losses"])[:b].sum()) / max(b, 1),
                    "acc": float((preds == vb_labels[:b]).mean())}

    # Preemption-safe exit (train.preempt_save): SIGTERM/SIGINT set a flag
    # the step loop checks at each step boundary; the interrupted epoch is
    # checkpointed marked for replay and the loop unwinds cleanly. A second
    # signal forces the default behavior (hard interrupt — e.g. to break
    # out of a hung compile). Handlers restore on exit; registration is
    # main-thread-only (ValueError elsewhere -> raw signals, as before).
    stop = {"stop": False}
    restore_sigs = []
    if t.preempt_save:
        import signal

        def _on_preempt(signum, frame):
            # count LOCAL signals only — a peer-adopted stop flag
            # (stop["stop"] set by _global_stop) must not make this
            # process's own FIRST SIGTERM hard-interrupt it mid-checkpoint:
            # real preemption delivers a staggered SIGTERM to every task
            stop["local_signals"] = stop.get("local_signals", 0) + 1
            if stop["local_signals"] > 1:   # second signal: stop deferring
                raise KeyboardInterrupt
            stop["stop"] = True

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                restore_sigs.append((sig, signal.signal(sig, _on_preempt)))
            except ValueError:
                pass
    try:
        return _epoch_loop(
            cfg, state, stop, start_epoch, train_step, eval_step,
            train_loader, val_loader, rng, memory_fn, val_memory_fn, feed,
            log, minibatch_val, schedule, tracker, ckpt, history)
    finally:
        # async checkpointing: the final (possibly preemption) save must be
        # durable before the trainer returns / the process exits
        ckpt.wait()
        if restore_sigs:
            import signal

            for sig, prev in restore_sigs:
                signal.signal(sig, prev)


def _epoch_loop(cfg, state, stop, start_epoch, train_step, eval_step,
                train_loader, val_loader, rng, memory_fn, val_memory_fn,
                feed, log, minibatch_val, schedule, tracker,
                ckpt: CheckpointManager, history: List[EpochStats]):
    """The epoch loop of _fit (split out so the signal-handler install/
    restore brackets exactly the region that honors the stop flag).
    Returns (final state, history)."""
    t = cfg.train
    for epoch in range(start_epoch, t.epochs):
        t0 = time.time()
        state, tr_loss, tr_acc, interrupted = _run_epoch_train(
            train_step, state, train_loader, epoch, rng, memory_fn,
            feed, log, t.log_every, minibatch_val, t.val_minibatch_every,
            t.log_images_every, stop)
        if interrupted:
            # checkpoint the preempted weights marked for EPOCH REPLAY
            # (metrics.epoch = last completed epoch): resume restarts this
            # epoch from the partially-trained params instead of losing
            # everything since the last epoch boundary. No best tracking —
            # there is no val pass for an interrupted epoch.
            metrics = {"epoch": epoch - 1, "preempted": True}
            if hasattr(schedule, "scale"):
                metrics.update(sched_best=schedule.best,
                               sched_bad_epochs=schedule.bad_epochs,
                               sched_scale=schedule.scale)
            ckpt.save(state, step=int(state.step), metrics=metrics)
            if log is not None:
                log.log(epoch, {"preempted": 1.0}, prefix="epoch/")
            break
        if val_loader is not None:
            va_loss, va_acc, va_preds, va_labels, _ = _run_epoch_eval(
                eval_step, state, val_loader, val_memory_fn, feed)
            if log is not None and va_preds.size:
                from tmrnet_tpu.eval.metrics import classification_metrics

                cmm = classification_metrics(va_labels, va_preds,
                                             int(cfg.model.num_classes))
                for c in range(int(cfg.model.num_classes)):
                    log.log(epoch, {f"precision_{c}": cmm["precision"][c],
                                    f"recall_{c}": cmm["recall"][c]},
                            prefix="val/")
                # reference logs a per-epoch confusion matrix to Comet
                # (`train_memorybank.py:357-358`)
                log.log_confusion_matrix(epoch, va_labels, va_preds,
                                         int(cfg.model.num_classes),
                                         tag="val/confusion")
        else:
            va_loss, va_acc = tr_loss, tr_acc
        lr = schedule(epoch + 1, va_loss) if callable(schedule) else t.lr
        state = state.replace(opt_state=set_learning_rate(state.opt_state, lr))
        secs = time.time() - t0
        stats = EpochStats(epoch, tr_loss, tr_acc, va_loss, va_acc, lr, secs)
        history.append(stats)
        if log is not None:
            log.log(epoch, {"train_loss": tr_loss, "train_acc": tr_acc,
                            "val_loss": va_loss, "val_acc": va_acc,
                            "lr": lr, "seconds": secs}, prefix="epoch/")
        is_best = tracker.update(epoch, va_acc, tr_acc)
        metrics = {"epoch": epoch, "val_acc": va_acc,
                   "train_acc": tr_acc, "val_loss": va_loss}
        if hasattr(schedule, "scale"):   # plateau host state, for resume
            metrics.update(sched_best=schedule.best,
                           sched_bad_epochs=schedule.bad_epochs,
                           sched_scale=schedule.scale)
        ckpt.save(state, step=int(state.step), metrics=metrics,
                  is_best=is_best)
        if _global_stop(stop, feed.multi):
            # the signal landed during the val pass / bookkeeping (on any
            # controller): this epoch completed and is checkpointed — exit
            # at the boundary (resume continues with the next epoch, no
            # replay needed)
            if log is not None:
                log.log(epoch, {"preempted": 1.0}, prefix="epoch/")
            break
        if (t.early_stop_patience
                and epoch - tracker.best_epoch >= t.early_stop_patience):
            # the best checkpoint is already saved; the remaining epochs
            # can only re-confirm it (resume respects this: best_epoch is
            # re-seeded from the best checkpoint's metadata above)
            if log is not None:
                log.log(epoch, {"early_stop": 1.0}, prefix="epoch/")
            break
    return state, history


def train_stage1(cfg: ExperimentConfig, train_ds: ClipDataset,
                 val_ds: Optional[ClipDataset] = None, init_variables=None,
                 mesh=None, log: Optional[MetricLogger] = None):
    """Stage-1 memory-bank model training."""
    model = build_model(dataclasses.replace(cfg.model, head="stage1",
                                            remat=cfg.train.remat))
    return _fit(cfg, model, train_ds, val_ds, use_memory=False, bank=None,
                slow_modules=slow_modules_for_head("stage1"),
                init_variables=init_variables, mesh=mesh, log=log)


def build_lfb(cfg: ExperimentConfig, extractor_variables,
              ds: ClipDataset, cache_path: Optional[str] = None,
              force: bool = False, engine: str = "clip",
              mesh=None) -> FeatureBank:
    """Run the frozen extractor over every clip (eval transforms) and fill the
    HBM bank; load from the .npz cache when present (--load_LFB semantics).

    engine='video': build at ONE backbone pass per frame (the video
    engine's clip-overlap dedup — consecutive clips share seq_len-1
    frames, so the clip-wise build recomputes the backbone seq_len times
    per frame). Identical features (parity-tested); requires a
    deterministic frame-wise transform (crop types 1/2) and a frame
    manifest.

    mesh: optional device mesh — clip batches shard over the data axis
    (params + bank replicated, like every other engine); batches whose
    size doesn't divide the axis fall back to replicated placement. In a
    multi-controller run each process assembles only its own batch slice
    (same _BatchFeed contract as training) and process 0 writes the
    cache."""
    path = cache_path or cfg.memory.cache_path
    if path and os.path.exists(path) and cfg.memory.load_cached and not force:
        return load_bank(path)

    if engine == "video" and mesh is not None:
        from tmrnet_tpu.parallel.mesh import mesh_spans_processes

        if mesh_spans_processes(mesh):
            # the video engine's frame-sharded fetches are
            # single-controller (require_single_controller); the clip
            # engine builds the identical bank (parity-tested) with
            # per-process batch slices — auto-fall back like the CLI
            # engine defaults do. Process-local meshes keep the video
            # engine (seq_len x less backbone work).
            engine = "clip"
    if engine == "video":
        return _build_lfb_video(cfg, extractor_variables, ds, path, mesh)

    model = build_model(dataclasses.replace(cfg.model, head="lfb"))
    cdt = jnp.dtype(cfg.model.compute_dtype)
    from tmrnet_tpu.data.device_feed import DevicePrep

    prep = DevicePrep(cfg.data, cdt)  # shared uint8 wire convention

    @jax.jit
    def extract(variables, clips):
        return model.apply(variables, prep(clips), train=False)

    put_batch = jnp.asarray
    local_rows = None
    if mesh is not None:
        from tmrnet_tpu.parallel.mesh import (
            host_local,
            mesh_spans_processes,
            replicated_sharding,
        )

        rep = replicated_sharding(mesh)
        if mesh_spans_processes(mesh):
            # committed leaves (orbax-restored extractor checkpoints)
            # can't cross-host device_put — take them through the host
            extractor_variables = host_local(extractor_variables)
        extractor_variables = jax.device_put(extractor_variables, rep)
        dp = mesh.shape[mesh.axis_names[0]]
        # loader batches are padded to full size, so divisibility is
        # decided once by batch_clips; indivisible batches (API callers
        # with hand-built meshes) fall back to replicated placement, the
        # same fallback as run_video
        if cfg.data.batch_clips % dp == 0:
            feed = _BatchFeed(mesh, cfg.data.batch_clips)
            local_rows = feed.local_rows  # multi-controller local slices
            put_batch = feed.put
        else:
            def put_batch(clips):
                return jax.device_put(clips, rep)

    lengths = ds.manifest.video_lengths
    bank = FeatureBank.create(ds.seq_len, lengths, cfg.model.hidden_dim)
    feats = bank.features
    if mesh is not None:
        feats = jax.device_put(feats, rep)
    loader = ClipLoader(ds, cfg.data.batch_clips, shuffle=False,
                        num_workers=cfg.data.num_workers,
                        prefetch=cfg.data.prefetch,
                        use_processes=cfg.data.use_process_workers,
                        local_rows=local_rows)
    for clips, _labels, rows, pad in loader.epoch(0):
        values = extract(extractor_variables, put_batch(clips))
        b = len(rows) - pad
        feats = update_bank(feats, jnp.asarray(rows[:b], jnp.int32),
                            values[:b])
    bank = FeatureBank(features=feats, first_rows=bank.first_rows)
    if path and jax.process_index() == 0:
        # multi-controller: one writer for the (replicated) bank cache
        save_bank(path, bank)
    return bank


def framewise_transform_for_video_build(ds):
    """Validate + return the dataset's transform for a video-engine bank
    build (shared with the distributed builder in eval/distributed.py)."""
    if not hasattr(ds, "manifest"):
        raise ValueError("engine='video' needs a frame-manifest dataset")
    tf = ds.transform
    # getattr default None: an unknown transform (e.g. a random
    # TrainTransform, which has no crop_type) must be rejected loudly —
    # per-video vs per-clip randomness would silently diverge the banks
    if tf is not None and getattr(tf, "crop_type", None) not in (1, 2, 3):
        raise ValueError(
            "engine='video' needs a deterministic frame-wise transform "
            f"(EvalTransform crop types 1/2/3); got {type(tf).__name__}")
    return tf


def load_video_frames(ds, video) -> np.ndarray:
    """One video's raw uint8 frames (N, H, W, 3) via the dataset's loader.

    Same decode-failure policy as ClipDataset.get_clip: zero-fill under
    error_policy='zeros' so one corrupt frame doesn't abort a multi-hour
    build the clip engine would survive."""
    out = []
    for p in video.frame_paths:
        try:
            out.append(ds.frame_loader(p))
        except Exception:
            if getattr(ds, "error_policy", "raise") != "zeros":
                raise
            out.append(None)
    shape = next((f.shape for f in out if f is not None), None)
    if shape is None:
        raise ValueError(f"video {video.video_id}: every frame failed "
                         f"to decode")
    return np.stack([f if f is not None
                     else np.zeros(shape, np.uint8) for f in out])


def _build_lfb_video(cfg: ExperimentConfig, extractor_variables, ds,
                     path: Optional[str], mesh=None) -> FeatureBank:
    """Video-engine LFB build: backbone once per unique frame, sliding LSTM
    windows -> one bank row per clip position (seq_len x less backbone work
    than the clip-wise build at identical features)."""
    from tmrnet_tpu.eval.infer import VideoInference

    tf = framewise_transform_for_video_build(ds)

    eng = VideoInference(cfg, extractor_variables, extractor_variables,
                         mesh=mesh)
    lengths = ds.manifest.video_lengths
    bank = FeatureBank.create(ds.seq_len, lengths, cfg.model.hidden_dim)
    feats = bank.features
    if mesh is not None:
        from tmrnet_tpu.parallel.mesh import replicated_sharding

        feats = jax.device_put(feats, replicated_sharding(mesh))
    row = 0
    for video in ds.manifest.videos:
        frames = load_video_frames(ds, video)
        if tf is not None:
            frames = tf(frames)
        vals = eng.bank_features(frames)            # (clips, hidden), device
        k = vals.shape[0]
        if k:
            feats = update_bank(
                feats, jnp.arange(row, row + k, dtype=jnp.int32), vals)
        row += k
    bank = FeatureBank(features=feats, first_rows=bank.first_rows)
    if path and jax.process_index() == 0:
        # multi-controller: one writer for the (replicated) bank cache
        save_bank(path, bank)
    return bank


def train_stage2(cfg: ExperimentConfig, train_ds: ClipDataset,
                 bank: FeatureBank, val_ds: Optional[ClipDataset] = None,
                 val_bank: Optional[FeatureBank] = None, init_variables=None,
                 mesh=None, log: Optional[MetricLogger] = None):
    """TMRNet (or only-non-local) head training over a built LFB.

    NOTE: like the reference, train and val use their own banks; pass val_bank
    when val_ds is given (defaults to `bank` if the datasets share rows)."""
    if val_ds is not None and val_bank is None:
        val_bank = bank
    head = cfg.model.head if cfg.model.head in ("tmr", "nl_only") else "tmr"
    model = build_model(dataclasses.replace(cfg.model, head=head,
                                            remat=cfg.train.remat))
    return _fit(cfg, model, train_ds, val_ds, use_memory=True, bank=bank,
                slow_modules=slow_modules_for_head(head),
                init_variables=init_variables, mesh=mesh, log=log,
                val_bank=val_bank)
