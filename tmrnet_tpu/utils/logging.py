"""Observability: structured metric logging + timers.

Covers the reference's tracking spread (printed epoch summaries, Comet ML
metric streaming, TensorBoard scalars — SURVEY.md 2.7/5) with one logger:
stdout lines, a JSONL metrics file, and optional TensorBoard scalars when the
package is available. No API keys in source (the reference committed one —
SURVEY.md 2.9-9).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, log_dir: Optional[str] = None, use_tensorboard: bool = True,
                 quiet: bool = False):
        if log_dir:
            import jax

            if jax.process_count() > 1 and jax.process_index() != 0:
                # multi-controller runs compute identical stats on every
                # process; process 0 is the single file writer (concurrent
                # appends to one metrics.jsonl / TB event dir on a shared
                # filesystem interleave). Callers must initialize the
                # distributed runtime BEFORE constructing the logger —
                # the CLI builds its mesh first for exactly this reason.
                log_dir = None
        self.log_dir = log_dir
        self.quiet = quiet
        self._jsonl = None
        self._tb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
            if use_tensorboard:
                try:
                    from torch.utils.tensorboard import SummaryWriter

                    self._tb = SummaryWriter(log_dir)
                except Exception:
                    self._tb = None

    def log(self, step: int, metrics: Dict[str, float], prefix: str = "") -> None:
        flat = {f"{prefix}{k}": float(v) for k, v in metrics.items()}
        if not self.quiet:
            body = " ".join(f"{k}={v:.6g}" for k, v in flat.items())
            print(f"[step {step}] {body}", flush=True)
        if self._jsonl:
            self._jsonl.write(json.dumps({"step": step, **flat}) + "\n")
            self._jsonl.flush()
        if self._tb:
            for k, v in flat.items():
                self._tb.add_scalar(k, v, step)

    def log_images(self, step: int, tag: str, images) -> None:
        """Log sample frames (e.g. augmented clips) to TensorBoard AND as a
        PNG strip under <log_dir>/images/, covering the reference's Comet
        log_image debugging (`test-resnet.py:737-746`). images: (N, H, W, 3)
        uint8, float in [0,1], or normalized float (min-max rescaled for
        viewing). No-op without a log_dir."""
        if self.log_dir is None:
            return
        import numpy as np

        arr = np.asarray(images, dtype=None)
        if arr.dtype != np.uint8:
            arr = arr.astype(np.float32)
            lo, hi = float(arr.min()), float(arr.max())
            if lo < 0.0 or hi > 1.0:  # normalized input: rescale for viewing
                arr = (arr - lo) / max(hi - lo, 1e-9)
            arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
        if self._tb is not None:
            self._tb.add_images(tag, arr, step, dataformats="NHWC")
        try:
            from PIL import Image

            img_dir = os.path.join(self.log_dir, "images")
            os.makedirs(img_dir, exist_ok=True)
            strip = arr.transpose(1, 0, 2, 3).reshape(
                arr.shape[1], arr.shape[0] * arr.shape[2], arr.shape[3])
            safe = tag.replace("/", "_")
            Image.fromarray(strip).save(
                os.path.join(img_dir, f"{safe}_{step:08d}.png"))
        except Exception:
            pass  # image dump is best-effort observability

    def log_confusion_matrix(self, step: int, labels, preds,
                             num_classes: int, tag: str = "confusion") -> None:
        """Row-normalized confusion matrix to JSONL (+ TensorBoard image),
        covering the reference's Comet log_confusion_matrix
        (`train_memorybank.py:357-358`). labels/preds: int arrays."""
        import numpy as np

        labels = np.asarray(labels).ravel()
        preds = np.asarray(preds).ravel()
        # drop out-of-range pairs (e.g. -1 padding sentinels) instead of
        # letting negative indices wrap into the matrix; a logger should
        # stay best-effort rather than crash a long run mid-epoch
        ok = ((labels >= 0) & (labels < num_classes)
              & (preds >= 0) & (preds < num_classes))
        cm = np.zeros((num_classes, num_classes), np.int64)
        np.add.at(cm, (labels[ok], preds[ok]), 1)
        if self._jsonl:
            self._jsonl.write(json.dumps(
                {"step": step, tag: cm.tolist()}) + "\n")
            self._jsonl.flush()
        # render through log_images: TB when available AND a PNG dump, the
        # counterpart of the reference's Comet confusion-matrix images
        row = cm.astype(np.float64)
        row /= np.maximum(row.sum(axis=1, keepdims=True), 1)
        img = (row * 255).astype("uint8")[..., None].repeat(3, axis=-1)
        # upscale 16x so the PNG is inspectable (num_classes is tiny)
        img = img.repeat(16, axis=0).repeat(16, axis=1)
        self.log_images(step, tag, img[None])

    def close(self) -> None:
        if self._jsonl:
            self._jsonl.close()
        if self._tb:
            self._tb.close()


class Timer:
    """Wall-clock section timer with frames/sec accounting (the rebuild's
    replacement for the reference's ad-hoc time.time() deltas)."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.frames = 0

    def add_frames(self, n: int) -> None:
        self.frames += n

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self.t0

    @property
    def fps(self) -> float:
        return self.frames / max(self.elapsed, 1e-9)


def trace_annotation(name: str):
    """jax.profiler annotation context (no-op if profiler unavailable)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
