"""Host input pipeline: clip assembly, augmentation, threaded prefetch.

Replaces the reference's DataLoader + SeqSampler machinery (flat frame indices
re-expanded per epoch, `train_singlenet_phase_1fc.py:520-534`) with a
clip-centric loader: the unit of work is a clip row (one LFB position), whose
frames are loaded, transformed with one shared per-clip random draw, and
batched to (B, T, H, W, 3) float32 ready for a single host->device transfer.
A thread pool decodes/transforms ahead of the accelerator (double buffering);
decode failures follow a configurable policy (zeros like the reference's
fallback at `test-resnet.py:170-174`, or raise).
"""

from __future__ import annotations

import dataclasses
import queue
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from tmrnet_tpu.data.indexing import (
    clips_per_video,
    video_first_rows,
)
from tmrnet_tpu.data.manifests import Manifest


def load_frame(path: str) -> np.ndarray:
    """Decode one image file to RGB uint8 (cv2, C++ decode path)."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise IOError(f"failed to decode {path}")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


@dataclasses.dataclass
class ClipDataset:
    """Clip-level view over a Manifest: row r -> (frames, last-frame label).

    frame_loader maps a frame path to an HxWx3 uint8 array; inject an
    in-memory loader for tests or a native decoder for production.
    """

    manifest: Manifest
    seq_len: int
    transform: Optional[Callable] = None  # (clip, epoch, clip_id) -> array
    frame_loader: Callable[[str], np.ndarray] = load_frame
    error_policy: str = "zeros"  # 'zeros' | 'raise'

    def __post_init__(self):
        lengths = self.manifest.video_lengths
        self._cpv = clips_per_video(self.seq_len, lengths)
        self._first_rows = video_first_rows(self.seq_len, lengths)
        self._row_video = np.repeat(np.arange(len(lengths)), self._cpv)
        self._row_offset = np.concatenate(
            [np.arange(c) for c in self._cpv]) if len(lengths) else np.zeros(0, int)

    @property
    def num_clips(self) -> int:
        return int(self._cpv.sum())

    @property
    def first_rows(self) -> np.ndarray:
        """Per-row first row of its video (for clamped memory gathers)."""
        return np.repeat(self._first_rows, self._cpv)

    def clip_location(self, row: int) -> Tuple[int, int]:
        """row -> (video index, start frame within video)."""
        return int(self._row_video[row]), int(self._row_offset[row])

    def get_clip(self, row: int, epoch: int = 0) -> Tuple[np.ndarray, int]:
        vid_i, start = self.clip_location(row)
        video = self.manifest.videos[vid_i]
        frames: List[Optional[np.ndarray]] = []
        for j in range(start, start + self.seq_len):
            try:
                frames.append(self.frame_loader(video.frame_paths[j]))
            except Exception:
                if self.error_policy == "raise":
                    raise
                frames.append(None)  # filled with zeros once a shape is known
        shape = next((f.shape for f in frames if f is not None), (256, 256, 3))
        clip = np.stack([f if f is not None else np.zeros(shape, np.uint8)
                         for f in frames])
        if self.transform is not None:
            clip = self.transform(clip, epoch, row)
        label = int(video.labels[start + self.seq_len - 1])
        return clip, label


class ClipLoader:
    """Threaded, prefetching batch iterator over clip rows.

    Yields (clips (B,T,H,W,C) float32, labels (B,), rows (B,)). The final
    partial batch is padded by repeating its last clip with pad_count reported,
    keeping shapes static for XLA (`drop_remainder=False` semantics without
    recompilation)."""

    def __init__(self, dataset: ClipDataset, batch_clips: int,
                 shuffle: bool = False, num_workers: int = 8,
                 prefetch: int = 2, seed: int = 0, drop_remainder: bool = False):
        self.ds = dataset
        self.batch = batch_clips
        self.shuffle = shuffle
        self.workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.seed = seed
        self.drop_remainder = drop_remainder

    def __len__(self) -> int:
        n = self.ds.num_clips
        return n // self.batch if self.drop_remainder else -(-n // self.batch)

    def epoch(self, epoch: int = 0) -> Iterator[Tuple[np.ndarray, np.ndarray,
                                                      np.ndarray, int]]:
        rows = np.arange(self.ds.num_clips)
        if self.shuffle:
            np.random.Generator(
                np.random.Philox(key=np.uint64(self.seed),
                                 counter=[np.uint64(epoch), 0, 0, 0])
            ).shuffle(rows)
        if self.drop_remainder:
            rows = rows[: len(rows) - len(rows) % self.batch]

        def make_batch(batch_rows: np.ndarray):
            pad = self.batch - len(batch_rows)
            padded = np.concatenate([batch_rows,
                                     np.repeat(batch_rows[-1:], pad)])
            clips, labels = zip(*(self.ds.get_clip(int(r), epoch)
                                  for r in padded))
            labels = np.asarray(labels, np.int64)
            if pad:
                # padded rows repeat the last clip; label -1 marks them so the
                # loss/metrics mask them out (weighted_cross_entropy ignores
                # negative labels)
                labels[len(batch_rows):] = -1
            return np.stack(clips).astype(np.float32), labels, padded, pad

        batches = [rows[i:i + self.batch]
                   for i in range(0, len(rows), self.batch)]
        if not batches:
            return
        with ThreadPoolExecutor(self.workers) as pool:
            futs = queue.Queue()
            it = iter(batches)
            for _ in range(self.prefetch):
                b = next(it, None)
                if b is not None:
                    futs.put(pool.submit(make_batch, b))
            while not futs.empty():
                yield futs.get().result()
                b = next(it, None)
                if b is not None:
                    futs.put(pool.submit(make_batch, b))


@dataclasses.dataclass
class VideoClipDataset:
    """ClipDataset-compatible view over raw video files (the fork's
    video-direct path, reference HystDataset `test-resnet.py:139-203`):
    decodes seq_len-frame clips on demand through a VideoClipReader and pairs
    them with per-video sampled-frame labels."""

    reader: "object"  # tmrnet_tpu.data.video.VideoClipReader
    labels: Sequence[np.ndarray]  # per-video labels at sampled-frame rate
    transform: Optional[Callable] = None

    def __post_init__(self):
        nf = self.reader.num_frames
        if len(self.labels) != len(nf):
            raise ValueError("labels must have one array per video")
        for lab, n in zip(self.labels, nf):
            if len(lab) < n:
                raise ValueError("label array shorter than sampled frames")
        cpv = np.maximum(np.asarray(nf) + 1 - self.reader.seq_len, 0)
        self._first_rows = np.repeat(
            np.concatenate([[0], np.cumsum(cpv)[:-1]]).astype(np.int64), cpv)

    @property
    def seq_len(self) -> int:
        return self.reader.seq_len

    @property
    def num_clips(self) -> int:
        return self.reader.num_clips

    @property
    def first_rows(self) -> np.ndarray:
        return self._first_rows

    def clip_location(self, row: int) -> Tuple[int, int]:
        return self.reader.locate(row)

    def get_clip(self, row: int, epoch: int = 0) -> Tuple[np.ndarray, int]:
        vid, start = self.reader.locate(row)
        clip = self.reader.read_clip(row)
        if self.transform is not None:
            clip = self.transform(clip, epoch, row)
        label = int(self.labels[vid][start + self.reader.seq_len - 1])
        return clip, label


def array_frame_loader(frames_by_path):
    """In-memory loader for tests: dict path -> uint8 array."""

    def load(path: str) -> np.ndarray:
        return frames_by_path[path]

    return load
