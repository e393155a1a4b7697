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
    """Decode one image file to RGB uint8 (cv2, C++ decode path).
    '<file>.npy#<idx>' paths read from packed videos instead (data/packed.py:
    memmap slice, no codec) — every CLI surface loads through here, so packed
    manifests work everywhere image trees do."""
    if ".npy#" in path:
        from tmrnet_tpu.data.packed import load_packed_frame

        return load_packed_frame(path)
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
    # LRU cache over RAW decoded frames: consecutive clips overlap in
    # seq_len-1 frames, so without it every frame decodes ~seq_len times.
    # Sized in frames (1024 x 250x250x3 u8 ~ 190 MB). Transforms run after
    # the cache and never mutate their input.
    frame_cache: int = 1024

    def __post_init__(self):
        if self.frame_cache:
            import functools

            self.frame_loader = functools.lru_cache(
                maxsize=self.frame_cache)(self.frame_loader)
        lengths = self.manifest.video_lengths
        self._cpv = clips_per_video(self.seq_len, lengths)
        self._first_rows = video_first_rows(self.seq_len, lengths)
        self._row_video = np.repeat(np.arange(len(lengths)), self._cpv)
        self._row_offset = np.concatenate(
            [np.arange(c) for c in self._cpv]) if len(lengths) else np.zeros(0, int)
        self._clip_labels = None  # lazy (see clip_labels)

    @property
    def num_clips(self) -> int:
        return int(self._cpv.sum())

    @property
    def first_rows(self) -> np.ndarray:
        """Per-row first row of its video (for clamped memory gathers)."""
        return np.repeat(self._first_rows, self._cpv)

    @property
    def clip_labels(self) -> np.ndarray:
        """Per-row last-frame labels from manifest metadata alone (no
        decode) — multi-controller eval reads global labels from here
        while each process's loader assembles only its local clips."""
        if self._clip_labels is None:
            self._clip_labels = np.asarray(
                [int(self.manifest.videos[v].labels[o + self.seq_len - 1])
                 for v, o in zip(self._row_video, self._row_offset)],
                np.int64)
        return self._clip_labels

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


def _assemble_batch(ds, batch_rows: np.ndarray, epoch: int, batch: int,
                    local=None):
    pad = batch - len(batch_rows)
    padded = np.concatenate([batch_rows, np.repeat(batch_rows[-1:], pad)])
    lo, hi = local if local is not None else (0, batch)
    take = padded[lo:hi]
    clips, labels = zip(*(ds.get_clip(int(r), epoch) for r in take))
    labels = np.asarray(labels, np.int64)
    # padded rows repeat the last clip; label -1 marks them so the
    # loss/metrics mask them out (weighted_cross_entropy ignores
    # negative labels)
    labels[np.arange(lo, lo + len(take)) >= len(batch_rows)] = -1
    clips = np.stack(clips)
    if clips.dtype != np.uint8:  # uint8 = device-side normalize path
        clips = clips.astype(np.float32, copy=False)
    return clips, labels, padded, pad


_PROC_DS = None  # per-worker dataset (process mode, set once per child)


def _proc_init(ds):
    global _PROC_DS
    _PROC_DS = ds


def _proc_make_batch(batch_rows, epoch, batch, local=None):
    return _assemble_batch(_PROC_DS, batch_rows, epoch, batch, local)


class ClipLoader:
    """Prefetching batch iterator over clip rows.

    Yields (clips (B,T,H,W,C) float32, labels (B,), rows (B,)). The final
    partial batch is padded by repeating its last clip with pad_count reported,
    keeping shapes static for XLA (`drop_remainder=False` semantics without
    recompilation).

    local_rows=(lo, hi): multi-controller slice — clips/labels cover only
    the [lo, hi) rows of each (padded) global batch while `rows` stays
    global, so each process decodes only what its devices consume
    (parallel/mesh.py::process_local_bounds / global_batch_from_local).

    Two worker modes:
      threads (default) -- cv2 decode and the native C++ preprocess both
          release the GIL, so threads scale on multi-core hosts with near-zero
          IPC cost.
      processes (use_processes=True) -- fully GIL-free, for transform stacks
          with heavy pure-Python work; costs one batch pickle per step
          (fork start method, so in-memory datasets/closures work)."""

    def __init__(self, dataset: ClipDataset, batch_clips: int,
                 shuffle: bool = False, num_workers: int = 8,
                 prefetch: int = 2, seed: int = 0, drop_remainder: bool = False,
                 use_processes: bool = False,
                 local_rows: Optional[Tuple[int, int]] = None):
        self.ds = dataset
        self.batch = batch_clips
        self.shuffle = shuffle
        self.workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.seed = seed
        self.drop_remainder = drop_remainder
        self.use_processes = use_processes
        self.local_rows = local_rows

    def __len__(self) -> int:
        n = self.ds.num_clips
        return n // self.batch if self.drop_remainder else -(-n // self.batch)

    def _pool(self):
        if self.use_processes:
            import multiprocessing
            from concurrent.futures import ProcessPoolExecutor

            return ProcessPoolExecutor(
                self.workers, mp_context=multiprocessing.get_context("fork"),
                initializer=_proc_init, initargs=(self.ds,))
        return ThreadPoolExecutor(self.workers)

    def epoch(self, epoch: int = 0) -> Iterator[Tuple[np.ndarray, np.ndarray,
                                                      np.ndarray, int]]:
        rows = np.arange(self.ds.num_clips)
        if self.shuffle:
            # epoch in the HIGH counter word: low-word seeding makes
            # successive epochs' shuffle streams overlap (see clip_rng)
            np.random.Generator(
                np.random.Philox(key=np.uint64(self.seed),
                                 counter=[0, 0, 0, np.uint64(epoch)])
            ).shuffle(rows)
        if self.drop_remainder:
            rows = rows[: len(rows) - len(rows) % self.batch]

        if self.use_processes:
            def submit(pool, b):
                return pool.submit(_proc_make_batch, b, epoch, self.batch,
                                   self.local_rows)
        else:
            def submit(pool, b):
                return pool.submit(_assemble_batch, self.ds, b, epoch,
                                   self.batch, self.local_rows)

        batches = [rows[i:i + self.batch]
                   for i in range(0, len(rows), self.batch)]
        if not batches:
            return
        with self._pool() as pool:
            futs = queue.Queue()
            it = iter(batches)
            for _ in range(self.prefetch):
                b = next(it, None)
                if b is not None:
                    futs.put(submit(pool, b))
            while not futs.empty():
                yield futs.get().result()
                b = next(it, None)
                if b is not None:
                    futs.put(submit(pool, b))


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
        # single source of truth for the clip-count algebra (review r3):
        # the reader's _cum already encodes clips_per_video's cumsum
        cpv = np.diff(self.reader._cum)
        firsts = self.reader._cum[:-1].astype(np.int64)
        self._first_rows = np.repeat(firsts, cpv)

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

    @property
    def manifest(self) -> "_VideoManifestView":
        """Manifest-shaped view (video_lengths / flat_labels) so the trainers'
        class weighting and memory-window machinery work unchanged on the
        video-direct path."""
        return _VideoManifestView(self)


@dataclasses.dataclass
class _VideoManifestView:
    ds: VideoClipDataset

    @property
    def video_lengths(self):
        return [int(n) for n in self.ds.reader.num_frames]

    def flat_labels(self) -> np.ndarray:
        return np.concatenate([
            np.asarray(lab[:n], np.int64)
            for lab, n in zip(self.ds.labels, self.ds.reader.num_frames)
        ]) if len(self.ds.labels) else np.zeros(0, np.int64)


def array_frame_loader(frames_by_path):
    """In-memory loader for tests: dict path -> uint8 array."""

    def load(path: str) -> np.ndarray:
        return frames_by_path[path]

    return load
