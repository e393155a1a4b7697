"""Packed raw-frame storage: one uint8 ``.npy`` per video, zero-decode reads.

The reference stores one image file per frame (PNG trees written by
``code/video2frame_cutmargin.py:55-81``) and pays an image decode per frame
read on every epoch and every eval pass. At 250x250x3 a raw frame is
187.5 KB: a whole Cholec80 video packs into one memmap-able ``.npy`` whose
per-frame read is a page-in plus copy — no codec work, no per-file
open/stat, and the OS page cache holds the hot set across epochs. The
trade is disk (~3x a PNG tree) for host CPU, which is the measured
bottleneck of the disk->logits path (docs/PERFORMANCE.md "End-to-end").

Path convention: ``<file>.npy#<index>``. ``pipeline.load_frame``
dispatches on it, so every surface that reads frames through a manifest
(train, build-lfb, test, stats, stream, serve) accepts packed manifests
unchanged. ``pack_manifest()`` converts a loaded manifest; the CLI front
end is ``python -m tmrnet_tpu pack``.
"""

from __future__ import annotations

import os
import threading
from typing import Callable, Optional, Tuple

import numpy as np

_SEP = ".npy#"

# process-wide memmap handles: one np.load per packed file, shared across
# loader threads (reads of a read-only memmap are thread-safe)
_OPEN: dict = {}
_LOCK = threading.Lock()


def is_packed_path(path: str) -> bool:
    return _SEP in path


def split_packed_path(path: str) -> Tuple[str, int]:
    """'<file>.npy#<idx>' -> (file, idx). Raises ValueError if malformed."""
    file, _, idx = path.rpartition("#")
    if not file.endswith(".npy"):
        raise ValueError(f"not a packed frame path: {path!r}")
    return file, int(idx)


def packed_file_of(path: str) -> Optional[str]:
    """The underlying .npy of a packed path, else None (for existence
    checks: the frame 'path' itself is never a file on disk)."""
    return split_packed_path(path)[0] if is_packed_path(path) else None


def load_packed_frame(path: str) -> np.ndarray:
    """Read one frame from a packed video. Returns an owned uint8 copy
    (safe to cache and to mutate downstream)."""
    file, idx = split_packed_path(path)
    mm = _OPEN.get(file)
    if mm is None:
        with _LOCK:
            mm = _OPEN.get(file)
            if mm is None:
                mm = np.load(file, mmap_mode="r")
                if mm.ndim != 4:
                    raise ValueError(
                        f"{file}: packed video must be (N,H,W,C), "
                        f"got shape {mm.shape}")
                _OPEN[file] = mm
    if not 0 <= idx < len(mm):
        raise IndexError(f"{file}: frame {idx} out of range (N={len(mm)})")
    return np.array(mm[idx])


def pack_video(video, out_dir: str,
               loader: Optional[Callable[[str], np.ndarray]] = None):
    """Pack one VideoRecord's frames into <out_dir>/<video_id>.npy and
    return a new VideoRecord with packed paths (labels shared).

    Frames are written incrementally through an open_memmap, so peak host
    memory is one frame regardless of video length."""
    from tmrnet_tpu.data.manifests import VideoRecord

    if loader is None:
        from tmrnet_tpu.data.pipeline import load_frame as loader
    if not video.frame_paths:
        return VideoRecord(video.video_id, [], video.labels)
    out = os.path.join(out_dir, f"{video.video_id}.npy")
    first = np.asarray(loader(video.frame_paths[0]))
    if first.dtype != np.uint8:
        raise ValueError(f"{video.video_id}: packed frames must be uint8, "
                         f"decoder returned {first.dtype}")
    n = len(video.frame_paths)
    # Stage to .tmp and rename: open_memmap writes the full-size header
    # up front, so a hard kill mid-pack would otherwise leave a VALID-
    # looking .npy whose tail frames are silently zero (the exception
    # handler below only covers in-process failures).
    tmp = out + ".tmp"  # no .npy suffix: pack-dir walkers must skip it
    try:
        mm = np.lib.format.open_memmap(
            tmp, mode="w+", dtype=np.uint8, shape=(n,) + first.shape)
        mm[0] = first
        for j in range(1, n):
            frame = np.asarray(loader(video.frame_paths[j]))
            if frame.shape != first.shape:
                raise ValueError(
                    f"{video.video_id}: frame {j} is {frame.shape}, expected "
                    f"{first.shape} — packed videos need uniform frames "
                    f"(run `prepare` first)")
            mm[j] = frame
        mm.flush()
        del mm
        os.replace(tmp, out)
    except BaseException:
        try:
            os.remove(tmp)  # never leave a half-written pack behind
        except OSError:
            pass
        raise
    return VideoRecord(video.video_id,
                       [f"{out}#{j}" for j in range(n)], video.labels)


def pack_manifest(manifest, out_dir: str, workers: Optional[int] = None,
                  loader: Optional[Callable[[str], np.ndarray]] = None):
    """Pack every video of a Manifest; returns the packed Manifest (same
    video order/ids/labels). Parallel across videos (cv2 decode releases
    the GIL). Duplicate video ids would silently overwrite each other's
    .npy, so they are rejected."""
    from concurrent.futures import ThreadPoolExecutor

    from tmrnet_tpu.data.manifests import Manifest

    ids = [v.video_id for v in manifest.videos]
    if len(set(ids)) != len(ids):
        dup = sorted({i for i in ids if ids.count(i) > 1})
        raise ValueError(f"duplicate video ids {dup}: packed files are "
                         "named <video_id>.npy and would collide")
    os.makedirs(out_dir, exist_ok=True)
    workers = workers or min(8, os.cpu_count() or 1)
    with ThreadPoolExecutor(workers) as pool:
        packed = list(pool.map(
            lambda v: pack_video(v, out_dir, loader), manifest.videos))
    return Manifest(packed)
