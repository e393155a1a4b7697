"""Video decode + offline preprocessing (the reference's L0 layer).

`extract_frames` mirrors `code/video2frame_cutmargin.py`: decode a video
(imageio-ffmpeg / pyav, both C libraries), keep every `stride`-th frame
(25 -> 1 fps), cut black margins, resize to 250x250, write PNGs + a manifest.
`VideoClipReader` is the video-direct dataset path (reference HystDataset,
`Training TMRNet/test-resnet.py:139-203`): global clip index -> (video, start
frame) via cumulative frame counts, with a zeros fallback on decode errors —
without the reference's use-before-assign bug (SURVEY.md 2.9-3).

Decode backends: imageio/pyav when installed, otherwise cv2's bundled ffmpeg
— both C decode paths; every entry point works with either.
"""

from __future__ import annotations

import os
from typing import Callable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from tmrnet_tpu.data.cutmargin import cut_black_margin, resize_square


def _iter_frames_imageio(path: str) -> Iterator[np.ndarray]:
    import imageio.v3 as iio

    for frame in iio.imiter(path, plugin="pyav"):
        yield np.asarray(frame)


def _iter_frames_cv2(path: str) -> Iterator[np.ndarray]:
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cv2 cannot open {path}")
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            yield cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
    finally:
        cap.release()


def _iter_all_frames(path: str) -> Iterator[np.ndarray]:
    """Decode backend selection: imageio/pyav if installed, else cv2's
    bundled ffmpeg (both are C decode paths)."""
    try:
        yield from _iter_frames_imageio(path)
        return
    except ImportError:
        pass
    yield from _iter_frames_cv2(path)


def probe_num_frames(path: str) -> int:
    try:
        import imageio.v3 as iio

        meta = iio.improps(path, plugin="pyav")
        n = getattr(meta, "n_images", None) or getattr(meta, "shape", (0,))[0]
        return int(n)
    except Exception:
        import cv2

        cap = cv2.VideoCapture(path)
        try:
            return int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        finally:
            cap.release()


def iter_video_frames(path: str, stride: int = 25) -> Iterator[np.ndarray]:
    """Yield every stride-th frame as RGB uint8."""
    for i, frame in enumerate(_iter_all_frames(path)):
        if i % stride == 0:
            yield frame


def extract_frames(
    video_path: str,
    out_dir: str,
    stride: int = 25,
    size: int = 250,
    cut_margin: bool = True,
) -> List[str]:
    """Decode -> 1 fps -> cutmargin -> 250x250 -> PNG files named by source
    frame index (frame<25*k>.png), matching the reference's on-disk layout."""
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    written = []
    for k, frame in enumerate(iter_video_frames(video_path, stride)):
        if cut_margin:
            frame = cut_black_margin(frame)
        frame = resize_square(frame, size)
        out = os.path.join(out_dir, f"frame{stride * k}.png")
        cv2.imwrite(out, cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
        written.append(out)
    return written


class VideoClipReader:
    """Read seq_len-frame clips straight from video files.

    Clip index space matches the frame-dir path: each video of n sampled
    frames contributes n + 1 - seq_len clips; reads decode the exact frame
    range. Decode failures return zeros (reference fallback behavior)."""

    def __init__(self, video_paths: Sequence[str], num_frames: Sequence[int],
                 seq_len: int, stride: int = 25,
                 error_policy: str = "zeros"):
        self.paths = list(video_paths)
        self.num_frames = np.asarray(num_frames, np.int64)
        self.seq_len = seq_len
        self.stride = stride
        self.error_policy = error_policy
        cpv = np.maximum(self.num_frames + 1 - seq_len, 0)
        self._cum = np.concatenate([[0], np.cumsum(cpv)])

    @property
    def num_clips(self) -> int:
        return int(self._cum[-1])

    def locate(self, clip_index: int) -> Tuple[int, int]:
        """global clip index -> (video index, start sampled-frame index)."""
        v = int(np.searchsorted(self._cum, clip_index, side="right") - 1)
        return v, int(clip_index - self._cum[v])

    def read_clip(self, clip_index: int) -> np.ndarray:
        v, start = self.locate(clip_index)
        try:
            frames = []
            want = set(range(start, start + self.seq_len))
            for i, frame in enumerate(_iter_all_frames(self.paths[v])):
                k, r = divmod(i, self.stride)
                if r == 0 and k in want:
                    frames.append(np.asarray(frame))
                if r == 0 and k >= start + self.seq_len:
                    break
            if len(frames) != self.seq_len:
                raise IOError("short read")
            return np.stack(frames)
        except Exception:
            if self.error_policy == "raise":
                raise
            return np.zeros((self.seq_len, 256, 256, 3), np.uint8)
