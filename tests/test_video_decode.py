"""Real video-decode integration: synthesize an mp4 (cv2's bundled ffmpeg),
then exercise extract_frames, VideoClipReader, and the prepare CLI on it."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tmrnet_tpu.data.video import (
    VideoClipReader,
    extract_frames,
    iter_video_frames,
    probe_num_frames,
)


@pytest.fixture(scope="module")
def synthetic_video(tmp_path_factory):
    """75-frame 64x64 mp4 whose frame index is encoded in mean brightness."""
    d = tmp_path_factory.mktemp("vids")
    path = str(d / "video01.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25, (64, 64))
    assert w.isOpened()
    for i in range(75):
        frame = np.full((64, 64, 3), 30 + 2 * i, np.uint8)
        w.write(frame)
    w.release()
    return path


def test_iter_and_probe(synthetic_video):
    n = probe_num_frames(synthetic_video)
    assert n == 75
    frames = list(iter_video_frames(synthetic_video, stride=25))
    assert len(frames) == 3  # frames 0, 25, 50
    # brightness encodes frame index (lossy codec -> generous tolerance)
    means = [f.mean() for f in frames]
    assert means[0] < means[1] < means[2]


def test_extract_frames_writes_pngs(synthetic_video, tmp_path):
    out = str(tmp_path / "frames")
    written = extract_frames(synthetic_video, out, stride=25, size=32,
                             cut_margin=False)
    assert len(written) == 3
    assert all(os.path.exists(p) for p in written)
    assert os.path.basename(written[1]) == "frame25.png"
    img = cv2.imread(written[0])
    assert img.shape == (32, 32, 3)


def test_video_clip_reader_real_decode(synthetic_video):
    reader = VideoClipReader([synthetic_video], num_frames=[3], seq_len=2,
                             stride=25, error_policy="raise")
    assert reader.num_clips == 2
    clip = reader.read_clip(0)  # sampled frames 0 and 25
    assert clip.shape == (2, 64, 64, 3)
    assert clip[0].mean() < clip[1].mean()
    clip2 = reader.read_clip(1)  # sampled frames 25 and 50
    assert clip2[0].mean() < clip2[1].mean()
    # zeros policy on a missing file
    bad = VideoClipReader(["/nonexistent.mp4"], [3], 2, error_policy="zeros")
    assert bad.read_clip(0).sum() == 0
