"""Video-direct dataset path + fork-style transforms."""

import numpy as np
import pytest

from tmrnet_tpu.data.pipeline import ClipLoader, VideoClipDataset
from tmrnet_tpu.data.transforms import (
    VideoEvalTransform,
    VideoTrainTransform,
    clip_rng,
    pad_or_crop,
    random_resized_crop,
)
from tmrnet_tpu.data.video import VideoClipReader


class FakeReader(VideoClipReader):
    """VideoClipReader with decode stubbed to synthetic frames."""

    def __init__(self, num_frames, seq_len, fail_videos=()):
        super().__init__([f"v{i}.mp4" for i in range(len(num_frames))],
                         num_frames, seq_len)
        self.fail_videos = set(fail_videos)

    def read_clip(self, clip_index):
        v, start = self.locate(clip_index)
        if v in self.fail_videos:
            return np.zeros((self.seq_len, 32, 32, 3), np.uint8)
        clip = np.full((self.seq_len, 32, 32, 3), v * 50 + 10, np.uint8)
        clip[:, 0, 0, 0] = np.arange(start, start + self.seq_len) % 256
        return clip


def test_video_clip_reader_locate():
    r = FakeReader([20, 15], seq_len=4)
    assert r.num_clips == 17 + 12
    assert r.locate(0) == (0, 0)
    assert r.locate(16) == (0, 16)
    assert r.locate(17) == (1, 0)
    assert r.locate(28) == (1, 11)


def test_video_clip_dataset_labels_and_loader():
    lengths = [20, 15]
    labels = [np.arange(20) % 7, (np.arange(15) + 3) % 7]
    ds = VideoClipDataset(FakeReader(lengths, 4), labels,
                          transform=VideoEvalTransform(crop_size=24))
    clip, label = ds.get_clip(0)
    assert clip.shape == (4, 24, 24, 3)
    assert label == 3 % 7  # last frame of frames 0..3 of video 0
    clip, label = ds.get_clip(17)
    assert label == (3 + 3) % 7  # video 1, frames 0..3 -> label[3]
    np.testing.assert_array_equal(ds.first_rows[:17], 0)
    np.testing.assert_array_equal(ds.first_rows[17:], 17)

    loader = ClipLoader(ds, batch_clips=8, num_workers=2)
    batches = list(loader.epoch(0))
    assert sum(len(b[2]) - b[3] for b in batches) == ds.num_clips


def test_random_resized_crop_shared_across_clip():
    rng_img = np.random.RandomState(0)
    frame = rng_img.randint(0, 255, (1, 64, 64, 3), dtype=np.uint8)
    clip = np.tile(frame, (6, 1, 1, 1))
    out = random_resized_crop(clip, 32, clip_rng(0, 1))
    assert out.shape == (6, 32, 32, 3)
    for i in range(1, 6):
        np.testing.assert_array_equal(out[0], out[i])


def test_pad_or_crop():
    clip = np.ones((2, 10, 30, 3), np.uint8) * 7
    out = pad_or_crop(clip, 20)
    assert out.shape == (2, 20, 20, 3)
    # vertical padding, horizontal cropping
    assert out[:, :5].sum() == 0 and out[:, -5:].sum() == 0
    assert (out[:, 5:15] == 7).all()


def test_video_train_transform_range():
    clip = np.random.RandomState(1).randint(0, 255, (3, 64, 64, 3), dtype=np.uint8)
    out = VideoTrainTransform(crop_size=32)(clip, 0, 0)
    assert out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0
