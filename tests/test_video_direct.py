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


def _write_mp4_tree(tmp_path, n_videos=2, seconds=12, fps=25, hw=64):
    """Synthetic videos + matching phase annotations at source fps."""
    import cv2

    from tmrnet_tpu.config import CHOLEC80_PHASES

    vdir = tmp_path / "videos"
    ann = tmp_path / "ann"
    vdir.mkdir(exist_ok=True)
    ann.mkdir(exist_ok=True)
    rng = np.random.RandomState(0)
    for v in range(1, n_videos + 1):
        path = str(vdir / f"video{v:02d}.mp4")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                            (hw, hw))
        for k in range(seconds * fps):
            w.write(rng.randint(0, 255, (hw, hw, 3), dtype=np.uint8))
        w.release()
        with open(ann / f"video{v:02d}-phase.txt", "w") as f:
            f.write("Frame\tPhase\n")
            for k in range(seconds * fps):
                f.write(f"{k}\t{CHOLEC80_PHASES[(k // 100) % 7]}\n")
    return str(vdir), str(ann)


def test_video_dataset_label_frame_alignment(tmp_path, capsys):
    """_video_dataset must keep labels aligned with VideoClipReader's
    CONTIGUOUS sampled-frame walk: a video whose annotations start late is
    skipped (frame 0 has no label), and an annotation gap truncates the video
    at the gap rather than silently shifting every later label."""
    import dataclasses as dc

    from tmrnet_tpu.cli import _video_dataset
    from tmrnet_tpu.config import CHOLEC80_PHASES, ExperimentConfig

    videos, _ = _write_mp4_tree(tmp_path, n_videos=2, seconds=12)
    ann = tmp_path / "ann2"
    ann.mkdir()
    # video01: annotations only from frame 250 on -> sampled frame 0
    # (source frame 0) unlabeled -> video skipped
    with open(ann / "video01-phase.txt", "w") as f:
        f.write("Frame\tPhase\n")
        for k in range(250, 300):
            f.write(f"{k}\t{CHOLEC80_PHASES[0]}\n")
    # video02: annotated up to source frame 199 -> sampled frames 0..7 keep
    # labels (stride 25); the 12s/300-frame video truncates to 8 samples
    with open(ann / "video02-phase.txt", "w") as f:
        f.write("Frame\tPhase\n")
        for k in range(200):
            f.write(f"{k}\t{CHOLEC80_PHASES[(k // 25) % 7]}\n")

    cfg = ExperimentConfig()
    cfg = dc.replace(cfg, data=dc.replace(cfg.data, sequence_length=3))
    ds = _video_dataset(cfg, videos, str(ann), train=False)
    err = capsys.readouterr().err
    assert "video01" in err and "skipping" in err
    assert "video02" in err and "truncating" in err

    assert len(ds.labels) == 1
    assert list(ds.reader.num_frames) == [8]
    # label j IS the annotation at source frame j*25: ((25j)//25) % 7 = j % 7
    np.testing.assert_array_equal(ds.labels[0], np.arange(8) % 7)


def test_cli_video_direct_two_stage_training(tmp_path, capsys):
    """The fork's video-direct direction through the CLI (r1 verdict item 8):
    train-bank, build-lfb, and train-tmr all run one epoch straight from two
    synthetic mp4s, no frames on disk."""
    from tmrnet_tpu.cli import main

    videos, ann = _write_mp4_tree(tmp_path)
    common = ["--set", "model.backbone=tiny", "--set", "model.stage_sizes=1,1",
              "--set", "model.width=8", "--set", "model.hidden_dim=16",
              "--set", "data.sequence_length=3", "--set", "data.crop_size=32",
              "--set", "data.batch_clips=8", "--set", "data.num_workers=2",
              "--set", "memory.window=4",
              "--set", "train.epochs=1"]
    rc = main(["train-bank", "--videos", videos, "--annotations", ann,
               "--val-videos", videos,
               "--log-dir", str(tmp_path / "runs"),
               "--set", f"train.checkpoint_dir={tmp_path / 'ck1'}"] + common)
    assert rc == 0
    out = capsys.readouterr().out
    assert "best epoch" in out

    lfb = str(tmp_path / "lfb.npz")
    rc = main(["build-lfb", "--videos", videos, "--annotations", ann,
               "--out", lfb] + common)
    assert rc == 0
    capsys.readouterr()

    rc = main(["train-tmr", "--videos", videos, "--annotations", ann,
               "--lfb", lfb, "--log-dir", str(tmp_path / "runs2"),
               "--set", f"train.checkpoint_dir={tmp_path / 'ck2'}"] + common)
    assert rc == 0
    assert "best epoch" in capsys.readouterr().out
