"""Tests for cutmargin, clip-deterministic transforms, pipeline, stats."""

import numpy as np
import pytest

from tmrnet_tpu.data.cutmargin import cut_black_margin, margin_bbox, resize_square
from tmrnet_tpu.data.manifests import Manifest, VideoRecord
from tmrnet_tpu.data.pipeline import ClipDataset, ClipLoader, array_frame_loader
from tmrnet_tpu.data.stats import channel_stats
from tmrnet_tpu.data.transforms import (
    EvalTransform,
    TrainTransform,
    center_crop,
    clip_rng,
    color_jitter,
    normalize,
    random_crop,
    random_horizontal_flip,
)


def test_cutmargin_finds_content_box():
    img = np.zeros((200, 300, 3), np.uint8)
    img[40:160, 60:240] = 200  # bright content block
    out = cut_black_margin(img)
    assert out.shape[0] <= 130 and out.shape[1] <= 190  # margins removed
    assert out.mean() > 100  # mostly content


def test_cutmargin_all_black_returns_input():
    img = np.zeros((100, 100, 3), np.uint8)
    out = cut_black_margin(img)
    assert out.shape == img.shape


def test_resize_square():
    img = np.random.RandomState(0).randint(0, 255, (123, 456, 3), dtype=np.uint8)
    assert resize_square(img, 250).shape == (250, 250, 3)


def test_clip_transforms_same_aug_across_frames():
    rng = np.random.RandomState(0)
    # frames identical except a marker; crop/flip must be identical per frame
    clip = np.tile(rng.randint(0, 255, (1, 250, 250, 3), dtype=np.uint8), (10, 1, 1, 1))
    tf = TrainTransform(use_flip=True)
    out = tf(clip, epoch=0, clip_id=5)
    assert out.shape == (10, 224, 224, 3)
    for i in range(1, 10):
        np.testing.assert_array_equal(out[0], out[i])


def test_clip_transforms_deterministic_and_vary_by_clip():
    clip = np.random.RandomState(1).randint(0, 255, (4, 250, 250, 3), dtype=np.uint8)
    tf = TrainTransform(use_flip=True)
    a = tf(clip, epoch=3, clip_id=7)
    b = tf(clip, epoch=3, clip_id=7)
    np.testing.assert_array_equal(a, b)  # reproducible
    c = tf(clip, epoch=3, clip_id=8)
    assert not np.array_equal(a, c)  # different clip -> different aug
    d = tf(clip, epoch=4, clip_id=7)
    assert not np.array_equal(a, d)  # different epoch -> different aug


def test_jitter_hue_default_is_reference_half_range():
    """Every reference driver hard-codes ColorJitter(..., hue=0.05) next to
    the 0.1 brightness/contrast/saturation ranges (`train_memorybank.py:86`)
    — the hue knob must not silently inherit the 0.1 range."""
    import inspect

    from tmrnet_tpu.config import DataConfig
    from tmrnet_tpu.data.transforms import color_jitter

    assert TrainTransform().hue == 0.05
    assert DataConfig().color_jitter_hue == 0.05
    assert inspect.signature(color_jitter).parameters["hue"].default == 0.05


def test_flip_runs_in_both_train_stacks():
    """The reference's --flip flag gates ColorJitter+Rotation only —
    RandomHorizontalFlip appears in BOTH stacks (`train_memorybank.py:74-90`
    and identically in all four training drivers). use_flip=False must
    therefore be Resize -> RandomCrop -> Flip -> Normalize, not crop-only."""
    from tmrnet_tpu.data.transforms import (
        clip_rng, random_crop, random_horizontal_flip, resize_clip, normalize)

    clip = np.random.RandomState(7).randint(
        0, 255, (3, 250, 250, 3), dtype=np.uint8)
    tf = TrainTransform(use_flip=False)
    got = tf(clip, epoch=1, clip_id=4)

    rng = clip_rng(1, 4, tf.base_seed)
    want = resize_clip(clip, (tf.resize, tf.resize))
    want = random_crop(want, tf.crop_size, rng)
    want = random_horizontal_flip(want, rng)
    np.testing.assert_array_equal(got, normalize(want, tf.mean, tf.std))

    # and over many clips, some ARE flipped (differ from the crop alone)
    flipped = 0
    for cid in range(16):
        rng = clip_rng(0, cid, tf.base_seed)
        base = random_crop(resize_clip(clip, (250, 250)), 224, rng)
        out = tf(clip, epoch=0, clip_id=cid)
        if not np.array_equal(out, normalize(base, tf.mean, tf.std)):
            flipped += 1
    assert flipped > 0


def test_eval_transform_modes():
    clip = np.random.RandomState(2).randint(0, 255, (2, 250, 250, 3), dtype=np.uint8)
    for ct in (0, 1, 2, 3):
        out = EvalTransform(crop_type=ct)(clip)
        assert out.shape == (2, 224, 224, 3)
    assert EvalTransform(crop_type=5)(clip).shape == (5, 2, 224, 224, 3)
    with pytest.raises(ValueError):
        EvalTransform(crop_type=7)(clip)


def test_eval_crop0_is_per_frame_random():
    """Reference TEST crop 0 is the plain torchvision RandomCrop applied per
    image (`train_memorybank.py:93-98`) — frames of one clip get INDEPENDENT
    offsets, unlike the clip-shared train-stack crop."""
    # identical frames: per-frame offsets on a non-uniform image must differ
    frame = np.arange(250 * 250 * 3, dtype=np.int64).reshape(250, 250, 3)
    clip = np.tile((frame % 255).astype(np.uint8)[None], (6, 1, 1, 1))
    out = EvalTransform(crop_type=0, normalize=False)(clip, epoch=0, clip_id=1)
    assert out.shape == (6, 224, 224, 3)
    assert any(not np.array_equal(out[0], out[i]) for i in range(1, 6))
    # still deterministic per (epoch, clip_id)
    out2 = EvalTransform(crop_type=0, normalize=False)(clip, epoch=0, clip_id=1)
    np.testing.assert_array_equal(out, out2)


def test_eval_transform_resize_only_is_single_interpolation():
    """Reference crop 2 (and the base eval driver's crop 3) is a DIRECT
    Resize((224,224)) with no 250 intermediate (`train_memorybank.py:107-112`)
    — on raw-size frames the result must equal one resize, not two."""
    from tmrnet_tpu.data.transforms import resize_clip

    clip = np.random.RandomState(3).randint(
        0, 255, (2, 480, 640, 3), dtype=np.uint8)
    direct = resize_clip(clip, (224, 224)).astype(np.float32) / 255.0
    for ct in (2, 3):
        out = EvalTransform(crop_type=ct, normalize=False)(clip)
        np.testing.assert_array_equal(out.astype(np.float32) / 255.0, direct)


def test_normalize_matches_torchvision_formula():
    clip = (np.ones((1, 4, 4, 3)) * 128).astype(np.uint8)
    mean, std = (0.4, 0.25, 0.25), (0.2, 0.2, 0.2)
    out = normalize(clip, mean, std)
    want = (128 / 255.0 - np.asarray(mean)) / np.asarray(std)
    np.testing.assert_allclose(out[0, 0, 0], want, rtol=1e-6)


def test_color_jitter_identity_at_zero():
    clip = np.random.RandomState(3).randint(0, 255, (2, 8, 8, 3), dtype=np.uint8)
    out = color_jitter(clip, clip_rng(0, 0), 0.0, 0.0, 0.0, 0.0)
    np.testing.assert_allclose(out.astype(np.int32), clip.astype(np.int32), atol=1)


def _toy_setup(n_videos=2, frames_per_video=20, seq=4, hw=32):
    rng = np.random.RandomState(0)
    store = {}
    videos = []
    for v in range(n_videos):
        paths = [f"v{v}/f{j}" for j in range(frames_per_video)]
        for p in paths:
            store[p] = rng.randint(0, 255, (hw, hw, 3), dtype=np.uint8)
        labels = (np.arange(frames_per_video) // 5) % 7
        videos.append(VideoRecord(f"v{v}", paths, labels.astype(np.int64)))
    m = Manifest(videos)
    ds = ClipDataset(m, seq_len=seq, transform=None,
                     frame_loader=array_frame_loader(store))
    return ds, store


def test_clip_dataset_indexing_and_labels():
    ds, store = _toy_setup()
    assert ds.num_clips == 2 * (20 - 3)
    clip, label = ds.get_clip(0)
    assert clip.shape == (4, 32, 32, 3)
    # label is the LAST frame's label: frames 0..3 -> label of frame 3 = 0
    assert label == 0
    clip, label = ds.get_clip(2)  # frames 2..5 -> label of frame 5 = 1
    assert label == 1
    # second video's first clip maps to video 1, frame 0
    assert ds.clip_location(17) == (1, 0)
    np.testing.assert_array_equal(ds.first_rows[:17], 0)
    np.testing.assert_array_equal(ds.first_rows[17:], 17)


def test_clip_dataset_error_policy():
    ds, store = _toy_setup()
    bad = ClipDataset(ds.manifest, 4, frame_loader=lambda p: (_ for _ in ()).throw(IOError()),
                      error_policy="zeros")
    clip, label = bad.get_clip(0)
    assert clip.sum() == 0
    strict = ClipDataset(ds.manifest, 4, frame_loader=bad.frame_loader,
                         error_policy="raise")
    with pytest.raises(IOError):
        strict.get_clip(0)


def test_clip_loader_batches_and_padding():
    ds, _ = _toy_setup()  # 34 clips
    loader = ClipLoader(ds, batch_clips=8, shuffle=False, num_workers=2)
    batches = list(loader.epoch(0))
    assert len(batches) == 5  # ceil(34/8)
    clips, labels, rows, pad = batches[-1]
    assert clips.shape == (8, 4, 32, 32, 3)
    assert pad == 8 * 5 - 34
    # padded rows repeat the last real row
    assert (rows[-pad:] == rows[8 - pad - 1]).all()
    # all real rows covered exactly once
    seen = np.concatenate([b[2][: 8 - b[3]] for b in batches])
    np.testing.assert_array_equal(np.sort(seen), np.arange(34))


def test_clip_loader_shuffle_deterministic_per_epoch():
    ds, _ = _toy_setup()
    loader = ClipLoader(ds, batch_clips=8, shuffle=True, num_workers=2, seed=1)
    r1 = np.concatenate([b[2] for b in loader.epoch(0)])
    r2 = np.concatenate([b[2] for b in loader.epoch(0)])
    r3 = np.concatenate([b[2] for b in loader.epoch(1)])
    np.testing.assert_array_equal(r1, r2)
    assert not np.array_equal(r1, r3)


def test_channel_stats_reference_procedure():
    """Default mode reproduces meanStd.py's aggregate (`meanStd.py:42-61`):
    mean over images of per-image channel means and per-image channel stds.
    Two constant images (0 and 255) each have std 0, so the reference
    statistic is std=0 — NOT the pooled-population 0.5."""
    frames = [np.full((4, 4, 3), v, np.uint8) for v in (0, 255)]
    mean, std = channel_stats(frames)
    np.testing.assert_allclose(mean, 0.5, atol=1e-6)
    np.testing.assert_allclose(std, 0.0, atol=1e-6)

    # and against an independent transliteration on random images
    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 256, (6, 5, 3), np.uint8) for _ in range(7)]
    mean, std = channel_stats(frames)
    per = np.array([f.reshape(-1, 3) / 255.0 for f in frames])
    np.testing.assert_allclose(mean, per.mean(axis=1).mean(axis=0), atol=1e-6)
    np.testing.assert_allclose(std, per.std(axis=1).mean(axis=0), atol=1e-6)


def test_channel_stats_population():
    frames = [np.full((4, 4, 3), v, np.uint8) for v in (0, 255)]
    mean, std = channel_stats(frames, per_image=False)
    np.testing.assert_allclose(mean, 0.5, atol=1e-6)
    np.testing.assert_allclose(std, 0.5, atol=1e-6)
    # unequal image sizes: pixels pool, images don't count equally
    frames = [np.zeros((2, 2, 3), np.uint8), np.full((4, 4, 3), 255, np.uint8)]
    mean, _ = channel_stats(frames, per_image=False)
    np.testing.assert_allclose(mean, 16 / 20, atol=1e-6)


def test_clip_loader_process_workers_match_threads():
    """use_processes=True (forked, GIL-free) yields byte-identical batches in
    the same order as the thread pool."""
    ds, _ = _toy_setup()
    lt = ClipLoader(ds, batch_clips=8, shuffle=True, num_workers=2, seed=5)
    lp = ClipLoader(ds, batch_clips=8, shuffle=True, num_workers=2, seed=5,
                    use_processes=True)
    for (c1, l1, r1, p1), (c2, l2, r2, p2) in zip(lt.epoch(1), lp.epoch(1)):
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_array_equal(l1, l2)
        np.testing.assert_array_equal(r1, r2)
        assert p1 == p2


def test_cutmargin_matches_reference_change_size_exactly():
    """Run the reference's OWN change_size() (imported from the read-only
    reference tree at test time) as the oracle: cut_black_margin must be
    pixel-identical on content blocks, edge-touching content, hot noise
    pixels in the margin, and all-black frames (reference-exact semantics
    pinned after the r3 review found the column guard band and the
    exclusive max-row/col crop were not replicated)."""
    import importlib.util
    import pathlib

    pytest.importorskip("cv2")
    ref_path = pathlib.Path("/root/reference/code/video2frame_cutmargin.py")
    if not ref_path.exists():
        pytest.skip("reference tree not available")
    spec = importlib.util.spec_from_file_location("_ref_cutmargin", ref_path)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    rng = np.random.RandomState(11)
    cases = []
    # plain content block inside the margin
    img = np.zeros((120, 160, 3), np.uint8)
    img[30:90, 40:130] = rng.randint(60, 255, (60, 90, 3), np.uint8)
    cases.append(img)
    # content reaching the left/right edges (the column-guard divergence)
    img = np.zeros((100, 140, 3), np.uint8)
    img[20:80, 0:140] = rng.randint(60, 255, (60, 140, 3), np.uint8)
    cases.append(img)
    # hot noise pixels in the black margin (median must reject them)
    img = np.zeros((120, 160, 3), np.uint8)
    img[40:80, 50:110] = 200
    img[2, 3] = img[115, 155] = 255
    cases.append(img)
    # all black -> unchanged
    cases.append(np.zeros((80, 80, 3), np.uint8))
    # textured content with ragged boundary
    img = (rng.rand(130, 170, 3) * 255).astype(np.uint8)
    mask = np.zeros((130, 170), bool)
    mask[25:105, 30:150] = True
    img[~mask] = 0
    cases.append(img)

    from tmrnet_tpu.data.cutmargin import cut_black_margin

    for i, rgb in enumerate(cases):
        bgr = rgb[..., ::-1].copy()            # reference expects cv2 BGR
        want = np.asarray(ref.change_size(bgr))[..., ::-1]
        got = cut_black_margin(rgb)
        assert got.shape == want.shape, (i, got.shape, want.shape)
        np.testing.assert_array_equal(got, want, err_msg=f"case {i}")
