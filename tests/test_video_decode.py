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


def test_extract_frames_packed_streams_to_npy(synthetic_video, tmp_path):
    """The streamed pack (fixed-size header rewritten in place) must load
    as a normal .npy holding exactly the frames extract_frames writes."""
    from tmrnet_tpu.data.video import extract_frames_packed

    out = str(tmp_path / "video01.npy")
    n = extract_frames_packed(synthetic_video, out, stride=25, size=32,
                              cut_margin=False)
    assert n == 3
    arr = np.load(out)
    assert arr.shape == (3, 32, 32, 3) and arr.dtype == np.uint8
    # PNG is lossless: the pack must byte-match the PNG-tree frames
    pngs = extract_frames(synthetic_video, str(tmp_path / "frames"),
                          stride=25, size=32, cut_margin=False)
    for k, p in enumerate(pngs):
        ref = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        assert np.array_equal(arr[k], ref)
    assert not os.path.exists(out + ".tmp")  # placeholder cleaned up


def test_extract_frames_packed_empty_video_writes_nothing(tmp_path):
    from tmrnet_tpu.data.video import extract_frames_packed

    # zero-byte file: decode yields no frames (cv2 open fails -> IOError;
    # either zero-frame return or raise must leave no .npy/.tmp behind)
    bad = str(tmp_path / "empty.mp4")
    open(bad, "wb").close()
    out = str(tmp_path / "empty.npy")
    try:
        n = extract_frames_packed(bad, out, stride=25, size=32)
        assert n == 0
    except Exception:
        pass
    assert not os.path.exists(out)
    assert not os.path.exists(out + ".tmp")


def test_npy_uint8_header_matches_numpy_loader():
    """The hand-built fixed-size header must parse identically to numpy's
    own writer for representative shapes (incl. wide leading dims)."""
    import io

    from tmrnet_tpu.data.video import _NPY_HEADER_BYTES, _npy_uint8_header

    rng = np.random.RandomState(0)
    for shape in [(1, 8, 8, 3), (123, 250, 250, 3), (999999, 2, 2, 3)]:
        hdr = _npy_uint8_header(shape)
        assert len(hdr) == _NPY_HEADER_BYTES
        small = (min(shape[0], 4),) + shape[1:]
        data = rng.randint(0, 255, small, dtype=np.uint8)
        buf = io.BytesIO(_npy_uint8_header(small) + data.tobytes())
        out = np.load(buf)
        assert out.shape == small and out.dtype == np.uint8
        assert np.array_equal(out, data)


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


@pytest.fixture(scope="module")
def long_video(tmp_path_factory):
    """300-frame mp4, index in brightness (12 sampled frames at stride 25)."""
    d = tmp_path_factory.mktemp("vids2")
    path = str(d / "video02.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25, (64, 64))
    assert w.isOpened()
    for i in range(300):
        w.write(np.full((64, 64, 3), (i * 7) % 200 + 20, np.uint8))
    w.release()
    return path


def test_reader_sequential_access_decodes_once(long_video, monkeypatch):
    """In-order clip reads must reuse the per-thread cursor + overlap
    buffer: one video open for a whole sequential pass (the old reader
    re-decoded from frame 0 per clip — O(n^2) per epoch), identical
    outputs to fresh per-clip reads."""
    import tmrnet_tpu.data.video as vmod

    fresh = VideoClipReader([long_video], [12], seq_len=4, stride=25)
    want = [fresh.read_clip(i) for i in range(fresh.num_clips)]
    # count opens from a new reader doing the same in-order pass
    opens = {"n": 0}
    orig = vmod._iter_all_frames

    def counting(path):
        opens["n"] += 1
        return orig(path)

    monkeypatch.setattr(vmod, "_iter_all_frames", counting)
    reader = VideoClipReader([long_video], [12], seq_len=4, stride=25)
    got = [reader.read_clip(i) for i in range(reader.num_clips)]
    assert opens["n"] == 1, f"sequential pass opened the video {opens['n']}x"
    for g, w_ in zip(got, want):
        np.testing.assert_array_equal(g, w_)
    # backward random access still works (reopens)
    np.testing.assert_array_equal(reader.read_clip(0), want[0])
    assert opens["n"] == 2


def test_reader_tail_overcount_pads_not_zeros(long_video):
    """Metadata frame counts can overcount (VFR containers): clips past the
    true end must tail-pad with the last decoded frame and count in
    short_reads — never silent zero frames against real labels."""
    # claim 14 sampled frames; the video only has 12
    reader = VideoClipReader([long_video], [14], seq_len=4, stride=25)
    clip = reader.read_clip(reader.num_clips - 1)  # start 10: frames 10..13
    assert reader.short_reads == 1
    assert clip.shape == (4, 64, 64, 3)
    assert clip.mean() > 0, "tail clip must not be zero-filled"
    # frames 12/13 are the repeated frame 11
    np.testing.assert_array_equal(clip[2], clip[1])
    np.testing.assert_array_equal(clip[3], clip[1])


def test_clip_rng_adjacent_streams_independent():
    """Adjacent (epoch, clip) Philox streams must not be shifted copies of
    each other (low-counter-word seeding made (e+1, c)'s draws literally
    equal draws 4.. of (e, c) — review r3, verified empirically)."""
    from tmrnet_tpu.data.transforms import clip_rng

    a = clip_rng(0, 5).random(16)
    b = clip_rng(1, 5).random(16)
    c = clip_rng(0, 6).random(16)
    for other in (b, c):
        for shift in range(1, 12):
            assert not np.allclose(a[shift:], other[: 16 - shift]), shift
            assert not np.allclose(other[shift:], a[: 16 - shift]), shift
    # determinism is preserved
    np.testing.assert_array_equal(a, clip_rng(0, 5).random(16))


def test_prepare_cli_parallel(tmp_path, capsys):
    """The prepare subcommand extracts independent videos on a worker
    pool; output and on-disk layout must match the sequential path."""
    from tmrnet_tpu.cli import main

    vids = tmp_path / "vids"
    vids.mkdir()
    for name in ("video01", "video02"):
        w = cv2.VideoWriter(str(vids / f"{name}.mp4"),
                            cv2.VideoWriter_fourcc(*"mp4v"), 25, (64, 64))
        assert w.isOpened()
        for i in range(60):
            w.write(np.full((64, 64, 3), 30 + 2 * i, np.uint8))
        w.release()

    out = tmp_path / "frames"
    assert main(["prepare", "--videos", str(vids), "--out", str(out),
                 "--size", "32", "--workers", "2"]) == 0
    printed = capsys.readouterr().out.splitlines()
    # deterministic order regardless of which worker finishes first
    assert printed[0].startswith("video01:")
    assert printed[1].startswith("video02:")
    for name in ("video01", "video02"):
        pngs = sorted(os.listdir(out / name))
        assert pngs == ["frame0.png", "frame25.png", "frame50.png"]
