"""Packed raw-frame storage (data/packed.py): path convention, memmap
loader, packer, and the pack CLI end-to-end — packed manifests must be a
drop-in replacement for image trees on every surface."""

import json
import os

import numpy as np
import pytest

from tests.test_cli import _write_frames_tree
from tmrnet_tpu.cli import main
from tmrnet_tpu.data.manifests import (
    Manifest,
    VideoRecord,
    load_pickle_manifest,
)
from tmrnet_tpu.data.packed import (
    is_packed_path,
    load_packed_frame,
    pack_manifest,
    pack_video,
    packed_file_of,
    split_packed_path,
)
from tmrnet_tpu.data.pipeline import ClipDataset, load_frame


def _mem_manifest(rng, lengths, hw=32):
    """In-memory manifest + loader: paths are synthetic keys."""
    frames = {}
    videos = []
    for v, n in enumerate(lengths):
        paths = []
        for j in range(n):
            p = f"v{v}/f{j}"
            frames[p] = rng.randint(0, 255, (hw, hw, 3), dtype=np.uint8)
            paths.append(p)
        videos.append(VideoRecord(f"vid{v:02d}", paths,
                                  rng.randint(0, 7, n).astype(np.int64)))
    return Manifest(videos), lambda p: frames[p]


def test_path_convention_helpers():
    assert is_packed_path("/x/video01.npy#12")
    assert not is_packed_path("/x/video01/frame25.png")
    assert split_packed_path("/x/video01.npy#12") == ("/x/video01.npy", 12)
    assert packed_file_of("/x/video01.npy#0") == "/x/video01.npy"
    assert packed_file_of("/x/frame.png") is None
    with pytest.raises(ValueError):
        split_packed_path("/x/video01.png#3")  # not an .npy pack


def test_pack_video_roundtrip(tmp_path):
    rng = np.random.RandomState(3)
    m, loader = _mem_manifest(rng, [7])
    rec = pack_video(m.videos[0], str(tmp_path), loader)
    assert rec.video_id == "vid00"
    assert len(rec.frame_paths) == 7
    assert np.array_equal(rec.labels, m.videos[0].labels)
    for orig_p, packed_p in zip(m.videos[0].frame_paths, rec.frame_paths):
        got = load_packed_frame(packed_p)
        assert got.dtype == np.uint8
        assert np.array_equal(got, loader(orig_p))
    # load_frame dispatches on the convention: same bytes, owned copy
    a = load_frame(rec.frame_paths[3])
    assert np.array_equal(a, loader(m.videos[0].frame_paths[3]))
    a[0, 0, 0] += 1  # owned: mutating must not corrupt later reads
    assert np.array_equal(load_frame(rec.frame_paths[3]),
                          loader(m.videos[0].frame_paths[3]))


def test_packed_frame_out_of_range(tmp_path):
    rng = np.random.RandomState(4)
    m, loader = _mem_manifest(rng, [3])
    rec = pack_video(m.videos[0], str(tmp_path), loader)
    file = split_packed_path(rec.frame_paths[0])[0]
    with pytest.raises(IndexError):
        load_packed_frame(f"{file}#3")


def test_pack_video_nonuniform_frames_raise_and_clean_up(tmp_path):
    frames = {"a": np.zeros((8, 8, 3), np.uint8),
              "b": np.zeros((9, 8, 3), np.uint8)}
    rec = VideoRecord("bad", ["a", "b"], np.zeros(2, np.int64))
    with pytest.raises(ValueError, match="uniform"):
        pack_video(rec, str(tmp_path), frames.__getitem__)
    assert not (tmp_path / "bad.npy").exists()  # no half-written pack


def test_pack_video_rejects_non_uint8(tmp_path):
    rec = VideoRecord("f32", ["a"], np.zeros(1, np.int64))
    with pytest.raises(ValueError, match="uint8"):
        pack_video(rec, str(tmp_path),
                   lambda p: np.zeros((8, 8, 3), np.float32))


def test_pack_manifest_clip_dataset_parity(tmp_path):
    """ClipDataset over the packed manifest yields bit-identical clips and
    labels to the image-tree dataset."""
    rng = np.random.RandomState(5)
    m, loader = _mem_manifest(rng, [6, 9])
    packed = pack_manifest(m, str(tmp_path), workers=2, loader=loader)
    assert [v.video_id for v in packed.videos] == ["vid00", "vid01"]
    ds_a = ClipDataset(m, seq_len=4, frame_loader=loader, frame_cache=0)
    ds_b = ClipDataset(packed, seq_len=4, frame_cache=0)
    assert ds_a.num_clips == ds_b.num_clips
    for row in range(ds_a.num_clips):
        ca, la = ds_a.get_clip(row)
        cb, lb = ds_b.get_clip(row)
        assert np.array_equal(ca, cb) and la == lb


def test_pack_manifest_duplicate_ids_rejected(tmp_path):
    rec = VideoRecord("dup", ["a"], np.zeros(1, np.int64))
    m = Manifest([rec, rec])
    with pytest.raises(ValueError, match="duplicate"):
        pack_manifest(m, str(tmp_path),
                      loader=lambda p: np.zeros((8, 8, 3), np.uint8))


def test_cli_pack_preserves_splits_and_ids(tmp_path, capsys):
    """pack on a 6-list train/val pickle: split structure, video ids, and
    labels survive the roundtrip; packed paths resolve through load_frame."""
    frames_dir, ann_dir = _write_frames_tree(tmp_path, n_videos=3, seconds=4)
    src = tmp_path / "src.pkl"
    assert main(["manifest", "--frames", str(frames_dir),
                 "--annotations", str(ann_dir), "--out", str(src),
                 "--train-videos", "2"]) == 0
    capsys.readouterr()
    out = tmp_path / "packed.pkl"
    assert main(["pack", "--manifest", str(src),
                 "--out-dir", str(tmp_path / "packs"),
                 "--manifest-out", str(out), "--workers", "2"]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["videos"] == 3 and rep["packed_files"] == 3
    assert rep["bytes"] == sum(
        os.path.getsize(tmp_path / "packs" / f"video{v:02d}.npy")
        for v in (1, 2, 3))

    for a, b in zip(load_pickle_manifest(str(src)),
                    load_pickle_manifest(str(out))):
        assert (a is None) == (b is None)
        if a is None:
            continue
        assert [v.video_id for v in a.videos] == \
               [v.video_id for v in b.videos]
        for va, vb in zip(a.videos, b.videos):
            assert np.array_equal(va.labels, vb.labels)
            assert all(is_packed_path(p) for p in vb.frame_paths)
            assert np.array_equal(load_frame(va.frame_paths[0]),
                                  load_frame(vb.frame_paths[0]))


def test_cli_doctor_accepts_packed_manifest(tmp_path, capsys):
    frames_dir, ann_dir = _write_frames_tree(tmp_path, n_videos=1, seconds=3)
    src, out = tmp_path / "src.pkl", tmp_path / "packed.pkl"
    assert main(["manifest", "--frames", str(frames_dir),
                 "--annotations", str(ann_dir), "--out", str(src)]) == 0
    assert main(["pack", "--manifest", str(src),
                 "--out-dir", str(tmp_path / "packs"),
                 "--manifest-out", str(out)]) == 0
    capsys.readouterr()
    assert main(["doctor", "--manifest", str(out)]) == 0
    lines = capsys.readouterr().out.splitlines()
    row = next(l for l in lines if "manifest" in l)
    assert "missing" not in row


def test_cli_doctor_flags_out_of_range_packed_index(tmp_path, capsys):
    """A manifest referencing frames past a pack's real length (pack and
    manifest out of sync) must FAIL doctor, not blow up mid-epoch."""
    frames_dir, ann_dir = _write_frames_tree(tmp_path, n_videos=1, seconds=3)
    src, out = tmp_path / "src.pkl", tmp_path / "packed.pkl"
    assert main(["manifest", "--frames", str(frames_dir),
                 "--annotations", str(ann_dir), "--out", str(src)]) == 0
    assert main(["pack", "--manifest", str(src),
                 "--out-dir", str(tmp_path / "packs"),
                 "--manifest-out", str(out)]) == 0
    # truncate the pack: drop its last frame, keeping the manifest
    pack = next(str(p) for p in (tmp_path / "packs").iterdir())
    arr = np.load(pack)
    np.save(pack, arr[:-1])
    capsys.readouterr()
    assert main(["doctor", "--manifest", str(out)]) == 1
    lines = capsys.readouterr().out.splitlines()
    row = next(l for l in lines if "manifest" in l)
    assert "FAIL" in row and "out of range" in row


def test_prepare_pack_manifest_chain(tmp_path, capsys):
    """prepare --pack -> manifest on the packs dir: same video ids, labels,
    and pixel content as the PNG-tree path (mp4 decode is deterministic)."""
    import cv2

    from tmrnet_tpu.config import CHOLEC80_PHASES

    vids = tmp_path / "vids"
    vids.mkdir()
    ann = tmp_path / "ann"
    ann.mkdir()
    for name in ("video01", "video02"):
        w = cv2.VideoWriter(str(vids / f"{name}.mp4"),
                            cv2.VideoWriter_fourcc(*"mp4v"), 25, (64, 64))
        assert w.isOpened()
        for i in range(80):
            w.write(np.full((64, 64, 3), 30 + 2 * i, np.uint8))
        w.release()
        with open(ann / f"{name}-phase.txt", "w") as f:
            f.write("Frame\tPhase\n")
            for k in range(80):
                f.write(f"{k}\t{CHOLEC80_PHASES[k % 7]}\n")

    tree, packs = tmp_path / "frames", tmp_path / "packs"
    assert main(["prepare", "--videos", str(vids), "--out", str(tree),
                 "--size", "32"]) == 0
    assert main(["prepare", "--videos", str(vids), "--out", str(packs),
                 "--size", "32", "--pack"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert out[2].startswith("video01:") and out[3].startswith("video02:")
    assert sorted(os.listdir(packs)) == ["video01.npy", "video02.npy"]

    m_tree = tmp_path / "m_tree.pkl"
    m_pack = tmp_path / "m_pack.pkl"
    for frames, mani in ((tree, m_tree), (packs, m_pack)):
        assert main(["manifest", "--frames", str(frames),
                     "--annotations", str(ann), "--out", str(mani)]) == 0
    a = load_pickle_manifest(str(m_tree))[0]
    b = load_pickle_manifest(str(m_pack))[0]
    assert [v.video_id for v in a.videos] == [v.video_id for v in b.videos]
    for va, vb in zip(a.videos, b.videos):
        assert np.array_equal(va.labels, vb.labels)
        assert len(va.frame_paths) == len(vb.frame_paths)
        assert all(is_packed_path(p) for p in vb.frame_paths)
        for pa, pb in zip(va.frame_paths, vb.frame_paths):
            assert np.array_equal(load_frame(pa), load_frame(pb))
