"""Manifest I/O tests: pickle/CSV round-trips and directory-walk construction."""

import os
import pickle

import numpy as np

from tmrnet_tpu.config import CHOLEC80_PHASES
from tmrnet_tpu.data.manifests import (
    Manifest,
    VideoRecord,
    build_manifest_from_frames,
    load_csv_manifest,
    load_pickle_manifest,
    save_csv_manifest,
    save_pickle_manifest,
    split_manifest,
)


def _toy_manifest(n_videos=3, base=20):
    vids = []
    for i in range(n_videos):
        n = base + i * 5
        paths = [f"/data/video{i:02d}/frame{25*j}.png" for j in range(n)]
        labels = np.arange(n) % 7
        vids.append(VideoRecord(f"video{i:02d}", paths, labels.astype(np.int64)))
    return Manifest(vids)


def test_pickle_roundtrip_6list(tmp_path):
    train, val = _toy_manifest(3), _toy_manifest(2, base=12)
    p = str(tmp_path / "train_val_paths_labels.pkl")
    save_pickle_manifest(p, train, val)
    # on-disk layout matches the reference 6-list
    with open(p, "rb") as f:
        raw = pickle.load(f)
    assert len(raw) == 6
    assert raw[4] == train.video_lengths and raw[5] == val.video_lengths
    tr2, va2 = load_pickle_manifest(p)
    assert tr2.video_lengths == train.video_lengths
    np.testing.assert_array_equal(tr2.flat_labels(), train.flat_labels())
    assert va2.flat_paths() == val.flat_paths()


def test_pickle_roundtrip_3list(tmp_path):
    test = _toy_manifest(2)
    p = str(tmp_path / "test_paths.pkl")
    save_pickle_manifest(p, test)
    m, other = load_pickle_manifest(p)
    assert other is None
    assert m.video_lengths == test.video_lengths
    np.testing.assert_array_equal(m.flat_labels(), test.flat_labels())


def test_pickle_two_column_labels(tmp_path):
    # Reference labels sometimes carry extra columns (phase, tool...); the
    # loader keeps column 0 like eval utils.py:77-95.
    p = str(tmp_path / "m.pkl")
    with open(p, "wb") as f:
        pickle.dump([["a", "b"], [[3, 9], [5, 9]], [2]], f)
    m, _ = load_pickle_manifest(p)
    np.testing.assert_array_equal(m.flat_labels(), [3, 5])


def test_csv_roundtrip(tmp_path):
    m = _toy_manifest(3)
    p = str(tmp_path / "train.csv")
    save_csv_manifest(p, m)
    m2 = load_csv_manifest(p)
    assert m2.video_lengths == m.video_lengths
    assert [v.video_id for v in m2.videos] == [v.video_id for v in m.videos]
    np.testing.assert_array_equal(m2.flat_labels(), m.flat_labels())


def test_build_from_frames_walk(tmp_path):
    # two videos; frames at 25fps numbering, annotations with names.
    for vid, nsec in [("video01", 4), ("video02", 6)]:
        d = tmp_path / "frames" / vid
        d.mkdir(parents=True)
        ann_dir = tmp_path / "ann"
        ann_dir.mkdir(exist_ok=True)
        with open(ann_dir / f"{vid}-phase.txt", "w") as f:
            f.write("Frame\tPhase\n")
            for k in range(nsec * 25):
                f.write(f"{k}\t{CHOLEC80_PHASES[k % 7]}\n")
        for k in range(nsec * 25):
            if k % 5 == 0:  # sparse but includes all %25 frames
                (d / f"frame{k}.png").touch()
        # hidden file must be ignored
        (d / ".DS_Store").touch()

    m = build_manifest_from_frames(
        str(tmp_path / "frames"), str(tmp_path / "ann"),
        CHOLEC80_PHASES, sample_stride=25)
    assert [v.video_id for v in m.videos] == ["video01", "video02"]
    assert m.video_lengths == [4, 6]
    # 1-fps kept frames are 0,25,50,... and labels follow the annotation rows
    v = m.videos[0]
    assert all(p.endswith((f"frame{25*j}.png")) for j, p in enumerate(v.frame_paths))
    np.testing.assert_array_equal(v.labels, [(25 * j) % 7 for j in range(4)])


def test_split_manifest():
    m = _toy_manifest(5)
    a, b = split_manifest(m, (0, 3), (3, 5))
    assert len(a.videos) == 3 and len(b.videos) == 2
    assert b.videos[0].video_id == "video03"


def test_build_manifest_numeric_dir_order(tmp_path):
    """The reference walks cutMargin video dirs in NUMERIC order
    (get_paths_labels.py get_dirs2 sorts by int(name)); bare-number dirs
    must order 1,2,10 — a lexical walk would put 10 second and silently
    shift the --train-videos split membership on the real layout."""
    import cv2

    frames = tmp_path / "frames"
    ann = tmp_path / "ann"
    ann.mkdir()
    for vid in ("1", "2", "10"):
        d = frames / vid
        d.mkdir(parents=True)
        cv2.imwrite(str(d / "frame0.png"),
                    np.zeros((8, 8, 3), np.uint8))
        (ann / f"{vid}-phase.txt").write_text(
            "Frame\tPhase\n0\tPreparation\n")
    from tmrnet_tpu.config import CHOLEC80_PHASES

    m = build_manifest_from_frames(str(frames), str(ann), CHOLEC80_PHASES)
    assert [v.video_id for v in m.videos] == ["1", "2", "10"]
    a, b = split_manifest(m, (0, 2), (2, 3))
    assert [v.video_id for v in a.videos] == ["1", "2"]
    assert [v.video_id for v in b.videos] == ["10"]


def test_pickle_manifest_reference_element_order(tmp_path):
    """The reference's 6-list groups by KIND (train_paths, val_paths,
    train_labels, val_labels, train_num, val_num —
    get_paths_labels.py:126-139); a hand-built reference-order pickle must
    load with paths and labels in the right splits, save must WRITE that
    order, and the legacy split-grouped layout still loads (detected)."""
    ref = [
        ["t/a.jpg", "t/b.jpg"], ["v/c.jpg"],          # train/val paths
        [[0], [1]], [[2]],                            # train/val labels
        [2], [1],                                     # train/val num_each
    ]
    p = tmp_path / "ref.pkl"
    with open(p, "wb") as f:
        pickle.dump(ref, f)
    train, val = load_pickle_manifest(str(p))
    assert train.flat_paths() == ["t/a.jpg", "t/b.jpg"]
    assert val.flat_paths() == ["v/c.jpg"]
    np.testing.assert_array_equal(train.flat_labels(), [0, 1])
    np.testing.assert_array_equal(val.flat_labels(), [2])

    out = tmp_path / "out.pkl"
    save_pickle_manifest(str(out), train, val)
    with open(out, "rb") as f:
        written = pickle.load(f)
    assert written[0] == ref[0] and written[1] == ref[1]  # kind-grouped
    assert written[4] == [2] and written[5] == [1]

    legacy = [ref[0], ref[2], ref[1], ref[3], ref[4], ref[5]]
    lp = tmp_path / "legacy.pkl"
    with open(lp, "wb") as f:
        pickle.dump(legacy, f)
    ltrain, lval = load_pickle_manifest(str(lp))
    assert ltrain.flat_paths() == ref[0] and lval.flat_paths() == ref[1]


def test_load_nested_cholec80_pickle(tmp_path):
    """get_paths_labels.py's intermediate cholec80.pkl (one list per video
    of [path, label] rows; export_phase_copy.py reads it directly) loads as
    a manifest — including when the video count collides with the 3/6-list
    lengths."""
    for n_videos in (2, 3, 6):
        data = [[[f"cutMargin/{v + 40}/{25 * k}.jpg", (k // 2) % 7]
                 for k in range(4 + v)] for v in range(n_videos)]
        p = tmp_path / f"cholec80_{n_videos}.pkl"
        with open(p, "wb") as f:
            pickle.dump(data, f)
        m, second = load_pickle_manifest(str(p))
        assert second is None
        assert [v.video_id for v in m.videos] == [
            str(v + 40) for v in range(n_videos)]
        assert m.video_lengths == [4 + v for v in range(n_videos)]
        np.testing.assert_array_equal(m.videos[0].labels, [0, 0, 1, 1])
