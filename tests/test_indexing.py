"""Property tests for clip-index machinery vs. the reference algorithms."""

import numpy as np
import pytest

from tmrnet_tpu.data.indexing import (
    clip_start_indices,
    clips_per_video,
    expand_clip_indices,
    memory_window_rows,
    memory_window_rows_reference,
    rows_to_video_ids,
    video_first_rows,
)


def reference_get_useful_start_idx(seq_len, lengths):
    # Literal transcription of the reference algorithm
    # (train_singlenet_phase_1fc.py:235-242) used as the test oracle.
    count, idx = 0, []
    for n in lengths:
        for j in range(count, count + (n + 1 - seq_len)):
            idx.append(j)
        count += n
    return idx


@pytest.mark.parametrize("lengths", [[50], [30, 45, 12], [10, 10], [100, 9, 40]])
def test_clip_starts_match_reference(lengths):
    seq = 10
    got = clip_start_indices(seq, lengths)
    want = reference_get_useful_start_idx(seq, lengths)
    np.testing.assert_array_equal(got, want)


def test_clip_never_crosses_video_boundary():
    rng = np.random.RandomState(0)
    lengths = rng.randint(10, 80, size=20).tolist()
    seq = 10
    starts = clip_start_indices(seq, lengths)
    bounds = np.cumsum([0] + lengths)
    vid_of_frame = np.searchsorted(bounds, np.arange(sum(lengths)), side="right") - 1
    for s in starts.tolist():
        assert vid_of_frame[s] == vid_of_frame[s + seq - 1]


def test_expand_clip_indices():
    out = expand_clip_indices([0, 7], 3)
    np.testing.assert_array_equal(out, [0, 1, 2, 7, 8, 9])


def test_row_bookkeeping():
    lengths = [30, 45, 12]
    seq = 10
    cpv = clips_per_video(seq, lengths)
    np.testing.assert_array_equal(cpv, [21, 36, 3])
    np.testing.assert_array_equal(video_first_rows(seq, lengths), [0, 21, 57])
    vids = rows_to_video_ids(60, seq, lengths)
    assert vids.shape == (60,)
    assert (vids[:21] == 0).all() and (vids[21:57] == 1).all() and (vids[57:] == 2).all()


def test_clamped_window_semantics():
    # Single video: rows 0..20, window 5. Row 2 -> [1, 0, 0, 0, 0].
    first = np.array([0])
    rows = np.array([2])
    out = memory_window_rows(rows, first, 5)
    np.testing.assert_array_equal(out, [[1, 0, 0, 0, 0]])
    # Mid-video row has full history.
    out2 = memory_window_rows(np.array([10]), first, 5)
    np.testing.assert_array_equal(out2, [[9, 8, 7, 6, 5]])
    # Second video's first row never reaches video 1 rows.
    out3 = memory_window_rows(np.array([21]), np.array([21]), 5)
    np.testing.assert_array_equal(out3, [[21] * 5])


def test_reference_window_matches_clamped_inside_video():
    # Away from video boundaries the quirky reference walk and the clamped
    # closed form agree exactly.
    lengths = [40, 50]
    seq = 10
    window = 8
    starts = clip_start_indices(seq, lengths)
    first = video_first_rows(seq, lengths)
    # rows >= window within video 0: frame start == row for video 0
    test_rows = np.arange(window, 31)
    ref = memory_window_rows_reference(starts[test_rows], seq, lengths, window)
    clamped = memory_window_rows(test_rows, np.zeros_like(test_rows), window)
    np.testing.assert_array_equal(ref, clamped)


def test_reference_window_cross_video_quirk():
    # The first clip of video 2 looks back: frames s-1..s-9 are video-1 tail
    # frames (not clip starts) -> filled with own row; s-10 IS the last clip
    # start of video 1 -> cross-video row (the documented reference quirk).
    lengths = [40, 50]
    seq = 10
    window = 12
    starts = clip_start_indices(seq, lengths)
    first = video_first_rows(seq, lengths)  # [0, 31]
    r = int(first[1])  # first row of video 2
    ref = memory_window_rows_reference([starts[r]], seq, lengths, window)[0]
    # k=0..8: gap-filled with own row (last valid so far)
    np.testing.assert_array_equal(ref[:9], [r] * 9)
    # k=9: frame start-10 = last start of video 1 -> row 30
    assert ref[9] == 30
    assert ref[10] == 29 and ref[11] == 28
    # Clamped mode instead repeats own row everywhere.
    clamped = memory_window_rows(np.array([r]), np.array([first[1]]), window)[0]
    np.testing.assert_array_equal(clamped, [r] * window)


def test_window_rows_jax_compatible():
    import jax.numpy as jnp

    out = memory_window_rows(jnp.array([5, 2]), jnp.array([0, 0]), 4)
    np.testing.assert_array_equal(np.asarray(out), [[4, 3, 2, 1], [1, 0, 0, 0]])
