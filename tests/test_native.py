"""Native C++ preprocessing library tests: parity with the numpy/cv2 reference
implementations + a throughput sanity check. Skipped when no compiler/lib."""

import numpy as np
import pytest

from tmrnet_tpu.data import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def test_cutmargin_bbox_matches_python():
    from tmrnet_tpu.data.cutmargin import margin_bbox

    rng = np.random.RandomState(0)
    img = np.zeros((240, 320, 3), np.uint8)
    img[30:200, 50:280] = rng.randint(60, 255, (170, 230, 3), dtype=np.uint8)
    got = native.cutmargin_bbox(img)
    want = margin_bbox(img)
    assert got is not None and want is not None
    # median-filter border semantics differ slightly; allow 2px
    for g, w in zip(got, want):
        assert abs(g - w) <= 2, (got, want)


def test_cutmargin_all_black():
    img = np.zeros((64, 64, 3), np.uint8)
    assert native.cutmargin_bbox(img) is None


def test_resize_bilinear_close_to_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(1)
    frames = rng.randint(0, 255, (4, 120, 160, 3), dtype=np.uint8)
    got = native.resize_bilinear(frames, 250, 250)
    for i in range(4):
        want = cv2.resize(frames[i], (250, 250), interpolation=cv2.INTER_LINEAR)
        diff = np.abs(got[i].astype(int) - want.astype(int))
        assert np.mean(diff) < 2.0 and np.percentile(diff, 99) <= 3


def test_preprocess_batch_matches_numpy():
    rng = np.random.RandomState(2)
    n, ih, iw, crop = 8, 250, 250, 224
    frames = rng.randint(0, 255, (n, ih, iw, 3), dtype=np.uint8)
    cy = rng.randint(0, ih - crop, n).astype(np.int32)
    cx = rng.randint(0, iw - crop, n).astype(np.int32)
    flip = (rng.rand(n) < 0.5).astype(np.uint8)
    mean = np.array([0.4, 0.26, 0.26], np.float32)
    std = np.array([0.22, 0.2, 0.19], np.float32)

    got = native.preprocess_batch(frames, cy, cx, crop, flip, mean, std)
    for i in range(n):
        img = frames[i, cy[i]:cy[i] + crop, cx[i]:cx[i] + crop]
        if flip[i]:
            img = img[:, ::-1]
        want = (img.astype(np.float32) / 255.0 - mean) / std
        np.testing.assert_allclose(got[i], want, atol=1e-5)


def test_preprocess_throughput_sanity():
    # not a benchmark, just catches pathological slowness; the bound is
    # loose (150 ms/frame) because the suite shares a 1-core host with 8
    # virtual devices and the old 50 ms/frame bound flaked under load
    import time

    rng = np.random.RandomState(3)
    frames = rng.randint(0, 255, (100, 250, 250, 3), dtype=np.uint8)
    cy = np.zeros(100, np.int32)
    cx = np.zeros(100, np.int32)
    flip = np.zeros(100, np.uint8)
    mean = np.full(3, 0.4, np.float32)
    std = np.full(3, 0.2, np.float32)
    t0 = time.perf_counter()
    native.preprocess_batch(frames, cy, cx, 224, flip, mean, std)
    assert time.perf_counter() - t0 < 15.0


def test_train_transform_native_matches_numpy():
    from tmrnet_tpu.data.transforms import TrainTransform

    clip = np.random.RandomState(5).randint(
        0, 255, (4, 250, 250, 3)).astype(np.uint8)
    a = TrainTransform(use_flip=True, use_native=False)(clip, 2, 9)
    b = TrainTransform(use_flip=True, use_native=True)(clip, 2, 9)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_native_dir_env_override(tmp_path):
    """TMRNET_NATIVE_DIR points installed deployments at a prebuilt lib;
    a bogus dir must degrade to the numpy fallback, not raise."""
    import os
    import subprocess
    import sys

    code = (
        "from tmrnet_tpu.data import native; "
        "import sys; sys.exit(0 if not native.available(build=False) else 1)"
    )
    env = dict(os.environ, TMRNET_NATIVE_DIR=str(tmp_path / "nowhere"))
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, timeout=120)
    assert r.returncode == 0, r.stderr.decode()
