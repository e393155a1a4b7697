"""ctypes bindings to the native preprocessing library (native/tmrnet_data.cc).

Loads native/libtmrnet_data.so if built (`make -C native`), building it on
demand when a compiler is available; falls back to numpy implementations in
tmrnet_tpu.data.{cutmargin,transforms} otherwise. All entry points accept and
return numpy arrays.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

# Default: the repo checkout layout (<repo>/native next to the package).
# Installed deployments (wheel installs don't ship native/) point
# TMRNET_NATIVE_DIR at a directory holding tmrnet_data.cc + Makefile or a
# prebuilt libtmrnet_data.so; without either the numpy fallback applies.
_NATIVE_DIR = os.environ.get("TMRNET_NATIVE_DIR") or os.path.join(
    os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtmrnet_data.so")

_lib = None


def _try_build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


_build_failed = False


def load_library(build: bool = True) -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None when unavailable.
    A failed build is memoized: without this, every available()/bbox call
    on a host that can't compile re-spawned `make` in the per-clip hot
    path (review r3)."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        if _build_failed or not build or not _try_build():
            _build_failed = True
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.tmr_cutmargin_bbox.restype = ctypes.c_int
    lib.tmr_cutmargin_bbox.argtypes = [u8p] + [ctypes.c_int] * 5 + [i32p]
    lib.tmr_resize_bilinear_u8.restype = None
    lib.tmr_resize_bilinear_u8.argtypes = [u8p] + [ctypes.c_int] * 5 + [
        u8p, ctypes.c_int]
    lib.tmr_preprocess_batch.restype = None
    lib.tmr_preprocess_batch.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p, i32p,
        ctypes.c_int, u8p, f32p, f32p, f32p, ctypes.c_int]
    _lib = lib
    return lib


def available(build: bool = True) -> bool:
    return load_library(build) is not None


def _u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def _f32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def cutmargin_bbox(image: np.ndarray, threshold: int = 15,
                   median_ksize: int = 19, guard: int = 10
                   ) -> Optional[Tuple[int, int, int, int]]:
    lib = load_library()
    if lib is None:
        from tmrnet_tpu.data.cutmargin import margin_bbox

        return margin_bbox(image, threshold, median_ksize, guard)
    image = np.ascontiguousarray(image, np.uint8)
    h, w = image.shape[:2]
    bbox = np.zeros(4, np.int32)
    rc = lib.tmr_cutmargin_bbox(_u8(image), h, w, threshold, median_ksize,
                                guard, _i32(bbox))
    if rc != 0:
        return None
    return tuple(int(x) for x in bbox)


def resize_bilinear(frames: np.ndarray, oh: int, ow: int,
                    num_threads: int = 0) -> np.ndarray:
    """frames: (n, ih, iw, 3) uint8 -> (n, oh, ow, 3) uint8."""
    lib = load_library()
    frames = np.ascontiguousarray(frames, np.uint8)
    n, ih, iw = frames.shape[:3]
    if lib is None:
        from tmrnet_tpu.data.transforms import resize_clip

        return resize_clip(frames, (oh, ow))
    out = np.empty((n, oh, ow, 3), np.uint8)
    lib.tmr_resize_bilinear_u8(_u8(frames), n, ih, iw, oh, ow, _u8(out),
                               num_threads)
    return out


def preprocess_batch(frames: np.ndarray, crop_y: np.ndarray,
                     crop_x: np.ndarray, crop: int, flip: np.ndarray,
                     mean, std, num_threads: int = 0) -> np.ndarray:
    """Fused crop+flip+normalize. frames (n, ih, iw, 3) uint8 ->
    (n, crop, crop, 3) float32. crop_y/crop_x/flip are per-frame arrays."""
    frames = np.ascontiguousarray(frames, np.uint8)
    n, ih, iw = frames.shape[:3]
    crop_y = np.ascontiguousarray(crop_y, np.int32)
    crop_x = np.ascontiguousarray(crop_x, np.int32)
    # the C path does no bounds checking — an out-of-range offset would
    # silently read out-of-bounds memory (and the numpy fallback would
    # produce ragged slices); validate here, once, for both paths
    if n and (crop_y.min() < 0 or crop_x.min() < 0
              or crop_y.max() + crop > ih or crop_x.max() + crop > iw):
        raise ValueError(
            f"crop window outside the frame: crop={crop}, frames "
            f"{ih}x{iw}, offsets y[{crop_y.min()},{crop_y.max()}] "
            f"x[{crop_x.min()},{crop_x.max()}]")
    flip = np.ascontiguousarray(flip, np.uint8)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    lib = load_library()
    if lib is None:
        outs = []
        for i in range(n):
            img = frames[i, crop_y[i]:crop_y[i] + crop,
                         crop_x[i]:crop_x[i] + crop]
            if flip[i]:
                img = img[:, ::-1]
            outs.append((img.astype(np.float32) / 255.0 - mean) / std)
        return np.stack(outs)
    out = np.empty((n, crop, crop, 3), np.float32)
    lib.tmr_preprocess_batch(_u8(frames), n, ih, iw, _i32(crop_y),
                             _i32(crop_x), crop, _u8(flip), _f32(mean),
                             _f32(std), _f32(out), num_threads)
    return out
