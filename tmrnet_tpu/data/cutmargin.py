"""Black-margin cropping of endoscopic frames.

Reimplements the reference's `change_size()` (`code/video2frame_cutmargin.py:20-48`)
without its O(H*W) interpreted pixel loops: grayscale -> binary threshold (15)
-> 19x19 median blur -> bounding box of nonzero rows/cols (with a 10-pixel
guard band on the column scan) -> crop. Vectorized numpy + cv2 (C++), ~100x the
reference's Python double loop; a further threaded C++ path lives in native/.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

try:
    import cv2  # noqa: F401

    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False


def margin_bbox(image: np.ndarray, threshold: int = 15,
                blur_ksize: int = 19, guard: int = 10
                ) -> Optional[Tuple[int, int, int, int]]:
    """Bounding box (row0, row1, col0, col1) of non-black content, or None if
    the frame is entirely black (reference returns the input unchanged then).

    The reference scans columns only within [guard, width-guard] when locating
    the content rows; we keep that behavior.
    """
    if image.ndim == 3:
        if _HAS_CV2:
            import cv2

            gray = cv2.cvtColor(image, cv2.COLOR_RGB2GRAY)
        else:
            gray = image.mean(axis=2).astype(np.uint8)
    else:
        gray = image
    binary = (gray > threshold).astype(np.uint8)
    if _HAS_CV2:
        import cv2

        binary = cv2.medianBlur(binary * 255, blur_ksize)
        mask = binary > 0
    else:
        mask = binary.astype(bool)

    h, w = mask.shape
    inner = mask[:, guard:max(guard + 1, w - guard)]
    rows = np.flatnonzero(inner.any(axis=1))
    cols = np.flatnonzero(mask.any(axis=0))
    if rows.size == 0 or cols.size == 0:
        return None
    return int(rows[0]), int(rows[-1]) + 1, int(cols[0]), int(cols[-1]) + 1


def cut_black_margin(image: np.ndarray, threshold: int = 15,
                     blur_ksize: int = 19, guard: int = 10) -> np.ndarray:
    """Crop away black margins; returns the input unchanged if all-black."""
    bbox = margin_bbox(image, threshold, blur_ksize, guard)
    if bbox is None:
        return image
    r0, r1, c0, c1 = bbox
    return image[r0:r1, c0:c1]


def resize_square(image: np.ndarray, size: int = 250) -> np.ndarray:
    """Resize to (size, size) like the reference preprocessing target."""
    if _HAS_CV2:
        import cv2

        return cv2.resize(image, (size, size), interpolation=cv2.INTER_AREA)
    # nearest-neighbor fallback
    h, w = image.shape[:2]
    ri = (np.arange(size) * h // size).clip(0, h - 1)
    ci = (np.arange(size) * w // size).clip(0, w - 1)
    return image[ri][:, ci]
