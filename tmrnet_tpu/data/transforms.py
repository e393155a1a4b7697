"""Clip-deterministic augmentations as pure functions of an integer seed.

The reference implements same-augmentation-per-clip with stateful counters that
reseed Python's global `random` every call (`code/dataset.py:7-82`, working
copies at `train_singlenet_phase_1fc.py:103-179`) — mutable state that is
silently replicated across DataLoader workers (SURVEY.md section 5, race
notes). Here every transform is a pure function of (clip ndarray, clip_seed):
the per-clip seed derives from (epoch, clip_id), so augmentation is identical
across a clip's frames, independent of worker layout, and exactly reproducible.

Clips are uint8/float32 arrays shaped (T, H, W, 3). All ops are vectorized
numpy/cv2 host code (the TPU consumes the final normalized bf16 batch).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False


def clip_rng(epoch: int, clip_id: int, base_seed: int = 0) -> np.random.Generator:
    """Deterministic per-(epoch, clip) generator — the stateless replacement
    for the reference's `random.seed(count // sequence_length)` counters.

    epoch/clip_id live in the HIGH Philox counter words: the generator
    advances the LOW word per 4-uint64 block, so low-word seeding would
    make adjacent (epoch, clip) streams the same sequence shifted by one
    block — deterministically correlated augmentations (measured: the
    first draws of (e+1, c) literally equal draws 4.. of (e, c))."""
    return np.random.Generator(
        np.random.Philox(key=np.uint64(base_seed),
                         counter=[0, 0, np.uint64(clip_id),
                                  np.uint64(epoch)]))


# ---------------------------------------------------------------------------
# Geometric
# ---------------------------------------------------------------------------


def random_crop(clip: np.ndarray, size: int, rng: np.random.Generator
                ) -> np.ndarray:
    t, h, w = clip.shape[:3]
    if h == size and w == size:
        return clip
    y = int(rng.integers(0, h - size + 1))
    x = int(rng.integers(0, w - size + 1))
    return clip[:, y:y + size, x:x + size]


def random_crop_per_frame(clip: np.ndarray, size: int,
                          rng: np.random.Generator) -> np.ndarray:
    """Independent crop offset PER FRAME — the reference's TEST crop 0 is
    the plain torchvision `transforms.RandomCrop(224)` applied per image
    (`train_memorybank.py:93-98`), not the clip-shared custom RandomCrop
    the train stacks use."""
    t, h, w = clip.shape[:3]
    if h == size and w == size:
        return clip
    ys = rng.integers(0, h - size + 1, size=t)
    xs = rng.integers(0, w - size + 1, size=t)
    return np.stack([clip[i, y:y + size, x:x + size]
                     for i, (y, x) in enumerate(zip(ys, xs))])


def center_crop(clip: np.ndarray, size: int) -> np.ndarray:
    h, w = clip.shape[1:3]
    y, x = (h - size) // 2, (w - size) // 2
    return clip[:, y:y + size, x:x + size]


def random_horizontal_flip(clip: np.ndarray, rng: np.random.Generator,
                           prob: float = 0.5) -> np.ndarray:
    if rng.random() < prob:
        return clip[:, :, ::-1]
    return clip


def random_rotation(clip: np.ndarray, degrees: float,
                    rng: np.random.Generator) -> np.ndarray:
    """Rotate every frame of the clip by one shared angle in [-degrees, degrees]
    (integer degrees like the reference's random.randint)."""
    angle = int(rng.integers(-int(degrees), int(degrees) + 1))
    if angle == 0:
        return clip
    if not _HAS_CV2:  # pragma: no cover
        return clip
    h, w = clip.shape[1:3]
    m = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
    out = np.empty_like(clip)
    for i in range(clip.shape[0]):
        out[i] = cv2.warpAffine(clip[i], m, (w, h), flags=cv2.INTER_LINEAR,
                                borderValue=0)
    return out


def random_resized_crop(clip: np.ndarray, size: int, rng: np.random.Generator,
                        scale: Tuple[float, float] = (0.2, 1.0),
                        ratio: Tuple[float, float] = (3 / 4, 4 / 3)
                        ) -> np.ndarray:
    """torchvision/monai-style RandomResizedCrop shared across the clip (the
    fork's video-path train transform, reference `test-resnet.py:206-270`)."""
    t, h, w = clip.shape[:3]
    area = h * w
    for _ in range(10):
        target = area * rng.uniform(*scale)
        log_r = rng.uniform(np.log(ratio[0]), np.log(ratio[1]))
        ar = float(np.exp(log_r))
        cw = int(round(np.sqrt(target * ar)))
        ch = int(round(np.sqrt(target / ar)))
        if 0 < cw <= w and 0 < ch <= h:
            y = int(rng.integers(0, h - ch + 1))
            x = int(rng.integers(0, w - cw + 1))
            crop = clip[:, y:y + ch, x:x + cw]
            return resize_clip(crop, (size, size))
    return resize_clip(center_crop(clip, min(h, w)), (size, size))


def five_crop(clip: np.ndarray, size: int) -> np.ndarray:
    """Four corners + center -> (5, T, size, size, C) (torchvision FiveCrop,
    the reference's test crop_type 5)."""
    t, h, w = clip.shape[:3]
    tl = clip[:, :size, :size]
    tr = clip[:, :size, w - size:]
    bl = clip[:, h - size:, :size]
    br = clip[:, h - size:, w - size:]
    return np.stack([tl, tr, bl, br, center_crop(clip, size)])


def ten_crop(clip: np.ndarray, size: int) -> np.ndarray:
    """FiveCrop + horizontally flipped FiveCrop -> (10, T, size, size, C)
    (torchvision TenCrop, the reference's test crop_type 10)."""
    five = five_crop(clip, size)
    return np.concatenate([five, five[:, :, :, ::-1]], axis=0)


def pad_or_crop(clip: np.ndarray, size: int) -> np.ndarray:
    """Center pad-or-crop to (size, size) (monai ResizeWithPadOrCrop in the
    fork's eval transforms)."""
    t, h, w = clip.shape[:3]
    out = np.zeros((t, size, size, clip.shape[3]), clip.dtype)
    sy, dy = (max(0, (h - size) // 2), max(0, (size - h) // 2))
    sx, dx = (max(0, (w - size) // 2), max(0, (size - w) // 2))
    ch, cw = min(h, size), min(w, size)
    out[:, dy:dy + ch, dx:dx + cw] = clip[:, sy:sy + ch, sx:sx + cw]
    return out


def resize_clip(clip: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    if clip.shape[1:3] == tuple(size):
        return clip
    if _HAS_CV2:
        out = np.empty((clip.shape[0], size[0], size[1], clip.shape[3]),
                       dtype=clip.dtype)
        for i in range(clip.shape[0]):
            out[i] = cv2.resize(clip[i], (size[1], size[0]),
                                interpolation=cv2.INTER_LINEAR)
        return out
    raise RuntimeError("resize requires cv2")


# ---------------------------------------------------------------------------
# Photometric (torchvision-compatible formulas)
# ---------------------------------------------------------------------------


def _blend(a: np.ndarray, b: np.ndarray, factor: float) -> np.ndarray:
    return np.clip(factor * a + (1.0 - factor) * b, 0, 255)


def _grayscale(clip_f: np.ndarray) -> np.ndarray:
    # itu-r 601-2 luma, like PIL convert('L')
    g = (clip_f[..., 0] * 0.299 + clip_f[..., 1] * 0.587
         + clip_f[..., 2] * 0.114)
    return g[..., None]


def color_jitter(clip: np.ndarray, rng: np.random.Generator,
                 brightness: float = 0.1, contrast: float = 0.1,
                 saturation: float = 0.1, hue: float = 0.05) -> np.ndarray:
    """One shared jitter per clip, applying brightness -> contrast ->
    saturation -> hue in the reference's order
    (`train_singlenet_phase_1fc.py:172-177`)."""
    bf = rng.uniform(1 - brightness, 1 + brightness)
    cf = rng.uniform(1 - contrast, 1 + contrast)
    sf = rng.uniform(1 - saturation, 1 + saturation)
    hf = rng.uniform(-hue, hue)

    x = clip.astype(np.float32)
    x = np.clip(x * bf, 0, 255)                       # brightness
    mean_gray = _grayscale(x).mean(axis=(1, 2, 3), keepdims=True)
    x = _blend(x, mean_gray, cf)                      # contrast
    x = _blend(x, _grayscale(x), sf)                  # saturation
    if abs(hf) > 1e-6 and _HAS_CV2:                   # hue (HSV shift)
        u8 = x.astype(np.uint8)
        for i in range(u8.shape[0]):
            hsv = cv2.cvtColor(u8[i], cv2.COLOR_RGB2HSV)
            # cv2 hue range is [0,180); torch hue factor is in turns
            hsv[..., 0] = (hsv[..., 0].astype(np.int32)
                           + int(round(hf * 180))) % 180
            u8[i] = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
        x = u8.astype(np.float32)
    return x.astype(clip.dtype)


def normalize(clip: np.ndarray, mean: Sequence[float],
              std: Sequence[float]) -> np.ndarray:
    """uint8 [0,255] -> float32 normalized (ToTensor + Normalize)."""
    x = clip.astype(np.float32) / 255.0
    return (x - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


# ---------------------------------------------------------------------------
# Pipelines (the train/test transform stacks of the reference,
# `train_memorybank.py:72-130`)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class TrainTransform:
    """Resize(250) -> RandomCrop(224) [-> ColorJitter] -> Flip [-> Rotation]
    -> Normalize; one shared random draw per clip.

    use_native=True routes the crop+flip+normalize tail through the threaded
    C++ library (native/tmrnet_data.cc) — numerically identical, fused in one
    pass per frame. Jitter/rotation (cv2-bound) stay on the numpy path and
    the draw ORDER is preserved so both paths consume the same random stream.
    """

    crop_size: int = 224
    resize: int = 250
    # use_flip mirrors the reference's --flip flag, which gates ColorJitter
    # and Rotation ONLY — RandomHorizontalFlip is applied in BOTH stacks
    # (flip=0: Resize->Crop->Flip; flip=1 adds jitter before and rotation
    # after, `train_memorybank.py:74-90` and identically in every driver).
    use_flip: bool = True
    rotate_degrees: float = 5.0
    jitter: float = 0.1
    # every reference driver hard-codes hue=0.05 next to the 0.1 ranges
    # (`train_memorybank.py:86` and identically in all four trainers)
    hue: float = 0.05
    mean: Sequence[float] = (0.41757566, 0.26098573, 0.25888634)
    std: Sequence[float] = (0.21938758, 0.1983, 0.19342837)
    base_seed: int = 0
    use_native: bool = False
    # normalize=False: stop after the geometric/color ops and return the
    # raw uint8 clip — the uint8 wire for data.device_normalize training
    # (the step normalizes in-jit). Exact: every preceding op is
    # uint8 -> uint8, including color_jitter's trailing astype.
    normalize: bool = True

    def __call__(self, clip: np.ndarray, epoch: int, clip_id: int) -> np.ndarray:
        # Reference transform order: Resize -> RandomCrop -> [ColorJitter ->
        # Flip -> Rotation] -> ToTensor/Normalize (`train_memorybank.py:72-99`).
        rng = clip_rng(epoch, clip_id, self.base_seed)
        clip = resize_clip(clip, (self.resize, self.resize))
        clip = random_crop(clip, self.crop_size, rng)
        if self.use_flip:
            clip = color_jitter(clip, rng, self.jitter, self.jitter,
                                self.jitter, self.hue)
        # the horizontal flip is unconditional in the reference: both
        # --flip stacks contain RandomHorizontalFlip
        clip = random_horizontal_flip(clip, rng)
        if self.use_flip:
            clip = random_rotation(clip, self.rotate_degrees, rng)
        if not self.normalize:
            return np.ascontiguousarray(clip)
        if self.use_native:
            from tmrnet_tpu.data import native

            if native.available():
                t, h = clip.shape[0], clip.shape[1]
                z = np.zeros(t, np.int32)
                # fused u8->f32 normalize (crop/flip already applied)
                return native.preprocess_batch(
                    np.ascontiguousarray(clip), z, z, h, z.astype(np.uint8),
                    np.asarray(self.mean, np.float32),
                    np.asarray(self.std, np.float32))
        return normalize(clip, self.mean, self.std)


def random_choice_frames(clip: np.ndarray, num_frames: int,
                         rng) -> np.ndarray:
    """The fork's RandomChoice frame subsampler (`test-resnet.py:258-270`):
    num_frames indices drawn WITH replacement, sorted, from the clip.
    (Commented out in every published fork transform stack; exposed here as
    an opt-in knob with the same semantics.)"""
    if num_frames <= 0:
        return clip
    idx = np.sort(rng.integers(0, clip.shape[0], size=num_frames))
    return clip[idx]


@dataclasses.dataclass
class VideoTrainTransform:
    """The fork's video-direct train stack (reference `test-resnet.py:206-236`):
    optional RandomChoice frame subsample, clip-shared
    RandomResizedCrop(224, scale=(0.2,1)) + intensity scale to [0,1]
    (no mean/std)."""

    crop_size: int = 224
    scale: Tuple[float, float] = (0.2, 1.0)
    base_seed: int = 0
    num_frames: int = -1  # >0 enables the fork's RandomChoice subsampler

    def __call__(self, clip: np.ndarray, epoch: int, clip_id: int) -> np.ndarray:
        rng = clip_rng(epoch, clip_id, self.base_seed)
        clip = random_choice_frames(clip, self.num_frames, rng)
        clip = random_resized_crop(clip, self.crop_size, rng, self.scale)
        return clip.astype(np.float32) / 255.0


@dataclasses.dataclass
class VideoEvalTransform:
    """Fork video-direct eval stack: center pad-or-crop + [0,1] scaling."""

    crop_size: int = 224

    def __call__(self, clip: np.ndarray, epoch: int = 0, clip_id: int = 0
                 ) -> np.ndarray:
        return pad_or_crop(clip, self.crop_size).astype(np.float32) / 255.0


@dataclasses.dataclass
class EvalTransform:
    """crop_type 0: random crop / 1: center crop / 2 or 3: resize only /
    5: five-crop / 10: ten-crop (`train_memorybank.py:101-127`).

    The reference numbers the direct-resize stack inconsistently: 2 in all
    four training drivers and the resnest eval driver, 3 in the base and
    mutiConv6_3 eval drivers (whose crop 2 duplicates crop 1's
    resize-250 + center-crop, `test_..._2fc_copy.py:237-249`) — both
    numbers map to the single-resize stack here, and the odd drivers'
    crop-2 behavior stays reachable as crop 1.

    Types 5/10 return (ncrops, T, size, size, C); inference averages the
    softmax over crops like the reference's multi-crop evaluation."""

    crop_size: int = 224
    resize: int = 250
    crop_type: int = 1
    mean: Sequence[float] = (0.41757566, 0.26098573, 0.25888634)
    std: Sequence[float] = (0.21938758, 0.1983, 0.19342837)
    base_seed: int = 0
    # False: return cropped uint8 and let the device normalize — 4x less
    # host->device traffic than float32 and no host normalize pass
    # (ClipInference with data.device_normalize=True applies mean/std in-jit)
    normalize: bool = True

    @property
    def num_crops(self) -> int:
        return {5: 5, 10: 10}.get(self.crop_type, 1)

    def _finish(self, clip: np.ndarray) -> np.ndarray:
        if not self.normalize:
            return clip  # uint8, device-side normalize
        return normalize(clip, self.mean, self.std)

    def __call__(self, clip: np.ndarray, epoch: int = 0, clip_id: int = 0
                 ) -> np.ndarray:
        if self.crop_type in (2, 3):
            # reference crop 2 is Resize((224,224)) DIRECTLY, with no 250
            # intermediate (`train_memorybank.py:107-112`) — identical on
            # prepared 250x250 frames, single interpolation on raw ones.
            # The base eval driver numbers the same stack 3
            # (`test_..._2fc_copy.py:244-249`); accept both.
            return self._finish(
                resize_clip(clip, (self.crop_size, self.crop_size)))
        clip = resize_clip(clip, (self.resize, self.resize))
        if self.crop_type == 0:
            # reference test crop 0 crops each frame INDEPENDENTLY (plain
            # torchvision RandomCrop per image); deterministic per clip here
            clip = random_crop_per_frame(
                clip, self.crop_size, clip_rng(epoch, clip_id, self.base_seed))
        elif self.crop_type == 1:
            clip = center_crop(clip, self.crop_size)
        elif self.crop_type == 5:
            return self._finish(five_crop(clip, self.crop_size))
        elif self.crop_type == 10:
            return self._finish(ten_crop(clip, self.crop_size))
        else:
            raise ValueError(f"unsupported crop_type {self.crop_type}")
        return self._finish(clip)
