"""Procedurally generated phase-structured videos whose labels REQUIRE
temporal memory.

The reference method's premise is that a long-term feature bank lets the
classifier disambiguate visually similar frames by phase history
(reference `Training TMRNet/train_non-local_mutiConv_resnet.py:208-253`).
Real Cholec80 assets are not available in this environment, so this module
builds a synthetic task with that exact structure, used by the learning
efficacy study (docs/QUALITY.md, tests/test_efficacy.py):

* Each video is one monotonic pass through phases ``0..P-1`` (like a
  surgery), each phase lasting a random number of frames.
* Every phase renders as a solid "token" appearance (color + noise).
  **Ambiguous pairs of phases share a token**: with the default
  ``PHASE_TOKENS`` map, phases 1 and 4 look pixel-identical, as do 3
  and 6. A frame-only (or single-clip) model cannot do better than a
  coin flip on a clip that lies entirely inside an ambiguous phase.
* The phases *preceding* the two members of each ambiguous pair render
  distinctly (0 vs 3, and 2 vs 5), and phase durations are chosen so the
  memory window always reaches back into the preceding phase. A model
  that reads the long-term feature bank can therefore disambiguate every
  frame; a model without memory cannot.

With durations in ``[dur_min, dur_max]`` and clip length ``seq``, a clip
whose frames all lie inside an ambiguous phase is undecidable without
memory; the expected frame-only accuracy ceiling is

    1 - (ambiguous phases / P) * E[(dur - seq + 1) / dur] * 0.5

(~0.84 for the defaults), while the memory ceiling is ~1.0 as long as
``window + seq - 2 >= dur_max`` (the gather in `memory/lfb.py` looks back
``window`` clip rows, each summarizing ``seq`` frames).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from tmrnet_tpu.config import CHOLEC80_PHASES

# Token (appearance) id per phase. Phases 1 & 4 share token 1; phases 3 & 6
# share token 3. Their predecessors (0 vs 3, 2 vs 5) render distinctly, so
# the ambiguity is exactly resolvable by looking one phase back.
PHASE_TOKENS: Tuple[int, ...] = (0, 1, 2, 3, 1, 5, 3)

# Visually well-separated base colors (survive the train stack's ±10%
# brightness/contrast jitter with large margins).
_PALETTE = np.array([
    (200, 40, 40),    # 0 red
    (40, 180, 40),    # 1 green
    (40, 80, 220),    # 2 blue
    (230, 200, 40),   # 3 yellow
    (180, 40, 200),   # 4 magenta
    (40, 200, 200),   # 5 cyan
    (240, 130, 30),   # 6 orange
    (150, 150, 150),  # 7 gray
], dtype=np.int16)


def ambiguous_phases(tokens: Sequence[int] = PHASE_TOKENS) -> List[int]:
    """Phases whose token is shared with at least one other phase."""
    return [p for p, t in enumerate(tokens)
            if sum(1 for u in tokens if u == t) > 1]


def render_frames(tokens: np.ndarray, hw: int,
                  rng: np.random.Generator) -> np.ndarray:
    """Token id per frame -> (N, hw, hw, 3) uint8 frames: solid token color
    + per-frame brightness offset + iid pixel noise."""
    base = _PALETTE[np.asarray(tokens) % len(_PALETTE)]          # (N, 3)
    frames = np.broadcast_to(base[:, None, None, :],
                             (len(tokens), hw, hw, 3)).astype(np.int16)
    brightness = rng.integers(-12, 13, (len(tokens), 1, 1, 1), dtype=np.int16)
    noise = rng.integers(-25, 26, frames.shape, dtype=np.int16)
    return np.clip(frames + brightness + noise, 0, 255).astype(np.uint8)


def generate_video(rng: np.random.Generator, num_phases: int = 7,
                   dur_range: Tuple[int, int] = (15, 25), hw: int = 32,
                   tokens: Sequence[int] = PHASE_TOKENS,
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """One video: phases 0..num_phases-1 in order with random durations.
    Returns (frames uint8 (N,hw,hw,3), labels int64 (N,))."""
    if len(tokens) < num_phases:
        raise ValueError(f"need >= {num_phases} tokens, got {len(tokens)}")
    durs = rng.integers(dur_range[0], dur_range[1] + 1, num_phases)
    labels = np.repeat(np.arange(num_phases, dtype=np.int64), durs)
    frame_tokens = np.asarray(tokens, np.int64)[labels]
    return render_frames(frame_tokens, hw, rng), labels


def write_synthetic_dataset(
    out_dir: str,
    splits: Dict[str, int],
    seed: int = 0,
    num_phases: int = 7,
    dur_range: Tuple[int, int] = (15, 25),
    hw: int = 32,
    tokens: Sequence[int] = PHASE_TOKENS,
    phase_names: Optional[Sequence[str]] = None,
) -> Dict[str, str]:
    """Write a synthetic dataset in the exact on-disk layout the real
    pipeline consumes: packed raw uint8 `.npy` videos (data/packed.py)
    under ``<out_dir>/frames-<split>/`` plus ``<vid>-phase.txt``
    annotations (header + ``frame_idx<TAB>PhaseName`` rows) under
    ``<out_dir>/annotations/``, so ``python -m tmrnet_tpu manifest
    --stride 1`` builds manifests for every split unchanged.

    splits: ordered {split_name: num_videos}; video ids are numeric and
    globally unique across splits (numeric dir-order parity preserved).
    Returns {split_name: frames_dir} (+ {"annotations": dir}).
    """
    names = list(phase_names or CHOLEC80_PHASES)
    if len(names) < num_phases:
        raise ValueError(f"need >= {num_phases} phase names")
    rng = np.random.default_rng(seed)
    ann_dir = os.path.join(out_dir, "annotations")
    os.makedirs(ann_dir, exist_ok=True)
    out: Dict[str, str] = {"annotations": ann_dir}
    vid = 0
    for split, count in splits.items():
        frames_dir = os.path.join(out_dir, f"frames-{split}")
        os.makedirs(frames_dir, exist_ok=True)
        out[split] = frames_dir
        for _ in range(count):
            vid += 1
            frames, labels = generate_video(rng, num_phases, dur_range, hw,
                                            tokens)
            np.save(os.path.join(frames_dir, f"{vid}.npy"), frames)
            with open(os.path.join(ann_dir, f"{vid}-phase.txt"), "w") as f:
                f.write("Frame\tPhase\n")
                for j, lab in enumerate(labels.tolist()):
                    f.write(f"{j}\t{names[lab]}\n")
    return out


def frame_only_ceiling(num_phases: int = 7, seq: int = 10,
                       dur_range: Tuple[int, int] = (15, 25),
                       tokens: Sequence[int] = PHASE_TOKENS) -> float:
    """Expected accuracy ceiling of a memoryless model on this task: clips
    fully inside an ambiguous phase are a coin flip; everything else is
    decidable from the clip itself."""
    amb = len(ambiguous_phases(tokens))
    durs = np.arange(dur_range[0], dur_range[1] + 1, dtype=np.float64)
    undecidable = float(np.mean(np.maximum(durs - seq + 1, 0) / durs))
    return 1.0 - (amb / num_phases) * undecidable * 0.5
