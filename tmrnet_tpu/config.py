"""Typed configuration for every pipeline stage.

Replaces the reference's per-script argparse flag soup (~20 flags duplicated across
5 drivers, e.g. reference `Training memory bank model/train_singlenet_phase_1fc.py:32-50`
and `Training TMRNet/train_non-local_mutiConv_resnet.py:30-53`) with one typed,
serializable config tree. The five PRESETS correspond to BASELINE.json's configs.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple

# Dataset normalization constants measured by the reference's meanStd.py
# (reference `Training memory bank model/meanStd.py:27-63`; used at e.g.
# `train_singlenet_phase_1fc.py:269`).
CHOLEC80_MEAN: Tuple[float, float, float] = (0.41757566, 0.26098573, 0.25888634)
CHOLEC80_STD: Tuple[float, float, float] = (0.21938758, 0.1983, 0.19342837)

# Cholec80 phase names, order defines label ids 0..6
# (reference `Training TMRNet/get_paths_labels.py:49-54`).
CHOLEC80_PHASES: Tuple[str, ...] = (
    "Preparation",
    "CalotTriangleDissection",
    "ClippingCutting",
    "GallbladderDissection",
    "GallbladderPackaging",
    "CleaningCoagulation",
    "GallbladderRetraction",
)

# M2CAI16 has 8 phases including TrocarPlacement
# (reference `eval/result/matlab-eval/Main_m2cai.m`).
M2CAI_PHASES: Tuple[str, ...] = (
    "TrocarPlacement",
    "Preparation",
    "CalotTriangleDissection",
    "ClippingCutting",
    "GallbladderDissection",
    "GallbladderPackaging",
    "CleaningCoagulation",
    "GallbladderRetraction",
)


@dataclass(frozen=True)
class DataConfig:
    """Dataset, manifest, and input-pipeline settings."""

    # Root directory of extracted frames (one subdir per video) or videos.
    data_root: str = "./data/frames"
    annotation_root: str = "./data/phase_annotations"
    # Manifest format: 'pickle' (train_val_paths_labels.pkl 6-list) or 'csv'
    # (columns frame,class,id — the fork's format, reference
    # `code/train_memorybank.py:55-70`).
    manifest_format: str = "pickle"
    manifest_path: str = "./train_val_paths_labels.pkl"
    # Clip settings: the reference trains on 10-frame 1-fps clips.
    sequence_length: int = 10
    fps: int = 1
    source_fps: int = 25  # raw video fps; keep every (source_fps // fps)-th frame
    # Image geometry: decode -> cutmargin crop -> resize 250 -> crop 224.
    resize: int = 250
    crop_size: int = 224
    # Augmentation (train): clip-deterministic crop/flip/rotate/jitter.
    # use_flip = the reference's --flip: gates ColorJitter+Rotation only;
    # the horizontal flip itself runs in BOTH stacks (transforms.py).
    use_flip: bool = True
    rotate_degrees: float = 5.0
    color_jitter: float = 0.1
    # hue has its own (narrower) range in every reference driver:
    # ColorJitter(brightness=0.1, contrast=0.1, saturation=0.1, hue=0.05)
    color_jitter_hue: float = 0.05
    # Test-time crop type (matches the reference's --crop flag): 0 random /
    # 1 center / 2 resize-only (3 = the base eval driver's number for the
    # same stack, `test_..._2fc_copy.py:244-249`) / 5 five-crop / 10
    # ten-crop. Five/ten-crop scores are softmax-averaged in ClipInference.
    test_crop_type: int = 1
    mean: Tuple[float, float, float] = CHOLEC80_MEAN
    std: Tuple[float, float, float] = CHOLEC80_STD
    num_classes: int = 7
    phase_names: Tuple[str, ...] = CHOLEC80_PHASES
    # Host pipeline
    batch_clips: int = 40  # clips per global batch (reference uses batch 400 frames)
    prefetch: int = 2
    num_workers: int = 8
    use_process_workers: bool = False  # GIL-free decode (forked processes)
    # eval: ship uint8 over PCIe and normalize in-jit (4x less traffic than
    # f32, no host normalize pass); identical outputs (parity-tested)
    device_normalize: bool = False
    use_native_preproc: bool = True  # C++ libtmrnet_data.so if built, else numpy


@dataclass(frozen=True)
class ModelConfig:
    """Backbone + temporal head architecture."""

    backbone: str = "resnet50"  # resnet50 | resnest50 | tiny (tests)
    # ResNet stage depths; (3,4,6,3) = ResNet-50. Tests use smaller.
    stage_sizes: Tuple[int, ...] = (3, 4, 6, 3)
    width: int = 64
    feature_dim: int = 2048  # backbone output dim (after global avgpool)
    hidden_dim: int = 512  # LSTM hidden size
    num_classes: int = 7
    # Head variant: 'stage1' (trunk+LSTM+fc), 'lfb' (trunk+LSTM, last step only),
    # 'tmr' (TimeConv+NLBlock memory head), 'nl_only' (NLBlock without TimeConv,
    # reference `train_only_non-local_pretrained.py`).
    head: str = "tmr"
    dropout_stage1: float = 0.2
    dropout_head: float = 0.5
    dropout_nl: float = 0.2
    # Compute dtype: bfloat16 on TPU; float32 for reference-parity logit checks.
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    # Use Pallas fused kernels for NLBlock/TimeConv where available.
    use_pallas: bool = False
    # Inference-only: BatchNorm pre-folded into conv weights (models/fold_bn).
    folded: bool = False
    # jax.checkpoint (remat) each bottleneck block: trades FLOPs for HBM so
    # much larger train batches fit (TrainConfig.remat flows into this).
    remat: bool = False


@dataclass(frozen=True)
class TrainConfig:
    """Optimizer, schedule, loop settings."""

    epochs: int = 25
    optimizer: str = "sgd"  # sgd | adam
    lr: float = 5e-4
    momentum: float = 0.9
    weight_decay: float = 5e-4
    dampening: float = 0.0
    nesterov: bool = False
    # The reference trains trunk+lstm at lr/10 and heads at lr
    # (`train_non-local_mutiConv_resnet.py:795-818`).
    trunk_lr_scale: float = 0.1
    # Schedule: 'step' (StepLR) | 'plateau' (ReduceLROnPlateau) | 'constant'
    schedule: str = "plateau"
    step_size: int = 5  # --sgdstep default (`train_singlenet_phase_1fc.py:47`)
    gamma: float = 0.1
    plateau_factor: float = 0.1
    # torch ReduceLROnPlateau defaults (the reference constructs it with
    # no kwargs beyond 'min', `train_singlenet_phase_1fc.py:493`): factor
    # 0.1, patience 10.
    plateau_patience: int = 10
    # Loss: class-weighted CE summed over the batch, scored on the clip's last
    # frame only (`train_singlenet_phase_1fc.py:551-566`).
    class_weighting: bool = True
    label_smoothing: float = 0.0
    seed: int = 0
    log_every: int = 50
    # Mid-epoch validation on one held-out minibatch every N train steps
    # (0 = off), like the reference's valMinibatch scalars
    # (`train_only_non-local_pretrained.py:418-457,746-757`).
    val_minibatch_every: int = 0
    # Stop when val accuracy hasn't improved (by the BestTracker rule) for
    # this many consecutive epochs; 0 = run all train.epochs (the reference
    # always runs to completion and keeps the best checkpoint — this only
    # saves the wasted tail).
    early_stop_patience: int = 0
    # Log the first clip of every Nth train batch as images (TensorBoard +
    # PNG dump), like the reference's Comet input-sequence logging
    # (`test-resnet.py:737-746`); 0 = off.
    log_images_every: int = 0
    checkpoint_dir: str = "./checkpoints"
    keep_checkpoints: int = 3
    resume: bool = True  # resume from latest checkpoint if present
    # Preemption-safe training: catch SIGTERM/SIGINT (the TPU-pod preemption
    # and operator-^C signals), finish the in-flight step, save a checkpoint
    # marked for epoch replay, and exit cleanly — `resume` then replays the
    # interrupted epoch from the preempted weights instead of losing all
    # work since the last epoch boundary. A second signal force-interrupts.
    # Handlers only install on the main thread; False = raw signals.
    preempt_save: bool = True
    # Async checkpointing (orbax AsyncCheckpointer): save() returns after
    # the device->host snapshot and serializes/writes in a background
    # thread, overlapping the next epoch's compute. Best-checkpoint
    # promotion and train-loop exit still wait for durability.
    async_checkpoint: bool = False
    remat: bool = False  # jax.checkpoint the backbone to trade FLOPs for HBM
    donate_state: bool = True
    # Accumulate gradients over k micro-batches before each optimizer step
    # (optax.MultiSteps, gradient MEAN over the k micro-batches): reaches the
    # reference's large effective batches (bs 400,
    # `train_non-local_mutiConv_resnest.py:29-30`) on one chip. Combine with
    # remat for the largest effective batches.
    grad_accum: int = 1
    # Global-gradient-norm clip applied before the optimizer (torch
    # clip_grad_norm_ semantics). 0 = off (reference parity: it never
    # clips). The stage-2 residual attention stack destabilizes at high lr
    # (loss -> 1e21 -> NaN measured at lr 2e-2 on the synthetic efficacy
    # task); clipping is the production guard for aggressive schedules.
    grad_clip: float = 0.0


@dataclass(frozen=True)
class MemoryConfig:
    """Long-term Feature Bank settings."""

    window: int = 30
    feature_dim: int = 512
    cache_path: str = "./LFB/lfb.npz"
    load_cached: bool = True
    # The reference's lookback dict silently crosses video boundaries
    # (`train_non-local_mutiConv_resnet.py:315-322`); default is the paper's
    # intended clamp-at-video-start. Set True to replicate the reference quirk.
    compat_cross_video: bool = False


@dataclass(frozen=True)
class EvalConfig:
    """Inference + scoring settings."""

    checkpoint: str = ""
    batch_clips: int = 64
    pred_dir: str = "./eval/phase"
    gt_dir: str = "./eval/gt-phase"
    protocol: str = "cholec80"  # cholec80 | m2cai
    relaxed_seconds: int = 10
    export_fps: int = 25  # txt rows are 25*k frame ids (export_phase_copy.py:63-73)
    test_videos: Tuple[int, int] = (41, 80)  # inclusive video-number range
    # --engine video: run B same-bucket videos per compiled program
    # (VideoInference.run_videos). >1 fills the chip on short videos
    # (+33% at 4x512 measured) but holds B transformed videos in host RAM.
    video_batch: int = 1
    # --engine video: run the backbone over frame chunks of this size
    # (lax.map) instead of all frames at once. Bounds peak activation HBM to
    # O(chunk) frames — without it the conv1 activations of one program cap
    # the frame budget at ~8k frames on a 16 GB v5e (batch x length).
    # 0 = auto (chunk by 1024 once a program exceeds 4096 total frames —
    # the measured safe ceiling; smaller programs run unchunked exactly as
    # before), -1 = never chunk, >0 = explicit chunk size.
    backbone_chunk: int = 0
    # --engine video: corpus mode — ALL videos' frames run as one flat
    # stream through fixed `corpus_chunk`-frame trunk launches (zero
    # per-video backbone padding, one compiled trunk program; the tiny
    # memory head still runs per video on bucketed feature slices). One
    # video in host RAM at a time. Outputs equal per-video runs.
    corpus: bool = False
    # 4096 measured best (5,261 fps vs 5,167 at 2048 on the 40-video pass):
    # one trunk's activations at 4096 frames is the known-safe HBM point.
    corpus_chunk: int = 4096


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh / sharding settings (SPMD via jax.sharding + jit)."""

    data_axis: str = "data"
    model_axis: str = "model"
    # -1 means "all devices on the data axis".
    data_parallel: int = -1
    model_parallel: int = 1
    multihost: bool = False  # jax.distributed.initialize() when True
    # Explicit rendezvous for manual multi-controller launches (all three
    # set together, e.g. --set mesh.coordinator=host:1234). Empty/-1 =
    # auto-detect (TPU pod metadata / Slurm / OpenMPI environments).
    coordinator: str = ""
    num_processes: int = -1
    process_id: int = -1


@dataclass(frozen=True)
class ExperimentConfig:
    name: str = "tmrnet"
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    memory: MemoryConfig = field(default_factory=MemoryConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    def replace(self, **kw: Any) -> "ExperimentConfig":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @staticmethod
    def from_json(text: str) -> "ExperimentConfig":
        raw = json.loads(text)

        def build(cls, d):
            kwargs = {}
            for f in dataclasses.fields(cls):
                if f.name not in d:
                    continue
                v = d[f.name]
                if dataclasses.is_dataclass(f.type) or f.name in (
                    "data", "model", "train", "memory", "eval", "mesh"):
                    sub_cls = {
                        "data": DataConfig, "model": ModelConfig,
                        "train": TrainConfig, "memory": MemoryConfig,
                        "eval": EvalConfig, "mesh": MeshConfig,
                    }[f.name]
                    v = build(sub_cls, v)
                elif isinstance(v, list):
                    v = tuple(v)
                kwargs[f.name] = v
            return cls(**kwargs)

        return build(ExperimentConfig, raw)


def _preset_memorybank() -> ExperimentConfig:
    """Config 1: stage-1 memory-bank model (ResNet-50+LSTM, 10-frame clip, 224px).

    Mirrors reference `Training memory bank model/train_singlenet_phase_1fc.py`.
    """
    return ExperimentConfig(
        name="memorybank",
        model=ModelConfig(head="stage1"),
        train=TrainConfig(lr=5e-4, optimizer="sgd", schedule="plateau"),
    )


def _preset_nl_only() -> ExperimentConfig:
    """Config 2: non-local only head, LFB window 40.

    Mirrors reference `Training TMRNet/train_only_non-local_pretrained.py` (LFB_l=40
    default at `:44`).
    """
    return ExperimentConfig(
        name="tmr-nl-only",
        model=ModelConfig(head="nl_only"),
        memory=MemoryConfig(window=40),
        train=TrainConfig(lr=5e-7),
    )


def _preset_tmr_resnet() -> ExperimentConfig:
    """Config 3: full TMRNet (TimeConv + NLBlock), ResNet-50.

    Mirrors reference `Training TMRNet/train_non-local_mutiConv_resnet.py`
    (default lr 5e-7 at `:41`, LFB_l=30 at `:49`).
    """
    return ExperimentConfig(
        name="tmr-resnet50",
        model=ModelConfig(head="tmr"),
        memory=MemoryConfig(window=30),
        train=TrainConfig(lr=5e-7),
    )


def _preset_tmr_resnest() -> ExperimentConfig:
    """Config 4: TMRNet with ResNeSt-50 split-attention backbone (best accuracy).

    Mirrors reference `Training TMRNet/train_non-local_mutiConv_resnest.py`.
    """
    return ExperimentConfig(
        name="tmr-resnest50",
        model=ModelConfig(backbone="resnest50", head="tmr"),
        memory=MemoryConfig(window=30),
        train=TrainConfig(lr=5e-7),
    )


def _preset_inference() -> ExperimentConfig:
    """Config 5: end-to-end inference pipeline over the 40-video Cholec80 test split."""
    return ExperimentConfig(
        name="inference-e2e",
        model=ModelConfig(head="tmr", compute_dtype="bfloat16"),
        memory=MemoryConfig(window=30),
        eval=EvalConfig(batch_clips=128),
    )


def _preset_m2cai() -> ExperimentConfig:
    """M2CAI16 workflow challenge: 8 phases (incl. TrocarPlacement), 27/14
    video split, 25-fps scoring (`Main_m2cai.m`, `Evaluate_m2cai.m`)."""
    base = _preset_tmr_resnet()
    return ExperimentConfig(
        name="tmr-resnet50-m2cai",
        data=dataclasses.replace(base.data, num_classes=8,
                                 phase_names=M2CAI_PHASES),
        model=dataclasses.replace(base.model, num_classes=8),
        memory=base.memory,
        train=base.train,
        eval=EvalConfig(protocol="m2cai", test_videos=(1, 14)),
    )


PRESETS = {
    "memorybank": _preset_memorybank,
    "tmr-nl-only": _preset_nl_only,
    "tmr-resnet50": _preset_tmr_resnet,
    "tmr-resnest50": _preset_tmr_resnest,
    "inference-e2e": _preset_inference,
    "tmr-resnet50-m2cai": _preset_m2cai,
}


def _coerce(value: str, current: Any) -> Any:
    if isinstance(current, bool):
        return value.lower() in ("1", "true", "yes")
    if isinstance(current, int):
        return int(value)
    if isinstance(current, float):
        return float(value)
    if isinstance(current, tuple):
        parts = [p for p in value.split(",") if p]
        elem = current[0] if current else value
        return tuple(_coerce(p, elem) for p in parts)
    return value


def apply_override(cfg: ExperimentConfig, dotted: str) -> ExperimentConfig:
    """Dotted-string override, the CLI's --set semantics as a library call:
    apply_override(cfg, "data.batch_clips=64"). Values coerce to the field's
    current type (bools accept 1/true/yes, tuples split on commas)."""
    key, eq, value = dotted.partition("=")
    if not eq:
        raise ValueError(f"override {dotted!r}: expected KEY=VALUE")
    parts = key.strip().split(".")
    if len(parts) == 1:
        return dataclasses.replace(cfg, **{parts[0]: _coerce(value, getattr(cfg, parts[0]))})

    def rec(node, path):
        if len(path) == 1:
            return dataclasses.replace(
                node, **{path[0]: _coerce(value, getattr(node, path[0]))})
        child = getattr(node, path[0])
        return dataclasses.replace(node, **{path[0]: rec(child, path[1:])})

    return rec(cfg, parts)


def get_preset(name: str) -> ExperimentConfig:
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; available: {sorted(PRESETS)}")
    return PRESETS[name]()
