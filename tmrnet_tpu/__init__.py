"""tmrnet-tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework for surgical workflow
(phase) recognition from video, with the full capabilities of the PyTorch reference
lucieDLE/TMRNet (Temporal Memory Relation Network, IEEE TMI 2021).

Layer map (mirrors SURVEY.md section 1, rebuilt TPU-first):

  data/      -- video decode, black-margin crop, manifests (pickle/CSV compat),
                clip indexing, clip-deterministic functional augmentations,
                host->HBM feed pipeline (C++-accelerated preprocessing).
  models/    -- ResNet-50 / ResNeSt-50 backbones (NHWC, bf16-ready), lax.scan LSTM,
                NLBlock non-local memory read, multi-scale TimeConv, TMRNet heads,
                PyTorch state_dict weight converters.
  memory/    -- the Long-term Feature Bank (LFB): on-device streaming build,
                HBM-resident bank, device-side window gather, disk cache.
  train/     -- optax param-group optimizers (trunk lr/10 semantics), schedules,
                class-weighted last-frame CE, stage-1 / stage-2 trainers.
  parallel/  -- jax.sharding Mesh construction, data/model axis shardings,
                pjit train/eval steps, multi-host init.
  eval/      -- batched + full-video-scan inference, prediction export
                (video<N>-phase.txt), relaxed-boundary Jaccard/Prec/Rec/Acc
                scoring (Python port of the MATLAB protocol), sklearn-style P/R.
  ops/       -- Pallas TPU kernels for the hot ops (fused non-local attention,
                fused multi-branch temporal conv) with XLA fallbacks.
  cli.py     -- one CLI: prepare | train-bank | build-lfb | train-tmr | test |
                export | evaluate (replaces the reference's 5 copy-pasted drivers).
"""

__version__ = "0.1.0"

from tmrnet_tpu.config import (  # noqa: F401
    DataConfig,
    ModelConfig,
    TrainConfig,
    MemoryConfig,
    EvalConfig,
    MeshConfig,
    ExperimentConfig,
    PRESETS,
)
