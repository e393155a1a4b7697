"""TMRNet model heads.

Three heads over a shared clip encoder (backbone + LSTM), mirroring the
reference's three model classes (SURVEY.md 2.3):

* MemoryBankModel -- stage-1 trainer head: per-timestep dropout+fc over LSTM
  outputs (reference `train_singlenet_phase_1fc.py:201-232`).
* LFBExtractor -- frozen feature extractor: last-timestep hidden state per clip
  (reference `train_non-local_mutiConv_resnet.py:256-285`).
* TMRNet -- the memory-relation head: TimeConv + NLBlock over the LFB window,
  concat with the clip embedding, two-layer classifier (reference
  `train_non-local_mutiConv_resnet.py:208-253`); `use_time_conv=False` gives
  the only-non-local variant (`train_only_non-local_pretrained.py:201-242`).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from tmrnet_tpu.config import ModelConfig
from tmrnet_tpu.models.blocks import NLBlock, TimeConv
from tmrnet_tpu.models.lstm import LSTM
from tmrnet_tpu.models.resnet import ResNet

_xavier = nn.initializers.xavier_uniform()


class ClipEncoder(nn.Module):
    """Backbone over every frame + LSTM over the clip. (B,T,H,W,3) -> (B,T,H)."""

    backbone: nn.Module
    hidden_dim: int = 512
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, clips: jax.Array, train: bool = False) -> jax.Array:
        b, t = clips.shape[:2]
        frames = clips.reshape((b * t,) + clips.shape[2:])
        feats = self.backbone(frames, train=train)          # (B*T, F)
        feats = feats.reshape(b, t, -1)
        ys, _ = LSTM(self.hidden_dim, compute_dtype=self.compute_dtype,
                     name="lstm")(feats)
        return ys


class MemoryBankModel(nn.Module):
    """Stage-1 model: logits for every timestep (loss uses only the last)."""

    backbone: nn.Module
    num_classes: int = 7
    hidden_dim: int = 512
    dropout: float = 0.2
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, clips: jax.Array, train: bool = False,
                 deterministic: Optional[bool] = None) -> jax.Array:
        det = not train if deterministic is None else deterministic
        ys = ClipEncoder(self.backbone, self.hidden_dim, self.compute_dtype,
                         name="encoder")(clips, train)
        ys = nn.Dropout(self.dropout, deterministic=det)(ys)
        logits = nn.Dense(self.num_classes, kernel_init=_xavier,
                          dtype=self.compute_dtype, param_dtype=jnp.float32,
                          name="fc")(ys)
        return logits  # (B, T, num_classes)


class LFBExtractor(nn.Module):
    """Frozen clip-feature extractor for LFB building: last LSTM step only."""

    backbone: nn.Module
    hidden_dim: int = 512
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, clips: jax.Array, train: bool = False) -> jax.Array:
        ys = ClipEncoder(self.backbone, self.hidden_dim, self.compute_dtype,
                         name="encoder")(clips, train)
        return ys[:, -1, :]  # (B, hidden)


class TMRNet(nn.Module):
    """Memory-relation head over (clip, LFB window)."""

    backbone: nn.Module
    num_classes: int = 7
    hidden_dim: int = 512
    use_time_conv: bool = True
    dropout: float = 0.5
    dropout_nl: float = 0.2
    compute_dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, clips: jax.Array, long_feature: jax.Array,
                 train: bool = False,
                 deterministic: Optional[bool] = None) -> jax.Array:
        """clips: (B,T,H,W,3); long_feature: (B,window,hidden) -> (B, classes)."""
        det = not train if deterministic is None else deterministic
        ys = ClipEncoder(self.backbone, self.hidden_dim, self.compute_dtype,
                         name="encoder")(clips, train)
        y = ys[:, -1, :]                                     # St (B, hidden)
        lt = long_feature.astype(y.dtype)
        if self.use_time_conv:
            lt = TimeConv(self.hidden_dim, self.compute_dtype,
                          name="time_conv")(lt)
        y1 = NLBlock(self.hidden_dim, self.dropout_nl, self.compute_dtype,
                     use_pallas=self.use_pallas,
                     name="nl_block")(y, lt, deterministic=det)
        y = jnp.concatenate([y, y1], axis=-1)                # (B, 2*hidden)
        # Reference order: fc_h_c -> dropout -> relu -> fc_c
        # (`train_non-local_mutiConv_resnet.py:249-253`).
        y = nn.Dense(self.hidden_dim, kernel_init=_xavier,
                     dtype=self.compute_dtype, param_dtype=jnp.float32,
                     name="fc_h_c")(y)
        y = nn.Dropout(self.dropout, deterministic=det)(y)
        y = nn.relu(y)
        return nn.Dense(self.num_classes, kernel_init=_xavier,
                        dtype=self.compute_dtype, param_dtype=jnp.float32,
                        name="fc_c")(y)


def build_backbone(cfg: ModelConfig):
    cdt = jnp.dtype(cfg.compute_dtype)
    folded = getattr(cfg, "folded", False)
    remat = getattr(cfg, "remat", False)
    if cfg.backbone == "resnet50":
        return ResNet(stage_sizes=tuple(cfg.stage_sizes), width=cfg.width,
                      compute_dtype=cdt, remat=remat, folded=folded)
    if cfg.backbone == "resnest50":
        from tmrnet_tpu.models.resnest import ResNeSt

        return ResNeSt(stage_sizes=tuple(cfg.stage_sizes), width=cfg.width,
                       compute_dtype=cdt, folded=folded)
    if cfg.backbone == "tiny":
        return ResNet(stage_sizes=(1, 1), width=8, compute_dtype=cdt,
                      folded=folded, remat=remat)
    raise ValueError(f"unknown backbone {cfg.backbone!r}")


def build_model(cfg: ModelConfig):
    """ModelConfig -> flax module for the configured head."""
    cdt = jnp.dtype(cfg.compute_dtype)
    backbone = build_backbone(cfg)
    if cfg.head == "stage1":
        return MemoryBankModel(backbone, cfg.num_classes, cfg.hidden_dim,
                               cfg.dropout_stage1, cdt)
    if cfg.head == "lfb":
        return LFBExtractor(backbone, cfg.hidden_dim, cdt)
    if cfg.head in ("tmr", "nl_only"):
        return TMRNet(backbone, cfg.num_classes, cfg.hidden_dim,
                      use_time_conv=(cfg.head == "tmr"),
                      dropout=cfg.dropout_head, dropout_nl=cfg.dropout_nl,
                      compute_dtype=cdt, use_pallas=cfg.use_pallas)
    raise ValueError(f"unknown head {cfg.head!r}")
