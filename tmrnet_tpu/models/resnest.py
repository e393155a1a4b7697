"""ResNeSt backbone (split-attention ResNet), NHWC.

The reference's best-accuracy config imports `resnest50` from the `resnest`
pip package (`train_non-local_mutiConv_resnest.py:24,207-210`). This is a
from-scratch JAX implementation of the published architecture (ResNeSt: Split-
Attention Networks, Zhang et al. 2020): radix-2 split attention inside each
bottleneck, deep 3-conv stem (stem_width 32), average-pool downsampling on the
shortcut (avg_down) and before the 3x3 conv in strided blocks (avd).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _bn(train: bool, cdt, name: str, folded: bool = False):
    # folded=True: BN pre-folded into the preceding conv/dense (fold_bn.py)
    if folded:
        return lambda y: y
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=cdt, param_dtype=jnp.float32,
                        name=name)


def _conv(feats: int, k: int, s: int, pad: int, cdt, name: str,
          groups: int = 1, use_bias: bool = False):
    return nn.Conv(feats, (k, k), strides=(s, s), padding=[(pad, pad)] * 2,
                   feature_group_count=groups, use_bias=use_bias, dtype=cdt,
                   param_dtype=jnp.float32, name=name)


class SplitAttention(nn.Module):
    """SplAtConv2d: grouped conv producing radix splits, per-channel attention
    over the radix dimension via rSoftMax."""

    channels: int
    radix: int = 2
    groups: int = 1
    reduction_factor: int = 4
    compute_dtype: Dtype = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cdt = self.compute_dtype
        c, r, g = self.channels, self.radix, self.groups
        in_channels = x.shape[-1]
        y = _conv(c * r, 3, 1, 1, cdt, "conv", groups=g * r,
                  use_bias=self.folded)(x)
        y = _bn(train, cdt, "bn0", self.folded)(y)
        y = nn.relu(y)                                       # (B,H,W,C*r)

        b, h, w, _ = y.shape
        splits = y.reshape(b, h, w, r, c)
        gap = splits.sum(axis=3)                             # (B,H,W,C)
        gap = gap.mean(axis=(1, 2))                          # (B,C) global pool

        inter = max(in_channels * r // self.reduction_factor, 32)
        a = nn.Dense(inter, dtype=cdt, param_dtype=jnp.float32, name="fc1")(gap)
        a = _bn(train, cdt, "bn1", self.folded)(a)
        a = nn.relu(a)
        a = nn.Dense(c * r, dtype=cdt, param_dtype=jnp.float32, name="fc2")(a)

        # rSoftMax: softmax over the radix dim per (cardinal-group, channel).
        # The fc2 output is cardinality-major; transpose to radix-major
        # before flattening (the official rSoftMax's .transpose(1, 2)) so
        # each radix chunk's (g, c/g) layout lines up with the conv
        # splits. Identity at g=1; required for any groups > 1.
        a = a.reshape(b, g, r, c // g)
        # softmax at >= f32 (a floor, not a cast: bf16 upcasts, f64 stays
        # f64 — downcasting f64 here broke float64 parity testing)
        sdt = jnp.promote_types(a.dtype, jnp.float32)
        a = jax.nn.softmax(a.astype(sdt), axis=2).astype(cdt)
        a = a.transpose(0, 2, 1, 3).reshape(b, r, c)
        return jnp.einsum("bhwrc,brc->bhwc", splits, a)


class ResNeStBottleneck(nn.Module):
    planes: int
    strides: int = 1
    radix: int = 2
    expansion: int = 4
    # avg-pool AFTER the split-attention conv when strided (the official
    # resnest50 is avd=True, avd_first=False: SplAtConv2d runs at stride 1
    # on full resolution, then AvgPool2d(3, stride, 1) downsamples)
    avd: bool = True
    compute_dtype: Dtype = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cdt = self.compute_dtype
        fold = self.folded
        out_feats = self.planes * self.expansion
        residual = x

        y = _conv(self.planes, 1, 1, 0, cdt, "conv1", use_bias=fold)(x)
        y = nn.relu(_bn(train, cdt, "bn1", fold)(y))
        y = SplitAttention(self.planes, radix=self.radix, compute_dtype=cdt,
                           folded=fold, name="splat")(y, train)
        if self.avd and self.strides > 1:   # avd_first=False ordering
            y = nn.avg_pool(y, (3, 3), strides=(self.strides,) * 2,
                            padding=[(1, 1)] * 2)
        y = _conv(out_feats, 1, 1, 0, cdt, "conv3", use_bias=fold)(y)
        y = _bn(train, cdt, "bn3", fold)(y)

        if self.strides != 1 or x.shape[-1] != out_feats:
            # avg_down shortcut: stride-s avgpool then 1x1 conv (stride 1).
            if self.strides != 1:
                residual = nn.avg_pool(residual, (self.strides,) * 2,
                                       strides=(self.strides,) * 2)
            residual = _conv(out_feats, 1, 1, 0, cdt, "downsample_conv",
                             use_bias=fold)(residual)
            residual = _bn(train, cdt, "downsample_bn", fold)(residual)
        return nn.relu(y + residual)


class ResNeSt(nn.Module):
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    stem_width: int = 32
    radix: int = 2
    compute_dtype: Dtype = jnp.float32
    # BN weights pre-folded into convs (inference; models/fold_bn.py).
    folded: bool = False

    @property
    def num_features(self) -> int:
        return self.width * (2 ** (len(self.stage_sizes) - 1)) * 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cdt = self.compute_dtype
        fold = self.folded
        x = x.astype(cdt)
        # Deep stem: 3x3 s2 (stem_width) -> 3x3 (stem_width) -> 3x3 (2*stem_width).
        sw = self.stem_width
        x = _conv(sw, 3, 2, 1, cdt, "stem_conv1", use_bias=fold)(x)
        x = nn.relu(_bn(train, cdt, "stem_bn1", fold)(x))
        x = _conv(sw, 3, 1, 1, cdt, "stem_conv2", use_bias=fold)(x)
        x = nn.relu(_bn(train, cdt, "stem_bn2", fold)(x))
        x = _conv(sw * 2, 3, 1, 1, cdt, "stem_conv3", use_bias=fold)(x)
        x = nn.relu(_bn(train, cdt, "stem_bn3", fold)(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)

        for l, n_blocks in enumerate(self.stage_sizes):
            planes = self.width * (2 ** l)
            for i in range(n_blocks):
                strides = 2 if l > 0 and i == 0 else 1
                x = ResNeStBottleneck(
                    planes=planes, strides=strides, radix=self.radix,
                    compute_dtype=cdt, folded=self.folded,
                    name=f"layer{l + 1}_{i}")(x, train)
        return jnp.mean(x, axis=(1, 2))


def resnest50(compute_dtype: Dtype = jnp.float32) -> ResNeSt:
    return ResNeSt(stage_sizes=(3, 4, 6, 3), width=64,
                   compute_dtype=compute_dtype)
