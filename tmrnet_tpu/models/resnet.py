"""ResNet backbone (v1.5 bottleneck), NHWC, TPU-first.

Structurally equivalent to the torchvision resnet50 trunk the reference wraps
(`train_singlenet_phase_1fc.py:203-213`: conv1..layer4 + global avgpool ->
2048-d), with explicit torch-style padding so imported PyTorch weights produce
matching activations. stage_sizes/width are configurable so tests can run a
micro variant; (3,4,6,3)/64 is ResNet-50.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class Bottleneck(nn.Module):
    planes: int
    strides: int = 1
    expansion: int = 4
    compute_dtype: Dtype = jnp.float32
    norm: Callable = nn.BatchNorm
    # folded=True: BatchNorms pre-folded into conv weights (inference mode,
    # see models/fold_bn.py) — convs carry bias, no norm ops in the graph.
    folded: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        conv = lambda feats, k, s, pad, name: nn.Conv(
            feats, (k, k), strides=(s, s), padding=[(pad, pad)] * 2,
            use_bias=self.folded, dtype=self.compute_dtype,
            param_dtype=jnp.float32, name=name)
        if self.folded:
            bn = lambda name: (lambda y: y)
        else:
            bn = lambda name: self.norm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.compute_dtype, param_dtype=jnp.float32, name=name)

        out_feats = self.planes * self.expansion
        residual = x
        y = conv(self.planes, 1, 1, 0, "conv1")(x)
        y = nn.relu(bn("bn1")(y))
        # v1.5: the stride lives on the 3x3 conv (torchvision semantics).
        y = conv(self.planes, 3, self.strides, 1, "conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = conv(out_feats, 1, 1, 0, "conv3")(y)
        y = bn("bn3")(y)
        if self.strides != 1 or x.shape[-1] != out_feats:
            residual = conv(out_feats, 1, self.strides, 0, "downsample_conv")(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    compute_dtype: Dtype = jnp.float32
    norm: Callable = nn.BatchNorm
    # When set, wraps each stage in jax.checkpoint to trade FLOPs for HBM.
    remat: bool = False
    # BN weights pre-folded into convs (inference; see models/fold_bn.py).
    folded: bool = False

    @property
    def num_features(self) -> int:
        return self.width * (2 ** (len(self.stage_sizes) - 1)) * Bottleneck.expansion

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """x: (B, H, W, 3) NHWC in [normalized] float -> (B, num_features)."""
        cdt = self.compute_dtype
        x = x.astype(cdt)
        x = nn.Conv(self.width, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                    use_bias=self.folded, dtype=cdt, param_dtype=jnp.float32,
                    name="conv1")(x)
        if not self.folded:
            x = self.norm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, dtype=cdt, param_dtype=jnp.float32,
                          name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)

        block_cls = Bottleneck
        if self.remat:
            block_cls = nn.remat(Bottleneck, static_argnums=(2,))
        for l, n_blocks in enumerate(self.stage_sizes):
            planes = self.width * (2 ** l)
            for i in range(n_blocks):
                strides = 2 if l > 0 and i == 0 else 1
                x = block_cls(planes=planes, strides=strides, compute_dtype=cdt,
                              norm=self.norm, folded=self.folded,
                              name=f"layer{l + 1}_{i}")(x, train)
        # Global average pool == torchvision AdaptiveAvgPool2d((1,1)).
        return jnp.mean(x, axis=(1, 2))


def resnet50(compute_dtype: Dtype = jnp.float32, remat: bool = False) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), width=64, compute_dtype=compute_dtype,
                  remat=remat)


def tiny_resnet(compute_dtype: Dtype = jnp.float32) -> ResNet:
    """Micro variant for CPU tests: same topology, 2 stages, width 8."""
    return ResNet(stage_sizes=(1, 1), width=8, compute_dtype=compute_dtype)
