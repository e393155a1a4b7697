"""Procedural fused-backbone inference paths.

Runs a BN-folded ResNet forward where every stride-1 identity bottleneck goes
through the fused Pallas block kernel (ops/fused_bottleneck.py: one HBM
read/write per block) and the stem / strided / projection blocks stay on XLA.
Measured per-stage: 1.4-1.8x over the XLA path (docs/PERFORMANCE.md).

Parameters are the folded tree produced by models/fold_bn.py::fold_resnet —
the same tree the folded ResNet module consumes, so checkpoints flow through
unchanged.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from tmrnet_tpu.experimental.fused_bottleneck import fused_bottleneck
from tmrnet_tpu.experimental.fused_bottleneck_tiled import fused_bottleneck_tiled


def _conv(x, kernel, bias, stride=1, pad=0):
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (stride, stride), [(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (y + bias.astype(jnp.float32)).astype(x.dtype)


def _xla_bottleneck(x, p, stride):
    """Folded bottleneck on XLA (strided / projection blocks)."""
    out_feats = p["conv3"]["kernel"].shape[-1]
    residual = x
    y = jax.nn.relu(_conv(x, p["conv1"]["kernel"], p["conv1"]["bias"]))
    y = jax.nn.relu(_conv(y, p["conv2"]["kernel"], p["conv2"]["bias"],
                          stride=stride, pad=1))
    y = _conv(y, p["conv3"]["kernel"], p["conv3"]["bias"])
    if stride != 1 or x.shape[-1] != out_feats:
        residual = _conv(x, p["downsample_conv"]["kernel"],
                         p["downsample_conv"]["bias"], stride=stride)
    return jax.nn.relu(y.astype(jnp.float32)
                       + residual.astype(jnp.float32)).astype(x.dtype)


# per-stage fused-block batch tiles, sized to the 16 MB VMEM budget
_BLOCK_N = {56: 1, 28: 2, 14: 4, 7: 4}
# tiled (H-sliced, double-buffered DMA) variant: VMEM holds 2 slabs + a copy
# + double-buffered weights, so batch tiles shrink vs the block kernel.
# Stage 4 (C=2048) is excluded: its weight set alone (w1+w2+w3, x2 for the
# BlockSpec double buffer) exceeds the 16 MB VMEM budget — it falls back to
# the whole-image fused kernel, whose 7x7 activations fit trivially.
_TILED_BLOCK_N = {56: 2, 28: 4, 14: 2}


def _tile_h(h: int) -> int:
    """Largest tile height <= 14 that divides H (the kernel requires H %
    block_h == 0); ResNet-50 stages hit 14/14/14/7."""
    if h <= 14:
        return h
    for ht in range(14, 1, -1):
        if h % ht == 0:
            return ht
    return h


def apply_fused_resnet(folded_params: Dict, x: jax.Array,
                       stage_sizes: Sequence[int] = (3, 4, 6, 3),
                       use_fused: bool = True,
                       kernel: str = "block") -> jax.Array:
    """(B, H, W, 3) -> (B, num_features) with the folded param tree.

    kernel: 'block' = whole-image fused bottleneck (ops/fused_bottleneck),
    'tiled' = H-tiled variant with software-pipelined slab DMA
    (ops/fused_bottleneck_tiled)."""
    from flax import linen as nn

    x = jax.nn.relu(_conv(x, folded_params["conv1"]["kernel"],
                          folded_params["conv1"]["bias"], stride=2, pad=3))
    x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)

    for l, n_blocks in enumerate(stage_sizes):
        for i in range(n_blocks):
            p = folded_params[f"layer{l + 1}_{i}"]
            stride = 2 if l > 0 and i == 0 else 1
            identity = (stride == 1
                        and "downsample_conv" not in p
                        and x.shape[-1] == p["conv3"]["kernel"].shape[-1])
            if use_fused and identity:
                if kernel == "tiled" and x.shape[-1] < 2048:
                    x = fused_bottleneck_tiled(
                        x,
                        p["conv1"]["kernel"][0, 0], p["conv1"]["bias"],
                        p["conv2"]["kernel"], p["conv2"]["bias"],
                        p["conv3"]["kernel"][0, 0], p["conv3"]["bias"],
                        block_n=_TILED_BLOCK_N.get(x.shape[1], 2),
                        block_h=_tile_h(x.shape[1]))
                else:
                    x = fused_bottleneck(
                        x,
                        p["conv1"]["kernel"][0, 0], p["conv1"]["bias"],
                        p["conv2"]["kernel"], p["conv2"]["bias"],
                        p["conv3"]["kernel"][0, 0], p["conv3"]["bias"],
                        block_n=_BLOCK_N.get(x.shape[1], 2))
            else:
                x = _xla_bottleneck(x, p, stride)
    return jnp.mean(x, axis=(1, 2))


def fused_tmr_apply(folded_variables: Dict, clips: jax.Array,
                    memory: jax.Array, hidden_dim: int = 512,
                    stage_sizes: Sequence[int] = (3, 4, 6, 3),
                    use_time_conv: bool = True,
                    use_fused: bool = True,
                    kernel: str = "block") -> jax.Array:
    """Full TMRNet inference forward over the fused backbone.

    folded_variables: fold_bn.fold_variables output for a TMRNet model
    (backbone folded; lstm/head params unchanged). clips (B, T, H, W, 3),
    memory (B, W, hidden) -> logits (B, classes)."""
    from tmrnet_tpu.models.blocks import NLBlock, TimeConv
    from tmrnet_tpu.models.lstm import LSTM

    params = folded_variables["params"]
    cdt = clips.dtype
    b, t = clips.shape[:2]
    frames = clips.reshape((b * t,) + clips.shape[2:])
    feats = apply_fused_resnet(params["backbone"], frames, stage_sizes,
                               use_fused=use_fused, kernel=kernel)
    feats = feats.reshape(b, t, -1)
    ys, _ = LSTM(hidden_dim, compute_dtype=cdt).apply(
        {"params": params["encoder"]["lstm"]}, feats)
    st = ys[:, -1, :]
    lt = memory.astype(st.dtype)
    if use_time_conv:
        lt = TimeConv(hidden_dim, cdt).apply(
            {"params": params["time_conv"]}, lt)
    y1 = NLBlock(hidden_dim, compute_dtype=cdt).apply(
        {"params": params["nl_block"]}, st, lt, deterministic=True)
    y = jnp.concatenate([st, y1], axis=-1)
    dense = lambda p, v: v @ p["kernel"].astype(cdt) + p["bias"].astype(cdt)
    y = jax.nn.relu(dense(params["fc_h_c"], y))
    return dense(params["fc_c"], y)
