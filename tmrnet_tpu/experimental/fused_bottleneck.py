"""Pallas TPU kernel: fully-fused ResNet bottleneck block (inference).

One kernel computes an entire stride-1 bottleneck — 1x1 conv + bias + relu,
3x3 conv (9 shifted-tap MXU matmuls, f32 VMEM accumulator) + bias + relu,
1x1 conv + bias, residual add + relu — reading the input activation from HBM
once and writing the output once. The XLA path round-trips the (N, H, W, C)
activation through HBM at every conv (~6 tensor transfers per block vs 2
here), which is the backbone's bandwidth gap at inference.

Weights are the BN-folded inference form (models/fold_bn.py): conv kernels
scaled by the BN affine, biases carrying the BN shift. 1x1 kernels are passed
as (Cin, Cout) matrices; the 3x3 kernel as (3, 3, P, P).

Prototype scope: stride-1 identity-residual blocks (13 of ResNet-50's 16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, o_ref,
            y1_ref, acc_ref):
    x = x_ref[:]                                          # (Nb, H, W, C)
    nb, h, w, c = x.shape
    p = w1_ref.shape[1]                                   # planes

    # ---- 1x1 reduce + relu -> y1 scratch (Nb, H, W, P)
    y1 = jnp.dot(x.reshape(nb * h * w, c), w1_ref[:],
                 preferred_element_type=jnp.float32)
    y1 = jax.nn.relu(y1 + b1_ref[0, :].astype(jnp.float32))
    y1_ref[:] = y1.reshape(nb, h, w, p).astype(y1_ref.dtype)

    # ---- 3x3 conv: 9 shifted-tap matmuls into an f32 accumulator
    padded = jnp.pad(y1_ref[:], ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc_ref[:] = jnp.broadcast_to(b2_ref[0, :].astype(jnp.float32),
                                  acc_ref.shape)
    for dy in range(3):
        for dx in range(3):
            xs = padded[:, dy:dy + h, dx:dx + w, :].reshape(nb * h * w, p)
            acc_ref[:] += jnp.dot(xs, w2_ref[dy, dx],
                                  preferred_element_type=jnp.float32)
    y2 = jax.nn.relu(acc_ref[:]).astype(x.dtype)          # (M, P)

    # ---- 1x1 expand + bias + residual + relu
    y3 = jnp.dot(y2, w3_ref[:], preferred_element_type=jnp.float32)
    y3 = y3 + b3_ref[0, :].astype(jnp.float32)
    out = jax.nn.relu(y3 + x.reshape(nb * h * w, c).astype(jnp.float32))
    o_ref[:] = out.reshape(nb, h, w, c).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def fused_bottleneck(x, w1, b1, w2, b2, w3, b3, block_n: int = 4,
                     interpret: bool = False):
    """x: (N, H, W, C); w1 (C, P), w2 (3, 3, P, P), w3 (P, C); biases are the
    BN-folded shifts. Returns relu(x + conv3(relu(conv2(relu(conv1(x))))))."""
    n, h, w, c = x.shape
    p = w1.shape[1]
    nb = min(block_n, n)
    # weights ride in compute dtype (bf16): halves their VMEM footprint;
    # biases stay f32 (added to f32 accumulators)
    w1, w2, w3 = (jnp.asarray(wi, x.dtype) for wi in (w1, w2, w3))
    two_d = lambda b: jnp.asarray(b, jnp.float32).reshape(1, -1)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=(pl.cdiv(n, nb),),
        in_specs=[
            pl.BlockSpec((nb, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full((c, p)), full((1, p)),
            full((3, 3, p, p)), full((1, p)),
            full((p, c)), full((1, c)),
        ],
        out_specs=pl.BlockSpec((nb, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((nb, h, w, p), x.dtype),           # y1
            pltpu.VMEM((nb * h * w, p), jnp.float32),     # conv2 accumulator
        ],
        interpret=interpret,
    )(x, w1, two_d(b1), w2, two_d(b2), w3, two_d(b3))


def fused_bottleneck_reference(x, w1, b1, w2, b2, w3, b3):
    """XLA oracle with identical math."""
    xf = x.astype(jnp.float32)
    n, h, w, c = x.shape
    p = w1.shape[1]
    y = jax.nn.relu(xf.reshape(-1, c) @ w1.astype(jnp.float32) + b1)
    y = y.reshape(n, h, w, p)
    y = jax.lax.conv_general_dilated(
        y, w2.astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b2
    y = jax.nn.relu(y)
    y = y.reshape(-1, p) @ w3.astype(jnp.float32) + b3
    return jax.nn.relu(y.reshape(n, h, w, c) + xf).astype(x.dtype)
